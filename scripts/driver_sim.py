#!/usr/bin/env python
"""Full driver simulation — the strongest pre-driver gate.

Replicates the external driver's CORRECTNESS check end-to-end: a VANILLA
SparkSession (no engine confs — exercises the runtime nanosAsLong fix),
the FIRST 50 ``queries()`` entries (the driver's verification window) at
sf0.01, each compared against its DuckDB oracle: row count + column
names + exact values + dtype kinds.

Usage:  python scripts/driver_sim.py [sf_dir] [n_queries]
Prints one JSON object; "bad" must be empty before shipping a round.
"""
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from pyspark.sql import SparkSession  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 50

spark = SparkSession.builder.master("local[16]").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as E  # noqa: E402
import pandas as pd  # noqa: E402
from parity import canon, duck_df  # noqa: E402

qs, oracles = E.queries(), E.oracle_sql()
results = {}
for name in list(qs)[:N]:
    try:
        actual = canon(qs[name](spark, SF).toPandas())
        if name not in oracles:
            results[name] = {"rows": len(actual), "status": "rows_only"}
            continue
        expected = canon(duck_df(oracles[name], SF))
        ok_rows = len(actual) == len(expected)
        ok_cols = list(actual.columns) == list(expected.columns)
        ok_vals = False
        if ok_rows and ok_cols:
            try:
                pd.testing.assert_frame_equal(
                    actual, expected, check_dtype=False, check_exact=True
                )
                ok_vals = True
            except AssertionError:
                ok_vals = False
        kind = lambda s: "i" if s.dtype.kind in "iu" else s.dtype.kind  # noqa: E731
        drift = [
            c
            for c in actual.columns
            if c in expected.columns and kind(actual[c]) != kind(expected[c])
        ]
        ok = ok_rows and ok_cols and ok_vals and not drift
        results[name] = {
            "rows": len(actual),
            "status": "PASS"
            if ok
            else f"FAIL rows={ok_rows} cols={ok_cols} vals={ok_vals} drift={drift}",
        }
    except Exception as e:  # noqa: BLE001
        results[name] = {"status": f"ERROR {type(e).__name__}: {e}"}

bad = {k: v for k, v in results.items() if v["status"] not in ("PASS", "rows_only")}
print(json.dumps({"checked": len(results), "bad": bad}, indent=1, default=str))
spark.stop()
sys.exit(1 if bad else 0)
