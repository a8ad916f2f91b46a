#!/usr/bin/env python
"""Per-query floor attribution (r17, VERDICT r16 task #6).

~40 registry queries sit in a 0.3-0.9 s warm band and the 254-query
registry total is dominated by a ~0.25 s per-query floor rather than
plan defects. This probe splits one warm measurement into its parts:

  construct  — fn(spark, sf_dir): py4j plan assembly (+ any staging hit)
  save_same  — re-save the SAME DataFrame object (Catalyst re-optimize
               + physical planning + codegen cache hit + execution)
  save_fresh — full fn() + save (the bench's _timed region)

plus two synthetic anchors:

  range1     — noop save of spark.range(1): the pure execution floor
               (job submit, scheduler, one task, commit)
  scan_count — parquet count (metadata path)

Usage: python scripts/floor_probe.py [query ...]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hive_gateway_spark import registry
from hive_gateway_spark.session import get_spark

DEFAULT = [
    "q_scan_project",
    "q_expr_case",
    "q_filter_predicate",
    "q_agg_group",
    "q_tpch_q1",
    "q_tpch_q6",
]


def t(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def med(fn, n=3):
    return round(statistics.median(t(fn) for _ in range(n)), 4)


def save(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry.load_all()
    spark = get_spark("floor-probe-r17")

    # anchors
    r1 = spark.range(1)
    save(r1)  # warm the path
    print(json.dumps({"anchor": "range1_save", "sec": med(lambda: save(r1))}))
    print(
        json.dumps(
            {
                "anchor": "range1_fresh",
                "sec": med(lambda: save(spark.range(1))),
            }
        )
    )
    doc = spark.read.parquet(f"{sf_dir}/documents.parquet")
    print(json.dumps({"anchor": "scan_count", "sec": med(lambda: doc.count())}))

    for name in names:
        fn = registry.QUERIES[name]
        df = fn(spark, sf_dir)  # cold construct + any staging build
        save(df)  # cold execute
        construct = med(lambda: fn(spark, sf_dir))
        df2 = fn(spark, sf_dir)
        save_same = med(lambda: save(df2))
        save_fresh = med(lambda: save(fn(spark, sf_dir)))
        print(
            json.dumps(
                {
                    "q": name,
                    "construct": construct,
                    "save_same": save_same,
                    "save_fresh": save_fresh,
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
