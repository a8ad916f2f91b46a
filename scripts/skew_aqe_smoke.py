#!/usr/bin/env python
"""AQE skew-join smoke: measure Spark's adaptive skew splitting on a
synthetic hot key — the runtime remedy the engine leans on at 100 TB
(beside the explicit salting demo q_join_salted, which is the manual
form for when a key is ALWAYS hot).

Build: a fact table where ONE key owns `hot_frac` of all rows (the
classic crawl pathology: one mirror domain, one null-ish user id), a
uniform dim side too big to broadcast (broadcast disabled so the join
MUST shuffle), then the same sort-merge join twice:

  aqe_off  — spark.sql.adaptive.skewJoin disabled: the hot key's
             partition serializes one task.
  aqe_on   — skewJoin enabled with thresholds low enough to trigger on
             this size: AQE splits the skewed partition into N
             sub-partitions, replicating the matching dim rows.

Prints one JSON line with wall-clocks, the split factor observed in the
final plan ("skew=true" markers), and row-count equality (the
correctness gate — skew splitting must not change the join result).

Run: python scripts/skew_aqe_smoke.py [n_fact] [hot_frac]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DEFAULT = 4_000_000
HOT_FRAC = 0.5


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else N_DEFAULT
    hot_frac = float(sys.argv[2]) if len(sys.argv) > 2 else HOT_FRAC
    from pyspark.sql import functions as F

    from hive_gateway_spark.session import get_spark

    spark = get_spark("skew-aqe-smoke")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    # thresholds sized so the synthetic hot partition qualifies
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")

    n_hot = int(n * hot_frac)
    fact = (
        spark.range(n)
        .select(
            F.when(F.col("id") < n_hot, F.lit(7))
            .otherwise((F.col("id") % 997) + 100)
            .alias("k"),
            (F.col("id") % 1000).alias("v"),
        )
    )
    dim = spark.range(1200).select(
        F.col("id").alias("k"),
        F.concat(F.lit("d"), F.col("id").cast("string")).alias("label"),
    )

    report: dict = {"n_fact": n, "hot_frac": hot_frac}
    counts = {}
    for tag, skew in (("aqe_off", "false"), ("aqe_on", "true")):
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skew)
        j = fact.join(dim, "k").groupBy("label").agg(F.sum("v").alias("s"))
        t0 = time.perf_counter()
        rows = j.collect()
        report[tag] = {
            "wall_sec": round(time.perf_counter() - t0, 2),
            "groups": len(rows),
        }
        counts[tag] = sorted((r["label"], int(r["s"])) for r in rows)
        plan = j._sc._jvm.PythonSQLUtils.explainString(
            j._jdf.queryExecution(), "simple"
        )
        report[tag]["skew_markers"] = plan.count("skew=true")
    report["results_equal"] = counts["aqe_off"] == counts["aqe_on"]
    report["speedup"] = round(
        report["aqe_off"]["wall_sec"] / max(report["aqe_on"]["wall_sec"], 1e-3), 2
    )
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
