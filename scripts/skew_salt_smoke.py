#!/usr/bin/env python
"""Salted-join smoke: measure the EXPLICIT salting remedy under a
planted hot key (VERDICT r15 stretch #10 — the manual half of the skew
story; scripts/skew_aqe_smoke.py measures the AQE half on the same
fixture). Salting is the lever for a pipeline that KNOWS its hot keys
(a mirror domain, a null-ish user id) and cannot rely on runtime
discovery — e.g. when the skew sits under an aggregate AQE won't
split, or on engines/stages with AQE disabled.

Build: identical fixture to the AQE smoke — a fact where ONE key owns
`hot_frac` of all rows, a dim too big to broadcast, broadcast AND AQE
skew-splitting disabled so the join must shuffle raw. Then:

  plain   — fact ⋈ dim on k: the hot key's partition serializes one
            task (the pathology).
  salted  — fact carries salt = id % SALT, dim replicated ×SALT,
            join on (k, salt): the hot key spreads over SALT tasks.

Prints one JSON line with wall-clocks (median of `reps`), the
salted/plain speedup, and group-level result equality (salting must be
invisible in the answer). SCALE.md records the measured numbers.

Run: python scripts/skew_salt_smoke.py [n_fact] [hot_frac] [salt]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DEFAULT = 4_000_000
HOT_FRAC = 0.5
SALT_DEFAULT = 16
REPS = 3


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else N_DEFAULT
    hot_frac = float(sys.argv[2]) if len(sys.argv) > 2 else HOT_FRAC
    salt_n = int(sys.argv[3]) if len(sys.argv) > 3 else SALT_DEFAULT
    from pyspark.sql import functions as F

    from hive_gateway_spark.session import get_spark

    spark = get_spark("skew-salt-smoke")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # isolate the MANUAL remedy: no runtime skew splitting
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")

    n_hot = int(n * hot_frac)
    fact = spark.range(n).select(
        F.when(F.col("id") < n_hot, F.lit(7))
        .otherwise((F.col("id") % 997) + 100)
        .alias("k"),
        (F.col("id") % 1000).alias("v"),
        F.pmod(F.col("id"), F.lit(salt_n)).cast("int").alias("salt"),
    )
    dim = spark.range(1200).select(
        F.col("id").alias("k"),
        F.concat(F.lit("d"), F.col("id").cast("string")).alias("label"),
    )
    dim_salted = dim.select(
        "k",
        "label",
        F.explode(F.array(*[F.lit(i) for i in range(salt_n)])).alias("salt"),
    )

    # fresh frame per measurement: re-collecting ONE DataFrame reuses
    # its shuffle files (observed 5.0 s cold → 0.09 s "warm" — that
    # median measures the shuffle CACHE, not the join); a rebuilt
    # lineage re-executes the shuffle while the codegen cache still
    # amortizes compilation after the warm-up rep
    def build(tag):
        if tag == "plain":
            return fact.join(dim, "k").groupBy("label").agg(F.sum("v").alias("s"))
        return (
            fact.join(dim_salted, ["k", "salt"])
            .groupBy("label")
            .agg(F.sum("v").alias("s"))
        )

    report: dict = {"n_fact": n, "hot_frac": hot_frac, "salt": salt_n}
    counts = {}
    for tag in ("plain", "salted"):
        build(tag).collect()  # codegen warm-up, discarded
        walls = []
        for _ in range(REPS):
            j = build(tag)
            t0 = time.perf_counter()
            rows = j.collect()
            walls.append(time.perf_counter() - t0)
        counts[tag] = sorted((r["label"], int(r["s"])) for r in rows)
        report[tag] = {
            "wall_sec": round(statistics.median(walls), 2),
            "walls": [round(w, 2) for w in walls],
            "groups": len(rows),
        }
    report["results_equal"] = counts["plain"] == counts["salted"]
    report["speedup"] = round(
        report["plain"]["wall_sec"] / max(report["salted"]["wall_sec"], 1e-3), 2
    )
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
