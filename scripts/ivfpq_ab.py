#!/usr/bin/env python
"""Structural A/B for q_sim_topk_ivfpq (r17): count Spark jobs and plan
exchanges per warm run — deterministic evidence immune to wall-clock noise."""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hive_gateway_spark import registry
from hive_gateway_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry.load_all()
    spark = get_spark("ivfpq-ab")
    sc = spark.sparkContext
    fn = registry.QUERIES["q_sim_topk_ivfpq"]

    # cold run (builds _quantized / IVF / PQ session caches)
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    cold = time.perf_counter() - t0

    times = []
    jobs = None
    for i in range(5):
        group = f"ab{i}"
        sc.setJobGroup(group, "ivfpq warm")
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times.append(time.perf_counter() - t0)
        ids = sc.statusTracker().getJobIdsForGroup(group)
        jobs = len(ids)
        sc.setJobGroup("", "")

    import io
    import re
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        fn(spark, sf_dir).explain("formatted")
    text = buf.getvalue()
    print(
        {
            "cold": round(cold, 3),
            "warm_median": round(statistics.median(times), 3),
            "warm_all": [round(x, 3) for x in times],
            "jobs_per_warm_run": jobs,
            "plan_exchanges": len(re.findall(r"\bExchange\b", text)),
            "plan_reused": len(re.findall(r"ReusedExchange", text)),
        }
    )
    spark.stop()


if __name__ == "__main__":
    main()
