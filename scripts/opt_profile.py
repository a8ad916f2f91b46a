#!/usr/bin/env python
"""Per-query optimization profiler (r16-r17, guide §1).

For each named query: capture ``explain("formatted")`` to
``plans/<round>/<query>_<tag>.txt``, time one cold + median-of-3 warm runs
through the noop sink (bench.py protocol), and print a one-line plan
summary (Exchange / join strategy / Python-eval node counts) so plan
regressions are visible next to the seconds.

Usage:
    python scripts/opt_profile.py --tag before q_a q_b ...
    python scripts/opt_profile.py --tag before --top 25   # slowest from
                                                          # BENCH_LOCAL_r16
    python scripts/opt_profile.py q_a           # time only, no plan file
"""

from __future__ import annotations

import argparse
import gc
import io
import json
import os
import re
import statistics
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hive_gateway_spark import registry
from hive_gateway_spark.session import get_spark

PLAN_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", os.environ.get("OPT_PLAN_ROUND", "r17"))


def plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def plan_stats(text: str) -> dict:
    return {
        "exchanges": len(re.findall(r"\bExchange\b", text)),
        "reused": len(re.findall(r"ReusedExchange", text)),
        "smj": len(re.findall(r"SortMergeJoin", text)),
        "bhj": len(re.findall(r"BroadcastHashJoin", text)),
        "shj": len(re.findall(r"ShuffledHashJoin", text)),
        "bnlj": len(re.findall(r"BroadcastNestedLoopJoin", text)),
        "cart": len(re.findall(r"CartesianProduct", text)),
        "pyeval": len(re.findall(r"BatchEvalPython|ArrowEvalPython", text)),
        "mapinpandas": len(re.findall(r"MapInPandas|MapInArrow|FlatMapGroupsInPandas", text)),
        "sorts": len(re.findall(r"^\s*[+:]?-? ?\(?\d*\)? ?Sort ", text, re.M)),
        "scans": len(re.findall(r"Scan parquet|Scan ExistingRDD", text)),
    }


def timed(fn, spark, sf_dir) -> float:
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--tag", default=None, help="write plans/r16/<q>_<tag>.txt")
    ap.add_argument("--top", type=int, default=0, help="add N slowest from BENCH_LOCAL_r16")
    ap.add_argument("--warm", type=int, default=3)
    ap.add_argument("--no-cold", action="store_true")
    ap.add_argument(
        "--plan-only",
        action="store_true",
        help="capture plans without timing (safe on a busy machine)",
    )
    args = ap.parse_args()

    names = list(args.queries)
    if args.top:
        here = os.path.dirname(PLAN_DIR)
        with open(os.path.join(os.path.dirname(here), "BENCH_LOCAL_r16.json")) as f:
            rec = json.load(f)
        ranked = sorted(rec["queries"].items(), key=lambda kv: -kv[1])
        names += [k for k, _ in ranked[: args.top] if k not in names]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry.load_all()
    spark = get_spark("opt-profile-r16")
    if args.tag:
        os.makedirs(PLAN_DIR, exist_ok=True)

    out = {}
    for name in names:
        fn = registry.QUERIES[name]
        gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
        spark.sparkContext.setJobDescription(f"opt:{name}")
        df = fn(spark, sf_dir)
        text = plan_text(df)
        if args.tag:
            with open(os.path.join(PLAN_DIR, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(text)
        stats = plan_stats(text)
        if args.plan_only:
            out[name] = {"cold": None, "warm": 0.0, **stats}
            print(json.dumps({"q": name, **out[name]}), flush=True)
            continue
        cold = None if args.no_cold else round(timed(fn, spark, sf_dir), 3)
        warm = round(statistics.median(timed(fn, spark, sf_dir) for _ in range(args.warm)), 3)
        out[name] = {"cold": cold, "warm": warm, **stats}
        print(json.dumps({"q": name, **out[name]}), flush=True)
    total = round(sum(v["warm"] for v in out.values()), 3)
    print(json.dumps({"total_warm": total, "n": len(out)}))
    spark.stop()


if __name__ == "__main__":
    main()
