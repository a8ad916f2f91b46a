#!/usr/bin/env python
"""Persisted-ANN-index serve smoke (VERDICT r9 task #4's scale proof).

The r9 1M smoke showed the SESSION-cached IVF index serving 4.24 s vs
40.3 s brute; this smoke proves the same warm path across a SESSION
BOUNDARY — the production shape where the index build is a cluster job
and serving sessions are many and short-lived:

  session A: build the IVF index over a synthetic 1M×64 corpus and
             publish it via persist_ivf_index (lakehouse manifests,
             inverted file hive-partitioned by cell) — then STOP.
  session B: a brand-new session points hive_gateway.ann.index_path at
             the artifact and runs q_sim_topk_ivf: no KMeans, no
             O(N·cells·dim) assignment — the probe opens only the
             probed cells' files (hive partition pruning).

Reports build/persist wall, session-B first-serve (index load + probe)
and warm-serve wall, the exact-brute baseline, and IVF recall vs it.

Run: python scripts/ann_index_serve_smoke.py [n_vectors]
Output: one JSON line; numbers recorded in SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from similarity_scale_smoke import synth_corpus, topk_sets  # noqa: E402

N_DEFAULT = 1_000_000


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else N_DEFAULT
    from hive_gateway_spark import registry
    from hive_gateway_spark.operators import similarity as sim
    from hive_gateway_spark.session import get_spark

    registry.load_all()
    report: dict = {"n_vectors": n}
    with tempfile.TemporaryDirectory(prefix="annserve_") as tmp:
        os.makedirs(os.path.join(tmp, "sf"), exist_ok=True)
        sf_dir = synth_corpus(os.path.join(tmp, "sf"), n)
        idx = os.path.join(tmp, "ann_index")

        # ---- session A: build + publish, then stop ----
        spark_a = get_spark("ann-index-build")
        t0 = time.perf_counter()
        manifests = sim.persist_ivf_index(spark_a, sf_dir, idx)
        report["build_persist_sec"] = round(time.perf_counter() - t0, 2)
        report["invfile_rows"] = manifests["invfile"]["n_rows"]
        spark_a.stop()

        # ---- session B: fresh session, serve from the artifact ----
        spark_b = get_spark("ann-index-serve")
        spark_b.conf.set("hive_gateway.ann.index_path", idx)
        fn = registry.QUERIES["q_sim_topk_ivf"]
        t0 = time.perf_counter()
        ivf_rows = fn(spark_b, sf_dir).collect()
        report["serve_first_sec"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        fn(spark_b, sf_dir).collect()
        report["serve_warm_sec"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        exact_rows = registry.QUERIES["q_sim_topk"](spark_b, sf_dir).collect()
        report["brute_sec"] = round(time.perf_counter() - t0, 2)
        exact, approx = topk_sets(exact_rows), topk_sets(ivf_rows)
        total = sum(len(v) for v in exact.values())
        hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
        report["recall"] = round(hits / total, 3)
        report["n_queries"] = len(exact)
        spark_b.stop()
    print(json.dumps(report))


if __name__ == "__main__":
    main()
