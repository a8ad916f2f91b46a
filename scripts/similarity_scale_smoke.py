#!/usr/bin/env python
"""Similarity-family 10× scale smoke (VERDICT r6 task #5).

Mirrors SCALE.md's dedup smoke: a synthetic ~100k-vector / 64-dim corpus
(50× the sf0.1 embeddings table) with 20 planted Gaussian clusters runs
through the three ANN paths at local[32]:

  q_sim_topk           — exact GEMM baseline (bounded broadcast query block)
  q_sim_topk_ivf       — KMeans coarse cells, probes 3, multi-assign 2
  q_sim_topk_lsh       — 16×6-bit hyperplane buckets
  q_sim_topk_pq        — 8×256 product-quantization codes, ADC scan
  q_sim_topk_pq_rerank — ADC top-50 shortlist + exact int64 re-rank
  q_sim_topk_ivfpq     — faiss IVFADC: ADC over probed cells' codes only,
                         top-200 shortlist + exact int64 re-rank

and reports wall-clock, result sizes, and per-path recall vs the exact
top-k. The corpus lands in a temp sf-dir (other fixture tables are
symlinked from sf0.001 — load_tables reads eagerly), so the REGISTERED
operators run unmodified: what is smoked is exactly what ships.

Run: python scripts/similarity_scale_smoke.py [n_vectors]
Output: one JSON line; numbers recorded in SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_DEFAULT = 100_000
DIM = 64
N_CLUSTERS = 20
SRC_SF = "/root/testdata/sf0.001"  # donor for the non-embedding tables


def synth_corpus(tmp: str, n: int) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(7)
    centers = rng.normal(0, 1, (N_CLUSTERS, DIM))
    label = rng.integers(0, N_CLUSTERS, n)
    vecs = centers[label] + rng.normal(0, 0.35, (n, DIM))
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(
                list(vecs.astype(np.float32)), pa.list_(pa.float32())
            ),
            "label": pa.array(label.astype(np.int32), pa.int32()),
        }
    )
    pq.write_table(tbl, os.path.join(tmp, "embeddings.parquet"))
    for name in (
        "region nation customer supplier part orders lineitem events documents"
    ).split():
        os.symlink(
            os.path.join(SRC_SF, f"{name}.parquet"),
            os.path.join(tmp, f"{name}.parquet"),
        )
    return tmp


def topk_sets(rows) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in rows:
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else N_DEFAULT
    from hive_gateway_spark import registry
    from hive_gateway_spark.operators import similarity as sim
    from hive_gateway_spark.session import get_spark

    registry.load_all()
    # optional: widen the bounded query block (crossover studies — the
    # registered operators keep their production cap; this smoke knob
    # exists to measure how the brute/ANN gap moves with query count)
    nq = int(os.environ.get("SIM_SMOKE_QUERIES", "0"))
    if nq:
        sim.MAX_QUERIES = nq
        sim.QUERY_ID_CAP = sim.QUERY_STRIDE * nq
    spark = get_spark("similarity-scale-smoke")
    report: dict = {"n_vectors": n, "dim": DIM}
    with tempfile.TemporaryDirectory(prefix="simsmoke_") as tmp:
        sf_dir = synth_corpus(tmp, n)
        results: dict[str, list] = {}
        for name in (
            "q_sim_topk",
            "q_sim_topk_ivf",
            "q_sim_topk_lsh",
            "q_sim_topk_pq",
            "q_sim_topk_pq_rerank",
            "q_sim_topk_ivfpq",
        ):
            fn = registry.QUERIES[name]
            t0 = time.perf_counter()
            rows = fn(spark, sf_dir).collect()
            dt = time.perf_counter() - t0
            # warm pass: the IVF index / staged frames are session-
            # cached, so this is the amortized serve path (index built
            # once, queried many times — the production shape).
            t1 = time.perf_counter()
            fn(spark, sf_dir).collect()
            warm = time.perf_counter() - t1
            results[name] = rows
            report[name] = {
                "wall_sec": round(dt, 2),
                "warm_sec": round(warm, 2),
                "rows": len(rows),
            }
        # retrieval-eval family: timing + output size only (their
        # outputs are per-query scalars, not top-k sets)
        for name in ("q_retrieval_mmr", "q_ann_recall", "q_retrieval_ndcg"):
            fn = registry.QUERIES[name]
            t0 = time.perf_counter()
            rows = fn(spark, sf_dir).collect()
            dt = time.perf_counter() - t0
            t1 = time.perf_counter()
            fn(spark, sf_dir).collect()
            warm = time.perf_counter() - t1
            report[name] = {
                "wall_sec": round(dt, 2),
                "warm_sec": round(warm, 2),
                "rows": len(rows),
            }
            if name == "q_ann_recall":
                rs = [r["recall_at_k"] for r in rows]
                report[name]["mean_recall"] = round(sum(rs) / len(rs), 3)
            if name == "q_retrieval_ndcg":
                ns = [r["ndcg"] for r in rows]
                report[name]["mean_ndcg"] = round(sum(ns) / len(ns), 3)
        exact = topk_sets(results["q_sim_topk"])
        total = sum(len(v) for v in exact.values())
        for name in (
            "q_sim_topk_ivf",
            "q_sim_topk_lsh",
            "q_sim_topk_pq",
            "q_sim_topk_pq_rerank",
            "q_sim_topk_ivfpq",
        ):
            approx = topk_sets(results[name])
            hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
            report[name]["recall"] = round(hits / total, 3)
        report["n_queries"] = len(exact)
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
