#!/usr/bin/env python
"""Append-only IVF index drift study (VERDICT r10 task #7).

append_ivf_index grows the persisted index WITHOUT retraining the
coarse quantizer (faiss add()), so the open question its docstring
names is: how far can drifted ingest grow the index before the
scheduled rebuild (persist_ivf_index) is due, and what MONITORED
quantity fires first? This smoke measures both ends of that contract:

  1. build + persist the index on a base corpus (20 Gaussian clusters);
  2. DRIFT phase — grow it 10x by appends whose cluster centers drift
     a little more each batch (tomorrow's data is yesterday's mixture,
     slightly moved): the frozen centroids keep absorbing it;
  3. NOVEL phase — keep appending batches drawn from clusters the
     quantizer NEVER saw (a regime change: new language, new modality,
     new crawl seed). These concentrate into whichever few cells are
     nearest, so per-cell occupancy skews — the failure mode the
     monitor exists for;
  4. at checkpoints, from a FRESH session (the serving shape), record
     q_ann_index_stats' max imbalance + top-cell share and
     q_sim_topk_ivf recall vs the exact GEMM baseline on the grown
     corpus.

The curve pins similarity.IVF_REBUILD_IMBALANCE as a COST bound with a
recall floor: recall holds through both phases (probes still cover the
queries' cells), but past the bound the hottest cell holds
max_imbalance/cells of the whole index, so every probe that touches it
scans that multiple of its fair share — IVF degrading toward brute
force. The monitor crossing the bound is the scheduled-rebuild signal
and it fires while recall is still intact (the alarm leads the
damage). Numbers recorded in SCALE.md; the floor + alarm ordering are
asserted at fixture scale in tests/test_similarity.py.

Run: python scripts/ann_append_drift_smoke.py [n_base] [n_drift_steps]
Output: one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from similarity_scale_smoke import DIM, N_CLUSTERS, SRC_SF, topk_sets  # noqa: E402

N_BASE_DEFAULT = 100_000
N_STEPS_DEFAULT = 9
#: per-step displacement of every cluster center, in units of the
#: cluster sigma (0.35): after 9 steps the mixture has moved ~2.6 sigma
#: from what the quantizer was trained on.
DRIFT_PER_STEP = 0.1
#: drift-phase growth checkpoints (fresh-session measures; the r11 run
#: also measured steps 1/3/5 — flat at max_imbalance 1.347-1.352,
#: recall 1.0 throughout, so the interior points were dropped)
CHECKPOINTS = (0, 9)


def _write_embeddings_part(ddir: str, ids: np.ndarray, vecs: np.ndarray,
                           label: np.ndarray, part: int) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(
                list(vecs.astype(np.float32)), pa.list_(pa.float32())
            ),
            "label": pa.array(label.astype(np.int32), pa.int32()),
        }
    )
    pq.write_table(tbl, os.path.join(ddir, f"part-{part:03d}.parquet"))


def synth_growing_corpus(tmp: str, n_base: int) -> tuple[str, np.ndarray]:
    """sf-dir whose embeddings.parquet is a DIRECTORY (appendable);
    returns (sf_dir, base cluster centers)."""
    rng = np.random.default_rng(7)
    centers = rng.normal(0, 1, (N_CLUSTERS, DIM))
    label = rng.integers(0, N_CLUSTERS, n_base)
    vecs = centers[label] + rng.normal(0, 0.35, (n_base, DIM))
    ddir = os.path.join(tmp, "embeddings.parquet")
    os.makedirs(ddir)
    _write_embeddings_part(ddir, np.arange(n_base), vecs, label, 0)
    for name in (
        "region nation customer supplier part orders lineitem events documents"
    ).split():
        os.symlink(
            os.path.join(SRC_SF, f"{name}.parquet"),
            os.path.join(tmp, f"{name}.parquet"),
        )
    return tmp, centers


def measure(sf_dir: str, idx: str) -> dict:
    """Fresh serving session: stats + recall from the persisted index."""
    from hive_gateway_spark import registry
    from hive_gateway_spark.session import get_spark

    spark = get_spark("ann-drift-measure")
    spark.conf.set("hive_gateway.ann.index_path", idx)
    t0 = time.perf_counter()
    stats = registry.QUERIES["q_ann_index_stats"](spark, sf_dir).collect()
    ivf_rows = registry.QUERIES["q_sim_topk_ivf"](spark, sf_dir).collect()
    exact_rows = registry.QUERIES["q_sim_topk"](spark, sf_dir).collect()
    wall = round(time.perf_counter() - t0, 2)
    exact, approx = topk_sets(exact_rows), topk_sets(ivf_rows)
    total = sum(len(v) for v in exact.values())
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    out = {
        "max_imbalance": max(r["imbalance"] for r in stats),
        "top_cell_share": max(r["occupancy_share"] for r in stats),
        "n_cells": len(stats),
        "recall": round(hits / total, 3),
        "measure_sec": wall,
    }
    spark.stop()
    return out


def main() -> None:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else N_BASE_DEFAULT
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else N_STEPS_DEFAULT
    from hive_gateway_spark.operators import similarity as sim
    from hive_gateway_spark.session import get_spark

    from hive_gateway_spark import registry

    registry.load_all()
    report: dict = {"n_base": n_base, "n_steps": n_steps,
                    "drift_per_step": DRIFT_PER_STEP, "curve": []}
    rng = np.random.default_rng(23)
    with tempfile.TemporaryDirectory(prefix="anndrift_") as tmp:
        sf_dir, centers = synth_growing_corpus(os.path.join(tmp, "sf"), n_base)
        os.makedirs(os.path.join(tmp, "sf"), exist_ok=True)
        idx = os.path.join(tmp, "ann_index")

        spark = get_spark("ann-drift-build")
        t0 = time.perf_counter()
        sim.persist_ivf_index(spark, sf_dir, idx)
        report["build_persist_sec"] = round(time.perf_counter() - t0, 2)
        spark.stop()

        if 0 in CHECKPOINTS:
            report["curve"].append({"step": 0, "n_corpus": n_base,
                                    **measure(sf_dir, idx)})

        ddir = os.path.join(sf_dir, "embeddings.parquet")
        drift_dir = rng.normal(0, 1, (N_CLUSTERS, DIM))
        drift_dir /= np.linalg.norm(drift_dir, axis=1, keepdims=True)
        # the unseen regime: ONE dominant new cluster (a new crawl
        # seed / topic taking over the ingest) — the hottest realistic
        # case; its multi-assigned rows land in at most IVF_ASSIGN
        # frozen cells. (An earlier 3-cluster variant spread across ~6
        # cells and crawled 1.35→1.84 in 4 batches without firing —
        # same direction, slower alarm.)
        novel_centers = rng.normal(0, 1, (1, DIM))

        def append_batch(step: int, vecs: np.ndarray,
                         label: np.ndarray, phase: str) -> float:
            ids = np.arange(step * n_base, (step + 1) * n_base)
            _write_embeddings_part(ddir, ids, vecs, label, step)
            spark = get_spark(f"ann-append-{phase}-{step}")
            new = spark.read.parquet(ddir).filter(
                f"vec_id >= {step * n_base}"
            ).select("vec_id", "embedding")
            t0 = time.perf_counter()
            sim.append_ivf_index(spark, new, idx)
            dt = round(time.perf_counter() - t0, 2)
            spark.stop()
            return dt

        for step in range(1, n_steps + 1):
            # drift phase: each batch from centers displaced a bit more
            c_t = centers + drift_dir * (0.35 * DRIFT_PER_STEP * step)
            label = rng.integers(0, N_CLUSTERS, n_base)
            vecs = c_t[label] + rng.normal(0, 0.35, (n_base, DIM))
            append_sec = append_batch(step, vecs, label, "drift")
            if step in CHECKPOINTS:
                report["curve"].append(
                    {"step": step, "phase": "drift",
                     "n_corpus": (step + 1) * n_base,
                     "append_sec": append_sec, **measure(sf_dir, idx)}
                )
        # novel phase: batches from clusters the quantizer never saw —
        # they all land in their few nearest frozen cells
        n_novel = 4
        for j in range(1, n_novel + 1):
            step = n_steps + j
            label = rng.integers(0, len(novel_centers), n_base)
            vecs = novel_centers[label] + rng.normal(0, 0.35, (n_base, DIM))
            append_sec = append_batch(
                step, vecs, label + N_CLUSTERS, "novel"
            )
            if j in (2, n_novel):
                report["curve"].append(
                    {"step": step, "phase": "novel",
                     "n_corpus": (step + 1) * n_base,
                     "append_sec": append_sec, **measure(sf_dir, idx)}
                )
    # the pinned contract: recall floor while under the rebuild bound,
    # and the monitor FIRES under the novel regime
    under = [p for p in report["curve"]
             if p["max_imbalance"] <= sim.IVF_REBUILD_IMBALANCE]
    # a tiny/lumpy corpus can start ABOVE the bound (the fixture-scale
    # test notes base imbalance ~2 for coarse mixtures) — report None
    # rather than crash after the whole multi-session study ran
    report["recall_floor_under_bound"] = (
        min(p["recall"] for p in under) if under else None
    )
    report["recall_floor_overall"] = min(p["recall"] for p in report["curve"])
    report["monitor_fired"] = any(
        p["max_imbalance"] > sim.IVF_REBUILD_IMBALANCE
        for p in report["curve"] if p.get("phase") == "novel"
    )
    report["bound"] = sim.IVF_REBUILD_IMBALANCE
    print(json.dumps(report))


if __name__ == "__main__":
    main()
