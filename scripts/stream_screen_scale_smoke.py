#!/usr/bin/env python
"""Streaming semantic screen at index scale (VERDICT r12 task #8).

stream_embed_dedup_screen is fixture-pinned in tests; this smoke runs
it against REAL persisted IVF indexes (100k and 1M vectors, the same
synthetic corpus as scripts/similarity_scale_smoke.py) and reports the
per-micro-batch screen latency an ingest shard would pay:

  build  — persist_ivf_index wall (the one-off cluster job)
  screen — availableNow drain of one arrival batch (copies of indexed
           vectors + novel vectors) through the screen: stream-static
           join against only the probed cells' partitions
  recall — every planted near-copy must emit a match naming its source

The static side reloads per micro-batch epoch from the partitioned
lakehouse table, so the latency scales with probes/cells of the index,
not its total size — that is the claim this smoke measures.

Run: python scripts/stream_screen_scale_smoke.py [n ...]
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

DIM = 64
N_CLUSTERS = 20
N_COPIES = 50
N_NOVEL = 200
SRC_SF = "/root/testdata/sf0.001"


def synth(tmp: str, n: int):
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(7)
    centers = rng.normal(0, 1, (N_CLUSTERS, DIM))
    label = rng.integers(0, N_CLUSTERS, n)
    vecs = centers[label] + rng.normal(0, 0.35, (n, DIM))
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n), pa.int64()),
                "embedding": pa.array(
                    list(vecs.astype(np.float32)), pa.list_(pa.float32())
                ),
                "label": pa.array(label.astype(np.int32), pa.int32()),
            }
        ),
        os.path.join(tmp, "embeddings.parquet"),
    )
    for name in (
        "region nation customer supplier part orders lineitem events documents"
    ).split():
        os.symlink(
            os.path.join(SRC_SF, f"{name}.parquet"),
            os.path.join(tmp, f"{name}.parquet"),
        )
    return vecs, rng


def crossover() -> None:
    """Measure the expression-vs-GEMM screen crossover by arrival
    count (VERDICT r13 task #7): one 100k-vector index, the SAME
    arrival block screened through both spellings at increasing batch
    sizes. The expression plan pays an interpreted HOF dot per
    (arrival × candidate row); the GEMM path pays a flat collect +
    broadcast + BLAS. The printed table backs
    streaming.ops.EMBED_SCREEN_GEMM_MIN_ARRIVALS (recorded in
    SCALE.md "Semantic screen crossover")."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hive_gateway_spark.operators.similarity import persist_ivf_index
    from hive_gateway_spark.session import get_spark
    from hive_gateway_spark.streaming.ops import (
        embed_screen_batch,
        stream_embed_dedup_screen,
    )

    n = 100_000
    sizes = [8, 16, 32, 64, 128, 256, 1024, 4096]
    spark = get_spark("stream-screen-crossover")
    report: dict = {"index_n": n, "dim": DIM, "arrivals": {}}
    with tempfile.TemporaryDirectory(prefix="scrx_") as tmp:
        sf_dir = os.path.join(tmp, "sf")
        os.makedirs(sf_dir)
        vecs, rng = synth(sf_dir, n)
        idx = os.path.join(tmp, "index")
        persist_ivf_index(spark.newSession(), sf_dir, idx)
        for sz in sizes:
            src = rng.choice(n, sz // 2 + 1, replace=False)
            arrive = np.vstack(
                [
                    vecs[src] * (1 + 1e-3),
                    rng.normal(0, 1, (sz - len(src), DIM)) * 3,
                ]
            ).astype(np.float32)[:sz]
            adir = os.path.join(tmp, f"arr_{sz}")
            os.makedirs(adir)
            pq.write_table(
                pa.table(
                    {
                        "vec_id": pa.array(
                            np.arange(10_000_000, 10_000_000 + sz), pa.int64()
                        ),
                        "embedding": pa.array(
                            list(arrive), pa.list_(pa.float32())
                        ),
                    }
                ),
                os.path.join(adir, "part-00.parquet"),
            )
            times = {}
            for name in ("expr", "gemm"):
                s = spark.newSession()
                batch = s.read.parquet(adir)
                if name == "gemm":
                    score = embed_screen_batch(s, idx, tau=0.98)
                    fn = lambda: score(batch).count()  # noqa: E731
                else:
                    fn = lambda: stream_embed_dedup_screen(  # noqa: E731
                        batch, idx, tau=0.98
                    ).count()
                fn()  # warm (snapshot load, codegen)
                t0 = time.perf_counter()
                fn()
                times[name] = round(time.perf_counter() - t0, 3)
            report["arrivals"][str(sz)] = times
            print(f"arrivals={sz}: {times}", file=sys.stderr)
    print(json.dumps(report))
    spark.stop()


def main() -> None:
    if "--crossover" in sys.argv:
        crossover()
        return
    ns = [int(a) for a in sys.argv[1:]] or [100_000, 1_000_000]
    from pyspark.sql import functions as F

    from hive_gateway_spark.operators.similarity import persist_ivf_index
    from hive_gateway_spark.session import get_spark
    from hive_gateway_spark.streaming.ops import stream_embed_dedup_screen

    spark = get_spark("stream-screen-scale-smoke")
    report: dict = {"dim": DIM, "runs": {}}
    for n in ns:
        with tempfile.TemporaryDirectory(prefix="scrsmoke_") as tmp:
            sf_dir = os.path.join(tmp, "sf")
            os.makedirs(sf_dir)
            vecs, rng = synth(sf_dir, n)
            idx = os.path.join(tmp, "index")
            s = spark.newSession()
            t0 = time.perf_counter()
            persist_ivf_index(s, sf_dir, idx)
            build = time.perf_counter() - t0
            # arrival batch: near-copies of indexed vectors + novel
            src = rng.choice(n, N_COPIES, replace=False)
            arrive = np.vstack(
                [vecs[src] * (1 + 1e-3), rng.normal(0, 1, (N_NOVEL, DIM)) * 3]
            ).astype(np.float32)
            ids = np.arange(10_000_000, 10_000_000 + len(arrive))
            adir = os.path.join(tmp, "arrivals")
            import pyarrow as pa
            import pyarrow.parquet as pq

            os.makedirs(adir)
            pq.write_table(
                pa.table(
                    {
                        "vec_id": pa.array(ids, pa.int64()),
                        "embedding": pa.array(
                            list(arrive), pa.list_(pa.float32())
                        ),
                    }
                ),
                os.path.join(adir, "part-00.parquet"),
            )
            s2 = spark.newSession()
            vec_stream = s2.readStream.schema(
                "vec_id bigint, embedding array<float>"
            ).parquet(adir)
            screen = stream_embed_dedup_screen(vec_stream, idx, tau=0.98)
            t0 = time.perf_counter()
            q = (
                screen.writeStream.format("memory")
                .queryName(f"scr_{n}")
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(600)
            drain = time.perf_counter() - t0
            rows = s2.table(f"scr_{n}").collect()
            # the foreachBatch GEMM spelling over the same arrivals
            from hive_gateway_spark.streaming.ops import embed_screen_batch

            s3 = spark.newSession()
            batch_df = s3.read.parquet(adir)
            score = embed_screen_batch(s3, idx, tau=0.98)
            t0 = time.perf_counter()
            gemm_rows = score(batch_df).collect()
            gemm_sec = time.perf_counter() - t0
            matched = {int(r["vec_id"]) for r in rows}
            copies = set(int(i) for i in ids[:N_COPIES])
            novel = set(int(i) for i in ids[N_COPIES:])
            report["runs"][str(n)] = {
                "index_build_sec": round(build, 2),
                "screen_batch_sec": round(drain, 2),
                "gemm_screen_sec": round(gemm_sec, 2),
                "gemm_match_rows": len(gemm_rows),
                "arrivals": len(arrive),
                "match_rows": len(rows),
                "copy_recall": round(
                    len(matched & copies) / N_COPIES, 4
                ),
                "novel_false_flags": len(matched & novel),
            }
            print(f"n={n}: {report['runs'][str(n)]}", file=sys.stderr)
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
