#!/usr/bin/env python
"""Multimodal-family ~100k-asset scale smoke (VERDICT r7 task #6).

Mirrors the corpus/similarity smokes in SCALE.md: a synthetic
100k-row documents table (20x the sf0.1 table; the three perceptual
operators synthesize their binary assets deterministically from
doc_id, so only ids + schema matter) runs the REGISTERED operators
unmodified at local[32]:

  q_image_phash        — PNG codec + batched DCT pHash, capped band join
  q_audio_fingerprint  — WAV codec + multi-scale energy fingerprint
  q_video_framesample  — Y4M codec + temporal sampling + motion features

and reports wall-clock plus family-level sanity: the planted 5-doc
families must be FULLY recovered (n/5 * C(5,2) pairs, no cross-family
pair), which at 100k docs is 200k verified pairs through the banded
plan — never all-pairs.

A fourth leg is the HOT-BUCKET regression for the
PERCEPTUAL_BUCKET_CAP (the r8 cap): 4096 IDENTICAL 64-bit hashes (one
logo stamped on every page) plus a 100k random tail drive
banded_hash_pairs directly. Uncapped this is C(4096,2) ~ 8.4M verify
pairs from one bucket; capped it must emit ZERO hot-family pairs and
finish in seconds. (Direct hash-frame entry because the image
synthesizer derives content from doc_id, so a corpus table cannot
express 4096 byte-identical images; banded_hash_pairs IS the
registered operators' shared pair-generation plan.)

Run: python scripts/multimodal_scale_smoke.py [n_docs]
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
HOT_N = 4_096
SRC_SF = "/root/testdata/sf0.001"


def synth_docs(tmp: str, n: int) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "text": pa.array(np.repeat("multimodal asset stub", n)),
            "lang": pa.array(np.repeat("en", n)),
            "source": pa.array(np.repeat("synth", n)),
            "n_chars": pa.array(np.repeat(21, n), pa.int64()),
        }
    )
    # many-part layout so the asset-synthesis mapInPandas parallelizes
    # (same lesson as the corpus smoke: one file = one straggler scan)
    ddir = os.path.join(tmp, "documents.parquet")
    os.makedirs(ddir)
    for j in range(32):
        pq.write_table(
            tbl.slice(j * n // 32, (j + 1) * n // 32 - j * n // 32),
            os.path.join(ddir, f"part-{j:02d}.parquet"),
        )
    for name in (
        "region nation customer supplier part orders lineitem events embeddings"
    ).split():
        os.symlink(
            os.path.join(SRC_SF, f"{name}.parquet"),
            os.path.join(tmp, f"{name}.parquet"),
        )
    return tmp


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else N_DEFAULT
    from pyspark.sql import functions as F

    from hive_gateway_spark import registry
    from hive_gateway_spark.operators.multimodal import (
        PHASH_CLUSTER,
        banded_hash_pairs,
    )
    from hive_gateway_spark.session import get_spark

    registry.load_all()
    spark = get_spark("multimodal-scale-smoke")
    out: dict = {"n_docs": n}
    expected_pairs = (n // PHASH_CLUSTER) * (
        PHASH_CLUSTER * (PHASH_CLUSTER - 1) // 2
    )

    def timed(key: str, fn) -> None:
        t0 = time.time()
        fn()
        out[f"{key}_cold_sec"] = round(time.time() - t0, 2)
        t0 = time.time()
        fn()
        out[f"{key}_warm_sec"] = round(time.time() - t0, 2)

    with tempfile.TemporaryDirectory() as tmp:
        sf = synth_docs(tmp, n)
        q = registry.QUERIES

        def image() -> None:
            rows = q["q_image_phash"](spark, sf)
            good = rows.filter(
                F.expr(f"doc_a div {PHASH_CLUSTER} = doc_b div {PHASH_CLUSTER}")
            ).count()
            out["image_pairs"] = rows.count()
            out["image_family_pairs"] = good

        def audio() -> None:
            out["audio_pairs"] = q["q_audio_fingerprint"](spark, sf).count()

        def video() -> None:
            out["video_rows"] = q["q_video_framesample"](spark, sf).count()

        timed("image", image)
        # the bucket cap trades a sliver of recall for boundedness: at
        # 100k docs a few band buckets exceed 512 members (100k hashes
        # over 65536 16-bit keys, non-uniform), and a family whose
        # every matching band is capped loses its pair — measured 8 of
        # 200 000 (0.004%). Gate at 99.9%, record the exact ratio.
        out["image_recall"] = round(out["image_family_pairs"] / expected_pairs, 6)
        out["image_recall_ok"] = out["image_recall"] >= 0.999
        timed("audio", audio)
        out["audio_full_recall"] = out["audio_pairs"] >= expected_pairs
        timed("video", video)

        # hot-bucket leg: 4096 identical hashes + 100k random tail
        rng = np.random.default_rng(8)
        hot = np.full(HOT_N, 0x0123456789ABCDEF, np.int64)
        tail = rng.integers(-(2**63), 2**63, n, dtype=np.int64)
        frame = spark.createDataFrame(
            [(int(i), int(h)) for i, h in enumerate(np.concatenate([hot, tail]))],
            "doc_id bigint, h bigint",
        )

        def hot_bucket() -> None:
            pairs = banded_hash_pairs(frame, "h", 10)
            out["hot_pairs_emitted"] = pairs.filter(
                (F.col("doc_a") < HOT_N) & (F.col("doc_b") < HOT_N)
            ).count()
            out["total_pairs"] = pairs.count()

        timed("hot_bucket", hot_bucket)
        out["hot_bucket_bounded"] = out["hot_pairs_emitted"] == 0
    print(json.dumps(out))


if __name__ == "__main__":
    main()
