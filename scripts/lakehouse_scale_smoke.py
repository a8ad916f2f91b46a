#!/usr/bin/env python
"""Lakehouse-layer scale smoke — the commit cycle a streaming ingest
drives, at 100k docs: write v1 → 8 appends (micro-batch commits) →
one merge upsert (re-crawl replacing 1% of keys) → verify → compact.
Reports wall-clock per phase, file counts before/after compaction, and
the invariants that make the layer trustworthy (manifest-scoped reads,
content equality through the compaction rewrite).

Run: python scripts/lakehouse_scale_smoke.py [n_docs]
Output: one JSON line; numbers recorded in SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DEFAULT = 100_000
N_APPENDS = 8


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else N_DEFAULT
    from pyspark.sql import functions as F

    from hive_gateway_spark.session import get_spark
    from hive_gateway_spark.sources.dataset_export import (
        append_dataset,
        compact_dataset,
        dataset_files,
        merge_dataset,
        read_snapshot,
        verify_dataset,
        write_dataset,
    )

    spark = get_spark("lakehouse-scale-smoke")
    out: dict = {"n_docs": n, "n_appends": N_APPENDS}

    def synth(lo: int, hi: int):
        return spark.range(lo, hi).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("document body "), F.col("id")).alias("text"),
            F.element_at(
                F.array(F.lit("en"), F.lit("de"), F.lit("fr")),
                (F.col("id") % 3 + 1).cast("int"),
            ).alias("lang"),
        )

    tmp = tempfile.mkdtemp()
    path = os.path.join(tmp, "corpus")
    try:
        half = n // 2
        t0 = time.time()
        write_dataset(synth(0, half).repartition(32), path, partition_by=["lang"])
        out["write_sec"] = round(time.time() - t0, 2)

        batch = half // N_APPENDS
        t0 = time.time()
        for i in range(N_APPENDS):
            append_dataset(synth(half + i * batch, half + (i + 1) * batch), path)
        out["append_sec_total"] = round(time.time() - t0, 2)

        t0 = time.time()
        upsert = synth(0, n // 100).withColumn(
            "text", F.concat(F.lit("RECRAWLED "), F.col("doc_id"))
        )
        m = merge_dataset(upsert, path, key="doc_id")
        out["merge_sec"] = round(time.time() - t0, 2)
        out["rows_after_merge"] = m["n_rows"]

        t0 = time.time()
        out["verify_ok"] = verify_dataset(spark, path)["ok"]
        out["verify_sec"] = round(time.time() - t0, 2)

        out["files_before_compact"] = len(dataset_files(path))
        t0 = time.time()
        report = compact_dataset(
            spark, path, files_per_partition=8, cluster_by="doc_id"
        )
        out["compact_sec"] = round(time.time() - t0, 2)
        out["files_after_compact"] = report["files_after"]

        # file-skipping read: a 1%-of-keyspace range should open ~1 of
        # the 8 clustered files and return exactly the right rows
        t0 = time.time()
        lo, hi = n // 2, n // 2 + n // 100
        pruned = read_snapshot(spark, path, between=("doc_id", lo, hi))
        out["pruned_files_opened"] = len(pruned.inputFiles())
        out["pruned_rows"] = pruned.count()
        out["pruned_read_sec"] = round(time.time() - t0, 2)
        out["prune_ok"] = (
            out["pruned_files_opened"] < report["files_after"]
            and out["pruned_rows"] == hi - lo + 1
        )

        latest = read_snapshot(spark, path)
        out["rows_final"] = latest.count()
        out["recrawled_rows"] = latest.filter(
            F.col("text").startswith("RECRAWLED")
        ).count()
        out["content_ok"] = (
            out["rows_final"] == n and out["recrawled_rows"] == n // 100
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
