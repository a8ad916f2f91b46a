"""Curated-dataset export sink — the last stage of a training-data
pipeline: write the curated corpus as partitioned parquet plus a
driver-written manifest that records exactly what was shipped.

Layout (the lakehouse idiom a 100 TB run needs):

    out/
      subset=train/lang=en/part-*.parquet     ← partition-pruned reads
      subset=val/lang=fr/part-*.parquet
      _MANIFEST.json                          ← row counts + checksum

The manifest's per-partition row counts and the order-insensitive
content checksum are computed FROM THE WRITTEN FILES (one Spark read
back), not from the input plan — so the manifest certifies the export,
catching a lost partition or a partial write. At scale the read-back is
a metadata-cheap count per partition plus one modular sum-reduce over row
hashes; both are single shuffles.

The reference has no export layer (331-line RPC proxy); this implements
the mandate's pipeline completeness (curate → export → verify).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

MANIFEST = "_MANIFEST.json"


def _content_checksum(df: DataFrame, cols: list[str]) -> str:
    """Order-insensitive 64-bit content checksum: SUM mod 2^64 of
    per-row xxhash64 over all exported columns (cast to string for a
    stable cross-write representation; NULL → sentinel).

    Sum, not xor (ADVICE r7 #4): xor cancels any row that appears an
    even number of times — dropping or duplicating an identical row
    PAIR left the xor checksum unchanged, so the safety gate could
    bless a corrupting compaction. Modular addition is
    multiplicity-sensitive (losing k copies of row h shifts the sum by
    k·h mod 2^64). The fold runs in DECIMAL(38,0) — NOT wrapping
    bigint +, which under Spark 4's default ANSI dialect would throw
    on the first overflow — and reduces mod 2^64 at the end; still a
    native partial-aggregable sum tree, one decimal per partition
    (headroom: |h| < 2^63 ≈ 9.3e18, so even 10^18 rows stay inside 38
    digits)."""
    row_hash = F.xxhash64(*[
        F.coalesce(F.col(c).cast("string"), F.lit("\x00null")) for c in cols
    ])
    agg = df.select(row_hash.alias("h")).agg(
        F.expr(
            "CAST(pmod(sum(CAST(h AS DECIMAL(38,0))), "
            "CAST(18446744073709551616 AS DECIMAL(38,0))) AS STRING)"
        ).alias("x")
    )
    return agg.first()["x"]


def write_dataset(
    df: DataFrame, path: str, partition_by: list[str] | None = None
) -> dict:
    """Write `df` as parquet partitioned by `partition_by`, then read
    the files back and write _MANIFEST.json with per-partition row
    counts and the content checksum. Returns the manifest dict."""
    partition_by = partition_by or []
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)

    spark = df.sparkSession
    back = spark.read.parquet(path)
    cols = df.columns
    if partition_by:
        counts = {
            "/".join(f"{c}={r[c]}" for c in partition_by): r["n"]
            for r in back.groupBy(*partition_by)
            .agg(F.count("*").alias("n"))
            .collect()
        }
    else:
        counts = {"": back.count()}
    manifest = {
        "format": "parquet",
        "partition_by": partition_by,
        "columns": cols,
        "n_rows": sum(counts.values()),
        "partitions": dict(sorted(counts.items())),
        "content_xxh64_sum": _content_checksum(back.select(*cols), cols),
    }
    with open(os.path.join(path, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def verify_dataset(spark: SparkSession, path: str) -> dict:
    """Re-derive the manifest from the files and compare; returns
    {"ok": bool, "expected": ..., "actual": ...}. The consumer-side
    check a training job runs before trusting an export."""
    with open(os.path.join(path, MANIFEST)) as f:
        expected = json.load(f)
    back = spark.read.parquet(path)
    cols = expected["columns"]
    pby = expected["partition_by"]
    if pby:
        counts = {
            "/".join(f"{c}={r[c]}" for c in pby): r["n"]
            for r in back.groupBy(*pby).agg(F.count("*").alias("n")).collect()
        }
    else:
        counts = {"": back.count()}
    actual = {
        "format": "parquet",
        "partition_by": pby,
        "columns": cols,
        "n_rows": sum(counts.values()),
        "partitions": dict(sorted(counts.items())),
        "content_xxh64_sum": _content_checksum(back.select(*cols), cols),
    }
    return {"ok": actual == expected, "expected": expected, "actual": actual}


def dataset_files(path: str) -> list[str]:
    """All parquet data files under `path` (recursive, sorted)."""
    out = []
    for root, _, files in os.walk(path):
        out.extend(
            os.path.join(root, f)
            for f in files
            if f.endswith(".parquet") and not f.startswith("_")
        )
    return sorted(out)


def compact_dataset(
    spark: SparkSession, path: str, files_per_partition: int = 1
) -> dict:
    """Small-files maintenance: rewrite the dataset so each partition
    holds at most `files_per_partition` data files, preserving content
    bit-for-bit (the order-insensitive xxhash64-sum checksum in the
    manifest must survive the rewrite — verified before the swap).

    The streaming ingest path appends a file per micro-batch per
    partition; without periodic compaction a 100 TB table degrades
    into millions of kilobyte files and every scan pays the per-file
    open cost. This is the maintenance job a table format (Iceberg/
    Delta OPTIMIZE) schedules — here as an explicit engine operation
    over the plain-parquet export.

    Safety: the rewrite lands in a sibling temp dir first and BOTH the
    content checksum AND the per-partition row counts are verified
    against the ORIGINAL manifest before the atomic-ish directory swap
    (ADVICE r7 #4: belt and suspenders — counts catch what any single
    64-bit digest could in principle collide through); on any mismatch
    the original is left untouched."""
    with open(os.path.join(path, MANIFEST)) as f:
        manifest = json.load(f)
    pby = manifest["partition_by"]
    cols = manifest["columns"]
    tmp = path.rstrip("/") + ".compact.tmp"
    df = spark.read.parquet(path).select(*cols)
    writer = (
        df.repartition(files_per_partition, *pby)
        if pby
        else df.coalesce(files_per_partition)
    ).write.mode("overwrite")
    if pby:
        writer = writer.partitionBy(*pby)
    writer.parquet(tmp)
    back = spark.read.parquet(tmp).select(*cols)
    checksum = _content_checksum(back, cols)
    if pby:
        counts = {
            "/".join(f"{c}={r[c]}" for c in pby): r["n"]
            for r in spark.read.parquet(tmp)
            .groupBy(*pby)
            .agg(F.count("*").alias("n"))
            .collect()
        }
    else:
        counts = {"": back.count()}
    if (
        checksum != manifest["content_xxh64_sum"]
        or dict(sorted(counts.items())) != manifest["partitions"]
    ):  # pragma: no cover
        shutil.rmtree(tmp, ignore_errors=True)
        raise RuntimeError(
            "compaction changed dataset content; original left in place"
        )
    n_before = len(dataset_files(path))
    with open(os.path.join(tmp, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    old = path.rstrip("/") + ".compact.old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return {
        "files_before": n_before,
        "files_after": len(dataset_files(path)),
        "n_rows": manifest["n_rows"],
    }
