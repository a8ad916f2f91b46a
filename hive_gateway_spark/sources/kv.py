"""KV-store connector layer — the reference's Redis usage (gateway.ts:35-37,
:204, :236, :139-171) re-expressed for a distributed engine.

Read path: KV state enters queries as **dimension snapshots** (token→uid
auth maps, module→addr route tables) that are broadcast-joined — never
per-row KV round trips (the reference spends 2-5 Redis RTTs per request;
a scan-oriented engine amortizes that to one broadcast per job).

Write path: query/stream results land in the KV store via foreachBatch —
each micro-batch partition writes through a client pool. The client here
is an injectable interface with an in-memory implementation (no Redis in
this environment); production swaps `KVClient`.
"""

from __future__ import annotations

import threading
from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession


class KVClient:
    """Minimal KV interface (the Redis surface the reference touches:
    HGET/GET/SET — gateway.ts:204, 236)."""

    def mset(self, pairs: Iterable[tuple[str, str]]) -> None:  # pragma: no cover
        raise NotImplementedError

    def get(self, key: str) -> str | None:  # pragma: no cover
        raise NotImplementedError

    def items(self) -> list[tuple[str, str]]:  # pragma: no cover
        raise NotImplementedError


class MemoryKV(KVClient):
    """Thread-safe in-memory KV store (test double for Redis)."""

    _stores: dict[str, dict[str, str]] = {}
    _lock = threading.Lock()

    def __init__(self, namespace: str = "default") -> None:
        self.namespace = namespace
        with MemoryKV._lock:
            MemoryKV._stores.setdefault(namespace, {})

    @property
    def _d(self) -> dict[str, str]:
        return MemoryKV._stores[self.namespace]

    def mset(self, pairs: Iterable[tuple[str, str]]) -> None:
        with MemoryKV._lock:
            self._d.update(dict(pairs))

    def get(self, key: str) -> str | None:
        return self._d.get(key)

    def items(self) -> list[tuple[str, str]]:
        return sorted(self._d.items())


class FileKV(KVClient):
    """Filesystem-backed KV store usable across executor processes
    (Python workers are separate processes even in local mode, so an
    in-memory dict can't observe executor writes). Each mset appends a
    TSV segment file; reads merge segments (last-write-wins by segment
    name). This doubles as a toy LSM — and as the test double proving
    the foreachBatch path really ran on executors."""

    def __init__(self, root: str) -> None:
        import pathlib

        self.root = pathlib.Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    def mset(self, pairs: Iterable[tuple[str, str]]) -> None:
        import os
        import uuid

        seg = self.root / f"{os.getpid()}-{uuid.uuid4().hex}.tsv"
        lines = [f"{k}\t{v}\n" for k, v in pairs]
        if lines:
            seg.write_text("".join(lines))

    def _merged(self) -> dict[str, str]:
        out: dict[str, str] = {}
        for seg in sorted(self.root.glob("*.tsv")):
            for line in seg.read_text().splitlines():
                k, _, v = line.partition("\t")
                out[k] = v
        return out

    def get(self, key: str) -> str | None:
        return self._merged().get(key)

    def items(self) -> list[tuple[str, str]]:
        return sorted(self._merged().items())


def kv_dimension(spark: SparkSession, client: KVClient, key_col: str, value_col: str) -> DataFrame:
    """Snapshot a KV namespace into a dimension DataFrame (broadcastable).

    The snapshot is tiny relative to fact data (auth/route tables), so a
    driver-side pull then parallelize is the right scale shape; huge KV
    ranges would use a partitioned scan connector instead."""
    return spark.createDataFrame(client.items(), f"{key_col} string, {value_col} string")


def kv_sink_foreachBatch(kv_factory, key_col: str, value_col: str):
    """Build a foreachBatch function writing (key, value) rows to a KV
    store — executors construct their own client via `kv_factory` (a
    picklable zero-arg callable), one per partition, mirroring a real
    connection pool."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        cols = [key_col, value_col]

        def write_partition(rows):
            client = kv_factory()
            client.mset((str(r[key_col]), str(r[value_col])) for r in rows)

        batch_df.select(*cols).foreachPartition(write_partition)

    return write_batch
