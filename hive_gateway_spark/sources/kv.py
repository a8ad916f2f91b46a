"""KV-store connector layer — the reference's Redis usage (gateway.ts:35-37,
:204, :236, :139-171) re-expressed for a distributed engine.

Read path: KV state enters queries as **dimension snapshots** (token→uid
auth maps, module→addr route tables) that are broadcast-joined — never
per-row KV round trips (the reference spends 2-5 Redis RTTs per request;
a scan-oriented engine amortizes that to one broadcast per job).

Write path: query/stream results land in the KV store via foreachBatch —
each micro-batch partition writes through a client pool. The client is an
injectable interface with three implementations: `MemoryKV` (unit-test
double), `FileKV` (cross-process double proving executor writes), and
`RespKV` — a real RESP2 wire-protocol client (the publicly documented
Redis protocol) that talks to any Redis-compatible server; tested here
against the in-process `FakeRespServer` since the container has no Redis.
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


class RespKV(KVClient):
    """Real-protocol KV client: speaks RESP2 (the publicly documented
    Redis serialization protocol) over a TCP socket — closes the gap vs
    the reference's live Redis connection (gateway.ts:35-37) while
    keeping the same injectable `KVClient` interface the engine's
    dimension-snapshot / foreachBatch paths already use.

    Commands used: MSET (write path), GET (point read), SCAN+MGET
    (namespace snapshot for `kv_dimension`). One client per executor
    partition via `kv_sink_foreachBatch`'s factory — the connection-pool
    idiom. Tested against the in-process `FakeRespServer` below (no
    Redis in this container); against a real server only the host/port
    change."""

    def __init__(self, host: str = "127.0.0.1", port: int = 6379, timeout_s: float = 30.0):
        import socket

        self._sock = socket.create_connection((host, port), timeout=timeout_s)
        self._rf = self._sock.makefile("rb")

    def close(self) -> None:
        try:
            self._rf.close()
            self._sock.close()
        except OSError:  # pragma: no cover
            pass

    # --- RESP2 wire codec ---
    def _send(self, *args: str | bytes) -> None:
        out = [b"*%d\r\n" % len(args)]
        for a in args:
            b = a if isinstance(a, bytes) else str(a).encode()
            out.append(b"$%d\r\n%s\r\n" % (len(b), b))
        self._sock.sendall(b"".join(out))

    def _read_reply(self):
        line = self._rf.readline()
        if not line:
            raise ConnectionError("RESP connection closed")
        kind, rest = line[:1], line[1:-2]
        if kind == b"+":
            return rest.decode()
        if kind == b"-":
            raise RuntimeError(f"RESP error: {rest.decode()}")
        if kind == b":":
            return int(rest)
        if kind == b"$":
            n = int(rest)
            if n == -1:
                return None
            body = self._rf.read(n + 2)
            return body[:-2].decode()
        if kind == b"*":
            n = int(rest)
            if n == -1:
                return None
            return [self._read_reply() for _ in range(n)]
        raise RuntimeError(f"RESP: unknown reply type {kind!r}")

    def _cmd(self, *args):
        self._send(*args)
        return self._read_reply()

    # --- KVClient surface ---
    def mset(self, pairs: Iterable[tuple[str, str]]) -> None:
        flat: list[str] = []
        for k, v in pairs:
            flat.extend((k, v))
        if flat:
            self._cmd("MSET", *flat)

    def get(self, key: str) -> str | None:
        return self._cmd("GET", key)

    def items(self) -> list[tuple[str, str]]:
        keys: list[str] = []
        cursor = "0"
        while True:
            cursor, batch = self._cmd("SCAN", cursor, "COUNT", "512")
            keys.extend(batch)
            if cursor == "0":
                break
        if not keys:
            return []
        vals = self._cmd("MGET", *keys)
        return sorted((k, v) for k, v in zip(keys, vals) if v is not None)

    # list commands — enough surface to replay the reference's
    # rate-limiter Redis script (RPUSHX/EXPIRE/LLEN, gateway.ts:139-171)
    def rpushx(self, key: str, value: str) -> int:
        return self._cmd("RPUSHX", key, value)

    def rpush(self, key: str, value: str) -> int:
        return self._cmd("RPUSH", key, value)

    def llen(self, key: str) -> int:
        return self._cmd("LLEN", key)

    def expire(self, key: str, seconds: int) -> int:
        return self._cmd("EXPIRE", key, seconds)


class FakeRespServer:
    """In-process RESP2 server (threaded TCP) backing RespKV tests —
    implements the command subset the reference touches: PING, GET, SET,
    MSET, MGET, SCAN, DEL, FLUSHDB and the list/TTL trio RPUSHX/RPUSH/
    LLEN/EXPIRE (TTLs are logical only — tests don't sleep). A test
    double for the wire protocol, not a database."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        import socketserver

        store: dict[str, object] = {}
        lock = threading.Lock()
        self.store = store

        def reply(rf, obj):
            if obj is None:
                rf.write(b"$-1\r\n")
            elif isinstance(obj, int):
                rf.write(b":%d\r\n" % obj)
            elif isinstance(obj, str) and obj in ("OK", "PONG"):
                rf.write(b"+%s\r\n" % obj.encode())
            elif isinstance(obj, (list, tuple)):
                rf.write(b"*%d\r\n" % len(obj))
                for x in obj:
                    reply(rf, x)
            else:
                b = str(obj).encode()
                rf.write(b"$%d\r\n%s\r\n" % (len(b), b))

        class Handler(socketserver.StreamRequestHandler):
            def handle(self) -> None:
                while True:
                    line = self.rfile.readline()
                    if not line or line[:1] != b"*":
                        return
                    n = int(line[1:-2])
                    args = []
                    for _ in range(n):
                        ln = int(self.rfile.readline()[1:-2])
                        args.append(self.rfile.read(ln + 2)[:-2].decode())
                    cmd, a = args[0].upper(), args[1:]
                    with lock:
                        if cmd == "PING":
                            out = "PONG"
                        elif cmd == "SET":
                            store[a[0]] = a[1]
                            out = "OK"
                        elif cmd == "MSET":
                            store.update(zip(a[::2], a[1::2]))
                            out = "OK"
                        elif cmd == "GET":
                            v = store.get(a[0])
                            out = v if isinstance(v, str) else None
                        elif cmd == "MGET":
                            out = [
                                v if isinstance(v := store.get(k), str) else None
                                for k in a
                            ]
                        elif cmd == "SCAN":  # single-pass: cursor always 0
                            out = ["0", [k for k, v in store.items() if isinstance(v, str)]]
                        elif cmd == "DEL":
                            out = sum(1 for k in a if store.pop(k, None) is not None)
                        elif cmd == "FLUSHDB":
                            store.clear()
                            out = "OK"
                        elif cmd == "RPUSH":
                            lst = store.setdefault(a[0], [])
                            lst.append(a[1])
                            out = len(lst)
                        elif cmd == "RPUSHX":
                            # the reference's bug hinges on this: push
                            # ONLY if the key already exists, else no-op 0
                            lst = store.get(a[0])
                            if isinstance(lst, list):
                                lst.append(a[1])
                                out = len(lst)
                            else:
                                out = 0
                        elif cmd == "LLEN":
                            lst = store.get(a[0])
                            out = len(lst) if isinstance(lst, list) else 0
                        elif cmd == "EXPIRE":
                            out = 1 if a[0] in store else 0
                        else:
                            self.wfile.write(
                                b"-ERR unknown command '%s'\r\n" % cmd.encode()
                            )
                            self.wfile.flush()
                            continue
                    reply(self.wfile, out)
                    self.wfile.flush()

        self._srv = socketserver.ThreadingTCPServer((host, port), Handler)
        self._srv.daemon_threads = True
        self.port = self._srv.server_address[1]
        self._thread = threading.Thread(target=self._srv.serve_forever, daemon=True)

    def start(self) -> "FakeRespServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._srv.shutdown()
        self._srv.server_close()


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
