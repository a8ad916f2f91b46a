"""Binary-payload functions: zlib/gzip codecs and magic-byte predicates.

The reference negotiates response compression in-line (gateway.ts:82-133):
zlib-magic detection (0x78 0x9c), deflate passthrough, inflate, gzip
re-compress, all gated on payload size > 1024 B. SQL has no zlib, so
these are the engine's designated slow path — **Arrow-batched pandas
UDFs** (one Python call per ~10k rows, not per row), which is the only
part of the pipeline that leaves the JVM.

gzip determinism: gzip embeds an mtime header byte; we pin mtime=0 so
outputs are stable across runs (needed for rows-only correctness checks).
"""

from __future__ import annotations

import gzip as _gzip
import io
import zlib

import pandas as pd
from pyspark.sql import functions as F, types as T

#: Compression threshold from the reference (gateway.ts:110).
COMPRESS_MIN_BYTES = 1024

ZLIB_MAGIC = bytes([0x78, 0x9C])


@F.pandas_udf(T.BinaryType())
def deflate_udf(payload: pd.Series) -> pd.Series:
    """zlib-deflate each payload (level 6, zlib default — emits 0x789c)."""
    return payload.map(lambda b: None if b is None else zlib.compress(bytes(b)))


@F.pandas_udf(T.BinaryType())
def inflate_udf(payload: pd.Series) -> pd.Series:
    """zlib-inflate; invalid input → None (the ref 500s: gateway.ts:90-92)."""

    def _inf(b):
        if b is None:
            return None
        try:
            return zlib.decompress(bytes(b))
        except zlib.error:
            return None

    return payload.map(_inf)


@F.pandas_udf(T.BinaryType())
def gzip_udf(payload: pd.Series) -> pd.Series:
    """gzip with pinned mtime=0 for deterministic bytes."""

    def _gz(b):
        if b is None:
            return None
        buf = io.BytesIO()
        with _gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as f:
            f.write(bytes(b))
        return buf.getvalue()

    return payload.map(_gz)


def is_zlib(col):
    """Predicate: payload starts with the zlib magic 0x78 0x9c
    (gateway.ts:82) — pure JVM expression, no UDF."""
    return F.substring(col, 1, 2) == F.lit(ZLIB_MAGIC)


def negotiate_compression(payload_col, accept_encoding_col):
    """The reference's full compression-negotiation decision tree
    (gateway.ts:82-133) as one declarative expression over a binary
    payload column + an Accept-Encoding header column:

    - already-zlib payload + client accepts deflate → passthrough
      (zero-copy, the ref's P3 optimization);
    - already-zlib + client accepts only gzip → inflate, re-gzip
      (gateway.ts:94-104);
    - already-zlib otherwise → inflate (client can't take either);
    - raw payload > 1024 B → deflate if accepted, else gzip if
      accepted, else raw;
    - small payloads → raw.

    Returns (body_col, content_encoding_col). CaseWhen short-circuits,
    so UDF branches only run for rows that take them. The ref falls
    back to the raw (inflated) bytes if gzip fails (:102-103) —
    mirrored with coalesce.
    """
    accepts_deflate = accept_encoding_col.rlike(r"\bdeflate\b")
    accepts_gzip = accept_encoding_col.rlike(r"\bgzip\b")
    zl = is_zlib(payload_col)
    big = F.length(payload_col) > COMPRESS_MIN_BYTES
    regzipped = gzip_udf(inflate_udf(payload_col))

    body = (
        F.when(zl & accepts_deflate, payload_col)
        .when(zl & accepts_gzip, F.coalesce(regzipped, inflate_udf(payload_col)))
        .when(zl, inflate_udf(payload_col))
        .when(big & accepts_deflate, deflate_udf(payload_col))
        .when(big & accepts_gzip, gzip_udf(payload_col))
        .otherwise(payload_col)
    )
    encoding = (
        F.when(zl & accepts_deflate, F.lit("deflate"))
        .when(zl & accepts_gzip & regzipped.isNotNull(), F.lit("gzip"))
        .when(zl, F.lit(None).cast("string"))
        .when(big & accepts_deflate, F.lit("deflate"))
        .when(big & accepts_gzip, F.lit("gzip"))
        .otherwise(F.lit(None).cast("string"))
    )
    return body, encoding


class CodecExpr:
    """Peephole-simplifying codec expression builder — the engine-layer
    analog of SURVEY §4.2d's optional Catalyst rule `inflate(deflate(x))
    → x`.

    PySpark cannot inject JVM optimizer rules, and Catalyst cannot see
    through opaque Python UDFs anyway — so the algebraic rewrite runs
    where the engine *builds* codec chains: ops accumulate symbolically,
    a directly-adjacent inflate cancels a deflate (always sound: inflate
    is deflate's exact inverse; the converse deflate∘inflate is NOT
    cancelled — an arbitrary zlib stream need not be byte-identical to
    our level-6 re-compression), and only the surviving ops lower to UDF
    calls. A fully-cancelled chain contributes ZERO Python evaluation
    nodes to the physical plan (asserted in tests/test_functions.py).

        codec_plan(col).deflate().inflate().column()   # → col, no UDF
        codec_plan(col).deflate().column()             # → deflate_udf(col)
    """

    def __init__(self, col, ops: tuple = ()):
        self._col = col
        self._ops = ops

    def deflate(self) -> "CodecExpr":
        return CodecExpr(self._col, self._ops + ("deflate",))

    def gzip(self) -> "CodecExpr":
        return CodecExpr(self._col, self._ops + ("gzip",))

    def inflate(self) -> "CodecExpr":
        if self._ops and self._ops[-1] == "deflate":
            return CodecExpr(self._col, self._ops[:-1])  # the rewrite
        return CodecExpr(self._col, self._ops + ("inflate",))

    @property
    def ops(self) -> tuple:
        return self._ops

    def column(self):
        lower = {"deflate": deflate_udf, "gzip": gzip_udf, "inflate": inflate_udf}
        col = self._col
        for op in self._ops:
            col = lower[op](col)
        return col


def codec_plan(col) -> CodecExpr:
    """Start a simplifying codec chain over a binary column."""
    return CodecExpr(col)
