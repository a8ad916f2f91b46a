"""SQL-callable function registration — the engine's UDF surface.

The reference's extension point is the module mechanism (any
`mod.fun(arg)` routed to a backend — gateway.ts:289, SURVEY §2.1 "UDF
surface"); the engine's equivalent is `spark.udf.register`: every
slow-path kernel becomes a named SQL function usable from pure SQL
(`SELECT hg_inflate(payload) FROM ...`), so SQL users get the full
operator surface without touching Python.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F, types as T


def register_all(spark: SparkSession) -> list[str]:
    """Register the engine's SQL function library; returns the names."""
    from hive_gateway_spark.functions.binary import (
        deflate_udf,
        gzip_udf,
        inflate_udf,
    )
    from hive_gateway_spark.functions.msgpack_codec import (
        decode_envelope_udf,
        encode_envelope_udf,
    )

    spark.udf.register("hg_deflate", deflate_udf)
    spark.udf.register("hg_inflate", inflate_udf)
    spark.udf.register("hg_gzip", gzip_udf)
    spark.udf.register("hg_encode_envelope", encode_envelope_udf)
    spark.udf.register("hg_decode_envelope", decode_envelope_udf)
    return [
        "hg_deflate",
        "hg_inflate",
        "hg_gzip",
        "hg_encode_envelope",
        "hg_decode_envelope",
    ]
