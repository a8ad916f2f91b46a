"""Subprocess probe for the JVM Catalyst extension: builds a FRESH
SparkSession with spark.sql.extensions=hgspark.CodecExtensions (the
shared engine session stays vanilla — the driver contract owns it) and
reports whether the codec-identity rule fired in the optimized plan,
whether a lone (non-identity) codec UDF survives untouched, and whether
results are unchanged. Prints one JSON verdict line; run via
`python -m hive_gateway_spark.jvm._probe`."""

from __future__ import annotations

import json

from hive_gateway_spark.jvm import EXTENSION_CLASS, ensure_jar


def main() -> None:
    jar = ensure_jar()
    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master("local[2]")
        .appName("catalyst-ext-probe")
        .config("spark.sql.extensions", EXTENSION_CLASS)
        .config("spark.jars", jar)
        .config("spark.driver.extraClassPath", jar)
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from hive_gateway_spark.functions.binary import deflate_udf, inflate_udf

    df = spark.range(8).select(
        F.encode(F.concat(F.lit("payload-"), F.col("id").cast("string")), "utf-8").alias(
            "p"
        )
    )
    fused = df.select(inflate_udf(deflate_udf(F.col("p"))).alias("out"))
    opt = fused._jdf.queryExecution().optimizedPlan().toString()
    ctrl = df.select(deflate_udf(F.col("p")).alias("out"))
    opt_ctrl = ctrl._jdf.queryExecution().optimizedPlan().toString()
    rows = [bytes(r["out"]).decode() for r in fused.collect()]

    # Levenshtein length-prune rule: the filter gains a constant-time
    # abs(length-length) guard and the DP comparison flips orientation
    # (the idempotency marker); values must be unchanged.
    names = spark.createDataFrame(
        [("red widget",), ("rd widget",), ("red gadget",), ("a",)], ["n"]
    )
    pair = names.toDF("a").crossJoin(names.toDF("b"))
    fz = pair.filter(F.levenshtein("a", "b") <= F.lit(2))
    opt_fz = fz._jdf.queryExecution().optimizedPlan().toString()
    expected = pair.filter(
        (F.abs(F.length("a") - F.length("b")) <= 2)
        & (F.levenshtein("a", "b") <= 2)
    )
    print(
        json.dumps(
            {
                "rewritten": "inflate_udf" not in opt and "deflate_udf" not in opt,
                "control_keeps_udf": "deflate_udf" in opt_ctrl,
                "roundtrip_ok": rows == [f"payload-{i}" for i in range(8)],
                "lev_guard_added": "abs(" in opt_fz and "length(" in opt_fz,
                "lev_rows_ok": sorted(map(tuple, fz.collect()))
                == sorted(map(tuple, expected.collect())),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
