"""Gateway Layer-A composites — the reference's end-to-end request path
replayed as one declarative pipeline over the `events` fixture.

`events` models the gateway's request stream (FIXTURES.md): user_id = the
auth token, event_type = mod.fun, ts = arrival time, props = the untyped
msgpack arg. The flagship pipeline is SURVEY §7.2's minimum end-to-end
slice: parse → classify → admission window → broadcast route join →
aggregate — stages 1-7 of the reference lifecycle (SURVEY §3.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from hive_gateway_spark.functions.binary import negotiate_compression
from hive_gateway_spark.operators.windows import RATE_LIMIT_N
from hive_gateway_spark.registry import query
from hive_gateway_spark.session import load_tables

_FLAGSHIP_ORACLE = f"""
WITH admitted AS (
    SELECT event_id, user_id, event_type, ts, value,
           CAST(props->>'$.k' AS INTEGER) AS k,
           ROW_NUMBER() OVER (
               PARTITION BY user_id, date_trunc('day', ts)
               ORDER BY ts, event_id) <= {RATE_LIMIT_N} AS admitted
    FROM events
), routed AS (
    SELECT a.*, n.n_name AS route_mod, r.r_name AS route_region
    FROM admitted a
    JOIN nation n ON (a.user_id % 25) = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
)
SELECT route_region, event_type, date_trunc('day', ts) AS day,
       COUNT(*) AS n_total,
       CAST(SUM(CASE WHEN admitted THEN 1 ELSE 0 END) AS BIGINT) AS n_admitted,
       CAST(SUM(CASE WHEN admitted THEN 0 ELSE 1 END) AS BIGINT) AS n_rejected,
       CAST(SUM(CASE WHEN admitted THEN CAST(value AS DECIMAL(18,2))
                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS admitted_value,
       CAST(SUM(k) AS BIGINT) AS sum_k
FROM routed
GROUP BY route_region, event_type, date_trunc('day', ts)
"""


@query("q_gateway_pipeline", oracle=_FLAGSHIP_ORACLE)
def q_gateway_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: the gateway request lifecycle as one Catalyst plan.

    ingest (scan) → msgpack-arg parse (get_json_object; ref O19) →
    admission window (ref O16 intended semantics) → route resolution as
    a broadcast dimension join (ref O21) → per-(region, mod, day)
    traffic/admission report (what ref O2's log consumers compute).

    Scale shape: the only wide exchange is the window partition by
    (user_id, day) and the final group-by; both route joins broadcast.
    """
    t = load_tables(spark, sf_dir)
    w = W.partitionBy("user_id", F.date_trunc("day", "ts")).orderBy("ts", "event_id")
    admitted = t["events"].select(
        "event_id",
        "user_id",
        "event_type",
        "ts",
        "value",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
        (F.row_number().over(w) <= RATE_LIMIT_N).alias("admitted"),
    )
    routes = F.broadcast(
        t["nation"].join(
            F.broadcast(t["region"]),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
    )
    routed = admitted.join(
        routes, F.pmod(F.col("user_id"), F.lit(25)).cast("int") == F.col("n_nationkey")
    )
    zero = F.lit(0).cast("decimal(18,2)")
    return (
        routed.groupBy(
            F.col("r_name").alias("route_region"),
            "event_type",
            F.date_trunc("day", "ts").alias("day"),
        )
        .agg(
            F.count("*").alias("n_total"),
            F.sum(F.when(F.col("admitted"), 1).otherwise(0)).alias("n_admitted"),
            F.sum(F.when(F.col("admitted"), 0).otherwise(1)).alias("n_rejected"),
            F.sum(
                F.when(F.col("admitted"), F.col("value").cast("decimal(18,2)")).otherwise(zero)
            )
            .cast("double")
            .alias("admitted_value"),
            F.sum("k").alias("sum_k"),
        )
    )


@query(
    "q_msgpack_roundtrip",
    oracle="""
    SELECT event_type AS mod,
           COUNT(*) AS n,
           COUNT(DISTINCT CAST(props->>'$.k' AS INTEGER)) AS n_args
    FROM events
    GROUP BY event_type
    """,
)
def q_msgpack_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """msgpack envelope codec (ref O19/O29, gateway.ts:189, :317) proven
    through SQL: every event is encoded as a {mod, fun, arg,
    ctx.wxuser} request envelope and decoded back (clean-room codec,
    functions/msgpack_codec.py); the aggregate over the *decoded*
    fields must equal the oracle's aggregate over the *source* fields —
    i.e., the codec is the identity, verified at fixture scale."""
    from hive_gateway_spark.functions.msgpack_codec import roundtrip_envelope_udf

    t = load_tables(spark, sf_dir)
    # No repartition before the UDF: the whole-batch numpy codec costs
    # ~0.5 µs/row, so even the fixture's single-file one-task scan beats
    # paying a 100k-row exchange + 32 Python workers (A/B-measured 0.53 s
    # vs 0.80 s warm at sf0.1). At 100 TB the scan is many-split and the
    # codec parallelizes for free.
    dec = t["events"].select(
        roundtrip_envelope_udf(
            F.col("event_type"),
            F.lit("call"),
            F.get_json_object("props", "$.k"),
            F.col("user_id").cast("string"),
        ).alias("env")
    ).select("env.*")
    return dec.groupBy("mod").agg(
        F.count("*").alias("n"),
        F.countDistinct(F.col("arg").cast("int")).alias("n_args"),
    )


@query("q_gateway_compression")  # rows-only: zlib has no SQL oracle (SURVEY §7.5.3)
def q_gateway_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compression negotiation (ref O10-O15) over synthesized binary
    payloads: documents.text → binary payload; Accept-Encoding derived
    deterministically from doc_id. Verified by pytest round-trip
    properties (inflate(deflate(x)) == x) and here as a rows-only check:
    per (source, encoding) counts + size totals.

    The payload column is the engine's "multimodal opaque binary" type:
    the same plumbing carries image/audio bytes (operators/multimodal)."""
    t = load_tables(spark, sf_dir)
    d = t["documents"].select(
        "doc_id",
        "source",
        F.encode("text", "utf-8").alias("payload"),
        # 4-way deterministic Accept-Encoding header mix
        F.element_at(
            F.array(
                F.lit("deflate, gzip"),
                F.lit("gzip"),
                F.lit("identity"),
                F.lit("deflate"),
            ),
            (F.pmod(F.col("doc_id"), F.lit(4)) + 1).cast("int"),
        ).alias("accept_encoding"),
    )
    body, enc = negotiate_compression(F.col("payload"), F.col("accept_encoding"))
    out = d.select(
        "doc_id",
        "source",
        F.length("payload").alias("raw_len"),
        F.length(body).alias("body_len"),
        F.coalesce(enc, F.lit("identity")).alias("content_encoding"),
    )
    return (
        out.groupBy("source", "content_encoding")
        .agg(
            F.count("*").alias("n"),
            F.sum("raw_len").alias("raw_bytes"),
            F.sum("body_len").alias("body_bytes"),
        )
    )


_E2E_ORACLE = f"""
WITH src AS (
    SELECT event_id, user_id, event_type, ts, value,
           CASE
             WHEN user_id % 17 = 0 THEN NULL
             WHEN user_id % 3 = 0 THEN 'wx' || lpad(CAST(user_id AS VARCHAR), 26, '0')
             WHEN user_id % 3 = 1 THEN
                  lpad(CAST(user_id AS VARCHAR), 8, '0') || '-' ||
                  lpad(CAST(user_id AS VARCHAR), 4, '0') || '-' ||
                  lpad(CAST(user_id AS VARCHAR), 4, '0') || '-' ||
                  lpad(CAST(user_id AS VARCHAR), 4, '0') || '-' ||
                  lpad(CAST(user_id AS VARCHAR), 12, '0')
             ELSE 'sess:' || CAST(user_id AS VARCHAR)
           END AS token
    FROM events
), classified AS (
    SELECT *,
           CASE
             WHEN token IS NULL THEN 'anonymous'
             WHEN length(token) = 28 THEN 'wx'
             WHEN length(token) = 36
                  AND substr(token, 9, 1) = '-' AND substr(token, 14, 1) = '-'
                  AND substr(token, 19, 1) = '-' AND substr(token, 24, 1) = '-'
               THEN 'uuid'
             ELSE 'session'
           END AS token_class
    FROM src
), authed AS (
    SELECT *,
           CASE
             WHEN token_class = 'anonymous' THEN ''
             WHEN token_class = 'uuid' THEN token
             WHEN user_id % 5 <> 2 THEN 'u' || CAST(user_id AS VARCHAR)
             ELSE NULL
           END AS uid
    FROM classified
), admitted AS (
    SELECT *,
           ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('day', ts)
                              ORDER BY ts, event_id) <= {RATE_LIMIT_N} AS admit
    FROM authed
), status AS (
    SELECT *,
           CASE
             WHEN uid IS NULL THEN '307_auth_redirect'
             WHEN NOT admit THEN '429_rate_limited'
             ELSE '200_dispatched'
           END AS status
    FROM admitted
)
SELECT token_class, status,
       COUNT(*) AS n,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(SUM(CASE WHEN status = '200_dispatched'
                     THEN CAST(value AS DECIMAL(18,2))
                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS dispatched_value
FROM status
GROUP BY token_class, status
"""


@query("q_gateway_e2e", oracle=_E2E_ORACLE)
def q_gateway_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE reference request lifecycle (SURVEY §3.1 stages 1-7)
    as one plan, wire format included:

      synthesize token (4 populations: WeChat-28 / uuid-36 / session /
      anonymous — gateway.ts:200,203,225) → msgpack-encode the request
      envelope and decode it back (the actual wire codec, O19/O29) →
      token classification CASE (O23) → auth resolution (O24/O25: wx +
      session tokens resolve via the %5 rule, uuid tokens are their own
      uid — the "rescue" path, anonymous gets uid='' on the admin
      domain, O22) → per-(token, day) admission window (O16 intended
      semantics) → per-status side outputs (O27: 200/307/429) →
      traffic report.

    The oracle replays the same lifecycle from the source columns
    directly — the msgpack round trip must therefore be the identity
    for the hashes to match (and the codec is additionally
    property-tested in tests/test_functions.py)."""
    from hive_gateway_spark.functions.msgpack_codec import roundtrip_envelope_udf
    from hive_gateway_spark.operators.windows import RATE_LIMIT_N

    t = load_tables(spark, sf_dir)
    uid_s = F.col("user_id").cast("string")
    token = (
        F.when(F.col("user_id") % 17 == 0, F.lit(None).cast("string"))
        .when(F.col("user_id") % 3 == 0, F.concat(F.lit("wx"), F.lpad(uid_s, 26, "0")))
        .when(
            F.col("user_id") % 3 == 1,
            F.concat_ws(
                "-",
                F.lpad(uid_s, 8, "0"),
                F.lpad(uid_s, 4, "0"),
                F.lpad(uid_s, 4, "0"),
                F.lpad(uid_s, 4, "0"),
                F.lpad(uid_s, 12, "0"),
            ),
        )
        .otherwise(F.concat(F.lit("sess:"), uid_s))
    )
    src = t["events"].select(
        "event_id",
        "user_id",
        "event_type",
        "ts",
        "value",
        token.alias("token"),
        F.date_trunc("day", "ts").alias("day"),
    )

    # Admission window FIRST: its keys (user_id, day, ts, event_id) are
    # wire-invariant, so running it before the codec changes nothing
    # semantically (the oracle replays the lifecycle in reference order
    # and still hash-matches) — but it means the window's own exchange
    # spreads the single-file scan across the cluster BEFORE the Python
    # stage, so the codec runs 32-way with ZERO added shuffles. (An
    # explicit pre-UDF repartition doesn't work: ArrowEvalPython erases
    # outputPartitioning, so EnsureRequirements re-shuffles anyway.)
    w = W.partitionBy("user_id", "day").orderBy("ts", "event_id")
    src = src.withColumn("admit", F.row_number().over(w) <= RATE_LIMIT_N)

    # --- the wire: encode the request envelope, then decode it back ---
    wired = src.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        "admit",
        roundtrip_envelope_udf(
            "event_type",
            F.lit("call"),
            F.coalesce("token", F.lit("\x00null")),  # msgpack str field;
            F.coalesce("token", F.lit("\x00null")),  # NULL marked by sentinel
        ).alias("env"),
    ).select(
        "event_id",
        "user_id",
        "ts",
        "value",
        "admit",
        F.col("env.mod").alias("event_type"),
        F.when(F.col("env.arg") == "\x00null", None).otherwise(F.col("env.arg")).alias("token"),
    )

    tok = F.col("token")
    uuid_shape = (
        (F.length(tok) == 36)
        & (F.substring(tok, 9, 1) == "-")
        & (F.substring(tok, 14, 1) == "-")
        & (F.substring(tok, 19, 1) == "-")
        & (F.substring(tok, 24, 1) == "-")
    )
    token_class = (
        F.when(tok.isNull(), "anonymous")
        .when(F.length(tok) == 28, "wx")
        .when(uuid_shape, "uuid")
        .otherwise("session")
    )
    classified = wired.withColumn("token_class", token_class)
    uid = (
        F.when(F.col("token_class") == "anonymous", F.lit(""))
        .when(F.col("token_class") == "uuid", tok)
        .when(F.col("user_id") % 5 != 2, F.concat(F.lit("u"), uid_s))
        .otherwise(F.lit(None).cast("string"))
    )
    admitted = classified.withColumn("uid", uid)
    status = (
        F.when(F.col("uid").isNull(), "307_auth_redirect")
        .when(~F.col("admit"), "429_rate_limited")
        .otherwise("200_dispatched")
    )
    zero = F.lit(0).cast("decimal(18,2)")
    return (
        admitted.withColumn("status", status)
        .groupBy("token_class", "status")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(
                F.when(F.col("status") == "200_dispatched", F.col("value").cast("decimal(18,2)")).otherwise(zero)
            )
            .cast("double")
            .alias("dispatched_value"),
        )
    )
