"""Relational core — scans, expressions, joins, aggregates, sorts, set ops.

Each operator is declared as a Catalyst logical plan (DataFrame API) so
pushdown/pruning/join-selection are automatic; the adjacent oracle SQL is
the ANSI equivalent DuckDB runs for the correctness gate.

Determinism rules used throughout (SURVEY §7.4):
- Sums/avgs over doubles go through an exact decimal cast whose scale
  covers the value's exact decimal width (fixture monetary values have
  2 decimals; 2dec×2dec products have 4), so aggregation is
  order-independent and the final double is identical in both engines.
- Timestamps are only exposed through date_trunc buckets (events.ts is
  ns in parquet; Spark sees µs — see session.py).
- Every output column is aliased identically in Spark and SQL.

Reference parity notes cite /root/reference/src/gateway.ts (file:line).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from hive_gateway_spark.registry import query
from hive_gateway_spark.session import load_tables


def dec(col, scale: int = 2):
    """Exact decimal cast for order-independent double aggregation."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")


# --- exact integer aggregation (r17 optimization round, guide §2.2) -------
#
# SUM over a decimal whose buffer precision exceeds 18 (Spark widens the
# sum buffer by +10 digits, so any dec(18,s) sum) drops HashAggregate off
# the vectorized fast path: every row pays a BigDecimal add, for EVERY
# aggregate in the operator, even the long-typed ones. Measured on TPC-H
# Q1 at sf0.1: 1.25 s for the decimal spelling vs 0.68 s with all sums
# long-buffered — 1.8x for the identical exact values.
#
# e_units(col, s) keeps the oracle's per-row decimal(18,s) HALF_UP
# rounding and then sums plain BIGINT 10^s-units. Where a single bigint
# could overflow at extreme scale, e_hi/e_lo split each per-row value at
# bit 20 (pure integer shiftright/mask; the identity v = (v>>20)*2^20 +
# (v&mask) holds for negatives too) into two bigint sums, recombined
# EXACTLY in decimal(38,0) on the group-sized output. Headroom at 100 TB
# (~6e11 lineitem rows, worst-case one group): lo < 2^20 so sum(lo) <=
# 6.3e17; hi <= v_max/2^20 (v_max ~1.2e11 for charge e6) so sum(hi) <=
# 6.9e16 — both far under 2^63 ~ 9.2e18. With ANSI on (Spark 4 default)
# any excursion beyond that throws instead of wrapping.
#
# e_double reconstructs CAST(SUM(decimal) AS DOUBLE) bit-identically:
# the decimal(38,0) e-units total divided by 10^s is exact (division
# result scale >= 6 >= s), and the final double cast is the same
# nearest-double of the same exact value the decimal spelling casts.

_E_SHIFT = 20
_E_MASK = (1 << _E_SHIFT) - 1


def e_units(col, scale: int = 2, prec: int = 18):
    """Per-row exact BIGINT in 10^scale units of the decimal(prec,scale)
    cast. The per-row cast keeps the oracle's HALF_UP rounding; prec>18
    callers must argue their per-row e-values fit a bigint — ANSI
    throws loudly if one ever doesn't."""
    c = F.col(col) if isinstance(col, str) else col
    return (c.cast(f"decimal({prec},{scale})") * (10**scale)).cast("bigint")


def e_hi(e):
    """High half of an e_units column for the split bigint sum."""
    return F.shiftright(e, _E_SHIFT)


def e_lo(e):
    """Low half (in [0, 2^20)) of an e_units column."""
    return e.bitwiseAND(F.lit(_E_MASK))


def e_total(hi_sum, lo_sum):
    """Exact decimal(38,0) e-units total from the two split sums."""
    d = "decimal(38,0)"
    return hi_sum.cast(d) * (1 << _E_SHIFT) + lo_sum.cast(d)


def e_double(total_e, scale: int = 2):
    """CAST(SUM(decimal) AS DOUBLE), reconstructed from exact e-units."""
    return (total_e.cast("decimal(38,0)") / (10**scale)).cast("double")


# ---------------------------------------------------------------------------
# Scans & projection (ref O19/O20: envelope decode + field projection,
# gateway.ts:184-194 → parquet scan + column pruning + pushed filter).
# ---------------------------------------------------------------------------

@query(
    "q_scan_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           CAST(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS DOUBLE) AS net_price
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1996-01-01'
    """,
)
def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan + projection + pushed filter. The filter and the 4-column
    ReadSchema reach the parquet scan (asserted in tests/test_plans.py)."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .filter(F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            dec(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
            .cast("double")
            .alias("net_price"),
        )
    )


@query(
    "q_filter_predicate",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE event_type = 'purchase' AND value > 100.0
    """,
)
def q_filter_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound predicate filter (ref O18 method gate, gateway.ts:183)."""
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .filter((F.col("event_type") == "purchase") & (F.col("value") > 100.0))
        .select("event_id", "user_id", "event_type", "value")
    )


# ---------------------------------------------------------------------------
# Scalar expressions.
# ---------------------------------------------------------------------------

@query(
    "q_expr_string",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           length(c_name) AS name_len,
           substr(c_name, 1, length(c_name) - 1)
             || CAST(CAST(substr(c_name, length(c_name), 1) AS INTEGER) + 1 AS VARCHAR)
             AS addr_next,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded,
           reverse(c_name) AS rev_name,
           repeat('-', 3) || c_name AS dashed,
           split_part(c_name, '#', 2) AS name_num,
           strpos(c_name, '#') AS hash_pos,
           translate(c_name, '#', '_') AS underscored,
           left(c_name, 8) AS prefix8,
           right(c_name, 3) AS suffix3
    FROM customer
    """,
)
def q_expr_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String expr suite replicating the reference's connect_address
    rewrite (gateway.ts:45-53): increment the last digit of a string —
    including its digit-9 lengthening quirk ('…9' → '…10'), which we
    reproduce faithfully as documented semantics (SURVEY §7.4.4).

    Also carries the extended string-function surface (lpad/reverse/
    repeat/split_part/strpos/translate/left/right — q_expr_string2's
    family) so the whole string suite is driver-verified from one
    contract window slot; q_expr_string2 itself stays in the local
    parity gate past the window (registry.PRIORITY note)."""
    t = load_tables(spark, sf_dir)
    c = t["customer"]
    last = F.substring(F.col("c_name"), -1, 1)
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.length("c_name").alias("name_len"),
        F.concat(
            F.expr("substring(c_name, 1, length(c_name) - 1)"),
            (last.cast("int") + 1).cast("string"),
        ).alias("addr_next"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded"),
        F.reverse("c_name").alias("rev_name"),
        F.concat(F.lit("---"), F.col("c_name")).alias("dashed"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("name_num"),
        F.instr("c_name", "#").cast("bigint").alias("hash_pos"),
        F.translate("c_name", "#", "_").alias("underscored"),
        F.substring("c_name", 1, 8).alias("prefix8"),
        F.substring(F.col("c_name"), -3, 3).alias("suffix3"),
    )


@query(
    "q_expr_case",
    oracle="""
    SELECT CASE
             WHEN length(c_name) = 28 THEN 'wx'
             WHEN length(c_name) = 36
                  AND substr(c_name, 9, 1) = '-' AND substr(c_name, 14, 1) = '-'
                  AND substr(c_name, 19, 1) = '-' AND substr(c_name, 24, 1) = '-'
               THEN 'uuid'
             WHEN c_acctbal < 0 THEN 'session_debit'
             WHEN c_acctbal < 5000 THEN 'session_low'
             ELSE 'session_high'
           END AS token_class,
           COUNT(*) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
    FROM customer
    GROUP BY 1
    """,
)
def q_expr_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-branch CASE — the reference's 3-way token classifier
    (gateway.ts:203, 225-226: len==28 → WeChat, 36 w/ dashes at
    9/14/19/24 (1-based) → raw-uuid rescue, else session token),
    extended with value sub-classes so every branch is populated."""
    t = load_tables(spark, sf_dir)
    c = t["customer"]
    name = F.col("c_name")
    uuid_shape = (
        (F.length(name) == 36)
        & (F.substring(name, 9, 1) == "-")
        & (F.substring(name, 14, 1) == "-")
        & (F.substring(name, 19, 1) == "-")
        & (F.substring(name, 24, 1) == "-")
    )
    cls = (
        F.when(F.length(name) == 28, "wx")
        .when(uuid_shape, "uuid")
        .when(F.col("c_acctbal") < 0, "session_debit")
        .when(F.col("c_acctbal") < 5000, "session_low")
        .otherwise("session_high")
    )
    return (
        c.groupBy(cls.alias("token_class"))
        .agg(
            F.count("*").alias("n"),
            F.sum(dec("c_acctbal")).cast("double").alias("sum_bal"),
        )
    )


@query(
    "q_expr_coalesce",
    oracle="""
    SELECT c.c_custkey,
           COALESCE(o.n_urgent, 0) AS n_urgent,
           COALESCE(o.urgent_total, 0.0) AS urgent_total
    FROM customer c
    LEFT JOIN (
        SELECT o_custkey,
               COUNT(*) AS n_urgent,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS urgent_total
        FROM orders
        WHERE o_orderpriority = '1-URGENT'
        GROUP BY o_custkey
    ) o ON c.c_custkey = o.o_custkey
    """,
)
def q_expr_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COALESCE over a left-join miss — the reference's dispatch context
    builds ip = coalesce(x-forwarded-for, remoteAddress)
    (gateway.ts:211-215); here: per-customer urgent-order totals with
    0-defaults for customers that never placed an urgent order."""
    t = load_tables(spark, sf_dir)
    urgent = (
        t["orders"]
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_urgent"),
            F.sum(dec("o_totalprice")).cast("double").alias("urgent_total"),
        )
    )
    return (
        t["customer"]
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(
            "c_custkey",
            F.coalesce("n_urgent", F.lit(0)).alias("n_urgent"),
            F.coalesce("urgent_total", F.lit(0.0)).alias("urgent_total"),
        )
    )


@query(
    "q_expr_regex",
    oracle=r"""
    SELECT doc_id, lang,
           regexp_extract(text, '\b(scan|join|filter)\b', 0) AS first_op
    FROM documents
    WHERE regexp_matches(text, '\bjoin\b')
    """,
)
def q_expr_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex predicate + extract — the reference's Accept-Encoding
    word-boundary matcher (gateway.ts:83,94: /\bdeflate\b/)."""
    t = load_tables(spark, sf_dir)
    return (
        t["documents"]
        .filter(F.col("text").rlike(r"\bjoin\b"))
        .select(
            "doc_id",
            "lang",
            F.regexp_extract("text", r"\b(scan|join|filter)\b", 0).alias("first_op"),
        )
    )


@query(
    "q_json_extract",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(props->>'$.k' AS INTEGER)) AS BIGINT) AS sum_k,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read JSON extraction — the reference's untyped msgpack
    `arg` (gateway.ts:192) carried as a JSON string column."""
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .select(
            "event_type",
            F.get_json_object("props", "$.k").cast("int").alias("k"),
        )
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count("*").alias("n"))
    )


# ---------------------------------------------------------------------------
# Joins (ref O21/O24/O25: route/auth lookup joins → broadcast hash joins;
# miss branches → anti joins).
# ---------------------------------------------------------------------------

@query(
    "q_join_broadcast",
    oracle="""
    SELECT n.n_name AS route_mod,
           COUNT(*) AS n_calls,
           CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events e
    JOIN nation n ON (e.user_id % 25) = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension lookup join — the reference's route table routes[mod]
    (gateway.ts:195, 289-293). The dim side is broadcast (plan asserted
    in tests): at 100 TB the fact side never shuffles for this join."""
    t = load_tables(spark, sf_dir)
    e = t["events"].withColumn("mod_key", F.pmod(F.col("user_id"), F.lit(25)).cast("int"))
    return (
        e.join(F.broadcast(t["nation"]), e.mod_key == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("route_mod"))
        .agg(
            F.count("*").alias("n_calls"),
            F.sum(dec("value")).cast("double").alias("total_value"),
        )
    )


@query(
    "q_join_left",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, c.c_mktsegment,
           COALESCE(c.c_mktsegment, 'UNKNOWN') AS segment
    FROM orders o
    LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 0) c
      ON o.o_custkey = c.c_custkey
    """,
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer lookup join with misses — the reference's token→uid
    resolution (gateway.ts:204, 236): found → enrich, miss → null."""
    t = load_tables(spark, sf_dir)
    pos_cust = t["customer"].filter(F.col("c_acctbal") > 0)
    return (
        t["orders"]
        .join(pos_cust, F.col("o_custkey") == F.col("c_custkey"), "left")
        .select(
            "o_orderkey",
            "o_totalprice",
            "c_mktsegment",
            F.coalesce("c_mktsegment", F.lit("UNKNOWN")).alias("segment"),
        )
    )


@query(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0)
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join — "authorized only" (ref O24: token found in the
    auth dimension → proceed)."""
    t = load_tables(spark, sf_dir)
    big = t["orders"].filter(F.col("o_totalprice") > 300000.0)
    return (
        t["customer"]
        .join(big, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


@query(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0)
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join — the miss branch (ref O21 module-not-found 404 /
    O24 unauthorized 307, gateway.ts:296-298, 219-221)."""
    t = load_tables(spark, sf_dir)
    big = t["orders"].filter(F.col("o_totalprice") > 300000.0)
    return (
        t["customer"]
        .join(big, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


@query(
    "q_join_multiway",
    oracle="""
    SELECT r.r_name AS region,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE)
             AS revenue
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey   = c.c_custkey
    JOIN lineitem l ON l.l_orderkey  = o.o_orderkey
    GROUP BY r.r_name
    """,
)
def q_join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-table star join (TPC-H Q5 shape), written FACT-FIRST so the
    left-deep join tree the planner keeps (join reorder/CBO is off by
    default) is the one a 100 TB run wants: lineitem⋈orders keys on
    o_orderkey (high-cardinality — shuffles cleanly at scale, BHJ
    locally), then customer, and the nation/region dims broadcast.

    The previous region-first spelling made Catalyst broadcast every
    right side INCLUDING LINEITEM (a 600k-row broadcast build per run
    at sf0.1 — measured as the whole 1.5 s warm cost), and at scale
    its customer⋈nation step would shuffle the customer table on a
    25-value key (catastrophic skew). Fact-first fixes both; r16
    optimization round, guide §3.1/§2.5."""
    t = load_tables(spark, sf_dir)
    rev_e4 = e_units(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region"))
        # r17 (§2.2): split bigint e4 sums (5 region groups would blow
        # a single bigint's e4 headroom at 100 TB) keep the aggregate
        # vectorized; recombined exactly per region — see e_units.
        .agg(
            F.count("*").alias("n_items"),
            F.sum(e_hi(rev_e4)).alias("r_hi"),
            F.sum(e_lo(rev_e4)).alias("r_lo"),
        )
        .select(
            "region",
            "n_items",
            e_double(e_total(F.col("r_hi"), F.col("r_lo")), 4).alias("revenue"),
        )
    )


@query(
    "q_join_range",
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_shipped_90d,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty_90d
    FROM orders o
    JOIN lineitem l
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate < o.o_orderdate + INTERVAL 90 DAY
    GROUP BY o.o_orderpriority
    """,
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (non-equi) join — beyond the reference (SURVEY §2.2 marks it
    an engine feature). Implemented as an equi join on the key with the
    range as a residual predicate, so it still hash-partitions on
    l_orderkey at scale instead of degenerating to a cross product."""
    t = load_tables(spark, sf_dir)
    o, l = t["orders"], t["lineitem"]
    cond = (
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") >= F.col("o_orderdate"))
        & (F.col("l_shipdate") < F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
    )
    return (
        o.join(l, cond)
        .groupBy("o_orderpriority")
        # r17 (§2.2): single bigint e2 sum (qty ≤ 50/row keeps ~1e15
        # rows of headroom per group) — vectorized buffer, see e_units.
        .agg(
            F.count("*").alias("n_shipped_90d"),
            F.sum(e_units("l_quantity")).alias("qty_e2"),
        )
        .select(
            "o_orderpriority",
            "n_shipped_90d",
            e_double(F.col("qty_e2")).alias("qty_90d"),
        )
    )


# ---------------------------------------------------------------------------
# Aggregation (ref O16 windowed count is the only reference agg; the rest
# is the engine's mandate).
# ---------------------------------------------------------------------------

@query(
    "q_agg_group",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
             AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_charge,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_qty,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash aggregate, TPC-H Q1 shape: partial (map-side) + final agg —
    at 100 TB the shuffle carries only group keys × partial states.

    r17 (§2.2): bigint e-unit sums keep the vectorized hash-map path —
    same rewrite and exactness proof as q_tpch_q1 (see e_units)."""
    t = load_tables(spark, sf_dir)
    l = t["lineitem"].filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc * (1 + F.col("l_tax"))
    dp_e4 = e_units(disc, 4)
    ch_e6 = e_units(charge, 6)
    agg = l.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(e_units("l_quantity")).alias("qty_e2"),
        F.sum(e_units("l_extendedprice")).alias("price_e2"),
        F.sum(e_hi(dp_e4)).alias("dp_hi"),
        F.sum(e_lo(dp_e4)).alias("dp_lo"),
        F.sum(e_hi(ch_e6)).alias("ch_hi"),
        F.sum(e_lo(ch_e6)).alias("ch_lo"),
        F.count("*").alias("count_order"),
    )
    sum_qty = e_double(F.col("qty_e2"))
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        sum_qty.alias("sum_qty"),
        e_double(F.col("price_e2")).alias("sum_base_price"),
        e_double(e_total(F.col("dp_hi"), F.col("dp_lo")), 4).alias(
            "sum_disc_price"
        ),
        e_double(e_total(F.col("ch_hi"), F.col("ch_lo")), 6).alias(
            "sum_charge"
        ),
        (sum_qty / F.col("count_order")).cast("double").alias("avg_qty"),
        "count_order",
    )


@query(
    "q_agg_distinct",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(*) AS n_events,
           COUNT(DISTINCT date_trunc('day', ts)) AS n_days
    FROM events
    GROUP BY event_type
    """,
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-distinct aggregate (ref O16 keyspace: distinct tokens)."""
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
            F.countDistinct(F.date_trunc("day", "ts")).alias("n_days"),
        )
    )


@query(
    "q_agg_having",
    oracle="""
    SELECT user_id, date_trunc('day', ts) AS day, COUNT(*) AS n_calls
    FROM events
    GROUP BY user_id, date_trunc('day', ts)
    HAVING COUNT(*) > 5
    """,
)
def q_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter — "rate-limit violators": callers whose
    per-day volume exceeds the cap (ref O16's LLEN < limit gate,
    gateway.ts:144, lifted from 1 s to 1 d for fixture density)."""
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy("user_id", F.date_trunc("day", "ts").alias("day"))
        .agg(F.count("*").alias("n_calls"))
        .filter(F.col("n_calls") > 5)
    )


@query(
    "q_agg_rollup",
    oracle="""
    SELECT event_type, date_trunc('day', ts) AS day,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY ROLLUP (event_type, date_trunc('day', ts))
    """,
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets — the traffic report the reference's log
    consumers would derive from O2's event stream.

    Pre-aggregated at the LEAF grain first (r16 optimization round,
    guide §2.3 shuffle/compute fewer bytes): Spark's Expand multiplies
    its input ×(levels+1) BEFORE the grouping aggregate, so rolling up
    raw events pays the expand+hash on every fact row per level; the
    leaf aggregate collapses the fact to ≤ types·days rows and the
    rollup (sums of sums — exact) expands only those."""
    t = load_tables(spark, sf_dir)
    leaf = (
        t["events"]
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(F.count("*").alias("cnt"), F.sum(dec("value")).alias("sv"))
    )
    return (
        leaf.rollup("event_type", "day")
        .agg(
            F.sum("cnt").alias("n"),
            F.sum("sv").cast("double").alias("total_value"),
        )
    )


@query(
    "q_agg_cube",
    oracle="""
    SELECT event_type, date_trunc('day', ts) AS day,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY CUBE (event_type, date_trunc('day', ts))
    """,
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over the same dimensions — leaf pre-aggregated like
    q_agg_rollup (CUBE's Expand is ×4, so the saving doubles)."""
    t = load_tables(spark, sf_dir)
    leaf = (
        t["events"]
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(F.count("*").alias("cnt"), F.sum(dec("value")).alias("sv"))
    )
    return (
        leaf.cube("event_type", "day")
        .agg(
            F.sum("cnt").alias("n"),
            F.sum("sv").cast("double").alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# Sort / limit / top-k and set operations (ref O27: per-status rejection
# branches unioned into one audit table).
# ---------------------------------------------------------------------------

@query(
    "q_sort_limit_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 20
    """,
)
def q_sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k. Spark plans TakeOrderedAndProject: per-partition
    heaps + driver merge of k rows — no full sort at 100 TB."""
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(20)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "q_set_union",
    oracle="""
    SELECT 'purchase' AS branch, event_id, user_id, value FROM events
    WHERE event_type = 'purchase'
    UNION ALL
    SELECT 'high_value' AS branch, event_id, user_id, value FROM events
    WHERE value > 200.0
    """,
)
def q_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of tagged branches — the reference's per-status
    rejection side-outputs merged into one audit stream (O27)."""
    t = load_tables(spark, sf_dir)
    e = t["events"]
    a = e.filter(F.col("event_type") == "purchase").select(
        F.lit("purchase").alias("branch"), "event_id", "user_id", "value"
    )
    b = e.filter(F.col("value") > 200.0).select(
        F.lit("high_value").alias("branch"), "event_id", "user_id", "value"
    )
    return a.unionAll(b)


@query(
    "q_set_intersect",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'click'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
)
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): users seen on both branches."""
    t = load_tables(spark, sf_dir)
    e = t["events"]
    clicks = e.filter(F.col("event_type") == "click").select("user_id")
    buys = e.filter(F.col("event_type") == "purchase").select("user_id")
    return clicks.intersect(buys)


@query(
    "q_set_except",
    oracle="""
    SELECT user_id, date_trunc('day', ts) AS day
    FROM events WHERE event_type = 'click'
    EXCEPT
    SELECT user_id, date_trunc('day', ts) AS day
    FROM events WHERE event_type = 'purchase'
    """,
)
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): (user, day) pairs with clicks but no purchase
    (finer grain than user-level so the result is non-empty at every sf)."""
    t = load_tables(spark, sf_dir)
    e = t["events"]
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    )
    buys = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    )
    return clicks.subtract(buys)  # EXCEPT (distinct) semantics


@query(
    "q_tpch_q3",
    oracle="""
    SELECT l.l_orderkey,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE)
             AS revenue,
           o.o_orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15'
      AND l.l_shipdate  > TIMESTAMP '1995-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderdate ASC, l.l_orderkey ASC
    LIMIT 10
    """,
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping-priority top-10): selective dim filter →
    two-way fact join → grouped revenue → deterministic top-k. The
    customer filter broadcasts; Catalyst pushes both date predicates to
    the scans; the final order has full tie-breaks so LIMIT is stable."""
    t = load_tables(spark, sf_dir)
    c = t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    o = t["orders"].filter(F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp"))
    l = t["lineitem"].filter(F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp"))
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        # r17 (§2.2): single bigint e4 sum — per-order groups hold ≤ 7
        # lines, so the sum is bounded by ~7e9 at any scale; the bigint
        # buffer keeps this high-cardinality aggregate vectorized (see
        # e_units). e_double reconstructs the identical double.
        .agg(
            F.sum(
                e_units(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
            ).alias("rev_e4")
        )
        .select(
            "l_orderkey",
            e_double(F.col("rev_e4"), 4).alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderdate").asc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@query(
    "q_promo_revenue",
    oracle="""
    SELECT date_trunc('month', l_shipdate) AS ship_month,
           CAST(SUM(CASE WHEN p_type = 'PROMO'
                         THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             AS promo_revenue,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
             AS total_revenue,
           ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                         THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                 / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE),
                 4) AS promo_share_pct
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    GROUP BY 1
    """,
)
def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion revenue share, monthly): fact ⋈
    broadcast `part` dim (closes the last untouched fixture table —
    VERDICT r01 "What's missing" #5). Exact-decimal revenue sums, one
    shuffle for the monthly rollup; the dim join is a BHJ (plan-asserted
    in tests/test_plans.py) so the fact table never shuffles for it."""
    t = load_tables(spark, sf_dir)
    # r17 (§2.2): split bigint e4 sums (monthly groups can hold ~1e10
    # rows at 100 TB, past a single bigint's e4 headroom) keep the
    # aggregate vectorized; recombined exactly per month — see e_units.
    rev_e4 = e_units(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
    is_promo = F.col("p_type") == "PROMO"
    zero = F.lit(0).cast("bigint")
    j = t["lineitem"].join(
        F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey")
    )
    agg = j.groupBy(F.date_trunc("month", "l_shipdate").alias("ship_month")).agg(
        F.sum(F.when(is_promo, e_hi(rev_e4)).otherwise(zero)).alias("p_hi"),
        F.sum(F.when(is_promo, e_lo(rev_e4)).otherwise(zero)).alias("p_lo"),
        F.sum(e_hi(rev_e4)).alias("t_hi"),
        F.sum(e_lo(rev_e4)).alias("t_lo"),
    )
    promo = e_double(e_total(F.col("p_hi"), F.col("p_lo")), 4)
    total = e_double(e_total(F.col("t_hi"), F.col("t_lo")), 4)
    return agg.select(
        "ship_month",
        promo.alias("promo_revenue"),
        total.alias("total_revenue"),
        F.round(100.0 * promo / total, 4).alias("promo_share_pct"),
    )


@query(
    "q_tpch_q10",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(1.0 - l.l_discount AS DECIMAL(18,2)))
                AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): the top-20 customers by
    revenue lost to returns, with nation — the classic two-fact-join
    reporting query beside q_tpch_q3 and q_promo_revenue (Q14).

    Scale shape: lineitem filters on the return flag AT THE SCAN
    (pushed predicate), the orders⋈lineitem fact join shuffles on
    orderkey, customer and nation ride as broadcasts, and the top-20
    is TakeOrdered — never a global sort. Revenue folds in exact
    DECIMAL (house rule), surfacing once as double."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].filter(F.col("l_returnflag") == "R")
    rev = F.sum(
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1.0) - F.col("l_discount")).cast("decimal(18,2)")
    ).cast("double")
    return (
        li.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(t["customer"]),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(t["nation"]),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(rev.alias("revenue"), F.count("*").alias("n_items"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@query(
    "q_late_ship_report",
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_late_orders
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    )
    GROUP BY o.o_orderpriority
    """,
)
def q_late_ship_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4's shape on the fixture's columns: orders with at least
    one lineitem shipped more than 90 days after the order date,
    counted by priority — the fulfillment-SLA report, and the
    registry's EXISTS-correlated-to-semi-join exemplar on a FACT-FACT
    pair (q_join_semi does it on a dimension).

    Scale shape: Catalyst decorrelates the EXISTS into a left-semi
    join shuffled on orderkey — each order at most once no matter how
    many late items (the semantic COUNT(DISTINCT) would otherwise
    need); the 5-row priority aggregate finishes map-side."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT o.o_orderpriority,
               COUNT(*) AS n_late_orders
        FROM orders o
        WHERE EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
        )
        GROUP BY o.o_orderpriority
        """
    )


@query(
    "q_tpch_q5",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local-supplier volume): revenue per nation where the
    ordering customer and the supplying supplier share a nation inside
    one region-year. The classic six-way snowflake join: region→nation
    prune broadcasts into supplier, the customer/supplier nation
    equality rides ON the lineitem⋈supplier join (never a post-filter
    on a wider join), and the date range is pushed to the orders scan.
    Dims broadcast; the only shuffles are the two fact joins keyed on
    orderkey/custkey. Exact-decimal revenue fold."""
    t = load_tables(spark, sf_dir)
    n = (
        t["nation"]
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    s = t["supplier"].join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    j = (
        t["customer"]
        .join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
    )
    # r17 (§2.2): split bigint e4 sums (≤ 5 nation groups at 100 TB
    # exceed a single bigint's e4 headroom) — vectorized buffer,
    # recombined exactly per nation; see e_units.
    rev_e4 = e_units(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
    return (
        j.groupBy("n_name")
        .agg(F.sum(e_hi(rev_e4)).alias("r_hi"), F.sum(e_lo(rev_e4)).alias("r_lo"))
        .select(
            "n_name",
            e_double(e_total(F.col("r_hi"), F.col("r_lo")), 4).alias("revenue"),
        )
    )


#: Q18 large-order quantity threshold (fixture 99th pct ≈ 262, max 458).
_Q18_QTY = 300


@query(
    "q_tpch_q18",
    oracle=f"""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           o.o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             AS total_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > {_Q18_QTY}
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
             o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderdate ASC, o.o_orderkey ASC
    LIMIT 100
    """,
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): orders whose total lineitem
    quantity exceeds the threshold, with customer attribution, top-100
    by order value. The IN-subquery is expressed as an aggregate →
    LeftSemi join (decorrelated by construction); the qualifying-order
    set is a HAVING-filtered aggregate of the fact table — tiny — so
    Catalyst broadcasts it into the semi join, and the big
    fact-to-fact orderkey join happens only for qualifying orders.
    Quantity folds in exact DECIMAL; the top-100 is TakeOrdered with
    full tie-breaks (plan-asserted)."""
    t = load_tables(spark, sf_dir)
    # r17 (§2.2): both per-order aggregates sum bigint e2 quantity
    # units (≤ 7 lines/order bounds the sum at ~3.5e4 — no overflow at
    # any scale) so the fact-sized hash aggregates stay vectorized; the
    # HAVING threshold compares exact integers (q > 300 ⟺ e2 > 30000).
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum(e_units("l_quantity")).alias("q_e2"))
        .filter(F.col("q_e2") > _Q18_QTY * 100)
        .select(F.col("l_orderkey").alias("bk"))
    )
    j = (
        t["orders"]
        .join(big, F.col("o_orderkey") == F.col("bk"), "left_semi")
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
    )
    return (
        j.groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(e_units("l_quantity")).alias("tq_e2"))
        .withColumn("total_qty", e_double(F.col("tq_e2")))
        .drop("tq_e2")
        .orderBy(
            F.col("o_totalprice").desc(),
            F.col("o_orderdate").asc(),
            F.col("o_orderkey").asc(),
        )
        .limit(100)
    )


@query(
    "q_tpch_q6",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4)))
                AS DOUBLE) AS forecast_revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): the pure scan-filter-
    aggregate exemplar — every predicate pushes to the parquet scan
    (plan-asserted), no join, no window, ONE map-side-combined
    aggregate; revenue folds in exact decimal. The query whose plan
    shows what predicate pushdown is worth at 100 TB: three pushed
    ranges prune row groups before a single row deserializes."""
    t = load_tables(spark, sf_dir)
    l = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return l.agg(
        F.sum(dec(F.col("l_extendedprice") * F.col("l_discount"), 4))
        .cast("double")
        .alias("forecast_revenue"),
        F.count("*").alias("n_items"),
    )


@query(
    "q_tpch_q13",
    oracle="""
    WITH per_cust AS (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey
         AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM per_cust
    GROUP BY c_count
    """,
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution): LEFT join so
    never-ordered customers survive with count 0, the join predicate
    (priority exclusion) living ON the join — not a post-filter, which
    would silently delete the zero-order customers — then the classic
    two-phase aggregate: per-customer counts, then the histogram.

    Scale shape: one custkey-keyed shuffle join (both sides partition
    on the key), one custkey partial-agg riding the same partitioning,
    and a tiny histogram aggregate. COUNT(o_orderkey) counts matched
    rows only — the LEFT-join null-counting trap both engines must
    agree on (they do; it's ANSI)."""
    t = load_tables(spark, sf_dir)
    o = t["orders"].filter(F.col("o_orderpriority") != "1-URGENT")
    per = (
        t["customer"]
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "q_tpch_q1",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                         AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 (pricing summary report) — THE canonical warehouse
    aggregate: one pushed shipdate predicate, a 2-key group over the
    whole fact table, eight aggregates per group. Every sum folds in
    exact decimal (scale covering each expression's true decimal
    width: qty/price 2 dp, price·(1−disc) 4 dp, ·(1+tax) 6 dp — the
    products are single IEEE expressions identical in both engines
    before the cast); averages are one exact-sum-over-exact-count IEEE
    division each.

    Scale shape: scan (predicate pushed, 7 columns read) → map-side
    partial aggregate → exchange on the 4-group key → final aggregate.
    The shuffle carries 4 partial states, not rows — the purest
    demonstration that a 100 TB group-by costs one scan.

    r17 (§2.2): every sum folds the same per-row decimal(18,s) values
    as exact BIGINT 10^s-units so the aggregate keeps the vectorized
    hash-map path (a single >18-precision decimal buffer forces a
    BigDecimal add per row for ALL eight aggregates — measured 1.57 →
    0.88 s). qty/price/discount e2 sums fit a single bigint at 100 TB;
    disc_price e4 and charge e6 split at bit 20 (e_hi/e_lo) and
    recombine exactly over the 4 output rows. Values bit-identical —
    see e_units/e_double for the envelope and reconstruction proof."""
    t = load_tables(spark, sf_dir)
    l = t["lineitem"].filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    dp_e4 = e_units(disc_price, 4)
    ch_e6 = e_units(charge, 6)
    n = F.count("*")
    agg = l.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(e_units("l_quantity")).alias("qty_e2"),
        F.sum(e_units("l_extendedprice")).alias("price_e2"),
        F.sum(e_hi(dp_e4)).alias("dp_hi"),
        F.sum(e_lo(dp_e4)).alias("dp_lo"),
        F.sum(e_hi(ch_e6)).alias("ch_hi"),
        F.sum(e_lo(ch_e6)).alias("ch_lo"),
        F.sum(e_units("l_discount")).alias("disc_e2"),
        n.alias("count_order"),
    )
    n_d = F.col("count_order").cast("double")
    sum_qty = e_double(F.col("qty_e2"))
    sum_price = e_double(F.col("price_e2"))
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        sum_qty.alias("sum_qty"),
        sum_price.alias("sum_base_price"),
        e_double(e_total(F.col("dp_hi"), F.col("dp_lo")), 4).alias(
            "sum_disc_price"
        ),
        e_double(e_total(F.col("ch_hi"), F.col("ch_lo")), 6).alias(
            "sum_charge"
        ),
        (sum_qty / n_d).alias("avg_qty"),
        (sum_price / n_d).alias("avg_price"),
        (e_double(F.col("disc_e2")) / n_d).alias("avg_disc"),
        "count_order",
    )


@query(
    "q_tpch_q12",
    oracle="""
    SELECT l.l_linestatus AS linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_priority_lines,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_priority_lines
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    GROUP BY l.l_linestatus
    """,
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12's shape on the fixture's columns (the fixture carries
    no l_shipmode/commit/receipt dates, so "late" is ship > order + 60d
    and the mode dimension is l_linestatus): per line status, order
    lines split into high- vs low-priority counts — the conditional-
    aggregation-over-a-fact-join exemplar (CASE inside SUM, not a
    second scan per branch).

    Scale shape: one orderkey-keyed shuffle join between the two fact
    tables (both sides prune to three columns — ReadSchema-asserted
    family), the date predicate evaluates in the join's residual, and
    the 2-row aggregate finishes map-side. No window, no broadcast of
    a fact side."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT l.l_linestatus AS linestatus,
               SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS high_priority_lines,
               SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS low_priority_lines
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
        GROUP BY l.l_linestatus
        """
    )


@query(
    "q_tpch_q19",
    oracle="""
    SELECT CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue, disjunctive predicates) on the
    fixture's columns (no p_container/l_shipmode/l_shipinstruct — the
    brand/size/quantity OR-of-ANDs is the part Catalyst has to work
    for): three disjoint brand branches, each with its own size and
    quantity band.

    Scale shape: the optimizer extracts the COMMON constraints of the
    disjunction for pushdown (p_size BETWEEN 1 AND 15, l_quantity
    BETWEEN 1 AND 30 reach the scans as PushedFilters) while the full
    OR evaluates in the join residual — the classic "derive pushable
    conjuncts from a disjunction" rewrite. part joins broadcast
    (dimension-sized); revenue folds in exact decimal."""
    t = load_tables(spark, sf_dir)
    branch = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#34")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    j = t["lineitem"].join(
        F.broadcast(t["part"]), F.col("p_partkey") == F.col("l_partkey")
    )
    return j.filter(branch).agg(
        F.sum(dec(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4))
        .cast("double")
        .alias("revenue"),
        F.count("*").alias("n_items"),
    )


@query(
    "q_tpch_q7",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(YEAR(l.l_shipdate) AS BIGINT) AS l_year,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY n1.n_name, n2.n_name, CAST(YEAR(l.l_shipdate) AS BIGINT)
    """,
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): bilateral trade revenue between two
    nations by ship year — the two-fact-plus-four-dimension join
    exemplar with a symmetric disjunctive nation predicate.

    Scale shape: lineitem-orders is the one fact-fact shuffle
    (orderkey); supplier/customer/nation are dimension broadcasts; the
    nation-pair disjunction evaluates post-join (its component
    IN-lists push to the dimension scans); revenue folds in exact
    decimal; ≤ 2 nations × 2 years of output rows."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(YEAR(l.l_shipdate) AS BIGINT) AS l_year,
               CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                             AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM lineitem l
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
        JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
        WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
            OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
          AND l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY n1.n_name, n2.n_name, CAST(YEAR(l.l_shipdate) AS BIGINT)
        """
    )


@query(
    "q_tpch_q8",
    oracle="""
    WITH base AS (
        SELECT CAST(YEAR(o.o_orderdate) AS BIGINT) AS o_year,
               CAST(l.l_extendedprice * (1 - l.l_discount)
                    AS DECIMAL(18,4)) AS volume,
               n1.n_name AS supp_nation
        FROM lineitem l
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN part p     ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
        JOIN region r   ON r.r_regionkey = n2.n_regionkey
        JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
        WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
    )
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_3'
                         THEN volume ELSE CAST(0 AS DECIMAL(18,4)) END)
                AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) AS mkt_share,
           CAST(SUM(volume) AS DOUBLE) AS total_volume
    FROM base
    GROUP BY o_year
    """,
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): within one region's customers
    and one part type, the share of yearly revenue supplied by one
    nation — the deepest dimension chain in the registry (two facts +
    five dimensions, the customer side resolving through nation →
    region).

    Determinism: volumes fold in exact decimal; the share divides the
    two exact-decimal-derived doubles once per 2-row year group.

    Scale shape: one orderkey fact-fact shuffle; part/supplier/
    customer/nation/region broadcast (the region and type filters
    prune the broadcast builds first); conditional decimal aggregation
    instead of a second scan for the numerator."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        WITH base AS (
            SELECT CAST(YEAR(o.o_orderdate) AS BIGINT) AS o_year,
                   CAST(l.l_extendedprice * (1 - l.l_discount)
                        AS DECIMAL(18,4)) AS volume,
                   n1.n_name AS supp_nation
            FROM lineitem l
            JOIN orders o   ON o.o_orderkey = l.l_orderkey
            JOIN part p     ON p.p_partkey = l.l_partkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
            JOIN region r   ON r.r_regionkey = n2.n_regionkey
            JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
            WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
        )
        SELECT o_year,
               CAST(SUM(CASE WHEN supp_nation = 'NATION_3'
                             THEN volume ELSE CAST(0 AS DECIMAL(18,4)) END)
                    AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE) AS mkt_share,
               CAST(SUM(volume) AS DOUBLE) AS total_volume
        FROM base
        GROUP BY o_year
        """
    )


@query(
    "q_tpch_q15",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               SUM(CAST(l_extendedprice * (1 - l_discount)
                        AS DECIMAL(18,4))) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(r.total_revenue AS DOUBLE) AS total_revenue
    FROM supplier s
    JOIN revenue r ON r.supplier_no = s.s_suppkey
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): the supplier(s) whose 3-month revenue
    equals the maximum — the scalar-subquery-over-an-aggregate
    exemplar (the reference's view; a CTE is the modern spelling).

    Determinism: the quarter's revenue per supplier folds in exact
    decimal, and the max-equality compares DECIMALS (exact), not
    doubles — ties, if any, all surface.

    Scale shape: one suppkey-keyed partial aggregate over the pruned
    scan (ship-date range pushes down), STAGED once (the revenue table
    is suppliers-sized — exactly what any engine materializes for
    max-equality queries); the 1-row max and the final filter both
    read the checkpoint, so lineitem scans ONCE. Both the scalar-
    subquery SQL spelling and the shared-DataFrame spelling planned
    the scan + aggregate TWICE (neither static exchange reuse nor
    AQE's stage cache deduped them — measured); staging is the form
    that provably doesn't. Plan-asserted: zero lineitem file scans in
    the registered query's own plan."""
    from hive_gateway_spark.staging import stage

    t = load_tables(spark, sf_dir)
    rev = stage(
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(dec(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4))
            .alias("total_revenue")
        ),
        "tpch_q15.revenue",
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.join(F.broadcast(mx), rev["total_revenue"] == mx["mx"])
        .join(
            F.broadcast(t["supplier"]),
            F.col("supplier_no") == F.col("s_suppkey"),
        )
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
    )


@query(
    "q_tpch_q17",
    oracle="""
    WITH pavg AS (
        SELECT l_partkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(*) AS avg_qty
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / 7.0 AS avg_yearly,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN pavg  a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#13' AND l.l_quantity < 0.2 * a.avg_qty
    """,
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): revenue lost to
    below-20%-of-average-quantity orders of one brand — the
    correlated-scalar-aggregate exemplar, decorrelated into a
    per-part average joined back.

    The brand filter is pushed BELOW the average build: the per-part
    average is unchanged by restricting which parts are considered
    (it aggregates within a partkey), so both lineitem passes run
    over the ~1/25th brand subset after one broadcast semi-join —
    the classic Q17 rewrite Catalyst does not derive (partial
    aggregate pushdown through a join is not in its rule set; the
    oracle's CTE spelling makes DuckDB average ALL parts, same
    values).

    Determinism: the per-part average is an exact-decimal sum divided
    by an exact count — identical doubles on both engines — and the
    final revenue folds in exact decimal before the single /7.0.

    Scale shape: one broadcast hash join prunes lineitem to the
    brand's rows with NO fact shuffle, ONE partkey shuffle over that
    subset builds the averages, and the parts-sized average table
    broadcasts back — at 100 TB nothing bigger than the brand subset
    ever shuffles."""
    t = load_tables(spark, sf_dir)
    brand_parts = (
        t["part"].filter(F.col("p_brand") == "Brand#13").select("p_partkey")
    )
    li = t["lineitem"].join(
        F.broadcast(brand_parts), F.col("l_partkey") == F.col("p_partkey")
    )
    pavg = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (F.sum(dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias(
            "avg_qty"
        )
    )
    return (
        li.join(F.broadcast(pavg), F.col("l_partkey") == F.col("a_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (F.sum(dec("l_extendedprice")).cast("double") / 7.0).alias(
                "avg_yearly"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def tpch_q22(
    spark: SparkSession,
    sf_dir: str,
    extra_customers: DataFrame | None = None,
) -> DataFrame:
    """TPC-H Q22 (global sales opportunity) — the PURE operator:
    wealthy-but-inactive customers, above the positive-balance
    average with NO orders, counted per market segment (the fixture
    carries no phone country codes, so segment is the grouping
    dimension). The NOT-EXISTS-to-anti-join exemplar combined with a
    1-row scalar aggregate broadcast.

    ``extra_customers`` is a TEST-HARNESS hook: rows unioned in
    before the average (the registered fixture query uses it to
    plant a qualifying customer, since every sf0.01 fixture customer
    has orders). Production callers omit it — no synthetic rows ever
    touch a real corpus's threshold or groups (ADVICE r11 #1: the
    plant was previously baked into the operator itself, where it
    shifted the avg_bal threshold for REAL customers).

    Determinism: the average is an exact-decimal sum over an exact
    count (identical doubles both engines); balances fold in exact
    decimal.

    Scale shape: the orders side of the anti join reduces to its
    custkey set (shuffle on custkey — never a broadcast of a fact);
    the 1-row average broadcasts; a 5-row aggregate finishes
    map-side."""
    t = load_tables(spark, sf_dir)
    c = t["customer"].select("c_custkey", "c_acctbal", "c_mktsegment")
    if extra_customers is not None:
        c = c.unionByName(extra_customers)
    pos = c.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias(
            "avg_bal"
        )
    )
    return (
        c.join(F.broadcast(pos))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            t["orders"].select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )


#: Fixture-only planted wealthy-inactive customer (id far above the
#: fixture custkey range): keeps the registered q_tpch_q22 row
#: non-vacuous at sf0.01, where every fixture customer has orders
#: (the r11 zero-row audit's q_contamination rule). Modeled in the
#: oracle's customer_aug CTE; NEVER applied by the pure tpch_q22().
_Q22_PLANTED = [(9_900_001, 99999.99, "BUILDING")]


@query(
    "q_tpch_q22",
    oracle="""
    WITH customer_aug AS (
        SELECT c_custkey, c_acctbal, c_mktsegment FROM customer
        UNION ALL
        SELECT CAST(9900001 AS BIGINT), CAST(99999.99 AS DOUBLE),
               'BUILDING'
    ),
    pos AS (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(*) AS avg_bal
        FROM customer_aug WHERE c_acctbal > 0.0
    )
    SELECT c.c_mktsegment,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             AS totacctbal
    FROM customer_aug c CROSS JOIN pos
    WHERE c.c_acctbal > pos.avg_bal
      AND NOT EXISTS (
          SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
      )
    GROUP BY c.c_mktsegment
    """,
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered fixture harness for :func:`tpch_q22`: unions the
    planted wealthy-inactive customer (_Q22_PLANTED, mirrored in the
    oracle) so the driver row stays non-vacuous at fixture scale.
    The plant lives HERE, not in the operator — real corpora run
    tpch_q22() with no synthetic rows."""
    from hive_gateway_spark.staging import memo_frame

    def build() -> DataFrame:
        # range(1)+literals, not createDataFrame: the local-collection
        # path serializes Python rows through the JVM on EVERY call
        # (~0.5 s of q22's first bench flag); a literal projection is
        # pure plan — and the assembled frame is session-memoized (the
        # harness is pure plan over immutable fixtures).
        k, bal, seg = _Q22_PLANTED[0]
        planted = spark.range(1).select(
            F.lit(k).cast("bigint").alias("c_custkey"),
            F.lit(bal).alias("c_acctbal"),
            F.lit(seg).alias("c_mktsegment"),
        )
        return tpch_q22(spark, sf_dir, extra_customers=planted)

    return memo_frame(spark, ("q_tpch_q22", sf_dir), build)


# ---------------------------------------------------------------------------
# TPC-H completion batch (r12): Q4, Q9, Q2, Q11, Q16, Q20, Q21 — with
# Q3/Q14 (q_tpch_q3 / q_promo_revenue) these close out all 22 TPC-H
# query shapes. The fixture carries no partsupp table and no
# commit/receipt dates (TESTDATA.md), so Q2/Q11/Q16/Q20 derive the
# part-supplier catalog from lineitem (distinct (l_partkey, l_suppkey)
# with exact-decimal cost/volume aggregates) and Q4/Q21 express
# lateness as shipdate vs orderdate + INTERVAL — the documented
# adaptations keep every query's CHARACTERISTIC plan shape (the thing
# being tested) intact: decorrelated scalar aggregates, semi/anti
# joins, scalar-subquery HAVING, double-correlated EXISTS/NOT-EXISTS.
# ---------------------------------------------------------------------------


@query(
    "q_tpch_q4",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      )
    GROUP BY o.o_orderpriority
    """,
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order priority checking): orders placed in one
    half-year window with at least one line shipped more than 30 days
    after the order date, counted by priority. The fixture carries no
    commit/receipt dates, so lateness is shipdate vs orderdate —
    q_late_ship_report covers the same EXISTS shape corpus-wide via
    SQL; this is Q4 proper (the date window) spelled as an explicit
    DataFrame semi join with a compound condition, proving the
    non-equi part of the correlation rides the join.

    Scale shape: the date window prunes orders at the scan; the
    left-semi join shuffles both facts on orderkey (each order emitted
    at most once regardless of late-line count); the 5-row priority
    aggregate finishes map-side."""
    t = load_tables(spark, sf_dir)
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    )
    return (
        o.join(t["lineitem"], late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q_tpch_q9",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))
                  - CAST(p.p_retailprice * l.l_quantity * 0.6 AS DECIMAL(18,4)))
                AS DOUBLE) AS sum_profit
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE 'red%'
    GROUP BY 1, 2
    """,
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product type profit): per supplier-nation and order
    year, profit on one product line. The fixture has no partsupp, so
    supply cost is proxied at 60% of retail price × quantity (the
    docstring constant a real deployment would replace with
    ps_supplycost); the five-way star join and the two-level rollup —
    Q9's actual test — are unchanged.

    Determinism: revenue and cost each fold through the established
    double-product → DECIMAL(18,4) cast before the order-independent
    sum; the year extraction is integer-exact.

    Scale shape: part (name-filtered), supplier, and nation broadcast;
    the only fact-fact shuffle is lineitem ⋈ orders on orderkey; the
    nation×year aggregate finishes map-side partials first."""
    t = load_tables(spark, sf_dir)
    red = t["part"].filter(F.col("p_name").like("red%"))
    amount = dec(
        F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
    ) - dec(F.col("p_retailprice") * F.col("l_quantity") * 0.6, 4)
    return (
        t["lineitem"]
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(red), F.col("p_partkey") == F.col("l_partkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
    )


@query(
    "q_tpch_q2",
    oracle="""
    WITH ps AS (
        SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
               MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS ps_cost
        FROM lineitem GROUP BY 1, 2
    ),
    el AS (
        SELECT ps.ps_partkey, ps.ps_suppkey, ps.ps_cost,
               s.s_acctbal, s.s_name, n.n_name
        FROM ps
        JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        JOIN region r   ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'EUROPE'
    ),
    mn AS (
        SELECT ps_partkey, MIN(ps_cost) AS min_cost
        FROM el GROUP BY ps_partkey
    )
    SELECT el.s_acctbal, el.s_name, el.n_name,
           p.p_partkey, p.p_name,
           CAST(el.ps_cost AS DOUBLE) AS supply_cost
    FROM el
    JOIN mn ON mn.ps_partkey = el.ps_partkey AND el.ps_cost = mn.min_cost
    JOIN part p ON p.p_partkey = el.ps_partkey
    WHERE p.p_type = 'LARGE' AND p.p_size BETWEEN 20 AND 30
    """,
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier): for each qualifying part, the
    region's supplier(s) offering it at the minimum cost — the
    correlated-MIN-subquery exemplar, decorrelated into a per-part min
    joined back on (partkey, cost). The fixture has no partsupp, so
    the part-supplier catalog is derived from lineitem (distinct
    pairs, cost = MIN extended price as exact DECIMAL, so the
    min-equality join key is bit-stable on both engines — never a
    float division).

    Scale shape: ONE partkey+suppkey shuffle builds the catalog (at
    100 TB this is the materialized partsupp a lakehouse would keep);
    supplier/nation/region broadcast onto it; the per-part min is a
    second, already-reduced shuffle; part (type+size filtered)
    broadcasts into the final join. TPC-H's ORDER BY/LIMIT 100
    presentation is dropped (the driver compare is order-insensitive);
    a serving layer adds exact_rank for pagination."""
    t = load_tables(spark, sf_dir)
    ps = (
        t["lineitem"]
        .groupBy(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .agg(F.min(dec("l_extendedprice")).alias("ps_cost"))
    )
    dims = (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(t["region"]), F.col("r_regionkey") == F.col("n_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    el = ps.join(F.broadcast(dims), F.col("s_suppkey") == F.col("ps_suppkey"))
    qual = t["part"].filter(
        (F.col("p_type") == "LARGE") & F.col("p_size").between(20, 30)
    )
    # r16 optimization (guide §2.4): the per-part minimum was an
    # aggregate + equality join-back, which rebuilt the whole catalog
    # once per consumer (two lineitem aggregations, three exchanges).
    # A per-part window MIN over the already part-filtered catalog is
    # ONE exchange on partkey and one pass — the part filter moves
    # BEFORE the min (per-part min is unchanged by filtering parts),
    # exactly the published Q2's part-first pushdown. Ties on the min
    # cost keep every witness, as the equality join did.
    from pyspark.sql import Window as W

    return (
        el.join(F.broadcast(qual), F.col("p_partkey") == F.col("ps_partkey"))
        .withColumn(
            "min_cost", F.min("ps_cost").over(W.partitionBy("ps_partkey"))
        )
        .filter(F.col("ps_cost") == F.col("min_cost"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.col("ps_cost").cast("double").alias("supply_cost"),
        )
    )


@query(
    "q_tpch_q11",
    oracle="""
    WITH v AS (
        SELECT l.l_partkey AS partkey,
               SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS val
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        JOIN region r   ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'ASIA'
        GROUP BY 1
    )
    SELECT partkey, CAST(val AS DOUBLE) AS part_value
    FROM v
    WHERE CAST(val AS DOUBLE) >
          (SELECT CAST(SUM(val) AS DOUBLE) * 2.0 / COUNT(*) FROM v)
    """,
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock identification): parts whose supply
    value through one region's suppliers exceeds a threshold fraction
    of that region's total — the scalar-subquery-in-HAVING exemplar.
    The fixture has no partsupp, so value = exact-decimal sum of
    extended price over the region's lineitems. TPC-H scales its
    fraction by 1/SF (a constant fraction empties or floods the result
    as the corpus grows); here the same scaling is DERIVED from the
    data — threshold = 2× the mean part value (2/n_parts of the
    total), which keeps the result non-empty and linearly growing at
    every tested scale (12 / 52 / 516 / 5160 rows at sf0.001→sf1)
    with no external SF knob.

    Determinism: both sides of the threshold compare are the SAME
    exact-decimal sums cast to double, so the comparison is bit-stable
    on both engines.

    Scale shape: region-filtered supplier dims broadcast; ONE partkey
    shuffle builds v; the grand total is a 1-row broadcast joined back
    (never a driver-side collect)."""
    t = load_tables(spark, sf_dir)
    dims = (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(t["region"]), F.col("r_regionkey") == F.col("n_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .select("s_suppkey")
    )
    v = (
        t["lineitem"]
        .join(F.broadcast(dims), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(dec("l_extendedprice")).alias("val"))
    )
    total = v.agg(
        (F.sum("val").cast("double") * 2.0 / F.count(F.lit(1))).alias(
            "threshold"
        )
    )
    return (
        v.join(F.broadcast(total))
        .filter(F.col("val").cast("double") > F.col("threshold"))
        .select("partkey", F.col("val").cast("double").alias("part_value"))
    )


@query(
    "q_tpch_q16",
    oracle="""
    WITH pairs AS (
        SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    )
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT pr.l_suppkey) AS supplier_cnt
    FROM pairs pr
    JOIN part p ON p.p_partkey = pr.l_partkey
    WHERE p.p_brand <> 'Brand#4'
      AND p.p_type NOT IN ('PROMO', 'ECONOMY')
      AND p.p_size IN (3, 9, 14, 19, 23, 36, 45, 49)
      AND pr.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000.0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship): how many distinct
    suppliers can deliver each qualifying (brand, type, size) bucket,
    excluding a blacklist — the COUNT(DISTINCT) + NOT-IN exemplar. The
    fixture has no partsupp (pairs derive from lineitem) and no
    s_comment (the '%Customer%Complaints%' blacklist becomes the
    low-balance suppliers); both swaps preserve the plan under test.

    NOT-IN note: s_suppkey is non-null by schema, so the NOT IN is
    exactly a left-anti join (the NULL-poisoned NOT-IN trap does not
    arise); Spark spells the anti join explicitly.

    Scale shape: one partkey+suppkey shuffle dedups the catalog, the
    blacklist broadcasts into the anti join, the part dim broadcasts
    with all three filters pushed, and the distinct count reuses the
    pair shuffle's partitioning."""
    t = load_tables(spark, sf_dir)
    pairs = t["lineitem"].select("l_partkey", "l_suppkey").distinct()
    blacklist = t["supplier"].filter(F.col("s_acctbal") < 1000.0).select(
        "s_suppkey"
    )
    qual = t["part"].filter(
        (F.col("p_brand") != "Brand#4")
        & ~F.col("p_type").isin("PROMO", "ECONOMY")
        & F.col("p_size").isin(3, 9, 14, 19, 23, 36, 45, 49)
    )
    return (
        pairs.join(
            F.broadcast(blacklist),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(qual), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q_tpch_q20",
    oracle="""
    WITH t96 AS (
        SELECT l_partkey, l_suppkey,
               SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty_1996
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY 1, 2
    ),
    tall AS (
        SELECT l_partkey, l_suppkey,
               SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty_all
        FROM lineitem GROUP BY 1, 2
    )
    SELECT s.s_suppkey, s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND s.s_suppkey IN (
          SELECT t96.l_suppkey
          FROM t96
          JOIN tall ON tall.l_partkey = t96.l_partkey
                   AND tall.l_suppkey = t96.l_suppkey
          JOIN part p ON p.p_partkey = t96.l_partkey
          WHERE p.p_name LIKE 'red%'
            AND CAST(t96.qty_1996 AS DOUBLE) >
                0.5 * CAST(tall.qty_all AS DOUBLE)
      )
    """,
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion): one region's suppliers who
    concentrated more than half of their all-time shipped volume of a
    product line into 1996 — the nested
    IN(aggregate-subquery-with-threshold) exemplar. The fixture has no
    partsupp availqty, so the threshold compares the year's shipped
    quantity against all-time shipped quantity per (part, supplier) —
    the same two-aggregate correlated structure as the published query.

    Determinism: both quantities are exact-decimal sums; the threshold
    compares their double casts with the same expression on both
    engines.

    Scale shape: the two volume aggregates shuffle on the SAME
    (partkey, suppkey) key — the join between them is co-partitioned
    with no extra exchange; the name-filtered part dim broadcasts; the
    surviving supplier keys collapse to a distinct set that semi-joins
    the region's (broadcast-joined) supplier dim."""
    t = load_tables(spark, sf_dir)
    red = t["part"].filter(F.col("p_name").like("red%")).select("p_partkey")
    in96 = (
        F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp")
    ) & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    # r16 optimization (guide §2.3/§3.2): the year and all-time volumes
    # were TWO full fact aggregates joined back on (partkey, suppkey);
    # one CONDITIONAL aggregate computes both in a single fact scan and
    # single exchange (the q_tpch_q51 pivot trick), and the
    # name-filtered part dim broadcasts onto the fact BEFORE the
    # shuffle — only the product line's rows aggregate at all. A
    # (part, supplier) with no 1996 shipments has a NULL year sum,
    # exactly the rows the old inner join dropped.
    keys = (
        t["lineitem"]
        .join(F.broadcast(red), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(F.when(in96, dec("l_quantity"))).alias("qty_1996"),
            F.sum(dec("l_quantity")).alias("qty_all"),
        )
        .filter(
            F.col("qty_1996").isNotNull()
            & (
                F.col("qty_1996").cast("double")
                > 0.5 * F.col("qty_all").cast("double")
            )
        )
        .select("l_suppkey")
    )
    return (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(t["region"]), F.col("r_regionkey") == F.col("n_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .join(keys, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "n_name")
    )


@query(
    "q_tpch_q21",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY s.s_name
    """,
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting): late lines on
    finished multi-supplier orders where the line's supplier was the
    ONLY late one — the double-correlated EXISTS/NOT-EXISTS exemplar.
    The oracle keeps the subquery spelling (DuckDB decorrelates it);
    Spark's correlated-subquery support rejects the non-equality
    correlation (l2.l_suppkey <> l1.l_suppkey), so the DataFrame side
    is the MANUAL decorrelation every engine performs internally: per
    order, count distinct suppliers and distinct LATE suppliers, then
    keep late lines on orders with >1 supplier and exactly 1 late one.
    The hash compare proves the rewrite equivalent. Lateness is
    shipdate vs orderdate + 60 days (no commit/receipt dates in the
    fixture).

    Scale shape: the supplier census is a TWO-LEVEL aggregate — first
    reduce to distinct (order, supplier, ever-late) on one
    (orderkey, suppkey) shuffle, then count per order over the
    already-reduced pairs — instead of two countDistincts, whose
    Expand doubles every lineitem row before a wider shuffle; the
    qualifying-order set then joins the late lines on orderkey; the
    supplier dim broadcasts for the final name rollup."""
    t = load_tables(spark, sf_dir)
    o = t["orders"].filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    li = t["lineitem"].join(o, F.col("l_orderkey") == F.col("o_orderkey"))
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        "INTERVAL 60 DAYS"
    )
    li = li.withColumn("is_late", late)
    # r16 optimization (guide §2.3/§2.4): the fact⋈orders join was
    # consumed twice (supplier census + late-line pick), scanning the
    # fact once per consumer; and the census was a second aggregate
    # joined back on orderkey. ONE (orderkey, suppkey) aggregate now
    # also carries the per-pair LATE LINE COUNT, the census folds into
    # an order-keyed window over that pair-sized frame, and numwait is
    # the sum of late-line counts of each qualifying order's single
    # late supplier — one fact scan, no join-back.
    pair = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.when(F.col("is_late"), 1).otherwise(0)).alias("supp_late"),
        F.sum(F.when(F.col("is_late"), 1).otherwise(0)).alias("n_late_lines"),
    )
    from pyspark.sql import Window as W

    wo = W.partitionBy("l_orderkey")
    winner = (
        pair.withColumn("n_supp", F.count(F.lit(1)).over(wo))
        .withColumn("n_late_supp", F.sum("supp_late").over(wo))
        .filter(
            (F.col("n_supp") > 1)
            & (F.col("n_late_supp") == 1)
            & (F.col("supp_late") == 1)
        )
    )
    return (
        winner.join(
            F.broadcast(t["supplier"]),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.sum("n_late_lines").cast("bigint").alias("numwait"))
    )
