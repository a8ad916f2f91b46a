"""Scalar-function coverage suites + remaining join/reshape operators.

Each query exercises a family of built-in scalar functions with a
verified oracle — broad surface coverage for SQL users migrating from
the reference's backend modules (the `mod.fun(arg)` calls of
gateway.ts:192 become ordinary SQL expressions here).

Engine-portability notes: every expression is chosen to have identical
semantics in Spark and DuckDB (e.g. weekday+1 vs isodow for day-of-week;
initcap is skipped — DuckDB lacks it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from hive_gateway_spark.registry import query
from hive_gateway_spark.session import load_tables


@query(
    "q_join_full",
    oracle="""
    SELECT c.c_custkey, b.buyer_id, c.c_mktsegment, b.n_purchases
    FROM (SELECT * FROM customer WHERE c_acctbal > 8000) c
    FULL OUTER JOIN (
        SELECT user_id AS buyer_id, COUNT(*) AS n_purchases
        FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ) b ON c.c_custkey = b.buyer_id
    """,
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join with nulls on both sides (rich customers vs
    active buyers — neither side subsumes the other)."""
    t = load_tables(spark, sf_dir)
    rich = t["customer"].filter(F.col("c_acctbal") > 8000)
    buyers = (
        t["events"]
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.col("user_id").alias("buyer_id"))
        .agg(F.count("*").alias("n_purchases"))
    )
    return rich.join(buyers, rich.c_custkey == buyers.buyer_id, "full_outer").select(
        "c_custkey", "buyer_id", "c_mktsegment", "n_purchases"
    )


@query(
    "q_unpivot",
    oracle="""
    SELECT doc_id, metric, val FROM (
        SELECT doc_id, 'n_chars' AS metric, CAST(n_chars AS BIGINT) AS val FROM documents
        UNION ALL
        SELECT doc_id, 'n_tokens', CAST(len(string_split(text, ' ')) AS BIGINT) FROM documents
        UNION ALL
        SELECT doc_id, 'n_distinct_tokens',
               CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) FROM documents
    )
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide per-doc metrics → long (doc_id, metric, val)
    via the built-in unpivot operator (the oracle spells it as the
    equivalent UNION ALL)."""
    t = load_tables(spark, sf_dir)
    wide = t["documents"].select(
        "doc_id",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(F.split("text", " ")))
        .cast("bigint")
        .alias("n_distinct_tokens"),
    )
    return wide.unpivot(
        ["doc_id"],
        ["n_chars", "n_tokens", "n_distinct_tokens"],
        "metric",
        "val",
    )


@query(
    "q_expr_array",
    oracle="""
    SELECT doc_id,
           len(words) AS n_words,
           list_contains(words, 'join') AS has_join,
           list_sort(list_distinct(words))[1] AS first_word,
           len(list_filter(words, w -> length(w) > 4)) AS n_long,
           array_to_string(words[1:3], '|') AS head3
    FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
    """,
)
def q_expr_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array / higher-order-function suite: size, contains, sort+head,
    lambda filter, slice+join — all codegen'd JVM expressions (oracle
    uses DuckDB's list_* equivalents)."""
    t = load_tables(spark, sf_dir)
    words = F.split("text", " ")
    return t["documents"].select(
        "doc_id",
        F.size(words).cast("bigint").alias("n_words"),
        F.array_contains(words, "join").alias("has_join"),
        F.array_sort(F.array_distinct(words))[0].alias("first_word"),
        F.size(F.filter(words, lambda w: F.length(w) > 4)).cast("bigint").alias("n_long"),
        F.array_join(F.slice(words, 1, 3), "|").alias("head3"),
    )


@query(
    "q_expr_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_discount - 0.05) AS abs_d,
           -- CASTs: DuckDB ceil/floor return DOUBLE and sign returns
           -- TINYINT; Spark emits BIGINT / DOUBLE — align dtypes.
           CAST(ceil(l_quantity) AS BIGINT) AS ceil_q,
           CAST(floor(l_quantity / 7) AS BIGINT) AS floor_q7,
           round(sqrt(l_extendedprice), 4) AS sqrt_price,
           round(ln(l_extendedprice + 1.0), 6) AS ln_price,
           round(pow(l_discount, 2), 6) AS disc_sq,
           l_orderkey % 97 AS mod97,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS sgn
    FROM lineitem
    WHERE l_linenumber = 1
    """,
)
def q_expr_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math-function suite (abs/ceil/floor/sqrt/ln/pow/mod/sign) —
    identical IEEE expression shapes on both engines."""
    t = load_tables(spark, sf_dir)
    l = t["lineitem"].filter(F.col("l_linenumber") == 1)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_d"),
        F.ceil("l_quantity").alias("ceil_q"),
        F.floor(F.col("l_quantity") / 7).alias("floor_q7"),
        F.round(F.sqrt("l_extendedprice"), 4).alias("sqrt_price"),
        F.round(F.log(F.col("l_extendedprice") + 1.0), 6).alias("ln_price"),
        F.round(F.pow("l_discount", F.lit(2)), 6).alias("disc_sq"),
        (F.col("l_orderkey") % 97).alias("mod97"),
        F.signum(F.col("l_discount") - 0.05).alias("sgn"),
    )


@query(
    "q_expr_datetime",
    oracle="""
    SELECT o_orderkey,
           extract(year FROM o_orderdate) AS yr,
           extract(month FROM o_orderdate) AS mo,
           extract(day FROM o_orderdate) AS dy,
           isodow(o_orderdate) AS dow_iso,
           date_trunc('month', o_orderdate) AS month_start,
           o_orderdate + INTERVAL 30 DAY AS due_date,
           datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_95
    FROM orders
    """,
)
def q_expr_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime-function suite: extract, ISO day-of-week (Spark's
    weekday() is 0=Monday → +1 equals DuckDB's isodow), truncation,
    interval arithmetic, day differences."""
    t = load_tables(spark, sf_dir)
    o = t["orders"]
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.month("o_orderdate").cast("bigint").alias("mo"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("dy"),
        (F.weekday("o_orderdate") + 1).cast("bigint").alias("dow_iso"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")
        ).cast("bigint").alias("days_since_95"),
    )


# q_expr_string2 was deleted in r6 (VERDICT r05 #7): its entire function
# surface (lpad/reverse/repeat/split_part/strpos/translate/left/right)
# is driver-verified inside the contract slot q_expr_string
# (relational.py), so the separate registration could never earn a
# driver row and only padded the registry.


@query(
    "q_udaf_wmean",
    oracle="""
    SELECT lang,
           CAST(SUM(n_chars * n_tokens) AS DOUBLE) / CAST(SUM(n_tokens) AS DOUBLE)
             AS wmean_chars
    FROM (
        SELECT lang, n_chars,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    )
    GROUP BY lang
    """,
)
def q_udaf_wmean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDAF surface demo (SURVEY §2.1): the registered pandas
    GROUPED_AGG `hg_wmean` (functions/register.py — exact int64
    accumulation, one final float division) called from **pure SQL**
    over the registered views: token-weighted mean document length per
    language. Proves SQL users reach custom aggregates by name, the
    reference's `mod.fun` extension analog (gateway.ts:289).

    Spark forbids mixing GROUPED_AGG pandas UDFs with built-in
    aggregates in one GROUP BY (INVALID_PANDAS_UDF_PLACEMENT) — hence
    the single-aggregate projection."""
    from hive_gateway_spark.functions.register import register_all

    load_tables(spark, sf_dir)  # registers the views
    register_all(spark)
    return spark.sql(
        """
        SELECT lang,
               hg_wmean(n_chars, CAST(size(split(text, ' ')) AS BIGINT))
                 AS wmean_chars
        FROM documents
        GROUP BY lang
        """
    )
