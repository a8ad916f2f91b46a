"""Advanced relational operators — beyond the reference's surface
(SURVEY §2.2 marks these "engine features"): as-of join, pivot, grouping
sets, sliding windows, correlated subqueries, skew-salted joins,
arbitrary time buckets, sketch aggregates.

Scale notes inline: each operator documents the plan it wants at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from hive_gateway_spark.registry import query
from hive_gateway_spark.session import load_tables

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@query(
    "q_join_asof",
    oracle="""
    SELECT e.event_id, e.user_id,
           epoch_us(e.ts) - epoch_us(s.ts) AS us_since_signup
    FROM events e
    ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'signup') s
      ON e.user_id = s.user_id AND s.ts <= e.ts
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event matched to the user's most recent signup
    at-or-before it (the oracle uses DuckDB's native ASOF JOIN).

    Spark has no asof join; the *scalable* formulation is not a join at
    all but a single pass: partition by key, order by time, carry the
    last signup timestamp forward (last_value ignoreNulls over an
    unbounded-preceding frame). One shuffle on user_id, no join state,
    no row explosion — this is the pattern that survives 100 TB, unlike
    per-row range joins."""
    t = load_tables(spark, sf_dir)
    e = t["events"]
    us = F.unix_micros(F.col("ts"))
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    last_signup = F.last(
        F.when(F.col("event_type") == "signup", us), ignorenulls=True
    ).over(w)
    return e.select(
        "event_id",
        "user_id",
        (us - last_signup).alias("us_since_signup"),
    )


@query(
    "q_join_asof_forward",
    oracle="""
    SELECT e.event_id, e.user_id,
           CASE WHEN m.next_us IS NULL THEN NULL
                ELSE m.next_us - epoch_us(e.ts) END AS us_until_signup
    FROM events e
    LEFT JOIN LATERAL (
        SELECT MIN(epoch_us(s.ts)) AS next_us
        FROM events s
        WHERE s.user_id = e.user_id
          AND s.event_type = 'signup'
          -- (ts, event_id) lexicographic bound matching the engine's
          -- current-row-to-unbounded-following frame (the same
          -- tie-break discipline as q_join_asof_tolerance's LATERAL)
          AND (s.ts > e.ts OR (s.ts = e.ts AND s.event_id >= e.event_id))
    ) m ON TRUE
    """,
)
def q_join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join (pandas merge_asof direction='forward' / kdb
    aj with reversed time): each event matched to the user's NEXT
    signup at-or-after it — the third as-of mode beside backward
    (q_join_asof) and backward-with-tolerance (q_join_asof_tolerance),
    completing the family. The canonical use is time-to-next-event
    features ("how long until this user re-registers?") and
    right-closed interval attribution. Events with no later signup
    emit NULL rather than vanishing.

    Plan: the mirror of the backward pass — ONE user_id shuffle, the
    carry runs over (currentRow, unboundedFollowing) with FIRST
    ignorenulls instead of LAST; no join, no row explosion. The oracle
    is an independent correlated-LATERAL MIN with the engine's
    (ts, event_id) tie-break spelled out, so the hash compares two
    different derivations."""
    t = load_tables(spark, sf_dir)
    e = t["events"]
    us = F.unix_micros(F.col("ts"))
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    next_signup = F.first(
        F.when(F.col("event_type") == "signup", us), ignorenulls=True
    ).over(w)
    return e.select(
        "event_id",
        "user_id",
        (next_signup - us).alias("us_until_signup"),
    )


@query(
    "q_pivot",
    oracle="""
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'click')    AS click,
           COUNT(*) FILTER (WHERE event_type = 'error')    AS error,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup')   AS signup,
           COUNT(*) FILTER (WHERE event_type = 'view')     AS view
    FROM events
    GROUP BY user_id
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event_type into columns (explicit value list → single-pass
    hash agg, no extra distinct-values job — required at scale)."""
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0, list(EVENT_TYPES))
    )


@query(
    "q_agg_grouping_sets",
    oracle="""
    SELECT event_type, date_trunc('day', ts) AS day, COUNT(*) AS n
    FROM events
    GROUP BY GROUPING SETS ((event_type), (date_trunc('day', ts)), ())
    """,
)
def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (finer control than rollup/cube)."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT event_type, date_trunc('day', ts) AS day, COUNT(*) AS n
        FROM events
        GROUP BY GROUPING SETS ((event_type), (date_trunc('day', ts)), ())
        """
    )


@query(
    "q_window_sliding",
    oracle="""
    SELECT user_id,
           date_trunc('day', ts) - o * INTERVAL 1 DAY AS window_start,
           COUNT(*) AS n
    FROM events CROSS JOIN (VALUES (0), (1)) AS t(o)
    GROUP BY user_id, date_trunc('day', ts) - o * INTERVAL 1 DAY
    """,
)
def q_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) windows: 2-day length, 1-day slide, per user —
    each event lands in two windows. Uses the built-in window()
    table-valued semantics (same operator the streaming twin uses); the
    oracle replicates via an offset cross join."""
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy(F.window("ts", "2 days", "1 day").alias("win"), F.col("user_id"))
        .agg(F.count("*").alias("n"))
        .select(F.col("win.start").alias("window_start"), "user_id", "n")
    )


@query(
    "q_subquery_correlated",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
    FROM orders o
    WHERE CAST(o.o_totalprice AS DECIMAL(18,2))
          * (SELECT COUNT(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
          > (SELECT SUM(CAST(o3.o_totalprice AS DECIMAL(18,2)))
             FROM orders o3 WHERE o3.o_custkey = o.o_custkey)
    """,
)
def q_subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subqueries: orders above their customer's mean
    order value, compared in exact decimal (price·n > Σprice — no
    float division, so the predicate is engine-portable). Catalyst
    decorrelates both subqueries into aggregate+join — verified by the
    plan containing no per-row subquery execution."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
        FROM orders o
        WHERE CAST(o.o_totalprice AS DECIMAL(18,2))
              * (SELECT COUNT(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
              > (SELECT SUM(CAST(o3.o_totalprice AS DECIMAL(18,2)))
                 FROM orders o3 WHERE o3.o_custkey = o.o_custkey)
        """
    )


@query(
    "q_join_salted",
    oracle="""
    SELECT n.n_name AS route_mod,
           COUNT(*) AS n_calls,
           CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events e
    JOIN nation n ON (e.user_id % 25) = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted join, provably equal to the plain join (same oracle as
    q_join_broadcast): the fact side carries a deterministic salt
    (event_id mod 8), the dimension is replicated ×8, and the join key
    becomes (key, salt) — the manual remedy when one key dominates and
    the dim is too big to broadcast. AQE skew-join automates this; the
    operator demonstrates the explicit form with verified equivalence."""
    SALT = 8
    t = load_tables(spark, sf_dir)
    e = t["events"].select(
        F.pmod(F.col("user_id"), F.lit(25)).cast("int").alias("mod_key"),
        F.pmod(F.col("event_id"), F.lit(SALT)).cast("int").alias("salt"),
        "value",
    )
    dim = t["nation"].select(
        "n_nationkey", "n_name", F.explode(F.array(*[F.lit(i) for i in range(SALT)])).alias("salt")
    )
    return (
        e.join(dim, (e.mod_key == dim.n_nationkey) & (e.salt == dim.salt))
        .groupBy(F.col("n_name").alias("route_mod"))
        .agg(
            F.count("*").alias("n_calls"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
    )


@query(
    "q_time_bucket",
    oracle="""
    SELECT make_timestamp((epoch_us(ts) // 900000000) * 900000000) AS bucket,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY bucket, event_type
    """,
)
def q_time_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary-interval time bucketing (15 min) via integer epoch
    arithmetic — the hypertable-rollup primitive. Buckets compute
    without a shuffle; only the aggregate exchanges (partial+final)."""
    t = load_tables(spark, sf_dir)
    # integer div (not double /): epoch-µs exceeds 2^53 ÷ rounding safety
    bucket = F.expr("timestamp_micros((unix_micros(ts) div 900000000) * 900000000)")
    return (
        t["events"]
        .groupBy(bucket.alias("bucket"), F.col("event_type"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
    )


@query("q_agg_sketch")  # rows-only: HLL/quantile sketches are engine-specific
def q_agg_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates — approx_count_distinct (HyperLogLog++) and
    approx_percentile per event_type. At 100 TB these replace exact
    distinct/percentile to keep the shuffle O(sketch) instead of
    O(values). Error bounds vs the exact twins are asserted in
    tests/test_sketches.py; results are deterministic for a fixed
    input (rsd 5%) but engine-specific, hence rows-only."""
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.05).alias("approx_users"),
            F.expr("approx_percentile(value, array(0.5, 0.95), 1000)").alias("approx_p"),
            F.countDistinct("user_id").alias("exact_users"),
        )
        .select(
            "event_type",
            "approx_users",
            F.col("approx_p")[0].alias("approx_p50"),
            F.col("approx_p")[1].alias("approx_p95"),
            "exact_users",
        )
    )


#: KMV (k-minimum-values) sketch geometry: portable universal hash
#: h(x) = (a·(x mod p) + b) mod p with p = 2³¹−1, k = 64 minima. The
#: input is reduced mod p FIRST (x mod p is a bijection on Z_p, so the
#: hash family is unchanged — and identical for every fixture id, which
#: are all < p): a·(x mod p) < 2⁶² stays exact int64 for ANY bigint id,
#: where the unreduced a·x would overflow Spark's ANSI multiply once
#: ids reach ~2³³ at production scale.
KMV_K = 64
KMV_P = (1 << 31) - 1
KMV_A = 1_103_515_245
KMV_B = 12_345


@query(
    "q_agg_kmv",
    oracle=f"""
    WITH hashed AS (
        SELECT DISTINCT event_type,
               (({KMV_A} * (user_id % {KMV_P}) + {KMV_B}) % {KMV_P}) AS h
        FROM events
    ),
    ranked AS (
        SELECT event_type, h,
               row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
        FROM hashed
    ),
    mins AS (
        SELECT event_type,
               COUNT(*) AS n_mins,
               MAX(h) AS h_k
        FROM ranked WHERE rn <= {KMV_K}
        GROUP BY event_type
    )
    SELECT event_type,
           CAST(n_mins AS BIGINT) AS n_mins,
           CAST(h_k AS BIGINT) AS h_k,
           CASE WHEN n_mins < {KMV_K}
                THEN CAST(n_mins AS DOUBLE)
                ELSE (CAST({KMV_K} AS DOUBLE) - 1.0) * CAST({KMV_P} AS DOUBLE)
                     / CAST(h_k AS DOUBLE)
           END AS est_users
    FROM mins
    """,
)
def q_agg_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch — the DETERMINISTIC,
    cross-engine-verifiable counterpart of q_agg_sketch's HLL++: hash
    each key with a portable universal hash, keep the k smallest distinct
    hashes per group, estimate |distinct| = (k−1)·p / h_(k). Unlike
    HLL++ the whole computation is plain SQL, so the driver hash-checks
    it exactly against DuckDB (same integers, same double expression
    shapes → bit-identical).

    Scale shape: the distinct + windowed top-k shuffle O(groups · k)
    rows after partial aggregation; at 100 TB the per-group state is k
    longs — the same reason one uses a sketch at all. Accuracy vs the
    exact count is pinned in tests/test_sketches.py (~1/√k ≈ 12%)."""
    t = load_tables(spark, sf_dir)
    h = (F.lit(KMV_A) * F.pmod(F.col("user_id"), F.lit(KMV_P)) + F.lit(KMV_B)) % F.lit(
        KMV_P
    )
    hashed = (
        t["events"].select("event_type", h.alias("h")).distinct()
    )
    rn = F.row_number().over(W.partitionBy("event_type").orderBy("h"))
    mins = (
        hashed.withColumn("rn", rn)
        .filter(F.col("rn") <= KMV_K)
        .groupBy("event_type")
        .agg(F.count("*").alias("n_mins"), F.max("h").alias("h_k"))
    )
    est = F.when(
        F.col("n_mins") < KMV_K, F.col("n_mins").cast("double")
    ).otherwise(
        (F.lit(float(KMV_K)) - F.lit(1.0))
        * F.lit(float(KMV_P))
        / F.col("h_k").cast("double")
    )
    return mins.select(
        "event_type",
        F.col("n_mins").cast("bigint").alias("n_mins"),
        F.col("h_k").cast("bigint").alias("h_k"),
        est.alias("est_users"),
    )


#: Gap-fill grid step: one hour, in epoch microseconds.
_HOUR_US = 3_600_000_000


@query(
    "q_ts_gapfill",
    oracle=f"""
    WITH hourly AS (
        SELECT event_type,
               epoch_us(date_trunc('hour', ts)) AS hour_us,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS hour_value
        FROM events GROUP BY 1, 2
    ),
    bounds AS (
        SELECT MIN(epoch_us(date_trunc('hour', ts))) AS lo,
               MAX(epoch_us(date_trunc('hour', ts))) AS hi
        FROM events
    ),
    grid AS (
        SELECT t.event_type, g.hour_us
        FROM (SELECT DISTINCT event_type FROM events) t
        CROSS JOIN (
            SELECT UNNEST(generate_series(lo, hi, {_HOUR_US})) AS hour_us
            FROM bounds
        ) g
    )
    SELECT grid.event_type, grid.hour_us,
           CAST(COALESCE(h.n_events, 0) AS BIGINT) AS n_events,
           h.hour_value,
           LAST_VALUE(h.hour_value IGNORE NULLS) OVER (
               PARTITION BY grid.event_type ORDER BY grid.hour_us
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS filled_value,
           (h.n_events IS NULL) AS is_gap
    FROM grid LEFT JOIN hourly h USING (event_type, hour_us)
    """,
)
def q_ts_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap-fill + last-observation-carried-forward: the
    dense hourly grid per event type over the corpus's time span, each
    hole marked (is_gap) and its value filled from the latest earlier
    observation — the resample/interpolate step every monitoring or
    feature-engineering pipeline needs before windowed models.

    Timestamps obey the house rule (surface only through
    date_trunc/epoch-µs — the fixture's ns precision survives nowhere
    else); hour sums run in exact DECIMAL(18,2).

    Scale shape: the hourly rollup is one map-side-combined aggregate
    (types × hours ≪ corpus); the grid is generated, not shuffled
    (sequence() over the broadcast 1-row bounds, cross join with the
    tiny type dim); the carry-forward window partitions by event_type
    over grid-sized data. The corpus is touched exactly once."""
    return gapfill_report(load_tables(spark, sf_dir)["events"])


def gapfill_report(events: DataFrame) -> DataFrame:
    """Core of q_ts_gapfill over any (event_type, ts, value) frame."""
    ev = events.select(
        "event_type",
        (F.unix_micros(F.date_trunc("hour", F.col("ts")))).alias("hour_us"),
        F.col("value").cast("decimal(18,2)").alias("v"),
    )
    hourly = ev.groupBy("event_type", "hour_us").agg(
        F.count("*").alias("n_events"),
        F.sum("v").cast("double").alias("hour_value"),
    )
    bounds = ev.agg(F.min("hour_us").alias("lo"), F.max("hour_us").alias("hi"))
    grid = (
        ev.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.expr(f"sequence(lo, hi, {_HOUR_US})")).alias("hour_us"),
        )
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("hour_us")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        grid.join(hourly, ["event_type", "hour_us"], "left")
        .select(
            "event_type",
            "hour_us",
            F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
            "hour_value",
            F.last("hour_value", ignorenulls=True).over(w).alias("filled_value"),
            F.col("n_events").isNull().alias("is_gap"),
        )
    )


@query(
    "q_time_weighted_avg",
    oracle="""
    WITH seq AS (
        SELECT user_id,
               CAST(CAST(ROUND(value, 2) AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
               epoch_us(ts) AS us,
               LEAD(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               ) AS next_us
        FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) + 1 AS BIGINT) AS n_events,
           CAST(MAX(next_us) - MIN(us) AS BIGINT) AS span_us,
           CAST(SUM(cents * (next_us - us)) AS BIGINT) AS weighted_sum,
           ROUND(CAST(SUM(cents * (next_us - us)) AS DOUBLE)
                 / CAST(MAX(next_us) - MIN(us) AS DOUBLE), 4) AS twa_cents
    FROM seq
    WHERE next_us IS NOT NULL
    GROUP BY user_id
    HAVING MAX(next_us) - MIN(us) > 0
    """,
)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-WEIGHTED average of the event value per user — the
    hypertable/tsdb staple (TimescaleDB's time_weight, kdb's twa):
    irregular samples weight by how LONG each value held, not how
    often it was sampled, so a sensor that reports rarely at value X
    isn't drowned by one that chats at value Y. Step-function
    semantics (value holds until the next event; the last observation
    closes the span and contributes no duration — users with one
    event have no span and are excluded), identical in both engines.

    Determinism: value → exact cents; per-step weight = exact µs
    duration; Σ(cents·dur) is an exact int64 (fixture bound: max
    cents 49 002 × span ≤ 90 days ≈ 3.9 × 10¹⁷ ≪ 2⁶³; at production
    spans route the sum through DECIMAL like q_embed_coherence); the
    one double division rides ROUND(·, 4) with identical shapes.

    Scale shape: ONE user_id shuffle shared by the LEAD window and the
    aggregate — the same single-pass discipline as q_join_asof; no
    join, no explosion, output is user-sized."""
    ev = load_tables(spark, sf_dir)["events"]
    us = F.unix_micros(F.col("ts"))
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    seq = ev.select(
        "user_id",
        (F.round("value", 2).cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
        us.alias("us"),
        F.lead(us).over(w).alias("next_us"),
    ).filter(F.col("next_us").isNotNull())
    span = F.max("next_us") - F.min("us")
    wsum = F.sum(F.col("cents") * (F.col("next_us") - F.col("us")))
    return (
        seq.groupBy("user_id")
        .agg(
            (F.count("*") + 1).cast("bigint").alias("n_events"),
            span.cast("bigint").alias("span_us"),
            wsum.cast("bigint").alias("weighted_sum"),
            F.round(
                wsum.cast("double") / span.cast("double"), 4
            ).alias("twa_cents"),
        )
        .filter(F.col("span_us") > 0)
    )


@query(
    "q_ohlc_bars",
    oracle="""
    WITH seq AS (
        SELECT event_type,
               epoch_us(ts) // 86400000000 AS day,
               CAST(CAST(ROUND(value, 2) AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type, epoch_us(ts) // 86400000000
                   ORDER BY ts ASC, event_id ASC
               ) AS rn_a,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type, epoch_us(ts) // 86400000000
                   ORDER BY ts DESC, event_id DESC
               ) AS rn_d
        FROM events
    )
    SELECT event_type, day,
           CAST(MAX(CASE WHEN rn_a = 1 THEN cents END) AS BIGINT) AS open_cents,
           CAST(MAX(cents) AS BIGINT) AS high_cents,
           CAST(MIN(cents) AS BIGINT) AS low_cents,
           CAST(MAX(CASE WHEN rn_d = 1 THEN cents END) AS BIGINT) AS close_cents,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM seq
    GROUP BY event_type, day
    """,
)
def q_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC resampling — the candlestick/bar aggregation every
    time-series store ships (kdb xbar + first/last, TimescaleDB
    time_bucket + first/last, Pandas resample().ohlc()): per
    (event_type, day), the FIRST value (open), max (high), min (low)
    and LAST value (close) in event-time order, ties broken by
    event_id exactly as every other windowed operator here.

    Determinism: values in exact cents; open/close pick rows by
    ROW_NUMBER over the shared (ts, event_id) order — the same
    tie-break spelled identically in the oracle — so no min_by/arg_min
    engine-variance is involved.

    Scale shape: ONE (type, day) shuffle; both row_numbers and the
    aggregate ride the same partitioning (the asc and desc windows
    reuse one exchange, two in-partition sorts); output is
    bar-count-sized. At 100 TB this is the classic pre-aggregation
    that turns tick data into servable bars in one pass."""
    ev = load_tables(spark, sf_dir)["events"]
    day = F.expr("unix_micros(ts) div 86400000000")
    base = ev.select(
        "event_type",
        day.alias("day"),
        (F.round("value", 2).cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
        "ts",
        "event_id",
    )
    wa = W.partitionBy("event_type", "day").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    wd = W.partitionBy("event_type", "day").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    seq = base.select(
        "event_type",
        "day",
        "cents",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return seq.groupBy("event_type", "day").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("cents")))
        .cast("bigint")
        .alias("open_cents"),
        F.max("cents").cast("bigint").alias("high_cents"),
        F.min("cents").cast("bigint").alias("low_cents"),
        F.max(F.when(F.col("rn_d") == 1, F.col("cents")))
        .cast("bigint")
        .alias("close_cents"),
        F.count("*").cast("bigint").alias("n_events"),
    )


#: Fuzzy-match acceptance band: 1 ≤ levenshtein ≤ FUZZY_MAX_DIST.
FUZZY_MAX_DIST = 2


@query(
    "q_join_fuzzy",
    oracle=f"""
    WITH names AS (
        SELECT p_name, string_split(p_name, ' ')[-1] AS noun,
               COUNT(*) AS n_parts
        FROM part GROUP BY p_name
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b, a.noun,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist,
           CAST(a.n_parts AS BIGINT) AS n_a,
           CAST(b.n_parts AS BIGINT) AS n_b
    FROM names a JOIN names b
      ON a.noun = b.noun AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) BETWEEN 1 AND {FUZZY_MAX_DIST}
    """,
)
def q_join_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy (edit-distance) join — entity-resolution style approximate
    matching over the part catalog: distinct name pairs within the same
    blocking key (the head noun) at Levenshtein distance 1..{FUZZY_MAX_DIST}
    ("red widget" ≈ "rd widget" typo class), with how many part rows
    each variant covers. levenshtein() is the identical DP edit
    distance in both engines, so the operator is hash-verified.

    Scale shape: the classic blocked fuzzy join — NEVER all-pairs: the
    name table collapses to distinct names first (entity-level, ≪
    rows), the candidate join keys on the block (at 100 TB: q-gram or
    soundex blocks, same plan), and the quadratic distance predicate
    runs only inside blocks. The distinct-name side broadcasts."""
    return fuzzy_name_pairs(load_tables(spark, sf_dir)["part"])


def fuzzy_name_pairs(part: DataFrame) -> DataFrame:
    """Core of q_join_fuzzy over any frame with a p_name column."""
    names = (
        part
        .groupBy("p_name")
        .agg(F.count("*").alias("n_parts"))
        .withColumn("noun", F.element_at(F.split("p_name", " "), -1))
    )
    a = names.select(
        F.col("p_name").alias("name_a"), "noun", F.col("n_parts").alias("n_a")
    )
    b = names.select(
        F.col("p_name").alias("name_b"), "noun", F.col("n_parts").alias("n_b")
    )
    d = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return (
        a.join(F.broadcast(b), "noun")
        .filter(F.col("name_a") < F.col("name_b"))
        .filter((d >= 1) & (d <= FUZZY_MAX_DIST))
        .select(
            "name_a",
            "name_b",
            "noun",
            d.cast("bigint").alias("dist"),
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
        )
    )


@query(
    "q_funnel",
    oracle="""
    WITH e AS (
        SELECT user_id, event_type, epoch_us(ts) AS us FROM events
    ),
    s1 AS (
        SELECT user_id, MIN(us) AS t1 FROM e
        WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
        SELECT e.user_id, MIN(e.us) AS t2
        FROM e JOIN s1 USING (user_id)
        WHERE e.event_type = 'click' AND e.us >= s1.t1
        GROUP BY e.user_id
    ),
    s3 AS (
        SELECT e.user_id, MIN(e.us) AS t3
        FROM e JOIN s2 USING (user_id)
        WHERE e.event_type = 'purchase' AND e.us >= s2.t2
        GROUP BY e.user_id
    ),
    stages AS (
        SELECT 1 AS stage, 'view' AS step, COUNT(*) AS n_users FROM s1
        UNION ALL
        SELECT 2, 'click', COUNT(*) FROM s2
        UNION ALL
        SELECT 3, 'purchase', COUNT(*) FROM s3
    )
    SELECT stage, step, CAST(n_users AS BIGINT) AS n_users,
           CAST(CAST(n_users AS DOUBLE)
                / NULLIF(CAST(LAG(n_users, 1, n_users)
                              OVER (ORDER BY stage) AS DOUBLE), 0)
                AS DOUBLE) AS conversion
    FROM stages
    """,
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis (view → click → purchase): a user
    reaches stage k only via an IN-ORDER event subsequence (the
    earliest view, then the earliest click at-or-after it, then the
    earliest purchase at-or-after that) — the greedy matching that
    maximizes funnel depth. Reports per-stage user counts and
    step-over-step conversion.

    Scale shape: three per-user aggregates, each a map-side-combined
    groupBy(user_id) on a progressively smaller population; the stage
    frames join on user_id (same partitioning reused); the final
    3-row report is driver-trivial. Timestamps surface only as
    epoch-µs per the house rule."""
    return funnel_report(load_tables(spark, sf_dir)["events"])


def funnel_report(events: DataFrame) -> DataFrame:
    """Core of q_funnel over any (user_id, event_type, ts) frame."""
    e = events.select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    s1 = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("us").alias("t1"))
    )
    s2 = (
        e.join(s1, "user_id")
        .filter((F.col("event_type") == "click") & (F.col("us") >= F.col("t1")))
        .groupBy("user_id")
        .agg(F.min("us").alias("t2"))
    )
    s3 = (
        e.join(s2, "user_id")
        .filter((F.col("event_type") == "purchase") & (F.col("us") >= F.col("t2")))
        .groupBy("user_id")
        .agg(F.min("us").alias("t3"))
    )
    stages = (
        s1.agg(F.count("*").alias("n_users")).select(
            F.lit(1).alias("stage"), F.lit("view").alias("step"), "n_users"
        )
        .unionAll(
            s2.agg(F.count("*").alias("n_users")).select(
                F.lit(2).alias("stage"), F.lit("click").alias("step"), "n_users"
            )
        )
        .unionAll(
            s3.agg(F.count("*").alias("n_users")).select(
                F.lit(3).alias("stage"), F.lit("purchase").alias("step"), "n_users"
            )
        )
    )
    w = W.orderBy("stage")
    # LAG(n_users, 1, n_users) + NULLIF(_, 0), exactly as the oracle:
    # stage 1 divides by its own count (1.0, or NULL when the funnel
    # is empty), later stages by the predecessor — a 0-count
    # predecessor must yield NULL in BOTH engines, not 1.0 (ADVICE r7
    # #1: an unconditional coalesce made the green row fixture-lucky).
    prev = F.coalesce(F.lag("n_users", 1).over(w), F.col("n_users"))
    return stages.select(
        "stage",
        "step",
        F.col("n_users").cast("bigint").alias("n_users"),
        (
            F.col("n_users").cast("double")
            / F.nullif(prev.cast("double"), F.lit(0.0))
        ).alias("conversion"),
    )


#: Retention horizon in weeks for the cohort grid.
COHORT_WEEKS = 4


#: Shared cohort-definition fragment — interpolated by BOTH the
#: retention and revenue oracles (the no-drift rule: one text decides
#: what a cohort IS).
_COHORT_CTE = """first_signup AS (
        SELECT user_id,
               MIN(epoch_us(ts)) // (86400000000 * 7) AS cohort_wk
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    cohort_sizes AS (
        SELECT cohort_wk, COUNT(*) AS n_cohort
        FROM first_signup GROUP BY cohort_wk
    )"""


@query(
    "q_cohort_retention",
    oracle=f"""
    WITH {_COHORT_CTE},
    activity AS (
        SELECT DISTINCT e.user_id,
               epoch_us(e.ts) // (86400000000 * 7) AS wk
        FROM events e JOIN first_signup USING (user_id)
    ),
    grid AS (
        SELECT c.cohort_wk, c.n_cohort, CAST(k AS BIGINT) AS week_offset
        FROM cohort_sizes c, UNNEST(range({COHORT_WEEKS})) AS t(k)
    ),
    cells AS (
        SELECT f.cohort_wk, a.wk - f.cohort_wk AS week_offset,
               COUNT(DISTINCT a.user_id) AS n_active
        FROM first_signup f JOIN activity a USING (user_id)
        WHERE a.wk - f.cohort_wk BETWEEN 0 AND {COHORT_WEEKS} - 1
        GROUP BY f.cohort_wk, a.wk - f.cohort_wk
    )
    SELECT g.cohort_wk AS cohort_week, g.week_offset,
           CAST(g.n_cohort AS BIGINT) AS n_cohort,
           CAST(COALESCE(c.n_active, 0) AS BIGINT) AS n_active,
           CAST(COALESCE(c.n_active, 0) AS DOUBLE)
             / CAST(g.n_cohort AS DOUBLE) AS retention
    FROM grid g LEFT JOIN cells c
      ON c.cohort_wk = g.cohort_wk AND c.week_offset = g.week_offset
    """,
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-signup week
    (pure integer epoch-week — floor(epoch_µs / 7 days), no calendar
    semantics to drift between engines), each cohort's fraction still
    active k weeks later for k = 0..{COHORT_WEEKS}-1, on a dense grid
    (absent cells are honest zeros).

    Scale shape: two per-user aggregates (first signup; distinct
    active weeks — both map-side combined), a user-keyed join, then a
    cohort×offset aggregate over per-user-week rows; the dense grid is
    cohorts × {COHORT_WEEKS} rows, generated not shuffled."""
    return cohort_report(load_tables(spark, sf_dir)["events"])


def cohort_report(ev: DataFrame) -> DataFrame:
    """Core of q_cohort_retention over any (user_id, event_type, ts)
    frame."""
    # Integer `div`, not double `/` + cast — the house rule from
    # q_time_bucket (ADVICE r7 #2): float division loses exactness past
    # 2^53 epoch-µs, and `div` truncates toward zero exactly like the
    # oracle's DuckDB `//` (verified: -5 // 7 = 0 there, not floor -1).
    week_us = 86_400_000_000 * 7
    wk = lambda c: F.expr(f"unix_micros({c}) div {week_us}")  # noqa: E731
    first_signup = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(F.unix_micros("ts")).alias("us"))
        .select("user_id", F.expr(f"us div {week_us}").alias("cohort_wk"))
    )
    activity = (
        ev.join(first_signup.select("user_id"), "user_id")
        .select("user_id", wk("ts").alias("wk"))
        .distinct()
    )
    cohorts = first_signup.groupBy("cohort_wk").agg(F.count("*").alias("n_cohort"))
    grid = cohorts.select(
        "cohort_wk",
        "n_cohort",
        F.explode(F.expr(f"sequence(0, {COHORT_WEEKS} - 1)")).alias("week_offset"),
    ).withColumn("week_offset", F.col("week_offset").cast("bigint"))
    cells = (
        first_signup.join(activity, "user_id")
        .withColumn("week_offset", F.col("wk") - F.col("cohort_wk"))
        .filter(F.col("week_offset").between(0, COHORT_WEEKS - 1))
        .groupBy("cohort_wk", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )
    return (
        grid.join(cells, ["cohort_wk", "week_offset"], "left")
        .select(
            F.col("cohort_wk").alias("cohort_week"),
            "week_offset",
            F.col("n_cohort").cast("bigint").alias("n_cohort"),
            F.coalesce("n_active", F.lit(0)).cast("bigint").alias("n_active"),
            (
                F.coalesce("n_active", F.lit(0)).cast("double")
                / F.col("n_cohort").cast("double")
            ).alias("retention"),
        )
    )


#: Outlier threshold: |v − μ| > OUTLIER_SIGMA · σ, evaluated as the
#: exact-decimal squared form (n·v − Σv)² > k²·(n·Σv² − (Σv)²).
OUTLIER_SIGMA = 3


@query(
    "q_outliers",
    oracle=f"""
    WITH s AS (
        SELECT event_type,
               COUNT(*) AS n,
               SUM(CAST(value AS DECIMAL(18,2))) AS sv,
               SUM(CAST(value AS DECIMAL(18,2))
                   * CAST(value AS DECIMAL(18,2))) AS sv2
        FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value
    FROM events e JOIN s USING (event_type)
    WHERE (s.n * CAST(e.value AS DECIMAL(18,2)) - s.sv)
          * (s.n * CAST(e.value AS DECIMAL(18,2)) - s.sv)
          > {OUTLIER_SIGMA * OUTLIER_SIGMA} * (s.n * s.sv2 - s.sv * s.sv)
    """,
)
def q_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score outlier detection WITHOUT floating point:
    |v − μ| > {OUTLIER_SIGMA}σ is algebraically (n·v − Σv)² >
    {OUTLIER_SIGMA}²·(n·Σv² − (Σv)²), and with value as DECIMAL(18,2)
    every term is exact decimal arithmetic — no mean, no sqrt, no
    rounding rule needed; the predicate is bit-identical in any
    engine. (sqrt is correctly rounded in IEEE so a z-score form
    would also match, but the squared form removes the question.)

    Scale shape: one map-side-combined moments aggregate (n, Σv, Σv²
    per type — the mergeable sufficient statistics), broadcast back
    onto the event stream as a 5-row join; the corpus is scanned
    twice or once-with-reuse, never shuffled on event rows."""
    t = load_tables(spark, sf_dir)
    v = F.col("value").cast("decimal(18,2)")
    s = t["events"].groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(v).alias("sv"),
        F.sum(v * v).alias("sv2"),
    )
    e = t["events"].join(F.broadcast(s), "event_type")
    dev = F.col("n") * v - F.col("sv")
    return e.filter(
        dev * dev
        > F.lit(OUTLIER_SIGMA * OUTLIER_SIGMA)
        * (F.col("n") * F.col("sv2") - F.col("sv") * F.col("sv"))
    ).select("event_id", "event_type", "value")


@query(
    "q_event_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS next_type
        FROM events
    ),
    t AS (
        SELECT event_type AS from_type, next_type AS to_type,
               COUNT(*) AS n
        FROM seq WHERE next_type IS NOT NULL
        GROUP BY event_type, next_type
    ),
    f AS (SELECT from_type, SUM(n) AS total FROM t GROUP BY from_type)
    SELECT t.from_type, t.to_type,
           CAST(t.n AS BIGINT) AS n,
           CAST(CAST(t.n AS DOUBLE) / CAST(f.total AS DOUBLE) AS DOUBLE)
             AS p
    FROM t JOIN f USING (from_type)
    """,
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event paths:
    for each (from, to) event-type pair, how often `to` immediately
    follows `from` in a user's timeline, and the conditional
    probability P(to | from) — the path-analysis staple behind "what
    do users do after an error?". Ties broken by event_id so the
    sequence is total and engine-identical.

    Scale shape: ONE shuffle (partition by user_id for the lead
    window — max-cardinality key, no skew), then a 25-cell aggregate;
    the probability join runs on the 5-row margins. p is a single
    IEEE division of exact counts."""
    t = load_tables(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = t["events"].select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    )
    tr = (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count("*").alias("n"))
    )
    f = tr.groupBy("from_type").agg(F.sum("n").alias("total"))
    return tr.join(f, "from_type").select(
        "from_type",
        "to_type",
        F.col("n").cast("bigint").alias("n"),
        (F.col("n").cast("double") / F.col("total").cast("double")).alias("p"),
    )


#: Journey-prefix length and report width for q_user_paths.
PATH_PREFIX = 8
PATH_TOP = 20


@query(
    "q_user_paths",
    oracle=f"""
    WITH firstk AS (
      SELECT user_id, event_type, ts, event_id
      FROM events
      QUALIFY ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      ) <= {PATH_PREFIX}
    ),
    paths AS (
      SELECT user_id,
             array_to_string(
               list(event_type ORDER BY ts ASC, event_id ASC), '>'
             ) AS path
      FROM firstk GROUP BY user_id
    )
    SELECT path, COUNT(*) AS n_users
    FROM paths
    GROUP BY path
    ORDER BY n_users DESC, path ASC
    LIMIT {PATH_TOP}
    """,
)
def q_user_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user journeys: each user's first {PATH_PREFIX} events
    (ts asc, event_id tiebreak) joined into a '>'-path, reported as
    the {PATH_TOP} most common paths — the Sankey/flow staple that
    complements q_event_transitions (full journey prefixes, not just
    first-order hops) and q_funnel (discovers paths instead of
    checking one).

    Scale shape: the prefix filter runs BEFORE any collect — a window
    row_number ≤ {PATH_PREFIX} with WindowGroupLimit partial pushdown,
    so a hot user with millions of events contributes at most
    {PATH_PREFIX} rows to the per-user fold (an uncapped
    collect_list-then-slice would buffer the whole hot user on one
    task). Then one per-user fold (sort_array of ≤{PATH_PREFIX}
    structs — deterministic regardless of arrival order), one
    partial-agg shuffle on path, TakeOrdered {PATH_TOP}."""
    ev = load_tables(spark, sf_dir)["events"]
    w = W.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    firstk = (
        ev.select("user_id", "event_type", "ts", "event_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= PATH_PREFIX)
    )
    paths = firstk.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_users"))
        .orderBy(F.col("n_users").desc(), F.col("path").asc())
        .limit(PATH_TOP)
    )


#: k-anonymity threshold: an equivalence class with fewer distinct
#: users is a re-identification risk (Sweeney 2002's k).
K_ANON = 5


@query(
    "q_k_anonymity",
    oracle=f"""
    SELECT event_type,
           epoch_us(ts) // 86400000000 AS day,
           CAST(FLOOR(value / 10) * 10 AS DOUBLE) AS value_band,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(*) AS n_rows,
           COUNT(DISTINCT user_id) < {K_ANON} AS at_risk
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier (event_type, day,
    value band): Sweeney's re-identification check — an equivalence
    class observed by fewer than {K_ANON} distinct users can single a
    person out even after direct identifiers are scrubbed, so this is
    the release gate that runs AFTER q_pii_scrub (regex scrubbing
    removes direct identifiers; k-anonymity measures what the residual
    quasi-identifiers still leak). Reports every class with its user
    count, row count, and at-risk flag.

    Determinism: day is integer `div` epoch-µs (house rule — matches
    DuckDB `//` trunc semantics); the value band floors a single IEEE
    division to a multiple of 10 (exact for the fixture's 2 dp values;
    floor, unlike round, has no tie rule to diverge on).

    Scale shape: ONE aggregate — Spark plans distinct-count as the
    two-phase partial expand + merge, so the corpus shuffles once on
    the quasi-identifier key; no window, no join, output is
    class-count-sized. At 100 TB with a hot class, the partial
    distinct on (class, user) bounds the merge fan-in exactly like any
    partial agg."""
    ev = load_tables(spark, sf_dir)["events"]
    n_users = F.countDistinct("user_id")
    return (
        ev.select(
            "event_type",
            F.expr("unix_micros(ts) div 86400000000").alias("day"),
            (F.floor(F.col("value") / F.lit(10)) * F.lit(10))
            .cast("double")
            .alias("value_band"),
            "user_id",
        )
        .groupBy("event_type", "day", "value_band")
        .agg(
            n_users.alias("n_users"),
            F.count("*").alias("n_rows"),
            (n_users < F.lit(K_ANON)).alias("at_risk"),
        )
    )


L_DIVERSE = 3


@query(
    "q_l_diversity",
    oracle=f"""
    SELECT event_type,
           epoch_us(ts) // 86400000000 AS day,
           CAST(FLOOR(value / 10) * 10 AS DOUBLE) AS value_band,
           COUNT(*) AS n_rows,
           COUNT(DISTINCT CAST(props->>'$.k' AS BIGINT)) AS n_sensitive,
           COUNT(DISTINCT CAST(props->>'$.k' AS BIGINT)) >= {L_DIVERSE}
             AS l_diverse
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit — k-anonymity's stricter sibling (Machanavajjhala
    2007): an equivalence class can satisfy k-anonymity and still leak
    when every member shares the SAME sensitive value (the homogeneity
    attack — "all 5 users in this class bought X"). Over the IDENTICAL
    quasi-identifier classes as q_k_anonymity (event_type, day, value
    band — the two audits must agree on what a class IS), counts the
    distinct sensitive values (the JSON payload key, schema-on-read as
    in q_json_extract) and flags classes with fewer than {{l}} distinct
    values.

    Scale shape: identical to q_k_anonymity — ONE aggregate whose
    distinct-count plans as partial expand + merge, shuffled once on
    the class key; the JSON extraction is a JVM expression in the scan
    projection, never a UDF.
    """
    ev = load_tables(spark, sf_dir)["events"]
    sensitive = F.get_json_object("props", "$.k").cast("bigint")
    n_sens = F.countDistinct("sens")
    return (
        ev.select(
            "event_type",
            F.expr("unix_micros(ts) div 86400000000").alias("day"),
            (F.floor(F.col("value") / F.lit(10)) * F.lit(10))
            .cast("double")
            .alias("value_band"),
            sensitive.alias("sens"),
        )
        .groupBy("event_type", "day", "value_band")
        .agg(
            F.count("*").alias("n_rows"),
            n_sens.alias("n_sensitive"),
            (n_sens >= F.lit(L_DIVERSE)).alias("l_diverse"),
        )
    )


q_l_diversity.__doc__ = q_l_diversity.__doc__.format(l=L_DIVERSE)


#: t-closeness threshold in parts-per-million of total-variation
#: distance (Li 2007 uses t ∈ [0,1]; categorical ground distance makes
#: EMD = TVD). 970000 ppm splits the fixture's class population at
#: EVERY sf (day-level classes sit near the few-samples-vs-uniform
#: ceiling: measured ranges 951000–996000 at sf0.001, 726500–992200 at
#: sf0.01 — larger classes fall further) — fixture-tuned like the
#: cosine pair threshold, the audit semantics don't depend on it.
T_CLOSE_PPM = 970_000

_TC_CLASS = "event_type, day, value_band"


@query(
    "q_t_closeness",
    oracle=f"""
    WITH base AS (
        SELECT event_type,
               epoch_us(ts) // 86400000000 AS day,
               CAST(FLOOR(value / 10) * 10 AS DOUBLE) AS value_band,
               COALESCE(CAST(props->>'$.k' AS BIGINT), -1) AS sens
        FROM events
    ),
    cs AS (
        SELECT {_TC_CLASS}, sens, COUNT(*) AS c
        FROM base GROUP BY {_TC_CLASS}, sens
    ),
    g AS (SELECT sens, COUNT(*) AS gt FROM base GROUP BY sens),
    tot AS (SELECT COUNT(*) AS nn FROM base),
    cn AS (
        SELECT {_TC_CLASS}, SUM(c) AS n FROM cs GROUP BY {_TC_CLASS}
    ),
    pres AS (
        SELECT cs.event_type, cs.day, cs.value_band,
               SUM(ABS(CAST(cs.c AS HUGEINT) * t.nn
                       - CAST(g.gt AS HUGEINT) * cn.n)) AS pres_num,
               SUM(g.gt) AS g_pres
        FROM cs
        JOIN g USING (sens)
        JOIN cn USING (event_type, day, value_band)
        CROSS JOIN tot t
        GROUP BY cs.event_type, cs.day, cs.value_band
    )
    SELECT p.event_type, p.day, p.value_band,
           CAST(cn.n AS BIGINT) AS n_rows,
           CAST(p.pres_num
                + CAST(cn.n AS HUGEINT) * (t.nn - p.g_pres)
                AS BIGINT) AS tvd_numer,
           CAST(ROUND(
               CAST(p.pres_num
                    + CAST(cn.n AS HUGEINT) * (t.nn - p.g_pres) AS DOUBLE)
               * 1000000.0
               / (2.0 * CAST(cn.n AS DOUBLE) * CAST(t.nn AS DOUBLE)),
               0) AS BIGINT) AS tvd_ppm,
           CAST(ROUND(
               CAST(p.pres_num
                    + CAST(cn.n AS HUGEINT) * (t.nn - p.g_pres) AS DOUBLE)
               * 1000000.0
               / (2.0 * CAST(cn.n AS DOUBLE) * CAST(t.nn AS DOUBLE)),
               0) AS BIGINT) <= {T_CLOSE_PPM} AS t_close
    FROM pres p
    JOIN cn USING (event_type, day, value_band)
    CROSS JOIN tot t
    """,
)
def q_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit — the third rung of the release-gate ladder
    (Li 2007): a class can be k-anonymous AND l-diverse yet still leak
    when its sensitive-value DISTRIBUTION deviates from the corpus
    (the skewness attack — "this class is 90% value X vs 1% globally").
    Over the IDENTICAL quasi-identifier classes as q_k_anonymity /
    q_l_diversity (the three audits must agree on what a class is),
    reports each class's total-variation distance to the global
    sensitive distribution — for a categorical domain with uniform
    ground distance, the EMD the paper calls for IS the TVD.

    Determinism: TVD is computed as exact integer algebra — the
    numerator Σ|cᵢ·N − gᵢ·n| (absent values contribute n·(N − Σgᵢ),
    folded in closed form, never materialized) rides along hash-pinned
    (the q_volume_trend pattern), DECIMAL/HUGEINT products so n·N is
    safe past int64 at corpus scale, and the single ppm division is
    ROUND of doubles on exact < 2⁵³ integers with identical shape in
    both engines.

    Scale shape: one (class, sens) partial aggregate over the corpus,
    then everything downstream is class-bounded: the global histogram
    is ≤ |domain| rows (broadcast), the per-class frame ≤ |classes|,
    and the absent-mass closed form means the |classes| × |domain|
    dense grid is NEVER formed — the join stays on present pairs.
    """
    ev = load_tables(spark, sf_dir)["events"]
    base = ev.select(
        "event_type",
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
        (F.floor(F.col("value") / F.lit(10)) * F.lit(10))
        .cast("double")
        .alias("value_band"),
        F.coalesce(
            F.get_json_object("props", "$.k").cast("bigint"), F.lit(-1)
        ).alias("sens"),
    )
    key = ["event_type", "day", "value_band"]
    from hive_gateway_spark.staging import stage

    cs = base.groupBy(*key, "sens").agg(F.count("*").alias("c"))
    # staged, not bare localCheckpoint: the slot supersedes the
    # previous occupant's blocks, so repeated calls (bench: cold +
    # 3 warm + re-measure) don't each orphan a checkpoint until GC
    # (the ADVICE r8 #4 leak class); it feeds the g-join AND the
    # per-class n rollup
    cs = stage(cs, "tcloseness.cs")
    g = cs.groupBy("sens").agg(F.sum("c").alias("gt"))
    cn = cs.groupBy(*key).agg(F.sum("c").alias("n"))
    tot = cn.agg(F.sum("n").alias("nn"))
    dec20 = lambda c: F.col(c).cast("decimal(20,0)")  # noqa: E731
    pres = (
        cs.join(F.broadcast(g), "sens")
        .join(cn, key)
        .crossJoin(F.broadcast(tot))
        .groupBy(*key)
        .agg(
            F.sum(
                F.abs(dec20("c") * dec20("nn") - dec20("gt") * dec20("n"))
            ).alias("pres_num"),
            F.sum("gt").alias("g_pres"),
        )
    )
    numer = (
        F.col("pres_num") + dec20("n") * (dec20("nn") - dec20("g_pres"))
    ).cast("decimal(38,0)")
    ppm = F.round(
        numer.cast("double")
        * 1000000.0
        / (
            F.lit(2.0)
            * F.col("n").cast("double")
            * F.col("nn").cast("double")
        ),
        0,
    ).cast("bigint")
    return (
        pres.join(cn, key)
        .crossJoin(F.broadcast(tot))
        .select(
            *key,
            F.col("n").cast("bigint").alias("n_rows"),
            numer.cast("bigint").alias("tvd_numer"),
            ppm.alias("tvd_ppm"),
            (ppm <= F.lit(T_CLOSE_PPM)).alias("t_close"),
        )
    )


@query(
    "q_interval_overlap",
    oracle="""
    WITH iv AS (
        SELECT epoch_us(o.o_orderdate) // 604800000000 AS w0,
               epoch_us(MAX(l.l_shipdate)) // 604800000000 AS w1
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey, o.o_orderdate
    ),
    e AS (SELECT w0, w1, unnest(range(w0, w1 + 1)) AS week
          FROM iv WHERE w1 >= w0)
    SELECT CAST(week AS BIGINT) AS week,
           COUNT(*) AS n_open,
           CAST(SUM(CASE WHEN week = w0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_placed,
           CAST(SUM(CASE WHEN week = w1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_completed
    FROM e GROUP BY week
    """,
)
def q_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly open-order load — the interval-overlap staple (how many
    intervals cover each calendar bucket): an order is OPEN from its
    placement week to its last shipment's week; per epoch-week, the
    count of open orders plus how many were placed / completed that
    week (the WIP curve an operations dashboard draws).

    Scale shape — the point of the operator: interval×bucket overlap
    is NOT a range join (O(intervals × buckets) as BNLJ, the plan
    q_join_range exists to forbid) but a BOUNDED EXPLODE: each
    interval emits one row per covered week — bounded by the interval
    length (bounded by the corpus's calendar span — ≤ ~360 weeks in
    the synthetic fixture, ≤ weeks-of-history anywhere) — then ONE
    partial-agg shuffle on week. Weeks are integer `div` epoch-µs
    (house rule; matches DuckDB `//`). INVERTED intervals (last ship
    before the order date — a real artifact of the synthetic fixture,
    and a data-quality reject anywhere) are filtered explicitly in
    BOTH engines: Spark's sequence(a, b) DESCENDS when a > b while
    DuckDB's range(a, b) is empty, so an unfiltered inverted row
    would silently diverge — the exact cross-engine trap the oracle
    methodology exists to catch."""
    t = load_tables(spark, sf_dir)
    wk = 604_800_000_000
    # lineitem pre-aggregates to one (orderkey, last_ship) row BEFORE
    # the orders join, so the join moves ≤ |orders| rows instead of the
    # whole fact (guide §2.3 aggregate-before-shuffle; r16 optimization
    # round). Inner join ≡ the previous orders⋈fact groupBy: orders
    # without lineitems vanish either way.
    iv = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("last_ship"))
        .join(
            t["orders"].select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            F.expr(f"unix_micros(o_orderdate) div {wk}").alias("w0"),
            F.expr(f"unix_micros(last_ship) div {wk}").alias("w1"),
        )
        .filter(F.col("w1") >= F.col("w0"))
    )
    # Sweep line instead of the per-week explode (r16 optimization
    # round, guide §2.3): the old plan emitted one row per COVERED WEEK
    # per interval (interval-length × |orders| rows) before a week
    # aggregate; the count of open intervals is a prefix-sum identity —
    # n_open(W) = Σ_{w0≤W} placed − Σ_{w1<W} completed — so two
    # endpoint rows per interval suffice. The cumulative window runs on
    # the CALENDAR-sized dense week axis (≤ weeks-of-history rows at
    # any corpus size: single-partition by construction, never
    # corpus-scale). Weeks with n_open = 0 are exactly the weeks the
    # explode never emitted.
    pts = iv.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("w0").alias("week"),
                    F.lit(1).alias("p"),
                    F.lit(0).alias("c"),
                ),
                F.struct(
                    F.col("w1").alias("week"),
                    F.lit(0).alias("p"),
                    F.lit(1).alias("c"),
                ),
            )
        ).alias("e")
    ).select("e.*")
    per = pts.groupBy("week").agg(
        F.sum("p").alias("n_placed"), F.sum("c").alias("n_completed")
    )
    cal = per.agg(F.min("week").alias("lo"), F.max("week").alias("hi")).select(
        F.explode(F.expr("sequence(lo, hi)")).alias("week")
    )
    full = cal.join(F.broadcast(per), "week", "left").select(
        "week",
        F.coalesce("n_placed", F.lit(0)).alias("n_placed"),
        F.coalesce("n_completed", F.lit(0)).alias("n_completed"),
    )
    wcum = W.orderBy("week").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        full.select(
            "week",
            (
                F.sum("n_placed").over(wcum)
                - (F.sum("n_completed").over(wcum) - F.col("n_completed"))
            ).alias("n_open"),
            F.col("n_placed").cast("bigint").alias("n_placed"),
            F.col("n_completed").cast("bigint").alias("n_completed"),
        )
        .filter(F.col("n_open") > 0)
        .select("week", "n_open", "n_placed", "n_completed")
    )


@query(
    "q_event_value_corr",
    oracle="""
    WITH s AS (
        SELECT event_type,
               COUNT(*) AS n,
               SUM(CAST((epoch_us(ts) // 3600000000) % 24 AS BIGINT)) AS sx,
               SUM(CAST(value AS DECIMAL(18,2))) AS sy,
               SUM(CAST((epoch_us(ts) // 3600000000) % 24 AS BIGINT)
                   * CAST((epoch_us(ts) // 3600000000) % 24 AS BIGINT)) AS sxx,
               SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)))
                 AS syy,
               SUM(CAST((epoch_us(ts) // 3600000000) % 24 AS BIGINT)
                   * CAST(value AS DECIMAL(18,2))) AS sxy
        FROM events GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / NULLIF(sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                         * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
                    0) AS corr_hour_value
    FROM s
    """,
)
def q_event_value_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation between hour-of-day and event value, per
    event type — "do purchases get bigger in the evening?", the
    seasonality screen run before any time-based resampling.

    Determinism — the zipf_fit recipe, not built-in corr(): the six
    sufficient statistics (n, Σx, Σy, Σx², Σy², Σxy) accumulate as
    EXACT integers/decimals (hour is integer epoch-µs div/mod, value
    is decimal(18,2); products stay far inside precision 38 —
    decimal-PRODUCT-of-sums is what overflows, so each sum converts to
    double ONCE and r is a single identical IEEE expression chain per
    engine, sqrt correctly rounded). Built-in corr() accumulates
    doubles in partition order — never hash-stable across engines.
    A degenerate group (single event, or zero variance on either
    axis) has denominator 0 — guarded with NULLIF in BOTH engines so
    both report NULL: unguarded, Spark's non-ANSI divide yields NULL
    while DuckDB's IEEE division yields NaN/±inf — the q_funnel
    ADVICE-r7 trap again, killed at birth this time.

    Scale shape: ONE map-side-combined aggregate over the corpus; the
    r expression evaluates on event-type-count rows."""
    ev = load_tables(spark, sf_dir)["events"]
    hour = F.expr("(unix_micros(ts) div 3600000000) % 24")
    x = hour.cast("bigint")
    y = F.col("value").cast("decimal(18,2)")
    s = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    num = d("n") * d("sxy") - d("sx") * d("sy")
    den = F.sqrt(
        (d("n") * d("sxx") - d("sx") * d("sx"))
        * (d("n") * d("syy") - d("sy") * d("sy"))
    )
    return s.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        (num / F.nullif(den, F.lit(0.0))).alias("corr_hour_value"),
    )


@query(
    "q_rolling_wau",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id,
               epoch_us(ts) // 86400000000 AS day
        FROM events
    ),
    dau AS (SELECT day, COUNT(*) AS dau FROM ud GROUP BY day),
    win AS (
        SELECT DISTINCT user_id, unnest(range(day, day + 7)) AS wday
        FROM ud
    ),
    wau AS (SELECT wday, COUNT(*) AS wau FROM win GROUP BY wday)
    SELECT CAST(d.day AS BIGINT) AS day,
           CAST(d.dau AS BIGINT) AS dau,
           CAST(w.wau AS BIGINT) AS wau
    FROM dau d JOIN wau w ON w.wday = d.day
    """,
)
def q_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily and rolling-7-day active users (DAU/WAU) — THE
    engagement pair every events product reports, on days with
    activity.

    Scale shape — rolling DISTINCT aggregation without a window
    operator: a per-day sliding window with COUNT(DISTINCT) would
    re-scan each user's events 7× inside a serialized day-ordered
    window; instead (user, day) dedups ONCE (one shuffle), each
    user-day then contributes its user to the 7 calendar days whose
    trailing window covers it (bounded explode, factor exactly 7), a
    second dedup collapses multi-active users per window, and a
    partial-agg count finishes. Every stage is a hash shuffle on a
    high-cardinality key — nothing serializes on the ~365-value day
    axis. Days are integer `div` epoch-µs (house rule)."""
    ev = load_tables(spark, sf_dir)["events"]
    ud = ev.select(
        "user_id", F.expr("unix_micros(ts) div 86400000000").alias("day")
    ).distinct()
    dau = ud.groupBy("day").agg(F.count("*").alias("dau"))
    win = ud.select(
        "user_id", F.explode(F.expr("sequence(day, day + 6)")).alias("wday")
    ).distinct()
    wau = win.groupBy("wday").agg(F.count("*").alias("wau"))
    return dau.join(wau, dau["day"] == wau["wday"]).select(
        F.col("day").cast("bigint").alias("day"),
        F.col("dau").cast("bigint").alias("dau"),
        F.col("wau").cast("bigint").alias("wau"),
    )


@query(
    "q_audience_overlap",
    oracle="""
    WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
    sz AS (SELECT event_type, COUNT(*) AS n FROM tu GROUP BY event_type),
    inter AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               COUNT(*) AS n_both
        FROM tu a JOIN tu b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2
    )
    SELECT i.type_a, i.type_b,
           CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
           CAST(i.n_both AS BIGINT) AS n_both,
           CAST(i.n_both AS DOUBLE)
             / CAST(sa.n + sb.n - i.n_both AS DOUBLE) AS jaccard
    FROM inter i
    JOIN sz sa ON sa.event_type = i.type_a
    JOIN sz sb ON sb.event_type = i.type_b
    """,
)
def q_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap matrix: for every event-type pair, the Jaccard
    overlap of their user audiences ("do purchasers also click?") —
    the segmentation staple behind every Venn chart.

    Scale shape: ONE (type, user) dedup shuffle; the self-join keys on
    user_id (high cardinality — the 5×5 type matrix never serializes
    anything) and emits at most C(5,2) rows per user; sizes join onto
    the 10-row matrix as broadcasts. Jaccard is an integer ratio
    through one IEEE division — exact both engines."""
    ev = load_tables(spark, sf_dir)["events"]
    tu = ev.select("event_type", "user_id").distinct()
    sz = tu.groupBy("event_type").agg(F.count("*").alias("n"))
    a = tu.select(F.col("event_type").alias("type_a"), "user_id")
    b = tu.select(F.col("event_type").alias("type_b"), "user_id")
    inter = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("n_both"))
    )
    sa = sz.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    sb = sz.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            F.col("n_both").cast("bigint").alias("n_both"),
            (
                F.col("n_both").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_both")).cast("double")
            ).alias("jaccard"),
        )
    )


@query(
    "q_volume_anomaly",
    oracle="""
    WITH d AS (
        SELECT epoch_us(ts) // 86400000000 AS day, COUNT(*) AS n
        FROM events GROUP BY day
    ),
    s AS (
        SELECT COUNT(*) AS k, SUM(n) AS sn, SUM(n * n) AS snn FROM d
    )
    SELECT CAST(d.day AS BIGINT) AS day,
           CAST(d.n AS BIGINT) AS n_events,
           (s.k * d.n - s.sn) * (s.k * d.n - s.sn)
             > 9 * (s.k * s.snn - s.sn * s.sn) AS is_spike
    FROM d CROSS JOIN s
    """,
)
def q_volume_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-volume anomaly screen — the ingest-monitoring staple
    ("did a crawler go rogue on Tuesday?"): days whose event count
    deviates more than 3σ from the daily mean, evaluated ENTIRELY in
    integer arithmetic — the q_outliers squared predicate applied to
    the time axis: |n − μ| > 3σ  ⇔  (k·n − Σn)² > 9·(k·Σn² − (Σn)²),
    no mean, no sqrt, no float anywhere, so cross-engine parity is
    unconditional (counts are exact integers in both engines).

    Scale shape: one partial-agg shuffle to daily counts (the day axis
    is ~corpus-years × 365 rows — tiny), a 1-row broadcast of the
    sufficient statistics, and a per-day integer predicate. Days are
    integer `div` epoch-µs (house rule)."""
    ev = load_tables(spark, sf_dir)["events"]
    d = (
        ev.select(F.expr("unix_micros(ts) div 86400000000").alias("day"))
        .groupBy("day")
        .agg(F.count("*").alias("n"))
    )
    s = d.agg(
        F.count("*").alias("k"),
        F.sum("n").alias("sn"),
        F.sum(F.col("n") * F.col("n")).alias("snn"),
    )
    dev = F.col("k") * F.col("n") - F.col("sn")
    return d.crossJoin(F.broadcast(s)).select(
        F.col("day").cast("bigint").alias("day"),
        F.col("n").cast("bigint").alias("n_events"),
        (
            dev * dev
            > F.lit(9) * (F.col("k") * F.col("snn") - F.col("sn") * F.col("sn"))
        ).alias("is_spike"),
    )


@query(
    "q_null_profile",
    oracle="""
    WITH s AS (
        SELECT COUNT(*) AS n_rows,
               SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS c1,
               SUM(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS c2,
               SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS c3,
               SUM(CASE WHEN event_type IS NULL OR event_type = ''
                        THEN 1 ELSE 0 END) AS c4,
               SUM(CASE WHEN value IS NULL OR value = 0.0
                        THEN 1 ELSE 0 END) AS c5,
               SUM(CASE WHEN props IS NULL OR props = ''
                        THEN 1 ELSE 0 END) AS c6
        FROM events
    )
    SELECT col, CAST(n_rows AS BIGINT) AS n_rows,
           CAST(n_bad AS BIGINT) AS n_missing_or_degenerate,
           CAST(n_bad AS DOUBLE) / CAST(n_rows AS DOUBLE) AS bad_rate
    FROM (
        SELECT 'event_id' AS col, n_rows, c1 AS n_bad FROM s
        UNION ALL SELECT 'ts', n_rows, c2 FROM s
        UNION ALL SELECT 'user_id', n_rows, c3 FROM s
        UNION ALL SELECT 'event_type', n_rows, c4 FROM s
        UNION ALL SELECT 'value', n_rows, c5 FROM s
        UNION ALL SELECT 'props', n_rows, c6 FROM s
    )
    """,
)
def q_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Completeness profile over events — the Deequ/dbt-test staple
    run before trusting any ingest: per column, how many rows are NULL
    or degenerate (empty string for text columns, 0.0 for value) and
    the bad-rate. The check an ingest SLA alerts on ("props suddenly
    90% empty = the client stopped sending payloads").

    Scale shape: ONE pass — all six per-column counters are
    map-side-combined conditional sums in a single aggregate (never
    one job per column, the naive profiler's mistake); the 6-row
    unpivot is driver-trivial.

    Determinism: integer counters; rates are integer ratios through
    one IEEE division."""
    ev = load_tables(spark, sf_dir)["events"]
    flag = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
    s = ev.agg(
        F.count("*").alias("n_rows"),
        flag(F.col("event_id").isNull()).alias("c1"),
        flag(F.col("ts").isNull()).alias("c2"),
        flag(F.col("user_id").isNull()).alias("c3"),
        flag(
            F.col("event_type").isNull() | (F.col("event_type") == "")
        ).alias("c4"),
        flag(F.col("value").isNull() | (F.col("value") == 0.0)).alias("c5"),
        flag(F.col("props").isNull() | (F.col("props") == "")).alias("c6"),
    )
    pairs = [
        ("event_id", "c1"),
        ("ts", "c2"),
        ("user_id", "c3"),
        ("event_type", "c4"),
        ("value", "c5"),
        ("props", "c6"),
    ]
    # ONE execution of the aggregate: the 1-row frame explodes into the
    # 6-row report in the same plan (a unionAll of six selects would
    # re-run the corpus aggregate six times — the exact naive-profiler
    # shape this operator exists to avoid)
    entries = F.array(
        *[
            F.struct(
                F.lit(name).alias("col"),
                F.col(c).cast("bigint").alias("n_bad"),
            )
            for name, c in pairs
        ]
    )
    return s.select("n_rows", F.explode(entries).alias("e")).select(
        F.col("e.col").alias("col"),
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("e.n_bad").alias("n_missing_or_degenerate"),
        (F.col("e.n_bad").cast("double") / F.col("n_rows").cast("double")).alias(
            "bad_rate"
        ),
    )


@query(
    "q_brand_affinity",
    oracle="""
    WITH basket AS (
        SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    n AS (SELECT COUNT(DISTINCT okey) AS n_orders FROM basket),
    bo AS (SELECT brand, COUNT(*) AS n_b FROM basket GROUP BY brand),
    co AS (
        SELECT a.brand AS brand_a, b.brand AS brand_b,
               COUNT(*) AS co_orders
        FROM basket a JOIN basket b
          ON a.okey = b.okey AND a.brand < b.brand
        GROUP BY a.brand, b.brand
    )
    SELECT co.brand_a, co.brand_b, co.co_orders,
           ba.n_b AS orders_a, bb.n_b AS orders_b,
           CAST(co.co_orders AS DOUBLE) / n.n_orders AS support,
           CAST(co.co_orders * n.n_orders AS DOUBLE)
             / (ba.n_b * bb.n_b) AS lift
    FROM co
    JOIN bo ba ON ba.brand = co.brand_a
    JOIN bo bb ON bb.brand = co.brand_b
    CROSS JOIN n
    """,
)
def q_brand_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket brand affinity (support + lift per brand pair) —
    the association-rule staple, and a FACT-scale co-occurrence shape
    (order baskets) beside q_audience_overlap's entity-scale one (user
    audiences). lift > 1 = brands bought together more than chance;
    the retail classic, and in a training-data pipeline the same shape
    ranks (source, topic) or (lang, domain) co-occurrence.

    Determinism: counts are exact integers; support and lift are each
    ONE integer-ratio IEEE division.

    Scale shape: basket dedup is one (orderkey, brand) partial-agg
    shuffle; the pair join keys on orderkey with per-order fan-out
    bounded by C(basket_brands, 2) (≤ C(11,2) in the fixture — basket
    size is bounded by order width, never corpus size); pair counts
    collapse to ≤ C(brands, 2) rows, onto which the brand totals and
    the 1-row order count broadcast (the scalar cross-join house
    pattern)."""
    from hive_gateway_spark.staging import stage

    t = load_tables(spark, sf_dir)
    # Stage the deduped basket: FOUR consumers (order count, brand
    # totals, both pair-join sides) — without the checkpoint the
    # lineitem⋈part distinct replayed once per consumer (plan-verified
    # r16: two full fact scans feeding the self-join alone). ≤
    # |orders|·|basket brands| rows, 2 narrow columns — the q59/q23
    # checkpoint discipline (guide §2.4).
    basket = stage(
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .select(F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand"))
        .distinct(),
        "advanced.brand_affinity.basket",
    )
    n = basket.select(F.countDistinct("okey").alias("n_orders"))
    bo = basket.groupBy("brand").agg(F.count("*").alias("n_b"))
    a = basket.select(F.col("okey"), F.col("brand").alias("brand_a"))
    b = basket.select(F.col("okey"), F.col("brand").alias("brand_b"))
    co = (
        a.join(b, "okey")
        .filter(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count("*").alias("co_orders"))
    )
    return (
        co.join(
            F.broadcast(bo.select(F.col("brand").alias("brand_a"), F.col("n_b").alias("orders_a"))),
            "brand_a",
        )
        .join(
            F.broadcast(bo.select(F.col("brand").alias("brand_b"), F.col("n_b").alias("orders_b"))),
            "brand_b",
        )
        .crossJoin(F.broadcast(n))
        .select(
            "brand_a",
            "brand_b",
            "co_orders",
            "orders_a",
            "orders_b",
            (F.col("co_orders").cast("double") / F.col("n_orders")).alias("support"),
            (
                (F.col("co_orders") * F.col("n_orders")).cast("double")
                / (F.col("orders_a") * F.col("orders_b"))
            ).alias("lift"),
        )
    )


@query(
    "q_rfm_segments",
    oracle="""
    WITH mx AS (SELECT MAX(o_orderdate) AS mxd FROM orders),
    per AS (
        SELECT o.o_custkey AS c_custkey,
               date_diff('day', MAX(o.o_orderdate), mx.mxd) AS recency_days,
               COUNT(*) AS frequency,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS monetary
        FROM orders o CROSS JOIN mx
        GROUP BY o.o_custkey, mx.mxd
    ),
    scored AS (
        SELECT c_custkey, CAST(recency_days AS BIGINT) AS recency_days,
               frequency, monetary,
               NTILE(5) OVER (ORDER BY recency_days ASC, c_custkey ASC)
                 AS r_score,
               NTILE(5) OVER (ORDER BY frequency DESC, c_custkey ASC)
                 AS f_score,
               NTILE(5) OVER (ORDER BY monetary DESC, c_custkey ASC)
                 AS m_score
        FROM per
    )
    SELECT c_custkey, recency_days, frequency, monetary,
           r_score, f_score, m_score,
           CASE WHEN r_score <= 2 AND f_score <= 2 THEN 'champion'
                WHEN r_score <= 2 THEN 'recent'
                WHEN f_score <= 2 THEN 'loyal_lapsing'
                WHEN r_score >= 4 AND f_score >= 4 THEN 'at_risk'
                ELSE 'regular' END AS segment
    FROM scored
    """,
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (recency / frequency / monetary quintiles) —
    plan-memoized per (session, sf_dir): assembling the exact_ntile
    kernel plan costs ~0.45 s of driver-side work per call, so repeat
    calls reuse the resolved frame (staging.memo_frame).
    """
    from hive_gateway_spark.staging import memo_frame

    return memo_frame(
        spark, ("q_rfm_segments", sf_dir), lambda: _rfm_build(spark, sf_dir)
    )


def _rfm_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (recency / frequency / monetary quintiles) —
    the classic customer-value report, and the canonical "three
    rankings over one aggregate" shape (the same plan scores documents
    by freshness / dup-degree / quality in a curation stack).

    Determinism: recency is an exact day diff against the 1-row corpus
    max (broadcast cross join); frequency/monetary are exact counts
    and decimal sums; every quintile cut orders by (key, c_custkey) — a
    total order, so membership is engine-independent; the segment
    label is a pure CASE over the scores.

    Scale shape (de-weaked r10, VERDICT r9 task #2): ONE custkey-keyed
    partial aggregate over orders, then three ``exact_ntile`` cuts over
    the CUSTOMER-scale result — each is the two-pass
    percentile-threshold form (ranking.py): approximate range splits
    bound every window partition to ~1/32² of the group (tie-heavy
    ``frequency`` gets tiebreak sub-splits), ranks are exact integer
    arithmetic, and NO global single-partition NTILE window remains
    (plan-asserted in tests/test_plans.py)."""
    t = load_tables(spark, sf_dir)
    mx = t["orders"].select(F.max("o_orderdate").alias("mxd"))
    per = (
        t["orders"]
        .crossJoin(F.broadcast(mx))
        .groupBy("o_custkey", "mxd")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count("*").alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("monetary"),
        )
        .select(
            F.col("o_custkey").alias("c_custkey"),
            F.datediff("mxd", "last_order").cast("bigint").alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    from hive_gateway_spark.operators.ranking import exact_ntile
    from hive_gateway_spark.staging import stage

    # Stage the customer aggregate once (exact_ntile reads its input
    # several times — split/sub-split/cell/rank passes — and an
    # unstaged chain would recompute the orders aggregate per pass;
    # measured 20 s warm at sf0.1 vs 0.4 s). Then UNPIVOT the three
    # ranking keys into (metric, v) rows — DESC keys negated, so every
    # cut is ascending — and run the machinery ONCE partitioned by
    # metric: one split table, one cell table, one rank shuffle for all
    # three quintile cuts instead of 3× the fixed pass cost. A
    # custkey-keyed conditional aggregate folds the tiles back to one
    # row per customer.
    base = stage(
        per.select("c_custkey", "recency_days", "frequency", "monetary"),
        "rfm_per_customer",
    )
    un = base.selectExpr(
        "c_custkey",
        "recency_days",
        "frequency",
        "monetary",
        "stack(3, 'r', CAST(recency_days AS DOUBLE),"
        " 'f', -CAST(frequency AS DOUBLE),"
        " 'm', -monetary) AS (metric, v)",
    )
    tiles = exact_ntile(
        un, 5, "v", "c_custkey", partition_cols=["metric"], out_col="t"
    )
    pick = lambda m: F.max(F.when(F.col("metric") == m, F.col("t")))  # noqa: E731
    scored = tiles.groupBy(
        "c_custkey", "recency_days", "frequency", "monetary"
    ).agg(
        pick("r").alias("r_score"),
        pick("f").alias("f_score"),
        pick("m").alias("m_score"),
    )
    seg = (
        F.when((F.col("r_score") <= 2) & (F.col("f_score") <= 2), "champion")
        .when(F.col("r_score") <= 2, "recent")
        .when(F.col("f_score") <= 2, "loyal_lapsing")
        .when((F.col("r_score") >= 4) & (F.col("f_score") >= 4), "at_risk")
        .otherwise("regular")
    )
    return scored.select("*", seg.alias("segment"))


@query(
    "q_first_touch",
    oracle="""
    WITH firsts AS (
        SELECT user_id, event_type AS first_touch FROM (
            SELECT user_id, event_type,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn
            FROM events
        ) WHERE rn = 1
    )
    SELECT f.first_touch,
           COUNT(DISTINCT e.user_id) AS n_users,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE)
             AS attributed_value
    FROM events e JOIN firsts f USING (user_id)
    GROUP BY f.first_touch
    """,
)
def q_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution — every user's LIFETIME value credited
    to the event type that first brought them in (the marketing-
    analytics classic; in a data-pipeline context the same shape
    answers "which crawl seed discovered the documents that later
    passed curation"). Per first-touch type: users acquired, their
    total downstream events, and the exact-decimal value they carried.

    Determinism: the first touch is ROW_NUMBER over (ts, event_id) — a
    total order; value folds in exact decimal.

    Scale shape: ONE user-keyed window (WindowGroupLimit pushes the
    rn=1 cut before the exchange), then a user-keyed join carrying the
    1-column first-touch label back onto the fact table — both sides
    hash-partitioned on user_id, so at 100 TB this is two shuffles on
    the same high-cardinality key and one 5-row aggregate."""
    t = load_tables(spark, sf_dir)
    rn = F.row_number().over(
        W.partitionBy("user_id").orderBy("ts", "event_id")
    )
    firsts = (
        t["events"]
        .select("user_id", "event_type", rn.alias("rn"))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("first_touch"))
    )
    return (
        t["events"]
        .join(firsts, "user_id")
        .groupBy("first_touch")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("attributed_value"),
        )
    )


@query(
    "q_mad_outliers",
    oracle="""
    WITH med AS (
        SELECT event_type,
               ROUND(CAST(quantile_cont(value, 0.5) AS DOUBLE), 4) AS med
        FROM events GROUP BY event_type
    ),
    dev AS (
        SELECT e.event_type, e.value, m.med,
               ABS(e.value - m.med) AS adev
        FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
        SELECT event_type,
               ROUND(CAST(quantile_cont(adev, 0.5) AS DOUBLE), 4) AS mad
        FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           COUNT(*) AS n,
           MIN(d.med) AS median_value,
           MIN(m.mad) AS mad,
           CAST(SUM(CASE WHEN ABS(d.value - d.med) > 4.4478 * m.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type
    """,
)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust MAD outlier screen (median absolute deviation, Hampel's
    3·1.4826·MAD rule) — the robust complement to the 3σ family
    (q_outliers, q_volume_anomaly): a single wild value inflates a
    standard deviation and can HIDE other outliers; the median pair is
    breakdown-point-0.5 immune to exactly that.

    Determinism: both medians are exact interpolated percentiles
    rounded to 4 dp (the q_latency_stats rule — identical IEEE inputs
    either side), the threshold 4.4478·mad is one double product, the
    flag one strict compare on identical operands.

    Scale shape: two percentile aggregates keyed on the (small)
    event_type dimension with the per-type medians broadcast back onto
    the fact stream between them — two fact scans total (a median
    genuinely needs its distribution before deviations exist); at
    100 TB the second pass rides the first's shuffle partitioning."""
    t = load_tables(spark, sf_dir)
    med = (
        t["events"]
        .groupBy("event_type")
        .agg(F.round(F.expr("percentile(value, 0.5)"), 4).alias("med"))
    )
    dev = t["events"].join(F.broadcast(med), "event_type").select(
        "event_type", "value", "med", F.abs(F.col("value") - F.col("med")).alias("adev")
    )
    mad = (
        dev.groupBy("event_type")
        .agg(F.round(F.expr("percentile(adev, 0.5)"), 4).alias("mad"))
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.min("med").alias("median_value"),
            F.min("mad").alias("mad"),
            F.sum(
                F.when(
                    F.abs(F.col("value") - F.col("med")) > 4.4478 * F.col("mad"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
    )


@query(
    "q_churn_matrix",
    oracle="""
    WITH am AS (
        SELECT DISTINCT user_id, date_trunc('month', ts) AS m FROM events
    ),
    firsts AS (SELECT user_id, MIN(m) AS first_m FROM am GROUP BY user_id),
    months AS (SELECT DISTINCT m FROM am),
    state AS (
        SELECT cur.m, cur.user_id,
               CASE WHEN f.first_m = cur.m THEN 'new'
                    WHEN prev.user_id IS NOT NULL THEN 'retained'
                    ELSE 'resurrected' END AS state
        FROM am cur
        JOIN firsts f USING (user_id)
        LEFT JOIN am prev
          ON prev.user_id = cur.user_id
         AND prev.m = cur.m - INTERVAL 1 MONTH
    ),
    churned AS (
        SELECT n.m, prev.user_id, 'churned' AS state
        FROM am prev
        JOIN months n ON n.m = prev.m + INTERVAL 1 MONTH
        LEFT JOIN am cur
          ON cur.user_id = prev.user_id AND cur.m = n.m
        WHERE cur.user_id IS NULL
    )
    SELECT m, state, COUNT(*) AS n_users
    FROM (SELECT m, user_id, state FROM state
          UNION ALL SELECT m, user_id, state FROM churned)
    GROUP BY m, state
    """,
)
def q_churn_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly growth accounting (the new / retained / resurrected /
    churned matrix): each month's active users classified by history —
    first month ever = new; active last month too = retained; active
    before but not last month = resurrected; last month's actives
    missing this month = churned (counted against the month they
    missed, only when that month exists in the data). The
    subscription-analytics classic, and the corpus analog tracks
    source/domain participation across crawl months.

    Determinism: set algebra over exact (user, month) distincts; month
    arithmetic is calendar-exact INTERVAL in both engines; counts are
    integers.

    Scale shape: ONE (user, month) dedup shuffle whose result is
    STAGED (five consumers — firsts/months/prev/both churned sides —
    would otherwise each re-run the events dedup; at 100 TB this is
    the materialized active-months table a growth stack keeps), then
    self-joins keyed on the high-cardinality user_id (the month
    predicate rides ON the join); firsts is one user-keyed aggregate
    riding the same partitioning; the months dim broadcasts. No
    window over the time axis — nothing serializes."""
    from hive_gateway_spark.staging import memo_frame

    return memo_frame(
        spark, ("q_churn_matrix", sf_dir), lambda: _churn_build(spark, sf_dir)
    )


def _churn_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_gateway_spark.staging import stage

    t = load_tables(spark, sf_dir)
    am = stage(
        t["events"]
        .select("user_id", F.date_trunc("month", "ts").alias("m"))
        .distinct(),
        "churn.active_months",
    )
    firsts = am.groupBy("user_id").agg(F.min("m").alias("first_m"))
    months = am.select("m").distinct()
    prev = am.select(
        F.col("user_id").alias("p_user"), F.col("m").alias("p_m")
    )
    state = (
        am.join(firsts, "user_id")
        .join(
            prev,
            (F.col("p_user") == F.col("user_id"))
            & (F.col("p_m") == F.col("m") - F.expr("INTERVAL 1 MONTH")),
            "left",
        )
        .select(
            "m",
            "user_id",
            F.when(F.col("first_m") == F.col("m"), "new")
            .when(F.col("p_user").isNotNull(), "retained")
            .otherwise("resurrected")
            .alias("state"),
        )
    )
    nxt = months.select(F.col("m").alias("n_m"))
    churned = (
        am.join(
            F.broadcast(nxt),
            F.col("n_m") == F.col("m") + F.expr("INTERVAL 1 MONTH"),
        )
        .join(
            am.select(
                F.col("user_id").alias("c_user"), F.col("m").alias("c_m")
            ),
            (F.col("c_user") == F.col("user_id"))
            & (F.col("c_m") == F.col("n_m")),
            "left_anti",
        )
        .select(F.col("n_m").alias("m"), "user_id", F.lit("churned").alias("state"))
    )
    return (
        state.unionByName(churned)
        .groupBy("m", "state")
        .agg(F.count("*").alias("n_users"))
    )


#: Misra-Gries heavy-hitters geometry: HH_CAP counters per partition
#: (mergeable-summaries form, Agarwal et al. 2012), HH_TOPK reported.
#: In the exact regime (per-partition distinct keys ≤ HH_CAP — true for
#: every fixture vocabulary) zero decrements happen and the summary IS
#: the exact count table, which is what the DuckDB oracle pins; the
#: approximate regime's sandwich guarantee (cnt_lo ≤ true ≤ cnt_lo +
#: err_hi, Σ decrements ≤ n_tokens/(HH_CAP+1)) is property-pinned in
#: tests/test_sketches.py with a deliberately tiny capacity.
HH_CAP = 4096
HH_TOPK = 25


def mg_summaries(keyed: DataFrame, key_cols: list[str], cap: int) -> DataFrame:
    """Per-partition Misra-Gries summaries over ``key_cols`` (string
    columns) — the mergeable-summaries kernel shared by the global and
    per-group heavy-hitter queries and the streaming trend twin. ONE
    mapInPandas pass per partition (batched merge: add a batch's group
    sizes, then if over capacity subtract the (cap+1)-th largest
    counter from all and drop non-positives); the emitted summary is
    ≤ cap key rows + 1 error row (all key columns NULL, cnt = the
    partition's decrement total) REGARDLESS of partition size."""
    import numpy as np
    import pandas as pd

    def mg_partition(batches):
        counts: dict[tuple, int] = {}
        decrements = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            sizes = pdf.groupby(key_cols, sort=False).size()
            for key, c in sizes.items():
                key = key if isinstance(key, tuple) else (key,)
                counts[key] = counts.get(key, 0) + int(c)
            if len(counts) > cap:
                vals = np.sort(np.fromiter(counts.values(), dtype=np.int64))
                cut = int(vals[-(cap + 1)])  # (cap+1)-th largest
                decrements += cut
                counts = {k: c - cut for k, c in counts.items() if c > cut}
        keys = list(counts.keys()) + [(None,) * len(key_cols)]
        out = {
            col: [k[i] for k in keys] for i, col in enumerate(key_cols)
        }
        out["cnt"] = np.asarray(
            list(counts.values()) + [decrements], dtype=np.int64
        )
        yield pd.DataFrame(out)

    schema = ", ".join(f"{c} string" for c in key_cols) + ", cnt bigint"
    return keyed.select(*key_cols).mapInPandas(mg_partition, schema)


def tokens_of(docs: DataFrame, *extra_cols: str) -> DataFrame:
    """(word [, extra…]) token stream of a documents frame."""
    return docs.select(
        *extra_cols, F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")


def heavy_hitters_topk(docs: DataFrame, cap: int, k: int) -> DataFrame:
    """Distributed Misra-Gries top-k token frequencies over a
    (text,) frame — the frequent-items sketch beside q_agg_kmv's
    distinct sketch and q_quantile_sketch's rank sketch.

    Plan shape: the token stream never shuffles. Each input partition
    folds into a ≤``cap``-counter summary (mg_summaries kernel); only
    the summaries reach the exchange. The global merge is a
    map-side-combined groupBy sum, then one tiny top-k window. That is
    the whole point at 100 TB: exact per-token counts of a
    heavy-tailed trillion-token stream shuffle O(vocabulary) rows,
    the sketch shuffles O(partitions · cap).

    Guarantee (classic MG, survives the merge): every reported
    cnt_lo undercounts its token by at most err_hi = Σ per-partition
    decrement totals, and err_hi ≤ n_tokens/(cap+1)."""
    summaries = mg_summaries(tokens_of(docs), ["word"], cap)
    err = summaries.filter(F.col("word").isNull()).agg(
        F.sum("cnt").cast("bigint").alias("err_hi")
    )
    merged = (
        summaries.filter(F.col("word").isNotNull())
        .groupBy("word")
        .agg(F.sum("cnt").cast("bigint").alias("cnt_lo"))
    )
    w = W.orderBy(F.col("cnt_lo").desc(), F.col("word").asc())
    return (
        merged.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .crossJoin(F.broadcast(err))
        .select(
            "word",
            "cnt_lo",
            F.coalesce("err_hi", F.lit(0)).cast("bigint").alias("err_hi"),
            F.col("rnk").cast("bigint").alias("rnk"),
        )
    )


@query(
    "q_heavy_hitters",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS word FROM documents
    ), counts AS (
      SELECT word, COUNT(*) AS cnt FROM toks WHERE word <> '' GROUP BY word
    )
    SELECT word, CAST(cnt AS BIGINT) AS cnt_lo,
           CAST(0 AS BIGINT) AS err_hi, CAST(rnk AS BIGINT) AS rnk
    FROM (
      SELECT word, cnt,
             ROW_NUMBER() OVER (ORDER BY cnt DESC, word ASC) AS rnk
      FROM counts
    )
    WHERE rnk <= {HH_TOPK}
    """,
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{HH_TOPK} corpus token frequencies via a distributed
    Misra-Gries sketch — the frequent-items member of the sketch
    family (ref analog: O14's hot-key accounting, gateway.ts:161-178,
    re-expressed as a corpus statistic).

    The oracle is the EXACT top-k (GROUP BY + window): with
    HH_CAP = {HH_CAP} counters and fixture vocabularies of ≤ a few
    hundred distinct tokens, every partition stays in the zero-
    decrement exact regime, so cnt_lo equals the true count and
    err_hi is exactly 0 — the driver hash pins both the counts AND
    the fact that no decrement fired. The approximate regime (vocab ≫
    cap, the 100 TB case) keeps the sandwich guarantee; it is pinned
    with a tiny forced capacity in tests/test_sketches.py."""
    t = load_tables(spark, sf_dir)
    return heavy_hitters_topk(t["documents"].select("text"), HH_CAP, HH_TOPK)


#: Per-group heavy hitters: top tokens PER LANGUAGE (the hot-keys-per-
#: tenant shape: top URLs per domain, top paths per shard). Same
#: exact-regime/approximate-regime split as the global query.
HH_GROUP_TOPK = 5


@query(
    "q_heavy_hitters_by_lang",
    oracle=f"""
    WITH toks AS (
      SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents
    ), counts AS (
      SELECT lang, word, COUNT(*) AS cnt FROM toks WHERE word <> ''
      GROUP BY lang, word
    )
    SELECT lang, word, CAST(cnt AS BIGINT) AS cnt_lo,
           CAST(0 AS BIGINT) AS err_hi, CAST(rnk AS BIGINT) AS rnk
    FROM (
      SELECT lang, word, cnt,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY cnt DESC, word ASC) AS rnk
      FROM counts
    )
    WHERE rnk <= {HH_GROUP_TOPK}
    """,
)
def q_heavy_hitters_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{HH_GROUP_TOPK} tokens PER LANGUAGE via the same distributed
    Misra-Gries kernel, keyed on the (lang, word) COMPOSITE — the
    per-group frequent-items shape (hot keys per tenant/domain/shard).

    The crucial plan property carries over unchanged: the token stream
    still never shuffles — grouping lives INSIDE the sketch key, so
    each partition emits one ≤ HH_CAP-counter summary across ALL its
    groups (not cap-per-group state), the exchange carries
    O(partitions · cap) rows, and the per-group top-k window runs over
    the merged summary (≤ partitions · cap rows — bounded, never
    corpus-scale). The MG sandwich holds per composite key with the
    same Σ-decrements bound. Exact-regime oracle as q_heavy_hitters
    (fixture: |lang × vocab| ≪ HH_CAP ⇒ counts exact, err_hi = 0,
    both hash-pinned)."""
    t = load_tables(spark, sf_dir)
    summaries = mg_summaries(
        tokens_of(t["documents"], "lang"), ["lang", "word"], HH_CAP
    )
    err = summaries.filter(F.col("word").isNull()).agg(
        F.sum("cnt").cast("bigint").alias("err_hi")
    )
    merged = (
        summaries.filter(F.col("word").isNotNull())
        .groupBy("lang", "word")
        .agg(F.sum("cnt").cast("bigint").alias("cnt_lo"))
    )
    w = W.partitionBy("lang").orderBy(F.col("cnt_lo").desc(), F.col("word").asc())
    return (
        merged.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= HH_GROUP_TOPK)
        .crossJoin(F.broadcast(err))
        .select(
            "lang",
            "word",
            "cnt_lo",
            F.coalesce("err_hi", F.lit(0)).cast("bigint").alias("err_hi"),
            F.col("rnk").cast("bigint").alias("rnk"),
        )
    )


#: The SCD2 full-rebuild oracle — shared VERBATIM by q_scd2_history
#: and q_scd2_incremental: the incremental merge's contract is
#: "indistinguishable from a full rebuild", so the two MUST compare
#: against one SQL text (the no-drift rule).
_SCD2_ORACLE = """
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN LAG(event_type) OVER w IS NULL
                       OR LAG(event_type) OVER w <> event_type
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ),
    grp AS (
      SELECT user_id, ts, event_type,
             SUM(is_new) OVER (
               PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               ROWS UNBOUNDED PRECEDING
             ) AS run_id
      FROM ordered
    ),
    runs AS (
      SELECT user_id, run_id, event_type AS state,
             MIN(ts) AS valid_from,
             COUNT(*) AS n_events
      FROM grp
      GROUP BY user_id, run_id, event_type
    )
    SELECT user_id, state, valid_from,
           LEAD(valid_from) OVER (
             PARTITION BY user_id ORDER BY run_id ASC
           ) AS valid_to,
           (LEAD(valid_from) OVER (
             PARTITION BY user_id ORDER BY run_id ASC
           ) IS NULL) AS is_current,
           CAST(n_events AS BIGINT) AS n_events
    FROM runs
    """


#: windowFunnel window: the whole matched chain must fit in 12 hours —
#: chosen where the fixture's funnel actually discriminates (measured
#: at sf0.01: 150 signups → 143 reach level 2 → 31 reach level 3; at
#: 7 days 149/150 reached level 3 and the report said nothing).
FUNNEL_WINDOW_US = 12 * 3_600_000_000


@query(
    "q_window_funnel",
    oracle=f"""
    WITH su AS (SELECT user_id, ts FROM events WHERE event_type = 'signup'),
    lvl1 AS (SELECT DISTINCT user_id FROM su),
    lvl2 AS (
        SELECT DISTINCT s.user_id
        FROM su s JOIN events c
          ON c.user_id = s.user_id AND c.event_type = 'click'
         AND c.ts >= s.ts
         AND epoch_us(c.ts) - epoch_us(s.ts) <= {FUNNEL_WINDOW_US}
    ),
    lvl3 AS (
        SELECT DISTINCT s.user_id
        FROM su s
        JOIN events c ON c.user_id = s.user_id AND c.event_type = 'click'
                     AND c.ts >= s.ts
        JOIN events p ON p.user_id = s.user_id AND p.event_type = 'purchase'
                     AND p.ts >= c.ts
         AND epoch_us(p.ts) - epoch_us(s.ts) <= {FUNNEL_WINDOW_US}
    )
    SELECT l1.user_id,
           CASE WHEN l3.user_id IS NOT NULL THEN 3
                WHEN l2.user_id IS NOT NULL THEN 2
                ELSE 1 END AS funnel_level
    FROM lvl1 l1
    LEFT JOIN lvl2 l2 ON l2.user_id = l1.user_id
    LEFT JOIN lvl3 l3 ON l3.user_id = l1.user_id
    """,
)
def q_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """windowFunnel — the ClickHouse/Amplitude funnel primitive the
    plain q_funnel (lifetime step counts) cannot express: per user,
    the DEEPEST ordered prefix of signup → click → purchase whose
    WHOLE chain fits inside a {hours}-hour window anchored at the
    signup. "Converted eventually" and "converted within a week" are
    different products; this measures the second.

    Scale shape — NOT the oracle's O(n³) exists-joins: ONE user_id
    window pass with greedy carry-forwards. The key identity: a
    later-starting valid prefix can only ADMIT MORE continuations (the
    window constraint binds first-to-last), so carrying the MAXIMUM
    start time of any valid k-prefix is lossless — s_last carries the
    latest signup, each click converts it to a 2-prefix start if the
    click sits within the window, c2_best carries the latest such
    start, and a purchase completes level 3 if it sits within the
    window of c2_best. One shuffle, no joins, state = two timestamps
    per user. The oracle is the independent brute-force EXISTS
    derivation, so the hash compares the greedy argument against the
    definition itself.

    Determinism: pure integer µs arithmetic; per-user event times are
    unique in the fixture (pinned in tests/test_fixture_schema.py), so
    the at-or-before carries and the oracle's >= joins coincide."""
    ev = load_tables(spark, sf_dir)["events"]
    us = F.unix_micros(F.col("ts"))
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    is_type = lambda t: F.col("event_type") == t  # noqa: E731
    s_last = F.max(F.when(is_type("signup"), us)).over(w)
    c2_start = F.when(
        is_type("click") & (us - s_last <= FUNNEL_WINDOW_US), s_last
    )
    rows = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        us.alias("us"),
        s_last.alias("s_last"),
        c2_start.alias("c2_start"),
    )
    c2_best = F.max("c2_start").over(w)
    scored = rows.withColumn(
        "lvl3",
        is_type("purchase")
        & (F.col("us") - c2_best <= FUNNEL_WINDOW_US),
    )
    agg = scored.groupBy("user_id").agg(
        F.max(is_type("signup")).alias("has1"),
        F.max(F.col("c2_start").isNotNull()).alias("has2"),
        F.max("lvl3").alias("has3"),
    )
    return agg.filter(F.col("has1")).select(
        "user_id",
        F.when(F.col("has3"), 3)
        .when(F.col("has2"), 2)
        .otherwise(1)
        .cast("int")
        .alias("funnel_level"),
    )


q_window_funnel.__doc__ = q_window_funnel.__doc__.format(
    hours=FUNNEL_WINDOW_US // 3_600_000_000
)


@query(
    "q_dim_lookup_scd2",
    oracle="""
    WITH status AS (
        SELECT user_id, ts, event_id, event_type
        FROM events WHERE event_type IN ('signup', 'error')
    ),
    ordered AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN LAG(event_type) OVER w IS NULL
                         OR LAG(event_type) OVER w <> event_type
                    THEN 1 ELSE 0 END AS is_new
        FROM status
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ),
    grp AS (
        SELECT user_id, ts, event_id, event_type, is_new,
               SUM(is_new) OVER (
                   PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                   ROWS UNBOUNDED PRECEDING
               ) AS run_id
        FROM ordered
    ),
    iv AS (
        -- one row per run: the OPENING status row, carrying its
        -- event_id so the probe bound below can replay the engine's
        -- total (ts, event_id) order under equal timestamps
        SELECT user_id, run_id, event_type AS status,
               ts AS valid_from, event_id AS open_eid
        FROM grp WHERE is_new = 1
    )
    SELECT e.event_id, e.user_id, m.status,
           CASE WHEN m.valid_from IS NULL THEN NULL
                ELSE epoch_us(e.ts) - epoch_us(m.valid_from)
           END AS us_in_status
    FROM events e
    LEFT JOIN LATERAL (
        -- the containing interval = the LAST run whose opening row
        -- precedes the probe in the engine's TOTAL (ts, event_id)
        -- order — a run opened at the probe's exact ts counts only if
        -- its opener's event_id sorts before the purchase's, exactly
        -- what the single-pass carry sees (ADVICE r14 #2: the bare
        -- valid_from <= ts bound matched the NEW run where the engine
        -- carries the old one)
        SELECT i.status, i.valid_from
        FROM iv i
        WHERE i.user_id = e.user_id
          AND (i.valid_from < e.ts
               OR (i.valid_from = e.ts AND i.open_eid < e.event_id))
        ORDER BY i.run_id DESC LIMIT 1
    ) m ON TRUE
    WHERE e.event_type = 'purchase'
    """,
)
def q_dim_lookup_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time DIMENSION LOOKUP against an SCD2 history — the
    consuming half of the SCD2 story (q_scd2_history builds the
    intervals; this answers "what was the user's status WHEN they
    purchased?"): the status dim derives from the signup/error events
    (runs of consecutive equal status, the standard toy registered-vs-
    errored standing), and every purchase is attributed to the
    interval containing its timestamp — purchases before the user's
    first status row keep a NULL status (the audit must see the
    unattributable mass).

    Scale shape — the part that matters: NOT a range join. The naive
    spelling (facts ⋈ dim ON user AND valid_from <= ts < valid_to) is
    a per-row interval probe that degrades to BroadcastNestedLoop; the
    scalable form interleaves dim rows and probes in ONE user_id
    window pass and carries the last run's (status, valid_from)
    forward — the same carry discipline as q_join_asof, except the
    carried value is a STRUCT (run attribution, not just a timestamp).
    One shuffle, no join, no explosion. The oracle is a deliberately
    INDEPENDENT derivation (interval CTE + correlated LATERAL picking
    the last run at-or-before the probe by run_id), so the hash
    compares two different algorithms."""
    t = load_tables(spark, sf_dir)
    e = t["events"]
    is_status = F.col("event_type").isin("signup", "error")
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    # run starts among STATUS rows only: a status row opens a new run
    # iff the previous status row (ignoring probes) had another status
    prev_status = F.last(
        F.when(is_status, F.col("event_type")), ignorenulls=True
    ).over(
        w.rowsBetween(W.unboundedPreceding, -1)
    )
    tagged = e.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        (
            is_status
            & (prev_status.isNull() | (prev_status != F.col("event_type")))
        ).alias("opens_run"),
    )
    # carry the open run's (status, valid_from) forward as ONE struct —
    # two separate carries could disagree under ties; a struct cannot
    carried = F.last(
        F.when(
            F.col("opens_run"),
            F.struct(
                F.col("event_type").alias("status"),
                F.unix_micros("ts").alias("from_us"),
            ),
        ),
        ignorenulls=True,
    ).over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
    return (
        tagged.withColumn("run", carried)
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.col("run.status").alias("status"),
            (F.unix_micros("ts") - F.col("run.from_us")).alias("us_in_status"),
        )
    )


@query("q_scd2_history", oracle=_SCD2_ORACLE)
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 history build (gaps-and-islands): collapse each
    user's event stream into runs of consecutive equal states and emit
    half-open validity intervals [valid_from, valid_to) with the
    `is_current` flag — the slowly-changing-dimension table every
    warehouse maintains for "what was this user's state at time T?"
    point-in-time joins (and the missing sibling of q_join_asof, which
    CONSUMES such intervals).

    The island detection is the classic two-window idiom: a
    change-flag (lag ≠ current, frame-free), a running sum of flags to
    number the runs, then one aggregate per run and a lead() to close
    each interval at the next run's start. Ordering is total — (ts,
    event_id) — so run numbering is engine-identical even under equal
    timestamps, and consecutive runs that share a min-ts still order
    deterministically by run_id in the closing window.

    Scale shape: every window and the aggregate partition by user_id —
    the table's highest-cardinality key, no skew — so the whole build
    is ONE shuffle on user_id reused by all three steps (Spark plans
    the two windows + groupBy over a single exchange, AQE-coalesced);
    nothing is corpus-global. At 100 TB this is the textbook
    linear-scan SCD2 derivation: no self-join, no per-row range probe.
    """
    t = load_tables(spark, sf_dir)
    return _scd2_build(t["events"])


def _scd2_build(events: DataFrame, weight=None, seq=None) -> DataFrame:
    """The gaps-and-islands SCD2 derivation over an events frame —
    shared by q_scd2_history (full corpus), q_scd2_incremental (the
    pre-split backfill) and scd2_walked (the seeded merge).

    ``weight`` (a Column) is each row's contribution to its run's
    n_events — default 1 per event; the seeded walk passes
    coalesce(seed_n, 1) so a seed pseudo-row carries its open run's
    accumulated count into whichever run it begins.

    ``seq`` (a Column) is an optional per-user BASE ordinal carried on
    seed rows (null elsewhere); when given the output gains
    ``run_seq`` = base (default 1) + run_id − 1 — a per-user run
    ordinal that is strictly increasing, stable across seeded
    recomputes (the seed run keeps its stored ordinal; new runs
    extend), and therefore a sound MERGE identity even when
    equal-timestamp state flips give two runs the same valid_from
    (ADVICE r13 #1: (user_id, valid_from) is NOT unique under ts
    ties, and neither is (user_id, valid_from, state) — events
    A,B,A at one ts yield two distinct (t, A) runs)."""
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    prev = F.lag("event_type").over(w)
    ordered = events.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        *([weight.alias("__wt")] if weight is not None else []),
        *([seq.alias("__seq")] if seq is not None else []),
        F.when(prev.isNull() | (prev != F.col("event_type")), 1)
        .otherwise(0)
        .alias("is_new"),
    )
    grp = ordered.select(
        "user_id",
        "ts",
        "event_type",
        *(["__wt"] if weight is not None else []),
        *(["__seq"] if seq is not None else []),
        F.sum("is_new")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("run_id"),
    )
    n_expr = F.sum("__wt") if weight is not None else F.count("*")
    runs = grp.groupBy("user_id", "run_id", F.col("event_type").alias("state")).agg(
        F.min("ts").alias("valid_from"),
        n_expr.alias("n_events"),
        # only the seed pseudo-row carries a base ordinal, and it lives
        # in the user's FIRST run (the seed sorts first by event_id −1)
        *([F.max("__seq").alias("__seq")] if seq is not None else []),
    )
    w2 = W.partitionBy("user_id").orderBy(F.col("run_id").asc())
    nxt = F.lead("valid_from").over(w2)
    return runs.select(
        "user_id",
        "state",
        "valid_from",
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
        F.col("n_events").cast("bigint").alias("n_events"),
        *(
            [
                (
                    F.coalesce(
                        F.max("__seq").over(W.partitionBy("user_id")),
                        F.lit(1),
                    )
                    + F.col("run_id")
                    - 1
                )
                .cast("bigint")
                .alias("run_seq")
            ]
            if seq is not None
            else []
        ),
    )


#: Z-order geometry: each dimension scaled to 2^10 cells, bits
#: interleaved into a 20-bit Morton key, audited at 64 buckets
#: (top 6 bits).
ZORDER_BITS = 10
ZORDER_CELLS = 1 << ZORDER_BITS
ZORDER_BUCKET_SHIFT = 2 * ZORDER_BITS - 6


def _z_interleave_sql(x: str, y: str) -> str:
    """Morton bit-interleave as expression text — IDENTICAL in Spark
    SQL and DuckDB (`>>`, `<<`, `&`, `|` share semantics on BIGINT in
    both), so ONE generator serves the engine and the oracle and the
    interleave cannot drift."""
    terms = []
    for i in range(ZORDER_BITS):
        terms.append(f"(((({x}) >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"(((({y}) >> {i}) & 1) << {2 * i})")
    return " | ".join(terms)


def _z_scaled(expr: str, mn: str, mx: str, divop: str) -> str:
    """Scale an int expression to [0, ZORDER_CELLS) by its min/max —
    exact int64 arithmetic; ``divop`` is `div` (Spark) / `//` (DuckDB),
    the one spelling difference between the engines."""
    return f"((({expr}) - ({mn})) * {ZORDER_CELLS}) {divop} (({mx}) - ({mn}) + 1)"


_Z_DAY_DUCK = "epoch_us(l_shipdate) // 86400000000"


@query(
    "q_zorder_layout",
    oracle=f"""
    WITH b AS (
        SELECT MIN(l_partkey) AS minp, MAX(l_partkey) AS maxp,
               MIN({_Z_DAY_DUCK}) AS mind, MAX({_Z_DAY_DUCK}) AS maxd
        FROM lineitem
    ),
    c AS (
        SELECT {_z_scaled('l_partkey', 'minp', 'maxp', '//')} AS xc,
               {_z_scaled(_Z_DAY_DUCK, 'mind', 'maxd', '//')} AS yc
        FROM lineitem, b
    )
    SELECT ({_z_interleave_sql('xc', 'yc')}) >> {ZORDER_BUCKET_SHIFT}
             AS zbucket,
           COUNT(*) AS n_rows,
           MIN(xc) AS x_min, MAX(xc) AS x_max,
           MIN(yc) AS y_min, MAX(yc) AS y_max
    FROM c
    GROUP BY 1
    """,
)
def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering audit over lineitem's two hottest
    filter dimensions (part key × ship day) — the layout-optimization
    primitive behind Delta/Iceberg's OPTIMIZE ZORDER: interleaving the
    bits of both dims gives a 1-D sort key whose contiguous ranges stay
    rectangular-ish in BOTH dims, so parquet min/max stats can skip
    files for predicates on EITHER column (a plain sort skips on one).

    This query computes the Morton key (exact int64: both dims
    min/max-scaled to {cells} cells by integer arithmetic, bits
    interleaved by a generator emitting the SAME expression text to
    Spark and DuckDB) and reports, per top-6-bit z-bucket, the row
    count and each dimension's cell range — the skipping audit: a
    well-clustered bucket covers ≈ 1/8 of each dim (3 of its 6 bucket
    bits per dim), where a 1-D sort's buckets cover ALL of the second
    dim. Writing the layout is one `repartitionByRange(zkey)` +
    sortWithinPartitions away; the audit is the part that needs to be
    a query.

    Scale shape: ONE pre-aggregate for the 4 bounds (map-side
    combined, 1-row broadcast back), one projection (pure bit ops in
    whole-stage codegen), one partial-agg shuffle of ≤ 64 groups. No
    window, no join wider than the broadcast row. At 100 TB the bounds
    come from table stats for free and everything else is a linear
    scan.
    """
    t = load_tables(spark, sf_dir)
    day = "unix_micros(l_shipdate) div 86400000000"
    li = t["lineitem"].select(
        "l_partkey", F.expr(day).alias("d")
    )
    b = li.agg(
        F.min("l_partkey").alias("minp"),
        F.max("l_partkey").alias("maxp"),
        F.min("d").alias("mind"),
        F.max("d").alias("maxd"),
    )
    c = li.crossJoin(F.broadcast(b)).select(
        F.expr(_z_scaled("l_partkey", "minp", "maxp", "div")).alias("xc"),
        F.expr(_z_scaled("d", "mind", "maxd", "div")).alias("yc"),
    )
    return (
        c.select(
            F.expr(
                f"({_z_interleave_sql('xc', 'yc')}) >> {ZORDER_BUCKET_SHIFT}"
            ).alias("zbucket"),
            "xc",
            "yc",
        )
        .groupBy("zbucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("xc").alias("x_min"),
            F.max("xc").alias("x_max"),
            F.min("yc").alias("y_min"),
            F.max("yc").alias("y_max"),
        )
    )


q_zorder_layout.__doc__ = q_zorder_layout.__doc__.format(cells=ZORDER_CELLS)


#: Fixed CDC boundary for the incremental SCD2 build: the fixture's
#: event stream spans January 2024 at every scale factor, so both the
#: backfill and the arriving batch are non-empty everywhere.
SCD2_SPLIT_TS = "2024-01-16 00:00:00"


@query("q_scd2_incremental", oracle=_SCD2_ORACLE)
def q_scd2_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SCD2 merge — apply a new event batch (ts ≥
    {split}) to an EXISTING history without rebuilding it: the nightly
    CDC MERGE every dimension table runs, here contract-pinned to be
    bit-indistinguishable from a full rebuild (the oracle is VERBATIM
    q_scd2_history's — the strongest possible statement about an
    incremental operator).

    Merge semantics, all bounded by the AFFECTED user set (users with
    a row in the new batch):
    - untouched users: their history rows pass through by anti-join —
      at 100 TB this is the whole point (a day's batch touches a tiny
      fraction of users; the unaffected history is never rewritten);
    - affected users' CLOSED intervals pass through (append-only —
      closed history is immutable under new events);
    - each affected user's OPEN run seeds a per-user walk over their
      new events (one applyInPandas group: seed first, then events in
      (ts, event_id) order — the stream_scd2_changes kernel's logic),
      extending the run if the state holds, closing and reopening as
      it changes, emitting a fresh open row at the end.

    Scale shape: hist(affected) is two joins against a batch-sized key
    set (semi + anti on user_id); the walk shuffles only the new batch
    plus one seed row per affected user. Nothing corpus-sized moves.
    """
    from hive_gateway_spark.staging import stage

    t = load_tables(spark, sf_dir)
    ev = t["events"].select("user_id", "ts", "event_id", "event_type")
    split = F.lit(SCD2_SPLIT_TS).cast("timestamp")
    old, new = ev.filter(F.col("ts") < split), ev.filter(F.col("ts") >= split)
    # Stage the existing history: scd2_apply consumes it THREE times
    # (untouched anti, affected semi → closed + seeds) and each branch
    # replayed the whole window build (plan-verified r16: the events
    # scan + run-walk appeared once per consumer). In production the
    # history is a STORED dimension table — the checkpoint models
    # reading it, which is exactly the incremental contract (guide
    # §2.4).
    return scd2_apply(
        stage(_scd2_build(old), "advanced.scd2_incremental.hist"), new
    )


def scd2_apply(hist: DataFrame, new: DataFrame) -> DataFrame:
    """Apply a new event batch to an existing SCD2 history frame — the
    assembly shared by q_scd2_incremental and the property test that
    randomizes the split point (tests/test_properties.py)."""
    affected = new.select("user_id").distinct()
    untouched = hist.join(affected, "user_id", "left_anti")
    hist_aff = hist.join(affected, "user_id", "left_semi")
    closed_aff = hist_aff.filter(~F.col("is_current"))
    seeds = hist_aff.filter(F.col("is_current"))
    walked = scd2_walked(seeds, new)
    return untouched.unionByName(closed_aff).unionByName(walked)


#: Walked-output schema — the SCD2 table schema, shared by the batch
#: query and the streaming dimension maintainer.
SCD2_SCHEMA = (
    "user_id bigint, state string, valid_from timestamp, "
    "valid_to timestamp, is_current boolean, n_events bigint"
)


def scd2_walked(seeds: DataFrame, batch: DataFrame, seq: bool = False) -> DataFrame:
    """Seeded per-user interval walk — the merge core shared by
    q_scd2_incremental and streaming.scd2_dimension_sink. ``seeds`` are
    OPEN history rows (user_id, state, valid_from, n_events[, ...]);
    ``batch`` is the new events frame. Returns the affected users'
    recomputed interval rows (their closed history is immutable and is
    NOT re-emitted). Contract: batch events are at-or-after every
    seed's valid_from (event-time-ordered ingestion — the same
    assumption the stream twin documents).

    ``seq=True`` (the dimension sink's mode) additionally threads the
    stable per-user run ordinal: seeds must then carry ``run_seq`` and
    the output gains it — the open run keeps its stored ordinal, new
    runs extend it (see _scd2_build's seq contract; ADVICE r13 #1).

    Implementation: the seed is a pseudo-event sorted FIRST in its
    user's order (event_id −1, ts = its run's valid_from) carrying the
    open run's accumulated count, and the whole walk is _scd2_build
    with weight = coalesce(seed_n, 1) — pure window ops. The first
    spelling was an applyInPandas loop: at sf0.1's ~10k affected users
    the per-GROUP pandas overhead (one DataFrame + sort per tiny
    group) cost ~10 s where these windows run in well under one — the
    per-group-Python trap, distinct from the per-ROW one."""
    seed_rows = seeds.select(
        "user_id",
        F.col("valid_from").alias("ts"),
        F.lit(-1).cast("bigint").alias("event_id"),  # seed sorts first
        F.col("state").alias("event_type"),
        F.col("n_events").cast("bigint").alias("seed_n"),
        *(
            [F.col("run_seq").cast("bigint").alias("__baseseq")]
            if seq
            else []
        ),
    )
    combined = seed_rows.unionByName(
        batch.select("user_id", "ts", "event_id", "event_type").withColumns(
            {
                "seed_n": F.lit(None).cast("bigint"),
                **({"__baseseq": F.lit(None).cast("bigint")} if seq else {}),
            }
        )
    )
    return _scd2_build(
        combined,
        weight=F.coalesce("seed_n", F.lit(1)),
        seq=F.col("__baseseq") if seq else None,
    )


q_scd2_incremental.__doc__ = q_scd2_incremental.__doc__.format(split=SCD2_SPLIT_TS)


@query(
    "q_wow_growth",
    oracle="""
    WITH weekly AS (
        SELECT event_type,
               epoch_us(ts) // 604800000000 AS week,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(CAST(ROUND(value, 2) AS DECIMAL(18,2)) * 100
                              AS BIGINT)) AS BIGINT) AS value_cents
        FROM events
        GROUP BY 1, 2
    )
    SELECT event_type, week, n_events, value_cents,
           LAG(n_events) OVER w AS prev_events,
           CASE WHEN LAG(n_events) OVER w IS NULL THEN NULL
                ELSE ROUND(CAST(n_events AS DOUBLE)
                           / CAST(LAG(n_events) OVER w AS DOUBLE), 4)
           END AS wow_ratio
    FROM weekly
    WINDOW w AS (PARTITION BY event_type ORDER BY week ASC)
    """,
)
def q_wow_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week growth per event type — the period-over-period
    report every BI layer ships: weekly volume and exact-cents value,
    each week's ratio to the previous week (NULL for the first — no
    fabricated baseline).

    Determinism: weeks are integer epoch-µs division (house rule);
    value sums in exact cents (ROUND(·,2)·100 as BIGINT — the fixture
    values are 2 dp, so this is lossless); the one double division is
    a ratio of exact counts.

    Scale shape: a partial-agg shuffle down to (type, week) — ~5·52
    rows/year — then a window over that TINY frame; the corpus is
    touched exactly once. The window partitions by event_type (5
    partitions), which is only safe BECAUSE its input is the weekly
    aggregate, never the raw events.
    """
    ev = load_tables(spark, sf_dir)["events"]
    weekly = (
        ev.select(
            "event_type",
            F.expr("unix_micros(ts) div 604800000000").alias("week"),
            F.round("value", 2).alias("v2"),
        )
        .groupBy("event_type", "week")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(
                (F.col("v2").cast("decimal(18,2)") * 100).cast("bigint")
            ).cast("bigint").alias("value_cents"),
        )
    )
    w = W.partitionBy("event_type").orderBy(F.col("week").asc())
    prev = F.lag("n_events").over(w)
    return weekly.select(
        "event_type",
        "week",
        "n_events",
        "value_cents",
        prev.alias("prev_events"),
        F.when(
            prev.isNull(), F.lit(None).cast("double")
        ).otherwise(
            F.round(F.col("n_events").cast("double") / prev.cast("double"), 4)
        ).alias("wow_ratio"),
    )


@query(
    "q_volume_trend",
    oracle="""
    WITH weekly AS (
        SELECT event_type,
               epoch_us(ts) // 604800000000 AS week,
               COUNT(*) AS y
        FROM events
        GROUP BY 1, 2
    ),
    sums AS (
        SELECT event_type,
               COUNT(*) AS n,
               SUM(week) AS sx, SUM(y) AS sy,
               SUM(week * y) AS sxy, SUM(week * week) AS sxx
        FROM weekly
        GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_weeks,
           CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
           CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
           CASE WHEN n * sxx - sx * sx = 0 THEN NULL
                ELSE ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                           / CAST(n * sxx - sx * sx AS DOUBLE), 4)
           END AS slope,
           CASE WHEN n * sxx - sx * sx = 0 THEN 'flat'
                WHEN n * sxy - sx * sy > 0 THEN 'up'
                WHEN n * sxy - sx * sy < 0 THEN 'down'
                ELSE 'flat' END AS direction
    FROM sums
    """,
)
def q_volume_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear trend of weekly event volume per type — ordinary least
    squares reduced to its closed form over EXACT integer sums:

        slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)

    with x = epoch-week and y = weekly count, both int64, so numerator
    and denominator are exact in both engines (they ride along as
    columns — the driver hash pins the integer algebra, not just the
    rounded quotient) and the DIRECTION verdict ('up'/'down'/'flat')
    is a pure integer sign test that can never flap on float noise —
    the property an alerting rule cares about.

    Scale shape: two stacked partial aggregates (corpus → (type, week)
    → type), both map-side combined; the regression itself costs five
    int64 sums. At 100 TB this is the cheapest possible trend monitor:
    one linear pass, ~types·weeks intermediate rows. Magnitude note:
    epoch-weeks ≈ 2.8k and weekly counts < 2³² keep n·Σxy far inside
    int64 for any realistic (type, week) fan-out.
    """
    ev = load_tables(spark, sf_dir)["events"]
    weekly = (
        ev.select(
            "event_type",
            F.expr("unix_micros(ts) div 604800000000").alias("week"),
        )
        .groupBy("event_type", "week")
        .agg(F.count("*").alias("y"))
    )
    sums = weekly.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("week").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("week") * F.col("y")).alias("sxy"),
        F.sum(F.col("week") * F.col("week")).alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return sums.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_weeks"),
        num.cast("bigint").alias("slope_num"),
        den.cast("bigint").alias("slope_den"),
        F.when(den == 0, F.lit(None).cast("double"))
        .otherwise(F.round(num.cast("double") / den.cast("double"), 4))
        .alias("slope"),
        F.when(den == 0, "flat")
        .when(num > 0, "up")
        .when(num < 0, "down")
        .otherwise("flat")
        .alias("direction"),
    )


#: Benford first-digit probabilities as parts-per-million integers —
#: log10(1 + 1/d) evaluated ONCE here (they sum to exactly 1,000,000),
#: injected into both engines as literals: no in-engine transcendental.
BENFORD_PPM = (301030, 176091, 124939, 96910, 79181, 66947, 57992, 51153, 45757)


def _benford_case(digit_col: str) -> str:
    whens = " ".join(
        f"WHEN {d + 1} THEN {p}" for d, p in enumerate(BENFORD_PPM)
    )
    return f"CASE {digit_col} {whens} ELSE 0 END"


@query(
    "q_benford_values",
    oracle=f"""
    WITH digits AS (
        SELECT SUBSTR(CAST(CAST(CAST(ROUND(value, 2) AS DECIMAL(18,2)) * 100
                           AS BIGINT) AS VARCHAR), 1, 1) AS d1
        FROM events
        WHERE value > 0
    ),
    counts AS (
        SELECT CAST(d1 AS BIGINT) AS digit, COUNT(*) AS n_observed
        FROM digits GROUP BY 1
    ),
    tot AS (SELECT SUM(n_observed) AS n FROM counts)
    SELECT c.digit, c.n_observed,
           CAST({_benford_case('c.digit')} AS BIGINT) AS benford_ppm,
           CAST(ROUND(CAST(c.n_observed AS DOUBLE) * 1000000.0
                      / CAST(t.n AS DOUBLE), 0) AS BIGINT) AS observed_ppm,
           ABS(CAST(ROUND(CAST(c.n_observed AS DOUBLE) * 1000000.0
                          / CAST(t.n AS DOUBLE), 0) AS BIGINT)
               - {_benford_case('c.digit')}) AS deviation_ppm
    FROM counts c CROSS JOIN tot t
    """,
)
def q_benford_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit over the event values — the
    fraud/fabrication screen auditors run on any organic numeric
    column: natural multiplicative data follows P(d) = log10(1+1/d);
    fabricated or clamped data does not, and the per-digit deviation
    localizes WHERE the distribution breaks (the fixture's uniform
    values fail Benford loudly — the audit reports, it does not
    assert).

    Determinism: the leading digit comes from the exact-cents integer
    (the q_wow_growth DECIMAL route — no float formatting), Benford's
    probabilities are precomputed parts-per-million INTEGER literals
    (summing to exactly 10⁶; no in-engine log), and the one division
    per digit is ROUND(·, 0) of exact counts.

    Scale shape: one partial-agg shuffle to 9 rows, a 1-row total
    broadcast back. Linear scan, nothing else.
    """
    ev = load_tables(spark, sf_dir)["events"]
    cents = (
        F.round("value", 2).cast("decimal(18,2)") * 100
    ).cast("bigint")
    digits = ev.filter(F.col("value") > 0).select(
        F.substring(cents.cast("string"), 1, 1).cast("bigint").alias("digit")
    )
    counts = digits.groupBy("digit").agg(F.count("*").alias("n_observed"))
    tot = counts.agg(F.sum("n_observed").alias("n"))
    obs_ppm = F.round(
        F.col("n_observed").cast("double") * 1000000.0 / F.col("n").cast("double"),
        0,
    ).cast("bigint")
    bppm = F.expr(_benford_case("digit")).cast("bigint")
    return counts.crossJoin(F.broadcast(tot)).select(
        "digit",
        "n_observed",
        bppm.alias("benford_ppm"),
        obs_ppm.alias("observed_ppm"),
        F.abs(obs_ppm - bppm).alias("deviation_ppm"),
    )


#: As-of tolerance: a signup older than this no longer explains the
#: event (merge_asof(tolerance=...) / ASOF staleness bound) — 3 days.
ASOF_TOLERANCE_US = 3 * 86_400_000_000


@query(
    "q_join_asof_tolerance",
    oracle=f"""
    SELECT e.event_id, e.user_id,
           CASE WHEN m.last_us IS NULL THEN NULL
                ELSE epoch_us(e.ts) - m.last_us END AS us_since_signup,
           (m.last_us IS NOT NULL) AS fresh
    FROM events e
    LEFT JOIN LATERAL (
        SELECT MAX(epoch_us(s.ts)) AS last_us
        FROM events s
        WHERE s.user_id = e.user_id
          AND s.event_type = 'signup'
          -- (ts, event_id) lexicographic bound: the engine's window
          -- frame ends AT the current row, so a signup sharing the
          -- event's ts is visible only when its event_id is <= the
          -- event's (ADVICE r13 #2 — the bare s.ts <= e.ts admitted
          -- same-ts signups with LARGER event_ids the engine's frame
          -- cannot see)
          AND (s.ts < e.ts OR (s.ts = e.ts AND s.event_id <= e.event_id))
          AND epoch_us(s.ts) >= epoch_us(e.ts) - {ASOF_TOLERANCE_US}
    ) m ON m.last_us IS NOT NULL
    """,
)
def q_join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a staleness bound (pandas merge_asof's
    ``tolerance`` / kdb's windowed wj): the most recent signup
    at-or-before each event counts only if it happened within
    {tol_days} days — older context is noise, and an unbounded as-of
    would silently attribute to it. Events with no fresh signup emit
    NULL + fresh = false rather than vanishing (the audit needs to see
    the unattributed mass).

    Plan: the same single carry-forward pass as q_join_asof — one
    user_id shuffle, no join — with the tolerance applied as a
    projection on the carried timestamp. The oracle deliberately takes
    a DIFFERENT shape (a correlated LATERAL max — O(n·m) but exact),
    so the hash compares two independent derivations, not the same
    window twice.
    """
    t = load_tables(spark, sf_dir)
    e = t["events"]
    us = F.unix_micros(F.col("ts"))
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    last_signup = F.last(
        F.when(F.col("event_type") == "signup", us), ignorenulls=True
    ).over(w)
    fresh = last_signup.isNotNull() & (
        us - last_signup <= ASOF_TOLERANCE_US
    )
    return e.select(
        "event_id",
        "user_id",
        F.when(fresh, us - last_signup).alias("us_since_signup"),
        fresh.alias("fresh"),
    )


q_join_asof_tolerance.__doc__ = q_join_asof_tolerance.__doc__.format(
    tol_days=ASOF_TOLERANCE_US // 86_400_000_000
)


@query(
    "q_attribution_linear",
    oracle="""
    WITH seg AS (
        SELECT user_id, event_id, event_type,
               (event_type = 'purchase') AS is_conv,
               COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                        OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) AS seg0
        FROM events
    ),
    touches AS (SELECT * FROM seg WHERE NOT is_conv),
    convs AS (SELECT DISTINCT user_id, seg0 FROM seg WHERE is_conv),
    sizes AS (
        SELECT user_id, seg0, COUNT(*) AS nt
        FROM touches GROUP BY user_id, seg0
    )
    SELECT t.event_type AS channel,
           COUNT(*) AS n_touches,
           CAST(SUM(CAST(ROUND(1000000.0 / CAST(z.nt AS DOUBLE), 0) AS BIGINT))
                AS BIGINT) AS credit_ppm
    FROM touches t
    JOIN convs c ON c.user_id = t.user_id AND c.seg0 = t.seg0
    JOIN sizes z ON z.user_id = t.user_id AND z.seg0 = t.seg0
    GROUP BY t.event_type
    """,
)
def q_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch LINEAR attribution — the marketing-analytics staple
    beside q_first_touch's single-touch model: every touch between a
    user's consecutive purchases shares the conversion's credit
    equally (round(10⁶/n) ppm per touch — integer credits, so sums are
    exact and channel totals are engine-identical); touch runs that
    never convert (after the user's last purchase) earn nothing.

    Segmentation is one window: seg = number of purchases STRICTLY
    before the event (unbounded-preceding-to-1 frame), so touches
    group with the purchase that CLOSES their segment and consecutive
    purchases form empty segments that simply credit nobody.

    Scale shape: one user_id window shuffle, a (user, seg) partial agg
    for segment sizes, two equi-joins on the composite (user, seg) key
    — high-cardinality, no skew — and a final ≤ |channels| aggregate.
    No self-join on raw events, no per-conversion explosion.
    """
    ev = load_tables(spark, sf_dir)["events"]
    w_prev = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(W.unboundedPreceding, -1)
    )
    is_conv = F.col("event_type") == "purchase"
    seg = ev.select(
        "user_id",
        "event_id",
        "event_type",
        is_conv.alias("is_conv"),
        F.coalesce(
            F.sum(F.when(is_conv, 1).otherwise(0)).over(w_prev), F.lit(0)
        ).alias("seg0"),
    )
    touches = seg.filter(~F.col("is_conv"))
    convs = seg.filter(F.col("is_conv")).select("user_id", "seg0").distinct()
    sizes = touches.groupBy("user_id", "seg0").agg(F.count("*").alias("nt"))
    credit = F.round(1000000.0 / F.col("nt").cast("double"), 0).cast("bigint")
    return (
        touches.join(convs, ["user_id", "seg0"])
        .join(sizes, ["user_id", "seg0"])
        .groupBy(F.col("event_type").alias("channel"))
        .agg(
            F.count("*").alias("n_touches"),
            F.sum(credit).cast("bigint").alias("credit_ppm"),
        )
    )


@query(
    "q_cohort_revenue",
    oracle=f"""
    WITH {_COHORT_CTE},
    rev AS (
        SELECT f.cohort_wk,
               epoch_us(e.ts) // (86400000000 * 7) - f.cohort_wk
                 AS week_offset,
               SUM(CAST(CAST(ROUND(e.value, 2) AS DECIMAL(18,2)) * 100
                        AS BIGINT)) AS cents
        FROM events e
        JOIN first_signup f ON f.user_id = e.user_id
        WHERE e.event_type = 'purchase'
          AND epoch_us(e.ts) // (86400000000 * 7) - f.cohort_wk
              BETWEEN 0 AND {COHORT_WEEKS} - 1
        GROUP BY 1, 2
    ),
    grid AS (
        SELECT c.cohort_wk, c.n_cohort, CAST(k AS BIGINT) AS week_offset
        FROM cohort_sizes c, UNNEST(range({COHORT_WEEKS})) AS t(k)
    ),
    dense AS (
        SELECT g.cohort_wk, g.week_offset, g.n_cohort,
               CAST(COALESCE(r.cents, 0) AS BIGINT) AS revenue_cents
        FROM grid g LEFT JOIN rev r
          ON r.cohort_wk = g.cohort_wk AND r.week_offset = g.week_offset
    )
    SELECT cohort_wk AS cohort_week, week_offset,
           CAST(n_cohort AS BIGINT) AS n_cohort,
           revenue_cents,
           CAST(SUM(revenue_cents) OVER (
               PARTITION BY cohort_wk ORDER BY week_offset ASC
               ROWS UNBOUNDED PRECEDING
           ) AS BIGINT) AS ltv_cents,
           ROUND(CAST(SUM(revenue_cents) OVER (
               PARTITION BY cohort_wk ORDER BY week_offset ASC
               ROWS UNBOUNDED PRECEDING
           ) AS DOUBLE) / CAST(n_cohort AS DOUBLE) / 100.0, 4)
             AS ltv_per_user
    FROM dense
    """,
)
def q_cohort_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curve — q_cohort_retention's revenue twin over the
    SAME cohort definition (shared _COHORT_CTE fragment: one text
    decides what a cohort is): per (signup-week cohort, week offset),
    exact-cents purchase revenue, the running cumulative (the
    lifetime-value curve finance actually plots), and LTV per cohort
    member. Dense grid — a week with no purchases is an honest zero
    row, not a gap.

    Determinism: revenue in exact cents (the DECIMAL route), the
    cumulative sum an integer window over the tiny cohorts×{weeks}
    grid, and one rounded division per cell.

    Scale shape: identical to retention — per-user first-signup agg,
    a user-keyed join filtered to purchases, a (cohort, offset)
    aggregate; the LTV window runs over cohorts×{weeks} rows, never
    raw events.
    """
    ev = load_tables(spark, sf_dir)["events"]
    week_us = 86_400_000_000 * 7
    first_signup = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(F.unix_micros("ts")).alias("us"))
        .select("user_id", F.expr(f"us div {week_us}").alias("cohort_wk"))
    )
    cents = (F.round("value", 2).cast("decimal(18,2)") * 100).cast("bigint")
    rev = (
        ev.filter(F.col("event_type") == "purchase")
        .join(first_signup, "user_id")
        .select(
            "cohort_wk",
            (F.expr(f"unix_micros(ts) div {week_us}") - F.col("cohort_wk")).alias(
                "week_offset"
            ),
            cents.alias("cents"),
        )
        .filter(F.col("week_offset").between(0, COHORT_WEEKS - 1))
        .groupBy("cohort_wk", "week_offset")
        .agg(F.sum("cents").alias("cents"))
    )
    cohorts = first_signup.groupBy("cohort_wk").agg(F.count("*").alias("n_cohort"))
    grid = cohorts.select(
        "cohort_wk",
        "n_cohort",
        F.explode(F.expr(f"sequence(0, {COHORT_WEEKS} - 1)")).alias("wo"),
    ).select(
        "cohort_wk", "n_cohort", F.col("wo").cast("bigint").alias("week_offset")
    )
    dense = grid.join(rev, ["cohort_wk", "week_offset"], "left").select(
        "cohort_wk",
        "week_offset",
        "n_cohort",
        F.coalesce("cents", F.lit(0)).cast("bigint").alias("revenue_cents"),
    )
    w = (
        W.partitionBy("cohort_wk")
        .orderBy(F.col("week_offset").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    ltv = F.sum("revenue_cents").over(w)
    return dense.select(
        F.col("cohort_wk").alias("cohort_week"),
        "week_offset",
        F.col("n_cohort").cast("bigint").alias("n_cohort"),
        "revenue_cents",
        ltv.cast("bigint").alias("ltv_cents"),
        F.round(
            ltv.cast("double") / F.col("n_cohort").cast("double") / 100.0, 4
        ).alias("ltv_per_user"),
    )


q_cohort_revenue.__doc__ = q_cohort_revenue.__doc__.format(weeks=COHORT_WEEKS)


@query(
    "q_conversion_lag",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'signup'
                        THEN epoch_us(ts) END) AS signup_us,
               MIN(CASE WHEN event_type = 'purchase'
                        THEN epoch_us(ts) END) AS purchase_us
        FROM events
        GROUP BY user_id
    ),
    lags AS (
        SELECT (purchase_us - signup_us) // 86400000000 AS lag_days
        FROM firsts
        WHERE signup_us IS NOT NULL
          AND purchase_us IS NOT NULL
          AND purchase_us >= signup_us
    )
    SELECT lag_days,
           COUNT(*) AS n_users,
           CAST(SUM(COUNT(*)) OVER (ORDER BY lag_days ASC
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS cum_users
    FROM lags
    GROUP BY lag_days
    """,
)
def q_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: days from a user's FIRST signup to
    their first purchase OVERALL, kept only when that purchase is
    at-or-after the signup, histogrammed by whole days with the
    cumulative count — the curve a growth team reads percentiles off
    ("80% of converters convert within N days"). Users who signed up
    but never purchased are excluded by definition; a user whose first
    purchase PRECEDES their first signup is likewise dropped — even if
    a later purchase follows the signup — a deliberate one-pass
    semantics (both firsts from ONE conditional-MIN aggregate; the
    "first at-or-after purchase" variant would need a second
    signup-aware pass) that engine and oracle share (ADVICE r13 #3).

    Determinism: both firsts come from ONE conditional-MIN aggregate
    (exact epoch-µs), the lag is integer division, and the cumulative
    is an integer window over the ≤ max-lag-days rows.

    Scale shape: one per-user partial aggregate (two conditional MINs
    in the same pass — not two scans), then a ≤ days-sized histogram
    aggregate and a tiny single-partition window over it (bounded by
    the observation span in days, not the corpus).
    """
    ev = load_tables(spark, sf_dir)["events"]
    us = F.unix_micros("ts")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", us)).alias("signup_us"),
        F.min(F.when(F.col("event_type") == "purchase", us)).alias("purchase_us"),
    )
    lags = (
        firsts.filter(
            F.col("signup_us").isNotNull()
            & F.col("purchase_us").isNotNull()
            & (F.col("purchase_us") >= F.col("signup_us"))
        )
        .select(
            F.expr("(purchase_us - signup_us) div 86400000000").alias("lag_days")
        )
    )
    hist = lags.groupBy("lag_days").agg(F.count("*").alias("n_users"))
    w = (
        W.orderBy(F.col("lag_days").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return hist.select(
        "lag_days",
        "n_users",
        F.sum("n_users").over(w).cast("bigint").alias("cum_users"),
    )


@query(
    "q_sequence_count",
    oracle="""
    WITH RECURSIVE ordered AS (
        SELECT user_id, event_type,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               ) AS rn
        FROM events WHERE event_type IN ('signup', 'purchase')
    ),
    -- the DEFINITION, walked literally: from the previous chain's end,
    -- take the FIRST signup after it, then the FIRST purchase after
    -- that signup; repeat while a full chain exists
    chain(user_id, pos, cnt) AS (
        SELECT DISTINCT user_id, 0, 0 FROM ordered
        UNION ALL
        SELECT c.user_id,
               (SELECT MIN(p.rn) FROM ordered p
                WHERE p.user_id = c.user_id AND p.event_type = 'purchase'
                  AND p.rn > (SELECT MIN(s.rn) FROM ordered s
                              WHERE s.user_id = c.user_id
                                AND s.event_type = 'signup'
                                AND s.rn > c.pos)),
               c.cnt + 1
        FROM chain c
        WHERE (SELECT MIN(p.rn) FROM ordered p
               WHERE p.user_id = c.user_id AND p.event_type = 'purchase'
                 AND p.rn > (SELECT MIN(s.rn) FROM ordered s
                             WHERE s.user_id = c.user_id
                               AND s.event_type = 'signup'
                               AND s.rn > c.pos)) IS NOT NULL
    )
    SELECT user_id, CAST(MAX(cnt) AS BIGINT) AS n_chains
    FROM chain GROUP BY user_id
    """,
)
def q_sequence_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sequenceCount — the ClickHouse ``sequenceCount('(?1)(?2)')``
    primitive: per user, how many NON-OVERLAPPING signup → purchase
    chains fit in the event stream, each chain starting strictly after
    the previous one completed (sequential semantics — distinct from
    bipartite matching, which 'S S P P' would score 2; this scores 1,
    and distinct from q_window_funnel, which measures depth of ONE
    anchored chain, not repetition).

    The scale spelling rests on a closed-form identity: the greedy
    walk (first signup, first purchase after it, restart) completes
    exactly one chain at every signup-run → purchase-run boundary of
    the S/P-filtered stream, so
    ``n_chains = COUNT(rows where type = purchase AND lag(type) =
    signup)`` — ONE user_id window pass, a lag and a conditional
    count sharing the same exchange, no iteration, no state
    (property-pinned against the literal state machine on random
    tie-ful streams in tests/test_properties.py). The oracle instead
    WALKS THE DEFINITION: a recursive CTE advancing (previous chain
    end → next signup → next purchase), so the driver hash compares
    the closed form against the recursion itself.

    Scale shape: filter pushed to the two event types, one shuffle on
    user_id, window + aggregate reuse the sort — O(n) with no joins;
    at 100 TB this is a single pass over the filtered fact."""
    ev = load_tables(spark, sf_dir)["events"].filter(
        F.col("event_type").isin("signup", "purchase")
    )
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return (
        ev.select(
            "user_id",
            "event_type",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .groupBy("user_id")
        .agg(
            F.count(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("prev_type") == "signup"),
                    1,
                )
            )
            .cast("bigint")
            .alias("n_chains")
        )
    )


@query(
    "q_join_asof_nearest",
    oracle="""
    SELECT e.event_id, e.user_id, m.us_offset
    FROM events e
    LEFT JOIN LATERAL (
        SELECT epoch_us(s.ts) - epoch_us(e.ts) AS us_offset
        FROM events s
        WHERE s.user_id = e.user_id AND s.event_type = 'signup'
        ORDER BY ABS(epoch_us(s.ts) - epoch_us(e.ts)) ASC,
                 -- equal distance prefers the BACKWARD side (pandas
                 -- merge_asof nearest tie rule); membership of a
                 -- same-ts signup on the backward side follows the
                 -- engine's (ts, event_id) frame bound
                 CASE WHEN s.ts < e.ts
                        OR (s.ts = e.ts AND s.event_id <= e.event_id)
                      THEN 0 ELSE 1 END ASC
        LIMIT 1
    ) m ON TRUE
    """,
)
def q_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of join (pandas merge_asof direction='nearest'),
    completing the four-mode family: backward (q_join_asof), backward
    with tolerance (q_join_asof_tolerance), forward
    (q_join_asof_forward), and this — each event matched to the
    user's CLOSEST signup in time, on EITHER side, equal distance
    preferring the backward match (the pandas tie rule). The emitted
    ``us_offset`` is signed (negative = the match precedes the event),
    so the report distinguishes "just after their signup" from "just
    before they re-registered". Events of users with no signup at all
    emit NULL.

    Plan: BOTH greedy carries in one pass — the backward LAST and the
    forward FIRST run as two frames over the SAME (user_id, ts,
    event_id) sort, so Spark plans one exchange + one sort feeding two
    Window operators; the closer side picks via a codegen'd CASE. No
    join, no row explosion — nearest is exactly backward + forward +
    min, never a |Δt| cross join. The oracle is the independent
    correlated-LATERAL argmin over ABS distance with the tie rule
    spelled out."""
    t = load_tables(spark, sf_dir)
    e = t["events"]
    us = F.unix_micros(F.col("ts"))
    wb = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wf = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    sig = F.when(F.col("event_type") == "signup", us)
    back = F.last(sig, ignorenulls=True).over(wb)
    fwd = F.first(sig, ignorenulls=True).over(wf)
    bd = us - back   # ≥ 0 when back exists
    fd = fwd - us    # ≥ 0 when fwd exists
    offset = (
        F.when(back.isNull() & fwd.isNull(), F.lit(None).cast("bigint"))
        .when(fwd.isNull() | (back.isNotNull() & (bd <= fd)), back - us)
        .otherwise(fwd - us)
    )
    return e.select("event_id", "user_id", offset.alias("us_offset"))


#: M4 downsampling width (buckets per series) — 16 keeps the fixture
#: report discriminating (≈ 4·16·5 rows) while the formula is the
#: production pixel-width parameter.
M4_BUCKETS = 16

_M4_ROLE_SQL = """
    SELECT event_type, bucket, '{role}' AS role, ts, value
    FROM r WHERE {rn} = 1
"""


@query(
    "q_downsample_m4",
    oracle=f"""
    WITH pts AS (
        SELECT event_type, ts, event_id, value, epoch_us(ts) AS us,
               MIN(epoch_us(ts)) OVER (PARTITION BY event_type) AS mn,
               MAX(epoch_us(ts)) OVER (PARTITION BY event_type) AS mx
        FROM events
    ),
    b AS (
        SELECT event_type, ts, event_id, value, us,
               CAST(((us - mn) * {M4_BUCKETS}) // (mx - mn + 1) AS BIGINT)
                 AS bucket
        FROM pts
    ),
    r AS (
        SELECT event_type, bucket, ts, value,
               ROW_NUMBER() OVER (PARTITION BY event_type, bucket
                   ORDER BY us ASC, event_id ASC) AS rn_f,
               ROW_NUMBER() OVER (PARTITION BY event_type, bucket
                   ORDER BY us DESC, event_id DESC) AS rn_l,
               ROW_NUMBER() OVER (PARTITION BY event_type, bucket
                   ORDER BY value ASC, us ASC, event_id ASC) AS rn_mn,
               ROW_NUMBER() OVER (PARTITION BY event_type, bucket
                   ORDER BY value DESC, us ASC, event_id ASC) AS rn_mx
        FROM b
    )
    {_M4_ROLE_SQL.format(role="first", rn="rn_f")}
    UNION ALL {_M4_ROLE_SQL.format(role="last", rn="rn_l")}
    UNION ALL {_M4_ROLE_SQL.format(role="min", rn="rn_mn")}
    UNION ALL {_M4_ROLE_SQL.format(role="max", rn="rn_mx")}
    """,
)
def q_downsample_m4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 downsampling (Jugel et al., VLDB 2014 — the dashboard/
    Grafana standard): reduce each per-type value series to the FOUR
    shape-preserving extremes per pixel bucket — first, last, min,
    max — the provably error-free aggregation for line-chart
    rendering at any data volume (a 100 TB series downsamples to
    4·width points and the drawn pixels are identical). Buckets are
    equal-width over each series' own [min, max] time range in exact
    integer µs arithmetic.

    Determinism: every role resolves ties through the engine's total
    (ts, event_id) order (value ties → earliest point), so the chosen
    points are unique; values pass through untouched (no float
    arithmetic to diverge).

    Scale shape: ONE shuffle on event_type feeds the per-series
    min/max window, the bucket projection, and all four per-bucket
    row_numbers (same hash partitioning — Spark plans one exchange
    and re-sorts within partitions); the four roles emit via ONE
    array explode, not four scans. The oracle spells the same points
    as four UNION ALL rank-1 subqueries — a different derivation of
    the same selection."""
    t = load_tables(spark, sf_dir)
    e = t["events"]
    us = F.unix_micros(F.col("ts"))
    wt = W.partitionBy("event_type")
    mn = F.min(us).over(wt)
    mx = F.max(us).over(wt)
    b = e.select(
        "event_type",
        "ts",
        "event_id",
        "value",
        us.alias("us"),
        mn.alias("mn"),
        mx.alias("mx"),
    ).select(
        "event_type",
        "ts",
        "event_id",
        "value",
        "us",
        # integer µs arithmetic end-to-end (div, not /): the double
        # spelling is exact at fixture ranges but a boundary point
        # could shift under rounding at century-scale spans
        F.expr(f"((us - mn) * {M4_BUCKETS}) div (mx - mn + 1)").alias("bucket"),
    )
    wb = W.partitionBy("event_type", "bucket")
    roles = F.array_compact(
        F.array(
            F.when(
                F.row_number().over(
                    wb.orderBy(F.col("us").asc(), F.col("event_id").asc())
                )
                == 1,
                F.lit("first"),
            ),
            F.when(
                F.row_number().over(
                    wb.orderBy(F.col("us").desc(), F.col("event_id").desc())
                )
                == 1,
                F.lit("last"),
            ),
            F.when(
                F.row_number().over(
                    wb.orderBy(
                        F.col("value").asc(),
                        F.col("us").asc(),
                        F.col("event_id").asc(),
                    )
                )
                == 1,
                F.lit("min"),
            ),
            F.when(
                F.row_number().over(
                    wb.orderBy(
                        F.col("value").desc(),
                        F.col("us").asc(),
                        F.col("event_id").asc(),
                    )
                )
                == 1,
                F.lit("max"),
            ),
        )
    )
    return (
        b.withColumn("roles", roles)
        .filter(F.size("roles") > 0)
        .select(
            "event_type",
            "bucket",
            F.explode("roles").alias("role"),
            "ts",
            "value",
        )
    )


@query(
    "q_cusum_drift",
    oracle="""
    WITH RECURSIVE daily AS (
        SELECT event_type, date_trunc('day', ts) AS day, COUNT(*) AS x,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type ORDER BY date_trunc('day', ts)
               ) AS rn
        FROM events GROUP BY 1, 2
    ),
    tot AS (
        SELECT event_type, SUM(x) AS total, COUNT(*) AS nd
        FROM daily GROUP BY 1
    ),
    -- the DEFINITION, walked literally: S_i = max(0, S_{i-1} + x_i·nd − total)
    walk(event_type, rn, s) AS (
        SELECT d.event_type, d.rn, GREATEST(0, d.x * t.nd - t.total)
        FROM daily d JOIN tot t USING (event_type) WHERE d.rn = 1
        UNION ALL
        SELECT d.event_type, d.rn, GREATEST(0, w.s + d.x * t.nd - t.total)
        FROM walk w
        JOIN daily d ON d.event_type = w.event_type AND d.rn = w.rn + 1
        JOIN tot t ON t.event_type = d.event_type
    )
    SELECT w.event_type, d.day, CAST(w.s AS BIGINT) AS s_scaled
    FROM walk w JOIN daily d
      ON d.event_type = w.event_type AND d.rn = w.rn
    """,
)
def q_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM drift statistic (Page 1954 — the classic
    sequential change-point monitor every ingestion pipeline runs on
    its daily volumes): per event type, S_i = max(0, S_{i−1} + x_i − μ)
    over the daily-count series — S accumulates excess over the
    series' own mean and resets at zero, so a sustained upward shift
    grows S linearly while noise dies out. Exactness: μ = total/days
    never materializes as a float — the whole recursion is scaled by
    the day count (x·nd − total), keeping every term int64.

    The scale spelling rests on the max-plus closed form: with
    P_i = Σ_{j≤i}(x_j·nd − total) and P_0 = 0,
    ``S_i = P_i − min(0, min_{j≤i} P_j)`` — the running recursion
    collapses to a cumulative sum and a running minimum, TWO window
    functions sharing one exchange, no iteration (the same
    closed-form-vs-definition pairing as q_sequence_count). The
    oracle WALKS THE DEFINITION as a recursive CTE, so the driver
    hash compares the prefix identity against the recursion itself.

    Scale shape: the daily matrix is ≤ types·days rows after ONE
    map-side-combined aggregate of the fact; the per-type totals
    broadcast back; both windows ride the same event_type
    partitioning."""
    t = load_tables(spark, sf_dir)
    daily = (
        t["events"]
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(F.count("*").alias("x"))
    )
    tot = daily.groupBy("event_type").agg(
        F.sum("x").alias("total"), F.count("*").alias("nd")
    )
    wp = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    p = (
        daily.join(F.broadcast(tot), "event_type")
        .withColumn("pfx", F.sum(F.col("x") * F.col("nd") - F.col("total")).over(wp))
    )
    return p.select(
        "event_type",
        "day",
        (
            F.col("pfx")
            - F.least(F.lit(0).cast("bigint"), F.min("pfx").over(wp))
        )
        .cast("bigint")
        .alias("s_scaled"),
    )


#: Equi-depth histogram width (buckets per column/series) — the CBO
#: default neighborhood (Spark's ANALYZE ... COMPUTE STATISTICS uses
#: 254; 8 keeps the fixture report readable while the math is width-
#: independent).
EQUIDEPTH_B = 8


@query(
    "q_histogram_equidepth",
    oracle=f"""
    WITH ranked AS (
        SELECT event_type, value,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type
                   ORDER BY value ASC, event_id ASC
               ) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM events
    )
    SELECT event_type,
           CAST((rn - 1) * {EQUIDEPTH_B} // n AS BIGINT) AS bucket,
           MIN(value) AS lo,
           MAX(value) AS hi,
           COUNT(*) AS n_rows,
           COUNT(DISTINCT value) AS ndv
    FROM ranked
    GROUP BY 1, 2
    """,
)
def q_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equi-height) histogram — the ANALYZE TABLE artifact
    every cost-based optimizer keeps per column (Spark's `COMPUTE
    STATISTICS FOR COLUMNS`, Postgres' pg_stats buckets): per event
    type, rows split into {b} equal-POPULATION buckets with each
    bucket's [lo, hi] value range, row count and distinct-value count
    — the structure that makes selectivity estimates robust to skew
    where equi-WIDTH histograms collapse (one hot value inflates a
    single bucket's population, never its width).

    Bucketing is RANK-based, not value-based: bucket = (rank−1)·B
    div n over the total (value, event_id) order, so equal values may
    legitimately straddle a boundary — the standard equi-depth
    construction, and the only one that is exactly engine-portable
    (a value-based split would need a tie policy the optimizer doesn't
    care about). Bucket populations differ by at most 1 by
    construction.

    Scale shape: ONE shuffle on event_type feeds the row_number, the
    per-type count (same window partition, unbounded frame) and the
    final (type, bucket) aggregate — at 100 TB this is the standard
    stats-collection pass; the report is types·B rows. The per-type
    total order is the honest cost (exact equi-depth needs it);
    production trades it for GK sketches (q_quantile_sketch) when
    approximate boundaries suffice."""
    t = load_tables(spark, sf_dir)
    wt = W.partitionBy("event_type")
    ranked = t["events"].select(
        "event_type",
        "value",
        F.row_number()
        .over(wt.orderBy(F.col("value").asc(), F.col("event_id").asc()))
        .alias("rn"),
        F.count("*").over(wt).alias("n"),
    )
    return (
        ranked.select(
            "event_type",
            "value",
            F.expr(f"(rn - 1) * {EQUIDEPTH_B} div n").alias("bucket"),
        )
        .groupBy("event_type", "bucket")
        .agg(
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
            F.count("*").alias("n_rows"),
            F.countDistinct("value").alias("ndv"),
        )
    )


q_histogram_equidepth.__doc__ = q_histogram_equidepth.__doc__.format(
    b=EQUIDEPTH_B
)


#: q_session_funnel's inactivity gap — 6 h, NOT q_sessionize's 30 min:
#: fixture-tuned like the windowFunnel window (at 30 min ZERO sessions
#: convert at any sf — an all-zeros conversion column is vacuous
#: evidence; at 6 h the report discriminates: 3 converting sessions at
#: sf0.001, 37 at sf0.01). The operator semantics don't depend on it.
SESSION_FUNNEL_GAP_US = 6 * 3_600_000_000


@query(
    "q_session_funnel",
    oracle=f"""
    WITH gaps AS (
        SELECT user_id, ts, event_id, event_type,
               epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS gap_us
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ),
    flags AS (
        SELECT *, CASE WHEN gap_us IS NULL OR gap_us > {SESSION_FUNNEL_GAP_US}
                       THEN 1 ELSE 0 END AS new_session
        FROM gaps
    ),
    sess AS (
        SELECT user_id, ts, event_id, event_type,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                   ROWS UNBOUNDED PRECEDING
               ) AS sid
        FROM flags
    ),
    with_signup AS (
        SELECT DISTINCT user_id, sid FROM sess WHERE event_type = 'signup'
    ),
    -- the DEFINITION: an ordered signup < click < purchase chain
    -- entirely inside one session (the session IS the window)
    converting AS (
        SELECT DISTINCT s.user_id, s.sid
        FROM sess s
        JOIN sess c ON c.user_id = s.user_id AND c.sid = s.sid
                   AND c.event_type = 'click'
                   AND (c.ts > s.ts OR (c.ts = s.ts AND c.event_id > s.event_id))
        JOIN sess p ON p.user_id = s.user_id AND p.sid = s.sid
                   AND p.event_type = 'purchase'
                   AND (p.ts > c.ts OR (p.ts = c.ts AND p.event_id > c.event_id))
        WHERE s.event_type = 'signup'
    )
    SELECT w.user_id,
           CAST(COUNT(*) AS BIGINT) AS n_signup_sessions,
           CAST(COUNT(c.sid) AS BIGINT) AS n_converting
    FROM with_signup w
    LEFT JOIN converting c ON c.user_id = w.user_id AND c.sid = w.sid
    GROUP BY w.user_id
    """,
)
def q_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel-within-session — the composition product analytics
    actually ships (Amplitude's "conversion in one session"):
    sessionize the stream (6-hour inactivity gaps — see
    SESSION_FUNNEL_GAP_US), then ask per session whether an ORDERED signup →
    click → purchase chain completes ENTIRELY inside it — no extra
    time bound, the session boundary IS the window (vs q_window_funnel
    where a fixed 12 h window anchors at the signup regardless of
    activity gaps). Reports per user: sessions containing a signup,
    and how many of those converted.

    Scale shape: ONE user_id exchange serves everything — the gap lag
    and session cumsum sort on (user_id, ts, event_id); the funnel
    carries then partition by (user_id, sid), a SUBSET-compatible
    clustering (no second exchange, just a re-sort); the chain test is
    two boolean carries (seen-signup, seen-click-after-signup — no
    time arithmetic, so plain MAX-over-prefix booleans are the whole
    state) and a per-session aggregate. The oracle walks the
    definition as ordered EXISTS self-joins over the session CTE, so
    the hash compares the carry argument against the definition."""
    ev = load_tables(spark, sf_dir)["events"]
    us = F.unix_micros(F.col("ts"))
    wo = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    new_s = (
        F.when(
            F.lag(us).over(wo).isNull()
            | ((us - F.lag(us).over(wo)) > SESSION_FUNNEL_GAP_US),
            1,
        )
        .otherwise(0)
    )
    sess = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.sum(new_s).over(wo.rowsBetween(W.unboundedPreceding, W.currentRow)).alias(
            "sid"
        ),
    )
    ws = (
        W.partitionBy("user_id", "sid")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    is_type = lambda t: F.col("event_type") == t  # noqa: E731
    s_seen = F.max(is_type("signup").cast("int")).over(ws)
    scored = sess.withColumn(
        "c2", (is_type("click").cast("int") * s_seen)
    )
    c_seen = F.max("c2").over(ws)
    lvl3 = is_type("purchase").cast("int") * c_seen
    per_sess = (
        scored.withColumn("l3", lvl3)
        .groupBy("user_id", "sid")
        .agg(
            F.max(is_type("signup").cast("int")).alias("has_s"),
            F.max("l3").alias("conv"),
        )
        .filter(F.col("has_s") == 1)
    )
    return per_sess.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_signup_sessions"),
        F.sum("conv").cast("bigint").alias("n_converting"),
    )


@query(
    "q_hll_audit",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           CAST(1 AS BIGINT) AS within_bound
    FROM events
    GROUP BY event_type
    """,
)
def q_hll_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HLL++ sketch's VERIFIED contract, made driver-hashable —
    the q_quantile_sketch r16 playbook applied to the OTHER
    engine-specific sketch family (q_agg_sketch stays the raw serving
    surface): per event_type the engine computes BOTH the exact
    distinct-user count and approx_count_distinct(rsd=0.05), and
    emits whether the estimate sits within the 3-sigma relative-error
    band (|est − exact|·100 ≤ 15·exact + 200 — pure integer
    arithmetic; the +200 absorbs the sparse-mode floor on tiny
    groups). The ESTIMATE stays engine-private (HLL++ register
    layouts differ per engine); a hash mismatch catches wrong group
    cardinalities, wrong exact counts, or an estimator outside its
    guarantee.

    Scale shape: the audit pays the exact COUNT(DISTINCT) it is
    auditing — one (event_type, user_id) dedup exchange feeding a
    per-type aggregate, the honest attestation price (production
    serves q_agg_sketch's O(registers) state without it); the sketch
    itself rides the same scan map-side. Bounded output: one row per
    event type."""
    t = load_tables(spark, sf_dir)
    agg = t["events"].groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.countDistinct("user_id").cast("bigint").alias("exact_users"),
        F.approx_count_distinct("user_id", rsd=0.05).cast("bigint").alias("est"),
    )
    ok = (
        F.abs(F.col("est") - F.col("exact_users")) * 100
        <= F.col("exact_users") * 15 + 200
    )
    return agg.select(
        "event_type",
        "n_events",
        "exact_users",
        ok.cast("bigint").alias("within_bound"),
    )
