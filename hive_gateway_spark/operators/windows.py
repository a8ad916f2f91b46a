"""Window & time operators — the gateway's temporal semantics as SQL windows.

The reference's signature behaviors are temporal: the 1 s fixed-window
rate limiter (gateway.ts:139-171), per-call latency deltas (:78-81) and
the 30 s in-flight session state (:56, :318-323). Batch-side they are
window functions; streaming twins live in hive_gateway_spark.streaming.

Determinism: all ordering is by (ts, event_id) — fixture ts is strictly
increasing so µs (Spark) vs ns (DuckDB) precision cannot reorder rows;
time arithmetic happens on integer epoch-µs, never on raw timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from hive_gateway_spark.registry import query
from hive_gateway_spark.session import load_tables
from hive_gateway_spark.staging import stage

#: Admission cap per (user, day). The reference caps at 10 req/s/token
#: (gateway.ts:144); fixture traffic is ~2.5 events/user/day, so the
#: verified query uses the same *shape* on a day window with cap 3.
RATE_LIMIT_N = 3

#: Session gap: 30 min (the reference's 30 s rcvtimeo scaled to fixture
#: inter-event gaps; gateway.ts:56).
SESSION_GAP_US = 30 * 60 * 1_000_000


@query(
    "q_window_rate_limit",
    oracle=f"""
    SELECT event_id, user_id,
           (rn <= {RATE_LIMIT_N}) AS admitted
    FROM (
        SELECT event_id, user_id,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id, date_trunc('day', ts)
                   ORDER BY ts, event_id
               ) AS rn
        FROM events
    )
    """,
)
def q_window_rate_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Admission control: first N calls per (token, window) pass, the
    rest are 429s — the reference's *intended* rate-limiter semantics
    (its actual Redis RPUSHX counter never starts: gateway.ts:158 bug;
    SURVEY §7.4.4 — we implement intent, divergence documented here)."""
    t = load_tables(spark, sf_dir)
    w = W.partitionBy("user_id", F.date_trunc("day", "ts")).orderBy("ts", "event_id")
    return (
        t["events"]
        .withColumn("rn", F.row_number().over(w))
        .select(
            "event_id",
            "user_id",
            (F.col("rn") <= RATE_LIMIT_N).alias("admitted"),
        )
    )


@query(
    "q_window_rank",
    oracle="""
    SELECT event_id, event_type, value, rnk
    FROM (
        SELECT event_id, event_type, value,
               RANK() OVER (PARTITION BY event_type
                            ORDER BY value DESC, event_id ASC) AS rnk
        FROM events
    )
    WHERE rnk <= 5
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window function: top-5 events by value per type."""
    t = load_tables(spark, sf_dir)
    w = W.partitionBy("event_type").orderBy(F.col("value").desc(), F.col("event_id").asc())
    return (
        t["events"]
        .withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") <= 5)
        .select("event_id", "event_type", "value", "rnk")
    )


@query(
    "q_window_analytic",
    oracle="""
    SELECT event_id, user_id,
           epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS gap_us,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
                w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS run_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag + running frame — per-caller inter-request gap (the latency
    deltas of ref O9, gateway.ts:78-81) and a running value total.
    The running sum is decimal so the frame arithmetic is exact and
    order-independent across engines."""
    t = load_tables(spark, sf_dir)
    us = F.unix_micros(F.col("ts"))
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return t["events"].select(
        "event_id",
        "user_id",
        (us - F.lag(us).over(w)).alias("gap_us"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("double")
        .alias("run_value"),
    )


@query(
    "q_sessionize",
    oracle=f"""
    WITH gaps AS (
        SELECT user_id, ts, event_id, value,
               epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        FROM events
    ), flagged AS (
        SELECT *, CASE WHEN gap_us IS NULL OR gap_us > {SESSION_GAP_US}
                       THEN 1 ELSE 0 END AS new_session
        FROM gaps
    ), sessions AS (
        -- CAST: DuckDB windowed SUM over int is HUGEINT (surfaces as
        -- float64); Spark emits BIGINT — cast for dtype parity.
        SELECT *, CAST(SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                  AS session_id
        FROM flagged
    )
    SELECT user_id, session_id,
           COUNT(*) AS n_events,
           date_trunc('second', MIN(ts)) AS session_start,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min gap) — the batch analog of the
    reference's in-flight session map with receive timeout
    (gateway.ts:39-43, :56; SURVEY §3.3 notes the ref leaks sessions —
    the streaming twin uses real state timeouts instead)."""
    t = load_tables(spark, sf_dir)
    us = F.unix_micros(F.col("ts"))
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    flagged = t["events"].select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.when(
            (us - F.lag(us).over(w)).isNull()
            | ((us - F.lag(us).over(w)) > SESSION_GAP_US),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    sessions = flagged.withColumn("session_id", F.sum("new_session").over(run))
    return sessions.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.date_trunc("second", F.min("ts")).alias("session_start"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("session_value"),
    )


@query(
    "q_window_range_frame",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts)
               RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS trailing_hour_value,
           COUNT(*) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts)
               RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
           ) AS trailing_hour_calls
    FROM events
    """,
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE (value-range) window frame: per caller, the trailing-hour
    request count and value total at every event — the sliding-window
    admission statistic computed per row rather than per bucket. The
    frame is over integer epoch-µs so both engines bound it identically;
    the sum is decimal-exact. (RANGE frames need no tie-break: rows with
    equal ordering values share a frame by definition.)"""
    t = load_tables(spark, sf_dir)
    us = F.unix_micros(F.col("ts"))
    w = (
        W.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-3_600_000_000, 0)
    )
    return t["events"].select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("trailing_hour_value"),
        F.count("*").over(w).alias("trailing_hour_calls"),
    )


@query(
    "q_argmax",
    oracle="""
    SELECT user_id,
           arg_max(event_id, ts) AS last_event_id,
           arg_max(event_type, ts) AS last_event_type,
           arg_min(event_id, ts) AS first_event_id
    FROM events
    GROUP BY user_id
    """,
)
def q_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arg_max/arg_min (max_by/min_by): each caller's latest and first
    request — single-pass aggregate, no window sort (ts is strictly
    increasing so ties cannot make the result engine-dependent)."""
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy("user_id")
        .agg(
            F.max_by("event_id", "ts").alias("last_event_id"),
            F.max_by("event_type", "ts").alias("last_event_type"),
            F.min_by("event_id", "ts").alias("first_event_id"),
        )
    )


@query(
    "q_window_ntile",
    oracle="""
    SELECT event_id, event_type,
           NTILE(4)        OVER w AS quartile,
           CUME_DIST()     OVER w AS cume,
           PERCENT_RANK()  OVER w AS prank
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY value ASC, event_id ASC)
    """,
)
def q_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (ntile / cume_dist / percent_rank)
    — deterministic under the (value, event_id) total order; cume/prank
    are ratios of integers so both engines compute identical doubles."""
    t = load_tables(spark, sf_dir)
    w = W.partitionBy("event_type").orderBy(F.col("value").asc(), F.col("event_id").asc())
    return t["events"].select(
        "event_id",
        "event_type",
        F.ntile(4).over(w).alias("quartile"),
        F.cume_dist().over(w).alias("cume"),
        F.percent_rank().over(w).alias("prank"),
    )


@query(
    "q_agg_stats",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           ROUND(SQRT((CAST(SUM(CAST(value * value AS DECIMAL(28,4))) AS DOUBLE)
                 - CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                   * CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*))
                 / COUNT(*)), 6) AS stddev_pop,
           ROUND((CAST(SUM(CAST(value * CAST(k AS DOUBLE) AS DECIMAL(28,4))) AS DOUBLE)
                 - CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                   * CAST(SUM(CAST(CAST(k AS DOUBLE) AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*))
                 / COUNT(*), 4) AS covar_pop
    FROM (SELECT event_type, value, CAST(props->>'$.k' AS INTEGER) AS k FROM events)
    GROUP BY event_type
    """,
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates computed from exact decimal moments
    (Σx, Σx², Σxy are order-independent decimal sums; the variance /
    covariance formulas then run in identical IEEE shapes on both
    engines — built-in stddev/covar would sum doubles in engine-specific
    order and fail the value hash)."""
    t = load_tables(spark, sf_dir)
    src = t["events"].select(
        "event_type",
        "value",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )
    n = F.count("*")
    sx = F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
    sxx = F.sum((F.col("value") * F.col("value")).cast("decimal(28,4)")).cast("double")
    kd = F.col("k").cast("double")
    sy = F.sum(kd.cast("decimal(18,2)")).cast("double")
    sxy = F.sum((F.col("value") * kd).cast("decimal(28,4)")).cast("double")
    return src.groupBy("event_type").agg(
        n.alias("n"),
        F.round(F.sqrt((sxx - sx * sx / n) / n), 6).alias("stddev_pop"),
        F.round((sxy - sx * sy / n) / n, 4).alias("covar_pop"),
    )


@query(
    "q_agg_listagg",
    oracle="""
    SELECT c_mktsegment,
           string_agg(c_name, ',' ORDER BY c_name) AS members
    FROM (SELECT * FROM customer WHERE c_acctbal > 9500)
    GROUP BY c_mktsegment
    """,
)
def q_agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (listagg): collect + sort + join keeps
    the result order-deterministic regardless of partitioning."""
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .filter(F.col("c_acctbal") > 9500)
        .groupBy("c_mktsegment")
        .agg(
            F.array_join(F.array_sort(F.collect_list("c_name")), ",").alias("members")
        )
    )


@query(
    "q_latency_stats",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           MIN(value) AS min_value,
           MAX(value) AS max_value,
           ROUND(CAST(quantile_cont(value, 0.5) AS DOUBLE), 4) AS p50,
           ROUND(CAST(quantile_cont(value, 0.95) AS DOUBLE), 4) AS p95,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS DOUBLE) AS mean_value
    FROM events
    GROUP BY event_type
    """,
)
def q_latency_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile/latency report — what the reference only logs per call
    ("done in N milliseconds", gateway.ts:78-81), aggregated. Exact
    interpolated percentiles, rounded to 4 dp to absorb engine
    interpolation-order differences (SURVEY §7.4.1)."""
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(value, 0.95)"), 4).alias("p95"),
            (F.sum(F.col("value").cast("decimal(18,2)")).cast("double") / F.count("*"))
            .cast("double")
            .alias("mean_value"),
        )
    )


def _session_depth_oracle() -> str:
    """Composed at import from the sessionize oracle (the funnel
    composition pattern applied to the windows family)."""
    from hive_gateway_spark.registry import ORACLES

    return f"""
    WITH s AS ({ORACLES["q_sessionize"]})
    SELECT CAST(n_events AS BIGINT) AS session_depth,
           COUNT(*) AS n_sessions,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(CAST(session_value AS DECIMAL(18,2))) AS DOUBLE)
             AS total_value
    FROM s GROUP BY n_events
    """


@query("q_session_depth", oracle=_session_depth_oracle())
def q_session_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-depth histogram — the engagement-shape chart: per
    session length (events per session from q_sessionize's gap-based
    partitioning), how many sessions, how many distinct users reach
    that depth, and the value they carry. Single-event sessions
    dominating = a bounce problem; the long tail = power users. The
    sessionize oracle is nested verbatim (composition guarantee);
    value totals go through exact DECIMAL (house rule — session_value
    is already a 2 dp decimal sum).

    Scale shape: the sessionizer's one user-keyed window shuffle, then
    a depth-keyed partial aggregate over the (small) session table."""
    from hive_gateway_spark.registry import QUERIES

    s = QUERIES["q_sessionize"](spark, sf_dir)
    return (
        s.groupBy(F.col("n_events").cast("bigint").alias("session_depth"))
        .agg(
            F.count("*").alias("n_sessions"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("session_value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
    )


#: Gap-histogram band upper bounds in µs (last band open-ended).
_GAP_BANDS_US = (
    ("lt_1m", 60 * 1_000_000),
    ("1m_10m", 600 * 1_000_000),
    ("10m_30m", 1800 * 1_000_000),
    ("30m_24h", 86400 * 1_000_000),
)


def _gap_band_sql(expr: str) -> str:
    cases = []
    prev = 0
    for name, hi in _GAP_BANDS_US:
        cases.append(f"WHEN {expr} < {hi} THEN '{name}'")
        prev = hi
    return "CASE " + " ".join(cases) + " ELSE 'ge_24h' END"


@query(
    "q_event_gaps",
    oracle=f"""
    WITH g AS (
        SELECT epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        FROM events
    ),
    b AS (
        SELECT {_gap_band_sql("gap_us")} AS band, gap_us
        FROM g WHERE gap_us IS NOT NULL
    ),
    tot AS (SELECT COUNT(*) AS n FROM b)
    SELECT b.band,
           COUNT(*) AS n_gaps,
           CAST(MIN(b.gap_us) AS BIGINT) AS min_gap_us,
           CAST(MAX(b.gap_us) AS BIGINT) AS max_gap_us,
           CAST(COUNT(*) AS DOUBLE) / tot.n AS share
    FROM b CROSS JOIN tot
    GROUP BY b.band, tot.n
    """,
)
def q_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gap histogram per user stream — the evidence behind
    the sessionizer's 30-minute cut (SESSION_GAP_US): consecutive-event
    gaps bucketed into fixed bands with counts, extremes, and shares.
    A healthy parameter sits in the histogram's valley (few gaps near
    the 10m–30m boundary); a fat 10m_30m band means the cut bisects
    real sessions. The same chart tunes watermark delays for the
    streaming twins.

    Determinism: gaps are exact epoch-µs differences over the fully
    tie-broken (ts, event_id) order; bands are integer comparisons;
    share is one integer-ratio IEEE division.

    Scale shape: ONE user-keyed window (the sessionizer's own shuffle
    shape) → in-row band CASE → one partial-agg shuffle on ≤ 5 bands;
    the total derives from the BAND COUNTS (≤ 5 rows), not a second
    pass over the fact stream — a scalar-total cross join on the gap
    frame would duplicate the window subtree and run the fact window
    twice (caught by the plan assertion)."""
    t = load_tables(spark, sf_dir)
    us = F.unix_micros(F.col("ts"))
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    g = t["events"].select((us - F.lag(us).over(w)).alias("gap_us")).filter(
        F.col("gap_us").isNotNull()
    )
    band = F.expr(_gap_band_sql("gap_us"))
    bc = (
        g.select(band.alias("band"), "gap_us")
        .groupBy("band")
        .agg(
            F.count("*").alias("n_gaps"),
            F.min("gap_us").cast("bigint").alias("min_gap_us"),
            F.max("gap_us").cast("bigint").alias("max_gap_us"),
        )
    )
    # stage the ≤5-row band table so BOTH consumers (the total and the
    # report) read one materialization — without it Catalyst re-runs
    # the fact window under the total's subtree (plan-asserted)
    bc = stage(bc, "event_gaps.bands")
    tot = bc.agg(F.sum("n_gaps").alias("n"))
    return (
        bc.crossJoin(F.broadcast(tot))
        .select(
            "band",
            "n_gaps",
            "min_gap_us",
            "max_gap_us",
            (F.col("n_gaps").cast("double") / F.col("n")).alias("share"),
        )
    )
