"""TPC-DS starter shapes adapted to the fixture star schema.

The TPC-H suite is complete and twice driver-green (VERDICT r13); DS
shapes add the decision-support patterns H lacks — month-of-year dim
slices re-used across every year, wide multi-dim star joins with
cross-dimension predicates, and multi-average reports — exercising the
grouping machinery beyond q_agg_rollup/cube (VERDICT r13 task #9).
The published DS queries run on a retail star (store_sales × date_dim
× item × customer_demographics); this fixture's lineitem × orders ×
part × customer/supplier × nation plays the same roles: lineitem is
the fact, part is `item`, month-of-shipdate is `d_moy`, and the
nation dims stand in for demographics/addresses.

House determinism rules throughout: money sums via exact DECIMAL(18,4)
cast→SUM→DOUBLE (the q_tpch_q3 route), averages as ROUND of a
double division of exact sums with IDENTICAL expression shape in the
DuckDB oracle, full ORDER BY tie-breaks before any LIMIT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from hive_gateway_spark.operators.relational import (
    dec,
    e_double,
    e_hi,
    e_lo,
    e_total,
    e_units,
)
from hive_gateway_spark.registry import query
from hive_gateway_spark.session import load_tables


def _rev_e4():
    """Per-row exact bigint e4-units of net revenue (r17 §2.2 — the
    suite's recurring SUM(CAST(price*(1-disc) AS DECIMAL(18,4))))."""
    return e_units(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)

#: DS Q3's d_moy literal — November, the published query's month.
DS_MOY = 11


@query(
    "q_tpcds_q3",
    oracle=f"""
    SELECT CAST(year(o.o_orderdate) AS BIGINT) AS sales_year,
           p.p_brand,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18,4))) AS DOUBLE) AS sum_agg
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN part p   ON l.l_partkey = p.p_partkey
    WHERE month(l.l_shipdate) = {DS_MOY}
    GROUP BY 1, 2
    ORDER BY sales_year ASC, sum_agg DESC, p.p_brand ASC
    LIMIT 100
    """,
)
def q_tpcds_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q3 shape (brand revenue for one month-of-year, reported
    per year): the canonical DS seasonal report — a calendar attribute
    (month(l_shipdate) = {moy}, DS's d_moy) slices the fact across
    EVERY year at once, unlike H's contiguous date ranges, so the scan
    cannot be pruned by a min/max range and selectivity comes from the
    month function pushed into the scan filter instead.

    Plan: part broadcasts (tiny dim); lineitem ⋈ orders is the one
    fact-fact hash join; the (year, brand) rollup is map-side combined
    into ≤ years·brands groups. Full tie-broken ORDER BY before the
    LIMIT keeps the top-100 deterministic.
    """
    t = load_tables(spark, sf_dir)
    l = t["lineitem"].filter(F.month("l_shipdate") == DS_MOY)
    # r17: the e-unit rewrite (§2.2) was applied, measured 1.3x SLOWER
    # here (0.45 -> 0.59 warm — the month-filtered input is too small
    # for the buffer penalty to dominate the split's per-row work, and
    # the single-bigint envelope is marginal for 175 skewable groups),
    # and reverted. The decimal spelling stays.
    return (
        l.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(
            F.year("o_orderdate").cast("bigint").alias("sales_year"),
            "p_brand",
        )
        .agg(
            F.sum(dec(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4))
            .cast("double")
            .alias("sum_agg")
        )
        .orderBy(
            F.col("sales_year").asc(), F.col("sum_agg").desc(), F.col("p_brand").asc()
        )
        .limit(100)
    )


q_tpcds_q3.__doc__ = q_tpcds_q3.__doc__.format(moy=DS_MOY)


@query(
    "q_tpcds_q7",
    oracle="""
    SELECT p.p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           ROUND(CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS agg1,
           ROUND(CAST(SUM(CAST(ROUND(l.l_extendedprice, 2)
                               AS DECIMAL(18,2))) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS agg2,
           ROUND(CAST(SUM(CAST(ROUND(l.l_discount, 2)
                               AS DECIMAL(18,2))) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS agg3,
           ROUND(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                               AS DECIMAL(18,4))) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS agg4
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE n.n_regionkey = 0
    GROUP BY p.p_brand
    ORDER BY p.p_brand ASC
    """,
)
def q_tpcds_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q7 shape (per-item averages for a demographic slice): DS
    reports avg quantity / list price / coupon / sales price per item
    for customers matching a demographics predicate; here the
    demographic dim is the customer's nation-region (regionkey 0) and
    the four averages are quantity, price, discount, and net revenue
    per brand.

    Determinism: every numerator is an EXACT sum (int64 quantity,
    DECIMAL cents/4dp money) and each average is one ROUND(double ÷
    count, 6) with the identical expression in the oracle — the house
    rule that keeps float division hash-stable. The exact n_items
    count rides along so the averages are auditable.

    Plan: three broadcast dims (part, customer, nation) — only
    lineitem ⋈ orders exchanges; the demographic filter reaches the
    customer scan (pushed), and the per-brand aggregate is map-side
    combined to ≤ |brands| rows.
    """
    t = load_tables(spark, sf_dir)
    cn = (
        t["customer"]
        .join(
            F.broadcast(t["nation"].filter(F.col("n_regionkey") == 0)),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    j = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cn), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
    )
    # r17 (§2.2): all money sums fold as exact bigint e-units so the
    # per-brand aggregate keeps the vectorized hash-map path; the e4
    # revenue splits at bit 20 (25 brand groups at 100 TB exceed a
    # single bigint's e4 headroom), e2 sums fit single bigints. The
    # ROUND(double/count, 6) averages divide the identical doubles the
    # decimal spelling cast — see e_units/e_double in relational.py.
    rev_e4 = e_units(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
    agg = j.groupBy("p_brand").agg(
        F.count("*").cast("bigint").alias("n_items"),
        F.sum(F.col("l_quantity").cast("bigint")).alias("qty"),
        F.sum(e_units(F.round("l_extendedprice", 2), 2)).alias("price_e2"),
        F.sum(e_units(F.round("l_discount", 2), 2)).alias("disc_e2"),
        F.sum(e_hi(rev_e4)).alias("r_hi"),
        F.sum(e_lo(rev_e4)).alias("r_lo"),
    )
    n_d = F.col("n_items").cast("double")
    avg6 = lambda d: F.round(d / n_d, 6)  # noqa: E731
    return (
        agg.select(
            "p_brand",
            "n_items",
            avg6(F.col("qty").cast("double")).alias("agg1"),
            avg6(e_double(F.col("price_e2"))).alias("agg2"),
            avg6(e_double(F.col("disc_e2"))).alias("agg3"),
            avg6(e_double(e_total(F.col("r_hi"), F.col("r_lo")), 4)).alias(
                "agg4"
            ),
        )
        .orderBy(F.col("p_brand").asc())
    )


@query(
    "q_tpcds_q19",
    oracle=f"""
    SELECT p.p_brand, p.p_type,
           CAST(COUNT(*) AS BIGINT) AS n_cross,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18,4))) AS DOUBLE) AS ext_price
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    WHERE month(l.l_shipdate) = {DS_MOY}
      AND c.c_nationkey <> s.s_nationkey
    GROUP BY p.p_brand, p.p_type
    ORDER BY ext_price DESC, p.p_brand ASC, p.p_type ASC
    """,
)
def q_tpcds_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q19 shape (brand revenue where buyer and seller sit in
    DIFFERENT geographies): the published query keeps sales whose
    customer zip differs from the store zip — the cross-catchment
    report; here the customer's nation must differ from the
    supplier's, for the Q3 month slice. The defining DS feature is the
    CROSS-DIMENSION predicate: neither dim filter is selective alone,
    the join must bring both nationkeys to the fact row before the
    inequality applies.

    Plan: part/customer/supplier broadcast; the month filter pushes to
    the lineitem scan; the nationkey inequality evaluates as a post-
    join filter on already-joined rows (never a join condition — an
    inequality join would forbid the hash strategies). One fact-fact
    exchange (lineitem ⋈ orders), then ≤ brands·types groups.
    """
    t = load_tables(spark, sf_dir)
    l = t["lineitem"].filter(F.month("l_shipdate") == DS_MOY)
    j = (
        l.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(t["customer"].select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(t["supplier"].select("s_suppkey", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
    )
    return (
        j.groupBy("p_brand", "p_type")
        # r17 (§2.2): single bigint e4 sum — ≥ ~3.7k (brand, type)
        # groups keep the per-group sum far under 2^63 at 100 TB;
        # vectorized buffer, identical double via e_double.
        .agg(
            F.count("*").cast("bigint").alias("n_cross"),
            F.sum(
                e_units(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
            ).alias("ext_e4"),
        )
        .select(
            "p_brand",
            "p_type",
            "n_cross",
            e_double(F.col("ext_e4"), 4).alias("ext_price"),
        )
        .orderBy(
            F.col("ext_price").desc(), F.col("p_brand").asc(), F.col("p_type").asc()
        )
    )


@query(
    "q_tpcds_q27",
    oracle="""
    SELECT n.n_name AS supp_nation, p.p_brand,
           CAST(GROUPING(n.n_name) AS INT) AS g_nation,
           CAST(GROUPING(p.p_brand) AS INT) AS g_brand,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           ROUND(CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS avg_qty
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN part p     ON l.l_partkey = p.p_partkey
    WHERE n.n_regionkey = 1
    GROUP BY ROLLUP (n.n_name, p.p_brand)
    """,
)
def q_tpcds_q27(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q27 shape (rollup report over a dimensional hierarchy):
    DS aggregates store sales by (state, item) WITH ROLLUP for a
    demographics slice — the report-with-subtotals pattern the plain
    GROUP BY queries never exercise against a STAR (q_agg_rollup rolls
    up raw event columns; this one rolls up attributes that only exist
    after two dim joins). Supplier nation plays `state`, part brand
    plays `item`, region 1 is the slice; grouping flags disambiguate
    subtotal rows from a genuine NULL group in both engines.

    Plan: all three dims broadcast — the fact never shuffles for a
    join; Spark expands the rollup AFTER partial aggregation on the
    full key, so the exchange carries ≤ nations·brands rows per map
    partition, not 3× the fact.
    """
    t = load_tables(spark, sf_dir)
    sn = (
        t["supplier"]
        .join(
            F.broadcast(t["nation"].filter(F.col("n_regionkey") == 1)),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "n_name")
    )
    j = (
        t["lineitem"]
        .join(F.broadcast(sn), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
    )
    # Leaf pre-aggregation before the rollup (r16 optimization round,
    # guide §2.3): Expand multiplies its input ×3 BEFORE the grouping
    # aggregate, so rolling up fact rows pays the expand+hash on every
    # lineitem per level; the leaf aggregate collapses the fact to
    # ≤ nations·brands rows first and the rollup re-aggregates exact
    # sums of sums (count → sum of counts, avg → sum/sum).
    leaf = (
        j.select(
            F.col("n_name").alias("supp_nation"),
            "p_brand",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
        )
        .groupBy("supp_nation", "p_brand")
        # r17 (§2.2): split bigint e4 revenue sums through BOTH the
        # fact-sized leaf aggregate and the rollup (the region slice's
        # ~125 leaf groups exceed single-bigint e4 headroom at 100 TB);
        # exact recombination on the rollup output — see e_units.
        .agg(
            F.count("*").alias("cnt"),
            F.sum(
                e_hi(e_units(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4))
            ).alias("r_hi"),
            F.sum(
                e_lo(e_units(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4))
            ).alias("r_lo"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("qty"),
        )
    )
    n = F.sum("cnt")
    return (
        leaf.rollup("supp_nation", "p_brand")
        .agg(
            F.grouping("supp_nation").cast("int").alias("g_nation"),
            F.grouping("p_brand").cast("int").alias("g_brand"),
            n.cast("bigint").alias("n_items"),
            e_double(e_total(F.sum("r_hi"), F.sum("r_lo")), 4).alias("revenue"),
            F.round(F.sum("qty").cast("double") / n.cast("double"), 6).alias("avg_qty"),
        )
        .select(
            "supp_nation", "p_brand", "g_nation", "g_brand",
            "n_items", "revenue", "avg_qty",
        )
    )


#: Q88's eight report bands, adapted to the fixture fact: (quantity
#: range, discount ceiling) pairs standing in for the published
#: (half-hour, household-demographic) bands. Shared by engine and
#: oracle through _q88_band_sql so a band edge cannot drift.
Q88_BANDS = [
    (1, 10, 0.02),
    (11, 20, 0.02),
    (21, 30, 0.02),
    (31, 40, 0.02),
    (1, 10, 0.06),
    (11, 20, 0.06),
    (21, 30, 0.06),
    (31, 40, 0.06),
]


def _q88_band_sql(i: int) -> str:
    lo, hi, dmax = Q88_BANDS[i]
    return (
        f"COUNT(*) FILTER (WHERE l_quantity >= {lo} AND l_quantity <= {hi} "
        f"AND l_discount <= {dmax})"
    )


@query(
    "q_tpcds_q88",
    oracle=f"""
    SELECT {", ".join(f"CAST({_q88_band_sql(i)} AS BIGINT) AS h{i + 1}" for i in range(8))}
    FROM lineitem
    WHERE month(l_shipdate) = {DS_MOY}
    """,
)
def q_tpcds_q88(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q88 shape (the wide one-scan band report): the published
    query counts store sales in EIGHT (half-hour, demographic) bands
    and emits them as one row — DS's canonical
    many-conditional-aggregates-one-scan pattern, which the published
    spelling writes as 8 self-joined subqueries and every sane engine
    should collapse to ONE scan with filtered counts. This
    implementation IS the collapsed form: eight conditional aggregates
    over a single pushed-filter pass of the fact (quantity ranges ×
    discount ceilings standing in for the time/demographic bands),
    asserting the pattern the optimizer is supposed to reach.

    Scale shape: one scan, zero joins, zero shuffles beyond the final
    1-row partial-agg merge — the cheapest possible plan for the
    report, and 8× less I/O than the published 8-subquery spelling
    executed naively.
    """
    t = load_tables(spark, sf_dir)
    l = t["lineitem"].filter(F.month("l_shipdate") == DS_MOY)
    aggs = []
    for i, (lo, hi, dmax) in enumerate(Q88_BANDS):
        cond = (
            (F.col("l_quantity") >= lo)
            & (F.col("l_quantity") <= hi)
            & (F.col("l_discount") <= dmax)
        )
        aggs.append(
            F.count(F.when(cond, F.lit(1))).cast("bigint").alias(f"h{i + 1}")
        )
    return l.agg(*aggs)


@query(
    "q_tpcds_q59",
    oracle="""
    WITH weekly AS (
        SELECT n.n_name AS supp_nation,
               epoch_us(l.l_shipdate) // 604800000000 AS week,
               CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                             AS DECIMAL(18,4))) * 10000 AS BIGINT) AS rev_e4
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        GROUP BY 1, 2
    )
    SELECT w2.supp_nation, w2.week,
           w2.rev_e4 AS rev_this, w1.rev_e4 AS rev_prev,
           ROUND(CAST(w2.rev_e4 AS DOUBLE) / CAST(w1.rev_e4 AS DOUBLE), 4)
             AS yoy_ratio
    FROM weekly w2
    JOIN weekly w1
      ON w1.supp_nation = w2.supp_nation AND w2.week = w1.week + 52
    WHERE w1.rev_e4 > 0
    """,
)
def q_tpcds_q59(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q59 shape (year-over-year weekly sales comparison): the
    published query builds a per-(store, week) sales matrix and joins
    it TO ITSELF one year apart — the aggregate-to-aggregate self-join
    pattern no TPC-H shape exercises (H joins facts to facts or facts
    to dims; DS Q59 joins two derived frames). Supplier nation plays
    `store`; weeks are absolute epoch-week integers, so "one year
    later" is week + 52 exactly in both engines.

    Determinism: weekly revenue is summed as exact DECIMAL(18,4) and
    carried as an exact integer in 10⁻⁴ currency units (the
    q_wow_growth cents route one decimal place deeper, since price ×
    (1 − discount) is 4 dp); the one double division rides ROUND(·, 4)
    with identical shapes.

    Scale shape: ONE corpus aggregate down to ≤ nations·weeks rows
    (map-side combined), then the self-join runs on that tiny frame —
    at 100 TB the matrix is still a few thousand rows, so the join is
    a broadcast regardless of fact size. The week+52 equi-key keeps it
    a hash join, never a range join.
    """
    t = load_tables(spark, sf_dir)
    sn = (
        t["supplier"]
        .join(
            F.broadcast(t["nation"]),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    weekly = (
        t["lineitem"]
        .join(F.broadcast(sn), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(
            "supp_nation",
            F.expr("unix_micros(l_shipdate) div 604800000000").alias("week"),
        )
        # r17 (§2.2): split bigint e4 sums (a hot nation-week can brush
        # single-bigint headroom at 100 TB) keep the fact-sized
        # aggregate vectorized; recombined exactly per cell — the
        # staged matrix carries the identical bigint rev_e4.
        .agg(
            F.sum(e_hi(_rev_e4())).alias("r_hi"),
            F.sum(e_lo(_rev_e4())).alias("r_lo"),
        )
        .select(
            "supp_nation",
            "week",
            e_total(F.col("r_hi"), F.col("r_lo")).cast("bigint").alias("rev_e4"),
        )
    )
    # Stage the tiny matrix before the self-join: Spark does NOT reuse
    # the aggregate exchange across the two sides (verified — the plan
    # scanned the fact twice), so without the checkpoint a 100 TB fact
    # would be read and aggregated once per side. The staged frame is
    # ≤ nations·weeks rows; the slot supersedes itself across calls.
    from hive_gateway_spark.staging import stage

    weekly = stage(weekly, "tpcds.q59.weekly")
    w2 = weekly.alias("w2")
    w1 = weekly.alias("w1")
    return (
        w2.join(
            w1,
            (F.col("w1.supp_nation") == F.col("w2.supp_nation"))
            & (F.col("w2.week") == F.col("w1.week") + 52),
        )
        .filter(F.col("w1.rev_e4") > 0)
        .select(
            F.col("w2.supp_nation").alias("supp_nation"),
            F.col("w2.week").alias("week"),
            F.col("w2.rev_e4").alias("rev_this"),
            F.col("w1.rev_e4").alias("rev_prev"),
            F.round(
                F.col("w2.rev_e4").cast("double")
                / F.col("w1.rev_e4").cast("double"),
                4,
            ).alias("yoy_ratio"),
        )
    )


#: DS Q42's fixed (year, month) slice — the published query pins
#: d_year=2000, d_moy=11; 1997 is a full-volume fixture year.
Q42_YEAR = 1997


@query(
    "q_tpcds_q1",
    oracle="""
    WITH ctr AS (
        SELECT o.o_custkey AS cust, c.c_nationkey AS nat,
               CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                             AS DECIMAL(18,4))) * 10000 AS BIGINT) AS ret_e4
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE l.l_returnflag = 'R'
        GROUP BY 1, 2
    )
    SELECT c.c_custkey, c.c_name, n.n_name AS nation, a.ret_e4
    FROM ctr a
    JOIN customer c ON c.c_custkey = a.cust
    JOIN nation n   ON n.n_nationkey = a.nat
    WHERE 10 * a.ret_e4
          * (SELECT COUNT(*) FROM ctr b WHERE b.nat = a.nat)
        > 12 * (SELECT SUM(b.ret_e4) FROM ctr b WHERE b.nat = a.nat)
    ORDER BY a.ret_e4 DESC, c.c_custkey ASC
    LIMIT 100
    """,
)
def q_tpcds_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q1 shape (customers returning more than 1.2× their
    group's average): the published query builds a customer_total_return
    CTE and keeps customers whose return total exceeds 1.2 times the
    AVERAGE of that same CTE within their store/state — the
    aggregate-over-aggregate correlated-threshold pattern (DS's
    signature decorrelation test; TPC-H's closest cousins Q11/Q22
    compare against a GLOBAL scalar, never a correlated group).
    Returned lineitems (l_returnflag = 'R') play store_returns and the
    customer's nation plays the store/state group.

    Spark spelling: the CTE aggregates ONCE, then the per-nation
    average arrives as a WINDOW over the aggregate — zero second scans
    and zero self-joins, which is exactly what a decorrelating
    optimizer is supposed to reach from the published correlated
    subquery; the oracle deliberately KEEPS the correlated spelling so
    the hash compares the decorrelated plan against the definition.
    The 1.2× threshold is compared in exact integer arithmetic
    (10·ret·count > 12·sum ⟺ ret > 1.2·avg), so no float enters the
    predicate in either engine.

    Scale shape: one fact scan (filter pushed to the 'R' third of the
    corpus), one shuffle to (cust, nat) groups, one window over ≤
    customers rows partitioned by 25 nations, customer/nation dims
    broadcast. The aggregate is customer-grained, so the window input
    is dim-sized, not fact-sized.
    """
    from pyspark.sql import Window as W

    t = load_tables(spark, sf_dir)
    ctr = (
        t["lineitem"]
        .filter(F.col("l_returnflag") == "R")
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(t["customer"].select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(
            F.col("o_custkey").alias("cust"), F.col("c_nationkey").alias("nat")
        )
        # r17 (§2.2): sum exact bigint e4-units directly — per-customer
        # groups hold ~1e2 returned lines at any sf, so no overflow,
        # and the fact-sized aggregate keeps the vectorized hash-map
        # path (see e_units). Same integer as (SUM(dec)*10000)::bigint.
        .agg(
            F.sum(
                e_units(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
            ).alias("ret_e4")
        )
    )
    w = W.partitionBy("nat")
    keep = ctr.withColumn("nat_sum", F.sum("ret_e4").over(w)).withColumn(
        "nat_cnt", F.count("*").over(w)
    ).filter(10 * F.col("ret_e4") * F.col("nat_cnt") > 12 * F.col("nat_sum"))
    return (
        keep.join(
            F.broadcast(t["customer"].select("c_custkey", "c_name")),
            F.col("cust") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(t["nation"]), F.col("nat") == F.col("n_nationkey")
        )
        .select(
            "c_custkey", "c_name", F.col("n_name").alias("nation"), "ret_e4"
        )
        .orderBy(F.col("ret_e4").desc(), F.col("c_custkey").asc())
        .limit(100)
    )


@query(
    "q_tpcds_q34",
    oracle="""
    WITH trips AS (
        SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem
        GROUP BY l_orderkey
        HAVING COUNT(*) BETWEEN 7 AND 13
    )
    SELECT c.c_custkey, c.c_name, t.l_orderkey AS o_orderkey, t.n_items
    FROM trips t
    JOIN orders o   ON o.o_orderkey = t.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY t.n_items DESC, c.c_custkey ASC, o_orderkey ASC
    """,
)
def q_tpcds_q34(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q34/Q73 shape (HAVING-over-COUNT basket report): the
    published pair finds shopping trips of 15-20 items (COUNT(*) per
    (customer, ticket) inside a HAVING band) and joins the qualifying
    tickets back to customer names — the aggregate-filter-then-
    rejoin-dims pattern. An order plays the ticket; the band [7, 13]
    is the fixture's large-basket tail (~12%% of orders, top of the
    1-13 items-per-order distribution), discriminating the same way
    DS's 15-20 band does.

    Distinct from TPC-H Q18 (which thresholds SUM(quantity) and
    grades a top-N): the HAVING is on the bare row COUNT, the band is
    two-sided, and the report is the full qualifying set under a
    total-order sort, not a LIMIT over a sum.

    Scale shape: ONE fact scan map-side-combines to per-order counts
    (the groupBy key is the fact's own parent key, so partial
    aggregation does most of the work before the exchange); the band
    filter drops ~88%% of orders before any join; orders joins on its
    primary key; the customer dim broadcasts.
    """
    t = load_tables(spark, sf_dir)
    trips = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.count("*").alias("n_items"))
        .filter(F.col("n_items").between(7, 13))
    )
    return (
        trips.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(t["customer"].select("c_custkey", "c_name")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            "c_custkey",
            "c_name",
            F.col("l_orderkey").alias("o_orderkey"),
            "n_items",
        )
        .orderBy(
            F.col("n_items").desc(),
            F.col("c_custkey").asc(),
            F.col("o_orderkey").asc(),
        )
    )


@query(
    "q_tpcds_q42",
    oracle=f"""
    SELECT CAST({Q42_YEAR} AS BIGINT) AS sales_year,
           split_part(p.p_type, ' ', 1) AS category,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18,4))) AS DOUBLE) AS sum_agg
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE month(l.l_shipdate) = {DS_MOY}
      AND year(l.l_shipdate) = {Q42_YEAR}
    GROUP BY 2
    ORDER BY sum_agg DESC, category ASC
    """,
)
def q_tpcds_q42(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q42/Q52 shape (single-month category rollup): the
    simplest published star — ONE month of ONE year, fact ⋈ item,
    revenue per category, ordered by revenue — the pattern DS uses to
    grade bare star-join latency (vs Q3's every-year seasonal slice;
    this one pins both calendar attributes, so the scan filter is as
    selective as the suite gets). The part type's leading word plays
    i_category (6 values).

    Scale shape: both calendar predicates (month+year of l_shipdate)
    push into the scan; part broadcasts; the rollup has ≤ 6 groups so
    the exchange after partial aggregation is a few rows. This is the
    plan whose cost should be within epsilon of the bare filtered
    scan.
    """
    t = load_tables(spark, sf_dir)
    l = t["lineitem"].filter(
        (F.month("l_shipdate") == DS_MOY) & (F.year("l_shipdate") == Q42_YEAR)
    )
    return (
        l.join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.split(F.col("p_type"), " ").getItem(0).alias("category"))
        # r17 (§2.2): split bigint e4 sums (6 category groups) —
        # vectorized buffer, exact recombination; see e_units.
        .agg(
            F.sum(e_hi(_rev_e4())).alias("r_hi"),
            F.sum(e_lo(_rev_e4())).alias("r_lo"),
        )
        .select(
            F.lit(Q42_YEAR).cast("bigint").alias("sales_year"),
            "category",
            e_double(e_total(F.col("r_hi"), F.col("r_lo")), 4).alias("sum_agg"),
        )
        .orderBy(F.col("sum_agg").desc(), F.col("category").asc())
    )


@query(
    "q_tpcds_q95",
    oracle=f"""
    WITH per_order AS (
        SELECT l_orderkey,
               COUNT(DISTINCT l_suppkey) AS n_supp,
               MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS has_ret,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(18,4))) * 10000 AS BIGINT) AS rev_e4
        FROM lineitem
        GROUP BY l_orderkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(p.rev_e4) AS BIGINT) AS total_rev_e4
    FROM per_order p
    JOIN orders o ON o.o_orderkey = p.l_orderkey
    WHERE p.n_supp > 1 AND p.has_ret = 0
      AND year(o.o_orderdate) = {Q42_YEAR}
    """,
)
def q_tpcds_q95(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q95 shape (multi-EXISTS on one fact): the published
    query counts one-year web orders that EXIST in web_sales under a
    DIFFERENT warehouse (a self-EXISTS on the fact's own order number)
    and do NOT EXIST in web_returns — two correlated quantifiers over
    the same fact. Here "different warehouse" is a second distinct
    supplier within the order and the returns table is the fact's own
    'R'-flagged rows.

    Spark spelling: BOTH quantifiers collapse into ONE per-order
    aggregate — COUNT(DISTINCT supplier) > 1 replaces the self-EXISTS
    and MAX(returnflag = 'R') = 0 replaces the NOT EXISTS — so the
    fact is scanned once where the published spelling's naive plan
    scans it three times; the revenue sum rides the same aggregate.
    The oracle keeps the same collapsed derivation in a CTE (DuckDB
    decorrelates EXISTS to semi-joins anyway; the CTE keeps the
    integer-exact revenue identical) — rows/schema/values all hash.

    Scale shape (r17, guide §2.3/§3.2): the year-filtered orderkeys
    SEMI-JOIN the fact BEFORE the per-order aggregate — a semi on the
    aggregate's own grouping key keeps whole orders intact, so every
    surviving order's aggregate is bit-identical to aggregating first
    and joining after, while ~6/7 of the fact never enters the
    aggregate (locally a broadcast semi; at scale the semi's orderkey
    shuffle is the SAME exchange the aggregate needs, so it stays one
    shuffle and the runtime Bloom filter can prune the scan). The
    n_supp > 1 quantifier only ever tests "≥ 2 distinct suppliers", so
    COUNT(DISTINCT) — whose mixed-aggregate rewrite doubles the
    exchange — is replaced by min(suppkey) != max(suppkey): same
    predicate, one plain partial-combined aggregate, ONE exchange.
    """
    t = load_tables(spark, sf_dir)
    o = t["orders"].filter(F.year("o_orderdate") == Q42_YEAR).select("o_orderkey")
    per_order = (
        t["lineitem"]
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
        .groupBy("l_orderkey")
        .agg(
            (F.min("l_suppkey") != F.max("l_suppkey")).alias("multi_supp"),
            F.max((F.col("l_returnflag") == "R").cast("int")).alias("has_ret"),
            # r17 (§2.2): per-order groups hold ≤ 7 lines — a single
            # bigint e4 sum is exact at any scale and keeps the
            # aggregate vectorized (same integer as (SUM(dec)*1e4)::
            # bigint, see e_units).
            F.sum(
                e_units(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
            ).alias("rev_e4"),
        )
        .filter(F.col("multi_supp") & (F.col("has_ret") == 0))
    )
    return per_order.agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.sum("rev_e4").cast("bigint").alias("total_rev_e4"),
    )


@query(
    "q_tpcds_q51",
    oracle="""
    WITH kept AS (
        SELECT p.p_brand AS brand,
               epoch_us(l.l_shipdate) // 604800000000 AS week,
               l.l_returnflag AS flag,
               CAST(l.l_extendedprice * (1 - l.l_discount)
                    AS DECIMAL(18,4)) AS rev
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_returnflag IN ('N', 'R')
    ),
    n AS (
        SELECT brand, week,
               CAST(SUM(rev) * 10000 AS BIGINT) AS rev_e4
        FROM kept WHERE flag = 'N' GROUP BY 1, 2
    ),
    r AS (
        SELECT brand, week,
               CAST(SUM(rev) * 10000 AS BIGINT) AS rev_e4
        FROM kept WHERE flag = 'R' GROUP BY 1, 2
    ),
    cume AS (
        SELECT COALESCE(n.brand, r.brand) AS brand,
               COALESCE(n.week, r.week) AS week,
               SUM(n.rev_e4) OVER w AS n_cum_raw,
               SUM(r.rev_e4) OVER w AS r_cum_raw
        FROM n FULL OUTER JOIN r
          ON n.brand = r.brand AND n.week = r.week
        WINDOW w AS (
            PARTITION BY COALESCE(n.brand, r.brand)
            ORDER BY COALESCE(n.week, r.week)
            ROWS UNBOUNDED PRECEDING
        )
    )
    SELECT brand, week,
           CAST(COALESCE(n_cum_raw, 0) AS BIGINT) AS n_cum_e4,
           CAST(COALESCE(r_cum_raw, 0) AS BIGINT) AS r_cum_e4
    FROM cume
    WHERE COALESCE(n_cum_raw, 0) > COALESCE(r_cum_raw, 0)
    ORDER BY brand ASC, week ASC
    LIMIT 100
    """,
)
def q_tpcds_q51(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q51 shape (dual cumulative series compared week by
    week): the published query builds per-(item, date) CUMULATIVE web
    and store sales as two derived series, FULL OUTER joins them, and
    null-fills each side with a running MAX (cumulative sums are
    monotone, so max = last-seen) to report where the web cumulative
    overtakes the store cumulative. Brand plays item, epoch-weeks play
    dates, and the 'N'/'R' return-flag slices play the two channels; a
    series counts 0 before its first sale (the published NULL
    semantics would drop those rows — COALESCE(…, 0) in BOTH engines,
    the cleaner report and one less null-order trap).

    Spark spelling: the two series pivot out of ONE fact scan as
    conditional aggregates — the union week set then needs NO full
    outer join and NO null-fill carry at all, because a week present
    in either series is present in the grouped frame and the absent
    side contributes an additive 0 to its cumulative sum. One shuffle
    to (brand, week), two cumulative windows sharing that exchange.
    The oracle deliberately KEEPS the published two-CTE + FULL OUTER +
    window spelling, so the hash proves the one-scan pivot equivalent
    to the textbook derivation.

    Scale shape: fact scans once; the grouped frame is ≤ brands·weeks
    rows; both windows and the final sort ride the same brand
    partitioning. The published spelling's two scans + outer join
    never materialize."""
    t = load_tables(spark, sf_dir)
    from pyspark.sql import Window as W

    kept = t["lineitem"].filter(F.col("l_returnflag").isin("N", "R"))
    # r17 (§2.2): conditional split bigint e4 sums replace the decimal
    # sums so the fact-sized aggregate keeps the vectorized hash-map
    # path; a series absent from a (brand, week) group still yields
    # NULL (when-without-otherwise rows are skipped by SUM on both the
    # hi and lo halves), exactly like the decimal spelling. Recombined
    # per group — see e_units in relational.py.
    rev_e4 = e_units(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
    is_n = F.col("l_returnflag") == "N"
    is_r = F.col("l_returnflag") == "R"
    grouped = (
        kept.join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.expr("unix_micros(l_shipdate) div 604800000000").alias("week"),
        )
        .agg(
            F.sum(F.when(is_n, e_hi(rev_e4))).alias("n_hi"),
            F.sum(F.when(is_n, e_lo(rev_e4))).alias("n_lo"),
            F.sum(F.when(is_r, e_hi(rev_e4))).alias("r_hi"),
            F.sum(F.when(is_r, e_lo(rev_e4))).alias("r_lo"),
        )
        .select(
            "brand",
            "week",
            e_total(F.col("n_hi"), F.col("n_lo")).cast("bigint").alias("n_e4"),
            e_total(F.col("r_hi"), F.col("r_lo")).cast("bigint").alias("r_e4"),
        )
    )
    w = (
        W.partitionBy("brand")
        .orderBy(F.col("week").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = grouped.select(
        "brand",
        "week",
        F.coalesce(F.sum("n_e4").over(w), F.lit(0)).alias("n_cum_e4"),
        F.coalesce(F.sum("r_e4").over(w), F.lit(0)).alias("r_cum_e4"),
    )
    return (
        cum.filter(F.col("n_cum_e4") > F.col("r_cum_e4"))
        .orderBy(F.col("brand").asc(), F.col("week").asc())
        .limit(100)
    )


@query(
    "q_tpcds_q36",
    oracle="""
    WITH base AS (
        SELECT split_part(p.p_type, ' ', 1) AS category,
               p.p_brand AS brand,
               CAST(l.l_extendedprice * l.l_discount
                    AS DECIMAL(18,4)) AS disc_amt,
               CAST(l.l_extendedprice AS DECIMAL(18,2)) AS gross
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    rolled AS (
        SELECT category, brand,
               CAST(SUM(disc_amt) * 10000 AS BIGINT) AS disc_e4,
               CAST(SUM(gross) * 100 AS BIGINT) AS gross_e2,
               CAST(GROUPING(category) + GROUPING(brand) AS BIGINT)
                 AS lochierarchy,
               GROUPING(brand) AS gb
        FROM base
        GROUP BY ROLLUP(category, brand)
    )
    SELECT category, brand,
           ROUND(CAST(disc_e4 AS DOUBLE) / CAST(gross_e2 AS DOUBLE) / 100.0,
                 6) AS discount_ratio,
           lochierarchy,
           CAST(RANK() OVER (
               PARTITION BY lochierarchy,
                            CASE WHEN gb = 0 THEN category END
               ORDER BY CAST(disc_e4 AS DOUBLE) / CAST(gross_e2 AS DOUBLE)
                        ASC, brand ASC NULLS FIRST, category ASC NULLS FIRST
           ) AS BIGINT) AS rk
    FROM rolled
    ORDER BY lochierarchy DESC, category ASC NULLS FIRST,
             rk ASC, brand ASC NULLS FIRST
    """,
)
def q_tpcds_q36(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q36 shape (gross-margin rollup with per-level ranking):
    the published query rolls net profit / revenue up the
    (category, class) hierarchy and RANKS siblings WITHIN each rollup
    level — leaf rows rank against their parent category's other
    brands, category subtotals rank against other categories, the
    grand total ranks alone. ``lochierarchy`` (GROUPING(cat) +
    GROUPING(brand)) names the level and the rank partition reuses the
    GROUPING flag to scope leaf ranks to their parent — the
    grouping-sets + window composition no other shape in the suite
    exercises (q_agg_rollup stops at the subtotals). Discount ratio
    (discount amount / gross price) plays margin.

    Determinism: both ratio operands are exact integer sums (e4
    discount, e2 gross), the divisions have identical shapes in both
    engines, and the RANK ORDER BY carries full (brand, category)
    tie-breaks so equal ratios cannot reorder across engines.

    Scale shape: ONE fact scan; ROLLUP expands each row into 3
    grouping sets map-side (Spark's Expand), partially aggregated
    before the single exchange to ≤ cats·brands + cats + 1 rows; the
    windows run on that dim-sized frame."""
    t = load_tables(spark, sf_dir)
    from pyspark.sql import Window as W

    base = (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            F.split(F.col("p_type"), " ").getItem(0).alias("category"),
            F.col("p_brand").alias("brand"),
            e_units(F.col("l_extendedprice") * F.col("l_discount"), 4).alias(
                "disc_e4r"
            ),
            e_units("l_extendedprice", 2).alias("gross_e2r"),
        )
    )
    # Leaf pre-aggregation before the rollup (r16 optimization round,
    # guide §2.3): collapse the fact to ≤ cats·brands rows, then Expand
    # multiplies only those ×3; sums of exact decimal sums are
    # value-identical. r17 (§2.2): split bigint e-unit sums keep both
    # aggregates on the vectorized path; exact recombination happens on
    # the ≤ cats·brands + cats + 1 rollup rows — see e_units.
    leaf = base.groupBy("category", "brand").agg(
        F.sum(e_hi(F.col("disc_e4r"))).alias("d_hi"),
        F.sum(e_lo(F.col("disc_e4r"))).alias("d_lo"),
        F.sum(e_hi(F.col("gross_e2r"))).alias("g_hi"),
        F.sum(e_lo(F.col("gross_e2r"))).alias("g_lo"),
    )
    rolled = leaf.rollup("category", "brand").agg(
        F.sum("d_hi").alias("d_hi"),
        F.sum("d_lo").alias("d_lo"),
        F.sum("g_hi").alias("g_hi"),
        F.sum("g_lo").alias("g_lo"),
        (F.grouping("category") + F.grouping("brand"))
        .cast("bigint")
        .alias("lochierarchy"),
        F.grouping("brand").alias("gb"),
    )
    rolled = rolled.select(
        "category",
        "brand",
        e_total(F.col("d_hi"), F.col("d_lo")).cast("bigint").alias("disc_e4"),
        e_total(F.col("g_hi"), F.col("g_lo")).cast("bigint").alias("gross_e2"),
        "lochierarchy",
        "gb",
    )
    ratio = F.col("disc_e4").cast("double") / F.col("gross_e2").cast("double")
    wr = W.partitionBy(
        "lochierarchy", F.when(F.col("gb") == 0, F.col("category"))
    ).orderBy(
        ratio.asc(),
        F.col("brand").asc_nulls_first(),
        F.col("category").asc_nulls_first(),
    )
    return (
        rolled.select(
            "category",
            "brand",
            F.round(ratio / 100.0, 6).alias("discount_ratio"),
            "lochierarchy",
            F.rank().over(wr).cast("bigint").alias("rk"),
        )
        .orderBy(
            F.col("lochierarchy").desc(),
            F.col("category").asc_nulls_first(),
            F.col("rk").asc(),
            F.col("brand").asc_nulls_first(),
        )
    )


@query(
    "q_tpcds_q67",
    oracle="""
    WITH rolled AS (
        SELECT split_part(p.p_type, ' ', 1) AS category,
               p.p_brand AS brand,
               CAST(year(l.l_shipdate) AS BIGINT) AS sales_year,
               CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                             AS DECIMAL(18,4))) * 10000 AS BIGINT)
                 AS sumsales_e4
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY ROLLUP(split_part(p.p_type, ' ', 1), p.p_brand,
                        year(l.l_shipdate))
    )
    SELECT category, brand, sales_year, sumsales_e4, rk
    FROM (
        SELECT category, brand, sales_year, sumsales_e4,
               CAST(RANK() OVER (
                   PARTITION BY category
                   ORDER BY sumsales_e4 DESC,
                            brand ASC NULLS FIRST,
                            sales_year ASC NULLS FIRST
               ) AS BIGINT) AS rk
        FROM rolled
    ) WHERE rk <= 10
    """,
)
def q_tpcds_q67(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q67 shape (top-N per group OVER a rollup): the published
    query rolls sales up a six-attribute hierarchy and keeps each
    category's 100 best rows ACROSS ALL ROLLUP LEVELS at once —
    subtotals compete with leaves in the same ranking (a brand-year
    leaf can outrank a whole-brand subtotal), the idiom dashboards use
    for "biggest things in this category at any grain". NULL grouping
    keys partition together (the all-categories subtotal rows rank in
    their own NULL partition), exactly as published.

    Scale shape — the reason this query is famous as a benchmark
    stress point: the rollup output is groups-sized, but the rank
    filter must not buffer whole partitions — the plan is pinned to
    WindowGroupLimit (Spark's rank-pushdown: each map task keeps only
    its local top-10 per partition BEFORE the window exchange), the
    same optimization that makes the published Q67 tractable.
    Determinism: exact e4 integer sales; the RANK order carries full
    (brand, sales_year) NULLS FIRST tie-breaks so equal sums cannot
    reorder across engines."""
    t = load_tables(spark, sf_dir)
    from pyspark.sql import Window as W

    rolled = (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            F.split(F.col("p_type"), " ").getItem(0).alias("category"),
            F.col("p_brand").alias("brand"),
            F.year("l_shipdate").cast("bigint").alias("sales_year"),
            e_units(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
            ).alias("rev_e4"),
        )
        # Leaf pre-aggregation before the rollup (r16 optimization
        # round, guide §2.3): collapse the fact to the
        # (category, brand, year) grain first so Expand's ×4 applies to
        # leaf rows, not lineitem; sums of exact decimal sums are
        # value-identical. r17 (§2.2): both aggregates sum split bigint
        # e4-units instead of decimal so the fact-sized leaf pass keeps
        # the vectorized hash-map path (a >18-precision decimal buffer
        # forces BigDecimal adds per row); hi/lo recombine exactly in
        # decimal only on the dim-sized rollup output — see e_units in
        # relational.py for the 100 TB headroom envelope.
        .groupBy("category", "brand", "sales_year")
        .agg(
            F.sum(e_hi(F.col("rev_e4"))).alias("hi"),
            F.sum(e_lo(F.col("rev_e4"))).alias("lo"),
        )
        .rollup("category", "brand", "sales_year")
        .agg(F.sum("hi").alias("hi"), F.sum("lo").alias("lo"))
        .select(
            "category",
            "brand",
            "sales_year",
            e_total(F.col("hi"), F.col("lo"))
            .cast("bigint")
            .alias("sumsales_e4"),
        )
    )
    wr = W.partitionBy("category").orderBy(
        F.col("sumsales_e4").desc(),
        F.col("brand").asc_nulls_first(),
        F.col("sales_year").asc_nulls_first(),
    )
    return (
        rolled.withColumn("rk", F.rank().over(wr).cast("bigint"))
        .filter(F.col("rk") <= 10)
        .select("category", "brand", "sales_year", "sumsales_e4", "rk")
    )


#: Q14's channel-membership year and Q23's frequency / best-customer
#: parameters, fixture-tuned so each staging CTE is discriminating at
#: every shipped sf (sf0.001: intersect keeps 96/200 parts, iceberg
#: passes 160/289 rollup rows; sf0.01: 881/2000 and 292/529): the
#: published literals (d_year windows, "4 times a day", 95 %) sit on
#: retail-scale densities this star doesn't have.
Q14_YEAR = 1997
Q23_FREQ_MIN = 3  # sales of one part in one calendar month
Q23_BEST_NUM, Q23_BEST_DEN = 3, 4  # best customer: > 3/4 of max spend


@query(
    "q_tpcds_q14",
    oracle=f"""
    WITH j AS (
        SELECT l.l_returnflag AS channel, l.l_partkey AS pk,
               p.p_brand AS brand, p.p_type AS typ,
               CAST(l.l_extendedprice * (1 - l.l_discount)
                    AS DECIMAL(18,4)) AS rev,
               year(l.l_shipdate) AS yr
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    cross_items AS (
        SELECT pk FROM j WHERE channel = 'A' AND yr = {Q14_YEAR}
        INTERSECT
        SELECT pk FROM j WHERE channel = 'N' AND yr = {Q14_YEAR}
        INTERSECT
        SELECT pk FROM j WHERE channel = 'R' AND yr = {Q14_YEAR}
    ),
    big AS (
        SELECT channel, brand, typ,
               CAST(GROUPING(channel) * 4 + GROUPING(brand) * 2
                    + GROUPING(typ) AS BIGINT) AS lvl,
               CAST(SUM(rev) * 10000 AS BIGINT) AS sales_e4,
               CAST(COUNT(*) AS BIGINT) AS n_sales
        FROM j JOIN cross_items USING (pk)
        GROUP BY ROLLUP(channel, brand, typ)
    ),
    leaf AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS ng,
               CAST(SUM(sales_e4) AS BIGINT) AS tot
        FROM big WHERE lvl = 0
    )
    SELECT channel, brand, typ, lvl, sales_e4, n_sales
    FROM big
    WHERE sales_e4 > (SELECT tot // ng FROM leaf)
    """,
)
def q_tpcds_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q14 shape (cross-channel iceberg): the published query
    builds `cross_items` — items sold in ALL THREE channels inside a
    date window — via a three-way INTERSECT of per-channel item sets,
    then reports a ROLLUP over (channel, brand, class) of sales
    restricted to those items, HAVING each row beat a scalar average
    computed in its own CTE. Channels here are the three l_returnflag
    populations; the iceberg threshold is the mean LEAF-group sales
    (the published per-row average never bites at this star's
    densities — divergence documented at Q14_YEAR above).

    Spark spelling: the INTERSECT collapses into ONE fact scan —
    per-part COUNT(DISTINCT channel) = 3 over the year window replaces
    three scans + two intersect shuffles (the q_tpcds_q95 collapse
    applied to set intersection; plan-pinned: no Intersect node, one
    year-filtered scan). The threshold is derived from the rollup's
    OWN leaf rows (lvl = 0) — no third fact pass — broadcast back as
    a 1-row frame.

    Scale shape: fact ⋈ broadcast(part) ⋈ broadcast(cross_items —
    bounded by |part|, dim-sized); the rollup partials combine
    map-side into ≤ channels·brands·types groups; the iceberg filter
    runs on the dim-sized rolled frame. Exact e4 integer sums; the
    threshold compare is pure BIGINT (sum > tot DIV ng is exactly
    sum·ng > tot for positive counts — no double division)."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"]
    cross_items = (
        li.filter(F.year("l_shipdate") == Q14_YEAR)
        .groupBy("l_partkey")
        .agg(F.countDistinct("l_returnflag").alias("nch"))
        .filter(F.col("nch") == 3)
        .select(F.col("l_partkey").alias("pk"))
    )
    j = (
        li.join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(cross_items), F.col("l_partkey") == F.col("pk"))
        .select(
            F.col("l_returnflag").alias("channel"),
            F.col("p_brand").alias("brand"),
            F.col("p_type").alias("typ"),
            _rev_e4().alias("rev_e4"),
        )
    )
    # r17 (§2.2): the rollup sums split bigint e4-units (the grand-
    # total row would exceed single-bigint headroom at 100 TB) and
    # recombines exactly on its dim-sized output — see e_units.
    big = (
        j.rollup("channel", "brand", "typ")
        .agg(
            F.grouping_id().cast("bigint").alias("lvl"),
            F.sum(e_hi(F.col("rev_e4"))).alias("r_hi"),
            F.sum(e_lo(F.col("rev_e4"))).alias("r_lo"),
            F.count("*").cast("bigint").alias("n_sales"),
        )
        .select(
            "channel",
            "brand",
            "typ",
            "lvl",
            e_total(F.col("r_hi"), F.col("r_lo")).cast("bigint").alias("sales_e4"),
            "n_sales",
        )
    )
    # Stage the dim-sized rolled frame before deriving the threshold
    # from it: Spark replays the whole rollup subtree for each
    # consumer (verified — 4 fact scans without this), so at 100 TB
    # the iceberg's scalar would re-read the fact. ≤ channels·brands·
    # types rows; the q_tpcds_q59 staging discipline.
    from hive_gateway_spark.staging import stage

    big = stage(big, "tpcds.q14.rollup")
    leaf = big.filter(F.col("lvl") == 0).agg(
        F.count("*").cast("bigint").alias("ng"),
        F.sum("sales_e4").cast("bigint").alias("tot"),
    )
    return (
        big.crossJoin(F.broadcast(leaf))
        .filter(F.col("sales_e4") > F.expr("tot DIV ng"))
        .select("channel", "brand", "typ", "lvl", "sales_e4", "n_sales")
    )


@query(
    "q_tpcds_q23",
    oracle=f"""
    WITH freq AS (
        SELECT DISTINCT l_partkey FROM (
            SELECT l_partkey, date_trunc('month', l_shipdate) AS m,
                   COUNT(*) AS c
            FROM lineitem GROUP BY 1, 2 HAVING COUNT(*) >= {Q23_FREQ_MIN}
        )
    ),
    cs AS (
        SELECT o.o_custkey,
               CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                             AS DECIMAL(18,4))) * 10000 AS BIGINT) AS s
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1
    ),
    best AS (
        SELECT o_custkey FROM cs
        WHERE s * {Q23_BEST_DEN} > {Q23_BEST_NUM} * (SELECT MAX(s) FROM cs)
    )
    SELECT 'A' AS channel, o.o_custkey AS custkey,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18,4))) * 10000 AS BIGINT) AS sales_e4,
           CAST(COUNT(*) AS BIGINT) AS n_sales
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_returnflag = 'A' AND year(l.l_shipdate) = {Q14_YEAR}
      AND l.l_partkey IN (SELECT l_partkey FROM freq)
      AND o.o_custkey IN (SELECT o_custkey FROM best)
    GROUP BY 2
    UNION ALL
    SELECT 'N' AS channel, o.o_custkey AS custkey,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18,4))) * 10000 AS BIGINT) AS sales_e4,
           CAST(COUNT(*) AS BIGINT) AS n_sales
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_returnflag = 'N' AND year(l.l_shipdate) = {Q14_YEAR}
      AND l.l_partkey IN (SELECT l_partkey FROM freq)
      AND o.o_custkey IN (SELECT o_custkey FROM best)
    GROUP BY 2
    UNION ALL
    SELECT 'R' AS channel, o.o_custkey AS custkey,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18,4))) * 10000 AS BIGINT) AS sales_e4,
           CAST(COUNT(*) AS BIGINT) AS n_sales
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_returnflag = 'R' AND year(l.l_shipdate) = {Q14_YEAR}
      AND l.l_partkey IN (SELECT l_partkey FROM freq)
      AND o.o_custkey IN (SELECT o_custkey FROM best)
    GROUP BY 2
    """,
)
def q_tpcds_q23(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q23 shape (frequent-item-set × best-customer iceberg):
    the published query stages two expensive CTEs — items sold ≥ k
    times in one period (`frequent_ss_items`) and customers whose
    lifetime spend beats a fraction of the maximum
    (`best_ss_customer`, itself a MAX over an aggregate) — then
    references BOTH from each retail channel's branch of a UNION ALL.
    Frequency here is ≥ {{Q23_FREQ_MIN}} sales of one part in one
    calendar month; "best" is > {{Q23_BEST_NUM}}/{{Q23_BEST_DEN}} of
    the max customer spend (integer cross-multiply, never a double
    ratio); channels are the l_returnflag populations.

    Spark spelling: the per-channel UNION ALL collapses into ONE
    year-filtered fact scan grouped by (channel, custkey) — the
    oracle keeps the published three-branch spelling, the engine
    reads the fact once (plan-pinned: exactly three lineitem scans
    total — frequency, spend, final — vs the published five).
    Customer spend pre-aggregates per ORDER before the orders join
    (the fact-fact join moves ≤ |orders| rows, not |lineitem|), and
    the max-spend threshold rides a 1-row broadcast, the
    decorrelated form of the scalar subquery.

    Scale shape: three fact scans, each partially aggregated
    map-side before its shuffle; `freq` is bounded by |part| and
    `best` by |customer| (both semi-join sides); no corpus-wide
    distinct, no cartesian, no window."""
    t = load_tables(spark, sf_dir)
    li, orders = t["lineitem"], t["orders"]
    # r17 (§2.2): both consumers group at order / customer grain (≤ ~1e2
    # rows per group at any sf), so a single bigint e4 sum is safe and
    # keeps the fact-sized aggregates vectorized — same integer as
    # (SUM(dec)*10000)::bigint, see e_units.
    rev_e4 = F.sum(
        e_units(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
    )
    freq = (
        li.groupBy("l_partkey", F.date_trunc("month", "l_shipdate").alias("m"))
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= Q23_FREQ_MIN)
        .select("l_partkey")
        .distinct()
    )
    per_order = li.groupBy("l_orderkey").agg(rev_e4.alias("ord_e4"))
    cs = (
        per_order.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.sum("ord_e4").cast("bigint").alias("s"))
    )
    # Stage the per-customer spend frame: the MAX scalar and the best
    # filter both consume it, and Spark would replay the fact⋈orders
    # aggregation for each (verified — the spend scan doubled). ≤
    # |customer| rows, distributed checkpoint, q59 discipline.
    from hive_gateway_spark.staging import stage

    cs = stage(cs, "tpcds.q23.custspend")
    best = (
        cs.crossJoin(F.broadcast(cs.agg(F.max("s").alias("mx"))))
        .filter(F.col("s") * Q23_BEST_DEN > Q23_BEST_NUM * F.col("mx"))
        .select("o_custkey")
    )
    return (
        li.filter(F.year("l_shipdate") == Q14_YEAR)
        .join(freq, "l_partkey", "semi")
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(best, "o_custkey", "semi")
        .groupBy(
            F.col("l_returnflag").alias("channel"),
            F.col("o_custkey").alias("custkey"),
        )
        .agg(
            rev_e4.alias("sales_e4"),
            F.count("*").cast("bigint").alias("n_sales"),
        )
    )


#: Q74's two comparison years (consecutive, both fully populated in
#: the fixture's shipdate range).
Q74_Y1, Q74_Y2 = 1996, 1997


@query(
    "q_tpcds_q74",
    oracle=f"""
    WITH year_total AS (
        SELECT o.o_custkey AS custkey,
               l.l_returnflag AS channel,
               year(l.l_shipdate) AS yr,
               CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                             AS DECIMAL(18,4))) * 10000 AS BIGINT) AS total_e4
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_returnflag IN ('A', 'N')
          AND year(l.l_shipdate) IN ({Q74_Y1}, {Q74_Y2})
        GROUP BY 1, 2, 3
    )
    SELECT w1.custkey,
           s1.total_e4 AS store_y1_e4, s2.total_e4 AS store_y2_e4,
           w1.total_e4 AS web_y1_e4,   w2.total_e4 AS web_y2_e4
    FROM year_total w1
    JOIN year_total w2
      ON w1.custkey = w2.custkey AND w2.channel = 'N' AND w2.yr = {Q74_Y2}
    JOIN year_total s1
      ON w1.custkey = s1.custkey AND s1.channel = 'A' AND s1.yr = {Q74_Y1}
    JOIN year_total s2
      ON w1.custkey = s2.custkey AND s2.channel = 'A' AND s2.yr = {Q74_Y2}
    WHERE w1.channel = 'N' AND w1.yr = {Q74_Y1}
      AND w1.total_e4 > 0 AND s1.total_e4 > 0
      AND CAST(w2.total_e4 AS DECIMAL(19,0)) * CAST(s1.total_e4 AS DECIMAL(19,0))
        > CAST(s2.total_e4 AS DECIMAL(19,0)) * CAST(w1.total_e4 AS DECIMAL(19,0))
    """,
)
def q_tpcds_q74(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q74/Q11 shape (year-over-year growth comparison ACROSS
    channels): customers whose web-channel sales grew FASTER than
    their store-channel sales between two consecutive years — the
    published query stages a per-(customer, channel, year) total CTE
    and self-joins it FOUR ways, then compares two growth RATIOS.
    Channels here are returnflags 'N' (web) and 'A' (store).

    Spark spelling: the four-way self-join collapses into ONE fact
    scan with conditional aggregation — groupBy(custkey) pivots the
    (channel, year) cell totals into four columns, so the published
    plan's four shuffles of the same aggregate become one (the
    q_tpcds_q51 pivot idiom applied to Q74's staging); the oracle
    keeps the published year_total + 4-alias spelling. The ratio
    comparison w2/w1 > s2/s1 is the exact cross-multiply w2·s1 >
    s2·w1 over the exact e4 integer totals, computed in DECIMAL(38,0)
    (e4 totals reach ~2^40 per customer-year, so the cross-product
    can exceed 2^63 — decimal multiply keeps it exact where a double
    division would tie-break differently per engine and a bigint
    multiply could wrap).

    Scale shape: year-filtered fact → per-order partial → one
    custkey exchange; output bounded by |customer|. No window, no
    self-join, no cartesian (plan-pinned)."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].filter(
        F.col("l_returnflag").isin("A", "N")
        & F.year("l_shipdate").isin(Q74_Y1, Q74_Y2)
    )
    # r17 (§2.2): per-customer (channel, year) cells hold ~1e2 lines at
    # any sf — single bigint e4 conditional sums, NULL-preserving like
    # the decimal spelling (when-without-otherwise), vectorized buffer.
    rev_e4 = e_units(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)

    def cell(flag: str, yr: int):
        return F.sum(
            F.when(
                (F.col("l_returnflag") == flag) & (F.year("l_shipdate") == yr),
                rev_e4,
            )
        )

    per_cust = (
        li.join(
            t["orders"].select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            cell("A", Q74_Y1).alias("store_y1_e4"),
            cell("A", Q74_Y2).alias("store_y2_e4"),
            cell("N", Q74_Y1).alias("web_y1_e4"),
            cell("N", Q74_Y2).alias("web_y2_e4"),
        )
    )
    w1, w2 = F.col("web_y1_e4"), F.col("web_y2_e4")
    s1, s2 = F.col("store_y1_e4"), F.col("store_y2_e4")
    d = lambda c: c.cast("decimal(19,0)")  # noqa: E731 — exact cross-multiply
    return per_cust.filter(
        w1.isNotNull() & w2.isNotNull() & s1.isNotNull() & s2.isNotNull()
        & (w1 > 0) & (s1 > 0) & (d(w2) * d(s1) > d(s2) * d(w1))
    ).select("custkey", "store_y1_e4", "store_y2_e4", "web_y1_e4", "web_y2_e4")
