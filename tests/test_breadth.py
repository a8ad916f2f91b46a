"""Planted-data semantics for the r7 breadth block (triangles,
incremental dedup, gap-fill, fuzzy join) beyond the DuckDB parity gate."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from hive_gateway_spark import registry
from hive_gateway_spark.operators.advanced import fuzzy_name_pairs, gapfill_report
from hive_gateway_spark.operators.dedup import (
    INC_MOD,
    incremental_decisions,
    triangle_enumeration,
)

registry.load_all()

#: Long enough for shingle-based near-dup detection (SHINGLE_N = 3).
_BODY = "alpha beta gamma delta epsilon zeta eta theta iota kappa"


def test_triangles_on_planted_clique_and_chain(spark):
    """Three identical docs form a 3-clique → exactly one triangle
    (a<b<c once); a 3-doc near-dup CHAIN (1~2, 2~3, but 1 and 3 far)
    contributes none — the cluster-vs-chain separation the operator
    exists for."""
    ws = [f"w{i}" for i in range(1, 15)]  # w1..w14, disjoint from _BODY
    docs = spark.createDataFrame(
        [
            (1, _BODY),
            (2, _BODY),
            (3, _BODY),
            # sliding-window chain: 11~12 and 12~13 clear tau=0.5
            # (8/10 token overlap) but 11 vs 13 share only 6/14 - no
            # edge, hence no triangle
            (11, " ".join(ws[0:10])),
            (12, " ".join(ws[2:12])),
            (13, " ".join(ws[4:14])),
        ],
        "doc_id bigint, text string",
    )
    tri = triangle_enumeration({"documents": docs}).collect()
    assert [(r["doc_a"], r["doc_b"], r["doc_c"]) for r in tri] == [(1, 2, 3)]


def test_incremental_decisions_planted(spark):
    """One of each decision class: new doc 0 = verbatim copy of corpus
    doc 1 → drop_exact(1); new doc 7 = near-dup of corpus doc 8 →
    drop_neardup(8); new doc 14 = unique → keep."""
    near = "nu xi omicron pi rho sigma tau upsilon phi chi"  # disjoint vocab
    docs = spark.createDataFrame(
        [
            (0, _BODY),  # new (0 % 7 == 0), exact copy of corpus doc 1
            (1, _BODY),
            (7, near),  # new, near-dup of corpus doc 8
            (8, near + " x"),
            (14, "entirely different content with no relation to others at all"),
        ],
        "doc_id bigint, text string",
    )
    assert all(d % INC_MOD == 0 for d in (0, 7, 14))
    out = {r["doc_id"]: r.asDict() for r in incremental_decisions({"documents": docs}).collect()}
    assert set(out) == {0, 7, 14}
    assert out[0]["decision"] == "drop_exact" and out[0]["match_doc"] == 1
    assert out[7]["decision"] == "drop_neardup" and out[7]["match_doc"] == 8
    assert out[14]["decision"] == "keep" and out[14]["match_doc"] is None


def test_gapfill_carries_forward_and_marks_gaps(spark):
    """Hours 0 and 3 observed, 1-2 are gaps carrying hour-0's value;
    the grid is dense from min to max hour."""
    t0 = dt.datetime(2024, 1, 1, 0, 30)
    ev = spark.createDataFrame(
        [
            ("click", t0, 10.0),
            ("click", t0.replace(minute=45), 2.5),
            ("click", t0 + dt.timedelta(hours=3), 4.0),
        ],
        "event_type string, ts timestamp, value double",
    )
    rows = sorted(
        (r.asDict() for r in gapfill_report(ev).collect()),
        key=lambda r: r["hour_us"],
    )
    assert len(rows) == 4  # dense hourly grid
    assert [r["is_gap"] for r in rows] == [False, True, True, False]
    assert rows[0]["hour_value"] == 12.5
    assert [r["filled_value"] for r in rows] == [12.5, 12.5, 12.5, 4.0]
    assert [r["n_events"] for r in rows] == [2, 0, 0, 1]


def test_fuzzy_join_blocks_and_band(spark):
    """Distance-1 pair inside a block matches; identical names don't
    (dist 0); cross-block near-identical strings never meet."""
    part = spark.createDataFrame(
        [(i, n) for i, n in enumerate(
            ["red widget", "rd widget", "red widget", "red gadget", "red gizmo"]
        )],
        "p_partkey bigint, p_name string",
    )
    out = fuzzy_name_pairs(part).collect()
    got = {(r["name_a"], r["name_b"], r["dist"]) for r in out}
    assert ("rd widget", "red widget", 1) in got
    # "red widget" occurs twice → its n_parts aggregates to 2
    n = {(r["name_a"], r["name_b"]): (r["n_a"], r["n_b"]) for r in out}
    assert n[("rd widget", "red widget")] == (1, 2)
    # no dist-0 pairs, no cross-noun pairs
    assert all(d >= 1 for _, _, d in got)
    assert all(a.split()[-1] == b.split()[-1] for a, b, _ in got)


def test_funnel_requires_in_order_events(spark):
    """A click BEFORE the user's first view doesn't advance the
    funnel; one strictly ordered view→click→purchase user reaches
    stage 3."""
    from hive_gateway_spark.operators.advanced import funnel_report

    t0 = dt.datetime(2024, 1, 1, 12, 0)

    def at(m):
        return t0 + dt.timedelta(minutes=m)

    ev = spark.createDataFrame(
        [
            # user 1: full ordered funnel
            (1, "view", at(0)),
            (1, "click", at(5)),
            (1, "purchase", at(10)),
            # user 2: click precedes its only view -> stuck at stage 1
            (2, "click", at(0)),
            (2, "view", at(5)),
            # user 3: view then purchase but NO click -> stage 1
            (3, "view", at(0)),
            (3, "purchase", at(5)),
        ],
        "user_id bigint, event_type string, ts timestamp",
    )
    out = {r["step"]: r.asDict() for r in funnel_report(ev).collect()}
    assert out["view"]["n_users"] == 3
    assert out["click"]["n_users"] == 1
    assert out["purchase"]["n_users"] == 1
    assert out["view"]["conversion"] == 1.0
    assert abs(out["click"]["conversion"] - 1 / 3) < 1e-12


def test_funnel_empty_stage_conversion_is_null(spark):
    """A funnel whose middle stage is EMPTY: stage 3's conversion
    divides by a 0-count predecessor and must be NULL — the oracle's
    NULLIF(LAG(...), 0) semantics, not a coalesced 1.0 (ADVICE r7 #1:
    the old unconditional coalesce only looked right because the
    fixture had no empty stage)."""
    from hive_gateway_spark.operators.advanced import funnel_report

    t0 = dt.datetime(2024, 1, 1, 12, 0)
    ev = spark.createDataFrame(
        [  # views and purchases exist, but no user ever clicks
            (1, "view", t0),
            (1, "purchase", t0 + dt.timedelta(minutes=5)),
            (2, "view", t0),
        ],
        "user_id bigint, event_type string, ts timestamp",
    )
    out = {r["step"]: r.asDict() for r in funnel_report(ev).collect()}
    assert out["view"]["n_users"] == 2 and out["view"]["conversion"] == 1.0
    assert out["click"]["n_users"] == 0 and out["click"]["conversion"] == 0.0
    assert out["purchase"]["n_users"] == 0
    assert out["purchase"]["conversion"] is None  # 0 / NULLIF(0) — not 1.0


def test_cohort_retention_pre_epoch_truncation(spark):
    """Pre-1970 timestamps: epoch-µs is negative, and integer `div`
    (trunc-toward-zero) must match DuckDB's `//` — the old double-/
    + cast path happened to agree only for non-negative µs (ADVICE r7
    #2). A 1969 signup and a 1969+1wk event land in trunc weeks 0/-1
    consistently in both engines; here we pin the Spark side."""
    from hive_gateway_spark.operators.advanced import cohort_report

    wk_us = 86_400_000_000 * 7
    base = dt.datetime(1969, 12, 1)  # epoch-µs ≈ -2.68e12, week -4 (trunc)
    ev = spark.createDataFrame(
        [
            (1, "signup", base),
            (1, "click", base + dt.timedelta(days=7)),
        ],
        "user_id bigint, event_type string, ts timestamp",
    )
    rows = {r["week_offset"]: r.asDict() for r in cohort_report(ev).collect()}
    us = int(base.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
    expect_wk = -((-us) // wk_us)  # trunc-toward-zero: -4, where floor is -5
    assert rows[0]["cohort_week"] == expect_wk
    assert rows[0]["n_active"] == 1
    assert rows[1]["n_active"] == 1  # the +7d event is one trunc-week later


def test_cohort_retention_dense_grid_and_ratios(spark):
    """Two users signing up in week W: one active in W+1, neither in
    W+2 — the dense grid reports the zero cell explicitly."""
    from hive_gateway_spark.operators.advanced import COHORT_WEEKS, cohort_report

    base = dt.datetime(2024, 1, 1)  # epoch week boundary-agnostic

    ev = spark.createDataFrame(
        [
            (1, "signup", base),
            (2, "signup", base + dt.timedelta(hours=1)),
            (1, "click", base + dt.timedelta(days=7)),
        ],
        "user_id bigint, event_type string, ts timestamp",
    )
    rows = {r["week_offset"]: r.asDict() for r in cohort_report(ev).collect()}
    assert set(rows) == set(range(COHORT_WEEKS))  # dense
    assert rows[0]["n_active"] == 2 and rows[0]["retention"] == 1.0
    assert rows[1]["n_active"] == 1 and rows[1]["retention"] == 0.5
    assert rows[2]["n_active"] == 0 and rows[2]["retention"] == 0.0


def test_outliers_exact_decimal_predicate(spark):
    """Hand-checkable group: values [10, 10, 10, 10, 100] — only the
    100 is a 3-sigma outlier under the squared-decimal predicate."""
    from hive_gateway_spark.operators.advanced import q_outliers  # noqa: F401
    import hive_gateway_spark.operators.advanced as A

    ev = spark.createDataFrame(
        [(i, "click", v) for i, v in enumerate([10.0, 10.0, 10.0, 10.0, 100.0])]
        + [(99, "view", 5.0)],  # singleton group: variance 0, no outlier
        "event_id bigint, event_type string, value double",
    )
    v = F.col("value").cast("decimal(18,2)")
    s = ev.groupBy("event_type").agg(
        F.count("*").alias("n"), F.sum(v).alias("sv"), F.sum(v * v).alias("sv2")
    )
    dev = F.col("n") * v - F.col("sv")
    out = (
        ev.join(F.broadcast(s), "event_type")
        .filter(
            dev * dev
            > F.lit(A.OUTLIER_SIGMA**2)
            * (F.col("n") * F.col("sv2") - F.col("sv") * F.col("sv"))
        )
        .select("event_id")
        .collect()
    )
    # n=5, sv=140, v=100: dev=360, dev^2=129600; 9*(5*10400-19600)=295200
    # -> NOT an outlier at 3 sigma (a single spike in 5 points can't
    # exceed 3 sigma: max |z| in n points is (n-1)/sqrt(n) ~ 1.79)
    assert out == []
    # at 1.5 sigma the spike IS flagged: 129600 > 2.25*32800 = 73800
    out2 = (
        ev.join(F.broadcast(s), "event_type")
        .filter(dev * dev * 4 > F.lit(9) * (F.col("n") * F.col("sv2") - F.col("sv") * F.col("sv")))
        .select("event_id")
        .collect()
    )
    assert [r["event_id"] for r in out2] == [4]


def test_template_catalog_ranks_by_reach(spark, sf_dir):
    from hive_gateway_spark.operators.corpus import BOILER_DF

    rows = registry.QUERIES["q_template_catalog"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 50
    reach = [r["n_docs"] for r in rows]
    assert reach == sorted(reach, reverse=True)
    for r in rows:
        assert r["n_docs"] >= BOILER_DF
        assert r["n_occurrences"] >= r["n_docs"]
        assert 1 <= r["n_sources"] <= r["n_docs"]


def test_event_transitions_probabilities_sum_to_one(spark, sf_dir):
    """Each from_type's outgoing probabilities sum to 1 (within one
    ulp per term) and counts are consistent margins."""
    rows = registry.QUERIES["q_event_transitions"](spark, sf_dir).collect()
    assert len(rows) > 0
    by_from = {}
    for r in rows:
        by_from.setdefault(r["from_type"], []).append(r)
    for ft, rs in by_from.items():
        assert abs(sum(r["p"] for r in rs) - 1.0) < 1e-9
        total = sum(r["n"] for r in rs)
        for r in rs:
            assert abs(r["p"] - r["n"] / total) < 1e-12


def test_user_paths_prefix_order_and_cap(spark):
    """Hand-planted journeys: the path respects (ts, event_id) order —
    including an event_id tiebreak at equal ts — and a hot user's 12
    events are cut to the first PATH_PREFIX before the fold."""
    from hive_gateway_spark.operators.advanced import PATH_PREFIX
    from hive_gateway_spark import registry  # noqa: F811
    from pyspark.sql import functions as F  # noqa: F811

    t0 = dt.datetime(2024, 3, 1)

    rows = []
    # two users with the same 3-step journey; ties broken by event_id
    for uid in (1, 2):
        rows += [
            (uid * 10 + 1, uid, "view", t0),
            (uid * 10 + 2, uid, "click", t0),  # same ts: id order decides
            (uid * 10 + 3, uid, "purchase", t0 + dt.timedelta(minutes=1)),
        ]
    # hot user: 12 views — only the first PATH_PREFIX survive
    rows += [(100 + i, 9, "view", t0 + dt.timedelta(seconds=i)) for i in range(12)]
    ev = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, event_type string, ts timestamp"
    )

    from hive_gateway_spark.operators.advanced import q_user_paths  # noqa: F401
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    firstk = (
        ev.select("user_id", "event_type", "ts", "event_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= PATH_PREFIX)
    )
    paths = firstk.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("ts", "event_id", "event_type"))),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("path")
    )
    got = (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_users"))
        .orderBy(F.col("n_users").desc(), F.col("path").asc())
        .collect()
    )
    assert got[0]["path"] == "view>click>purchase" and got[0]["n_users"] == 2
    assert got[1]["path"] == ">".join(["view"] * PATH_PREFIX)  # capped at 8


def test_readability_hand_computed(spark):
    """ARI on a hand-countable sentence: 'The cat sat on the mat.'
    has 17 alnum chars, 6 words, 1 sentence → ari = (471·17·1 +
    50·36 − 2143·6·1) / (100·6·1) = (8007 + 1800 − 12858) / 600 =
    −3051/600 = −5.085 exactly."""
    from pyspark.sql import functions as F  # noqa: F811

    docs = spark.createDataFrame(
        [(1, "The cat sat on the mat.")], "doc_id bigint, text string"
    )
    n_alnum = F.length(F.regexp_replace("text", "[^A-Za-z0-9]", "")).cast("bigint")
    n_words = F.greatest(
        F.lit(1), F.size(F.filter(F.split("text", " "), lambda w: w != ""))
    ).cast("bigint")
    n_sent = F.greatest(F.lit(1), F.regexp_count("text", F.lit(r"[.!?]+"))).cast(
        "bigint"
    )
    m = docs.select(
        n_alnum.alias("c"), n_words.alias("w"), n_sent.alias("s")
    ).first()
    assert (m["c"], m["w"], m["s"]) == (17, 6, 1)
    num = 471 * 17 * 1 + 50 * 36 - 2143 * 6
    assert num / 600 == -5.085


def test_k_anonymity_flags_small_classes(spark):
    """Planted equivalence classes: 5 users sharing a quasi-identifier
    are safe at K=5; a 2-user class (including one user appearing in
    many rows — row count must NOT stand in for user count) is
    at_risk."""
    from hive_gateway_spark.operators.advanced import K_ANON

    assert K_ANON == 5
    t0 = dt.datetime(2024, 6, 1, 9, 0)
    rows = []
    # safe class: 5 distinct users, same type/day/band
    rows += [(i, i, "view", t0, 12.0) for i in range(5)]
    # risky class: 2 users, one with many rows (6 rows ≥ K but 2 users)
    rows += [(100 + j, 50, "purchase", t0, 25.0) for j in range(5)]
    rows += [(110, 51, "purchase", t0, 25.0)]
    ev = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, event_type string, ts timestamp, value double"
    )
    from pyspark.sql import functions as F  # noqa: F811

    n_users = F.countDistinct("user_id")
    out = {
        (r["event_type"],): r.asDict()
        for r in ev.select(
            "event_type",
            F.expr("unix_micros(ts) div 86400000000").alias("day"),
            (F.floor(F.col("value") / F.lit(10)) * F.lit(10)).cast("double").alias("value_band"),
            "user_id",
        )
        .groupBy("event_type", "day", "value_band")
        .agg(n_users.alias("n_users"), F.count("*").alias("n_rows"),
             (n_users < F.lit(K_ANON)).alias("at_risk"))
        .collect()
    }
    safe = out[("view",)]
    risky = out[("purchase",)]
    assert safe["n_users"] == 5 and not safe["at_risk"]
    assert risky["n_users"] == 2 and risky["n_rows"] == 6 and risky["at_risk"]


def test_interval_overlap_inverted_and_single_week(spark):
    """Hand-planted spans built through the registered plan shape: a
    2-week order contributes both weeks (placed in the first,
    completed in the second), a same-week order counts as placed AND
    completed, and an INVERTED interval (shipped before ordered) is
    filtered — Spark's sequence() would descend on it while DuckDB's
    range() is empty, the cross-engine divergence the filter exists
    to kill."""
    rows = [(1, 10, 11), (2, 20, 20), (3, 31, 30)]  # (key, w0, w1)
    iv = spark.createDataFrame(rows, "k bigint, w0 bigint, w1 bigint")
    e = iv.filter(F.col("w1") >= F.col("w0")).select(
        "w0", "w1", F.explode(F.expr("sequence(w0, w1)")).alias("week")
    )
    one_if = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("bigint")  # noqa: E731
    out = {
        r["week"]: r.asDict()
        for r in e.groupBy("week")
        .agg(
            F.count("*").alias("n_open"),
            one_if(F.col("week") == F.col("w0")).alias("n_placed"),
            one_if(F.col("week") == F.col("w1")).alias("n_completed"),
        )
        .collect()
    }
    assert set(out) == {10, 11, 20}  # inverted key-3 contributes nothing
    assert out[10]["n_open"] == 1 and out[10]["n_placed"] == 1
    assert out[11]["n_completed"] == 1
    assert out[20] == {"week": 20, "n_open": 1, "n_placed": 1, "n_completed": 1}


def test_event_value_corr_exact_endpoints(spark):
    """Known-answer correlations through the registered statistic
    shape: a perfectly linear value-vs-hour series gives r = 1.0
    EXACTLY (all-integer sufficient statistics, one IEEE chain), and
    an anti-linear one gives r = -1.0."""
    import datetime as _dt

    base = _dt.datetime(2024, 1, 1, 0, 0)
    rows = []
    for h in range(6):
        ts = base + _dt.timedelta(hours=h)
        rows.append((len(rows), "up", ts, 10.0 + 2 * h))
        rows.append((len(rows), "down", ts, 50.0 - 3 * h))
    ev = spark.createDataFrame(
        rows, "event_id bigint, event_type string, ts timestamp, value double"
    )
    hour = F.expr("(unix_micros(ts) div 3600000000) % 24")
    x = hour.cast("bigint")
    y = F.col("value").cast("decimal(18,2)")
    s = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"), F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"), F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    num = d("n") * d("sxy") - d("sx") * d("sy")
    den = F.sqrt(
        (d("n") * d("sxx") - d("sx") * d("sx"))
        * (d("n") * d("syy") - d("sy") * d("sy"))
    )
    out = {
        r["event_type"]: r["r"]
        for r in s.select("event_type", (num / den).alias("r")).collect()
    }
    assert out["up"] == 1.0 and out["down"] == -1.0


def test_corr_degenerate_group_is_null_both_engines(spark):
    """A single-event group (denominator 0) must be NULL, matching
    the oracle's NULLIF guard — unguarded, Spark gives NULL while
    DuckDB's IEEE division gives NaN, a hash-parity break on any
    corpus with a rare event type."""
    import datetime as _dt
    import duckdb

    from hive_gateway_spark import registry  # noqa: F811

    ev = [(1, "solo", _dt.datetime(2024, 1, 1, 5), 42.0)]
    sdf = spark.createDataFrame(
        ev, "event_id bigint, event_type string, ts timestamp, value double"
    )
    sdf.createOrReplaceTempView("events_tmp")
    # drive the registered oracle against the same single row
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT 1::BIGINT AS event_id, "
        "'solo' AS event_type, TIMESTAMP '2024-01-01 05:00:00' AS ts, "
        "42.0::DOUBLE AS value"
    )
    du = con.execute(registry.ORACLES["q_event_value_corr"]).fetchall()
    assert du == [("solo", 1, None)]
    # Spark side through the same statistic shape
    from pyspark.sql import functions as F  # noqa: F811

    hour = F.expr("(unix_micros(ts) div 3600000000) % 24")
    x, y = hour.cast("bigint"), F.col("value").cast("decimal(18,2)")
    s = sdf.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"), F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"), F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    num = d("n") * d("sxy") - d("sx") * d("sy")
    den = F.sqrt(
        (d("n") * d("sxx") - d("sx") * d("sx"))
        * (d("n") * d("syy") - d("sy") * d("sy"))
    )
    got = s.select((num / F.nullif(den, F.lit(0.0))).alias("r")).first()
    assert got["r"] is None


def test_rolling_wau_hand_checked(spark):
    """Hand-countable WAU: user 1 active day 0 and day 3, user 2 day 3
    only. Day 0: dau 1, wau 1; day 3: dau 2, wau 2 (user 1 counted
    once despite two active days inside the window)."""
    import datetime as _dt

    base = _dt.datetime(2024, 1, 1)
    day0_us = int(base.replace(tzinfo=_dt.timezone.utc).timestamp() * 1e6)
    d0 = day0_us // 86_400_000_000
    ev = spark.createDataFrame(
        [
            (1, 1, "view", base),
            (2, 1, "view", base + _dt.timedelta(days=3)),
            (3, 2, "view", base + _dt.timedelta(days=3, hours=5)),
        ],
        "event_id bigint, user_id bigint, event_type string, ts timestamp",
    )
    ud = ev.select(
        "user_id", F.expr("unix_micros(ts) div 86400000000").alias("day")
    ).distinct()
    dau = ud.groupBy("day").agg(F.count("*").alias("dau"))
    win = ud.select(
        "user_id", F.explode(F.expr("sequence(day, day + 6)")).alias("wday")
    ).distinct()
    wau = win.groupBy("wday").agg(F.count("*").alias("wau"))
    out = {
        r["day"] - d0: (r["dau"], r["wau"])
        for r in dau.join(wau, dau["day"] == wau["wday"]).collect()
    }
    assert out == {0: (1, 1), 3: (2, 2)}


def test_ngram_novelty_planted(spark):
    """Doc 1 introduces every gram (novelty 1.0); doc 2 repeats doc 1
    verbatim (novelty 0.0); doc 3 shares a prefix but appends new
    content (strictly between); a 2-word doc is excluded."""
    from hive_gateway_spark import registry  # noqa: F811

    base = "alpha beta gamma delta"
    docs = spark.createDataFrame(
        [
            (1, base),                      # 2 grams, both first here
            (2, base),                      # same grams → 0 novel
            (3, base + " omega"),           # 3 grams, 1 new
            (4, "too short"),               # < 3 words → no row
        ],
        "doc_id bigint, text string",
    )
    import hive_gateway_spark.operators.corpus as C

    w = docs.select("doc_id", F.split("text", " ").alias("words")).filter(
        F.size("words") >= 3
    )
    g = w.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(words) - 3), i -> "
                "concat_ws(chr(31), words[i], words[i + 1], words[i + 2]))"
            )
        ).alias("gram"),
    ).distinct()
    f = g.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    novel = F.sum(
        F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    ).cast("bigint")
    out = {
        r["doc_id"]: r.asDict()
        for r in g.join(f, "gram")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            novel.alias("n_novel"),
            (novel.cast("double") / F.count("*").cast("double")).alias("novelty"),
        )
        .collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[1]["novelty"] == 1.0
    assert out[2]["novelty"] == 0.0
    assert out[3]["n_grams"] == 3 and out[3]["n_novel"] == 1


def test_audience_overlap_hand_checked(spark):
    """Users {1,2} view, {2,3} click → Jaccard(view, click) = 1/3;
    multi-event users dedup before the join."""
    import datetime as _dt

    t0 = _dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [
            (1, 1, "view", t0), (2, 2, "view", t0), (3, 2, "view", t0),
            (4, 2, "click", t0), (5, 3, "click", t0),
        ],
        "event_id bigint, user_id bigint, event_type string, ts timestamp",
    )
    tu = ev.select("event_type", "user_id").distinct()
    a = tu.select(F.col("event_type").alias("type_a"), "user_id")
    b = tu.select(F.col("event_type").alias("type_b"), "user_id")
    inter = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("n_both"))
        .first()
    )
    assert (inter["type_a"], inter["type_b"], inter["n_both"]) == (
        "click", "view", 1,
    )


def test_char_entropy_separates_gibberish(spark):
    """The quality-signal property: a single repeated char has entropy
    0; a uniform 16-char alphabet scores exactly round6(-16·(1/16)·
    ln(1/16)) = ln 16; natural-ish text lands between; empty docs are
    excluded."""
    import math

    docs = spark.createDataFrame(
        [
            (1, "aaaaaaaaaaaaaaaa"),
            (2, "abcdefghijklmnop"),  # 16 distinct, uniform
            (3, "the cat sat"),
            (4, ""),
        ],
        "doc_id bigint, text string",
    )
    c = docs.filter(F.length("text") > 0).select(
        "doc_id",
        F.length("text").alias("len"),
        F.explode(F.split("text", "")).alias("ch"),
    )
    cc = c.groupBy("doc_id", "len", "ch").agg(F.count("*").alias("cnt"))
    p = F.col("cnt").cast("double") / F.col("len").cast("double")
    t = F.round(-p * F.log(p), 6).cast("decimal(18,6)")
    out = {
        r["doc_id"]: r["entropy_nats"]
        for r in cc.select("doc_id", t.alias("t"))
        .groupBy("doc_id")
        .agg(F.sum("t").cast("double").alias("entropy_nats"))
        .collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[1] == 0.0
    assert abs(out[2] - 16 * round(-(1 / 16) * math.log(1 / 16), 6)) < 1e-9
    assert 0.0 < out[3] < out[2]


def test_curation_funnel_is_a_partition_of_the_corpus(spark, sf_dir):
    """The funnel's doc counts must sum to the corpus size (the trace
    is a total partition — every doc takes exactly one exit) and its
    'selected' row must equal q_curation_v3's selection size."""
    from hive_gateway_spark import registry  # noqa: F811
    from hive_gateway_spark.session import load_tables  # noqa: F811

    rows = {
        r["decision"]: r.asDict()
        for r in registry.QUERIES["q_curation_funnel"](
            spark, sf_dir
        ).collect()
    }
    n_docs = load_tables(spark, sf_dir)["documents"].count()
    assert sum(r["n_docs"] for r in rows.values()) == n_docs
    n_sel = registry.QUERIES["q_curation_v3"](spark, sf_dir).count()
    assert rows["selected"]["n_docs"] == n_sel


def test_volume_anomaly_flags_planted_spike(spark):
    """Ten quiet days of ~100 events and one 10× day: only the spike
    trips the integer 3σ predicate."""
    import datetime as _dt

    t0 = _dt.datetime(2024, 5, 1)
    rows = []
    eid = 0
    for day in range(10):
        for _ in range(100 + day):  # mild natural variation
            rows.append((eid, 1, "view", t0 + _dt.timedelta(days=day)))
            eid += 1
    for _ in range(1000):  # the rogue-crawler day
        rows.append((eid, 1, "view", t0 + _dt.timedelta(days=10)))
        eid += 1
    ev = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, event_type string, ts timestamp"
    )
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
    out = {
        r["n"]: r["is_spike"]
        for r in d.crossJoin(F.broadcast(s))
        .select(
            "n",
            (
                dev * dev
                > F.lit(9)
                * (F.col("k") * F.col("snn") - F.col("sn") * F.col("sn"))
            ).alias("is_spike"),
        )
        .collect()
    }
    assert out[1000] is True
    assert all(not v for n, v in out.items() if n != 1000)


def test_triangle_hot_hub_bounded_by_degree_orientation(spark):
    """A hot hub (id 0, degree 200) plus one planted leaf triangle:
    id-orientation would make the hub the SOURCE of all 200 edges
    (C(200,2) = 19 900 wedges from one node); degree orientation makes
    the hub the DST of every hub edge, so its out-degree — and wedge
    contribution — is 0, and the only wedges come from the planted
    triangle. Asserts both the bound and the exact result."""
    from hive_gateway_spark.operators.dedup import (
        degree_oriented_edges,
        triangles_from_edges,
    )

    rows = [(0, i) for i in range(1, 201)]  # star around hub 0
    rows += [(201, 202), (202, 203), (201, 203)]  # hub-free triangle
    e = spark.createDataFrame(rows, "doc_a bigint, doc_b bigint")

    out_deg = {
        r["s"]: r["n"]
        for r in degree_oriented_edges(e).groupBy("s").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert 0 not in out_deg  # the hub sources NO edges
    assert max(out_deg.values()) <= 2

    tri = triangles_from_edges(e).collect()
    assert [(r["doc_a"], r["doc_b"], r["doc_c"]) for r in tri] == [(201, 202, 203)]


def test_kcore_separates_clique_from_chain(spark):
    """Planted semantics for the 2-core peel: a 4-clique survives with
    core_degree 3 everywhere; a 5-node path peels to nothing (each
    round strips both endpoints); a triangle dangling off the path's
    middle survives alone. Convergence flag true in all cases."""
    from hive_gateway_spark.operators.dedup import kcore_nodes

    clique = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    path = [(10, 11), (11, 12), (12, 13), (13, 14)]
    tri = [(20, 21), (21, 22), (20, 22), (12, 20)]  # triangle hung on 12
    e = spark.createDataFrame(
        clique + path + tri, "doc_a bigint, doc_b bigint"
    )
    rows = {r["doc_id"]: r for r in kcore_nodes(e).collect()}
    assert {i for i in rows} == {0, 1, 2, 3, 20, 21, 22}
    assert all(rows[i]["core_degree"] == 3 for i in range(4))
    assert all(rows[i]["core_degree"] == 2 for i in (20, 21, 22))
    assert all(r["converged"] for r in rows.values())


def test_scd2_intervals_chain_and_cover(spark, sf_dir):
    """SCD2 invariants beyond engine parity: per user, intervals chain
    (each valid_to equals the next valid_from), exactly one open
    (is_current) interval exists, consecutive runs never share a state
    (else they'd be one run), and run event counts total the user's
    events."""
    from hive_gateway_spark.session import load_tables

    rows = registry.QUERIES["q_scd2_history"](spark, sf_dir).collect()
    assert rows
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    ev_counts = {
        r["user_id"]: r["n"]
        for r in load_tables(spark, sf_dir)["events"]
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(by_user) == set(ev_counts)
    for uid, runs in by_user.items():
        runs.sort(key=lambda r: (r["valid_from"], r["valid_to"] is None))
        assert sum(r["n_events"] for r in runs) == ev_counts[uid]
        assert sum(r["is_current"] for r in runs) == 1
        assert runs[-1]["is_current"] and runs[-1]["valid_to"] is None
        for a, b in zip(runs, runs[1:]):
            assert a["valid_to"] == b["valid_from"], uid
            assert a["state"] != b["state"], uid


def test_zorder_buckets_bound_both_dims(spark, sf_dir):
    """The Z-order guarantee: a top-6-bit z-bucket fixes 3 high bits of
    EACH dimension, so every bucket's cell range spans ≤ 2^(10−3) = 128
    cells in BOTH dims — the property that lets parquet min/max stats
    skip on either column. A 1-D sort would bound one dim and leave the
    other spanning all 1024 cells."""
    rows = registry.QUERIES["q_zorder_layout"](spark, sf_dir).collect()
    assert rows
    total = sum(r["n_rows"] for r in rows)
    from hive_gateway_spark.session import load_tables

    assert total == load_tables(spark, sf_dir)["lineitem"].count()
    for r in rows:
        assert 0 <= r["zbucket"] < 64
        assert r["x_max"] - r["x_min"] <= 127, r
        assert r["y_max"] - r["y_min"] <= 127, r
        assert 0 <= r["x_min"] and r["x_max"] < 1024
        assert 0 <= r["y_min"] and r["y_max"] < 1024


def test_scd2_incremental_equals_full_rebuild(spark, sf_dir):
    """The CDC merge contract, asserted directly engine-side (the
    driver asserts it via the shared oracle): incremental apply of the
    post-split batch onto the pre-split history is row-identical to
    one build over everything — and the split genuinely exercises the
    merge (both halves non-empty, some users span the boundary)."""
    from hive_gateway_spark.operators.advanced import SCD2_SPLIT_TS
    from hive_gateway_spark.session import load_tables

    ev = load_tables(spark, sf_dir)["events"]
    split = F.lit(SCD2_SPLIT_TS).cast("timestamp")
    n_old = ev.filter(F.col("ts") < split).count()
    n_new = ev.filter(F.col("ts") >= split).count()
    assert n_old > 0 and n_new > 0
    spanning = (
        ev.filter(F.col("ts") < split)
        .select("user_id")
        .join(ev.filter(F.col("ts") >= split).select("user_id"), "user_id", "left_semi")
        .distinct()
        .count()
    )
    assert spanning > 0  # open runs actually get extended/closed
    cols = ["user_id", "state", "valid_from", "valid_to", "is_current", "n_events"]
    full = sorted(
        map(tuple, registry.QUERIES["q_scd2_history"](spark, sf_dir).select(*cols).collect()),
        key=lambda r: (r[0], str(r[2])),
    )
    inc = sorted(
        map(tuple, registry.QUERIES["q_scd2_incremental"](spark, sf_dir).select(*cols).collect()),
        key=lambda r: (r[0], str(r[2])),
    )
    assert full == inc


def test_attribution_credit_conservation(spark, sf_dir):
    """Linear attribution must conserve credit: every converted segment
    hands out Σ round(1e6/n) ppm ≈ 1e6, so total channel credit equals
    1e6 × (number of conversions with ≥1 preceding touch) within the
    rounding slack (≤ half a ppm per credited touch)."""
    from pyspark.sql import Window as PW

    from hive_gateway_spark.session import load_tables

    rows = registry.QUERIES["q_attribution_linear"](spark, sf_dir).collect()
    assert rows
    total_credit = sum(r["credit_ppm"] for r in rows)
    n_touches = sum(r["n_touches"] for r in rows)
    ev = load_tables(spark, sf_dir)["events"]
    w_prev = (
        PW.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(PW.unboundedPreceding, -1)
    )
    is_conv = F.col("event_type") == "purchase"
    seg = ev.select(
        "user_id",
        is_conv.alias("is_conv"),
        F.coalesce(
            F.sum(F.when(is_conv, 1).otherwise(0)).over(w_prev), F.lit(0)
        ).alias("seg0"),
    )
    touch_segs = (
        seg.filter(~F.col("is_conv")).select("user_id", "seg0").distinct()
    )
    converted_with_touches = (
        seg.filter(F.col("is_conv"))
        .select("user_id", "seg0")
        .distinct()
        .join(touch_segs, ["user_id", "seg0"], "left_semi")
        .count()
    )
    assert converted_with_touches > 0
    assert abs(total_credit - 1_000_000 * converted_with_touches) <= n_touches
