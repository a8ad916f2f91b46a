"""Property-based operator tests: the Spark operators against tiny pure-
Python reference implementations over randomized event sets (hypothesis).
These guard semantics, not parity — the DuckDB gate covers parity."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import Window as W, functions as F

# One randomized dataframe strategy: (user_id, ts_us, value) events.
events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),            # user_id
        st.integers(min_value=0, max_value=10_000_000),   # ts offset (µs)
        st.integers(min_value=0, max_value=500),          # value
    ),
    min_size=1,
    max_size=60,
)


def _df(spark, rows):
    # unique, strictly increasing per-row ids; ts scaled to spread windows
    data = [
        (i, u, 1_700_000_000_000_000 + t * 3_600, float(v))
        for i, (u, t, v) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, "event_id long, user_id long, ts_us long, value double"
    ).withColumn("ts", F.timestamp_micros(F.col("ts_us")))


def _reference_admission(rows, limit):
    """Pure-python: first `limit` events per (user, day) by (ts, id)."""
    import collections

    byday = collections.defaultdict(list)
    for i, (u, t, v) in enumerate(rows):
        ts_us = 1_700_000_000_000_000 + t * 3_600
        day = ts_us // 86_400_000_000
        byday[(u, day)].append((ts_us, i))
    admitted = {}
    for key, evs in byday.items():
        for rank, (_, i) in enumerate(sorted(evs), start=1):
            admitted[i] = rank <= limit
    return admitted


@given(events_strategy, st.integers(min_value=1, max_value=5))
@settings(max_examples=12, deadline=None)
def test_admission_window_matches_reference(spark_global, rows, limit):
    spark = spark_global
    df = _df(spark, rows)
    w = W.partitionBy("user_id", F.date_trunc("day", "ts")).orderBy("ts", "event_id")
    got = {
        r["event_id"]: r["adm"]
        for r in df.withColumn("adm", F.row_number().over(w) <= limit).collect()
    }
    assert got == _reference_admission(rows, limit)


def _reference_sessions(rows, gap_us):
    """Pure-python gap sessionizer → set of (user, n_events) multiset."""
    import collections

    per_user = collections.defaultdict(list)
    for i, (u, t, v) in enumerate(rows):
        per_user[u].append((1_700_000_000_000_000 + t * 3_600, i))
    out = []
    for u, evs in per_user.items():
        evs.sort()
        n = 0
        prev = None
        for ts, _ in evs:
            if prev is None or ts - prev > gap_us:
                if n:
                    out.append((u, n))
                n = 0
            n += 1
            prev = ts
        if n:
            out.append((u, n))
    return sorted(out)


@given(events_strategy)
@settings(max_examples=12, deadline=None)
def test_sessionize_matches_reference(spark_global, rows):
    spark = spark_global
    gap_us = 30 * 60 * 1_000_000
    df = _df(spark, rows)
    us = F.unix_micros(F.col("ts"))
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    flagged = df.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            (us - F.lag(us).over(w)).isNull() | ((us - F.lag(us).over(w)) > gap_us), 1
        )
        .otherwise(0)
        .alias("new_session"),
    )
    got = sorted(
        (r["user_id"], r["n"])
        for r in flagged.withColumn("sid", F.sum("new_session").over(run))
        .groupBy("user_id", "sid")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert got == _reference_sessions(rows, gap_us)


def _reference_asof(rows, marker_users):
    """Pure-python as-of: per event, most recent prior-or-equal marker ts."""
    import collections

    per_user = collections.defaultdict(list)
    for i, (u, t, v) in enumerate(rows):
        per_user[u].append((1_700_000_000_000_000 + t * 3_600, i, v))
    out = {}
    for u, evs in per_user.items():
        evs.sort()
        last_marker = None
        for ts, i, v in evs:
            if int(v) % 3 == 0:  # marker rows
                last_marker = ts
            out[i] = None if last_marker is None else ts - last_marker
    return out


@given(events_strategy)
@settings(max_examples=12, deadline=None)
def test_asof_carry_forward_matches_reference(spark_global, rows):
    spark = spark_global
    df = _df(spark, rows)
    us = F.unix_micros(F.col("ts"))
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    last_marker = F.last(
        F.when(F.col("value").cast("long") % 3 == 0, us), ignorenulls=True
    ).over(w)
    got = {
        r["event_id"]: r["d"]
        for r in df.select("event_id", (us - last_marker).alias("d")).collect()
    }
    assert got == _reference_asof(rows, None)


@pytest.fixture(scope="module")
def spark_global(spark):
    return spark


def test_results_invariant_to_shuffle_width(spark, sf_dir):
    """Partitioning is an execution detail, not a semantic one: the
    same query at shuffle width 1 and the session default must return
    the identical row multiset. Catches order-dependent aggregation
    (double-sum drift), partition-local state leaks, and
    nondeterministic tiebreaks. Uses operators WITHOUT session-level
    staging caches (those would serve the first width's result)."""
    from hive_gateway_spark import registry

    names = ["q_dedup_substring", "q_lm_perplexity", "q_dsir_weights"]
    default = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        results = {}
        for width in ("1", default):
            spark.conf.set("spark.sql.shuffle.partitions", width)
            for n in names:
                rows = sorted(
                    map(tuple, registry.QUERIES[n](spark, sf_dir).collect())
                )
                results.setdefault(n, []).append(rows)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", default)
    for n, (narrow, wide) in results.items():
        assert narrow == wide, f"{n}: width-1 vs default mismatch"
        assert len(narrow) > 0


# ---------------------------------------------------------------------------
# exact_ntile ≡ NTILE (ranking.py, the r10 de-weak machinery)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "n_tiles,desc,domain",
    [
        (5, False, 1_000_000),  # near-continuous values
        (5, True, 1_000_000),
        (3, False, 7),  # massive ties — the sub-split path
        (5, True, 7),
        (4, False, 1),  # ALL rows tie on one value
        (7, False, 40),  # n % k != 0, tie-heavy
        (10, True, 1_000_000),  # many tiles, descending, continuous
    ],
)
def test_exact_ntile_matches_native_ntile(spark, n_tiles, desc, domain):
    """exact_ntile must be BIT-IDENTICAL to NTILE over the same total
    order — global and per-group, ascending and descending, continuous
    and massively tied ranking keys (the tiebreak sub-split path), and
    group sizes below n_tiles."""
    from hive_gateway_spark.operators.ranking import exact_ntile

    n = 4000
    base = spark.range(n).select(
        F.col("id").alias("tb"),
        (F.xxhash64(F.col("id"), F.lit(domain)) % domain).alias("v"),
        (F.xxhash64(F.col("id"), F.lit("g")) % 3).alias("g"),
    )
    # one tiny group (< n_tiles) to exercise the q=0 branch
    tiny = spark.range(2).select(
        (F.col("id") + n).alias("tb"), F.col("id").alias("v"), F.lit(99).alias("g")
    )
    df = base.unionByName(tiny)

    order = [F.col("v").desc() if desc else F.col("v").asc(), F.col("tb").asc()]
    expected = df.select(
        "g", "tb", F.ntile(n_tiles).over(W.partitionBy("g").orderBy(*order)).alias("t")
    )
    actual = exact_ntile(
        df, n_tiles, "v", "tb", value_desc=desc, partition_cols=["g"],
        buckets=8, out_col="t",
    ).select("g", "tb", "t")
    a = actual.toPandas().sort_values(["g", "tb"]).reset_index(drop=True)
    e = expected.toPandas().sort_values(["g", "tb"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, e, check_dtype=False)


def test_exact_ntile_global_matches_native(spark):
    """No partition columns — the q_rfm_segments shape."""
    from hive_gateway_spark.operators.ranking import exact_ntile

    df = spark.range(3000).select(
        F.col("id").alias("tb"), (F.xxhash64("id") % 11).alias("v")
    )
    expected = df.select(
        "tb", F.ntile(5).over(W.orderBy(F.col("v").desc(), F.col("tb"))).alias("t")
    )
    actual = exact_ntile(
        df, 5, "v", "tb", value_desc=True, buckets=8, out_col="t"
    ).select("tb", "t")
    a = actual.toPandas().sort_values("tb").reset_index(drop=True)
    e = expected.toPandas().sort_values("tb").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, e, check_dtype=False)


def test_exact_ntile_without_subsplit_still_exact(spark):
    """tie_subsplit=False (the documented-continuous fast path) must
    stay bit-identical even when the key DOES tie heavily — only
    balance may degrade, never values."""
    from hive_gateway_spark.operators.ranking import exact_ntile

    df = spark.range(2000).select(
        F.col("id").alias("tb"), (F.xxhash64("id") % 5).alias("v")
    )
    expected = df.select(
        "tb", F.ntile(3).over(W.orderBy(F.col("v"), F.col("tb"))).alias("t")
    )
    actual = exact_ntile(
        df, 3, "v", "tb", buckets=8, out_col="t", tie_subsplit=False
    ).select("tb", "t")
    a = actual.toPandas().sort_values("tb").reset_index(drop=True)
    e = expected.toPandas().sort_values("tb").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, e, check_dtype=False)


def test_quantile_sketch_rank_error_bound(spark, sf_dir):
    """q_quantile_sketch's contract: each reported value's EXACT rank
    (counted with plain filters) is within the GK guarantee
    n/SKETCH_ACCURACY (+1 for the discrete-rank boundary) of the
    requested quantile's target rank, per language group — and the
    value is an actual group member (GK returns samples, never
    interpolations)."""
    import math

    from hive_gateway_spark import registry
    from hive_gateway_spark.operators.ranking import (
        SKETCH_ACCURACY,
        quantile_sketch_raw,
    )
    from hive_gateway_spark.session import load_tables

    d = load_tables(spark, sf_dir)["documents"].select("lang", "n_chars")
    rows = quantile_sketch_raw(spark, sf_dir).collect()
    # the driver-hashable attestation twin must agree: every
    # (lang, pct) verified within the bound by the engine itself
    ver = registry.QUERIES["q_quantile_sketch"](spark, sf_dir).collect()
    assert ver and all(r["within_bound"] == 1 for r in ver)
    assert rows
    pdf = d.toPandas()
    for r in rows:
        grp = pdf[pdf["lang"] == r["lang"]]["n_chars"]
        n = len(grp)
        assert r["n_docs"] == n > 0
        eps = n / SKETCH_ACCURACY + 1
        for p, col in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
            v = r[col]
            assert (grp == v).any(), (r["lang"], col, v)
            rank_lo = int((grp < v).sum())  # ranks occupied below v
            rank_hi = int((grp <= v).sum())
            target = max(1, math.ceil(p * n))
            # v's rank interval [rank_lo+1, rank_hi] must come within
            # eps of the target rank
            assert rank_lo + 1 - eps <= target <= rank_hi + eps, (
                r["lang"],
                col,
                v,
                (rank_lo + 1, rank_hi),
                target,
            )


_STATES = ("view", "click", "purchase")


@given(events_strategy, st.floats(min_value=0.0, max_value=1.0))
@settings(max_examples=12, deadline=None)
def test_scd2_incremental_equals_full_for_any_split(spark_global, rows, frac):
    """For ANY split point, applying the post-split batch to the
    pre-split SCD2 history equals one build over everything — the CDC
    merge invariant under random event streams (duplicate timestamps,
    users only-before / only-after / spanning the split, empty halves)."""
    from hive_gateway_spark.operators.advanced import (
        _scd2_build,
        scd2_apply,
    )

    spark = spark_global
    df = _df(spark, rows).select(
        "user_id",
        "ts",
        "event_id",
        (F.col("value").cast("int") % len(_STATES)).alias("si"),
    )
    states = F.array(*[F.lit(s) for s in _STATES])
    ev = df.select(
        "user_id", "ts", "event_id", states[F.col("si")].alias("event_type")
    )
    ts_all = sorted(r["ts"] for r in ev.select("ts").collect())
    cut = ts_all[min(int(frac * len(ts_all)), len(ts_all) - 1)]
    split = F.lit(cut)
    old, new = ev.filter(F.col("ts") < split), ev.filter(F.col("ts") >= split)
    full = sorted(map(tuple, _scd2_build(ev).collect()))
    inc = sorted(map(tuple, scd2_apply(_scd2_build(old), new).collect()))
    assert full == inc


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1023),
            st.integers(min_value=0, max_value=1023),
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=25, deadline=None)
def test_zorder_interleave_matches_python_reference(pairs):
    """The shared SQL interleave generator (one text for both engines)
    must equal a pure-python Morton encode on random cell coordinates —
    evaluated via DuckDB (no JVM needed), pinning the generator itself
    rather than fixture data."""
    import duckdb

    from hive_gateway_spark.operators.advanced import (
        ZORDER_BITS,
        _z_interleave_sql,
    )

    def ref(x: int, y: int) -> int:
        z = 0
        for i in range(ZORDER_BITS):
            z |= ((x >> i) & 1) << (2 * i + 1)
            z |= ((y >> i) & 1) << (2 * i)
        return z

    con = duckdb.connect()
    values = ", ".join(f"({x}, {y})" for x, y in pairs)
    rows = con.execute(
        f"SELECT x, y, {_z_interleave_sql('x', 'y')} AS z "
        f"FROM (VALUES {values}) t(x, y)"
    ).fetchall()
    for x, y, z in rows:
        assert z == ref(x, y), (x, y, z)


# --- delete_dataset model check (r14: the review showed the NULL path
# was untested; this pins the whole delete semantics against a pandas
# model under random data, random ranges and random column choice) ---

_del_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=60),  # key (dup-able)
        st.one_of(st.none(), st.integers(min_value=-50, max_value=50)),
    ),
    min_size=4,
    max_size=40,
)


@given(
    _del_rows,
    st.lists(
        st.tuples(
            st.sampled_from(["key", "score"]),
            st.integers(min_value=-60, max_value=60),
            st.integers(min_value=0, max_value=60),
        ),
        min_size=1,
        max_size=3,
    ),
)
@settings(max_examples=10, deadline=None)
def test_delete_dataset_matches_pandas_model(spark, tmp_path_factory, rows, deletes):
    """delete_dataset == the pandas model `keep rows where NOT
    (lo <= col <= hi)`, with NULLs never matching, over random row
    sets and random delete sequences on either column — file pruning
    and the conservative no-stats path must never change WHAT is
    deleted, only which files rewrite."""
    import pandas as pd

    from hive_gateway_spark.sources.dataset_export import (
        delete_dataset,
        read_snapshot,
        verify_dataset,
        write_dataset,
    )

    pdf = pd.DataFrame(rows, columns=["key", "score"]).astype(
        {"key": "int64", "score": "Int64"}
    )
    # distinct row ids keep the model alignable under duplicate keys
    pdf["rid"] = range(len(pdf))
    df = spark.createDataFrame(
        [(int(k), None if pd.isna(s) else int(s), int(r))
         for k, s, r in pdf.itertuples(index=False)],
        "key bigint, score bigint, rid bigint",
    ).repartitionByRange(2, "key")
    path = str(tmp_path_factory.mktemp("deltbl") / "t")
    write_dataset(df, path)
    model = pdf
    for col, lo, hi in deletes:
        lo, hi = (lo, hi) if lo <= hi else (hi, lo)
        surviving = ~model[col].between(lo, hi).fillna(False)
        if not surviving.any():
            break  # delete_dataset refuses to empty the table
        delete_dataset(spark, path, col, lo, hi)
        model = model[surviving]
        got = sorted(
            r["rid"] for r in read_snapshot(spark, path).collect()
        )
        assert got == sorted(model["rid"].tolist())
        assert verify_dataset(spark, path)["ok"]


# --- windowFunnel greedy == brute-force definition, WITH ts ties ---
# (the fixture has unique per-user timestamps, so the tie behavior of
# the greedy carries is only exercised here: chain order is the
# engine's total (ts, event_id) order)

_funnel_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),     # user
        st.integers(min_value=0, max_value=20),    # ts (seconds; ties!)
        st.sampled_from(["signup", "click", "purchase", "view"]),
    ),
    min_size=1,
    max_size=40,
)


@given(_funnel_events, st.integers(min_value=1, max_value=12))
@settings(max_examples=12, deadline=None)
def test_window_funnel_greedy_matches_bruteforce(spark, rows, window_s):
    """The one-pass greedy max-start carries must equal the definition
    (exists an ordered chain whose whole span fits the window) on
    random streams — including equal-timestamp events, where 'ordered'
    means the engine's total (ts, event_id) order."""
    import datetime as _dt

    from hive_gateway_spark.operators import advanced as A

    ev = spark.createDataFrame(
        [
            (u, _dt.datetime(2024, 1, 1, 0, 0, ts_s), i, et, 0.0, "{}")
            for i, (u, ts_s, et) in enumerate(rows)
        ],
        "user_id bigint, ts timestamp, event_id bigint, event_type string,"
        " value double, props string",
    )
    w_us = window_s * 1_000_000
    old = A.FUNNEL_WINDOW_US
    A.FUNNEL_WINDOW_US = w_us
    try:
        # engine body on the synthetic frame (bypass load_tables)
        from pyspark.sql import Window as W, functions as F

        us = F.unix_micros(F.col("ts"))
        w = (
            W.partitionBy("user_id")
            .orderBy(F.col("ts").asc(), F.col("event_id").asc())
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        is_type = lambda t: F.col("event_type") == t  # noqa: E731
        s_last = F.max(F.when(is_type("signup"), us)).over(w)
        c2_start = F.when(
            is_type("click") & (us - s_last <= w_us), s_last
        )
        r2 = ev.select(
            "user_id", "ts", "event_id", "event_type",
            us.alias("us"), c2_start.alias("c2_start"),
        )
        c2_best = F.max("c2_start").over(w)
        scored = r2.withColumn(
            "lvl3",
            is_type("purchase") & (F.col("us") - c2_best <= w_us),
        )
        got = {
            r["user_id"]: r["lvl"]
            for r in scored.groupBy("user_id")
            .agg(
                F.max(is_type("signup")).alias("h1"),
                F.max(F.col("c2_start").isNotNull()).alias("h2"),
                F.max("lvl3").alias("h3"),
            )
            .filter(F.col("h1"))
            .select(
                "user_id",
                F.when(F.col("h3"), 3)
                .when(F.col("h2"), 2)
                .otherwise(1)
                .alias("lvl"),
            )
            .collect()
        }
    finally:
        A.FUNNEL_WINDOW_US = old
    # brute force over the engine's total order
    from collections import defaultdict

    per = defaultdict(list)
    for i, (u, ts_s, et) in enumerate(rows):
        per[u].append((ts_s * 1_000_000, i, et))
    want = {}
    w_lim = window_s * 1_000_000
    for u, evs in per.items():
        evs.sort()  # the engine's total (ts, event_id) order
        sign = [(t, k) for t, k, e in evs if e == "signup"]
        if not sign:
            continue
        lvl = 1
        for t1, k1 in sign:
            for t2, k2, e2 in evs:
                if e2 != "click" or (t2, k2) < (t1, k1):
                    continue
                if t2 - t1 <= w_lim:
                    lvl = max(lvl, 2)
                for t3, k3, e3 in evs:
                    if e3 != "purchase" or (t3, k3) < (t2, k2):
                        continue
                    if t3 - t1 <= w_lim:
                        lvl = max(lvl, 3)
        want[u] = lvl
    assert got == want


# --- SCD2 point-in-time lookup: engine carry == DuckDB oracle, WITH
# ts ties --- (ADVICE r14 #2: the fixture pins per-user ts uniqueness,
# so the oracle's (ts, event_id)-aware LATERAL bound — a purchase
# sharing ts with a status flip must match the run the CARRY sees, the
# one whose opener precedes it in total order — is only reachable here)

_scd2_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),    # user
        st.integers(min_value=0, max_value=12),   # ts (seconds; ties!)
        st.sampled_from(["signup", "error", "purchase", "view"]),
    ),
    min_size=1,
    max_size=30,
)


@given(_scd2_events)
@settings(max_examples=12, deadline=None)
def test_dim_lookup_scd2_oracle_agrees_under_ts_ties(spark_global, rows):
    import datetime as _dt

    import duckdb

    from hive_gateway_spark.operators import advanced as A
    from hive_gateway_spark.registry import ORACLES

    spark = spark_global
    data = [
        (i, u, _dt.datetime(2024, 1, 1, 0, 0, ts_s), et)
        for i, (u, ts_s, et) in enumerate(rows)
    ]
    if not any(et == "purchase" for _, _, _, et in data):
        data.append((len(data), 0, _dt.datetime(2024, 1, 1, 0, 0, 5), "purchase"))
    ev = spark.createDataFrame(
        data, "event_id bigint, user_id bigint, ts timestamp, event_type string"
    )
    orig = A.load_tables
    A.load_tables = lambda s, d: {"events": ev}
    try:
        got_df = A.q_dim_lookup_scd2(spark, "ignored").toPandas()
    finally:
        A.load_tables = orig
    got = {
        (r.event_id, r.user_id): (
            None if pd.isna(r.status) else r.status,
            None if pd.isna(r.us_in_status) else int(r.us_in_status),
        )
        for r in got_df.itertuples()
    }
    con = duckdb.connect()
    try:
        pdf = pd.DataFrame(
            data, columns=["event_id", "user_id", "ts", "event_type"]
        )
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        con.register("events", pdf)
        exp_df = con.execute(ORACLES["q_dim_lookup_scd2"]).fetchdf()
    finally:
        con.close()
    exp = {
        (r.event_id, r.user_id): (
            None if pd.isna(r.status) else r.status,
            None if pd.isna(r.us_in_status) else int(r.us_in_status),
        )
        for r in exp_df.itertuples()
    }
    assert got == exp


# --- sequenceCount: the lag-transition closed form == the literal
# greedy state machine, WITH ts ties --- (the engine never iterates;
# this pins the identity the docstring claims, on streams where the
# total (ts, event_id) order does the tie-breaking)

_seq_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),   # user
        st.integers(min_value=0, max_value=10),  # ts (seconds; ties!)
        st.sampled_from(["signup", "purchase", "view"]),
    ),
    min_size=1,
    max_size=40,
)


@given(_seq_events)
@settings(max_examples=12, deadline=None)
def test_sequence_count_closed_form_matches_state_machine(spark_global, rows):
    import datetime as _dt

    from hive_gateway_spark.operators import advanced as A

    spark = spark_global
    data = [
        (i, u, _dt.datetime(2024, 1, 1, 0, 0, ts_s), et)
        for i, (u, ts_s, et) in enumerate(rows)
    ]
    ev = spark.createDataFrame(
        data, "event_id bigint, user_id bigint, ts timestamp, event_type string"
    )
    orig = A.load_tables
    A.load_tables = lambda s, d: {"events": ev}
    try:
        got = {
            r["user_id"]: r["n_chains"]
            for r in A.q_sequence_count(spark, "ignored").collect()
        }
    finally:
        A.load_tables = orig
    # literal greedy state machine over the engine's total order
    from collections import defaultdict

    per = defaultdict(list)
    for i, (u, ts_s, et) in enumerate(rows):
        if et in ("signup", "purchase"):
            per[u].append((ts_s, i, et))
    want = {}
    for u, evs in per.items():
        evs.sort()
        cnt, have = 0, False
        for _t, _i, et in evs:
            if et == "signup" and not have:
                have = True
            elif et == "purchase" and have:
                cnt += 1
                have = False
        want[u] = cnt
    assert got == want


# --- nearest as-of: engine two-carry pass == DuckDB argmin oracle,
# WITH ts ties and equal-distance ties --- (the fixture's per-user ts
# uniqueness can exercise neither the same-ts frame bound nor the
# backward-preference tie rule)

_near_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),   # user
        st.integers(min_value=0, max_value=8),   # ts (seconds; ties and
                                                 # symmetric distances!)
        st.sampled_from(["signup", "view"]),
    ),
    min_size=1,
    max_size=30,
)


@given(_near_events)
@settings(max_examples=12, deadline=None)
def test_asof_nearest_matches_oracle_under_ties(spark_global, rows):
    import datetime as _dt

    import duckdb

    from hive_gateway_spark.operators import advanced as A
    from hive_gateway_spark.registry import ORACLES

    spark = spark_global
    data = [
        (i, u, _dt.datetime(2024, 1, 1, 0, 0, ts_s), et)
        for i, (u, ts_s, et) in enumerate(rows)
    ]
    ev = spark.createDataFrame(
        data, "event_id bigint, user_id bigint, ts timestamp, event_type string"
    )
    orig = A.load_tables
    A.load_tables = lambda s, d: {"events": ev}
    try:
        got = {
            (r["event_id"], r["user_id"]): r["us_offset"]
            for r in A.q_join_asof_nearest(spark, "ignored").collect()
        }
    finally:
        A.load_tables = orig
    con = duckdb.connect()
    try:
        pdf = pd.DataFrame(
            data, columns=["event_id", "user_id", "ts", "event_type"]
        )
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        con.register("events", pdf)
        exp_df = con.execute(ORACLES["q_join_asof_nearest"]).fetchdf()
    finally:
        con.close()
    exp = {
        (r.event_id, r.user_id): (
            None if pd.isna(r.us_offset) else int(r.us_offset)
        )
        for r in exp_df.itertuples()
    }
    got = {k: (None if v is None else int(v)) for k, v in got.items()}
    assert got == exp


# --- CUSUM: prefix-min closed form == the literal max-plus recursion,
# on random integer series (the engine never iterates)

@given(
    st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=60),
    st.integers(min_value=0, max_value=40),
)
@settings(max_examples=50, deadline=None)
def test_cusum_closed_form_matches_recursion(xs, k):
    s, out_rec = 0, []
    for x in xs:
        s = max(0, s + x - k)
        out_rec.append(s)
    pfx, mn, out_cf = 0, 0, []
    for x in xs:
        pfx += x - k
        mn = min(mn, pfx)
        out_cf.append(pfx - min(0, mn))
    assert out_rec == out_cf


def test_token_budget_fill_invariants(spark, sf_dir):
    """The water-fill closed form's contract: allocations sum to the
    budget EXACTLY (total DIV 2), never exceed a cell's supply, and
    are monotone in supply (a bigger cell never receives less)."""
    from hive_gateway_spark import registry
    from hive_gateway_spark.session import load_tables

    rows = registry.QUERIES["q_token_budget_fill"](spark, sf_dir).collect()
    assert rows
    total = sum(r["n_tok"] for r in rows)
    assert sum(r["alloc_tok"] for r in rows) == total // 2
    assert all(0 <= r["alloc_tok"] <= r["n_tok"] for r in rows)
    by_supply = sorted(rows, key=lambda r: (r["n_tok"], r["source"], r["lang"]))
    allocs = [r["alloc_tok"] for r in by_supply]
    # leveled region: allocations differ by at most 1 and only the
    # earlier cells in the total order carry the +1 remainder
    partial = [a for r, a in zip(by_supply, allocs) if a < r["n_tok"]]
    assert all(abs(a - b) <= 1 for a, b in zip(partial, partial[1:]))
