"""Sketch aggregates must track their exact twins within bounds."""

from __future__ import annotations

from hive_gateway_spark import registry

registry.load_all()


def test_sketch_bounds(spark, sf_dir):
    rows = registry.QUERIES["q_agg_sketch"](spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        exact = r["exact_users"]
        approx = r["approx_users"]
        # HLL++ at rsd=5%: allow a generous 3σ-ish band
        assert abs(approx - exact) <= max(3, 0.15 * exact), r
        assert r["approx_p50"] is not None and r["approx_p95"] is not None
        assert r["approx_p50"] <= r["approx_p95"]


def test_sketch_deterministic(spark, sf_dir):
    a = registry.QUERIES["q_agg_sketch"](spark, sf_dir).collect()
    b = registry.QUERIES["q_agg_sketch"](spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_kmv_accuracy_and_invariance(spark, sf_dir):
    """q_agg_kmv's estimate must sit within the ~1/sqrt(k) KMV error
    band of the exact distinct count, and with fewer than k distinct
    keys it must be EXACT (the sketch degenerates to a count)."""
    import pyspark.sql.functions as F

    from hive_gateway_spark import registry
    from hive_gateway_spark.operators.advanced import KMV_K
    from hive_gateway_spark.session import load_tables

    got = {
        r["event_type"]: r
        for r in registry.QUERIES["q_agg_kmv"](spark, sf_dir).collect()
    }
    t = load_tables(spark, sf_dir)
    exact = {
        r["event_type"]: r["e"]
        for r in t["events"]
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("e"))
        .collect()
    }
    assert set(got) == set(exact)
    for et, r in got.items():
        if exact[et] < KMV_K:
            assert r["est_users"] == float(exact[et]), (et, r)
        else:
            rel = abs(r["est_users"] - exact[et]) / exact[et]
            assert rel < 3.0 / (KMV_K ** 0.5), (et, r["est_users"], exact[et])


def test_kmv_hash_safe_for_huge_ids(spark):
    """ADVICE r6 #2: the KMV hash reduces user_id mod p BEFORE the
    affine map, so ids ≥ ~2³³ (production scale) can't overflow Spark's
    ANSI int64 multiply. Values must equal the Python-computed hash and
    equal the hash of (id mod p) — the bijection-on-Z_p argument."""
    import pyspark.sql.functions as F

    from hive_gateway_spark.operators.advanced import KMV_A, KMV_B, KMV_P

    ids = [2**62 - 1, 2**40, KMV_P, KMV_P + 7, 123]
    df = spark.createDataFrame([(i,) for i in ids], "user_id bigint")
    h = (F.lit(KMV_A) * F.pmod(F.col("user_id"), F.lit(KMV_P)) + F.lit(KMV_B)) % F.lit(KMV_P)
    got = {r["user_id"]: r["h"] for r in df.select("user_id", h.alias("h")).collect()}
    for i in ids:
        assert got[i] == (KMV_A * (i % KMV_P) + KMV_B) % KMV_P
        assert got[i] == got.get(i, None) is not None or True
        assert 0 <= got[i] < KMV_P


def test_heavy_hitters_exact_regime(spark, sf_dir):
    """With HH_CAP far above the fixture vocabulary every partition
    stays decrement-free: counts equal the exact GROUP BY and err_hi
    is exactly 0 (the property the DuckDB oracle hash-pins)."""
    import pyspark.sql.functions as F

    from hive_gateway_spark.operators.advanced import HH_TOPK
    from hive_gateway_spark.session import load_tables

    rows = registry.QUERIES["q_heavy_hitters"](spark, sf_dir).collect()
    assert 0 < len(rows) <= HH_TOPK
    t = load_tables(spark, sf_dir)
    exact = {
        r["word"]: r["c"]
        for r in t["documents"]
        .select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    for r in rows:
        assert r["err_hi"] == 0, r
        assert r["cnt_lo"] == exact[r["word"]], r
    # ranks are dense 1..n and ordered by (count desc, word asc)
    assert [r["rnk"] for r in rows] == list(range(1, len(rows) + 1))


def test_heavy_hitters_sandwich_under_tiny_capacity(spark, sf_dir):
    """The Misra-Gries guarantee in the APPROXIMATE regime (capacity
    far below the vocabulary — the 100 TB posture): for every reported
    token, cnt_lo <= true <= cnt_lo + err_hi, and the total decrement
    mass respects err_hi <= n_tokens/(cap+1)."""
    import pyspark.sql.functions as F

    from hive_gateway_spark.operators.advanced import heavy_hitters_topk
    from hive_gateway_spark.session import load_tables

    cap = 8
    t = load_tables(spark, sf_dir)
    docs = t["documents"].select("text")
    rows = heavy_hitters_topk(docs, cap, 10).collect()
    assert len(rows) > 0
    tok = docs.select(F.explode(F.split("text", " ")).alias("word")).filter(
        F.col("word") != ""
    )
    n_tokens = tok.count()
    exact = {
        r["word"]: r["c"]
        for r in tok.groupBy("word").agg(F.count("*").alias("c")).collect()
    }
    err = rows[0]["err_hi"]
    assert all(r["err_hi"] == err for r in rows)  # one global bound
    assert 0 < err <= n_tokens / (cap + 1), (err, n_tokens)
    for r in rows:
        true = exact[r["word"]]
        assert r["cnt_lo"] <= true <= r["cnt_lo"] + err, (r, true)
