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
