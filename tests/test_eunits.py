"""r17 §2.2 — exact bigint e-unit aggregation must be value-identical to
the decimal-sum spelling it replaced (e_units/e_hi/e_lo/e_total/e_double
in operators/relational.py). Adversarial values: negatives, half-up
rounding ties, zeros, magnitudes near the per-row envelope."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hive_gateway_spark.operators.relational import (
    _E_MASK,
    _E_SHIFT,
    dec,
    e_double,
    e_hi,
    e_lo,
    e_total,
    e_units,
)

# doubles whose decimal(18,s) HALF_UP rounding is the tricky part:
# exact ties at every scale, negatives, tiny, and large magnitudes
VALUES = [
    0.0,
    -0.0,
    1.0,
    -1.0,
    0.005,
    -0.005,
    0.015,
    2.675,          # classic binary-representation tie-ish case
    -2.675,
    0.123456789,
    99999.99995,
    -99999.99995,
    123456789.0001,
    1e-7,
    -1e-7,
    104857.6,       # e4 units straddle the 2^20 split boundary
    104857.59995,
]


@pytest.mark.parametrize("scale", [2, 4, 6])
def test_eunit_sum_matches_decimal_sum(spark, scale):
    df = spark.createDataFrame(
        [(i % 3, v) for i, v in enumerate(VALUES)], "g int, x double"
    )
    e = e_units(F.col("x"), scale)
    got = (
        df.groupBy("g")
        .agg(F.sum(e_hi(e)).alias("hi"), F.sum(e_lo(e)).alias("lo"))
        .select("g", e_double(e_total(F.col("hi"), F.col("lo")), scale).alias("s"))
    )
    want = df.groupBy("g").agg(
        F.sum(dec(F.col("x"), scale)).cast("double").alias("s")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


@pytest.mark.parametrize("scale", [2, 4])
def test_single_bigint_sum_matches_decimal_sum(spark, scale):
    df = spark.createDataFrame([(v,) for v in VALUES], "x double")
    got = df.agg(e_double(F.sum(e_units(F.col("x"), scale)), scale)).collect()[0][0]
    want = df.agg(F.sum(dec(F.col("x"), scale)).cast("double")).collect()[0][0]
    assert got == want


def test_split_identity_covers_negatives():
    # v = (v >> 20) * 2^20 + (v & mask) in two's complement — the
    # recombination e_total relies on, checked in plain python
    for v in [0, 1, -1, 2**20, -(2**20), 2**20 + 7, -(2**20) - 7, 123456789, -987654321]:
        assert (v >> _E_SHIFT) * (1 << _E_SHIFT) + (v & _E_MASK) == v


def test_null_and_conditional_sums_preserved(spark):
    # a group whose conditional branch never fires must stay NULL,
    # exactly like the decimal spelling (q_tpcds_q51/q74 rely on it)
    df = spark.createDataFrame(
        [("a", "N", 1.5), ("a", "N", 2.25), ("b", "R", 3.75)],
        "g string, flag string, x double",
    )
    e = e_units(F.col("x"), 4)
    is_n = F.col("flag") == "N"
    got = (
        df.groupBy("g")
        .agg(
            F.sum(F.when(is_n, e_hi(e))).alias("hi"),
            F.sum(F.when(is_n, e_lo(e))).alias("lo"),
        )
        .select("g", e_total(F.col("hi"), F.col("lo")).cast("bigint").alias("n_e4"))
    )
    rows = {r["g"]: r["n_e4"] for r in got.collect()}
    assert rows == {"a": 37500, "b": None}
