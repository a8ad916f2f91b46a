"""Local stand-in for the driver's DuckDB-oracle comparison:
row count + schema width + order-insensitive exact values."""

from __future__ import annotations

import duckdb
import pandas as pd

from hive_gateway_spark.session import TABLES


def duck_df(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Column-name order + µs timestamps + row sort = order-insensitive form."""
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif s.dtype == object and len(s) and isinstance(s.dropna().iloc[0] if s.dropna().size else None, bool):
            df[c] = s.astype("boolean")
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first")
    return df.reset_index(drop=True)


def assert_parity(spark_df, oracle_sql: str, sf_dir: str, name: str = "") -> None:
    actual = canon(spark_df.toPandas())
    expected = canon(duck_df(oracle_sql, sf_dir))
    # Non-vacuity gate (r11 zero-row audit): a 0 = 0 row compare is
    # trivially hash-green and verifies NOTHING — q_tpch_q8 shipped
    # with a literal that didn't exist in the fixture and
    # q_dedup_normalized / q_tpch_q22 had no qualifying fixture rows
    # at sf0.01 until evidence was planted. Every oracled query must
    # produce at least one row at every test scale.
    assert len(actual) > 0, f"{name}: VACUOUS — 0 rows from both engines"
    assert len(actual) == len(expected), (
        f"{name}: row count {len(actual)} != oracle {len(expected)}"
    )
    assert list(actual.columns) == list(expected.columns), (
        f"{name}: columns {list(actual.columns)} != oracle {list(expected.columns)}"
    )
    # dtype-kind parity: the driver hashes values dtype-sensitively, so an
    # int64 Spark column vs a float64 oracle column (e.g. DuckDB windowed
    # SUM → HUGEINT → float64) hash-mismatches even when every value is
    # equal. Catch that class locally. 'i'/'u' are interchangeable ints.
    kind = lambda s: "i" if s.dtype.kind in "iu" else s.dtype.kind  # noqa: E731
    drift = {
        c: (actual[c].dtype, expected[c].dtype)
        for c in actual.columns
        if kind(actual[c]) != kind(expected[c])
    }
    assert not drift, f"{name}: dtype drift (spark, oracle): {drift}"
    pd.testing.assert_frame_equal(
        actual, expected, check_dtype=False, check_exact=True, obj=name or "parity"
    )
