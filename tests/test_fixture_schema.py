"""Fixture-dtype smoke test — fails loudly on schema drift.

The driver regenerates /root/testdata parquet between rounds; the
physical encoding of timestamp columns has already drifted twice
(int64 nanos → TIMESTAMP_NTZ). ``session.load_tables`` normalizes all
variants in ``_normalize_timestamps``; this test asserts the POST-load
dtypes every operator assumes, so any future drift breaks here with a
clear message instead of deep inside a window query.
"""
from __future__ import annotations

import pyspark.sql.functions as F

from hive_gateway_spark.session import load_tables

# column → expected post-load dtype, per table (subset that operators
# depend on structurally; extra columns are allowed).
EXPECTED = {
    "events": {"ts": "timestamp", "user_id": "bigint"},
    "orders": {"o_orderkey": "bigint", "o_orderdate": "timestamp"},
    "lineitem": {"l_orderkey": "bigint", "l_shipdate": "timestamp"},
    "documents": {"doc_id": "bigint", "text": "string"},
    "embeddings": {"vec_id": "bigint", "embedding": "array<float>"},
}


def test_post_load_dtypes(spark, sf_dir):
    tables = load_tables(spark, sf_dir)
    problems = []
    for name, cols in EXPECTED.items():
        dtypes = dict(tables[name].dtypes)
        for col, want in cols.items():
            got = dtypes.get(col)
            if got != want:
                problems.append(f"{name}.{col}: expected {want!r}, got {got!r}")
    assert not problems, (
        "fixture dtype drift after load_tables normalization:\n  "
        + "\n  ".join(problems)
        + "\nfix hive_gateway_spark/session.py:_normalize_timestamps"
    )


def test_no_ntz_anywhere(spark, sf_dir):
    """No table may expose TIMESTAMP_NTZ post-load (unix_micros rejects it)."""
    tables = load_tables(spark, sf_dir)
    offenders = [
        f"{name}.{col}"
        for name, df in tables.items()
        for col, dtype in df.dtypes
        if "ntz" in dtype
    ]
    assert not offenders, f"timestamp_ntz leaked through load_tables: {offenders}"


def test_events_ts_is_usable(spark, sf_dir):
    """unix_micros(ts) must evaluate — the exact call that broke round 5."""
    events = load_tables(spark, sf_dir)["events"]
    row = events.select(F.unix_micros("ts").alias("us")).limit(1).collect()
    assert row and row[0]["us"] is not None


def test_events_ts_unique_per_user(spark, sf_dir):
    """ADVICE r13 #2: q_join_asof's oracle (DuckDB native ASOF JOIN,
    s.ts <= e.ts) admits a same-(user, ts) signup with a LARGER
    event_id that the engine's (ts, event_id)-bounded window frame
    cannot see. q_join_asof_tolerance's LATERAL carries an explicit
    tie-break; the native ASOF cannot express one, so the oracle's
    correctness RELIES on per-user timestamp uniqueness — assert it,
    so a fixture regeneration that introduces ties fails HERE with a
    message instead of as an inscrutable hash mismatch."""
    dup = (
        load_tables(spark, sf_dir)["events"]
        .groupBy("user_id", "ts")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dup == 0, (
        f"{dup} (user_id, ts) duplicate groups in events — q_join_asof's "
        "ASOF-JOIN oracle assumes per-user ts uniqueness (see docstring)"
    )
