"""Streaming twins must equal their batch counterparts when the fixture
stream is drained with an availableNow trigger (SURVEY §5.2)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from hive_gateway_spark import registry
from hive_gateway_spark.session import load_tables
from hive_gateway_spark.streaming import (
    stream_events,
    stream_rate_limit_counts,
    stream_session_windows,
    stream_correlate,
)
from hive_gateway_spark.streaming.ops import (
    SESSION_GAP,
    split_request_response,
    stream_admission,
)

registry.load_all()


def drain(stream_df, name: str, mode: str = "append") -> pd.DataFrame:
    """availableNow → memory sink → pandas.

    Aggregations drain in `complete` mode so windows still open at
    end-of-stream (the final fixture day — the watermark never passes
    them) are included; production uses append + watermark eviction.
    """
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    spark = stream_df.sparkSession
    return spark.table(name).toPandas()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns), na_position="first").reset_index(drop=True)


def assert_same(a: pd.DataFrame, b: pd.DataFrame):
    a, b = _canon(a), _canon(b)
    assert len(a) == len(b), f"{len(a)} != {len(b)} rows"
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)


def test_stream_rate_limit_equals_batch(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    got = drain(stream_rate_limit_counts(stream_events(spark, sf_dir)), "s_rl", mode="complete")
    want = (
        t["events"]
        .groupBy(F.window("ts", "1 day").alias("win"), "user_id")
        .agg(F.count("*").alias("n_calls"))
        .select(
            F.col("win.start").alias("window_start"),
            "user_id",
            "n_calls",
            (F.col("n_calls") > 10).alias("throttled"),
        )
        .toPandas()
    )
    assert len(got) > 0
    assert_same(got, want)


def test_stream_sessions_equal_batch_session_window(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    got = drain(stream_session_windows(stream_events(spark, sf_dir)), "s_sess", mode="complete")
    want = (
        t["events"]
        .groupBy(F.session_window("ts", SESSION_GAP).alias("sw"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
                "session_value"
            ),
        )
        .select(
            "user_id",
            F.date_trunc("second", F.col("sw.start")).alias("session_start"),
            "n_events",
            "session_value",
        )
        .toPandas()
    )
    assert len(got) > 0
    assert_same(got, want)


def test_stream_sessions_equal_lag_based_sessionize(spark, sf_dir):
    """The built-in session_window and the batch lag/cumsum sessionizer
    (q_sessionize) must agree on the session partitioning."""
    got = drain(stream_session_windows(stream_events(spark, sf_dir)), "s_sess2", mode="complete")
    batch = registry.QUERIES["q_sessionize"](spark, sf_dir).toPandas()
    a = got[["user_id", "n_events", "session_value"]]
    b = batch[["user_id", "n_events", "session_value"]]
    assert_same(a, b)


def test_stream_admission_equals_batch_rate_limit(spark, sf_dir):
    """The applyInPandasWithState admission operator must reproduce the
    batch row_number()-based admission exactly."""
    from hive_gateway_spark.operators.windows import RATE_LIMIT_N

    got = drain(
        stream_admission(stream_events(spark, sf_dir), limit=RATE_LIMIT_N), "s_adm"
    )
    want = registry.QUERIES["q_window_rate_limit"](spark, sf_dir).toPandas()
    assert len(got) > 0
    assert got["admitted"].dtype == bool or got["admitted"].notna().all()
    assert_same(got, want)


def test_stream_correlate_equals_batch_join(spark, sf_dir):
    """Watermarked stream-stream sn join == the same join in batch; the
    time bound drops late responses (ref gateway.ts:134-136)."""
    t = load_tables(spark, sf_dir)
    sreq, sresp = split_request_response(stream_events(spark, sf_dir))
    got = drain(stream_correlate(sreq, sresp, timeout="30 minutes"), "s_corr")
    breq, bresp = split_request_response(t["events"])
    want = stream_correlate(breq, bresp, timeout="30 minutes").toPandas()
    assert len(got) > 0, "no correlated pairs — fixture assumptions broke"
    assert_same(got, want)
    # every latency respects the bound, and unknown sns were dropped
    assert (got["latency_us"] <= 30 * 60 * 1_000_000).all()
    assert (got["latency_us"] >= 0).all()
