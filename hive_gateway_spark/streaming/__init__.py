"""Structured Streaming twins of the gateway's temporal operators.

The reference is a *streaming* system (an event-loop gateway); its
temporal behaviors map onto Structured Streaming primitives:

- rate limiting (gateway.ts:139-171)    → windowed count + watermark
- in-flight sessions w/ 30 s timeout    → session_window / GroupState
  (gateway.ts:39-43, :56, :318-323)       with timeout
- late/unknown-sn response drop         → watermark late-data policy +
  (gateway.ts:134-136)                    stream-stream join

Tests replay the `events` fixture through a parquet `readStream` with an
availableNow trigger and assert the streaming results equal the batch
twins (SURVEY §5.2).
"""

from hive_gateway_spark.streaming.ops import (
    stream_events,
    stream_rate_limit_counts,
    stream_session_windows,
    stream_correlate,
)

__all__ = [
    "stream_events",
    "stream_rate_limit_counts",
    "stream_session_windows",
    "stream_correlate",
]
