"""Sources & sinks — the engine's connector layer.

Reference parity (SURVEY §2.1): O2 log sink → partitioned parquet with
retention (log_sink.py); O3 Redis KV → dimension snapshots + foreachBatch
KV writer (kv.py); O17 HTTP ingest / O6 nanomsg → Structured Streaming
sources (hive_gateway_spark.streaming). File formats (parquet/csv/json)
come from Spark's DataSource V2 and are exercised in tests/test_io.py,
including bucketed tables for shuffle-free co-located joins.
"""
