"""hive_gateway_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference
``titan/hive-gateway`` (an msgpack-RPC API gateway; see SURVEY.md) as a
Spark-first analytics engine: the gateway's behaviors are recast as
relational/streaming dataflow operators (routing = broadcast dim join,
rate limiting = tumbling-window admission, auth = lookup joins,
request/response correlation = stateful sessionization), plus the
LLM-data-pipeline operator suite (dedup, similarity search, multimodal
columns, text analysis) mandated by BASELINE.json — all designed for
100 TB scale: declarative DataFrame plans, broadcast dimension joins,
partial aggregation, no driver-side loops.

Public surface:
    get_spark / load_tables   — session + fixture catalog (session.py)
    QUERIES / ORACLES         — the driver-verified operator inventory
                                (registry.py; populated by importing
                                hive_gateway_spark.operators)
"""

from hive_gateway_spark.session import get_spark, load_tables
from hive_gateway_spark.registry import QUERIES, ORACLES, query

__all__ = ["get_spark", "load_tables", "QUERIES", "ORACLES", "query"]
