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

import sys as _sys

# Ship this package to executors BY VALUE: the driver process (which may
# run from any cwd, e.g. the verification harness) is the only place the
# package is importable, so module-level pandas UDFs and their helpers
# must serialize self-contained instead of by module reference.
# (Registering the package covers all submodules — cloudpickle matches
# on the module-name prefix. PySpark uses its VENDORED cloudpickle, so
# register there; also register with the standalone one if present.)
from pyspark import cloudpickle as _spark_cloudpickle

_spark_cloudpickle.register_pickle_by_value(_sys.modules[__name__])
try:
    import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(_sys.modules[__name__])
except ImportError:  # pragma: no cover
    pass

from hive_gateway_spark.session import get_spark, load_tables  # noqa: E402
from hive_gateway_spark.registry import QUERIES, ORACLES, query  # noqa: E402

__all__ = ["get_spark", "load_tables", "QUERIES", "ORACLES", "query"]
