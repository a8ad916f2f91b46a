"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The real inventory lives in ``hive_gateway_spark`` (one module per
operator family, SURVEY.md §2.2/§2.3); this file only adapts it to the
driver's interface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hive_gateway_spark import registry  # noqa: E402

registry.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (gateway traffic & admission report) on sf0.001."""
    return registry.QUERIES["q_gateway_pipeline"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, priority-
    ordered (the driver verifies the first 50 — registry.PRIORITY)."""
    return registry.ordered_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; rows-only checks omit their entry."""
    return dict(registry.ORACLES)
