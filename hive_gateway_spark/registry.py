"""Query registry — the driver-verified operator inventory.

Every operator in SURVEY.md §2.2/§2.3 registers itself here via the
``@query`` decorator; ``__spark_entry__.queries()`` / ``oracle_sql()``
just expose these dicts. A query with ``oracle=None`` is a deliberate
rows-only check (non-SQL-expressible op — LSH, UDF-backed binary ops);
everything else carries an ANSI-SQL DuckDB oracle and must hash-match.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as queries()[name]; optionally its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import all operator modules so their @query registrations run."""
    from hive_gateway_spark import operators  # noqa: F401

    operators.load_all()
