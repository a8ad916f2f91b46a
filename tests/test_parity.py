"""The correctness gate, locally: every registered query with an oracle
must match DuckDB exactly (order-insensitive); rows-only queries must at
least execute and return a stable schema."""

from __future__ import annotations

import pytest

from hive_gateway_spark import registry

registry.load_all()

from tests.parity import assert_parity  # noqa: E402

ORACLE_KEYS = sorted(registry.ORACLES)
ROWS_ONLY_KEYS = sorted(set(registry.QUERIES) - set(registry.ORACLES))


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_oracle_parity(spark, sf_dir, name):
    df = registry.QUERIES[name](spark, sf_dir)
    assert_parity(df, registry.ORACLES[name], sf_dir, name=name)


@pytest.mark.parametrize("name", ROWS_ONLY_KEYS)
def test_rows_only_executes(spark, sf_dir, name):
    df = registry.QUERIES[name](spark, sf_dir)
    n = df.count()
    assert n >= 0
    assert len(df.schema) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    # every queries() key with an oracle is exposed
    assert set(e.oracle_sql()) <= set(e.queries())
