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


def test_priority_window_covers_contract(spark):
    """Every SURVEY §2.2/§2.3 declared-contract query must be
    DRIVER-PROVEN: either inside the current 50-row window, or rotated
    out AFTER earning a hash-green (or declared rows-only) driver row
    in a committed CORRECTNESS_r*.json — the r10 rotation policy
    (registry.PRIORITY's header) that freed the §2.2 tail's slots for
    the never-verified queue. Each PRIORITY name must exist (typo
    guard)."""
    import glob
    import json
    import os

    import __spark_entry__ as e
    from hive_gateway_spark.registry import PRIORITY

    names = list(e.queries())
    missing = [n for n in PRIORITY if n not in names]
    assert not missing, f"PRIORITY names not registered: {missing}"
    window = set(names[:50])
    proven: set = set()
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        with open(path) as f:
            doc = json.load(f)
        for name, row in doc.items():
            if isinstance(row, dict) and (
                row.get("hash_match") or row.get("err") == "no_oracle"
            ):
                proven.add(name)
    contract = {
        "q_scan_project", "q_filter_predicate", "q_expr_string", "q_expr_case",
        "q_expr_coalesce", "q_expr_regex", "q_json_extract", "q_join_broadcast",
        "q_join_left", "q_join_semi", "q_join_anti", "q_join_multiway",
        "q_join_range", "q_agg_group", "q_agg_distinct", "q_agg_having",
        "q_agg_rollup", "q_agg_cube", "q_window_rate_limit", "q_window_rank",
        "q_window_analytic", "q_sessionize", "q_latency_stats",
        "q_sort_limit_topk", "q_set_union", "q_set_intersect", "q_set_except",
        "q_dedup_exact", "q_text_tokenize", "q_text_stats",
        "q_sim_cosine_pairs", "q_sim_topk", "q_dedup_fuzzy", "q_embed_agg",
        "q_text_lang_report",
    }
    out = contract - window - proven
    assert not out, (
        f"contract queries neither in the 50-row window nor holding a "
        f"prior driver row: {out}"
    )


def test_registry_hygiene():
    """Every query has a sane name; every oracle belongs to a registered
    query; PRIORITY has no duplicates."""
    import re

    from hive_gateway_spark import registry

    registry.load_all()
    for name in registry.QUERIES:
        assert re.fullmatch(r"q_[a-z0-9_]+", name), name
    assert set(registry.ORACLES) <= set(registry.QUERIES)
    assert len(registry.PRIORITY) == len(set(registry.PRIORITY))
