from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

# ---------------------------------------------------------------------------
# Fast default tier (r17, VERDICT r16 task #1): the full suite outgrew
# the driver's verify window (42 min; VERIFY_r16 truncated mid-run at
# ~94% with no summary line, so the suite was effectively unverified).
# The default `pytest tests/` run now SKIPS the slow tier — the whole
# streaming-equivalence module (~24 min of availableNow micro-batch
# runs) plus the individually-heaviest tests below (≥ ~7 s each,
# measured in the r17 round-open full run) — keeping the default tier
# under ~10 min WITH a visible summary line. The slow tier still runs:
#   HGW_SLOW=1 python -m pytest tests/        (or --runslow)
# and is executed locally every optimization/build round before close.
# Skips are reported (not deselected) so the driver artifact shows
# exactly what ran.
# ---------------------------------------------------------------------------

#: test ids (bare names / parametrized ids) in the slow tier. Measured
#: call times from the r17 round-open run are noted for the audit.
SLOW_NAMES = {
    # parity monsters (full curation pipelines, 36-58 s each)
    "test_oracle_parity[q_curation_v4_funnel]",
    "test_oracle_parity[q_curation_v4]",
    "test_oracle_parity[q_curation_v5_trace]",
    "test_oracle_parity[q_curation_v5_funnel]",
    "test_oracle_parity[q_curation_v5]",
    "test_oracle_parity[q_retrieval_mmr]",       # 17 s
    "test_oracle_parity[q_dedup_canonical]",     # 8 s
    "test_rows_only_executes[q_sim_topk_ivfpq]", # 9 s
    # catalyst / properties / io (10-40 s each)
    "test_codec_identity_rule_fires_in_optimized_plan",
    "test_scd2_incremental_equals_full_for_any_split",
    "test_delete_dataset_matches_pandas_model",
    "test_msgpack_roundtrip",
    "test_curation_funnel_is_a_partition_of_the_corpus",
    # similarity: recall/drift/rebuild studies (10-18 s each)
    "test_ivfpq_recall_and_exact_sims",
    "test_ivf_append_drift_monitor_fires_before_recall_decays",
    "test_maybe_rebuild_refuses_when_corpus_behind_index",
    "test_maybe_rebuild_ivf_fires_and_improves",
    "test_ndcg_bounds_and_consistency_with_recall",
    "test_pq_adc_topk_recall",
    "test_ivf_index_incremental_append",
    # bpe / dedup / corpus / pipeline (6-9 s each)
    "test_roundtrip_identity",
    "test_hand_checked_merge_sequence",
    "test_connected_components_chain_star_multi",
    "test_cc_local_equals_distributed",
    "test_curation_v4_funnel_trace_equality",
    "test_curation_v4_shingle_width_knob",
    "test_v5_chain_equals_curation_v5",
    "test_v4_chain_equals_curation_v4",
    "test_bucketed_join_has_no_exchange",
    "test_warc_datasource_reads_files",
    "test_apply_diff_replicates_and_is_replay_safe",
    "test_check_constraints_enforced_across_verbs",
}

#: whole modules in the slow tier.
SLOW_MODULES = {"test_streaming.py"}


def pytest_addoption(parser):
    parser.addoption(
        "--runslow",
        action="store_true",
        default=False,
        help="run the slow tier (streaming equivalence + heavy studies)",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get("HGW_SLOW"):
        return
    skip = pytest.mark.skip(
        reason="slow tier — run with --runslow or HGW_SLOW=1"
    )
    for item in items:
        if (
            item.fspath.basename in SLOW_MODULES
            or item.name in SLOW_NAMES
            or "slow" in item.keywords
        ):
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    from hive_gateway_spark import registry
    from hive_gateway_spark.session import get_spark

    registry.load_all()
    s = get_spark("hive-gateway-spark-tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
