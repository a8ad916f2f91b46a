"""The fluent CurationPipeline facade must add ZERO semantics: its
default chain reproduces q_curation_v3's selection exactly, and its
export round-trips through the self-certifying manifest."""

from __future__ import annotations

from hive_gateway_spark import registry
from hive_gateway_spark.pipeline import CurationPipeline

registry.load_all()


def test_default_chain_equals_curation_v3(spark, sf_dir):
    from hive_gateway_spark.operators.corpus import (
        V3_GATE_MAX,
        V3_GATE_MIN,
        V3_TOP,
    )

    out = (
        CurationPipeline(spark)
        .read_parquet(sf_dir)
        .remove_boilerplate()
        .gate_tokens(V3_GATE_MIN, V3_GATE_MAX)
        .dedup_exact()
        .drop_span_duplicates(0.6)
        .select_dsir(top=V3_TOP)
        .run()
        .collect()
    )
    v3 = registry.QUERIES["q_curation_v3"](spark, sf_dir).collect()
    assert {r["doc_id"] for r in out} == {r["doc_id"] for r in v3}
    lw_api = {r["doc_id"]: r["logw"] for r in out}
    for r in v3:
        assert lw_api[r["doc_id"]] == r["logw"]  # exact, not approx


def test_pipeline_export_verifies(spark, sf_dir, tmp_path):
    from hive_gateway_spark.sources.dataset_export import verify_dataset

    p = (
        CurationPipeline(spark)
        .read_parquet(sf_dir)
        .gate_tokens(10, 512)
        .dedup_exact()
    )
    manifest = p.export(str(tmp_path / "ds"), partition_by=["lang"])
    assert manifest["n_rows"] == p.run().count()
    assert verify_dataset(spark, str(tmp_path / "ds"))["ok"]
    assert p.stages == ["gate_tokens", "dedup_exact"]


def test_pipeline_requires_source(spark):
    import pytest

    with pytest.raises(ValueError, match="no source"):
        CurationPipeline(spark).gate_tokens(1, 10).run()
