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


def test_pipeline_append_commits_next_version(spark, sf_dir, tmp_path):
    """The daily-batch form: the same stage chain curates a second
    batch and append_to() commits it as manifest version 2; verify
    stays green and time travel still reads version 1 alone."""
    from hive_gateway_spark.sources.dataset_export import (
        read_snapshot,
        verify_dataset,
    )

    path = str(tmp_path / "dsa")
    day1 = CurationPipeline(spark).read_parquet(sf_dir).gate_tokens(10, 512)
    m1 = day1.export(path, partition_by=["lang"])

    from hive_gateway_spark.session import load_tables
    from pyspark.sql import functions as F

    batch2 = (
        load_tables(spark, sf_dir)["documents"]
        .withColumn("doc_id", F.col("doc_id") + 1_000_000)  # fresh ids
        .limit(50)
    )
    m2 = CurationPipeline(spark).from_frame(batch2).gate_tokens(10, 512).append_to(path)
    assert m2["version"] == 2 and m2["n_rows"] > m1["n_rows"]
    assert verify_dataset(spark, path)["ok"]
    assert read_snapshot(spark, path, 1).count() == m1["n_rows"]


def test_v4_chain_equals_curation_v4(spark, sf_dir):
    """The facade's v4 recipe chain must reproduce q_curation_v4's
    manifest exactly (same selected docs, weights, splits, shards,
    bins) when fed the same augmented corpus — the facade adds zero
    semantics over the registered pipeline."""
    from hive_gateway_spark.operators.corpus import _V4_PLANTED, V4_STOPS, V4_TOP
    from hive_gateway_spark.pipeline import CurationPipeline
    from hive_gateway_spark.registry import QUERIES
    from hive_gateway_spark.session import load_tables

    docs = load_tables(spark, sf_dir)["documents"].select("doc_id", "lang", "text")
    planted = spark.createDataFrame(
        _V4_PLANTED, "doc_id bigint, lang string, text string"
    )
    corpus = docs.unionByName(planted)
    out = (
        CurationPipeline(spark)
        .from_frame(corpus)
        .gate_gopher(stops=V4_STOPS)
        # benchmark shingles from the UNGATED corpus — a benchmark doc
        # the Gopher gate drops must still protect against its
        # near-dups (matches q_curation_v4's scope exactly)
        .decontaminate(bench_corpus=corpus)
        .cut_perplexity_tail()
        .dedup_normalized()
        .drop_span_duplicates(0.6)
        .select_dsir(top=V4_TOP)
        .split_pack()
        .run()
    )
    cols = ["doc_id", "lang", "logw", "split", "shard", "bin"]
    facade = sorted(tuple(r[c] for c in cols) for r in out.select(*cols).collect())
    v4 = sorted(
        tuple(r[c] for c in cols)
        for r in QUERIES["q_curation_v4"](spark, sf_dir).select(*cols).collect()
    )
    assert facade == v4 and len(facade) > 0


def test_gate_quality_matches_classifier(spark, sf_dir):
    """gate_quality keeps exactly the docs the registered classifier
    scores above the threshold — the facade adds zero semantics."""
    from hive_gateway_spark.session import load_tables

    docs = load_tables(spark, sf_dir)["documents"]
    got = {
        r["doc_id"]
        for r in CurationPipeline(spark)
        .from_frame(docs)
        .gate_quality(0.0)
        .run()
        .select("doc_id")
        .collect()
    }
    expected = {
        r["doc_id"]
        for r in registry.QUERIES["q_quality_classifier"](
            spark, sf_dir
        ).collect()
        if r["quality_score"] > 0.0
    }
    assert got == expected
    assert 0 < len(got)


def test_v5_chain_equals_curation_v5(spark, sf_dir):
    """The facade's v5 chain — the verified v4 recipe chain with
    gate_quality(0.0) appended AFTER split_pack (the manifest gate
    position: bins stay v4's; the gate only filters rows) — must
    reproduce q_curation_v5's manifest exactly."""
    from hive_gateway_spark.operators.corpus import _V4_PLANTED, V4_STOPS, V4_TOP
    from hive_gateway_spark.pipeline import CurationPipeline
    from hive_gateway_spark.registry import QUERIES
    from hive_gateway_spark.session import load_tables

    docs = load_tables(spark, sf_dir)["documents"].select("doc_id", "lang", "text")
    planted = spark.createDataFrame(
        _V4_PLANTED, "doc_id bigint, lang string, text string"
    )
    corpus = docs.unionByName(planted)
    out = (
        CurationPipeline(spark)
        .from_frame(corpus)
        .gate_gopher(stops=V4_STOPS)
        .decontaminate(bench_corpus=corpus)
        .cut_perplexity_tail()
        .dedup_normalized()
        .drop_span_duplicates(0.6)
        .select_dsir(top=V4_TOP)
        .split_pack()
        .gate_quality(0.0)
        .run()
    )
    cols = ["doc_id", "lang", "logw", "split", "shard", "bin"]
    facade = sorted(tuple(r[c] for c in cols) for r in out.select(*cols).collect())
    v5 = sorted(
        tuple(r[c] for c in cols)
        for r in QUERIES["q_curation_v5"](spark, sf_dir).select(*cols).collect()
    )
    assert facade == v5 and len(facade) > 0
