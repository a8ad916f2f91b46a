"""User-facing curation pipeline builder — the fluent API a team
migrating from the reference (or from a hand-rolled script stack)
composes instead of wiring operators by hand:

    from hive_gateway_spark.pipeline import CurationPipeline

    selected = (
        CurationPipeline(spark)
        .read_parquet("/data/corpus")       # or .from_frame(docs_df)
        .remove_boilerplate()
        .gate_tokens(5, 512)
        .dedup_exact()
        .drop_span_duplicates(0.6)
        .select_dsir(top=200)
        .run()                              # → DataFrame
    )
    pipeline.export("/data/corpus_v3", partition_by=["lang"])

Every stage delegates to the SAME verified core the corresponding
registered query uses (operators/corpus.py), so the facade adds zero
new semantics — the default chain reproduces q_curation_v3's
selection exactly (tests/test_pipeline.py pins it). Stages are
composable in any order; each is a docs-frame → docs-frame transform
over the (doc_id, lang, text) shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from hive_gateway_spark.operators.corpus import (
    boilerplate_report,
    dsir_report,
    substring_report,
)

Stage = Callable[[DataFrame], DataFrame]


class CurationPipeline:
    def __init__(self, spark: SparkSession):
        self._spark = spark
        self._source: DataFrame | None = None
        self._stages: list[tuple[str, Stage]] = []
        self._result: DataFrame | None = None

    # ------------------------------------------------------------ sources

    def read_parquet(self, sf_dir: str) -> "CurationPipeline":
        """Load the documents table from an sf-dir layout."""
        from hive_gateway_spark.session import load_tables

        self._source = load_tables(self._spark, sf_dir)["documents"]
        return self

    def from_frame(self, docs: DataFrame) -> "CurationPipeline":
        """Start from any frame with (doc_id, lang, text)."""
        self._source = docs
        return self

    # ------------------------------------------------------------- stages

    def _add(self, name: str, fn: Stage) -> "CurationPipeline":
        self._stages.append((name, fn))
        return self

    def remove_boilerplate(self) -> "CurationPipeline":
        """Cut recurring chunks and rebuild each doc
        (q_boilerplate_chunks' core)."""

        def stage(docs: DataFrame) -> DataFrame:
            rebuilt = boilerplate_report(docs).select("doc_id", "clean_text")
            return rebuilt.join(docs.select("doc_id", "lang"), "doc_id").select(
                "doc_id", "lang", F.col("clean_text").alias("text")
            )

        return self._add("remove_boilerplate", stage)

    def gate_tokens(self, lo: int, hi: int) -> "CurationPipeline":
        """Keep docs whose token count is within [lo, hi]."""

        def stage(docs: DataFrame) -> DataFrame:
            ntok = F.size(F.filter(F.split("text", " "), lambda x: x != ""))
            return docs.withColumn("n_tokens", ntok.cast("bigint")).filter(
                F.col("n_tokens").between(lo, hi)
            )

        return self._add("gate_tokens", stage)

    def dedup_exact(self) -> "CurationPipeline":
        """Keep the lowest doc_id per exact text."""

        def stage(docs: DataFrame) -> DataFrame:
            keep = docs.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
            return docs.join(keep, ["text", "doc_id"])

        return self._add("dedup_exact", stage)

    def drop_span_duplicates(self, max_ratio: float = 0.6) -> "CurationPipeline":
        """Drop docs whose cross-doc duplicated-span coverage reaches
        max_ratio (integer predicate — q_dedup_substring's core)."""
        num, den = round(max_ratio * 10), 10

        def stage(docs: DataFrame) -> DataFrame:
            sub = substring_report(docs.select("doc_id", "text"))
            dropped = sub.filter(
                den * F.col("dup_tokens") >= num * F.col("n_tokens")
            ).select("doc_id")
            return docs.join(dropped, "doc_id", "left_anti")

        return self._add("drop_span_duplicates", stage)

    def select_dsir(self, top: int) -> "CurationPipeline":
        """Deterministic DSIR top-N selection (q_dsir_weights' core),
        retrained on whatever reaches this stage."""

        def stage(docs: DataFrame) -> DataFrame:
            sel = dsir_report(docs, top=top).select("doc_id", "logw")
            return docs.join(sel, "doc_id")

        return self._add("select_dsir", stage)

    # ---------------------------------------------------------- execution

    def run(self) -> DataFrame:
        """Fold the stages over the source; the result is cached on the
        builder for export()."""
        if self._source is None:
            raise ValueError("no source: call read_parquet() or from_frame()")
        out = self._source
        for _, fn in self._stages:
            out = fn(out)
        self._result = out
        return out

    def export(self, path: str, partition_by: list[str] | None = None) -> dict:
        """write_dataset the result (running the pipeline if needed) and
        return the self-certifying manifest."""
        from hive_gateway_spark.sources.dataset_export import write_dataset

        if self._result is None:
            self.run()
        return write_dataset(self._result, path, partition_by=partition_by)

    def append_to(self, path: str) -> dict:
        """Commit the result onto an EXISTING export as manifest version
        N+1 (the daily-batch form: curate today's crawl with the same
        stage chain, append_dataset it — O(batch), snapshot-versioned).
        """
        from hive_gateway_spark.sources.dataset_export import append_dataset

        if self._result is None:
            self.run()
        return append_dataset(self._result, path)

    @property
    def stages(self) -> list[str]:
        return [n for n, _ in self._stages]
