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

    # ------------------------------------------------- v4 recipe stages

    def gate_gopher(self, stops: tuple[str, ...] | None = None) -> "CurationPipeline":
        """Keep docs passing the full Gopher rule battery
        (q_gopher_rules' core; ``stops`` swaps the function-word
        lexicon per corpus/language)."""

        def stage(docs: DataFrame) -> DataFrame:
            from hive_gateway_spark.operators.text import (
                _GOPHER_STOPS,
                gopher_report,
            )

            keep = gopher_report(docs, stops=stops or _GOPHER_STOPS).filter(
                "keep"
            ).select("doc_id")
            return docs.join(keep, "doc_id")

        return self._add("gate_gopher", stage)

    def gate_quality(self, min_score: float = 0.0) -> "CurationPipeline":
        """Keep docs whose hashed-linear classifier score clears
        ``min_score`` (q_quality_classifier's core — the
        fasttext-style quality filter of the published pretraining
        recipes). A TRUE zero-shuffle map gate: the score folds
        in-row via quality_exprs and the gate is one filter — no
        second corpus scan, no join (code-review r12: the first
        spelling scored into a keep-set and joined back). Documents
        with zero tokens are outside the classifier's domain and are
        dropped regardless of ``min_score`` — same contract as
        q_quality_classifier's output."""

        def stage(docs: DataFrame) -> DataFrame:
            from hive_gateway_spark.operators.text import quality_exprs

            n_tok, num = quality_exprs()
            score = num.cast("double") / (500.0 * n_tok)
            return docs.filter((n_tok > 0) & (score > min_score))

        return self._add("gate_quality", stage)

    def decontaminate(
        self,
        bench_mod: int | None = None,
        min_shared: int | None = None,
        bench_corpus: DataFrame | None = None,
        shingle_n: int | None = None,
    ) -> "CurationPipeline":
        """Drop the benchmark slice (doc_id % bench_mod == 0) AND every
        training doc sharing >= min_shared word-shingles with it
        (q_contamination's machinery). Defaults come from dedup's
        CONTAM_BENCH_MOD / CONTAM_MIN_SHARED — hardcoded copies here
        would silently desync the facade from the registered pipeline
        if the constants moved. The shingle meet is a shuffle-hash
        join on the 8-byte hash — never a corpus broadcast.

        ``bench_corpus``: the frame the BENCHMARK shingle set is built
        from. Benchmark suites exist independently of quality gates, so
        when decontaminate() runs after a filtering stage, pass the
        UNFILTERED corpus here — otherwise a benchmark doc the earlier
        gate dropped would no longer protect against its near-dups
        (q_curation_v4 builds its benchmark set from the full input
        corpus for exactly this reason). Defaults to the current
        frame.

        ``shingle_n``: word-shingle width; defaults to dedup.SHINGLE_N
        (the fixture/oracle width, 3). 3-grams of a small vocabulary
        are COMMON — the 100k smoke measured 25% of a synthetic zipf
        corpus flagged at n=3 — so production screens should pass the
        8–13 range SCALE.md documents (the width published
        decontamination setups use)."""

        def stage(docs: DataFrame) -> DataFrame:
            from hive_gateway_spark.operators.dedup import (
                CONTAM_BENCH_MOD,
                CONTAM_MIN_SHARED,
                SHINGLE_N,
                shingle_expr,
            )

            mod = CONTAM_BENCH_MOD if bench_mod is None else bench_mod
            shared = CONTAM_MIN_SHARED if min_shared is None else min_shared
            n = SHINGLE_N if shingle_n is None else shingle_n
            hs = f"array_distinct(transform({shingle_expr(n)}, s -> xxhash64(s)))"

            def shingles(frame: DataFrame) -> DataFrame:
                return (
                    frame.withColumn("words", F.split("text", " "))
                    .filter(F.size("words") >= n)
                    .select("doc_id", F.explode(F.expr(hs)).alias("h"))
                )

            sh = shingles(docs)
            bench_src = shingles(bench_corpus) if bench_corpus is not None else sh
            bench = bench_src.filter(F.col("doc_id") % mod == 0).select(
                F.col("doc_id").alias("bench_id"), "h"
            )
            train = sh.filter(F.col("doc_id") % mod != 0).select(
                F.col("doc_id").alias("train_id"), "h"
            )
            contaminated = (
                train.hint("shuffle_hash")
                .join(bench, "h")
                .groupBy("bench_id", "train_id")
                .agg(F.count("*").alias("sn"))
                .filter(F.col("sn") >= shared)
                .select(F.col("train_id").alias("doc_id"))
                .distinct()
            )
            return docs.filter(F.col("doc_id") % mod != 0).join(
                contaminated, "doc_id", "left_anti"
            )

        return self._add("decontaminate", stage)

    def cut_perplexity_tail(self, tiles: int = 3) -> "CurationPipeline":
        """CCNet cut: retrain the bigram LM on the current frame, rank
        per lang by mean_nll via the scalable exact NTILE, drop the
        last (least fluent) of ``tiles`` tiles."""

        def stage(docs: DataFrame) -> DataFrame:
            from hive_gateway_spark.operators.corpus import perplexity_report
            from hive_gateway_spark.operators.ranking import exact_ntile
            from hive_gateway_spark.staging import stage as _stage

            ppl = perplexity_report(docs)
            # staged: exact_ntile re-reads its input per ranking pass
            ranked = exact_ntile(
                _stage(
                    ppl.join(docs.select("doc_id", "lang"), "doc_id").select(
                        "lang", "doc_id", "mean_nll"
                    ),
                    "pipeline.ntile_input",
                ),
                tiles,
                "mean_nll",
                "doc_id",
                partition_cols=["lang"],
                out_col="t",
                tie_subsplit=False,
            )
            tail = ranked.filter(F.col("t") == tiles).select("doc_id")
            return docs.join(tail, "doc_id", "left_anti")

        return self._add("cut_perplexity_tail", stage)

    def dedup_normalized(self) -> "CurationPipeline":
        """Keep the lowest doc_id per NORMALIZED text (casefold +
        punctuation-strip + whitespace-collapse — q_dedup_normalized's
        canonical election)."""

        def stage(docs: DataFrame) -> DataFrame:
            norm = F.trim(
                F.regexp_replace(
                    F.regexp_replace(F.upper(F.col("text")), "[^A-Z0-9 ]", ""),
                    " +",
                    " ",
                )
            )
            nn = docs.withColumn("__norm", norm)
            keymin = nn.groupBy("__norm").agg(F.min("doc_id").alias("doc_id"))
            return nn.join(keymin, ["__norm", "doc_id"]).drop("__norm")

        return self._add("dedup_normalized", stage)

    def split_pack(self) -> "CurationPipeline":
        """Terminal manifest stage: deterministic 80/10/10 hash split,
        hash shard, and contiguous cumsum token bins per (split, lang,
        shard) — q_split_assign + q_pack_sequences composed."""

        def stage(docs: DataFrame) -> DataFrame:
            from pyspark.sql import Window

            from hive_gateway_spark.operators.sampling import (
                _PACK_BUDGET,
                _PACK_SHARDS,
                _TRAIN_LT,
                _VAL_LT,
                _h,
            )
            from hive_gateway_spark.operators.text import _BPE_RE

            bucket = _h(F.col("doc_id")) % 1000
            split = (
                F.when(bucket < _TRAIN_LT, "train")
                .when(bucket < _VAL_LT, "val")
                .otherwise("test")
            )
            sized = docs.select(
                "*",
                split.alias("split"),
                (_h(F.col("doc_id")) % _PACK_SHARDS).alias("shard"),
                F.regexp_count("text", F.lit(_BPE_RE))
                .cast("bigint")
                .alias("__n_tok"),
            )
            w = (
                Window.partitionBy("split", "lang", "shard")
                .orderBy(F.col("doc_id").asc())
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            return sized.withColumn(
                "bin",
                F.floor(
                    (
                        (F.sum("__n_tok").over(w) - F.col("__n_tok")).cast(
                            "double"
                        )
                    )
                    / F.lit(_PACK_BUDGET)
                ).cast("bigint"),
            ).drop("__n_tok")

        return self._add("split_pack", stage)

    # ---------------------------------------------------------- execution

    def run(self, materialize: bool = True) -> DataFrame:
        """Fold the stages over the source; the result is cached on the
        builder for export().

        ``materialize`` (default) localCheckpoints each stage boundary —
        the staging-table pattern every multi-stage corpus build uses:
        stages like cut_perplexity_tail make several passes over their
        input (LM aggregate + ranking), so an unmaterialized chain
        re-executes the whole upstream per pass (measured 5× wall on
        the v4 chain). Pass False for one lazy end-to-end plan when the
        chain is single-pass.

        Block hygiene: each boundary's checkpoint is RELEASED as soon
        as its successor materializes (only the final result stays
        pinned), and a re-run releases the previous result first —
        otherwise every stage of every run would leak corpus-scale
        block-manager blocks for the session's lifetime (the ADVICE r8
        #4 class staging.release exists for)."""
        from hive_gateway_spark.staging import release

        if self._source is None:
            raise ValueError("no source: call read_parquet() or from_frame()")
        release(self._result)  # re-run: the old result is superseded
        self._result = None
        out = self._source
        prev_ckpt = None
        for _, fn in self._stages:
            out = fn(out)
            if materialize:
                out = out.localCheckpoint()
                release(prev_ckpt)  # successor materialized; free it
                prev_ckpt = out
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
