"""Semantic invariants of the sampling/selection family
(operators/sampling.py) beyond the DuckDB parity gate — the properties
that make the operators safe to run incrementally at 100 TB."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_gateway_spark import registry
from hive_gateway_spark.operators.sampling import _TRAIN_LT, _VAL_LT, _h
from hive_gateway_spark.session import load_tables

registry.load_all()


def _assign(docs):
    bucket = _h(F.col("doc_id")) % 1000
    split = (
        F.when(bucket < _TRAIN_LT, "train")
        .when(bucket < _VAL_LT, "val")
        .otherwise("test")
    )
    return docs.select("doc_id", split.alias("split"))


def test_split_is_append_stable(spark, sf_dir):
    """Membership is a pure function of doc_id: assigning a SUBSET of
    the corpus yields exactly the full run's assignments restricted to
    that subset — i.e. appends never move an existing doc's split.
    (rand()-based splits fail this: row order and partition layout
    change every assignment.)"""
    docs = load_tables(spark, sf_dir)["documents"]
    full = {r["doc_id"]: r["split"] for r in _assign(docs).collect()}
    half = docs.filter(F.col("doc_id") % 2 == 0)
    for r in _assign(half).collect():
        assert full[r["doc_id"]] == r["split"]


def test_split_proportions_near_80_10_10(spark, sf_dir):
    counts = {
        r["split"]: r["n"]
        for r in _assign(load_tables(spark, sf_dir)["documents"])
        .groupBy("split")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    total = sum(counts.values())
    assert 0.72 <= counts["train"] / total <= 0.88
    assert 0.05 <= counts["val"] / total <= 0.15
    assert 0.05 <= counts["test"] / total <= 0.15


def test_stratified_sample_exact_per_stratum(spark, sf_dir):
    """Exactly min(25, |stratum|) docs per language, and a rerun
    returns the identical doc_id set (hash-determinism)."""
    docs = load_tables(spark, sf_dir)["documents"]
    sizes = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    out1 = registry.QUERIES["q_sample_stratified"](spark, sf_dir)
    got = {
        r["lang"]: r["n"]
        for r in out1.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    for lang, n in sizes.items():
        assert got[lang] == min(25, n)
    ids1 = {r["doc_id"] for r in out1.collect()}
    ids2 = {
        r["doc_id"]
        for r in registry.QUERIES["q_sample_stratified"](spark, sf_dir).collect()
    }
    assert ids1 == ids2


def test_pack_bins_contiguous_and_conserving(spark, sf_dir):
    """Per (lang, shard): bin ids are the contiguous prefix 0..max, and
    packed token totals conserve the stream's total token count (no doc
    dropped or double-packed)."""
    out = registry.QUERIES["q_pack_sequences"](spark, sf_dir)
    rows = out.collect()
    per_stream: dict[tuple, list] = {}
    for r in rows:
        per_stream.setdefault((r["lang"], r["shard"]), []).append(r)
    assert per_stream
    for stream_rows in per_stream.values():
        bins = sorted(r["bin"] for r in stream_rows)
        assert bins == list(range(len(bins)))
    docs = load_tables(spark, sf_dir)["documents"]
    from hive_gateway_spark.operators.text import _BPE_RE

    total = docs.select(
        F.sum(F.regexp_count("text", F.lit(_BPE_RE)).cast("bigint")).alias("t")
    ).first()["t"]
    assert sum(r["bin_tokens"] for r in rows) == total
    assert sum(r["n_docs"] for r in rows) == docs.count()


def test_tf_idf_topk_shape(spark, sf_dir):
    """≤3 terms per doc; within a doc scores are non-increasing with the
    word-asc tiebreak (the driver-hashable rank order)."""
    out = registry.QUERIES["q_tf_idf"](spark, sf_dir).collect()
    per_doc: dict[int, list] = {}
    for r in out:
        per_doc.setdefault(r["doc_id"], []).append(r)
    for doc_rows in per_doc.values():
        assert len(doc_rows) <= 3
        ranked = sorted(doc_rows, key=lambda r: (-r["tfidf"], r["word"]))
        scores = [r["tfidf"] for r in ranked]
        assert scores == sorted(scores, reverse=True)


def test_temperature_weights_hand_checked(spark, sf_dir):
    """α=1/2 temperature on a planted 2-source corpus: sources with
    9 and 1 token-units get sqrt-weights 3:1 (0.75/0.25 exactly —
    sqrt(9)=3 and sqrt(1)=1 are exact, so no tolerance needed), the
    small source's epoch count rises above 1 (0.25·10/1 = 2.5) and
    the big one's falls below (0.75·10/9); weights sum to 1."""
    from hive_gateway_spark.operators.sampling import q_sample_temperature  # noqa: F401
    import hive_gateway_spark.operators.sampling as S
    from pyspark.sql import functions as F  # noqa: F811

    docs = spark.createDataFrame(
        [(i, "x", "en", "big", 3) for i in range(3)]
        + [(10, "x", "en", "small", 1)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    # drive the registered query's body through a planted frame by
    # reproducing its exact plan on `docs`
    src = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("n_tokens"),
    )
    s = src.withColumn(
        "s6",
        F.round(F.sqrt(F.col("n_tokens").cast("double")), 6).cast("decimal(18,6)"),
    )
    tot = s.agg(
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.sum("s6").alias("z"),
    )
    weight = F.col("s6").cast("double") / F.col("z").cast("double")
    out = {
        r["source"]: r.asDict()
        for r in s.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_tokens",
            weight.alias("weight"),
            (
                weight
                * F.col("total_tokens").cast("double")
                / F.col("n_tokens").cast("double")
            ).alias("epochs"),
        )
        .collect()
    }
    assert out["big"]["weight"] == 0.75 and out["small"]["weight"] == 0.25
    assert out["small"]["epochs"] == 2.5
    assert out["big"]["epochs"] < 1.0
    # and on the real fixture: weights sum to 1 (decimal normalizer)
    rows = registry.QUERIES["q_sample_temperature"](
        spark, sf_dir
    ).collect()
    assert abs(sum(r["weight"] for r in rows) - 1.0) < 1e-12
    assert all(r["epochs"] > 0 for r in rows)


def test_split_leakage_matrix_totals(spark, sf_dir):
    """The split×split matrix must partition the pair set exactly: its
    n_pairs total equals the _jaccard_pairs row count, and every leaky
    flag is (split_lo != split_hi)."""
    from hive_gateway_spark.operators.dedup import _jaccard_pairs
    from hive_gateway_spark.session import load_tables

    rows = registry.QUERIES["q_split_leakage"](spark, sf_dir).collect()
    assert rows
    n_pairs_total = sum(r["n_pairs"] for r in rows)
    assert n_pairs_total == _jaccard_pairs(load_tables(spark, sf_dir)).count()
    for r in rows:
        assert r["leaky"] == (r["split_lo"] != r["split_hi"])
        assert r["split_lo"] <= r["split_hi"]
        assert 2 * r["sum_shared"] >= r["sum_union"]  # every pair passed tau
