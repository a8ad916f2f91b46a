"""Semantic pins for the BPE tokenizer (operators/bpe.py) — the
rows-only family's verification story: a hand-checked merge sequence,
round-trip identity, monotonicity in the merge budget, determinism,
and corpus-level consistency of the encode report."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_gateway_spark import registry
from hive_gateway_spark.operators.bpe import (
    BPE_MERGES,
    EOW,
    encode_words,
    learn_bpe,
    word_frequencies,
)
from hive_gateway_spark.session import load_tables

registry.load_all()


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


def test_hand_checked_merge_sequence(spark):
    """Corpus 'aaab aaab aaab ab': pair counts over
    {aaab:3 chars a,a,a,b,</w>; ab:1} → (a,a)=6 wins first (ties to
    none), then (aa,a)=3, then (aaa,b)=3... verify the exact greedy
    order with Sennrich-style counts."""
    docs = _docs(spark, ["aaab aaab aaab ab"])
    merges = learn_bpe(docs, n_merges=4)
    got = [(a, b) for a, b, _ in merges]
    # counts: step1 pairs per word: aaab(n=3): (a,a)x2,(a,b),(b,</w>);
    #   ab(n=1): (a,b),(b,</w>) → (a,a)=6, (a,b)=4, (b,</w>)=4 → (a,a)
    # step2: aaab → [aa,a,b,</w>]: (aa,a)=3,(a,b)=3+1,(b,</w>)=4 →
    #   (a,b) and (b,</w>) tie at 4 → (a,b) wins lexicographically
    # step3: aaab → [aa,ab,</w>], ab → [ab,</w>]:
    #   (aa,ab)=3, (ab,</w>)=4 → (ab,</w>)
    # step4: (aa,ab</w>)=3
    assert got == [("a", "a"), ("a", "b"), ("ab", EOW), ("aa", "ab" + EOW)]
    counts = [c for _, _, c in merges]
    assert counts == [6, 4, 4, 3]


def test_roundtrip_identity(spark, sf_dir):
    """Decode is concatenation: for every distinct corpus word, the
    learned encoder's subwords joined back equal word + EOW."""
    docs = load_tables(spark, sf_dir)["documents"]
    merges = learn_bpe(docs, n_merges=12)
    wf = word_frequencies(docs)
    enc = encode_words(wf, merges)
    bad = enc.filter(
        F.concat_ws("", F.col("subwords")) != F.concat(F.col("word"), F.lit(EOW))
    ).count()
    assert bad == 0
    assert enc.count() == wf.select("word").distinct().count()


def test_token_count_monotone_in_merge_budget(spark):
    """More merges can only shorten (or keep) every word's encoding —
    each merge is a non-expanding rewrite."""
    docs = _docs(
        spark,
        ["the quick brown fox the lazy dog the end", "the the the quick quick fox"],
    )
    wf = word_frequencies(docs)
    sizes = {}
    for k in (0, 2, 6, 12):
        merges = learn_bpe(docs, n_merges=k)
        assert len(merges) <= k
        enc = encode_words(wf, merges).select(
            "word", F.size("subwords").alias("n")
        )
        sizes[k] = {r["word"]: r["n"] for r in enc.collect()}
    words = sizes[0].keys()
    for lo, hi in ((0, 2), (2, 6), (6, 12)):
        assert all(sizes[hi][w] <= sizes[lo][w] for w in words)


def test_vocab_deterministic_and_consistent(spark, sf_dir):
    a = registry.QUERIES["q_bpe_vocab"](spark, sf_dir).collect()
    b = registry.QUERIES["q_bpe_vocab"](spark, sf_dir).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) == BPE_MERGES  # fixture corpus has ≥32 frequent pairs
    # merged symbol is always left||right, counts are positive
    for r in a:
        assert r["merged"] == r["left"] + r["right"]
        assert r["pair_count"] >= 2


def test_encode_report_consistent(spark, sf_dir):
    """n_bpe_tokens is bounded below by n_words (every word ≥1 token)
    and above by chars+words (char-level + EOW upper bound), and
    chars_per_token matches the exact integer ratio."""
    out = registry.QUERIES["q_bpe_encode"](spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        assert r["n_words"] <= r["n_bpe_tokens"] <= r["n_chars"] + r["n_words"]
        assert abs(r["chars_per_token"] - r["n_chars"] / r["n_bpe_tokens"]) < 1e-12
