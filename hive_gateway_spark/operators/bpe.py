"""Byte-pair-encoding subword tokenizer (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units") — the
real learn + encode pair, not the regex approximation (q_token_count
keeps that as the cheap screen).

Spark-first shape, and why it scales:

- LEARNING runs on the WORD-FREQUENCY table, not the corpus (the
  standard trick): one corpus-sized tokenize+count shuffle produces a
  vocabulary-sized (Heaps' law) frame; a BOUNDED top-{BPE_LEARN_WORDS}
  slice of it (TakeOrdered) comes to the driver and the greedy merge
  recurrence runs LOCALLY with incremental pair counts — zero Spark
  jobs per merge, so BPE_MERGES=1000+ costs the same one aggregate as
  32 did (VERDICT r7 task #4; the learned list then broadcasts to the
  JVM encoder below, the same train-small/apply-big split every
  production tokenizer uses).
- ENCODING applies the learned merges IN RANK ORDER as left-to-right
  higher-order folds over each word's symbol array — chained column
  transforms, all JVM-side — evaluated once per DISTINCT word, then
  broadcast-joined back onto the corpus. No Python UDF anywhere.

Driver verification: BPE is the contract's poster-child iterative
algorithm — the merge choice at step i depends on the table rewritten
by steps 1..i-1, which ANSI SQL cannot replay — so q_bpe_vocab /
q_bpe_encode are declared rows-only (like q_dedup_fuzzy / q_sim_topk_*)
and their semantics are pinned by property tests instead:
round-trip identity (concat of a word's subwords reproduces the word),
token-count monotonicity in the merge budget, determinism, and a
hand-checked merge sequence on a tiny corpus (tests/test_bpe.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from hive_gateway_spark.registry import query
from hive_gateway_spark.session import load_tables
from hive_gateway_spark.staging import evict, touch

#: Merge budget. 32 keeps the fixture loop quick while learning every
#: high-frequency word; production vocabularies just raise it (the loop
#: cost is iterations × vocab-aggregate, independent of corpus size).
BPE_MERGES = 32

#: End-of-word marker (Sennrich's </w>): distinguishes "low" the word
#: from "low" the prefix of "lower", and makes decode unambiguous.
EOW = "</w>"


def _sql_quote(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _merge_fold(col: str, a: str, b: str) -> Column:
    """One BPE merge (a, b) → a||b applied to a symbol array, greedy
    left-to-right non-overlapping — an aggregate fold whose accumulator
    is the rewritten prefix."""
    qa, qb = _sql_quote(a), _sql_quote(b)
    qab = _sql_quote(a + b)
    return F.expr(
        f"aggregate({col}, CAST(array() AS ARRAY<STRING>), (acc, s) -> "
        f"CASE WHEN size(acc) > 0 AND element_at(acc, -1) = {qa} AND s = {qb} "
        f"THEN concat(slice(acc, 1, size(acc) - 1), array({qab})) "
        f"ELSE concat(acc, array(s)) END)"
    )


def word_frequencies(docs: DataFrame) -> DataFrame:
    """(word, n) over the corpus — the learning input."""
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def _base_symbols(wf: DataFrame) -> DataFrame:
    """(word, n, syms) — characters plus the end-of-word marker."""
    return wf.withColumn(
        "syms",
        F.expr(f"concat(split(word, ''), array({_sql_quote(EOW)}))"),
    )


#: session → {documents-plan key: learned merge list}. Learning is one
#: distributed aggregate + a driver-local recurrence; q_bpe_vocab and
#: q_bpe_encode start from the identical vocabulary, so the trained
#: merges are session-cached like every other staging artifact
#: (dedup._SHINGLE_CACHE pattern). On a cluster this is the persisted
#: tokenizer artifact training jobs load.
import weakref as _weakref

_MERGES_CACHE: "_weakref.WeakKeyDictionary" = _weakref.WeakKeyDictionary()


#: session → {documents-plan key: checkpointed (word, n_sub) frame}.
#: The 32 chained interpreted folds over the distinct vocabulary are
#: the encoder's whole cost — materialized once per (session, corpus)
#: so every consumer broadcast-joins plain rows (bench warm 6.6 →
#: 0.3 s; on a cluster this is the persisted subword-vocab table).
_ENC_CACHE: "_weakref.WeakKeyDictionary" = _weakref.WeakKeyDictionary()


def _encoded_vocab(docs: DataFrame) -> DataFrame:
    per = _ENC_CACHE.setdefault(docs.sparkSession, {})
    try:
        key = docs.semanticHash()
    except Exception:  # pragma: no cover - non-classic session fallback
        key = id(docs)
    out = per.get(key)
    if out is not None:
        touch(per, key)  # LRU: a hit must survive overflow
    if out is None:
        evict(per)
        merges = learned_merges(docs)
        wf = word_frequencies(docs)
        out = (
            encode_words(wf, merges)
            .select("word", F.size("subwords").alias("n_sub"))
            .localCheckpoint()
        )
        per[key] = out
    return out


def learned_merges(docs: DataFrame, n_merges: int = BPE_MERGES) -> list[tuple[str, str, int]]:
    per = _MERGES_CACHE.setdefault(docs.sparkSession, {})
    try:
        key = (docs.semanticHash(), n_merges)
    except Exception:  # pragma: no cover - non-classic session fallback
        key = (id(docs), n_merges)
    out = per.get(key)
    if out is not None:
        touch(per, key)
    if out is None:
        evict(per)
        out = learn_bpe(docs, n_merges)
        per[key] = out
    return out


#: Driver-side learning vocabulary bound (VERDICT r7 task #4): the
#: merge learner pulls the TOP-{BPE_LEARN_WORDS} words by frequency
#: (TakeOrdered — bounded regardless of corpus size) and learns the
#: merge table locally with incremental pair counts, instead of one
#: Spark job round PER MERGE (BPE_MERGES=1000 was 1000 job rounds).
#: The truncation is the DSIR pattern — a bounded model slice drives
#: the distributed pass: pair counts are frequency-weighted, so the
#: sub-top tail (rank > 64k, each word counted once-ish) moves counts
#: by parts-per-million and essentially never flips a greedy argmax.
#: Fixture vocabularies sit far below the bound, so learning there is
#: EXACT — the hand-checked merge sequences in tests/test_bpe.py pin
#: equivalence with the per-round distributed learner this replaced.
BPE_LEARN_WORDS = 1 << 16


def _merge_fold_local(syms: list[str], a: str, b: str) -> list[str]:
    """Python twin of _merge_fold: greedy left-to-right non-overlap."""
    acc: list[str] = []
    ab = a + b
    for s in syms:
        if acc and acc[-1] == a and s == b:
            acc[-1] = ab
        else:
            acc.append(s)
    return acc


def learn_bpe(docs: DataFrame, n_merges: int = BPE_MERGES) -> list[tuple[str, str, int]]:
    """Greedy BPE training: repeatedly merge the most frequent adjacent
    symbol pair (count desc, then (a, b) asc — a total, engine-free
    tiebreak so the vocabulary is deterministic). Returns
    [(a, b, pair_count), ...] in merge-rank order.

    ONE distributed aggregate (word_frequencies) + ONE bounded
    TakeOrdered fetch; the merge recurrence runs driver-local over the
    top-{BPE_LEARN_WORDS} slice with incremental pair counts (only
    words containing the chosen pair are rewritten; a lazy-deletion
    heap keyed (-count, a, b) reproduces the exact argmax/tiebreak),
    then the merge list broadcasts to the JVM encoder. Per-merge cost
    no longer involves the cluster at all — the Sennrich reference
    algorithm, with the corpus reduced to its frequency table first."""
    import heapq
    from collections import defaultdict

    top = (
        word_frequencies(docs)
        .orderBy(F.col("n").desc(), F.col("word").asc())
        .limit(BPE_LEARN_WORDS)
        .collect()
    )
    vocab: list[tuple[list[str], int]] = [
        (list(r["word"]) + [EOW], int(r["n"])) for r in top
    ]
    counts: dict[tuple[str, str], int] = defaultdict(int)
    holders: dict[tuple[str, str], set[int]] = defaultdict(set)
    for wid, (syms, n) in enumerate(vocab):
        for p in zip(syms, syms[1:]):
            counts[p] += n
            holders[p].add(wid)
    heap = [(-c, p) for p, c in counts.items()]
    heapq.heapify(heap)
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        while heap and counts.get(heap[0][1], 0) != -heap[0][0]:
            heapq.heappop(heap)  # stale entry (count changed since push)
        if not heap or -heap[0][0] < 2:
            break
        cnt, (a, b) = -heap[0][0], heap[0][1]
        merges.append((a, b, cnt))
        touched: set[tuple[str, str]] = set()
        for wid in holders.pop((a, b), ()):
            syms, n = vocab[wid]
            new = _merge_fold_local(syms, a, b)
            if new == syms:  # stale holder (pair rewritten away earlier)
                continue
            for p in zip(syms, syms[1:]):
                counts[p] -= n
                touched.add(p)
            for p in zip(new, new[1:]):
                counts[p] += n
                holders[p].add(wid)
                touched.add(p)
            vocab[wid] = (new, n)
        for p in touched:
            if counts[p] > 0:
                heapq.heappush(heap, (-counts[p], p))
            else:
                counts.pop(p, None)
                holders.pop(p, None)
    return merges


def encode_words(words: DataFrame, merges: list[tuple[str, str, int]]) -> DataFrame:
    """(word, subwords array<string>) — merges applied in rank order,
    each as a full left-to-right pass (the standard merge-list encoder).
    Runs once per distinct word; callers broadcast the result back onto
    the corpus."""
    out = _base_symbols(words.select("word").distinct().withColumn("n", F.lit(1)))
    for a, b, _ in merges:
        out = out.withColumn("syms", _merge_fold("syms", a, b))
    return out.select("word", F.col("syms").alias("subwords"))


@query("q_bpe_vocab")
def q_bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned merge table: (rank, left, right, merged, pair_count)
    in training order. Deterministic for a given corpus (exact counts +
    total tiebreak); rows-only by design — the greedy recurrence is the
    iterative-algorithm case the driver contract exempts from SQL
    oracles."""
    docs = load_tables(spark, sf_dir)["documents"]
    merges = learned_merges(docs)
    rows = [
        (i, a, b, a + b, cnt) for i, (a, b, cnt) in enumerate(merges)
    ]
    return spark.createDataFrame(
        rows, "rank int, left string, right string, merged string, pair_count bigint"
    )


@query("q_bpe_encode")
def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus encoded with the learned subword vocabulary: per doc, the
    BPE token count next to the whitespace token count and the
    chars-per-BPE-token compression ratio — the real sequence-length
    input a packing planner (q_pack_sequences) would consume.

    Scale shape: the encoder's chained folds run once per DISTINCT
    word; the corpus-side plan is tokenize → broadcast join on word →
    one per-doc fold. Rows-only (see q_bpe_vocab)."""
    docs = load_tables(spark, sf_dir)["documents"]
    enc = _encoded_vocab(docs)
    tok = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
    )
    return (
        tok.join(F.broadcast(enc), "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_words"),
            F.sum("n_sub").cast("bigint").alias("n_bpe_tokens"),
            F.sum(F.length("word")).cast("bigint").alias("n_chars"),
        )
        .select(
            "doc_id",
            "n_words",
            "n_bpe_tokens",
            "n_chars",
            (F.col("n_chars").cast("double") / F.col("n_bpe_tokens").cast("double")
             ).alias("chars_per_token"),
        )
    )
