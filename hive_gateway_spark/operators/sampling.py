"""Corpus sampling / splitting / packing operators — the selection
stages of a training-data pipeline that sit between curation
(operators/dedup.py) and export (sources/dataset_export.py).

Reference parity: the reference gateway (src/gateway.ts) has no
sampling layer; these implement the mandate's "operations a
large-scale training-data pipeline would need" as first-class,
driver-verifiable operators.

Design rules shared by all three:

* **Content-hash determinism, never RNG.** Split/sample membership is
  a pure function of ``doc_id`` through the same portable affine hash
  used by the MinHash family (p = 2³¹−1, exact int64 in both engines),
  so a re-run, a different cluster size, or a different partition
  layout yields the SAME split — the property that makes train/test
  splits reproducible and contamination-auditable at 100 TB.
* **No driver round trips.** Everything is scan → map → one shuffle
  (partial-agg or per-group window); nothing collects.
* **Skew-safe windows.** Anything windowed "per language" would
  serialize a 100 TB corpus into ~30 language partitions; windows here
  partition by (lang, shard) where shard is hash-derived, keeping
  per-partition work bounded while staying deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from hive_gateway_spark.registry import query
from hive_gateway_spark.session import load_tables
from hive_gateway_spark.staging import stage

#: Portable affine hash over Z_p (p Mersenne 2³¹−1): A·x+B fits int64
#: for any x < p, and pmod-reducing doc_id first keeps it overflow-free
#: for arbitrary bigint ids (same fix as the KMV sketch, ADVICE r6).
_P = (1 << 31) - 1
_A = 1_103_515_245 % _P
_B = 12_345

#: Split thresholds over h % 1000: 80 / 10 / 10.
_TRAIN_LT = 800
_VAL_LT = 900

#: Sequence-packing geometry: contiguous greedy fill of fixed token
#: budgets, sharded for parallelism (see q_pack_sequences docstring).
_PACK_BUDGET = 512
_PACK_SHARDS = 8


def _h(col):
    """Spark-side portable hash of a bigint id column → [0, p)."""
    return (F.lit(_A) * F.pmod(col, F.lit(_P)) + F.lit(_B)) % F.lit(_P)


def _h_sql(expr: str) -> str:
    """The identical hash as DuckDB SQL (exact int64 both engines)."""
    return f"(({_A} * (({expr}) % {_P}) + {_B}) % {_P})"


def _split_case_sql(idexpr: str) -> str:
    """The train/val/test CASE as DuckDB SQL — ONE definition shared by
    the q_split_assign and q_split_leakage oracles (the ADVICE r12 #3
    rule: shared fragments, never re-typed literals)."""
    return (
        f"CASE WHEN {_h_sql(idexpr)} % 1000 < {_TRAIN_LT} THEN 'train' "
        f"WHEN {_h_sql(idexpr)} % 1000 < {_VAL_LT} THEN 'val' "
        f"ELSE 'test' END"
    )


def _split_col(col):
    """Spark twin of _split_case_sql over a bigint id column."""
    bucket = _h(col) % 1000
    return (
        F.when(bucket < _TRAIN_LT, "train")
        .when(bucket < _VAL_LT, "val")
        .otherwise("test")
    )


@query(
    "q_split_assign",
    oracle=f"""
    WITH assigned AS (
      SELECT {_split_case_sql('doc_id')} AS split,
             lang, n_chars
      FROM documents
    )
    SELECT split, lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM assigned
    GROUP BY split, lang
    """,
)
def q_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (80/10/10) by content hash.

    The split is a pure function of doc_id — not rand(): membership
    survives re-runs, repartitions, and incremental appends (a new doc
    lands in a split without moving any existing doc), which is the
    invariant a decontamination audit (q_contamination) depends on.
    Plan shape: scan → project (hash CASE) → partial-agg shuffle on
    (split, lang). No window, no join — linear at any scale.
    """
    docs = load_tables(spark, sf_dir)["documents"]
    return (
        docs.select(_split_col(F.col("doc_id")).alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


@query(
    "q_sample_stratified",
    oracle=f"""
    SELECT doc_id, lang, source, n_chars
    FROM (
      SELECT doc_id, lang, source, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY {_h_sql('doc_id')} ASC, doc_id ASC
             ) AS rn
      FROM documents
    )
    WHERE rn <= 25
    """,
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified per-language sample: the 25 lowest-hash docs per lang.

    Hash-ordered top-N is the deterministic analog of uniform sampling
    (the hash is uniform over Z_p, so "lowest 25 hashes" is an unbiased
    25-doc sample) with two properties rand() lacks: reproducibility
    and bounded-churn under appends (a new doc evicts at most one).

    Scale shape: per-group top-N is rank-then-filter; with ~30
    language strata the window sort would serialize, so at 100 TB this
    runs as the two-phase idiom — per-partition local top-25 heap
    (partial TakeOrdered per stratum), then a final per-stratum merge
    of ≤25·n_partitions candidate rows. Spark's window + filter(rn<=k)
    plan achieves the same bound via WindowGroupLimit pushdown
    (rank-limit partial evaluation before the shuffle).
    """
    docs = load_tables(spark, sf_dir)["documents"]
    w = Window.partitionBy("lang").orderBy(
        _h(F.col("doc_id")).asc(), F.col("doc_id").asc()
    )
    return (
        docs.select("doc_id", "lang", "source", "n_chars")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 25)
        .drop("rn")
    )


#: Shared oracle CTE: per-doc bin placement (the q_pack_sequences
#: semantics), reused verbatim by the packing report and its
#: efficiency audit so the two oracles cannot drift.
_PACK_PLACED_CTE = f"""
    sized AS (
      SELECT doc_id, lang,
             {_h_sql('doc_id')} % {_PACK_SHARDS} AS shard,
             CAST(len(regexp_extract_all(text, '[a-z]+|[A-Z]+|[0-9]|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_tok
      FROM documents
    ),
    placed AS (
      SELECT lang, shard, n_tok,
             CAST(FLOOR(CAST(SUM(n_tok) OVER (
               PARTITION BY lang, shard ORDER BY doc_id ASC
               ROWS UNBOUNDED PRECEDING
             ) - n_tok AS DOUBLE) / {_PACK_BUDGET}) AS BIGINT) AS bin
      FROM sized
    )"""


@query(
    "q_pack_sequences",
    oracle=f"""
    WITH {_PACK_PLACED_CTE}
    SELECT lang, shard, bin,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS bin_tokens
    FROM placed
    GROUP BY lang, shard, bin
    """,
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: fill fixed token budgets by contiguous cumsum.

    Training dataloaders concatenate documents into fixed-length
    sequences; the deterministic streaming analog assigns each doc to
    bin = floor((running_token_total − own_tokens) / budget) within
    its (lang, shard) stream, ordered by doc_id. Token counts use the
    same BPE-ish regex as q_text_quality (letter runs / digits /
    punctuation singletons).

    Skew design: packing "per language" would make the window sort a
    ~30-partition serialization at 100 TB; sharding each language into
    {_PACK_SHARDS} hash-derived streams (deterministic, content-keyed)
    keeps every window partition bounded while each shard still packs
    optimally-contiguously. At cluster scale the shard count scales
    with executor count (here fixed for oracle parity); the trade is
    ≤1 underfilled tail bin per shard instead of per corpus.
    """
    docs = load_tables(spark, sf_dir)["documents"]
    from hive_gateway_spark.operators.text import _BPE_RE

    sized = docs.select(
        "doc_id",
        "lang",
        (_h(F.col("doc_id")) % _PACK_SHARDS).alias("shard"),
        F.regexp_count("text", F.lit(_BPE_RE)).cast("bigint").alias("n_tok"),
    )
    w = (
        Window.partitionBy("lang", "shard")
        .orderBy(F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    placed = sized.select(
        "lang",
        "shard",
        "n_tok",
        F.floor(
            ((F.sum("n_tok").over(w) - F.col("n_tok")).cast("double"))
            / F.lit(_PACK_BUDGET)
        )
        .cast("bigint")
        .alias("bin"),
    )
    return placed.groupBy("lang", "shard", "bin").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("bin_tokens"),
    )


@query(
    "q_pack_efficiency",
    oracle=f"""
    WITH {_PACK_PLACED_CTE},
    bins AS (
      SELECT lang, shard, bin,
             CAST(SUM(n_tok) AS BIGINT) AS bin_tokens
      FROM placed
      GROUP BY lang, shard, bin
    )
    SELECT lang,
           COUNT(*) AS n_bins,
           CAST(SUM(bin_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(CASE WHEN bin_tokens < {_PACK_BUDGET} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_underfull,
           CAST(SUM(CASE WHEN bin_tokens < {_PACK_BUDGET}
                         THEN {_PACK_BUDGET} - bin_tokens
                         ELSE 0 END) AS BIGINT) AS padding_tokens,
           CAST(SUM(bin_tokens) AS DOUBLE)
             / (COUNT(*) * {_PACK_BUDGET}) AS fill_rate
    FROM bins
    GROUP BY lang
    """,
)
def q_pack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-efficiency audit over q_pack_sequences' bins — the
    number a dataloader owner actually watches: per language, how many
    fixed-budget sequences the corpus packs into, how many are
    underfull (they pay padding), the total padding tokens wasted, and
    the fill rate. Greedy contiguous packing leaves underfull bins only
    at stream tails and after over-budget documents, so a healthy
    corpus shows fill_rate near 1 — a packing regression (bad shard
    key, broken cumsum order) shows up here instantly.

    Scale shape: the q_pack_sequences plan (bounded (lang, shard)
    cumsum windows) plus one more tiny aggregate over bin rows —
    nothing corpus-scale is added."""
    bins = q_pack_sequences(spark, sf_dir)
    return bins.groupBy("lang").agg(
        F.count("*").alias("n_bins"),
        F.sum("bin_tokens").cast("bigint").alias("total_tokens"),
        F.sum(
            F.when(F.col("bin_tokens") < _PACK_BUDGET, 1).otherwise(0)
        ).alias("n_underfull"),
        F.sum(
            F.when(
                F.col("bin_tokens") < _PACK_BUDGET,
                F.lit(_PACK_BUDGET) - F.col("bin_tokens"),
            ).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("padding_tokens"),
        (
            F.sum("bin_tokens").cast("double")
            / (F.count("*") * F.lit(_PACK_BUDGET))
        ).alias("fill_rate"),
    )


@query(
    "q_sample_temperature",
    oracle="""
    WITH src AS (
      SELECT source,
             COUNT(*) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ),
    s AS (
      SELECT source, n_docs, n_tokens,
             CAST(ROUND(sqrt(CAST(n_tokens AS DOUBLE)), 6)
                  AS DECIMAL(18,6)) AS s6
      FROM src
    ),
    tot AS (
      SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
             SUM(s6) AS z
      FROM s
    )
    SELECT s.source, s.n_docs, s.n_tokens,
           CAST(s.n_tokens AS DOUBLE) / CAST(tot.total_tokens AS DOUBLE)
             AS raw_share,
           CAST(s.s6 AS DOUBLE) / CAST(tot.z AS DOUBLE) AS weight,
           (CAST(s.s6 AS DOUBLE) / CAST(tot.z AS DOUBLE)
            * CAST(tot.total_tokens AS DOUBLE))
             / CAST(s.n_tokens AS DOUBLE) AS epochs
    FROM s CROSS JOIN tot
    """,
)
def q_sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-balanced source mixture (the multilingual-corpus
    recipe of mT5/ROOTS: sample source s with weight ∝ n_s^α instead
    of its raw share, boosting small sources): per source the raw
    token share, the temperature weight at α = 1/2, and the effective
    epoch count (how many times the source is traversed when the
    resampled corpus keeps the original token budget) — the numbers a
    dataloader mixes batches by, and epochs > 1 is the overfit alarm
    on tiny sources.

    α is EXACTLY 1/2 so the power is sqrt — the one libm call IEEE 754
    requires correctly rounded, hence bit-equal across engines (pow/
    exp/ln carry no such guarantee; an α you can't express as exact
    roots would need the hashed-bucket trick instead). The rounded-
    sqrt decimals then sum EXACTLY (order-free normalizer z), and
    weight/epochs are fixed chains of IEEE ops on identical operands
    (the q_tf_idf libm rule). Token counts use n_chars (pushdown: the
    scan reads two columns).

    Scale shape: ONE partial-agg shuffle on source (sources are
    bounded — dozens); the aggregated source frame is checkpointed so
    the normalizer derives from it instead of re-scanning the corpus
    (without it the plan read documents TWICE — once for s, once for
    tot); the normalizer is a broadcast 1-row cross join and
    everything after the first aggregate is source-count-sized."""
    docs = load_tables(spark, sf_dir)["documents"]
    src = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("n_tokens"),
    )
    s = src.withColumn(
        "s6",
        F.round(F.sqrt(F.col("n_tokens").cast("double")), 6).cast(
            "decimal(18,6)"
        ),
    )
    s = stage(s, "sample_temperature.sources")
    tot = s.agg(
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.sum("s6").alias("z"),
    )
    weight = F.col("s6").cast("double") / F.col("z").cast("double")
    return s.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        (
            F.col("n_tokens").cast("double")
            / F.col("total_tokens").cast("double")
        ).alias("raw_share"),
        weight.alias("weight"),
        (
            weight
            * F.col("total_tokens").cast("double")
            / F.col("n_tokens").cast("double")
        ).alias("epochs"),
    )


#: Per-source sample size for q_reservoir_per_source.
_RESERVOIR_K = 40


@query(
    "q_reservoir_per_source",
    oracle=f"""
    WITH ranked AS (
        SELECT source, doc_id, lang, n_chars,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY {_h_sql('doc_id')}, doc_id) AS rk
        FROM documents
    )
    SELECT source, doc_id, lang, n_chars, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= {_RESERVOIR_K}
    """,
)
def q_reservoir_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-per-source sample — the bounded "show me 40
    random docs from each source" eval/debug draw every pipeline ships
    (and the per-group cap applied before expensive per-doc scoring).
    The "random" order is the portable LCG hash of doc_id (the
    q_split_assign hash), so the draw is a pure function of content
    ids: stable across re-runs, repartitions, and engines — a true
    reservoir's RNG draw would be neither reproducible nor
    oracle-checkable.

    Scale shape: ONE window shuffle on source with rank ≤ k — Spark
    plans it as WindowGroupLimit (partial top-k BEFORE the shuffle,
    plan-asserted in tests/test_plans.py), so a billion-doc source
    contributes k rows per map partition to the exchange, never its
    full partition."""
    docs = load_tables(spark, sf_dir)["documents"]
    from pyspark.sql import Window as W

    rk = F.row_number().over(
        W.partitionBy("source").orderBy(_h(F.col("doc_id")), "doc_id")
    )
    return (
        docs.select("source", "doc_id", "lang", "n_chars", rk.alias("rk"))
        .filter(F.col("rk") <= _RESERVOIR_K)
        .select(
            "source", "doc_id", "lang", "n_chars", F.col("rk").cast("bigint").alias("rk")
        )
    )


def _leakage_oracle() -> str:
    """Deferred so the dedup module's pair CTE is imported lazily (the
    fragment is shared verbatim with every _jaccard_pairs oracle — the
    near-dup definition cannot drift between the dedup family and this
    audit)."""
    from hive_gateway_spark.operators.dedup import _duck_pairs_sql

    return f"""
    WITH {_duck_pairs_sql()},
    lab AS (
      SELECT {_split_case_sql('doc_a')} AS sa,
             {_split_case_sql('doc_b')} AS sb,
             shared, union_sz
      FROM fullpairs
    )
    SELECT LEAST(sa, sb) AS split_lo,
           GREATEST(sa, sb) AS split_hi,
           (LEAST(sa, sb) <> GREATEST(sa, sb)) AS leaky,
           COUNT(*) AS n_pairs,
           CAST(SUM(shared) AS BIGINT) AS sum_shared,
           CAST(SUM(union_sz) AS BIGINT) AS sum_union
    FROM lab
    GROUP BY 1, 2, 3
    """


@query("q_split_leakage", oracle=_leakage_oracle())
def q_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-leakage audit: near-duplicate pairs that CROSS the
    train/val/test boundary — the decontamination check a training
    pipeline must run before shipping an eval set (a test doc whose
    near-dup sits in train is a leaked answer; Lee 2021 §5 measures
    exactly this failure on C4).

    Composes the two existing primitives without re-deriving either:
    the pair set is _jaccard_pairs (exact shingle-Jaccard τ = 0.5,
    hot-shingle DF cap modeled in the oracle), and the split is the
    deterministic content-hash CASE shared with q_split_assign — so a
    pair's verdict here is consistent with both the dedup family and
    the split report by construction. Output is the full split×split
    matrix (split_lo ≤ split_hi, canonicalized with LEAST/GREATEST so
    (train,test) and (test,train) pairs land in one cell): the
    off-diagonal `leaky` rows are the contamination, and the diagonal
    rows (intra-split duplicate load) ride along for free — also
    keeping the result non-vacuous on any corpus that has near-dups at
    all.

    Scale shape: ZERO new shuffles beyond the cached pair set — the
    split label is a pure int64 hash projection of the ids already on
    each pair row (no join back to documents), and the final aggregate
    is ≤ 6 groups, map-side combined.
    """
    from hive_gateway_spark.operators.dedup import _jaccard_pairs

    t = load_tables(spark, sf_dir)
    sa = _split_col(F.col("doc_a"))
    sb = _split_col(F.col("doc_b"))
    lab = _jaccard_pairs(t).select(
        F.least(sa, sb).alias("split_lo"),
        F.greatest(sa, sb).alias("split_hi"),
        "shared",
        "union_sz",
    )
    return (
        lab.groupBy("split_lo", "split_hi")
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum("shared").cast("bigint").alias("sum_shared"),
            F.sum("union_sz").cast("bigint").alias("sum_union"),
        )
        .select(
            "split_lo",
            "split_hi",
            (F.col("split_lo") != F.col("split_hi")).alias("leaky"),
            "n_pairs",
            "sum_shared",
            "sum_union",
        )
    )


#: Water-filling budget: the target is half the corpus's whitespace
#: tokens (B = total DIV 2); cells are (source, lang) domains. The
#: water level λ — every cell contributes min(n_tok, λ) and the
#: budget is met EXACTLY — is the closed-form equal-level fill over
#: the sorted cells, the allocation rule behind capped domain mixing
#: (a big domain is leveled to λ, small domains pass through whole).
TOKEN_BUDGET_DIV = 2


@query(
    "q_token_budget_fill",
    oracle=f"""
    WITH tokc AS (
        SELECT source, lang,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tok
        FROM documents GROUP BY 1, 2
    ),
    b AS (
        SELECT CAST(SUM(n_tok) AS BIGINT) // {TOKEN_BUDGET_DIV} AS budget,
               COUNT(*) AS m
        FROM tokc
    ),
    ranked AS (
        SELECT *,
               ROW_NUMBER() OVER
                 (ORDER BY n_tok ASC, source ASC, lang ASC) AS idx,
               SUM(n_tok) OVER
                 (ORDER BY n_tok ASC, source ASC, lang ASC
                  ROWS UNBOUNDED PRECEDING) AS prefix
        FROM tokc
    ),
    kv AS (
        SELECT COALESCE(MAX(idx), 0) AS k
        FROM ranked, b WHERE prefix + n_tok * (m - idx) <= budget
    ),
    par AS (
        SELECT kv.k,
               b.budget
                 - COALESCE((SELECT prefix FROM ranked, kv
                             WHERE idx = kv.k), 0) AS rem,
               b.m - kv.k AS den
        FROM b, kv
    )
    SELECT source, lang, CAST(n_tok AS BIGINT) AS n_tok,
           CAST(CASE WHEN idx <= k THEN n_tok
                ELSE (rem // den)
                     + CASE WHEN idx - k <= rem % den THEN 1 ELSE 0 END
           END AS BIGINT) AS alloc_tok
    FROM ranked, par
    """,
)
def q_token_budget_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget WATER-FILLING across (source, lang) domains — the
    capped-mixing allocator every data-recipe pipeline needs ("take B
    tokens total, no domain dominates"): each domain contributes
    min(n_tok, λ) where the water level λ is chosen so the total is
    EXACTLY the budget, i.e. small domains pass through whole and
    large ones are leveled. The integer closed form: sort cells
    ascending, fully take the longest prefix k with
    S_k + n_k·(m−k) ≤ B, then split the remainder rem = B − S_k over
    the m−k leveled cells as base = rem DIV (m−k) with the first
    rem MOD (m−k) cells (in the same total order) getting +1 — so
    Σ alloc = B exactly, no fractional tokens, no RNG, and the
    allocation is a pure function of the corpus (re-runs and
    different cluster layouts agree). The oracle derives k/rem/den
    through scalar subqueries — an independent spelling of the same
    closed form.

    Scale shape: ONE corpus pass (map-side-combined token count per
    cell), then every window/scalar runs on the CELLS frame — bounded
    by |sources|·|langs|, dim-sized by construction — with the 1-row
    budget/threshold frames broadcast (the scalar cross-join house
    pattern). The single-partition window over cells is bounded by
    the domain count, never the corpus."""
    from pyspark.sql import Window as W

    t = load_tables(spark, sf_dir)
    cells = (
        t["documents"]
        .select(
            "source",
            "lang",
            F.size(F.split("text", " ")).alias("wt"),
        )
        .groupBy("source", "lang")
        .agg(F.sum("wt").cast("bigint").alias("n_tok"))
    )
    # Stage the dim-sized cells frame: budget, threshold, offset and
    # the final projection all consume it, and Spark would replay the
    # corpus token count for each (the q_tpcds_q59 staging
    # discipline — at 100 TB that is four corpus scans for one).
    from hive_gateway_spark.staging import stage

    cells = stage(cells, "sampling.token_budget.cells")
    b = cells.agg(
        F.expr(f"CAST(SUM(n_tok) DIV {TOKEN_BUDGET_DIV} AS BIGINT)").alias(
            "budget"
        ),
        F.count("*").alias("m"),
    )
    w = W.orderBy(F.col("n_tok").asc(), F.col("source").asc(), F.col("lang").asc())
    ranked = cells.withColumn("idx", F.row_number().over(w)).withColumn(
        "prefix",
        F.sum("n_tok").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    joined = ranked.crossJoin(F.broadcast(b))
    kf = joined.filter(
        F.col("prefix") + F.col("n_tok") * (F.col("m") - F.col("idx"))
        <= F.col("budget")
    ).agg(F.coalesce(F.max("idx"), F.lit(0)).alias("k"))
    j2 = joined.crossJoin(F.broadcast(kf))
    skf = j2.filter(F.col("idx") == F.col("k")).agg(
        F.coalesce(F.max("prefix"), F.lit(0).cast("bigint")).alias("sk")
    )
    rem = F.col("budget") - F.col("sk")
    den = F.col("m") - F.col("k")
    base = F.expr("(budget - sk) div (m - k)")
    plus1 = F.when((F.col("idx") - F.col("k")) <= rem % den, 1).otherwise(0)
    return (
        j2.crossJoin(F.broadcast(skf))
        .select(
            "source",
            "lang",
            "n_tok",
            F.when(F.col("idx") <= F.col("k"), F.col("n_tok"))
            .otherwise(base + plus1)
            .cast("bigint")
            .alias("alloc_tok"),
        )
    )
