"""Query registry — the driver-verified operator inventory.

Every operator in SURVEY.md §2.2/§2.3 registers itself here via the
``@query`` decorator; ``__spark_entry__.queries()`` / ``oracle_sql()``
just expose these dicts. A query with ``oracle=None`` is a deliberate
rows-only check (non-SQL-expressible op — LSH, UDF-backed binary ops);
everything else carries an ANSI-SQL DuckDB oracle and must hash-match.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

#: The driver verifies only the FIRST 50 entries of ``queries()`` (round-1
#: CORRECTNESS truncated at 50 of 74 — VERDICT.md "What's wrong" #2), so
#: exposure order is part of the verification contract. Priority order:
#:   1. every SURVEY §2.2 + §2.3 declared-contract query (35),
#:   2. the flagship LLM-pipeline / advanced operators the round-1 driver
#:      never reached (dedup/similarity/multimodal/asof/pivot/…),
#:   3. this round's new queries,
#:   4. one rotation slot for the remaining never-verified tail.
#: Queries past the window keep their oracles and stay in the local
#: pytest parity gate (tests/test_parity.py runs ALL of them); rounds
#: rotate the tail through the window so each gains a driver row.
PRIORITY: tuple[str, ...] = (
    # -- §2.2 relational core (driver-verified green in r01, unchanged) --
    "q_scan_project",
    "q_filter_predicate",
    "q_expr_string",
    "q_expr_case",
    "q_expr_coalesce",
    "q_expr_regex",
    "q_json_extract",
    "q_join_broadcast",
    "q_join_left",
    "q_join_semi",
    "q_join_anti",
    "q_join_multiway",
    "q_join_range",
    "q_agg_group",
    "q_agg_distinct",
    "q_agg_having",
    "q_agg_rollup",
    "q_agg_cube",
    "q_window_rate_limit",
    "q_window_rank",
    "q_window_analytic",
    "q_sessionize",  # oracle type fix this round — must re-verify
    "q_latency_stats",
    "q_sort_limit_topk",
    "q_set_union",
    "q_set_intersect",
    "q_set_except",
    "q_dedup_exact",
    "q_text_tokenize",
    "q_text_stats",
    # -- §2.3 LLM-extension contract --
    "q_sim_cosine_pairs",
    "q_sim_topk",
    "q_dedup_fuzzy",
    "q_embed_agg",
    "q_text_lang_report",
    # -- r04 rotation: the 15 tail queries that had never received a
    # driver CORRECTNESS row (VERDICT r03 "Next round" #1). The r02/r03
    # window occupants (q_dedup_ngram … q_udaf_wmean) rotate OUT — each
    # already holds two green driver rows — and stay in the local pytest
    # parity gate like every past-window query. q_expr_string2's function
    # surface (lpad/reverse/repeat/split_part/strpos/translate/left/
    # right) was folded into the contract slot q_expr_string so that all
    # fifteen tail queries' semantics get driver rows while
    # q_contamination (de-vacuated this round with planted cross-%97
    # near-dups — spark_rows must be > 0 now) keeps slot 50: 35 + 14 + 1.
    # -- r06 rotation: the six queries whose IMPLEMENTATIONS changed
    # this round take the slots of six twice-green unchanged scalar
    # queries (q_expr_array/math/datetime, q_join_full, q_unpivot,
    # q_window_sliding — each holds r4+r5 green rows and rotates to the
    # local parity gate). q_join_asof + q_window_range_frame were hit
    # by the NTZ fixture drift (fixed in session._normalize_timestamps);
    # q_dedup_ngram/clusters/training_pipeline got the length-filter +
    # staged-pair-set rework; q_multimodal_codecs is new (real
    # PPM/BMP/PNG/JPEG encode→decode round-trip with an arithmetic
    # oracle). q_time_bucket stays: ERR in r5, must re-earn green.
    "q_join_asof",
    "q_window_range_frame",
    "q_dedup_ngram",
    "q_dedup_clusters",
    "q_training_pipeline",
    "q_multimodal_codecs",
    # q_agg_kmv stays in-window (single green row, r6) because the r7
    # overflow fix (hash reduces user_id mod KMV_P before the affine map,
    # per ADVICE) changes its values — it must re-earn green.
    "q_agg_kmv",
    # -- r07 rotation (VERDICT r6 "Next round" #1): the seven queries
    # that had never received a driver CORRECTNESS row, plus the new
    # SQL-verified LSH band-bucket candidate-pairs query. The eight
    # twice-green unchanged occupants (q_join_salted, q_time_bucket,
    # q_minhash_signatures, q_domain_mix, q_pii_scrub, q_doc_repetition,
    # q_curation_v2, q_contamination — each green in r4 AND r6) rotate
    # to the local pytest parity gate per the two-green-rows policy.
    "q_dedup_canonical",
    "q_dedup_rank",
    "q_warc_ingest",
    "q_multimodal_thumbs",
    "q_text_unigram_score",
    "q_doc_length_buckets",
    "q_sim_topk_lsh",
    "q_lsh_candidates",  # new r7: band-bucket pairs with DuckDB oracle
)

#: r8 rotation candidates — queries REGISTERED AFTER the r7 window was
#: frozen, next in line for a driver slot (tests/test_registry.py's
#: debt ledger requires every registered query to hold a driver row, a
#: window slot, or an entry here). The list drains into the window in
#: FIFO order as twice-green occupants rotate out; with 15 rotatable
#: (non-contract) slots per round, a list longer than that drains over
#: two rounds — the invariant is that it only moves toward the window,
#: never silently grows stale.
#:
#: r8 PRE-PLAN (written at r7 close, to execute mechanically next
#: round once CORRECTNESS_r07 lands): the 35 contract queries keep
#: their slots; the 15 r7-window rotatables (q_join_asof …
#: q_lsh_candidates) should each hold a fresh r7 green row — any that
#: ALSO held an r6 row (q_join_asof, q_window_range_frame,
#: q_dedup_ngram, q_dedup_clusters, q_training_pipeline,
#: q_multimodal_codecs, q_agg_kmv) are twice-green and rotate out to
#: the local parity gate; the freed slots take the FIRST candidates
#: below in order. Queries that earned their FIRST green row in r7
#: (the eight r7 rotation entries) stay one more round per the
#: two-green-rows policy unless slots run short.
ROTATION_CANDIDATES: tuple[str, ...] = (
    "q_audio_features",  # r7 late addition: WAV codec + feature report
    # r7 sampling/selection family (operators/sampling.py + q_tf_idf):
    # the selection stages between curation and export — deterministic
    # content-hash split, stratified sample, sequence packing, TF-IDF.
    "q_split_assign",
    "q_sample_stratified",
    "q_pack_sequences",
    "q_tf_idf",
    # r7: video leg of the multimodal family (real Y4M codec,
    # functions/y4m.py) — frame-sampled integer features.
    "q_video_framesample",
    # r7: asymmetric containment dedup (doc-in-doc; shared/min ≥ 0.8).
    "q_dedup_containment",
    # r7: int8 embedding quantization (integer-exact codes + residual).
    "q_embed_quantize",
    # r7: corpus-statistics curation family (operators/corpus.py) —
    # exact duplicated-span dedup (Lee et al. 2022), CCNet boilerplate
    # chunk removal, bigram-LM NLL scoring, DSIR importance weights.
    "q_dedup_substring",
    "q_boilerplate_chunks",
    "q_lm_perplexity",
    "q_dsir_weights",
    # r7: real BPE subword tokenizer (operators/bpe.py) — greedy merge
    # learning on the word-frequency table + JVM-side merge-list
    # encoder; rows-only by design (iterative recurrence).
    "q_bpe_vocab",
    "q_bpe_encode",
    # r7 breadth block: triangle enumeration over the near-dup graph,
    # incremental new-batch-vs-corpus dedup decisions, time-series
    # gap-fill with carry-forward, blocked Levenshtein fuzzy join.
    "q_graph_triangles",
    "q_dedup_incremental",
    "q_ts_gapfill",
    "q_join_fuzzy",
    # r7: the composed published-recipe pipeline (boilerplate rewrite →
    # token gate → exact dedup → substring drop → DSIR top-200), whole
    # composition under one hash.
    "q_curation_v3",
    # r7: per-source KL drift monitor over hashed token buckets.
    "q_corpus_drift",
    # r7: the rewrite form of exact substring dedup — duplicated spans
    # cut everywhere but the canonical holder, docs rebuilt.
    "q_substring_trim",
    # r7: behavioral analytics staples on events — ordered funnel and
    # epoch-week cohort retention (dense grid).
    "q_funnel",
    "q_cohort_retention",
    # r7: explainable curation — every doc traced to the v3 stage that
    # decided its fate, with per-decision evidence.
    "q_curation_trace",
    # r7: boilerplate template catalog (audit view) and exact-decimal
    # z-score outlier detection (squared predicate, no sqrt).
    "q_template_catalog",
    "q_outliers",
    # r7: first-order Markov transition matrix over per-user paths.
    "q_event_transitions",
    # r7: image near-dup by perceptual hash (real PNG codec + batched
    # DCT; banded candidates, JVM Hamming verify). Rows-only.
    "q_image_phash",
    # r7: audio near-dup by multi-scale energy fingerprint (real WAV
    # codec round trip; same banded matching). Rows-only.
    "q_audio_fingerprint",
    # r7: cross-lingual near-dup reconciliation (exact cosine pairs ×
    # document languages — the translated-content case).
    "q_dedup_cross_lingual",
    # r7: Zipf rank-frequency fit (exact-regression corpus health).
    "q_zipf_fit",
)


def ordered_queries() -> dict[str, QueryFn]:
    """QUERIES with PRIORITY entries first, the rest in registration order."""
    out = {n: QUERIES[n] for n in PRIORITY if n in QUERIES}
    out.update({n: f for n, f in QUERIES.items() if n not in out})
    return out


def query(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as queries()[name]; optionally its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import all operator modules so their @query registrations run."""
    from hive_gateway_spark import operators  # noqa: F401

    operators.load_all()
