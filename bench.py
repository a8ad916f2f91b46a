#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Timing = full plan execution materialized via the NOOP SINK (see
REDUCTION below — count() let the optimizer prune pure projections
out of their own benchmark) — we charge the whole pipeline including
every output column, not just planning.

Hygiene (VERDICT r01 "Next round" #8): per query we record one COLD run
(codegen compile + file-index setup) and the MEDIAN of 3 warm runs;
``value``/``queries`` carry the warm medians (the steady-state number
that scales and is comparable round-over-round under co-tenant noise),
``queries_cold`` carries the cold runs.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from hive_gateway_spark import registry
from hive_gateway_spark.session import get_spark

#: Headline set: one per operator family, weighted toward shuffle-heavy
#: shapes (the ones that matter at 100 TB).
HEADLINE = [
    "q_gateway_pipeline",
    "q_agg_group",
    "q_join_multiway",
    "q_join_range",
    "q_join_asof",
    "q_window_rate_limit",
    "q_sessionize",
    "q_agg_cube",
    "q_dedup_exact",
    "q_dedup_ngram",
    "q_text_tokenize",
    "q_text_quality",
    "q_sim_cosine_pairs",
    "q_sim_topk",
    "q_embed_agg",
    "q_multimodal_meta",
    "q_msgpack_roundtrip",
    "q_subquery_correlated",
    "q_gateway_e2e",
    "q_training_pipeline",
    "q_dedup_clusters",
    "q_tpch_q3",
]

#: Round-2 additions — benched separately so `value_r01_comparable`
#: (sum over the original 22) stays comparable across rounds.
HEADLINE_R2 = [
    "q_promo_revenue",
    "q_udaf_wmean",
    "q_contamination",
    "q_domain_mix",
    "q_pii_scrub",
    "q_doc_repetition",
    "q_minhash_signatures",
    "q_curation_v2",
]

#: Round-6 additions — same isolation rationale.
HEADLINE_R6 = [
    "q_multimodal_codecs",
]

#: Round-7 additions: the new SQL-verified LSH banding and the composed
#: canonical election (the heaviest of the freshly window-rotated ops).
HEADLINE_R7 = [
    "q_lsh_candidates",
    "q_dedup_canonical",
    # late-r7 additions: the heaviest of the new selection/multimodal
    # family — tokenize-join (tf-idf), window packing, shingle-join
    # containment, codec mapInPandas (video), HOF quantization.
    "q_tf_idf",
    "q_pack_sequences",
    "q_dedup_containment",
    "q_video_framesample",
    "q_embed_quantize",
    # corpus-statistics family: gram inverted file (substring dedup),
    # chunk rebuild (boilerplate), bigram LM scoring, DSIR selection.
    "q_dedup_substring",
    "q_boilerplate_chunks",
    "q_lm_perplexity",
    "q_dsir_weights",
    # real BPE: cold includes the greedy merge training loop (~12 s,
    # vocab-sized jobs); warm = encode via the session-cached merges.
    "q_bpe_encode",
    # breadth block: triangle two-hop join over the staged pair set,
    # incremental-ingest decisions, dense-grid gap-fill, blocked
    # Levenshtein fuzzy join.
    "q_graph_triangles",
    "q_dedup_incremental",
    "q_ts_gapfill",
    "q_join_fuzzy",
    # the composed published-recipe pipeline (cold builds the staged
    # survivor frame; warm reads the session staging like a cluster
    # reads its intermediate corpus version)
    "q_curation_v3",
    # late-r7: drift monitor, substring rewrite, behavioral analytics,
    # exact-decimal outliers, transitions, image pHash near-dup.
    "q_corpus_drift",
    "q_substring_trim",
    "q_funnel",
    "q_cohort_retention",
    "q_outliers",
    "q_event_transitions",
    "q_image_phash",
    "q_audio_fingerprint",
]

#: Round-8 additions: readability projection, temperature mixture,
#: journey-prefix top-k.
HEADLINE_R8 = [
    "q_text_readability",
    "q_sample_temperature",
    "q_user_paths",
    "q_k_anonymity",
    "q_ann_buckets",
    "q_interval_overlap",
    "q_event_value_corr",
    "q_rolling_wau",
    "q_ngram_novelty",
    "q_audience_overlap",
    "q_char_entropy",
    "q_curation_funnel",
    "q_lsh_quality",
    "q_dedup_cluster_stats",
    "q_volume_anomaly",
    "q_pii_exposure",
    "q_curation_shift",
    "q_session_depth",
    "q_tpch_q10",
    "q_late_ship_report",
    "q_null_profile",
]

#: Round-9 additions: rule battery, perplexity cut, per-source sample,
#: two TPC-H classics, basket lift, RFM quintiles.
HEADLINE_R9 = [
    "q_gopher_rules",
    "q_ccnet_buckets",
    "q_reservoir_per_source",
    "q_tpch_q5",
    "q_tpch_q18",
    "q_brand_affinity",
    "q_rfm_segments",
    "q_chunk_windows",
    "q_first_touch",
    "q_compress_ratio",
    "q_tpch_q6",
    "q_tpch_q13",
    "q_graph_kcore",
    "q_vocab_coverage",
    "q_collocations",
    "q_mad_outliers",
    "q_event_gaps",
    "q_churn_matrix",
    "q_dedup_normalized",
]

HEADLINE_R10 = [
    "q_curation_v4",
    "q_curation_v4_funnel",
    "q_ntile_assign",
    "q_tpch_q1",
    "q_ann_index_stats",
]

#: Round-11 additions: conditional-agg fact-fact join, disjunctive
#: predicate extraction, the exact_rank distribution projection, the
#: packing-efficiency audit.
HEADLINE_R11 = [
    "q_tpch_q12",
    "q_tpch_q19",
    "q_rank_distribution",
    "q_pack_efficiency",
    "q_exact_quantiles",
    "q_tpch_q7",
    "q_tpch_q8",
    "q_tpch_q15",
    "q_tpch_q17",
    "q_tpch_q22",
    "q_hard_negatives",
    # benched since its r11 hash-verified rewrite (the MLlib spelling
    # this replaces was never in a headline block)
    "q_dedup_fuzzy",
]

#: Round-12 additions: the TPC-H completion batch (every published
#: query shape now registered — Q2/Q11/Q16/Q20 over the
#: lineitem-derived part-supplier catalog, Q4/Q21 with shipdate
#: lateness, Q9's five-way star).
HEADLINE_R12 = [
    "q_tpch_q4",
    "q_tpch_q9",
    "q_tpch_q2",
    "q_tpch_q11",
    "q_tpch_q16",
    "q_tpch_q20",
    "q_tpch_q21",
    "q_quality_classifier",
    "q_semantic_dedup",
    "q_dataset_card",
    "q_sim_topk_pq",
    "q_sim_topk_pq_rerank",
    "q_curation_v5",
    "q_video_phash_dedup",
]

HEADLINE_R13 = [
    "q_sim_topk_ivfpq",
    "q_curation_v5_funnel",
    "q_sim_range_search",
    "q_text_bm25",
    "q_quantile_sketch",
    "q_curation_v5_trace",
    "q_heavy_hitters",
    "q_sim_topk_filtered",
    "q_hybrid_search",
    "q_heavy_hitters_by_lang",
    # continuation-session additions (same round)
    "q_embed_coherence",
    "q_split_leakage",
    "q_scd2_history",
    "q_phrase_search",
    "q_retrieval_mmr",
    "q_ann_recall",
    "q_l_diversity",
    "q_zorder_layout",
    "q_retrieval_ndcg",
    "q_embed_outliers",
    "q_scd2_incremental",
    "q_wow_growth",
    "q_volume_trend",
    "q_benford_values",
    "q_join_asof_tolerance",
    "q_attribution_linear",
    "q_cohort_revenue",
    "q_conversion_lag",
]

#: Round-14 additions: the hash-checkable ADC candidate pipeline and
#: the TPC-DS starter shapes.
HEADLINE_R14 = [
    "q_pq_candidates",
    "q_tpcds_q3",
    "q_tpcds_q7",
    "q_tpcds_q19",
    "q_tpcds_q27",
    "q_t_closeness",
    "q_tokenizer_fertility",
    "q_join_asof_forward",
    "q_tpcds_q88",
    "q_sim_topk_lsh",
    "q_tpcds_q59",
    "q_time_weighted_avg",
    "q_ohlc_bars",
    "q_dim_lookup_scd2",
    "q_window_funnel",
]

HEADLINE_R15 = [
    "q_tpcds_q1",
    "q_tpcds_q34",
    "q_tpcds_q42",
    "q_tpcds_q95",
    "q_tpcds_q51",
    "q_tpcds_q36",
    "q_ivfpq_candidates",
    "q_sequence_count",
    "q_join_asof_nearest",
    "q_downsample_m4",
    "q_cusum_drift",
]

#: r16 closes the measurement-lag class for good (VERDICT r15 task #4
#: asked for the three late-r15 stragglers; the audit behind it found
#: 69 registered queries that had NEVER carried a bench point — mostly
#: the cheap relational/window/text primitives benched only through
#: the parity gate). The rule is now structural: every registry entry
#: appears in some HEADLINE_* block, and tests/test_bench_gate.py
#: pins registry ⊆ blocks so a query cannot land without its bench
#: point. First sub-list: the named stragglers + this round's new
#: queries; the rest complete the registry sweep.
HEADLINE_R16 = [
    "q_tpcds_q67",
    "q_histogram_equidepth",
    "q_session_funnel",
    "q_tpcds_q14",
    "q_tpcds_q23",
    "q_tpcds_q74",
    "q_hll_audit",
    "q_prf_expansion",
    "q_token_budget_fill",
    # -- full-registry completion (never previously benched) --
    "q_agg_distinct",
    "q_agg_grouping_sets",
    "q_agg_having",
    "q_agg_kmv",
    "q_agg_listagg",
    "q_agg_rollup",
    "q_agg_sketch",
    "q_agg_stats",
    "q_argmax",
    "q_audio_features",
    "q_bpe_vocab",
    "q_curation_trace",
    "q_dedup_cross_lingual",
    "q_dedup_embedding",
    "q_dedup_rank",
    "q_dedup_simhash",
    "q_doc_length_buckets",
    "q_expr_array",
    "q_expr_case",
    "q_expr_coalesce",
    "q_expr_datetime",
    "q_expr_math",
    "q_expr_regex",
    "q_expr_string",
    "q_filter_predicate",
    "q_gateway_compression",
    "q_join_anti",
    "q_join_broadcast",
    "q_join_full",
    "q_join_left",
    "q_join_salted",
    "q_join_semi",
    "q_json_extract",
    "q_latency_stats",
    "q_multimodal_decode",
    "q_multimodal_thumbs",
    "q_pivot",
    "q_sample_hash",
    "q_sample_stratified",
    "q_scan_project",
    "q_set_except",
    "q_set_intersect",
    "q_set_union",
    "q_sim_topk_ivf",
    "q_sort_limit_topk",
    "q_split_assign",
    "q_template_catalog",
    "q_text_fingerprint",
    "q_text_lang_report",
    "q_text_langid",
    "q_text_ngrams",
    "q_text_normalize",
    "q_text_stats",
    "q_text_unigram_score",
    "q_time_bucket",
    "q_token_count",
    "q_unpivot",
    "q_warc_ingest",
    "q_window_analytic",
    "q_window_ntile",
    "q_window_range_frame",
    "q_window_rank",
    "q_window_sliding",
    "q_zipf_fit",
]


#: Regression gate (VERDICT r6 task #6): warm ratio vs the previous
#: round's recorded bench above which the run FAILS (rc != 0), so a perf
#: regression can't hide behind a green correctness gate. The absolute
#: floor keeps sub-100 ms queries from flapping on scheduler noise.
REGRESSION_RATIO = 1.5
REGRESSION_FLOOR_SEC = 0.2

#: Cold-run gate (VERDICT r9 task #3 / "What's wrong" #2): session
#: staging makes WARM numbers reflect cache hits, so a staging-BUILD
#: blow-up could hide behind a healthy warm ratio. Colds are gated
#: with a looser ratio/floor (codegen compile + file-index setup make
#: them noisier) under the same median normalization.
COLD_REGRESSION_RATIO = 2.0
COLD_REGRESSION_FLOOR_SEC = 0.5

#: Sentinel renormalization for the remeasure pass (VERDICT r15 task
#: #1): BENCH_r15 confirmed a flag on UNTOUCHED code (q_rolling_wau)
#: because the remeasure — though itself a median of 3 — ran inside the
#: same co-tenant-noisy window as the sweep, so "reproduces" could mean
#: "machine still slow" rather than "code slow". Each remeasure pass now
#: concurrently re-measures SENTINEL_COUNT un-flagged queries whose
#: first-pass ratio sat closest to the round median (i.e. the most
#: machine-representative ones); the flagged query's fresh sample is
#: divided by the sentinels' fresh drift before the threshold applies.
#: A confirmed flag therefore means THIS query is slow while the machine
#: demonstrably is not — code, not co-tenant. Sentinels need a previous
#: time above the floor so scheduler noise can't dominate the drift
#: estimate.
SENTINEL_COUNT = 2
SENTINEL_MIN_PREV_SEC = 0.2

#: Intentional-change ledger: queries whose implementation changed
#: THIS round in a way that changes their cost model on purpose — the
#: warm/cold gates skip the prev-compare for exactly these names (the
#: fresh number re-seeds the per-sf ratchet at close, so the gate
#: re-arms next round automatically). An entry must say what changed
#: and why the new cost is the intended one; stale entries are pruned
#: at the next round open. This is the honest alternative to letting
#: a KNOWN change trip the reproduce-before-fail protocol (which
#: exists to catch UNINTENDED slowdowns).
REBASELINED: dict[str, str] = {
    "q_quantile_sketch": (
        "r16 rows-only -> exact-oracle upgrade: the driver-hashable "
        "surface now verifies the GK samples against exact rank "
        "counts (one additional broadcast-join fact scan by design); "
        "the raw sketch path is unchanged as quantile_sketch_raw"
    ),
}

#: Global-slowdown tripwire (ADVICE r7 #5): median-normalizing the
#: per-query gate makes it blind to a change that slows EVERY query
#: uniformly (e.g. a session-config regression inflates the median and
#: each query looks "normal" against it). When the round's median ratio
#: itself exceeds this, the gate downgrades to "warn_global_slowdown"
#: so whole-distribution shifts stay visible in the recorded JSON —
#: warn rather than hard-fail because co-tenant frequency scaling has
#: been OBSERVED shifting the whole distribution +15..65% with no code
#: change (see median-normalization note below), and a flaky rc=1
#: would teach operators to ignore the gate entirely.
GLOBAL_SLOWDOWN_RATIO = 1.4


def _round_of(path: str) -> int:
    m = re.search(r"_r(\d+)\.json$", path)
    return int(m.group(1)) if m else -1


def _run_cpus() -> int:
    """The core count this run executes under (the driver contract's
    $SPARK_GRAFT_CPUS, falling back to the host)."""
    try:
        return int(os.environ.get("SPARK_GRAFT_CPUS", "") or (os.cpu_count() or 0))
    except ValueError:  # pragma: no cover - malformed env
        return os.cpu_count() or 0


def _previous_bench(sf: float) -> tuple[str, dict] | None:
    """The best per-query baseline on disk FOR THIS SCALE FACTOR
    (VERDICT r9 task #3; per-sf selection ADVICE r11 #4).

    The driver's BENCH_r07..r09 records stored only a truncated `tail`,
    which silently pinned the effective baseline at BENCH_r06 and left
    every query added since UNGUARDED. bench.py therefore writes its own
    COMPLETE per-query record (BENCH_LOCAL[_sf*]_r{N}.json,
    `_write_local`) at every close and prefers the newest such file —
    BENCH_LOCAL beats a driver BENCH of the same round; newest round
    wins overall. A second run within one round ratchets against the
    first.

    Records from a DIFFERENT scale factor are SKIPPED, not returned:
    before this, one baseline landing at another sf permanently
    disabled the ratchet for the current sf (the foreign record kept
    winning the newest-round sort while the gate and the baseline
    write were both conditioned on sf comparability). Each sf now
    maintains its own ratchet; sf-less legacy records still match any
    run."""
    hist = _bench_history(sf, limit=1)
    return hist[0] if hist else None


def _bench_history(
    sf: float, limit: int = 2, any_cpus: bool = False
) -> list[tuple[str, dict]]:
    """Up to ``limit`` newest comparable records, newest first — the
    second entry backs the BASELINE-ANOMALY check: a confirmed warm
    flag must be a regression against the last TWO independent
    records, because one anomalously FAST sample becoming the
    baseline makes every honest later measurement look regressed
    (observed r16: q_brand_affinity recorded 0.381 in one run — r15:
    0.727, the runs around it: 0.88/0.65 — and the next run's honest
    0.65 'reproduced' a phantom 1.7× flag with the machine flat)."""
    import glob

    here = os.path.dirname(os.path.abspath(__file__))
    candidates = sorted(
        glob.glob(os.path.join(here, "BENCH_LOCAL_r*.json"))
        + glob.glob(os.path.join(here, "BENCH_LOCAL_sf*_r*.json"))
        + glob.glob(os.path.join(here, "BENCH_LOCAL_c*_r*.json"))
        + glob.glob(os.path.join(here, "BENCH_r*.json")),
        key=lambda p: (_round_of(p), "BENCH_LOCAL" in os.path.basename(p)),
        reverse=True,
    )
    cpus = _run_cpus()
    out: list[tuple[str, dict]] = []
    for path in candidates:
        try:
            with open(path) as f:
                text = f.read()
            try:
                doc = json.loads(text)
            except json.JSONDecodeError:
                # Tolerate a record file holding extra JSON lines (r16:
                # BENCH_LOCAL_r15.json carried the compact driver line
                # after the full record, making the WHOLE r15 history
                # invisible to the baseline-anomaly check). r17 (ADVICE
                # r16 #2): try EVERY line and prefer the parse with the
                # largest non-empty 'queries' map — a compact line
                # BEFORE the full record must not win either.
                doc = None
                for line in text.strip().splitlines():
                    try:
                        cand = json.loads(line)
                    except json.JSONDecodeError:
                        continue
                    if not isinstance(cand, dict):
                        continue
                    q = cand.get("queries")
                    best_q = (doc or {}).get("queries") if isinstance(doc, dict) else None
                    if isinstance(q, dict) and len(q) > len(best_q or {}):
                        doc = cand
                if doc is None:
                    continue
        except (OSError, json.JSONDecodeError, IndexError):
            continue
        if isinstance(doc, dict) and isinstance(doc.get("parsed"), dict):
            doc = doc["parsed"]  # driver-recorded shape wraps the JSON line
        if not (isinstance(doc, dict) and isinstance(doc.get("queries"), dict)):
            continue
        if doc.get("sf") not in (None, sf):
            continue  # foreign-sf record: this sf's ratchet lives elsewhere
        # foreign-core-count record (VERDICT r16 "what's wrong" #6: the
        # c8 diagnostic run compared against c32 baselines and flagged
        # shuffle-heavy queries that legitimately slow at 8 cores).
        # Each core count keeps its own ratchet. A legacy record
        # without the key was recorded on the full machine, so it
        # matches only full-machine runs — "matches any run" let an
        # r17 c8 diagnostic ratchet against the c32 r16 record and
        # exit rc=1 on the mapInPandas family (honestly ~2x slower at
        # 1/4 the cores).
        rec_cpus = doc.get("cpus") or (os.cpu_count() or cpus)
        if not any_cpus and rec_cpus != cpus:
            continue
        # Heal drift-poisoned write-backs in PRE-r17 records (the same
        # clamp warm_gate now applies at write time, applied
        # retroactively at load time): a query listed in the record's
        # regressions_first_pass but NOT confirmed had its timing
        # overwritten with remeasured/drift, and one burst-contaminated
        # drift sample (3.408 in the r16 driver record) seeded
        # baselines far below any honest steady state. The flag entry
        # carries the query's own prev — the last accepted honest
        # number — so clamp the loaded baseline to at least that.
        fp = doc.get("regressions_first_pass")
        if isinstance(fp, dict):
            conf = doc.get("regressions") or {}
            qs = doc["queries"]
            for n, f in fp.items():
                if (
                    n not in conf
                    and isinstance(f, dict)
                    and isinstance(f.get("prev"), (int, float))
                    and isinstance(qs.get(n), (int, float))
                ):
                    qs[n] = max(qs[n], f["prev"])
        if doc.get("reduction", "count") != REDUCTION:
            # measured under a different materialization protocol —
            # ratios against it are meaningless (count() undercharged
            # pure-projection queries); the ratchet re-seeds from the
            # first record under the current protocol
            continue
        out.append((os.path.basename(path), doc))
        if len(out) >= limit:
            break
    return out


def _write_local(record: dict) -> None:
    """Persist the complete per-query record as BENCH_LOCAL_r{N}.json
    (the default sf0.1 ratchet) or BENCH_LOCAL_sf{sf}_r{N}.json for any
    other scale factor — per-sf files keep one sf's run from clobbering
    another's baseline within a round (ADVICE r11 #4). N = the round in
    flight (one past the newest driver BENCH_r*). Never raises: a
    read-only checkout must not fail the bench itself."""
    import glob

    here = os.path.dirname(os.path.abspath(__file__))
    rounds = [_round_of(p) for p in glob.glob(os.path.join(here, "BENCH_r*.json"))]
    n = (max(rounds) if rounds else 0) + 1
    sf = record.get("sf")
    # Low-core diagnostic runs get their own stem (VERDICT r16 #6): the
    # driver's c8 scaling run used to OVERWRITE the same-round c32
    # record, clobbering the main ratchet's baseline.
    cpus = record.get("cpus")
    c_tag = (
        f"c{cpus}_"
        if cpus is not None and cpus != (os.cpu_count() or cpus)
        else ""
    )
    stem = (
        f"BENCH_LOCAL_{c_tag}r{n:02d}.json"
        if sf in (None, 0.1)
        else f"BENCH_LOCAL_{c_tag}sf{sf}_r{n:02d}.json"
    )
    try:
        with open(os.path.join(here, stem), "w") as f:
            json.dump(record, f)
    except OSError:  # pragma: no cover
        pass


def warm_gate(
    timings: dict[str, float],
    prev_queries: dict[str, float],
    remeasure,
) -> tuple[dict, dict, float]:
    """The warm regression gate with reproduce-before-fail.

    Returns ``(confirmed, first_pass, median_ratio)``. Per-query ratios
    are NORMALIZED by the round's median ratio over all shared queries
    (floored at 1.0 so a globally faster round can't mask a regression).
    A first-pass flag is a hypothesis, not a verdict (VERDICT r10
    "wrong" #1: BENCH_r10 landed rc=1 on four queries whose code had
    not changed — single-sample co-tenant noise): each flagged query is
    serially RE-MEASURED via ``remeasure(name)`` and confirmed only if
    the fresh sample — NORMALIZED by the fresh drift of concurrently
    re-measured sentinel queries (VERDICT r15 task #1: a remeasure
    taken while the machine is still co-tenant-slow must not confirm
    untouched code) — also exceeds the threshold. Retracted flags write
    their drift-adjusted steady-state value back into ``timings`` (the
    smaller of the estimates), so the printed totals and the next
    baseline carry the reproducible number."""
    median_ratio = 1.0
    shared = {
        name: now / prev_queries[name]
        for name, now in timings.items()
        if prev_queries.get(name)
    }
    if shared:
        rs = sorted(shared.values())
        median_ratio = max(1.0, rs[len(rs) // 2])

    def _flagged(now: float, before: float) -> bool:
        return (
            now > before * REGRESSION_RATIO * median_ratio
            and now - before > REGRESSION_FLOOR_SEC
        )

    first_pass: dict[str, dict] = {}
    for name, now in timings.items():
        before = prev_queries.get(name)
        if before and _flagged(now, before):
            first_pass[name] = {
                "prev": before,
                "now": now,
                "ratio": round(now / before, 2),
                "median_ratio": round(median_ratio, 2),
            }
    confirmed: dict[str, dict] = {}
    if not first_pass:
        return confirmed, first_pass, median_ratio

    # Sentinels: the un-flagged shared queries most representative of
    # the machine right now (ratio nearest the round median, previous
    # time above the floor). Their FRESH drift, measured in the same
    # window as the flagged queries' remeasure, distinguishes "machine
    # still slow" from "this code is slow".
    sentinels = sorted(
        (
            name
            for name, r in shared.items()
            if name not in first_pass
            and prev_queries[name] >= SENTINEL_MIN_PREV_SEC
        ),
        key=lambda n: (abs(shared[n] - median_ratio), n),
    )[:SENTINEL_COUNT]
    sentinel_fresh = {s: round(remeasure(s), 3) for s in sentinels}
    drifts = sorted(sentinel_fresh[s] / prev_queries[s] for s in sentinels)
    # floored at 1.0: a machine that is FAST at remeasure time must not
    # amplify the flagged query's fresh sample
    local_drift = max(1.0, drifts[len(drifts) // 2]) if drifts else 1.0

    def _confirms(fresh: float, before: float) -> bool:
        adjusted = fresh / local_drift
        return (
            adjusted > before * REGRESSION_RATIO
            and adjusted - before > REGRESSION_FLOOR_SEC
        )

    for name, flag in first_pass.items():
        remeasured = round(remeasure(name), 3)
        flag["remeasured"] = remeasured
        flag["remeasure_drift"] = round(local_drift, 3)
        flag["sentinels"] = {
            s: {"prev": prev_queries[s], "fresh": sentinel_fresh[s]}
            for s in sentinels
        }
        if _confirms(remeasured, flag["prev"]):
            # Confirm-twice (r16): a point co-tenant burst narrower
            # than the sentinel window can inflate ONE remeasure while
            # the sentinels read flat (observed r16: q_agg_stats swept
            # at 1.7 s, remeasured 5.95 s under sentinel drift 1.23,
            # then ran 0.6-1.0 s standalone minutes later — untouched
            # code "confirmed" by a burst). A genuine code regression
            # is deterministic and reproduces in BOTH serial samples;
            # a burst long enough to survive two separated median-of-3
            # remeasures AND leave the sentinels flat is
            # indistinguishable from code by any local protocol.
            # r17 (ADVICE r16 #3): the second remeasure runs minutes
            # after the sentinel window — re-sample one sentinel so the
            # second sample is normalized by FRESH drift, not a stale
            # estimate that could seed an optimistically low baseline
            # through the min() write-back (phantom flags next round).
            drift2 = local_drift
            if sentinels:
                s0 = sentinels[0]
                fresh2 = round(remeasure(s0), 3)
                drift2 = max(1.0, fresh2 / prev_queries[s0])
                flag["sentinel2"] = {
                    "name": s0,
                    "prev": prev_queries[s0],
                    "fresh": fresh2,
                }
            second = round(remeasure(name), 3)
            flag["remeasured2"] = second
            flag["remeasure_drift2"] = round(drift2, 3)
            adjusted2 = second / drift2
            if (
                adjusted2 > flag["prev"] * REGRESSION_RATIO
                and adjusted2 - flag["prev"] > REGRESSION_FLOOR_SEC
            ):
                confirmed[name] = flag
            else:
                timings[name] = min(
                    timings[name],
                    max(flag["prev"], round(second / drift2, 3)),
                )
        else:
            # The drift-adjusted steady-state estimate supersedes the
            # noisy sweep sample — CLAMPED at prev (r17): a retracted
            # flag's hypothesis was "slower than prev" and its
            # retraction only established "not slower"; "faster than
            # prev" was never measured by this protocol, so writing a
            # sub-prev value manufactures a baseline no honest run can
            # match. Observed in the r16 driver record: one sentinel
            # window read drift 3.408 and 15 retracted queries were
            # written back at remeasured/3.408 — phantom baselines of
            # 0.11-0.37 s against honest steady states of 0.4-1.2 s,
            # which made the NEXT round's first bench rc=1 on untouched
            # code (q_curation_v5_trace, q_agg_stats).
            timings[name] = min(
                timings[name],
                max(flag["prev"], round(remeasured / local_drift, 3)),
            )
    return confirmed, first_pass, median_ratio


#: Measurement-protocol marker. "noop-sink" (r14): queries materialize
#: through `df.write.format("noop")`, which consumes EVERY output
#: column — the count() reduction this replaces let Catalyst prune
#: pure projections under the count, so map-shaped queries were
#: undercharged (q_quality_classifier's per-word scoring fold was
#: being optimized OUT of its own benchmark: 0.37 s recorded at sf1
#: where the real fold costs ~5 s — discovered when predicate pushdown
#: moved the same fold somewhere it couldn't be pruned). Baselines
#: recorded under a DIFFERENT protocol are not comparable and are
#: skipped by _previous_bench, so the ratchet re-seeds once.
REDUCTION = "noop-sink"


def _timed(fn, spark, sf_dir: str) -> float:
    """One full construction+execution measurement of a registry query.

    Iterative operators (label propagation) do real work while building
    the plan, so construction is charged too; the noop sink
    materializes the whole pipeline — every column, no projection
    pruning, no rows serialized to the driver."""
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def retract_baseline_anomalies(
    regressions: dict[str, dict],
    timings: dict[str, float],
    history: list[tuple[str, dict]],
) -> None:
    """Baseline-anomaly retraction: a confirmed flag whose
    drift-adjusted fresh sample is NOT a regression against the
    SECOND-newest record means the newest baseline sample was
    anomalously FAST, not that this code got slow — a regression is
    "worse than historical steady state", never "worse than the
    single best sample ever recorded" (observed r16: one run logged
    q_brand_affinity at 0.381 between records of 0.727/0.88/0.65;
    the next honest 0.65 then 'reproduced' a phantom 1.7× flag with
    the machine flat by every sentinel). The now-passing run re-seeds
    the baseline with the honest number, aging the anomaly out; a
    genuine regression fails against BOTH records and stays
    confirmed. Mutates ``regressions``/``timings`` in place; the flag
    record keeps a ``baseline_anomaly`` marker for the audit trail."""
    if not regressions or len(history) < 2:
        return
    prev2 = history[1][1]["queries"]
    for name in list(regressions):
        before2 = prev2.get(name)
        if not before2:
            continue
        flag = regressions[name]
        # steadier of the two confirm-twice samples, each under ITS OWN
        # drift window (r17): a burst that contaminated ONE remeasure
        # must not anchor the anomaly check
        fresh = min(
            flag["remeasured"] / flag.get("remeasure_drift", 1.0),
            flag.get("remeasured2", flag["remeasured"])
            / flag.get(
                "remeasure_drift2", flag.get("remeasure_drift", 1.0)
            ),
        )
        if not (
            fresh > before2 * REGRESSION_RATIO
            and fresh - before2 > REGRESSION_FLOOR_SEC
        ):
            flag["baseline_anomaly"] = {
                "record": history[1][0],
                "prev2": before2,
            }
            timings[name] = min(timings[name], round(fresh, 3))
            del regressions[name]


def _maintenance_bench(spark, sf_dir: str) -> dict[str, float]:
    """Timed lakehouse MAINTENANCE verbs (VERDICT r15 task #4: apply_diff
    and build_bloom_index had no timed record). These are write-path
    verbs — they mutate tables, so they can't live in queries() — and
    they are scheduled jobs in production, so one cold shot IS the
    serve posture (no warm median). The scenario is the CDC replication
    loop on the documents table: seed source+replica, advance the
    source (append 10% + delete a key range), snapshot_diff → apply
    onto the replica, then build the distributed Bloom index on the
    head. Never raises: a failed verb records -1.0 and the bench goes
    on (maintenance timings are a record, not a gate)."""
    import shutil
    import tempfile

    from hive_gateway_spark.sources import dataset_export as de

    out: dict[str, float] = {}
    base = tempfile.mkdtemp(prefix="bench_maint_")

    def timed(verb: str, fn) -> None:
        t0 = time.perf_counter()
        try:
            fn()
            out[verb] = round(time.perf_counter() - t0, 3)
        except Exception:
            out[verb] = -1.0

    try:
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        n = docs.count()
        src, dst = os.path.join(base, "src"), os.path.join(base, "dst")
        timed("write_dataset", lambda: de.write_dataset(docs, src))
        de.write_dataset(docs, dst)  # replica fork at v1 (not timed twice)
        slice_df = docs.filter(F.col("doc_id") % 10 == 3).withColumn(
            "doc_id", F.col("doc_id") + n
        )
        timed("append_dataset", lambda: de.append_dataset(slice_df, src))
        timed(
            "delete_dataset",
            lambda: de.delete_dataset(spark, src, "doc_id", 0, max(1, n // 20)),
        )
        head_v = de._current_manifest(src)["version"]
        diff = de.snapshot_diff(spark, src, 1, head_v, "doc_id").localCheckpoint()
        timed("apply_diff", lambda: de.apply_diff(diff, dst, "doc_id"))
        timed(
            "build_bloom_index",
            lambda: de.build_bloom_index(spark, src, "doc_id"),
        )
        timed(
            "expire_snapshots",
            lambda: de.expire_snapshots(src, keep_last=1, orphan_grace_s=0),
        )
    except Exception:  # pragma: no cover - scenario setup failed
        out.setdefault("setup", -1.0)
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0
    registry.load_all()
    spark = get_spark("hive-gateway-spark-bench")

    # Serve-posture ANN setup (VERDICT r12 task #3): publish the IVF
    # index ONCE outside the timed region and point the session at it,
    # so every IVF consumer's cold number measures SERVING (load the
    # lakehouse artifact + probe) instead of silently re-paying the
    # O(N·cells·dim) training — at 100 TB the build is a scheduled
    # cluster job, never part of query latency. Warm numbers are
    # unchanged (session cache hits either way).
    import tempfile

    from hive_gateway_spark.operators.similarity import persist_ivf_index

    ann_idx = os.path.join(tempfile.mkdtemp(prefix="bench_ann_"), "index")
    persist_ivf_index(spark, sf_dir, ann_idx)
    spark.conf.set("hive_gateway.ann.index_path", ann_idx)
    # the publish leaves the trained index in the session cache — drop
    # it so the first IVF consumer pays the real serve path (load the
    # partitioned artifact), not a RAM hit the driver would never see
    from hive_gateway_spark.operators.similarity import _IVF_CACHE
    from hive_gateway_spark.staging import evict as _evict

    _per_ivf = _IVF_CACHE.get(spark)
    if _per_ivf:
        _evict(_per_ivf, 0)

    import gc

    # every HEADLINE_* block, current and future, swept and totaled
    # DYNAMICALLY: the hardcoded chain this replaces is the exact
    # failure class that silently dropped the r11 block from
    # sf1_scale_bench.py the round it was added (code-review r11).
    blocks = dict(
        sorted(
            (
                ("r" + a[len("HEADLINE_R"):].zfill(2), globals()[a])
                for a in globals()
                if a.startswith("HEADLINE_R")
            ),
            key=lambda kv: kv[0],  # numeric round order, r02..r11
        )
    )
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name in (HEADLINE + [q for b in blocks.values() for q in b]):
        fn = registry.QUERIES[name]
        # drop the previous query's dead broadcasts/UDF workers before
        # timing this one — without it, late queries in a 30-query
        # session measure the earlier queries' GC debt (observed 2.7 s
        # standalone vs 9.3 s late-session for the same plan)
        gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:  # pragma: no cover
            pass

        # cold: whole-stage codegen compilation + file-index setup
        cold[name] = round(_timed(fn, spark, sf_dir), 3)
        # warm steady state: median of 3 rides out co-tenant noise
        timings[name] = round(
            statistics.median(_timed(fn, spark, sf_dir) for _ in range(3)), 3
        )

    # Maintenance verbs: timed once, recorded, never gated (they run
    # on temp copies; co-tenant noise in a single shot is expected).
    maintenance = _maintenance_bench(spark, sf_dir)

    # Per-query regression gate vs the previous round's recorded bench.
    # The per-query ratio is NORMALIZED by the round's median ratio over
    # all shared queries: a co-tenant / frequency-scaling slowdown shifts
    # the WHOLE distribution (observed: every Python-worker-heavy query
    # drifting +15..65% together across a session, JVM queries +3%,
    # while no code changed), whereas a true regression is an outlier
    # against the round's own baseline shift. The median divisor is
    # floored at 1.0 so a globally FASTER round can never mask a real
    # per-query regression.
    history = _bench_history(sf)  # per-sf, per-core-count ratchet
    prev = history[0] if history else None
    # foreign-cpus marker (VERDICT r16 #6): records exist at this sf
    # but under a different core count — the gate is skipped, not
    # failed, and the record says so.
    baseline_foreign_cpus = bool(
        prev is None and _bench_history(sf, limit=1, any_cpus=True)
    )
    regressions: dict[str, dict] = {}
    record_first_pass: dict[str, dict] = {}
    cold_regressions: dict[str, dict] = {}
    median_ratio = 1.0
    cold_median_ratio = 1.0
    if prev is not None:
        prev_name, prev_doc = prev

        def _remeasure(name: str) -> float:
            # serial, after the full sweep's contention has drained;
            # same GC hygiene as the main loop
            gc.collect()
            try:
                spark.sparkContext._jvm.System.gc()
            except Exception:  # pragma: no cover
                pass
            fn = registry.QUERIES[name]
            return statistics.median(_timed(fn, spark, sf_dir) for _ in range(3))

        prev_warm = {
            k: v
            for k, v in prev_doc["queries"].items()
            if k not in REBASELINED  # intentional change: re-seed, don't flag
        }
        regressions, record_first_pass, median_ratio = warm_gate(
            timings, prev_warm, _remeasure
        )
        retract_baseline_anomalies(regressions, timings, history)
        prev_cold = {
            k: v
            for k, v in (prev_doc.get("queries_cold") or {}).items()
            if k not in REBASELINED
        }
        shared_cold = {
            name: now / prev_cold[name]
            for name, now in cold.items()
            if prev_cold.get(name)
        }
        if shared_cold:
            rs = sorted(shared_cold.values())
            cold_median_ratio = max(1.0, rs[len(rs) // 2])
        for name, now in cold.items():
            before = prev_cold.get(name)
            if (
                before
                and now > before * COLD_REGRESSION_RATIO * cold_median_ratio
                and now - before > COLD_REGRESSION_FLOOR_SEC
            ):
                cold_regressions[name] = {
                    "prev": before,
                    "now": now,
                    "ratio": round(now / before, 2),
                    "median_ratio": round(cold_median_ratio, 2),
                }
    # "value" stays the sum over the SAME 22 queries r01 benched, so the
    # round-over-round headline compares like-for-like; each round
    # block's total is reported separately (and inside "queries").
    # Summed AFTER the gate so a retracted flag's re-measured
    # steady-state number is what the totals carry.
    r01_comparable = round(sum(timings[n] for n in HEADLINE), 3)
    # keys match the historical record shape: HEADLINE_R7 → value_r7_ops
    block_totals = {
        f"value_r{int(tag[1:])}_ops": round(sum(timings[n] for n in qs), 3)
        for tag, qs in blocks.items()
    }
    record = (
            {
                "metric": "headline_query_wall_clock_total",
                "value": r01_comparable,
                "unit": "sec",
                **block_totals,
                "value_all": round(
                    r01_comparable + sum(block_totals.values()), 3
                ),
                "queries": timings,
                "queries_cold": cold,
                "maintenance": maintenance,
                "sf": sf,
                "cpus": _run_cpus(),
                "reduction": REDUCTION,
                "regression_baseline": prev[0] if prev else None,
                "baseline_foreign_cpus": baseline_foreign_cpus,
                "rebaselined": sorted(REBASELINED),
                "regression_median_ratio": round(median_ratio, 3),
                "regressions": regressions,
                "regressions_first_pass": record_first_pass,
                "cold_median_ratio": round(cold_median_ratio, 3),
                "cold_regressions": cold_regressions,
                "regression_gate": (
                    "fail"
                    if regressions
                    # cold is a WARNING, not a failure: cold times are
                    # single samples (warm is a median of 3), and one
                    # co-tenant CPU spike during a query's only cold
                    # measurement was observed inflating it 5.5× with
                    # the round median at 1.06 — a hard exit would
                    # teach operators to ignore the gate. The flag
                    # stays in the record for the next round to act on.
                    else (
                        "warn_cold"
                        if cold_regressions
                        else (
                            "warn_global_slowdown"
                            if median_ratio > GLOBAL_SLOWDOWN_RATIO
                            else "pass"
                        )
                    )
                ),
            }
    )
    # A FAILING run must not become the next baseline: persisting its
    # timings would let one re-run launder any warm regression into the
    # ratchet (the regressed value compares against itself → ratio 1.0
    # → pass). warn_cold runs persist — they are advisory — but the
    # FLAGGED queries' previous cold values are carried into the
    # written baseline, so the warning re-fires on every run until the
    # cold cost is actually fixed (or the old value naturally ages out
    # of a later passing run) instead of self-erasing after one rerun.
    if not regressions:
        baseline = record
        if cold_regressions and prev is not None:
            carried = dict(record["queries_cold"])
            for name in cold_regressions:
                old = (prev[1].get("queries_cold") or {}).get(name)
                if old:
                    carried[name] = old
            # the BASELINE carries the old colds; the printed record
            # below keeps this run's true measurements
            baseline = {**record, "queries_cold": carried}
        _write_local(baseline)
    print(json.dumps(record))
    # The driver records only the LAST ~2000 chars of stdout and
    # json-parses the final line (BENCH_r12/r13 landed "parsed": null
    # because the full record above is ~15 KB and was truncated
    # mid-line — VERDICT r13 "What's wrong" #1). Emit a compact
    # contract line LAST: headline-block per-query warm medians only
    # (~600 chars), with the complete record in BENCH_LOCAL_r{N}.json.
    compact = {
        "metric": record["metric"],
        "value": record["value"],
        "unit": "sec",
        "queries": {q: timings[q] for q in HEADLINE if q in timings},
        "sf": sf,
        "value_all": record["value_all"],
        "n_queries": len(timings),
        "maintenance": maintenance,
        "regression_median_ratio": record["regression_median_ratio"],
        "cold_median_ratio": record["cold_median_ratio"],
        "regression_gate": record["regression_gate"],
        "full_record": "BENCH_LOCAL (see repo)",
    }
    line = json.dumps(compact)
    if len(line) > 1900:  # stay inside the driver's tail window
        compact["queries"] = {}
        line = json.dumps(compact)
    print(line)
    spark.stop()
    if regressions:
        sys.exit(1)


if __name__ == "__main__":
    main()
