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
    # -- r16 rotation (executing the r15-close pre-plan verbatim —
    # VERDICT r15 task #3): CORRECTNESS_r15 landed rows for all fifty
    # r15-window occupants (48 hash-green; q_ann_index_stats /
    # q_quantile_sketch rows-only as declared, zero failures), so
    # FOURTEEN occupants rotate OUT to the local parity gate:
    #   * q_quantile_sketch (its r14+r15 `no_oracle` rows are on
    #     record; a rows-only occupant wastes a hash slot — VERDICT
    #     r13 task #6's standing principle. Its GK summary gained an
    #     exact VALUES oracle this round — VERDICT r15 task #5 — so a
    #     future rotation can bring it back for a HASH row),
    #   * the THIRTEEN oldest r13-entrants in FIFO order
    #     (q_sim_range_search, q_text_bm25, q_curation_v5_trace,
    #     q_heavy_hitters, q_sim_topk_filtered, q_hybrid_search,
    #     q_heavy_hitters_by_lang, q_embed_coherence, q_split_leakage,
    #     q_scd2_history, q_phrase_search, q_retrieval_mmr,
    #     q_ann_recall — each r14+r15-hash-green).
    # The 14 freed slots take ALL FOURTEEN r15-written
    # ROTATION_CANDIDATES in FIFO order, emptying the queue. Expected
    # r16 row mix: forty-nine hash-green; q_ann_index_stats rows-only
    # (engine-private occupancy) with rows > 0.
    #
    # -- the nine §2.2/§2.3 contract queries that keep window
    # representation (each green in every windowed round) --
    "q_join_multiway",
    "q_join_range",
    "q_agg_group",
    "q_sessionize",
    "q_sim_cosine_pairs",
    "q_sim_topk",
    "q_dedup_fuzzy",
    "q_embed_agg",
    "q_text_lang_report",
    # -- standing rows-only monitor (IVF occupancy) --
    "q_ann_index_stats",
    # -- the 12 remaining r13-entrants keeping their slots (r14+r15
    # hash-green, staying for a third row), in FIFO order --
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
    # -- the r14-written queue, in FIFO order (14): six TPC-DS shapes,
    # the privacy triad's third rung, tokenizer fertility, the forward
    # as-of mode, the time-series batch (TWA / OHLC / SCD2 lookup /
    # windowFunnel), and q_sim_topk_lsh's rows-only → exact upgrade --
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
    # -- the r15-written queue, in FIFO order (14), taking the slots
    # freed above: TPC-DS batches 2–4 (Q1/34/42/95/51/36/67), the
    # sequenceCount / asof-nearest / M4 / session-funnel / CUSUM
    # time-series batch, the equi-depth histogram, and the IVF×ADC
    # shortlist pin --
    "q_tpcds_q1",
    "q_tpcds_q34",
    "q_tpcds_q42",
    "q_tpcds_q95",
    # TPC-DS batch 3: Q51's dual-cumulative overtake report (the
    # oracle keeps the published two-CTE FULL OUTER + window spelling;
    # the engine pivots both series out of ONE fact scan) and Q36's
    # rollup-with-per-level-RANK (GROUPING-scoped window partitions —
    # the grouping-sets × window composition nothing else exercises)
    "q_tpcds_q51",
    "q_tpcds_q36",
    # sequenceCount (ClickHouse '(?1)(?2)'): non-overlapping sequential
    # chains per user — lag-transition closed form (one window pass)
    # hash-compared against a recursive-CTE walk of the definition,
    # and hypothesis-pinned against the literal state machine on
    # tie-ful streams
    "q_sequence_count",
    # the FOURTH as-of mode (pandas merge_asof 'nearest'): backward +
    # forward carries as two frames over ONE sort, closer side via
    # CASE with the pandas backward tie rule — never a |Δt| join;
    # LATERAL-argmin oracle; tie regime hypothesis-pinned vs DuckDB
    "q_join_asof_nearest",
    # M4 downsampling (Jugel et al. VLDB'14, the Grafana/dashboard
    # standard): per-series per-bucket first/last/min/max in one pass
    # — exact integer µs buckets, (ts, event_id) tie discipline, four
    # UNION-rank-1 subqueries as the independent oracle spelling
    "q_downsample_m4",
    # funnel-within-session (Amplitude 'conversion in one session'):
    # sessionize (6 h gaps), then the session boundary IS the funnel
    # window — two boolean carries per (user, sid) on subset-compatible
    # clustering (one exchange total); ordered-EXISTS-over-session-CTE
    # oracle; gap fixture-tuned so the conversion column discriminates
    "q_session_funnel",
    # equi-depth histogram: the ANALYZE/CBO stats artifact — rank-based
    # equal-population buckets per type with [lo,hi]/count/ndv; the
    # only engine-portable exact construction (value-based splits need
    # a tie policy); one event_type shuffle feeding window + aggregate
    "q_histogram_equidepth",
    # DS Q67: top-N per group OVER a rollup — subtotals compete with
    # leaves in one ranking; plan-pinned to WindowGroupLimit (local
    # top-k before the window exchange), the optimization that makes
    # the published Q67 tractable
    "q_tpcds_q67",
    # CUSUM drift monitor (Page 1954): S_i = max(0, S_{i-1} + x - μ)
    # over per-type daily volumes, integer-exact via day-count
    # scaling; engine = the prefix-min closed form (two windows, one
    # exchange), oracle = the literal max-plus recursion as a
    # recursive CTE; identity hypothesis-pinned
    "q_cusum_drift",
    # IVF×ADC shortlist membership made hash-checkable (VERDICT r14
    # task #4): the q_pq_candidates playbook extended by the
    # cell-scoping half — seeded integer cell table + seeded codebook
    # both embedded as oracle VALUES; q_sim_topk_ivfpq's learned
    # artifacts stay rows-only, this pins the pipeline they serve with
    "q_ivfpq_candidates",
)

#: r17 rotation candidates. The r16 rotation drained the whole
#: 14-entry r15 queue into the window (pre-plan above executed
#: verbatim): at r16-open the queue is EMPTY and every query
#: registered through r15 holds (or is in-window to earn) a driver
#: row. Queries WRITTEN during r16 enter here (FIFO) and take r17
#: slots; the standing rotate-out pool is the r16 stay-list once its
#: members earn their r16 rows (tests/test_registry.py's debt ledger
#: enforces row-or-slot-or-queue for every registered query).
ROTATION_CANDIDATES: tuple[str, ...] = (
    # TPC-DS batch 4 (VERDICT r15 task #7) — the multi-channel shapes:
    # Q14's cross-channel iceberg (INTERSECT-driven item filter + the
    # rollup union over channels) and Q23's frequent-item-set +
    # best-customer composition; INTERSECT-inside-aggregation and
    # repeated-CTE staging nothing in the first 13 DS shapes exercises
    "q_tpcds_q14",
    "q_tpcds_q23",
    # q_quantile_sketch's rows-only → exact upgrade (VERDICT r15 task
    # #5): the driver-hashable surface now verifies the GK samples
    # against exact rank counts within the proven bound — re-enters
    # the window to earn its first HASH row
    "q_quantile_sketch",
    # DS Q74/Q11: year-over-year growth compared ACROSS channels —
    # the published 4-way aggregate self-join collapsed into ONE
    # conditional-aggregation fact scan; exact integer cross-multiply
    # replaces the double ratio compare
    "q_tpcds_q74",
    # the HLL++ verified-contract audit (the q_quantile_sketch
    # playbook applied to the other engine-specific sketch family):
    # exact distinct counts + a 3-sigma band check, driver-hashable
    "q_hll_audit",
    # pseudo-relevance feedback (RM3-lite): BM25 → top-k feedback →
    # expansion terms → weighted re-score — the suite's only
    # iterative-retrieval shape; ROUND→DECIMAL discipline with an
    # exact integer 2:1 mixing weight
    "q_prf_expansion",
    # token-budget water-filling across (source, lang) domains: the
    # capped-mixing allocator as an exact integer closed form
    # (Σ alloc = budget exactly; scalar-subquery oracle spelling)
    "q_token_budget_fill",
)


def ordered_queries() -> dict[str, QueryFn]:
    """QUERIES with PRIORITY entries first, the rest in registration order."""
    out = {n: QUERIES[n] for n in PRIORITY if n in QUERIES}
    out.update({n: f for n, f in QUERIES.items() if n not in out})
    return out


def query(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as queries()[name]; optionally its DuckDB oracle SQL.

    Duplicate names RAISE: module import order would otherwise decide
    which implementation silently wins (and which oracle the driver
    compares it against) — a collision must be renamed, never resolved
    by load order."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(
                f"query {name!r} already registered by "
                f"{QUERIES[name].__module__} — rename the new one"
            )
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import all operator modules so their @query registrations run."""
    from hive_gateway_spark import operators  # noqa: F401

    operators.load_all()
