#!/usr/bin/env python
"""Corpus-statistics-family 10× scale smoke.

Mirrors the dedup/similarity smokes in SCALE.md: a synthetic ~100k-doc
corpus (20× the sf0.1 documents table) with planted structure —
~2% exact-substring dup pairs (shared 12-token runs), a boilerplate
footer on ~30% of docs, 5 language strata — runs the four REGISTERED
corpus operators unmodified at local[32]:

  q_dedup_substring    — rolling 8-gram inverted file + coverage
  q_boilerplate_chunks — shared-chunk cut + document rebuild
  q_lm_perplexity      — bigram LM NLL (decimal-exact)
  q_dsir_weights       — hashed-feature importance weights + top-100

and reports wall-clock plus family-level sanity (planted dup docs
detected, footer removal count, NLL separation of shuffled docs). The
corpus lands in a temp sf-dir with donor tables symlinked from
sf0.001, so what is smoked is exactly what ships.

Run: python scripts/corpus_scale_smoke.py [n_docs]
Output: one JSON line; numbers recorded in SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_DEFAULT = 100_000
VOCAB = 4_000
DOC_LEN = (30, 90)
FOOTER = "subscribe to our newsletter for daily updates and exclusive offers today"
LANGS = ["en", "de", "fr", "es", "zh"]
SRC_SF = "/root/testdata/sf0.001"


def synth_corpus(tmp: str, n: int) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(11)
    # the two top-zipf tokens are real function words so the Gopher
    # stopword rule (q_curation_v4's gate, V4_STOPS) sees them in
    # nearly every doc — the other operators treat them as any token
    words = np.array(["the", "a"] + [f"w{i:04d}" for i in range(2, VOCAB)])
    lens = rng.integers(DOC_LEN[0], DOC_LEN[1], n)
    # zipf-ish unigram distribution so the bigram LM has structure
    p = 1.0 / np.arange(1, VOCAB + 1)
    p /= p.sum()
    texts = []
    shared_run = None
    for i in range(n):
        toks = list(words[rng.choice(VOCAB, lens[i], p=p)])
        if i % 100 == 0:  # plant a 12-token run shared by i and i+1
            shared_run = list(words[rng.choice(VOCAB, 12, p=p)])
            toks[:12] = shared_run
        elif i % 100 == 1 and shared_run is not None:
            toks[-12:] = shared_run
        if i % 10 < 3:  # footer boilerplate on 30% of docs
            toks.extend(FOOTER.split())
        texts.append(" ".join(toks))
    lang = np.array(LANGS)[rng.integers(0, len(LANGS), n)]
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(lang),
            "source": pa.array(np.repeat("synth", n)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    # A real 100k-doc corpus arrives as MANY files; one 60 MB parquet
    # file gives Spark ~5 input splits on 32 cores and every scan-side
    # stage drags a straggler (measured 4.8–22 s flapping on the dsir
    # leg). documents.parquet is therefore a DIRECTORY of 32 parts —
    # the layout every operator's scan parallelism assumes.
    ddir = os.path.join(tmp, "documents.parquet")
    os.makedirs(ddir)
    for j in range(32):
        pq.write_table(tbl.slice(j * n // 32, (j + 1) * n // 32 - j * n // 32),
                       os.path.join(ddir, f"part-{j:02d}.parquet"))
    for name in (
        "region nation customer supplier part orders lineitem events embeddings"
    ).split():
        os.symlink(
            os.path.join(SRC_SF, f"{name}.parquet"),
            os.path.join(tmp, f"{name}.parquet"),
        )
    return tmp


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else N_DEFAULT
    from hive_gateway_spark import registry
    from hive_gateway_spark.session import get_spark

    registry.load_all()
    spark = get_spark("corpus-scale-smoke")
    out: dict = {"n_docs": n}
    def timed(key: str, fn) -> None:
        # cold + one warm repeat: cold includes codegen/JIT/staging
        # materialization and flaps under GC at this scale; warm is the
        # steady-state number that compares across sessions.
        t0 = time.time()
        fn()
        out[f"{key}_cold_sec"] = round(time.time() - t0, 2)
        t0 = time.time()
        fn()
        out[f"{key}_warm_sec"] = round(time.time() - t0, 2)

    with tempfile.TemporaryDirectory() as tmp:
        sf = synth_corpus(tmp, n)
        q = registry.QUERIES
        timed(
            "substring",
            lambda: out.__setitem__(
                "substring_dup_docs",
                q["q_dedup_substring"](spark, sf).filter("n_dup_spans > 0").count(),
            ),
        )
        # every planted pair must be found: docs 0,1,100,101,... share runs
        out["substring_planted_found"] = (
            out["substring_dup_docs"] >= 2 * (n // 100) * 0.95
        )
        timed(
            "boiler",
            lambda: out.__setitem__(
                "boiler_docs_cut",
                q["q_boilerplate_chunks"](spark, sf).filter("n_removed > 0").count(),
            ),
        )
        timed("perplexity", lambda: q["q_lm_perplexity"](spark, sf).count())
        timed(
            "dsir",
            lambda: out.__setitem__(
                "dsir_top_rows", len(q["q_dsir_weights"](spark, sf).collect())
            ),
        )
        # the COMPLETE composed recipe at 20× sf0.1 — the number that
        # says the composition (not just its stages) holds its shape
        timed(
            "curation_v4",
            lambda: out.__setitem__(
                "v4_selected", q["q_curation_v4"](spark, sf).count()
            ),
        )
        out["v4_funnel"] = {
            r["decision"]: r["n_docs"]
            for r in q["q_curation_v4_funnel"](spark, sf).collect()
        }
        # VERDICT r10 task #5: at the fixture width (n=3), 3-gram
        # shingles of this 4k-token zipf vocabulary are COMMON — ~25%
        # of the corpus gets flagged "contaminated" (an over-trigger of
        # the screen, not leakage). At the production width (n=8)
        # random 8-gram collisions vanish; what remains is REAL shared
        # text: the planted 12-token runs (5 shared 8-grams = exactly
        # CONTAM_MIN_SHARED) and the 11-word footer boilerplate on 30%
        # of docs (4 shared 8-grams — one chance gram away from the
        # threshold, the measured residual driver). So the sharp
        # assertion is on the NON-footer slice (i % 10 >= 3), where
        # n=8 flags < 1%; production removes boilerplate before
        # decontaminating for exactly this reason (the v4 recipe's
        # remove_boilerplate stage precedes it in the facade).
        from hive_gateway_spark.operators.corpus import _v4_state

        t0 = time.time()
        dec8 = _v4_state(spark, sf, shingle_n=8)["decisions"]
        f8 = {
            r["decision"]: r["n_docs"]
            for r in dec8.groupBy("decision")
            .count()
            .withColumnRenamed("count", "n_docs")
            .collect()
        }
        contam8_nofoot = dec8.filter(
            "decision = 'contaminated' AND doc_id % 10 >= 3 AND doc_id < {n}".format(n=n)
        ).count()
        out["v4_n8_sec"] = round(time.time() - t0, 2)
        out["v4_funnel_n8"] = f8
        share3 = out["v4_funnel"].get("contaminated", 0) / n
        share8 = f8.get("contaminated", 0) / n
        share8_nofoot = contam8_nofoot / (n * 0.7)
        out["contam_share_n3"] = round(share3, 4)
        out["contam_share_n8"] = round(share8, 4)
        out["contam_share_n8_nonfooter"] = round(share8_nofoot, 4)
        out["contam_n8_realistic"] = bool(
            share8 < share3 and share8_nofoot < 0.01
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
