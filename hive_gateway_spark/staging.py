"""Deterministic block release for localCheckpoint()'ed staging frames.

Session-scoped staging caches (shingle sets, minhash signatures, BPE
vocab, curation traces, …) hold ``localCheckpoint()``'ed DataFrames so
repeated consumers skip the expensive build. Evicting one of those by
just dropping the Python reference leaves its blocks in the JVM block
manager until the ContextCleaner happens to GC the RDD — on a
long-lived session the leaked blocks accumulate for its lifetime
(ADVICE r8 #4). These helpers make the release DETERMINISTIC: a
localCheckpoint()'ed frame's analyzed plan is a single ``LogicalRDD``
node whose backing RDD we unpersist directly the moment the frame is
superseded or evicted.

All three helpers are best-effort no-ops off the classic py4j session
(Connect has no ``_jdf``) — there the ContextCleaner path still applies.
"""

from __future__ import annotations

import weakref as _weakref

from pyspark.sql import DataFrame

#: Default size cap shared by every session-scoped staging cache.
CACHE_CAP = 8

#: session → {slot name: checkpointed frame} for call-site staging
#: (frames rebuilt per call whose previous incarnation must be freed).
_SLOTS: "_weakref.WeakKeyDictionary" = _weakref.WeakKeyDictionary()


def release(obj) -> None:
    """Free the block-manager blocks behind a localCheckpoint()'ed
    DataFrame NOW instead of at ContextCleaner GC time. Tuples/lists
    are walked so composite cache entries (e.g. the IVF index's
    (centers, inverted_file) pair) free their checkpointed members —
    a bare tuple would otherwise no-op and defeat the deterministic
    release (code-review r9 #5); dicts walk their values for the same
    reason (the v4 state cache holds {'decisions': df, 'manifest': df}).
    Safe on anything else: non-DataFrames, non-checkpointed frames, and
    Connect sessions fall through silently."""
    if isinstance(obj, dict):
        for item in obj.values():
            release(item)
        return
    if isinstance(obj, (tuple, list)):
        for item in obj:
            release(item)
        return
    try:
        plan = obj._jdf.queryExecution().analyzed()
        if plan.nodeName() == "LogicalRDD":
            plan.rdd().unpersist(False)
    except Exception:
        pass  # non-classic session / not a checkpoint: nothing to free


def evict(per: dict, cap: int = CACHE_CAP) -> None:
    """Size-capped eviction for a session staging cache: when the cache
    exceeds ``cap``, release every held frame's blocks BEFORE dropping
    the dict entries (the leak ADVICE r8 #4 measured was clear()
    without release). Values that aren't checkpointed frames (e.g. the
    BPE merge list) pass through release() harmlessly.

    Contract (same as stage()): a caller that still holds a LAZY plan
    over an evicted checkpoint must not execute it after eviction —
    collect before triggering more staged queries. Every registered
    query and the driver contract collect eagerly, so the hazard is
    only holding un-executed frames across many staged calls."""
    if len(per) > cap:
        for v in per.values():
            release(v)
        per.clear()


def stage(df: DataFrame, slot: str) -> DataFrame:
    """localCheckpoint ``df`` and register it under (session, slot),
    releasing the PREVIOUS occupant's blocks — for call sites that
    rebuild a staging frame on every invocation (q_lm_perplexity's
    term frame, q_sample_temperature's source aggregate, the ANN
    bucket table): without the supersede each call leaked one more
    copy for the session's lifetime. The previous frame is released
    only after its successor materialized, so a caller that already
    collected the old result is never affected; holding the OLD frame
    across a NEW call to the same site is outside the contract."""
    per = _SLOTS.setdefault(df.sparkSession, {})
    out = df.localCheckpoint()
    prev = per.get(slot)
    if prev is not None:
        release(prev)
    per[slot] = out
    return out
