"""Deterministic staging-block release (ADVICE r8 #4): evicting or
superseding a localCheckpoint()'ed staging frame must free its block-
manager blocks NOW, not at ContextCleaner GC time — on a long session
the leaked blocks otherwise accumulate for its lifetime."""

from __future__ import annotations

from hive_gateway_spark.staging import evict, release, stage


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def test_release_frees_checkpoint_blocks(spark):
    base = _n_persistent(spark)
    df = spark.range(1000).selectExpr("id", "id * 2 AS y").localCheckpoint()
    df.count()
    assert _n_persistent(spark) == base + 1
    release(df)
    assert _n_persistent(spark) == base


def test_release_tolerates_non_frames(spark):
    release([("a", "b", 1)])  # BPE merge list rides through eviction
    release(None)
    release(spark.range(3))  # not checkpointed: nothing to free


def test_evict_releases_lru_entries_only(spark):
    """LRU eviction (r14, ex clear-all): over cap, the OLDEST entries
    release and drop until the cache fits; a touch()ed entry survives
    because hits move it to the MRU end."""
    from hive_gateway_spark.staging import touch

    base = _n_persistent(spark)
    per = {
        i: spark.range(i, i + 10).localCheckpoint() for i in range(5)
    }
    assert _n_persistent(spark) == base + 5
    touch(per, 0)  # a hit on the oldest entry — must survive
    evict(per, cap=3)  # over cap by 2: entries 1 and 2 (now oldest) go
    assert set(per) == {3, 4, 0}
    assert _n_persistent(spark) == base + 3
    for v in per.values():
        release(v)
    per = {0: spark.range(5).localCheckpoint()}
    evict(per, cap=3)  # under cap: untouched
    assert 0 in per and _n_persistent(spark) == base + 1
    release(per[0])


def test_stage_supersedes_previous_slot_occupant(spark):
    base = _n_persistent(spark)
    a = stage(spark.range(100), "test.slot")
    assert _n_persistent(spark) == base + 1
    b = stage(spark.range(200), "test.slot")  # supersedes a
    assert _n_persistent(spark) == base + 1
    assert b.count() == 200
    release(b)
    # distinct slots coexist
    c = stage(spark.range(10), "test.slot2")
    d = stage(spark.range(20), "test.slot3")
    assert c.count() == 10 and d.count() == 20
    release(c)
    release(d)


def test_repeated_query_calls_do_not_accumulate_blocks(spark, sf_dir):
    """The measured leak: q_sample_temperature re-checkpointed its
    source aggregate on every call. Three calls must not hold three
    copies."""
    from hive_gateway_spark import registry

    registry.load_all()
    q = registry.QUERIES["q_sample_temperature"]
    q(spark, sf_dir).collect()
    after_first = _n_persistent(spark)
    for _ in range(3):
        q(spark, sf_dir).collect()
    assert _n_persistent(spark) == after_first


def test_stage_reuses_plan_identical_checkpoint(spark):
    """r11: a repeat stage() call with a semantically identical plan
    must return the SAME materialized checkpoint (no re-checkpoint, no
    extra persistent RDD) — the warm-path fix that took
    q_rfm_segments from 1.85 s to 0.91 s."""
    base = _n_persistent(spark)
    df = spark.range(500).selectExpr("id", "id * 3 AS y")
    a = stage(df, "test.reuse")
    assert _n_persistent(spark) == base + 1
    b = stage(spark.range(500).selectExpr("id", "id * 3 AS y"), "test.reuse")
    assert b is a  # cache hit: the very same frame
    assert _n_persistent(spark) == base + 1
    release(a)


def test_stage_never_serves_released_checkpoint(spark):
    """ADVICE r11 #3: release() must drop the slot entry, so a later
    plan-identical stage() call re-checkpoints instead of handing back
    a frame whose blocks were freed (a released localCheckpoint cannot
    be recomputed)."""
    base = _n_persistent(spark)
    a = stage(spark.range(70).selectExpr("id * 7 AS k"), "test.released")
    assert a.count() == 70
    release(a)
    assert _n_persistent(spark) == base
    b = stage(spark.range(70).selectExpr("id * 7 AS k"), "test.released")
    assert b is not a
    assert b.count() == 70  # fresh, executable checkpoint
    release(b)


def test_stage_hash_collision_guard(spark):
    """A 32-bit semanticHash() collision between genuinely different
    plans must NOT serve the other plan's data: the reuse path confirms
    with sameSemantics against the stored input plan. Simulated by
    forging a slot entry whose recorded key matches the incoming plan's
    hash but whose plan/checkpoint belong to a different query."""
    from hive_gateway_spark.staging import _SLOTS

    wrong = spark.range(10).selectExpr("id AS v")
    incoming = spark.range(99).selectExpr("id * 2 AS v")
    _SLOTS.setdefault(spark, {})["test.collide"] = (
        incoming.semanticHash(),  # forged: collides with incoming
        wrong,
        wrong.localCheckpoint(),
    )
    out = stage(incoming, "test.collide")
    assert out.count() == 99  # the incoming plan's data, not the forgery's
    release(out)


def test_direct_release_clears_plan_memos(spark):
    """ADVICE r11 #5: memo invalidation lives in release() itself (the
    single choke point for freeing checkpoint blocks) — a memoized plan
    over a checkpoint freed by a DIRECT release() call, with no slot
    supersede involved, must drop instead of failing on next execution."""
    from hive_gateway_spark.staging import _FRAMES, memo_frame

    ck = spark.range(40).localCheckpoint()
    m = memo_frame(spark, ("q_direct", "sf"), lambda: ck.selectExpr("id AS w"))
    assert m.count() == 40
    release(ck)
    assert ("q_direct", "sf") not in _FRAMES.get(spark, {})


def test_stage_supersede_clears_plan_memos(spark):
    """A memoized final plan may reference a staged checkpoint; when a
    DIFFERENT plan supersedes that slot (the old blocks are released,
    and a released localCheckpoint cannot be recomputed), every memo
    for the session must drop so no caller executes a dead plan."""
    from hive_gateway_spark.staging import _FRAMES, memo_frame

    a = stage(spark.range(50), "test.memo_slot")
    built = []

    def build():
        built.append(1)
        return a.selectExpr("id * 2 AS z")

    m1 = memo_frame(spark, ("q_test", "sf"), build)
    m2 = memo_frame(spark, ("q_test", "sf"), build)
    assert m1 is m2 and len(built) == 1  # memo hit
    assert m1.count() == 50
    b = stage(spark.range(60), "test.memo_slot")  # supersede → memos drop
    assert ("q_test", "sf") not in _FRAMES.get(spark, {})
    m3 = memo_frame(spark, ("q_test", "sf"), lambda: b.selectExpr("id AS z"))
    assert m3.count() == 60
    release(b)
