"""Registry window-rotation debt ledger (VERDICT r6 task #7).

The driver verifies only the first 50 entries of ``queries()``, so a
registered query can silently live forever outside the window with no
driver CORRECTNESS row. This ledger makes that state impossible to
grow: every registered query must EITHER already hold a driver row in
some ``CORRECTNESS_r*.json`` OR sit inside the current PRIORITY window
(i.e. be scheduled to earn its row this round). The "never verified"
set can therefore only shrink.
"""

from __future__ import annotations

import glob
import json
import os

from hive_gateway_spark import registry

registry.load_all()

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_rows() -> set[str]:
    seen: set[str] = set()
    for path in glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json")):
        with open(path) as f:
            seen.update(json.load(f).keys())
    return seen


def test_every_query_has_driver_row_or_window_slot():
    seen = _driver_rows()
    window = set(list(registry.ordered_queries())[:50])
    candidates = set(registry.ROTATION_CANDIDATES)
    debt = [
        name
        for name in registry.QUERIES
        if name not in seen and name not in window and name not in candidates
    ]
    assert not debt, (
        "registered queries with no driver CORRECTNESS row, no slot in the "
        "current 50-entry window, and no ROTATION_CANDIDATES entry "
        f"(rotate them in): {sorted(debt)}"
    )


def _hash_rows() -> set[str]:
    """Queries holding a HASH-GREEN driver row (rows-only `no_oracle`
    rows don't count — they are the weaker check)."""
    seen: set[str] = set()
    for path in glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json")):
        with open(path) as f:
            doc = json.load(f)
        seen.update(
            n for n, row in doc.items()
            if isinstance(row, dict) and row.get("hash_match")
        )
    return seen


def test_rotation_candidates_are_registered_and_unverified():
    """The candidate list is a queue, not a dumping ground: every entry
    must resolve to a registered query, and a query that already holds
    a driver row must not linger there (it belongs to normal rotation
    policy instead) — with ONE exception: a rows-only → exact-oracle
    UPGRADE (q_sim_topk_lsh r14) re-queues legitimately, because its
    prior rows are all `no_oracle` and the new oracle deserves a hash
    row; such an entry must actually carry an oracle and must not
    already be hash-green."""
    seen = _driver_rows()
    hash_green = _hash_rows()
    window = set(list(registry.ordered_queries())[:50])
    for name in registry.ROTATION_CANDIDATES:
        assert name in registry.QUERIES, f"unknown rotation candidate {name}"
        assert name not in window, f"{name} already holds a window slot"
        if name in seen:
            assert name in registry.ORACLES and name not in hash_green, (
                f"{name} already driver-verified — drop it (re-queueing is "
                "only for rows-only → oracle upgrades)"
            )


def test_priority_names_are_registered():
    """A PRIORITY entry that doesn't resolve to a registered query is a
    silent no-op (ordered_queries skips it and the window pulls an
    arbitrary next query up) — fail loudly instead."""
    ghosts = [n for n in registry.PRIORITY if n not in registry.QUERIES]
    assert not ghosts, f"PRIORITY names with no registered query: {ghosts}"


def test_window_is_exactly_fifty():
    """The driver contract truncates at 50; fewer wastes verification
    slots, and PRIORITY longer than 50 silently pushes the tail out."""
    assert len(registry.PRIORITY) == 50
    assert len(set(registry.PRIORITY)) == 50, "duplicate PRIORITY entries"
