"""Driver-gate rotation bookkeeping.

The driver's correctness gate only records rows for the first 50 entries of
``__spark_entry__.queries()`` each round, so the priority list must rotate
so that every registry entry gets a driver-side row at least once every
``MAX_STALE_ROUNDS`` rounds.  This test parses every recorded
``CORRECTNESS_r*.json`` and fails loudly when the planned window for the
round it was rotated for would let any entry go stale.

Lifecycle: ``__spark_entry__._ROTATED_FOR`` records which round the
current window was planned for, and the window is validated against the
artifacts that existed when that plan was made (rounds strictly below
the marker).  This keeps the suite green at round end — the driver
appends ``CORRECTNESS_r{N}.json`` *after* the session's last commit, so
an always-``max+1`` check was red at the end of every round by
construction (rounds 6 and 7 both shipped that designed failure).  The
marker may lag the newest artifact by at most one round: equal to
``max(rounds)`` right after a round's gate ran, ``max(rounds)+1`` once
the next round's first commit rotates the window.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
WINDOW = 50
MAX_STALE_ROUNDS = 2


def _correctness_rounds() -> dict[int, set[str]]:
    rounds: dict[int, set[str]] = {}
    for p in REPO.glob("CORRECTNESS_r*.json"):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", p.name)
        if not m:
            continue
        rounds[int(m.group(1))] = set(json.loads(p.read_text()))
    return rounds


def test_rotation_marker_current():
    import __spark_entry__ as entry

    rounds = _correctness_rounds()
    assert rounds, "no CORRECTNESS_r*.json artifacts found"
    assert entry._ROTATED_FOR in (max(rounds), max(rounds) + 1), (
        f"_ROTATED_FOR={entry._ROTATED_FOR} but the newest CORRECTNESS "
        f"artifact is round {max(rounds)}: rotate _DRIVER_PRIORITY for "
        f"round {max(rounds) + 1} and bump the marker"
    )


def test_no_registry_entry_goes_stale():
    import __spark_entry__ as entry

    all_rounds = _correctness_rounds()
    assert all_rounds, "no CORRECTNESS_r*.json artifacts found"
    upcoming = entry._ROTATED_FOR
    # Validate the window against what was known when it was planned.
    rounds = {r: got for r, got in all_rounds.items() if r < upcoming}
    assert rounds, f"_ROTATED_FOR={upcoming} predates every artifact"

    names = list(entry.queries())
    window = set(names[:WINDOW])
    stale = []
    waiting_newborns = []
    for name in names:
        if name in window:
            continue  # gets a driver row in the upcoming round
        last = max((r for r, got in rounds.items() if name in got), default=None)
        if last is None:
            waiting_newborns.append(name)
        elif upcoming - last > MAX_STALE_ROUNDS:
            stale.append((name, last))
    assert not stale, (
        f"registry entries would exceed {MAX_STALE_ROUNDS} rounds without a "
        f"driver row as of round {upcoming}: {stale}; rotate them into the "
        "first 50 entries of _DRIVER_PRIORITY"
    )
    if waiting_newborns:
        # A never-gated entry may wait out-of-window for ONE round, but
        # only if no window slot is wasted: every in-window entry must
        # itself be must-gate (never-gated, or stale if skipped this
        # round).  Otherwise the newborn should take the slack slot.
        def must_gate(name: str) -> bool:
            last = max((r for r, got in rounds.items() if name in got), default=None)
            return last is None or upcoming - last >= MAX_STALE_ROUNDS

        slack = [n for n in names[:WINDOW] if not must_gate(n)]
        assert not slack, (
            f"never-gated entries wait outside the window ({waiting_newborns}) "
            f"while window slots are held by non-urgent entries: {slack}"
        )


def test_priority_list_well_formed():
    import __spark_entry__ as entry

    prio = entry._DRIVER_PRIORITY
    assert len(prio) == WINDOW
    assert len(set(prio)) == WINDOW, "duplicate names in _DRIVER_PRIORITY"
    names = set(entry.queries())
    unknown = [n for n in prio if n not in names]
    assert not unknown, f"_DRIVER_PRIORITY names not in registry: {unknown}"


def test_rotation_capacity_for_next_round():
    """Round N's window is only a valid plan if round N+1 remains
    SATISFIABLE: once this window is gated, the entries that must
    front-load the next window (everything whose last row would hit the
    staleness bound, plus every newborn left outside this window) have to
    fit in WINDOW slots.  This is the registry-growth governor — the hard
    ceiling is WINDOW * (MAX_STALE_ROUNDS + 1) entries, and this test
    fails BEFORE a registration pushes the rotation into an unsatisfiable
    corner, not one round after."""
    import __spark_entry__ as entry

    names = list(entry.queries())
    cap = WINDOW * (MAX_STALE_ROUNDS + 1)
    assert len(names) <= cap, (
        f"registry has {len(names)} entries; the rotation can cover at most "
        f"{cap} (window {WINDOW} x staleness {MAX_STALE_ROUNDS + 1}) — "
        "retire anchor twins (tests/test_exact_anchors.py) before "
        "registering more"
    )
    # Headroom governor (round-9 verdict item 2): a round must END with
    # at least HEADROOM free slots under the hard cap, so the NEXT round
    # can register that many operators before it has to retire anything.
    # Running at the cap is satisfiable on paper but freezes registration
    # — retire subsumed twins (see corpus.retire) to stay under.
    HEADROOM = 10
    assert len(names) <= cap - HEADROOM, (
        f"registry has {len(names)} entries, above the {cap - HEADROOM} "
        f"headroom bound (cap {cap} - headroom {HEADROOM}): retire anchor "
        "twins before registering more"
    )
    upcoming = entry._ROTATED_FOR
    rounds = {r: got for r, got in _correctness_rounds().items() if r < upcoming}
    window = set(names[:WINDOW])
    must_gate_next = []
    for name in names:
        if name in window:
            continue  # its last-gated round becomes `upcoming`
        last = max((r for r, got in rounds.items() if name in got), default=None)
        if last is None or (upcoming + 1) - last > MAX_STALE_ROUNDS:
            must_gate_next.append(name)
    assert len(must_gate_next) <= WINDOW, (
        f"round {upcoming + 1} would need {len(must_gate_next)} front-loaded "
        f"entries but the window holds {WINDOW}: {must_gate_next}"
    )
