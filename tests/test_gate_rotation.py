"""The gate-window rotation policy, pinned: flagship first, red rows
before everything, declared-changed rows next, never-gated rows next,
then stalest-first. Also pins that the registry's CURRENT
``_GATE_PRIORITY`` window equals what the tool derives from the
checked-in CORRECTNESS history — the hand-maintained list cannot
silently drift from policy."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from gate_rotation import (  # noqa: E402
    FLAGSHIP,
    WINDOW_SIZE,
    load_history,
    propose_window,
    record_is_green,
)

REPO = str(Path(__file__).resolve().parents[1])


def test_record_is_green_semantics():
    ok = {"rows_match": True, "schema_match": True, "hash_match": True}
    assert record_is_green(ok)
    # rows-only check (non-SQL-expressible op): hash absent is green
    assert record_is_green({"rows_match": True, "schema_match": True})
    assert not record_is_green({**ok, "hash_match": False})
    assert not record_is_green({**ok, "rows_match": False})
    assert not record_is_green({**ok, "schema_match": False})


def test_policy_tiers():
    names = [FLAGSHIP, "red_row", "changed_b", "changed_a", "never1", "old5", "old4"]
    latest_green = {FLAGSHIP: 8, "old5": 5, "old4": 4, "changed_a": 8, "changed_b": 8}
    latest_any = {**latest_green, "red_row": 8}
    latest_any["red_row"] = 8  # red: has a record, never green
    del latest_green["changed_a"]  # make changed_a ALSO red → tier 1 wins
    latest_any["changed_a"] = 8

    got = propose_window(
        names, latest_green, latest_any, changed=["changed_a", "changed_b"], size=7
    )
    # flagship, then reds (registry order), then changed (given order),
    # then never-gated, then stalest ascending
    assert got == [
        FLAGSHIP,
        "red_row",
        "changed_a",
        "changed_b",
        "never1",
        "old4",
        "old5",
    ]


def test_unknown_changed_name_raises():
    with pytest.raises(ValueError, match="not in registry"):
        propose_window([FLAGSHIP], {}, {}, changed=["nope"])


def test_stale_tie_breaks_by_registry_order():
    names = [FLAGSHIP, "b", "a"]
    latest_green = {FLAGSHIP: 8, "a": 4, "b": 4}
    got = propose_window(names, latest_green, dict(latest_green), size=3)
    assert got == [FLAGSHIP, "b", "a"]  # same round → registration order


def test_load_history_before_round_bound():
    latest_green, latest_any = load_history(REPO, before_round=9)
    full_green, full_any = load_history(REPO)
    assert all(r < 9 for r in latest_green.values())
    assert all(r < 9 for r in latest_any.values())
    # the bound only removes/ages entries, never adds
    assert set(latest_any) <= set(full_any)


def test_current_gate_priority_matches_derived_window():
    """The committed _GATE_PRIORITY's first WINDOW_SIZE names must be
    exactly the tool's proposal for the correctness history AS OF the
    round the window was staged for (registry._STAGED_FOR_ROUND), plus
    the round's declared changed-row list (registry._ROUND_CHANGED).
    Deriving from rounds < _STAGED_FOR_ROUND keeps this green when the
    driver deposits the staged round's own CORRECTNESS file mid-round
    (the round-9 lifecycle bug: the pin went stale the moment
    CORRECTNESS_r09.json landed)."""
    from tile_processor_spark.plans.registry import (
        _GATE_PRIORITY,
        _ROUND_CHANGED,
        _STAGED_FOR_ROUND,
        all_specs,
    )

    names = list(all_specs())
    latest_green, latest_any = load_history(REPO, before_round=_STAGED_FOR_ROUND)
    derived = propose_window(
        names, latest_green, latest_any, changed=_ROUND_CHANGED, size=WINDOW_SIZE
    )
    assert list(_GATE_PRIORITY[:WINDOW_SIZE]) == derived
