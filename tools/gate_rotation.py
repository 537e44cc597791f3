"""Derive the next round's ``_GATE_PRIORITY`` window from the recorded
CORRECTNESS_r*.json history, so the hand-maintained 50-name list in
``plans/registry.py`` cannot drift from the rotation policy.

Policy (the prose at ``registry.py`` made executable):

1. the flagship ``q1_pricing_summary`` always holds slot 1;
2. rows that are RED in their most recent driver record (never healed)
   come next — a red row must be re-gated before anything else;
3. caller-declared ``changed`` rows (code re-planned this round — the
   tool cannot detect plan changes, so this stays an explicit input),
   in the given order;
4. rows that have NEVER had a driver record, in registry order;
5. everything else, stalest first (ascending latest-green round),
   tie-broken by registry order.

The window is the first ``size`` names of that ordering. Run as a
script to print the proposed window for review:

    python tools/gate_rotation.py --changed a,b,c
"""

from __future__ import annotations

import glob
import json
import os
import re
from collections.abc import Sequence

FLAGSHIP = "q1_pricing_summary"
WINDOW_SIZE = 50


def record_is_green(rec: dict) -> bool:
    """A driver correctness record is green when rows and schema match
    and the value hash matches (hash may be absent for rows-only
    checks of non-SQL-expressible ops)."""
    return bool(
        rec.get("rows_match")
        and rec.get("schema_match")
        and rec.get("hash_match") in (True, None)
    )


def load_history(
    repo_dir: str, before_round: int | None = None
) -> tuple[dict[str, int], dict[str, int]]:
    """Scan CORRECTNESS_r*.json; return (latest_green, latest_any):
    per query name, the highest round with a green record and the
    highest round with any record at all.

    ``before_round`` bounds the history to rounds strictly below it.
    A window staged for round N is derived from rounds < N, so the
    driver depositing CORRECTNESS_rN.json mid-round cannot retroactively
    invalidate the committed window (the round-9 lifecycle bug: the
    pin test was red by construction the moment the new round's file
    landed)."""
    latest_green: dict[str, int] = {}
    latest_any: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo_dir, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        if before_round is not None and rnd >= before_round:
            continue
        with open(path) as f:
            records = json.load(f)
        for name, rec in records.items():
            latest_any[name] = max(latest_any.get(name, 0), rnd)
            if record_is_green(rec):
                latest_green[name] = max(latest_green.get(name, 0), rnd)
    return latest_green, latest_any


def propose_window(
    registry_names: Sequence[str],
    latest_green: dict[str, int],
    latest_any: dict[str, int],
    changed: Sequence[str] = (),
    size: int = WINDOW_SIZE,
) -> list[str]:
    """The next gate window under the rotation policy (see module doc).
    ``registry_names`` is the full registry in registration order;
    ``changed`` lists rows whose code was re-planned this round.
    Unknown ``changed`` names raise (same misspelling hazard the
    registry's own unknown-name check guards against)."""
    known = set(registry_names)
    unknown = [c for c in changed if c not in known]
    if unknown:
        raise ValueError(f"changed names not in registry: {unknown}")
    reg_order = {n: i for i, n in enumerate(registry_names)}

    def tier(name: str) -> tuple:
        if name == FLAGSHIP:
            return (0, 0)
        green, any_rec = latest_green.get(name), latest_any.get(name)
        if any_rec is not None and (green is None or green < any_rec):
            return (1, reg_order[name])  # red in its latest record
        if name in changed:
            return (2, list(changed).index(name))
        if any_rec is None:
            return (3, reg_order[name])  # never driver-gated
        return (4, green, reg_order[name])  # stalest first

    ordered = sorted(registry_names, key=tier)
    return ordered[:size]


def main(argv: Sequence[str] | None = None) -> None:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--changed",
        default=None,
        help="comma-separated rows whose code was re-planned this round "
        "(default: the registry's _ROUND_CHANGED)",
    )
    ap.add_argument("--size", type=int, default=WINDOW_SIZE)
    ap.add_argument(
        "--repo", default=os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    ap.add_argument(
        "--report",
        action="store_true",
        help="print the staleness histogram and red/never-gated rows "
        "instead of a window proposal",
    )
    ap.add_argument(
        "--staged-round",
        type=int,
        default=None,
        help="derive from CORRECTNESS rounds strictly below this round "
        "(default: the registry's _STAGED_FOR_ROUND; 0 = all rounds)",
    )
    ns = ap.parse_args(argv)

    import sys

    sys.path.insert(0, ns.repo)
    from tile_processor_spark.plans.registry import (
        _ROUND_CHANGED,
        _STAGED_FOR_ROUND,
        all_specs,
    )

    names = list(all_specs())
    staged = ns.staged_round if ns.staged_round is not None else _STAGED_FOR_ROUND
    latest_green, latest_any = load_history(
        ns.repo, before_round=staged if staged else None
    )

    if ns.report:
        from collections import Counter

        hist = Counter(latest_green.get(n) for n in names)
        print("latest-green histogram (None = never driver-gated):")
        for rnd in sorted(hist, key=lambda r: (r is None, r)):
            print(f"  r{rnd}: {hist[rnd]}" if rnd else f"  never: {hist[rnd]}")
        red = [
            n
            for n in names
            if latest_any.get(n) is not None
            and latest_green.get(n, -1) < latest_any[n]
        ]
        if red:
            print("RED in latest record:", red)
        never = [n for n in names if n not in latest_any]
        if never:
            print("never gated:", never)
        return

    changed = (
        list(_ROUND_CHANGED)
        if ns.changed is None
        else [c for c in ns.changed.split(",") if c]
    )
    window = propose_window(names, latest_green, latest_any, changed, ns.size)
    for i, name in enumerate(window, 1):
        green = latest_green.get(name)
        tag = f"green r{green}" if green else "never gated"
        print(f"{i:3d}  {name}  [{tag}]")


if __name__ == "__main__":
    main()
