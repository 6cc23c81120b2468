"""Driver-window invariant check: the first 50 ``queries()`` entries (the
driver's per-round correctness budget) must contain every gate whose last
driver row is >= 2 rounds old, plus the round's new gates — the rotation
contract VERDICT r4/r5 ordered. Run after editing
``plans/catalog.py::_DRIVER_WINDOW_PRIORITY``.

Usage: python tools/validate_window.py CORRECTNESS_r05.json [older...]
Each CORRECTNESS_r{N}.json (newest first) contributes "gate had a row in
round N"; gates in no file are treated as new (must be windowed or
explicitly listed below the 50-line with a comment — this script prints
them so the omission is a decision, not an accident).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WINDOW = 50


def main(argv: list[str]) -> int:
    import __spark_entry__ as e

    names = list(e.queries())
    head = set(names[:WINDOW])
    last_round: dict[str, int] = {}
    for age, path in enumerate(argv):  # newest first: age 0 = last round
        rows = json.load(open(path))
        if isinstance(rows, dict) and "results" in rows:
            gates = [r.get("name") or r.get("query") for r in rows["results"]]
        elif isinstance(rows, dict):  # CORRECTNESS_r{N}.json: {name: {...}}
            gates = list(rows)
        else:
            gates = [r.get("name") or r.get("query") for r in rows]
        for n in gates:
            if n and n not in last_round:
                last_round[n] = age
    stale = [n for n in names
             if last_round.get(n, -1) >= 1]  # no row LAST round
    never = [n for n in names if n not in last_round]
    missing_stale = [n for n in stale if n not in head]
    unwindowed_new = [n for n in never if n not in head]
    print(f"catalog={len(names)} window={WINDOW}")
    print(f"stale (no row last round, had one before): {len(stale)}; "
          f"NOT windowed: {missing_stale or 'none'}")
    print(f"never driver-verified: {len(never)}; NOT windowed "
          f"(must be a documented decision): {unwindowed_new or 'none'}")
    return 1 if missing_stale else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
