"""Rotation audit — mechanizes the round-open/round-close gate-row
freshness check (the standing rule from VERDICT r8 Next #3: every
registered query's newest driver CORRECTNESS row must be at most one
round old, which the ~50-row snapshot window only delivers if the
stalest queries lead registry._PRIORITY).

    python scripts/rotation_audit.py

Prints, per registered query, the newest round with a driver row, then:
- the newest-round histogram;
- the STALE set (newest row older than the latest recorded round) —
  this is exactly the list the next round's _PRIORITY head must carry;
- whether the current _PRIORITY already covers it (order-insensitive);
- any _PRIORITY name that is not registered (would raise at runtime —
  all_queries() guards this too, but the audit says it earlier).

No Spark session is started; only the registry import runs.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    from solace_apache_beam_spark import registry

    registry._load()
    registered = set(registry._QUERIES)
    priority = list(registry._PRIORITY)

    newest: dict[str, int] = {}
    rounds = []
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)", path).group(1))
        rounds.append(rnd)
        for name, row in json.load(open(path)).items():
            if row.get("err") is None and name in registered:
                newest[name] = max(newest.get(name, -1), rnd)
    if not rounds:
        print("no CORRECTNESS files found")
        return 1
    latest = max(rounds)

    hist: dict[int, int] = {}
    for name in registered:
        hist[newest.get(name, -1)] = hist.get(newest.get(name, -1), 0) + 1
    print(f"registered: {len(registered)}  latest recorded round: r{latest:02d}")
    for rnd in sorted(hist, reverse=True):
        label = f"r{rnd:02d}" if rnd >= 0 else "NO ROW"
        print(f"  newest {label}: {hist[rnd]}")

    stale = sorted(n for n in registered if newest.get(n, -1) < latest)
    print(f"\nstale (newest row < r{latest:02d}): {len(stale)}")
    for n in stale:
        mark = "in _PRIORITY" if n in priority else "** NOT in _PRIORITY **"
        print(f"  {n}  (newest r{newest.get(n, -1):02d})  {mark}")

    unknown = [n for n in priority if n not in registered]
    if unknown:
        print(f"\n_PRIORITY names not registered: {unknown}")

    uncovered = [n for n in stale if n not in priority]
    if uncovered or unknown:
        print("\nAUDIT: ROTATION NEEDS UPDATING")
        return 1
    print("\nAUDIT: rotation covers every stale query")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
