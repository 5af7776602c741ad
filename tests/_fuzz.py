"""Example-count knob for the hypothesis fuzz arms (VERDICT r8 Next
#4: the default suite was drifting past 10 minutes, with the
randomized arms as the dominant cost).

Default runs use the QUICK count per test; SPARK_GRAFT_FUZZ_FULL=1
restores every arm's full iteration count (scripts/preflight and the
round-close verification run set it, so no coverage is lost — the full
counts are exercised every round, just not on every inner-loop pytest
invocation).

Hypothesis is still hypothesis: the quick tier reuses the example
database and shrinks failures exactly like the full tier; fewer
examples only means fewer fresh random draws per run.
"""

from __future__ import annotations

import os

FULL = os.environ.get("SPARK_GRAFT_FUZZ_FULL") == "1"

# Fractional lever on top of the tier switch (VERDICT r11 Next #6):
# SPARK_GRAFT_FUZZ_SCALE multiplies whichever tier's count is active
# (floor 1). Default 1.0 — coverage counts are IDENTICAL unless the
# caller explicitly dials; preflight never sets it, so the snapshot
# gate always pays the full counts.
_SCALE = float(os.environ.get("SPARK_GRAFT_FUZZ_SCALE", "1"))


def n_examples(full: int, quick: int) -> int:
    """`full` iterations under SPARK_GRAFT_FUZZ_FULL=1, else `quick`,
    both scaled by SPARK_GRAFT_FUZZ_SCALE (floor 1)."""
    return max(1, round((full if FULL else quick) * _SCALE))
