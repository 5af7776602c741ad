"""Mid-drain SIGKILL + restart-from-checkpoint, continuously verified.

scripts/run_soak.py --kill-restart is the recorded 100k-message run
(PLANS.md round 6); this is the same scenario at pytest scale so the
conservation contract — zero loss, zero invention, zero
dupes-after-dedup after an UNCLEAN kill (process group SIGKILL, JVM
included) — cannot silently rot between rounds. The script asserts the
contract itself (SolaceIOLifecycleDataflowIT.java:349-350 is the
reference); the test checks the orchestrator exits green and the
accounting line says what it must.

Soak tier (VERDICT r8 Next #4): these two tests spawn 4 JVMs each and
dominated the inner-loop suite (~170 s of the wall), so by default they
SKIP visibly; SPARK_GRAFT_SOAK=1 runs them (scripts/preflight and the
round-close verification set it — the contracts are still exercised
every round, just not on every pytest invocation)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

soak_tier = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SOAK") != "1",
    reason="soak tier: set SPARK_GRAFT_SOAK=1 (preflight/round-close do)",
)


@soak_tier
def test_kill_restart_conservation():
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "run_soak.py"),
            "4000",
            "2",
            "--kill-restart",
        ],
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert r.returncode == 0, r.stderr[-800:]
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    assert out["distinct_payloads"] == 4000
    assert out["rows_at_sink"] - out["distinct_payloads"] == out["replay_duplicates"]
    assert out["epochs_at_kill"] >= 3
    assert out["acked"] >= 4000


@soak_tier
def test_stateful_kill_restart_state_restored_exactly():
    """The stateful sibling (VERDICT r8 Next #6): running_counts
    (applyInPandasWithState) sits between the source and the idempotent
    sink, so the SIGKILL lands on live state-store versions. The script
    asserts the per-key lifetime totals equal the broker log's ground
    truth EXACTLY — lost state undercounts, double-applied replay
    overcounts, either fails."""
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "run_soak.py"),
            "4000",
            "2",
            "--stateful",
        ],
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert r.returncode == 0, r.stderr[-800:]
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    assert out["per_key_totals_exact"] is True
    assert out["epochs_at_kill"] >= 3
    assert out["acked"] >= 4000


@soak_tier
def test_sessionize_kill_restart_sessions_exact():
    """The sessionize sibling (round 10): the EventTimeTimeout
    sessionizer with the per-(key,queue) hwm map sits between the
    source and the idempotent sink at a nonzero watermark delay (the
    setting where broker replay actually reaches live state). The
    script recomputes every expected (key, start, end, n_events) from
    its publishing arithmetic — exact set equality, zero duplicate
    emissions, through a mid-drain process-group SIGKILL."""
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "run_soak.py"),
            "4000",
            "2",
            "--sessionize",
        ],
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert r.returncode == 0, r.stderr[-800:]
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    assert out["sessions_exact"] is True
    assert out["duplicate_rows"] == 0
    assert out["sessions_at_sink"] == out["sessions_expected"] == 80
    assert out["epochs_at_kill"] >= 3
    assert out["acked"] >= 4000


@soak_tier
def test_funnel_kill_restart_stages_exact():
    """The funnel sibling (round 10): the per-user stage machine with
    the per-(key,queue) hwm map under a mid-drain SIGKILL. Ground truth
    is per-user exact from the publishing pattern (user parity picks a
    completing or stalling event sequence — half the population sits
    below the top stage, so overcounts are visible, not hidden at the
    cap)."""
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "run_soak.py"),
            "4000",
            "2",
            "--funnel",
        ],
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert r.returncode == 0, r.stderr[-800:]
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    assert out["stages_exact"] is True and out["n_diverged"] == 0
    assert out["epochs_at_kill"] >= 3
    assert out["acked"] >= 4000
