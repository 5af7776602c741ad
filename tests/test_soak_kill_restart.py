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


@soak_tier
def test_sessionize_kill_restart_hot_key_skew():
    """Hot-KEY variant (VERDICT r10 Next #3): sessionize keys on the
    queue, and the first queue receives 100x every other queue's
    messages — one applyInPandasWithState group dominates every
    microbatch through the SIGKILL. Same session-set exactness, plus
    the skew accounting must show the hot key really carried >=100:1."""
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "run_soak.py"),
            "6000",
            "2",
            "--sessionize",
            "--skew",
            "100",
        ],
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert r.returncode == 0, r.stderr[-800:]
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    assert out["sessions_exact"] is True and out["duplicate_rows"] == 0
    assert out["hot_key_events"] >= 100 * (
        (out["messages"] - out["hot_key_events"])
        / max(1, out["queues"] - 1)
    )
    assert out["epochs_at_kill"] >= 3


@soak_tier
def test_funnel_kill_restart_hot_user_skew():
    """Hot-USER variant (VERDICT r10 Next #3): one funnel key per queue
    receives half that queue's events (realized ratio per_q/16:1,
    asserted >=100:1 by the script), running the stalling pattern so a
    replay-overcount on the hot key itself is visible below the stage
    cap. Per-user stage exactness must hold through the SIGKILL."""
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "run_soak.py"),
            "6400",
            "2",
            "--funnel",
            "--skew",
            "100",
        ],
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert r.returncode == 0, r.stderr[-800:]
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    assert out["stages_exact"] is True and out["n_diverged"] == 0
    assert out["skew_ratio"] >= 100
    assert out["hot_user_events"] * out["queues"] * 2 == out["messages"]
    assert out["epochs_at_kill"] >= 3


@soak_tier
def test_incremental_dedup_streaming_matches_batch_through_kill():
    """The streaming LLM-ingestion composition (VERDICT r10 Next #7):
    per-microbatch incremental_dedup screening against the persisted
    corpus index, through a mid-drain SIGKILL + restart. The script
    asserts DISTINCT per-doc screening rows equal the batch operator
    over the full replayed log, one row per doc, and that the stream
    exercised all three statuses (exact_dup / near_dup / unique)."""
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "run_soak.py"),
            "1600",
            "2",
            "--incdedup",
        ],
        capture_output=True,
        text=True,
        timeout=540,
    )
    assert r.returncode == 0, r.stderr[-800:]
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    assert out["screen_exact_vs_batch"] is True
    assert out["docs_screened"] == 1600
    assert out["epochs_at_kill"] >= 3
    assert min(out["status_mix"].values()) > 0
