"""Mid-drain SIGKILL + restart-from-checkpoint, continuously verified.

scripts/run_soak.py --kill-restart is the recorded 100k-message run
(PLANS.md round 6); this is the same scenario at pytest scale so the
conservation contract — zero loss, zero invention, zero
dupes-after-dedup after an UNCLEAN kill (process group SIGKILL, JVM
included) — cannot silently rot between rounds. The script asserts the
contract itself (SolaceIOLifecycleDataflowIT.java:349-350 is the
reference); the test checks the orchestrator exits green and the
accounting line says what it must."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


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
