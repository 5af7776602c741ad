"""The bench regression gate: per-query diff against the committed
anchor (BENCH_ANCHOR.json), flagged beyond REGRESSION_FACTOR."""

from __future__ import annotations

import json

import bench


def test_compute_regressions_flags_only_true_regressions():
    anchor = {"q1": 1.0, "q2": 2.0, "q3": 0.5, "q4": 0.2}
    timings = {"q1": 1.9, "q2": 4.5, "q3": 0.4, "q4": 0.45, "new_query": 9.9}
    out = bench.compute_regressions(timings, anchor, factor=2.0)
    # q1 within 2x, q3 improved, q4 over 2x but under the absolute-slack
    # floor (sub-second jitter), new_query unanchored -> only q2
    assert out == {"q2": 2.25}
    # the floor stops masking once the slowdown is material
    assert bench.compute_regressions({"q4": 2.2}, anchor, factor=2.0) == {"q4": 11.0}


def test_anchor_file_is_committed_and_covers_registered_queries():
    from solace_apache_beam_spark.registry import all_queries

    anchor = json.load(open(bench.ANCHOR_PATH))
    assert anchor["queries"], "anchor must carry per-query times"
    # every anchored name is (still) a registered query — a rename
    # would silently lose its gate
    missing = set(anchor["queries"]) - set(all_queries())
    assert not missing, f"anchored queries no longer registered: {missing}"
