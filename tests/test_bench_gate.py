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


def test_cli_lists_and_runs(tmp_path, spark):
    """python -m solace_apache_beam_spark: --list covers the registry;
    a query runs and writes parquet (reusing the session fixture via
    direct main() call — a subprocess would boot a second JVM)."""
    from solace_apache_beam_spark.__main__ import main
    from solace_apache_beam_spark.registry import all_queries

    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert main(["--list"]) == 0
    assert set(buf.getvalue().split()) == set(all_queries())

    out = str(tmp_path / "res")
    assert main([
        "wordcount_global", "--sf-dir", "/root/testdata/sf0.001", "--out", out
    ]) == 0
    assert spark.read.parquet(out).count() > 0

    assert main(["no_such_query"]) == 2
