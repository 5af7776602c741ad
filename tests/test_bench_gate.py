"""The bench regression gate: per-query diff against the committed
anchor (BENCH_ANCHOR.json), flagged beyond REGRESSION_FACTOR."""

from __future__ import annotations

import json

import pytest

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


def test_compact_headline_stays_under_driver_tail_cap():
    """The driver records only the stdout tail (~2,000 chars); the final
    line must parse even with 71 queries, errors, and regressions."""
    full = {
        "metric": "headline_queries_total",
        "value": 53.7,
        "unit": "sec",
        "sf": 0.1,
        "queries": {f"query_with_a_long_name_{i:03d}": i / 7.0 for i in range(71)},
        "regressions": {f"query_with_a_long_name_{i:03d}": 2.5 for i in range(20)},
        "errors": {
            f"query_with_a_long_name_{i:03d}": "AnalysisException: " + "x" * 180
            for i in range(30)
        },
    }
    line = bench.compact_headline(full)
    assert len(line) <= bench.MAX_HEADLINE_CHARS
    parsed = json.loads(line)
    assert parsed["value"] == 53.7
    assert parsed["n_queries"] == 71
    assert parsed["n_errors"] == 30
    # pathological cap: the ladder must bottom out, not loop
    tiny = bench.compact_headline(full, cap=200)
    assert len(json.loads(tiny)) >= 4  # metric/value/unit/sf survive


def test_compact_headline_happy_path_carries_queries_slowest_first():
    full = {
        "metric": "headline_queries_total",
        "value": 10.0,
        "unit": "sec",
        "sf": 0.1,
        "queries": {"a": 4.0, "b": 6.0},
        "regressions": {},
        "errors": {},
    }
    parsed = json.loads(bench.compact_headline(full))
    # round 15 (VERDICT r14 Next #2): the final line carries per-query
    # timings slowest-first so the driver's PERF per-query/scaling
    # blocks see them (slowest-10 = the dict's prefix; `slowest` key
    # retired)
    assert parsed["queries"] == {"b": 6.0, "a": 4.0}
    assert list(parsed["queries"]) == ["b", "a"]
    assert parsed["regressions"] == {} and parsed["errors"] == {}


def test_compact_headline_truncates_queries_to_fit_the_tail():
    """83 real-length names never fit the ~2,000-char driver tail
    (names alone are ~1,875 chars) — the line must keep the SLOWEST
    prefix that fits, report the full n_queries, and stay parseable."""
    full = {
        "metric": "headline_queries_total",
        "value": 88.5,
        "unit": "sec",
        "sf": 0.1,
        "queries": {f"query_with_a_long_name_{i:03d}": (83 - i) / 7.0 for i in range(83)},
        "regressions": {},
        "errors": {},
    }
    line = bench.compact_headline(full)
    assert len(line) <= bench.MAX_HEADLINE_CHARS
    parsed = json.loads(line)
    assert parsed["n_queries"] == 83
    kept = parsed["queries"]
    assert 0 < len(kept) < 83
    # slowest-first prefix: every kept time >= every dropped time
    dropped_max = max(
        v for k, v in full["queries"].items() if k not in kept
    )
    assert min(kept.values()) >= dropped_max


def test_anchor_file_is_committed_and_covers_registered_queries():
    from solace_apache_beam_spark.registry import all_queries

    anchor = json.load(open(bench.ANCHOR_PATH))
    assert anchor["queries"], "anchor must carry per-query times"
    # every anchored name is (still) a registered query — a rename
    # would silently lose its gate
    missing = set(anchor["queries"]) - set(all_queries())
    assert not missing, f"anchored queries no longer registered: {missing}"


def test_priority_rotation_names_are_registered_and_lead_enumeration():
    """_ordered() silently skips unknown names, so a typo in a rotation
    would quietly drop a query from the driver's ~50-query snapshot
    window; every priority name must resolve, and the priority block
    must actually enumerate first."""
    from solace_apache_beam_spark.registry import _PRIORITY, all_queries

    qs = all_queries()
    missing = [n for n in _PRIORITY if n not in qs]
    assert not missing, f"_PRIORITY names not registered: {missing}"
    assert list(qs)[: len(_PRIORITY)] == list(_PRIORITY)


def test_bench_main_isolates_broken_queries(tmp_path, spark, monkeypatch, capsys):
    """A query that raises must be recorded under "errors" while every
    other query still gets timed — round 4 lost ALL telemetry because
    one AnalysisException aborted the whole bench."""
    from pyspark.sql import functions as F

    def good(spark, sf_dir):
        return spark.range(10).agg(F.count(F.lit(1)).alias("n"))

    def broken(spark, sf_dir):
        raise RuntimeError("synthetic breakage")

    import solace_apache_beam_spark.registry as registry

    monkeypatch.setattr(registry, "all_queries", lambda: {"good": good, "broken": broken})
    out = tmp_path / "BENCH_SELF.json"
    monkeypatch.setenv("SPARK_GRAFT_BENCH_OUT", str(out))
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.delenv("SPARK_GRAFT_BENCH_STRICT", raising=False)
    bench.main()
    last = capsys.readouterr().out.strip().splitlines()[-1]
    parsed = json.loads(last)
    assert parsed["n_queries"] == 1 and parsed["n_errors"] == 1
    assert "broken" in parsed["errors"] and "synthetic breakage" in parsed["errors"]["broken"]
    full = json.loads(out.read_text())
    assert "good" in full["queries"] and "broken" not in full["queries"]


def test_bench_flags_noisy_window(tmp_path, spark, monkeypatch, capsys):
    """VERDICT r13 Next #3: a query whose samples spread past
    NOISE_SPREAD x (by > NOISE_MIN_DELTA s) must get NOISE_RERUNS extra
    samples, keep the min, and be flagged in noisy_windows with its
    per-sample load/iowait environment — the bench self-adjudicates
    noise at measurement time instead of a post-hoc narrative."""
    import time

    from pyspark.sql import functions as F

    calls = {"n": 0}

    def flaky(spark, sf_dir):
        calls["n"] += 1
        if calls["n"] == 1:  # contention spike on the first sample only
            time.sleep(1.2)
        return spark.range(5).agg(F.count(F.lit(1)).alias("n"))

    def steady(spark, sf_dir):
        return spark.range(5).agg(F.count(F.lit(1)).alias("n"))

    import solace_apache_beam_spark.registry as registry

    monkeypatch.setattr(
        registry, "all_queries", lambda: {"flaky": flaky, "steady": steady}
    )
    out = tmp_path / "BENCH_SELF.json"
    monkeypatch.setenv("SPARK_GRAFT_BENCH_OUT", str(out))
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.delenv("SPARK_GRAFT_BENCH_STRICT", raising=False)
    bench.main()
    full = json.loads(out.read_text())
    assert set(full["noisy_windows"]) == {"flaky"}
    envs = full["noisy_windows"]["flaky"]
    assert len(envs) == bench.N_RUNS + bench.NOISE_RERUNS
    for env in envs:  # every sample carries its environment
        assert "sec" in env and len(env["load"]) == 2 and "iowait_pct" in env
    # min still wins: the recorded time is the smallest sample, and the
    # spiked first sample did not win. Relative assertions only — an
    # absolute wall bound made this test itself contention-flaky when
    # preflight's heavy group saturates the machine (round 14).
    secs = [env["sec"] for env in envs]
    assert full["queries"]["flaky"] == pytest.approx(min(secs))
    assert full["queries"]["flaky"] <= secs[0] - 1.0  # spike (+1.2 s) lost
    last = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(last)["noisy"] == ["flaky"]


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


def test_cli_demo_stream_runs(spark):
    """--demo-stream drives broker -> source -> windowed wordcount +
    hwm sessionize end-to-end from the CLI (the user-runnable streaming
    surface): returns 0 and prints both result tables with the expected
    content markers."""
    import contextlib
    import io

    from solace_apache_beam_spark.__main__ import main

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert main(["--demo-stream", "--cpus", "8"]) == 0
    out = buf.getvalue()
    assert "windowed wordcount" in out and "closed sessions" in out
    assert "alpha: 3" in out  # wordcount content, not just headers
    assert "orders" in out and "clicks" in out  # one session per queue
