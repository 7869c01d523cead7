"""bench.py harness logic (pure python — no Spark session)."""

import bench


def test_best_of_two_agreeing_reps_no_third():
    calls = []
    times = iter([1.00, 1.05])

    class _Clock:
        t = 0.0

    def run():
        calls.append(1)
        _Clock.t += next(times)

    orig = bench.time.time
    bench.time.time = lambda: _Clock.t
    try:
        best = bench._best_of(run)
    finally:
        bench.time.time = orig
    assert len(calls) == 2
    assert abs(best - 1.00) < 1e-9


def test_best_of_disagreeing_reps_buys_third():
    calls = []
    times = iter([2.00, 1.00, 0.90])  # 2x disagreement -> third rep

    class _Clock:
        t = 0.0

    def run():
        calls.append(1)
        _Clock.t += next(times)

    orig = bench.time.time
    bench.time.time = lambda: _Clock.t
    try:
        best = bench._best_of(run)
    finally:
        bench.time.time = orig
    assert len(calls) == 3
    assert abs(best - 0.90) < 1e-9


def test_compact_summary_fits_driver_tail_and_carries_ratio():
    """The driver keeps only the last 2000 chars of bench stdout; the
    compact second line must fit that window COMPLETE, parse as JSON,
    and carry the suite total + ratio vs the committed baseline."""
    import json

    with open(bench.BASELINE_FILE) as f:
        base = json.load(f)
    result = {
        "metric": "headline_suite_seconds",
        "value": base["value"],
        "unit": "sec",
        "queries": base["queries"],
        "sf": "/root/testdata/sf0.1",
        "loadavg_start": 0.5,
    }
    summary = bench.compact_summary(result)
    line = json.dumps(summary)
    assert len(line) < 1900
    reparsed = json.loads(line)
    assert reparsed["metric"] == "headline_suite_seconds"
    assert reparsed["value"] == base["value"]
    assert reparsed["n_queries"] == len(base["queries"])
    # identical timings -> ratio exactly 1.0
    assert abs(reparsed["ratio_vs_baseline"] - 1.0) < 1e-9
    assert reparsed["worst_query"] in base["queries"]
    assert len(reparsed["queries"]) <= 10


def test_compact_summary_without_baseline(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "BASELINE_FILE", str(tmp_path / "absent.json"))
    summary = bench.compact_summary(
        {"metric": "m", "value": 1.0, "queries": {"a": 1.0}, "sf": "x"}
    )
    assert "ratio_vs_baseline" not in summary
    assert summary["n_queries"] == 1


def test_adjudicate_outliers_selection_and_summary(tmp_path, monkeypatch):
    # only >2x rows with >0.5s absolute delta get re-measured; the
    # isolated reading and ratios ride the artifact and the compact
    # summary
    base = {"queries": {"a": 1.0, "b": 0.2, "c": 4.0, "d": 1.0}}
    bfile = tmp_path / "base.json"
    bfile.write_text(bench.json.dumps(base))
    monkeypatch.setattr(bench, "BASELINE_FILE", str(bfile))
    monkeypatch.setattr(bench, "_best_of", lambda run: 1.1)
    result = {
        "queries": {
            "a": 2.6,   # 2.6x, delta 1.6 -> adjudicated
            "b": 0.55,  # 2.75x but delta 0.35 -> grace floor, skipped
            "c": 4.4,   # 1.1x -> fine
            "d": 0.9,   # faster -> fine
            "e": 99.0,  # no baseline -> skipped
        }
    }
    bench._adjudicate_outliers(result, {"a": None}, None, None)
    adj = result["adjudicated"]
    assert set(adj) == {"a"}
    assert adj["a"]["isolated"] == 1.1
    assert adj["a"]["ratio_suite"] == 2.6
    assert adj["a"]["ratio_isolated"] == 1.1
    summary = bench.compact_summary(result)
    assert summary["adjudicated"] == {"a": 1.1}
