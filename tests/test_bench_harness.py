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
