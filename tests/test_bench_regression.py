"""Spread-aware regression verdict in bench.py (VERDICT r08 task 6).

Pure-python: pins the flag definition (current min above previous max
— non-overlapping sample windows, so not host noise) and the baseline
fallback chain (BENCH_LOCAL.json → newest BENCH_r*.json, same sf only).
"""

import bench


def test_regressions_flags_only_nonoverlapping():
    cur = {
        "a": [10.0, 11.0],  # min 10 > prev max 9 → regression
        "b": [8.5, 12.0],  # overlaps prev [8, 9] → noise band
        "c": [1.0, 2.0],  # no baseline → unflagged
    }
    prev = {"a": [8.0, 9.0], "b": [8.0, 9.0]}
    out = bench._regressions(cur, prev)
    assert set(out) == {"a"}
    assert out["a"] == {"min": 10.0, "prev_max": 9.0}


def test_regressions_improvement_not_flagged():
    assert bench._regressions({"a": [5.0, 6.0]}, {"a": [7.0, 9.0]}) == {}


def test_prev_spreads_finds_checked_in_round_files():
    # The repo carries BENCH_r01..r08 with parsed sf0.1 spreads; a
    # BENCH_LOCAL.json from a local run may take priority — either
    # way the baseline must resolve at sf 0.1.
    spread, _sf1, src = bench._prev_spreads(0.1)
    assert src is not None
    assert spread, "expected a non-empty sf0.1 baseline spread"
    assert all(
        len(v) == 2 and v[0] <= v[1] for v in spread.values()
    ), "spreads must be [min, max] pairs"


def test_prev_spreads_never_crosses_scale_factors():
    spread, sf1, src = bench._prev_spreads(99.0)
    assert spread == {} and sf1 == {} and src is None
