"""Spread-aware regression verdict in bench.py (VERDICT r08 task 6,
hardened r10 per VERDICT r09 task 2 + ADVICE r09).

Pure-python: pins the flag definition (current min above previous max
— non-overlapping sample windows), the weak_n1 / noise_suspect
qualifiers, the baseline fallback chain (BENCH_LOCAL.json → newest
BENCH_r*.json, same sf only), malformed-baseline resilience, and the
/proc host sampler.
"""

import json

import bench


def test_regressions_flags_only_nonoverlapping():
    cur = {
        "a": [10.0, 11.0],  # min 10 > prev max 9 → regression
        "b": [8.5, 12.0],  # overlaps prev [8, 9] → noise band
        "c": [1.0, 2.0],  # no baseline → unflagged
    }
    prev = {"a": [8.0, 9.0], "b": [8.0, 9.0]}
    n2 = {"a": 3, "b": 3, "c": 3}
    out = bench._regressions(cur, prev, n2, n2)
    assert set(out) == {"a"}
    assert out["a"] == {"min": 10.0, "prev_max": 9.0}


def test_regressions_improvement_not_flagged():
    assert bench._regressions({"a": [5.0, 6.0]}, {"a": [7.0, 9.0]}) == {}


def test_regressions_single_sample_marked_weak():
    # ADVICE r09: with n=1 on either side the non-overlapping-windows
    # argument collapses — the flag must self-identify as weak.
    cur = {"a": [10.0, 10.0], "b": [10.0, 11.0]}
    prev = {"a": [8.0, 9.0], "b": [8.0, 9.0]}
    out = bench._regressions(cur, prev, {"a": 1, "b": 3}, {"a": 3, "b": 3})
    assert out["a"].get("weak_n1") is True
    assert "weak_n1" not in out["b"]
    # single-sample BASELINE is just as weak
    out = bench._regressions(cur, prev, {"a": 3, "b": 3}, {"a": 1, "b": 2})
    assert out["a"].get("weak_n1") is True
    assert "weak_n1" not in out["b"]
    # missing n_runs maps (older baselines) degrade to weak, not a crash
    out = bench._regressions(cur, prev)
    assert out["a"].get("weak_n1") is True


def test_regressions_steal_marks_noise_suspect():
    # VERDICT r09 task 2: a flag raised while the hypervisor was
    # stealing cycles carries its own adjudication.
    cur = {"a": [10.0, 11.0], "b": [10.0, 11.0]}
    prev = {"a": [8.0, 9.0], "b": [8.0, 9.0]}
    n = {"a": 3, "b": 3}
    host = {
        "a": {"load": 14.0, "steal_pct": 7.5},
        "b": {"load": 14.0, "steal_pct": 0.1},
    }
    out = bench._regressions(cur, prev, n, n, host)
    assert out["a"].get("noise_suspect") is True
    assert "noise_suspect" not in out["b"]


def test_host_sample_reads_proc():
    load1, total, steal = bench._host_sample()
    assert load1 >= 0.0
    assert total > 0  # /proc/stat cpu line parsed
    assert 0 <= steal <= total


def test_prev_spreads_finds_checked_in_round_files():
    # The repo carries BENCH_r01..r09 with parsed sf0.1 spreads; a
    # BENCH_LOCAL.json from a local run may take priority — either
    # way the baseline must resolve at sf 0.1.
    spread, _sf1, src, n_runs, _sf1_n = bench._prev_spreads(0.1)
    assert src is not None
    assert spread, "expected a non-empty sf0.1 baseline spread"
    assert all(
        len(v) == 2 and v[0] <= v[1] for v in spread.values()
    ), "spreads must be [min, max] pairs"
    assert all(isinstance(v, int) for v in n_runs.values())


def test_prev_spreads_never_crosses_scale_factors():
    spread, sf1, src, _n, _n1 = bench._prev_spreads(99.0)
    assert spread == {} and sf1 == {} and src is None


def test_prev_spreads_survives_malformed_baselines(tmp_path, monkeypatch):
    # ADVICE r09: a top-level list in BENCH_LOCAL.json (or a non-dict
    # sf1 section) must be skipped, not abort the bench run with
    # AttributeError before any output.
    (tmp_path / "BENCH_LOCAL.json").write_text(json.dumps([1, 2, 3]))
    (tmp_path / "BENCH_r01.json").write_text(
        json.dumps({"sf": 0.1, "parsed": {"spread": {"q": [1.0, 2.0]}}})
    )
    monkeypatch.setattr(bench, "REPO", str(tmp_path))
    spread, sf1, src, _n, _n1 = bench._prev_spreads(0.1)
    assert src == "BENCH_r01.json"
    assert spread == {"q": [1.0, 2.0]}

    # non-dict sf1 inside an otherwise valid local baseline
    (tmp_path / "BENCH_LOCAL.json").write_text(
        json.dumps(
            {"sf": 0.1, "spread": {"q": [3.0, 4.0]}, "sf1": [1, 2]}
        )
    )
    spread, sf1, src, _n, _n1 = bench._prev_spreads(0.1)
    assert src == "BENCH_LOCAL.json"
    assert spread == {"q": [3.0, 4.0]} and sf1 == {}

    # parsed-compact round file whose top level is a list
    (tmp_path / "BENCH_LOCAL.json").unlink()
    (tmp_path / "BENCH_r02.json").write_text(json.dumps([{"sf": 0.1}]))
    spread, _sf1, src, _n, _n1 = bench._prev_spreads(0.1)
    assert src == "BENCH_r01.json"  # r02 skipped as malformed
    assert spread == {"q": [1.0, 2.0]}
