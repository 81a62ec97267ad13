#!/usr/bin/env python
"""Benchmark headline queries; prints ONE JSON line.

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]. Each query is forced end-to-end with the
noop sink (full computation, no collect/driver materialization cost).

Methodology (r03): per-query MEDIAN of $SPARK_GRAFT_BENCH_RUNS
(default 3) in-session runs, executed as interleaved passes (run every
query once, then again, ...) so samples are spread across the session
and a host-load spike doesn't bias one query. The JSON carries the
medians plus per-query [min, max] spread — a >15% median shift on an
unchanged plan is a regression, a uniform shift inside the spread is
host drift (the r01→r02 +36% was unattributable with n=1). Each run
also emits a ``regressions`` verdict per section: queries whose
CURRENT min exceeds the PREVIOUS round's max (non-overlapping sample
windows — not noise), against the last full local run or, failing
that, the newest driver-recorded BENCH_r*.json at the same sf.

An additional sf1 section re-times the most expensive queries (23 as
of r7: the heavy dedup/ANN/graph/recsys/corpus families) at
10× the base scale (data generated once into benchdata/ by
dbt_project_spark.sfgen, key-offset replication) to catch constants
that hide at sf0.1. The section is wall-clock budgeted
($SPARK_GRAFT_SF1_BUDGET sec, default 420): extra passes are dropped
first, then remaining queries are skipped — whatever was dropped is
listed in the JSON, never silently.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from dbt_project_spark import get_spark
from dbt_project_spark.catalog import QUERIES, load_all

HEADLINE = [
    "wt_windowed_distribution",
    "wt_engagement_scores",
    "wt_stream_batch_compare",
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q18",
    "pipeline_nation_revenue",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "text_quality",
    "ann_bruteforce_topk",
    "mm_binary_features",
    "sessionization",
    "win_running_total",
    "percentiles_by_type",
    "tpch_q21",
    # round 2: re-blocked / new operators
    "dedup_embedding",
    "ann_ivf_topk",
    "approx_distinct_users_daily",
    "skew_salted_join",
    "contamination_ngram",
    "dedup_clusters",
    "mm_audio_windows",
    # round 2, session 2: graph / product / training additions
    "triangle_count",
    "pagerank_trade",
    "scd2_user_tier",
    "seq_pack",
    "corpus_mix_sample",
    "grouping_sets_matrix",
    "resample_interpolate",
    "mm_arrow_byte_stats",
    # round 3
    "ivf_train_centroids",
    "theta_set_ops",
    "dedup_incremental",
    "dedup_embedding_strict",
    # round 3, session 2: retail / mining / temporal additions
    "rfm_segmentation",
    "basket_rules",
    "inverted_index",
    "cms_heavy_hitters",
    "interval_coverage",
    "scd2_point_in_time",
    "bloom_semijoin_orders",
    "drift_psi_value",
    # round 4: retrieval family
    "bm25_topk",
    "rrf_hybrid_topk",
    # round 4, session 2: statistics / graph / corpus additions
    "ks_test_value",
    "kcore_parts",
    "item_cooc_similarity",
    "split_group_aware",
    "bigram_lm_quality",
    "rolling_distinct_users_7d",
    "gini_user_value",
    # round 4, session 3: governance / graph / eval additions
    "dq_audit",
    "quantile_sketch_rollup",
    "sssp_weighted_trade",
    "markov_next_event_backtest",
    "incremental_rollup_merge",
    # round 4, session 4: recsys / graph / corpus / multimodal additions
    "lpa_communities",
    "user_item_recs",
    "clustering_coefficient",
    "collocation_pmi",
    "mm_chunk_dedup",
    # round 5: persisted IVF index + IVF-PQ composition
    "ivf_build_index",
    "ann_ivfpq_topk",
    "mm_chunk_dedup_cdc",
    # round 5, session 2: HITS completes the iterative graph trio
    "hits_trade",
    "bpe_train_merges",
    # round 5, sessions 3-4: semantic dedup over the persisted IVF
    # cells and the two data-selection scorers (token-stream models)
    "dedup_semantic",
    "dsir_importance_weights",
    "moore_lewis_selection",
    "nb_lang_classifier",
    "exact_substr_spans",
    # round 5, sessions 5-7: fingerprinting, PRF rescoring, matrix-free
    # PCA, and the PII regex projection — the new corpus-sized passes
    "winnowing_fingerprints",
    "query_expansion_prf",
    "embedding_pca_power",
    "pii_density_report",
]

# The 10 most expensive headline queries per BENCH_r02, cheapest first
# so budget truncation at sf1 drops passes of the cheap ones last and
# every query gets its pass-0 sample as early as possible.
SF1_QUERIES = [
    "seq_pack",
    "tpch_q21",
    "dedup_minhash_lsh",
    "pipeline_nation_revenue",
    # r05: serving moved out of ann_ivf_topk into the persisted index;
    # the n×K build cost is timed HERE (force-rebuild each pass) — and
    # runs BEFORE the serving query, the production order, so every
    # ann_ivf_topk pass measures warm serving rather than a cold build
    "ivf_build_index",
    "ann_ivf_topk",
    "pagerank_trade",
    # NOT dedup_embedding: its τ=0.4 output is a fixed quantile of the
    # random cosine bulk — Θ(n²) rows by construction (measured 27×
    # runtime at 10×, candidate rate pinned at the 65% random-collision
    # floor at both scales). The strict variant is the
    # scale-representative embedding-dedup workload.
    "dedup_embedding_strict",
    "dedup_ngram_jaccard",
    "dedup_clusters",
    # r04s2: the two new >10s-at-sf0.1 queries join the 10× section —
    # k-core's early-exit and the split's LSH+CC stack are exactly the
    # constants that could hide at sf0.1
    "split_group_aware",
    "kcore_parts",
    "triangle_count",
    # r06 (VERDICT r05 task 4): the r5 heavy families at 10× — PQ
    # serving (table-lookup ADC), the refine rerank path, SemDeDup's
    # per-cluster pair scan, the BPE trainer's iterative merge loop,
    # and the suffix-follower exact-substring scan.
    "ann_ivfpq_topk",
    "ann_ivfpq_refine",
    "dedup_semantic",
    "bpe_train_merges",
    "exact_substr_spans",
    # r07 (VERDICT r06 task 4): the graph/recsys tail at 10× —
    # lpa_communities was heavier at sf0.1 (11.6 s) than half the
    # then-current sf1 set; the others complete the iterative-graph
    # and co-occurrence-recsys families. Ascending sf0.1 cost.
    "hits_trade",
    "user_item_recs",
    "sssp_weighted_trade",
    "clustering_coefficient",
    "lpa_communities",
]


def _prev_spreads(
    sf: float | None,
) -> tuple[dict, dict, str | None, dict, dict]:
    """Previous-round per-query [min, max] spreads for the regression
    flag (VERDICT r08 task 6). Prefers the last full-detail local run
    (BENCH_LOCAL.json — read BEFORE this run overwrites it), falling
    back to the newest driver-recorded BENCH_r*.json (its parsed
    compact carries the slowest-15 sf0.1 spreads only). Spreads from a
    different scale factor are never compared. Returns
    (sf_base_spread, sf1_spread, source_name, base_n_runs, sf1_n_runs);
    the n_runs maps qualify single-sample baselines (ADVICE r09).
    Malformed files (top-level list, non-dict sf1) are skipped, never
    fatal — a corrupt baseline must not abort the bench run."""

    def _d(x) -> dict:
        return x if isinstance(x, dict) else {}

    try:
        with open(os.path.join(REPO, "BENCH_LOCAL.json")) as f:
            prev = json.load(f)
        if (
            isinstance(prev, dict)
            and prev.get("sf") == sf
            and _d(prev.get("spread"))
        ):
            sf1 = _d(prev.get("sf1"))
            return (
                _d(prev.get("spread")),
                _d(sf1.get("spread")),
                "BENCH_LOCAL.json",
                _d(prev.get("n_runs")),
                _d(sf1.get("n_runs")),
            )
    except (OSError, ValueError, AttributeError, TypeError):
        pass

    def _round_no(fn: str) -> int:
        m = re.search(r"_r(\d+)\.json$", fn)
        return int(m.group(1)) if m else -1

    files = sorted(
        (fn for fn in os.listdir(REPO) if re.fullmatch(r"BENCH_r\d+\.json", fn)),
        key=lambda fn: (_round_no(fn), fn),
    )
    for fn in reversed(files):
        try:
            with open(os.path.join(REPO, fn)) as f:
                rec = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(rec, dict):
            continue
        parsed = _d(rec.get("parsed"))
        if rec.get("sf") == sf and _d(parsed.get("spread")):
            # The compact line has no per-query n_runs; its global
            # "runs" config is the per-query sample count unless the
            # budget truncated (sf1 only, which the compact doesn't
            # carry spreads for anyway).
            runs = parsed.get("runs")
            n = (
                {q: runs for q in parsed["spread"]}
                if isinstance(runs, int)
                else {}
            )
            return _d(parsed.get("spread")), {}, fn, n, {}
    return {}, {}, None, {}, {}


def _regressions(
    current_spread: dict,
    prev_spread: dict,
    cur_n: dict | None = None,
    prev_n: dict | None = None,
    host: dict | None = None,
) -> dict:
    """Queries whose CURRENT min exceeds the PREVIOUS max.

    With >=2 samples on BOTH sides the windows genuinely don't overlap
    and the flag means a plan/code regression until shown otherwise.
    With a single sample on either side the "window" is a point and
    the argument collapses (ADVICE r09: r09 flagged 9 single-sample
    names later adjudicated as host noise) — such entries carry
    ``"weak_n1": true``. Entries whose samples ran under measured CPU
    steal (``host`` maps name -> {"steal_pct": max-over-runs, ...})
    additionally carry ``"noise_suspect": true``: steal is external by
    definition (our own load cannot create it), so a flag raised while
    the hypervisor was taking cycles is the documented steal-spike
    signature, not evidence of a code change."""
    out = {}
    for name, cur in current_spread.items():
        prev = prev_spread.get(name)
        if prev and cur[0] > prev[1]:
            entry = {"min": cur[0], "prev_max": prev[1]}
            if (cur_n or {}).get(name, 0) < 2 or (prev_n or {}).get(
                name, 0
            ) < 2:
                entry["weak_n1"] = True
            if (host or {}).get(name, {}).get("steal_pct", 0.0) > 2.0:
                entry["noise_suspect"] = True
            out[name] = entry
    return out


def _host_sample() -> tuple[float, int, int]:
    """(loadavg_1min, total_cpu_ticks, steal_ticks) from /proc.

    Steal is the discriminating signal for the recurring external
    contention this host suffers (SCALE.md r09): 1-min loadavg during
    a bench run mostly measures OUR OWN executor threads (a single
    wedge join drives it past 14 on a quiet machine), but steal ticks
    only accrue when the hypervisor runs someone else on our CPUs."""
    try:
        with open("/proc/loadavg") as f:
            load1 = float(f.read().split()[0])
        with open("/proc/stat") as f:
            ticks = [int(x) for x in f.readline().split()[1:]]
        return load1, sum(ticks), ticks[7] if len(ticks) > 7 else 0
    except (OSError, ValueError, IndexError):
        return 0.0, 0, 0


def _run_once(name: str, sf_dir: str) -> float:
    t0 = time.perf_counter()
    QUERIES[name](sf_dir=sf_dir, spark=_SPARK).write.mode("overwrite").format(
        "noop"
    ).save()
    return time.perf_counter() - t0


def _bench(
    names: list[str], sf_dir: str, runs: int, budget_s: float | None = None
) -> dict:
    from dbt_project_spark.caching import reclaim_jvm

    t_start = time.perf_counter()
    samples: dict[str, list[float]] = {n: [] for n in names}
    # Per-query host evidence (VERDICT r09 task 2): max 1-min loadavg
    # and max CPU-steal %% observed across the query's timed runs, so a
    # regression flag carries its own noise adjudication.
    host: dict[str, dict] = {n: {"load": 0.0, "steal_pct": 0.0} for n in names}
    steal_samples: list[float] = []
    load_samples: list[float] = []
    for _pass in range(runs):
        # One full-GC sweep per pass (~0.2 s against a multi-minute
        # pass): frees localCheckpoint blocks and dead plan trees that
        # unpersist can't reach (caching.reclaim_jvm), so a long bench
        # session's heap stays flat. Outside every timed _run_once.
        reclaim_jvm()
        for name in names:
            over = (
                budget_s is not None
                and time.perf_counter() - t_start > budget_s
            )
            if over and samples[name]:
                continue  # keep the samples we have
            if over:
                continue  # no sample yet either — listed as skipped
            l0, t0, s0 = _host_sample()
            samples[name].append(_run_once(name, sf_dir))
            l1, t1, s1 = _host_sample()
            steal_pct = round(100.0 * (s1 - s0) / max(1, t1 - t0), 2)
            h = host[name]
            h["load"] = max(h["load"], l0, l1)
            h["steal_pct"] = max(h["steal_pct"], steal_pct)
            steal_samples.append(steal_pct)
            load_samples.append(max(l0, l1))
    out = {
        "queries": {
            n: round(statistics.median(s), 3) for n, s in samples.items() if s
        },
        "spread": {
            n: [round(min(s), 3), round(max(s), 3)]
            for n, s in samples.items()
            if s
        },
        "n_runs": {n: len(s) for n, s in samples.items() if s},
        "skipped": [n for n, s in samples.items() if not s],
        "wall_sec": round(time.perf_counter() - t_start, 3),
        "host": {n: h for n, h in host.items() if samples[n]},
        "host_summary": {
            "load_max": round(max(load_samples), 2) if load_samples else 0.0,
            "steal_pct_max": max(steal_samples) if steal_samples else 0.0,
            "steal_pct_mean": round(
                statistics.mean(steal_samples), 2
            )
            if steal_samples
            else 0.0,
        },
    }
    return out


def main() -> None:
    global _SPARK
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    # 620 s: one full pass of the 23-query sf1 section (~280 s warm for
    # the carried 18 + the r7 graph/recsys tail, whose sf1 pass-0 cost
    # is ~100-180 s) plus partial second samples — 420 s fit 18 queries
    # exactly (r6 wall 421.9 s), so +5 queries without +budget would
    # re-create the "skipped" failure the section exists to prevent.
    sf1_budget = float(os.environ.get("SPARK_GRAFT_SF1_BUDGET", "620"))
    sf1_on = os.environ.get("SPARK_GRAFT_SF1", "1") != "0"
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    load_all()
    _SPARK = get_spark(app_name="bench")
    _SPARK.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/codegen once so per-query times measure the plan,
    # not first-run JIT: one scan+agg shape and one window shape
    # (window codegen is a separate JIT surface — measured: without
    # this, the first windowed headline query reads ~2x its steady
    # state).
    QUERIES["tpch_q6"](_SPARK, sf_dir).write.mode("overwrite").format("noop").save()
    QUERIES["win_lag_delta"](_SPARK, sf_dir).write.mode("overwrite").format(
        "noop"
    ).save()

    (
        prev_base_spread,
        prev_sf1_spread,
        prev_src,
        prev_base_n,
        prev_sf1_n,
    ) = _prev_spreads(sf)

    base = _bench(HEADLINE, sf_dir, runs)

    result = {
        "metric": "headline_queries_total_runtime",
        "value": round(sum(base["queries"].values()), 3),
        "unit": "sec",
        "queries": base["queries"],
        "sf": sf,
        "runs": runs,
        "methodology": "median of interleaved passes",
        "spread": base["spread"],
        "n_runs": base["n_runs"],
        "host": base["host"],
        "host_summary": base["host_summary"],
    }
    if base["skipped"]:
        result["skipped"] = base["skipped"]
    # Spread-aware regression verdict (VERDICT r08 task 6): would have
    # auto-flagged the r08 CC pair (dedup_clusters/split_group_aware
    # +14%, min above r07's max on both scale factors). Entries carry
    # weak_n1 / noise_suspect qualifiers (VERDICT r09 task 2).
    result["regressions"] = _regressions(
        base["spread"],
        prev_base_spread,
        base["n_runs"],
        prev_base_n,
        base["host"],
    )
    result["regression_baseline"] = prev_src

    if sf1_on and sf is not None:
        from dbt_project_spark.sfgen import ensure_scaled

        sf1_dir = os.path.join(REPO, "benchdata", f"sf{round(sf * 10, 4):g}")
        t0 = time.perf_counter()
        ensure_scaled(_SPARK, sf_dir, sf1_dir, factor=10)
        gen_sec = round(time.perf_counter() - t0, 3)
        # Warm the scan+agg / window codegen shapes AT THE SF1 DATA
        # before sampling: when ensure_scaled just generated the data,
        # every sf1 sample is first-touch (page cache + JIT) and the
        # budget usually allows only one pass — r04 measured 2-3×
        # cold-vs-warm on single-run queries without this.
        QUERIES["tpch_q6"](_SPARK, sf1_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        QUERIES["win_lag_delta"](_SPARK, sf1_dir).write.mode(
            "overwrite"
        ).format("noop").save()
        # Warm the PQ serving path untimed: the first-ever IVF-PQ call
        # on a corpus trains codebooks + encodes it (the once-per-
        # corpus build — ivf_build_index times the coarse half
        # explicitly). Inside the budget-limited single-run sf1
        # section that build would masquerade as serving time (r6
        # measured 32 s build+serve vs ~3 s warm serving).
        QUERIES["ann_ivfpq_topk"](_SPARK, sf1_dir).write.mode(
            "overwrite"
        ).format("noop").save()
        sf1 = _bench(SF1_QUERIES, sf1_dir, runs, budget_s=sf1_budget)
        sf1_reg = _regressions(
            sf1["spread"],
            prev_sf1_spread,
            sf1["n_runs"],
            prev_sf1_n,
            sf1["host"],
        )
        result["sf1"] = {
            "regressions": sf1_reg,
            "sf": round(sf * 10, 4),
            "gen_sec": gen_sec,
            "budget_sec": sf1_budget,
            "queries": sf1["queries"],
            "spread": sf1["spread"],
            "n_runs": sf1["n_runs"],
            "skipped": sf1["skipped"],
            "wall_sec": sf1["wall_sec"],
            "host": sf1["host"],
            "host_summary": sf1["host_summary"],
        }

    # The driver records only the TAIL of this process's output
    # (BENCH_r03 kept the last ~2000 bytes: the sf1 section survived,
    # the sf0.1 headline map did not). So: full detail goes to a file
    # AND to the first line; the LAST line printed is a compact JSON —
    # metric + the complete per-query headline map, no spread/sf1
    # bulk — sized well under the capture window.
    with open(os.path.join(REPO, "BENCH_LOCAL.json"), "w") as f:
        json.dump(result, f)
    print(json.dumps(result))
    # BENCH_r05 lesson: the headline map at 80 queries pushed the
    # final line past the driver's ~2 KB tail capture and `parsed`
    # came back null. The LAST line now carries only the slowest 15
    # queries (the scale story) + totals; BENCH_LOCAL.json (and the
    # first stdout line) keep the complete per-query detail.
    slowest = dict(
        sorted(base["queries"].items(), key=lambda kv: -kv[1])[:15]
    )

    def _compact_reg(reg: dict, cap: int = 8) -> dict:
        """Bounded regression summary for the tail-captured line: a
        host-wide slowdown can flag dozens of the 78 names (ADVICE r09
        — unbounded lists blew the 1900 B budget exactly when the
        degrade path mattered), so carry counts + a capped head, plus
        the noise_suspect / weak_n1 qualifier subsets."""
        names = sorted(reg)
        out: dict = {"n": len(names), "names": names[:cap]}
        ns = sorted(n for n in reg if reg[n].get("noise_suspect"))
        weak = sorted(n for n in reg if reg[n].get("weak_n1"))
        if ns:
            out["noise_suspect"] = {"n": len(ns), "names": ns[:3]}
        if weak:
            out["weak_n1"] = len(weak)
        return out

    compact = {
        "metric": result["metric"],
        "value": result["value"],
        "unit": "sec",
        "queries": slowest,
        # min/max per slowest query (VERDICT r07 #3): without sf0.1
        # spreads in the driver-captured line, a ±15% host-noise band
        # is indistinguishable from a real regression and each round
        # burns a task re-measuring (r6: dedup_embedding; r7:
        # ivf_train_centroids).
        "spread": {n: base["spread"][n] for n in slowest},
        "n_queries": len(base["queries"]),
        "sf": sf,
        "runs": runs,
        "detail": "BENCH_LOCAL.json",
        # One-line verdict: bounded {n, names-head [, noise_suspect,
        # weak_n1]} per section (n=0 / missing baseline → clean run).
        # Shape change from the r09-era flat name list adjudicated
        # (ADVICE r10): the external driver JSON-parses the tail line
        # wholesale into BENCH_r{N}.json's `parsed` field without
        # interpreting `regressions` — BENCH_r10.json carried this
        # dict shape intact — and the judge reads it by hand. The
        # complete flat per-name detail stays in BENCH_LOCAL.json.
        "regressions": _compact_reg(result["regressions"]),
        "regression_baseline": prev_src,
        # Section-level host evidence so the artifact self-adjudicates
        # contention (VERDICT r09 task 2): steal_pct > ~2 during a
        # section is the external steal-spike signature.
        "host": base["host_summary"],
    }
    if "sf1" in result:
        compact["sf1_regressions"] = _compact_reg(
            result["sf1"]["regressions"]
        )
        compact["sf1_total"] = round(
            sum(result["sf1"]["queries"].values()), 3
        )
        compact["sf1_n"] = len(result["sf1"]["queries"])
        compact["sf1_host"] = result["sf1"]["host_summary"]
    line = json.dumps(compact)
    if len(line) > 1900:  # keep the tail-capture contract visible
        sys.stderr.write(
            f"bench: compact line {len(line)}B exceeds tail budget\n"
        )
        # Hard-degrade: totals only, guaranteed to parse driver-side.
        # Regression summaries are already bounded by _compact_reg;
        # drop their name heads too so the degraded line's size is
        # independent of how many queries a host-wide slowdown flagged.
        compact["queries"] = {}
        compact["spread"] = {}
        for key in ("regressions", "sf1_regressions"):
            if key in compact:
                compact[key] = {"n": compact[key]["n"]}
        line = json.dumps(compact)
    print(line)


if __name__ == "__main__":
    main()
