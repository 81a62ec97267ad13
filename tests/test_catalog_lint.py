"""Catalog hygiene lint (VERDICT r05 task 8): at 320+ registrations
across 25 modules, every query must carry its full contract —
(a) an ORACLES entry (the driver hash gate),
(b) a SURVEY.md §2 line naming it (the judge's coverage checklist),
(c) a pytest that references it BY NAME (planted/property semantics
    beyond the oracle twin), unless listed in ORACLE_GATE_ONLY.

ORACLE_GATE_ONLY documents the queries whose oracle IS the complete
semantic spec (SQL-shaped analytics where a planted test would restate
the oracle) — every name on it is still verified per-run by the
parametrized oracle gate in test_catalog.py at sf0.001 and by the
driver at sf0.01. The list may only shrink: names with a by-name test
must be removed (asserted below), and algorithmic entries (ANN, graph,
dedup, sketches, corpus selection) don't belong on it.
"""

import glob
import os
import re

from dbt_project_spark.catalog import ORACLES, QUERIES, load_all

load_all()

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# SQL-shaped queries fully specified by their DuckDB oracle; see
# module docstring. Shrink-only.
ORACLE_GATE_ONLY = {
    # TPC-H shapes: the oracle is the published query itself.
    "tpch_q2", "tpch_q3", "tpch_q4", "tpch_q7", "tpch_q8", "tpch_q9",
    "tpch_q10", "tpch_q11", "tpch_q12", "tpch_q13", "tpch_q14",
    "tpch_q15", "tpch_q16", "tpch_q17", "tpch_q18", "tpch_q19",
    "tpch_q20", "tpch_q21", "tpch_q22",
    # Web-traffic parity family: direct SQL translations of the
    # reference's batch_stream.sql / comparision.sql; the operator
    # layer beneath them is planted-tested in test_operators_web.py.
    "wt_compare_categories", "wt_compare_engagement",
    "wt_conversion_rate", "wt_correlation", "wt_daily_type_pivot",
    "wt_engagement_scores", "wt_gap_filled_series",
    "wt_hourly_patterns", "wt_quarterly_trend",
    "wt_session_categories", "wt_stream_batch_compare",
    "wt_value_histogram",
    # r07 burn-down: tests/test_r07_planted.py moved the 12 remaining
    # algorithmic names off (PSI, lateness, SRM, NDR, profiling,
    # VARIANT, pct-of-parent, both approx_* sketch gates, the corpus
    # funnel/stats pair, NB margin calibration);
    # tests/test_r07s2_planted.py moved the 10 window/rollup/pivot
    # shapes (lag/moving-avg/top-k/percent-rank, CUBE, ROLLUP,
    # weekday seasonality, daily distincts, percentiles, JSON-path
    # stats) and the staging→marts DAG row. Only the TPC-H and wt_*
    # literal SQL restatements remain — the oracle IS the published
    # query / the reference's own SQL for every name left here.
}


# The r6 burn-down closed every gap: algorithmic queries all carry a
# by-name planted test now. Kept as an empty set so the lint stays
# strict — any NEW registration must ship with a by-name test or a
# documented ORACLE_GATE_ONLY entry in the same commit.
PENDING_NAMED_TESTS: set[str] = set()


def _test_corpus() -> str:
    out = []
    here = os.path.abspath(__file__)
    for f in glob.glob(os.path.join(REPO, "tests", "*.py")):
        if os.path.abspath(f) == here:
            continue  # this file's own lists don't count as coverage
        out.append(open(f).read())
    return "\n".join(out)


def test_every_query_has_oracle():
    assert set(QUERIES) - set(ORACLES) == set()


def test_every_query_has_survey_line():
    survey = open(os.path.join(REPO, "SURVEY.md")).read()
    missing = sorted(n for n in QUERIES if f"`{n}`" not in survey)
    assert not missing, missing


def _code_identifiers(path: str) -> set[str]:
    """Every identifier a Python file actually DEFINES or USES —
    function/class/arg names, Name ids, attribute accesses, import
    aliases, keyword args, plus snake_case tokens inside non-docstring
    string literals (column names in SQL/F.col). Comments never parse
    into the AST; docstrings are skipped explicitly — so a phantom
    inventory name mentioned only in prose can NOT resolve (ADVICE
    r07: the old full-text substring scan let it)."""
    import ast

    tree = ast.parse(open(path).read())
    doc_nodes: set[int] = set()
    for node in ast.walk(tree):
        if isinstance(
            node, (ast.Module, ast.ClassDef, ast.FunctionDef, ast.AsyncFunctionDef)
        ):
            body = getattr(node, "body", [])
            if (
                body
                and isinstance(body[0], ast.Expr)
                and isinstance(body[0].value, ast.Constant)
                and isinstance(body[0].value.value, str)
            ):
                doc_nodes.add(id(body[0].value))
    ids: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            ids.add(node.id)
        elif isinstance(node, ast.Attribute):
            ids.add(node.attr)
        elif isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            ids.add(node.name)
        elif isinstance(node, ast.arg):
            ids.add(node.arg)
        elif isinstance(node, ast.alias):
            ids.add((node.asname or node.name).split(".")[-1])
        elif isinstance(node, ast.keyword) and node.arg:
            ids.add(node.arg)
        elif (
            isinstance(node, ast.Constant)
            and isinstance(node.value, str)
            and id(node) not in doc_nodes
        ):
            ids.update(re.findall(r"[a-z][a-z0-9_]{3,}", node.value))
    return ids


def test_every_survey_checklist_name_resolves():
    """VERDICT r06 defect 1: SURVEY §2 listed a phantom query name
    (`pipeline_order_revenue`) that existed nowhere in the package —
    the inventory the judge audits must not contain entries that
    resolve to nothing. Every backticked snake_case identifier in §2
    must be a registered query OR a real CODE symbol (def/assignment/
    attribute/import/string-literal identifier — NOT a comment or
    docstring mention) somewhere in dbt_project_spark/ or tests/."""
    survey = open(os.path.join(REPO, "SURVEY.md")).read()
    m = re.search(r"## §2.*?(?=\n## §3)", survey, re.S)
    assert m, "SURVEY.md §2 section not found"
    names = set(re.findall(r"`([a-z][a-z0-9_]{3,})`", m.group(0)))
    here = os.path.abspath(__file__)
    symbols: set[str] = set()
    files = [
        f
        for root in ("dbt_project_spark", "tests")
        for f in glob.glob(os.path.join(REPO, root, "**", "*.py"), recursive=True)
        if os.path.abspath(f) != here  # this file names the phantom
    ] + [os.path.join(REPO, "bench.py"), os.path.join(REPO, "__spark_entry__.py")]
    for f in files:
        symbols |= _code_identifiers(f)
    unresolved = sorted(n for n in names if n not in QUERIES and n not in symbols)
    assert not unresolved, (
        f"SURVEY §2 names resolving to nothing in the package: {unresolved}"
    )


def test_driver_verdict_files_are_git_tracked():
    """VERDICT r06 #4 / r07 #2, twice-recurring process defect: the
    driver window (catalog.priority_names) derives from CHECKED-IN
    CORRECTNESS_r*.json files; an untracked verdict file means the
    queries it verified still classify as debt and re-occupy the next
    round's 50-slot window, starving real debt. Every verdict/bench
    artifact on disk must be git-tracked."""
    import subprocess

    on_disk = sorted(
        os.path.basename(p)
        for pat in ("CORRECTNESS_r*.json", "BENCH_r*.json")
        for p in glob.glob(os.path.join(REPO, pat))
    )
    try:
        tracked = set(
            subprocess.run(
                ["git", "ls-files", "CORRECTNESS_r*.json", "BENCH_r*.json"],
                cwd=REPO,
                capture_output=True,
                text=True,
                check=True,
                timeout=30,
            ).stdout.split()
        )
    except (OSError, subprocess.SubprocessError):
        return  # not a git checkout (tarball/CI export) — nothing to lint
    untracked = [f for f in on_disk if f not in tracked]
    assert not untracked, (
        f"driver verdict files not committed (the window derives from "
        f"checked-in files — commit them NOW): {untracked}"
    )


def test_every_query_has_named_pytest_or_documented_exemption():
    corpus = _test_corpus()
    named = {n for n in QUERIES if re.search(rf"\b{re.escape(n)}\b", corpus)}
    gaps = sorted(set(QUERIES) - named - ORACLE_GATE_ONLY - PENDING_NAMED_TESTS)
    assert not gaps, f"{len(gaps)} queries lack a by-name pytest: {gaps}"


def test_exemption_lists_are_tight():
    # No stale names (unregistered), no overlap, and no name that
    # already has a by-name test may stay listed — both lists only
    # shrink.
    stale = sorted((ORACLE_GATE_ONLY | PENDING_NAMED_TESTS) - set(QUERIES))
    assert not stale, stale
    assert not (ORACLE_GATE_ONLY & PENDING_NAMED_TESTS)
    corpus = _test_corpus()
    covered = sorted(
        n for n in (ORACLE_GATE_ONLY | PENDING_NAMED_TESTS)
        if re.search(rf"\b{re.escape(n)}\b", corpus)
    )
    assert not covered, f"now tested by name — remove from the lists: {covered}"


def test_refresh_names_are_registered():
    """REFRESH (catalog.py) feeds the driver window head — a typo'd or
    since-renamed name silently drops out of priority_names() and the
    intended re-verification never happens (the REFRESH-on-restructure
    rule, VERDICT r08 task 3)."""
    from dbt_project_spark.catalog import REFRESH

    unknown = sorted(set(REFRESH) - set(QUERIES))
    assert not unknown, f"REFRESH names not in the catalog: {unknown}"
    assert len(set(REFRESH)) == len(REFRESH), "duplicate REFRESH names"
