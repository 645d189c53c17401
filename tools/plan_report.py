"""Mechanical physical-plan audit over every registered query.

For each ``queries()`` entry this compiles the DataFrame at the given
SF (no execution) and counts the plan features that decide 100 TB
behavior: shuffles (Exchange), join strategies, window operators and
their pre-shuffle group-limit pushdowns, parquet scans and how many of
them carry pushed filters, whole-stage-codegen span count, and any
Python row/batch eval operators.  Output is PLAN_AUDIT.md — the
check-me artifact behind the repo's scale claims (the per-query prose
lives in each query's docstring; this table is the part a reviewer can
regenerate mechanically).

Usage: python tools/plan_report.py [sf_dir]   (default sf0.01)
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PATTERNS = {
    "exchange": re.compile(r"\bExchange (hash|range|SinglePartition)", re.I),
    "bhj": re.compile(r"\bBroadcastHashJoin\b"),
    "smj": re.compile(r"\bSortMergeJoin\b"),
    "shj": re.compile(r"\bShuffledHashJoin\b"),
    "bnlj": re.compile(r"\bBroadcastNestedLoopJoin\b"),
    "cartesian": re.compile(r"\bCartesianProduct\b"),
    "window": re.compile(r"\bWindow \["),
    "wgl_partial": re.compile(r"\bWindowGroupLimit .*, Partial\b"),
    "scan": re.compile(r"\bFileScan parquet\b"),
    "py_eval": re.compile(r"\b(BatchEvalPython|ArrowEvalPython)\b"),
    "pandas_grouped": re.compile(r"\b(FlatMapGroupsInPandas|MapInPandas)\b"),
}
PUSHED_NONEMPTY = re.compile(r"PushedFilters: \[(?!\])")


def audit(plan: str) -> dict[str, int]:
    row = {k: len(p.findall(plan)) for k, p in PATTERNS.items()}
    row["pushed_scans"] = len(PUSHED_NONEMPTY.findall(plan))
    return row


def strip_cached_lineage(plan: str) -> str:
    """Keep only what this execution actually ran: drop (a) the subtree
    printed UNDER every InMemoryRelation node — the cached relation's
    build lineage, the artifact that made kcore's initial plan read as
    864 scans — and (b) every AQE ``== Initial Plan ==`` section (the
    executed string of an AdaptiveSparkPlan prints the pre-adaptive
    tree after the final one, once per nested adaptive block).

    Depth = index of the first char outside the tree-drawing prefix
    (spaces, ':', '+', '-').  An InMemoryRelation's children print
    strictly deeper.  An ``== Initial Plan ==`` section re-bases its
    subtree at the header's own depth, so its contents print at >= the
    header depth — but an equal-depth content line is always the
    re-based section root with an ALL-SPACE prefix, whereas a genuine
    sibling of the header (the next ``+- == ... ==`` header, or a real
    operator branch of the enclosing tree) carries branch glyphs
    (':'/'+') in its prefix.  The inclusive skip therefore terminates
    on any equal-depth line whose prefix contains a branch glyph
    (ADVICE r7: depth alone swallowed real executed operators that
    follow the section at equal indentation)."""
    prefix = re.compile(r"^[ :+\-]*")
    out = []
    skip: tuple[int, bool] | None = None  # (threshold, inclusive)
    for line in plan.splitlines():
        if not line.strip():
            continue
        m = prefix.match(line)
        depth = m.end()
        if skip is not None:
            thr, inclusive = skip
            if depth > thr or (
                inclusive and depth == thr and m.group().strip() == ""
            ):
                continue
            skip = None
        if "== Initial Plan ==" in line:
            skip = (depth, True)
            continue
        if "InMemoryRelation" in line:
            skip = (depth, False)
            continue
        out.append(line)
    return "\n".join(out)


def executed_audit(df) -> dict[str, int | bool]:
    """Post-materialization plan shape (VERDICT r6 "Next" #7): execute
    the query, then read the SAME QueryExecution's plan — now the
    AQE-final shape with InMemoryTableScan where caches were hit — and
    count operators with cached-relation lineage stripped, so the
    numbers are what actually ran, not printed cache definitions."""
    df.collect()
    plan = strip_cached_lineage(
        df._jdf.queryExecution().executedPlan().toString()
    )
    row = {k: len(p.findall(plan)) for k, p in PATTERNS.items()}
    row["imts"] = plan.count("InMemoryTableScan")
    row["aqe_final"] = "isFinalPlan=true" in plan
    return row


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as m
    from sales_azure_data_engineer_project_spark.caching import release_caches
    from sales_azure_data_engineer_project_spark.session import get_spark

    spark = get_spark("plan-report")
    rows = []
    t0 = time.time()
    for name, fn in sorted(m.queries().items()):
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        rows.append((name, audit(plan)))
        release_caches()

    # Executed (post-materialization) shapes for the most expensive
    # queries per the latest bench detail — the column that separates
    # printed lineage from runtime cost.
    # Since the bench went stratified (1/3 of the fleet per round) the
    # latest BENCH_DETAIL alone misses known-expensive queries in other
    # strata, so union it with the newest full-coverage baseline
    # snapshot (stratified timing wins where both exist — it's fresher).
    repo_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    detail_path = os.path.join(repo_dir, "BENCH_DETAIL.json")
    executed: list[tuple[str, float, dict]] = []
    if os.path.exists(detail_path):
        import glob
        import json

        timings: dict[str, float] = {}
        baselines = sorted(
            glob.glob(os.path.join(repo_dir, "bench_baseline_r*.json")),
            key=lambda p: int(p.rsplit("_r", 1)[1].split(".")[0]),
        )
        if baselines:
            with open(baselines[-1]) as f:
                timings.update(json.load(f).get("queries", {}))
        with open(detail_path) as f:
            timings.update(json.load(f).get("queries", {}))
        qs = m.queries()
        top = sorted(
            ((t, n) for n, t in timings.items() if n in qs), reverse=True
        )[:10]
        for t_sec, name in top:
            executed.append((name, t_sec, executed_audit(qs[name](spark, sf_dir))))
            release_caches()
            spark.catalog.clearCache()
    cols = [
        "exchange", "bhj", "smj", "shj", "bnlj", "cartesian",
        "window", "wgl_partial", "scan", "pushed_scans",
        "py_eval", "pandas_grouped",
    ]
    tot = {c: sum(r[c] for _, r in rows) for c in cols}
    out = [
        "# PLAN_AUDIT — mechanical physical-plan inventory",
        "",
        f"Generated by `tools/plan_report.py {sf_dir}` over "
        f"{len(rows)} registered queries "
        f"(initial physical plans, pre-AQE; {time.time()-t0:.0f}s).",
        "",
        "Fleet totals: "
        f"{tot['exchange']} exchanges, {tot['bhj']} broadcast-hash joins, "
        f"{tot['smj']} sort-merge joins, {tot['shj']} shuffled-hash joins, "
        f"{tot['bnlj']} broadcast-nested-loop joins (each allowlisted with a "
        "bounded-side justification in tests/test_scale_ops.py), "
        f"{tot['cartesian']} cartesian products, "
        f"{tot['window']} window operators ({tot['wgl_partial']} with a "
        "Partial pre-shuffle WindowGroupLimit), "
        f"{tot['scan']} parquet scans ({tot['pushed_scans']} with pushed "
        "filters), "
        f"{tot['py_eval']} row/batch Python evals, "
        f"{tot['pandas_grouped']} Arrow grouped/map-in-pandas operators "
        "(multimodal + grouped-map surface only).",
        "",
        "| query | Exchange | BHJ | SMJ | SHJ | BNLJ | Cartesian | Window"
        " | WGL(Partial) | scans | pushed | PyEval | ArrowPandas |",
        "|---|---|---|---|---|---|---|---|---|---|---|---|---|",
    ]
    for name, r in rows:
        out.append(
            f"| {name} | " + " | ".join(str(r[c]) for c in cols) + " |"
        )
    if executed:
        out += [
            "",
            "## Executed shapes — 10 most expensive queries "
            "(post-materialization, AQE-final)",
            "",
            "The main table prints INITIAL plans, whose lineage is "
            "re-printed inside every cached-relation reference (an "
            "iterative query shows hundreds of 'scans' that never run). "
            "This table re-runs the bench's most expensive queries and "
            "reads the same QueryExecution AFTER the action: "
            "InMemoryTableScan (IMTS) counts show cache hits replacing "
            "that lineage, and join columns show the AQE-final "
            "strategies.",
            "",
            "| query | bench s (sf0.1) | IMTS | Exchange | BHJ | SMJ | "
            "SHJ | BNLJ | scans | AQE-final |",
            "|---|---|---|---|---|---|---|---|---|---|",
        ]
        for name, t_sec, r in executed:
            out.append(
                f"| {name} | {t_sec:.2f} | {r['imts']} | {r['exchange']} "
                f"| {r['bhj']} | {r['smj']} | {r['shj']} | {r['bnlj']} "
                f"| {r['scan']} | {'yes' if r['aqe_final'] else 'no'} |"
            )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo, "PLAN_AUDIT.md")
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote {path}: {len(rows)} queries; totals {tot}")


if __name__ == "__main__":
    main()
