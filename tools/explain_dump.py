"""Dump ``.explain("formatted")`` for named registered queries.

Writes one ``<outdir>/<query>_<suffix>.txt`` per query — the evidence
files behind OPTIMIZATION_r*.md plan claims (``plans/r10/...``).  The
plan is the INITIAL formatted physical plan (no execution), the same
artifact ``df.explain("formatted")`` prints: join strategy, exchange
placement, PushedFilters/ReadSchema per scan, codegen spans.

Usage:
    python tools/explain_dump.py <outdir> <suffix> [sf_dir] q1 q2 ...
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    outdir = sys.argv[1]
    suffix = sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"
    names = sys.argv[4:]
    os.makedirs(outdir, exist_ok=True)

    import __spark_entry__ as entry_mod
    from sales_azure_data_engineer_project_spark.caching import release_caches
    from sales_azure_data_engineer_project_spark.session import get_spark

    spark = get_spark("explain-dump")
    qs = entry_mod.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown query name(s): {unknown}")
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"-- {name} @ {sf_dir} ({suffix})\n")
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
        release_caches()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
