"""Command-line entry point — the reference's ADF-trigger surface (X1/X2)
as a plain CLI.

    python -m sales_azure_data_engineer_project_spark.cli \
        --root /tmp/zones --csv /root/reference/RawData/SalesData.csv
    python -m sales_azure_data_engineer_project_spark.cli \
        --root /tmp/zones --csv /root/reference/RawData/IncrementalSales.csv

Each invocation is one pipeline run (initial or incremental is inferred
from sink state — the widget flag's only real effect, SURVEY X1).
``--report`` prints the data-quality report; ``--analysis`` runs the
reference's units-by-branch-year query.
"""

from __future__ import annotations

import argparse
import json

from .plans import SalesPipeline
from .session import get_spark


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="sales_azure_data_engineer_project_spark")
    ap.add_argument("--root", required=True, help="zone root directory")
    ap.add_argument("--csv", required=True, help="raw sales CSV to load")
    ap.add_argument("--report", action="store_true", help="print quality report")
    ap.add_argument("--analysis", action="store_true", help="print units by branch/year")
    ap.add_argument("--show", type=int, default=0, help="rows of each gold table to print")
    args = ap.parse_args(argv)

    spark = get_spark("sales-pipeline-cli")
    pipe = SalesPipeline(spark, args.root)
    out = pipe.run(args.csv)

    counts = {t: df.count() for t, df in out.items()}
    print(json.dumps({"tables": counts}, sort_keys=True))

    if args.show:
        for t, df in out.items():
            print(f"== {t} ==")
            df.show(args.show, truncate=False)
    if args.analysis:
        pipe.units_by_branch_year().show(50, truncate=False)
    if args.report:
        print(json.dumps(pipe.quality_report(), sort_keys=True))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
