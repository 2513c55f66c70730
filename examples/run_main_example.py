"""The reference's entry point (run_main_example.py:10-62), re-expressed
on this engine — the "switch your pipeline over" demo.

Differences from the reference, all documented quirk fixes (SURVEY §7.0):
the tkinter directory picker becomes CLI arguments; pivot flags are keyed
by query name instead of dict order; the export name doesn't get a
spurious ``.hyper`` infix; no SQLite database file exists at all (the
staging catalog is Catalyst temp views).

Usage:
    python examples/run_main_example.py <input_dir> <export_dir> [sink]

where <input_dir> holds the Excel workbooks (e.g. the reference's
consumer_complaints.xlsx / consumer_complaints1.xlsx) and sink is
``hyper`` (requires tableauhyperapi), ``excel`` (default) or ``parquet``.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_excel_to_hyper_tableau_spark import QueryBundle, QueryEngine, get_spark


def create_query_bundles(sink: str) -> list[QueryBundle]:
    # the exact reference queries (run_main_example.py:14-23), including
    # query 1's missing space before GROUP BY — the dialect shim and
    # Spark's parser both tolerate it, as SQLite did
    data = QueryBundle.from_strings(
        export_name="complaints_by_bank",
        sink=sink,
        matches=["consumer_complaints.xlsx", "consumer_complaints1.xlsx"],
        sheets=["Sheet1"],
        query_strings=[
            "SELECT company, product, "
            "COUNT(product) as number_of_complaints "
            "FROM Sheet1.sheet "
            "WHERE company='Bank of America'"
            "GROUP BY product "
            "HAVING COUNT(company_response_to_consumer)>10",
            "SELECT company, COUNT(company) as number_of_complaints "
            "FROM Sheet1.sheet "
            "GROUP BY company ",
        ],
        query_names=["complaint_counts_by_company",
                     "num_of_complaints_per_company"],
        pivot_by_name={"complaint_counts_by_company": True},
    )
    return [data]


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    input_dir, export_dir = sys.argv[1], sys.argv[2]
    sink = sys.argv[3] if len(sys.argv) > 3 else "excel"
    spark = get_spark(app_name="run_main_example")
    engine = QueryEngine(spark, input_dir, create_query_bundles(sink), export_dir)
    outputs = engine.process_queries()
    for name, path in outputs.items():
        print(f"{name} -> {path}")


if __name__ == "__main__":
    main()
