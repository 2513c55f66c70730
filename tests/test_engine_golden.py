"""Golden end-to-end test (SURVEY §5.2-2): recreate the exact reference
scenario — two identical complaint-shaped files, the two example queries
(run_main_example.py:14-23), one pivot and one concat — and assert the
output schemas match the golden ``complaints_by_bank.hyper`` catalog.
"""

import pytest

from etl_excel_to_hyper_tableau_spark.bundles import QueryBundle
from etl_excel_to_hyper_tableau_spark.engine import QueryEngine
from etl_excel_to_hyper_tableau_spark.sinks.hyper import plan_hyper_tables
from etl_excel_to_hyper_tableau_spark.sources import xlsx_io

# a miniature of the CFPB complaints data: same column names the golden
# queries touch, tiny deterministic values
_COLS = ["company", "product", "company_response_to_consumer"]
_ROWS = [
    ["Bank of America", "Mortgage", "Closed with explanation"],
    ["Bank of America", "Mortgage", "Closed with explanation"],
    ["Bank of America", "Banking", "Closed"],
    ["Wells Fargo", "Mortgage", "Closed"],
    ["Wells Fargo", "Card", "Closed"],
]

Q1 = ("SELECT company, product, COUNT(product) as number_of_complaints "
      "FROM Sheet1.sheet WHERE company='Bank of America' GROUP BY product")
Q2 = ("SELECT company, COUNT(company) as number_of_complaints "
      "FROM Sheet1.sheet GROUP BY company "
      "HAVING COUNT(company_response_to_consumer) > 1")


@pytest.fixture()
def complaint_dir(tmp_path):
    for name in ("consumer_complaints.xlsx", "consumer_complaints1.xlsx"):
        xlsx_io.write_workbook(str(tmp_path / name), [("Sheet1", _COLS, _ROWS)])
    return str(tmp_path)


def _bundle(sink="excel"):
    return QueryBundle.from_strings(
        export_name="complaints_by_bank", sink=sink,
        matches=["consumer_complaints.xlsx", "consumer_complaints1.xlsx"],
        sheets=["Sheet1"],
        query_strings=[Q1, Q2],
        query_names=["complaint_counts_by_company", "num_of_complaints_per_company"],
        pivot_by_name={"complaint_counts_by_company": True},
    )


def test_golden_end_to_end(spark, complaint_dir, tmp_path):
    bundle = _bundle()
    eng = QueryEngine(spark, complaint_dir, [bundle], str(tmp_path / "out"))
    outputs = eng.process_queries()
    assert outputs["complaints_by_bank"].endswith(".xlsx")

    # --- pivot path: golden table complaint_counts_by_company -----------
    pivot_results = bundle.queried_dfs_by_query_name["complaint_counts_by_company"]
    assert len(pivot_results) == 2  # one per matched file
    cols, rows = xlsx_io.read_sheet(outputs["complaints_by_bank"],
                                    "complaint_counts_by_company")
    # golden schema: index, company, product, number_of_complaints
    assert cols == ["index", "company", "product", "number_of_complaints"]
    # provenance column holds extension-stripped file names
    assert {r[0] for r in rows} == {"consumer_complaints", "consumer_complaints1"}
    # BoA has 2 products → 2 rows per file
    assert len(rows) == 4
    by_key = {(r[0], r[2]): r[3] for r in rows}
    assert by_key[("consumer_complaints", "Mortgage")] == 2
    assert by_key[("consumer_complaints", "Banking")] == 1

    # --- concat path: golden table num_of_complaints_per_company --------
    cols2, rows2 = xlsx_io.read_sheet(outputs["complaints_by_bank"],
                                      "num_of_complaints_per_company")
    # golden schema: {match}_company, {match}_number_of_complaints × 2 files
    assert cols2 == [
        "consumer_complaints.xlsx_company",
        "consumer_complaints.xlsx_number_of_complaints",
        "consumer_complaints1.xlsx_company",
        "consumer_complaints1.xlsx_number_of_complaints",
    ]
    # HAVING > 1 keeps both companies (3 and 2 responses)
    assert len(rows2) == 2
    counts = {r[0]: r[1] for r in rows2}
    assert counts == {"Bank of America": 3, "Wells Fargo": 2}
    # identical input files → identical left/right halves
    assert all(r[0] == r[2] and r[1] == r[3] for r in rows2)


def test_hyper_table_plan_matches_golden_schema(spark, complaint_dir, tmp_path):
    # tableauhyperapi is absent here; the schema-mapping half of the sink
    # (the part the golden .hyper catalog pins) is still fully checked
    bundle = _bundle(sink="hyper")
    eng = QueryEngine(spark, complaint_dir, [bundle], str(tmp_path / "out"))
    match_map = eng.match_files()
    eng.stage(eng.distinct_sheets(match_map))
    try:
        results = []
        for query in bundle.queries:
            per_file = [(m, match_map[m], eng.run_query(query, match_map[m]))
                        for m in bundle.matches]
            results.append((query.name, eng.combine(bundle, query, per_file)))
        plans = plan_hyper_tables(results)
    finally:
        from etl_excel_to_hyper_tableau_spark.sources.registry import unregister_all
        unregister_all(spark, eng._registered)

    by_name = {p["table"]: p["columns"] for p in plans}
    # golden: index/company/product varchar + number_of_complaints integer
    assert by_name["complaint_counts_by_company"] == [
        ("index", "text", True), ("company", "text", True),
        ("product", "text", True), ("number_of_complaints", "big_int", True),
    ]
    assert [c[1] for c in by_name["num_of_complaints_per_company"]] == \
        ["text", "big_int", "text", "big_int"]


def test_match_resolution_errors(spark, complaint_dir, tmp_path):
    bundle = QueryBundle.from_strings(
        export_name="x", sink="excel", matches=["nonexistent_file"],
        sheets=["Sheet1"], query_strings=["SELECT 1"], query_names=["q"])
    eng = QueryEngine(spark, complaint_dir, [bundle], str(tmp_path))
    with pytest.raises(FileNotFoundError):
        eng.process_queries()
