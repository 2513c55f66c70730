"""The .sheet macro rewriter + table-name mangling (reference
query.py:13-27, fsheet.py:38-42; SURVEY A8/A9)."""

from etl_excel_to_hyper_tableau_spark.plans.macro import (
    format_query, sanitize_identifier, sql_table_name, strip_extension,
)


def test_strip_extension():
    assert strip_extension("data.xlsx") == "data"
    assert strip_extension("a.b.xlsx") == "a.b"
    assert strip_extension("noext") == "noext"
    # leading-dot files keep their name (rfind > 0 guard)
    assert strip_extension(".hidden") == ".hidden"


def test_sql_table_name_matches_reference_convention():
    # reference: consumer_complaints.xlsx / Sheet1 →
    # consumer_complaints_Sheet1_sheet (fsheet.py:38-42)
    assert sql_table_name("consumer_complaints.xlsx", "Sheet1") == \
        "consumer_complaints_Sheet1_sheet"


def test_sql_table_name_sanitizes_spark_identifiers():
    name = sql_table_name("my file (v2).xlsx", "Sheet 1")
    assert " " not in name and "(" not in name
    assert name == "my_file__v2__Sheet_1_sheet"


def test_sanitize_leading_digit():
    assert sanitize_identifier("2023data") == "_2023data"


def test_format_query_rewrites_sheet_tokens():
    sql = "SELECT * FROM Sheet1.sheet"
    assert format_query(sql, "data.xlsx") == "SELECT * FROM data_Sheet1_sheet"


def test_format_query_reference_example():
    # the reference example queries (run_main_example.py:14-23)
    sql = ("SELECT company, product, COUNT(product) as number_of_complaints "
           "FROM Sheet1.sheet WHERE company='Bank of America' GROUP BY product")
    out = format_query(sql, "consumer_complaints.xlsx")
    assert "consumer_complaints_Sheet1_sheet" in out
    assert ".sheet" not in out


def test_format_query_only_suffix_tokens():
    # tokens merely *containing* .sheet mid-token are untouched
    # (rfind must land so the suffix ends the token — query.py:18-23)
    sql = "SELECT 'x.sheety' FROM a.sheet"
    out = format_query(sql, "f.xlsx")
    assert out == "SELECT 'x.sheety' FROM f_a_sheet"


def test_format_query_trailing_punctuation():
    # `a.sheet,` in a comma join list / `b.sheet)` closing a subquery:
    # the suffix char survives the rewrite (the reference silently eats
    # it — implement-the-intent divergence, VERDICT r1 #4)
    sql = "SELECT * FROM a.sheet, b.sheet WHERE x IN (SELECT x FROM c.sheet)"
    out = format_query(sql, "f.xlsx")
    assert out == ("SELECT * FROM f_a_sheet, f_b_sheet "
                   "WHERE x IN (SELECT x FROM f_c_sheet)")


def test_format_query_normalizes_whitespace():
    # the reference re-joins on single spaces (query.py:24-26)
    assert format_query("SELECT  *\n FROM   t", "f.xlsx") == "SELECT * FROM t"
