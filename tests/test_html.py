"""HTML boilerplate extraction: parser semantics (entities, skip
subtrees, nesting, void tags, sloppy markup), the wrap_html →
html_extract round trip, and the map-only plan contract."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from etl_excel_to_hyper_tableau_spark.operators.html import (
    extract_blocks, html_extract, wrap_html,
)


# ---------------------------------------------------------------------------
# extract_blocks — plain-function parser semantics
# ---------------------------------------------------------------------------

def test_blocks_keep_and_order():
    html = ("<html><head><title>T</title></head><body>"
            "<h1>H</h1><p>a</p><p>b</p>"
            "<ul><li>x</li><li>y</li></ul></body></html>")
    assert extract_blocks(html) == [
        ("title", "T"), ("h1", "H"), ("p", "a"), ("p", "b"),
        ("li", "x"), ("li", "y")]


def test_skip_subtrees_dropped():
    html = ("<body><nav><a href='/'>Home</a><p>nav para</p></nav>"
            "<script>var x = 1 && 2;</script>"
            "<style>p{}</style>"
            "<p>kept</p>"
            "<footer><li>foot</li></footer></body>")
    assert extract_blocks(html) == [("p", "kept")]


def test_entities_decoded():
    assert extract_blocks("<p>a &amp; b &lt; c &gt; d &#65;</p>") == [
        ("p", "a & b < c > d A")]


def test_skip_inside_block():
    # a skip subtree nested INSIDE a block drops only its own text
    assert extract_blocks("<p>a<script>junk</script>b</p>") == [("p", "ab")]


def test_nested_blocks_document_order():
    # inner block closes first; li still emitted (with its direct text)
    assert extract_blocks("<li>pre<p>inner</p></li>") == [
        ("p", "inner"), ("li", "pre")]


def test_void_tags_do_not_break_nesting():
    assert extract_blocks("<p>a<br>b<img src='x'>c</p>") == [("p", "abc")]


def test_bare_text_outside_blocks_ignored():
    assert extract_blocks("<body>loose<div>also loose</div><p>k</p>") == [
        ("p", "k")]


def test_unclosed_block_not_emitted():
    assert extract_blocks("<p>never closed") == []


def test_skip_subtree_with_implicitly_closed_tags():
    # real-world HTML legally omits end tags for <li>/<p>/<td> — a
    # symmetric depth counter would leak skip state here and drop
    # every block after the nav (round-6 advice fix)
    html = ("<body><nav><ul><li>a<li>b</ul></nav>"
            "<p>kept</p><li>also kept</li></body>")
    assert extract_blocks(html) == [("p", "kept"), ("li", "also kept")]


def test_skip_subtree_with_unclosed_inner_skip_tag():
    # an unclosed inner skip root ends with its ancestor's end tag
    html = "<body><nav><header>x<p>junk</p></nav><p>kept</p></body>"
    assert extract_blocks(html) == [("p", "kept")]


def test_stray_skip_end_tag_ignored():
    assert extract_blocks("<body></nav><p>kept</p></body>") == [
        ("p", "kept")]


def test_sibling_skip_subtrees_independent():
    html = ("<body><nav><li>n1</nav><p>mid</p>"
            "<footer><li>f<li>g</footer><p>end</p></body>")
    assert extract_blocks(html) == [("p", "mid"), ("p", "end")]


# ---------------------------------------------------------------------------
# wrap_html → html_extract round trip on Spark
# ---------------------------------------------------------------------------

def _mk_docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t, lang=la, source=s) for i, t, la, s in rows])


def test_round_trip_blocks(spark):
    text = "w" * 80 + "rest"  # exactly one full chunk + remainder
    df = _mk_docs(spark, [(7, text, "en", "srcA")])
    out = html_extract(wrap_html(df)).orderBy("block_idx").collect()
    got = [(r.block_idx, r.tag, r.block_text) for r in out]
    assert got == [
        (0, "title", "Doc 7"),
        (1, "h1", "Docs & Data 7"),   # entity decoded by the parser
        (2, "p", "w" * 80),
        (3, "p", "rest"),
        (4, "li", "lang: en"),
        (5, "li", "source: srcA"),
    ]


def test_round_trip_escapes_special_chars(spark):
    # text containing raw HTML metacharacters must survive the
    # escape → parse round trip verbatim, not inject markup
    text = "a<b & c>d &amp; literal"
    df = _mk_docs(spark, [(1, text, "en", "s")])
    out = html_extract(wrap_html(df)).orderBy("block_idx").collect()
    ps = [r.block_text for r in out if r.tag == "p"]
    assert "".join(ps) == text
    # and nothing from the boilerplate leaked through
    tags = [r.tag for r in out]
    assert tags == ["title", "h1", "p", "li", "li"]


def test_round_trip_newline_text(spark):
    # (?s) chunking: newline-containing text must land entirely inside
    # <p> blocks (Java regex dot does not match \n without the flag,
    # which silently dropped the raw characters between chunks)
    text = ("line one\nline two\n" * 6) + "tail"
    df = _mk_docs(spark, [(3, text, "en", "s3")])
    out = html_extract(wrap_html(df)).orderBy("block_idx").collect()
    ps = [r.block_text for r in out if r.tag == "p"]
    assert "".join(ps) == text
    assert all(len(p) <= 80 for p in ps)


def test_empty_text_has_no_p_blocks(spark):
    df = _mk_docs(spark, [(2, "", "fr", "s2")])
    out = html_extract(wrap_html(df)).orderBy("block_idx").collect()
    assert [(r.block_idx, r.tag) for r in out] == [
        (0, "title"), (1, "h1"), (2, "li"), (3, "li")]


def test_null_page_quarantined(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, html="<p>ok</p>"), Row(doc_id=2, html=None)])
    out = html_extract(df).collect()
    assert [(r.doc_id, r.block_text) for r in out] == [(1, "ok")]


# ---------------------------------------------------------------------------
# plan contract: touch-once, no exchange
# ---------------------------------------------------------------------------

def test_extract_plan_is_map_only_at_scale(spark, sf_dir):
    # when the scan already yields >= defaultParallelism partitions (the
    # 100 TB case), the parallelism guard is a no-op and the plan is
    # exchange-free end-to-end
    par = spark.sparkContext.defaultParallelism
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(par)
    plan = (html_extract(wrap_html(docs))
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange") == 1  # only the explicit repartition above
    # synthesis stays JVM-side: exactly one Python boundary (the parser)
    assert plan.count("MapInPandas") == 1


def test_extract_guards_single_partition_input(spark, sf_dir):
    # a one-row-group local file must NOT serialize the parse on one
    # core: the guard round-robins the page column once
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    q = html_extract(wrap_html(docs))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "RoundRobinPartitioning" in plan
    assert q.rdd.getNumPartitions() >= spark.sparkContext.defaultParallelism


def test_wrap_html_is_pure_expressions(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (wrap_html(docs)
            ._jdf.queryExecution().executedPlan().toString())
    assert "MapInPandas" not in plan and "Exchange" not in plan
