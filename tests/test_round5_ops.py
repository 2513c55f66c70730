"""Round-5 operators: URL canonicalization/dedup, PCA variance
spectrum, and the remaining TPC-H shapes' engine-side invariants."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# canonicalize_url / url_dedup
# ---------------------------------------------------------------------------

CASES = [
    # fragment stripped
    ("https://ex.com/a#frag", "https://ex.com/a"),
    # scheme+host lowercased, path case preserved
    ("HTTPS://WWW.Ex.COM/Path/Q", "https://www.ex.com/Path/Q"),
    # default ports dropped, non-default kept
    ("https://ex.com:443/a", "https://ex.com/a"),
    ("http://ex.com:80/a", "http://ex.com/a"),
    ("http://ex.com:8080/a", "http://ex.com:8080/a"),
    # tracking params stripped wherever they sit; separators repaired
    ("https://ex.com/a?utm_source=x", "https://ex.com/a"),
    ("https://ex.com/a?utm_source=x&b=2", "https://ex.com/a?b=2"),
    ("https://ex.com/a?b=2&utm_source=x", "https://ex.com/a?b=2"),
    ("https://ex.com/a?utm_source=x&utm_medium=y", "https://ex.com/a"),
    ("https://ex.com/a?gclid=123&b=2&fbclid=9", "https://ex.com/a?b=2"),
    # bare trailing slash on empty path dropped; deeper path kept
    ("https://ex.com/", "https://ex.com"),
    ("https://ex.com/a/", "https://ex.com/a/"),
    # untouched plain URL round-trips
    ("https://ex.com/a?b=2&c=3", "https://ex.com/a?b=2&c=3"),
]


def test_canonicalize_url_cases(spark):
    from etl_excel_to_hyper_tableau_spark.operators.web import (
        canonicalize_url,
    )
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(CASES)],
                               "i long, url string")
    got = {r["i"]: r["c"]
           for r in df.select("i", canonicalize_url(F.col("url"))
                              .alias("c")).collect()}
    for i, (u, want) in enumerate(CASES):
        assert got[i] == want, f"{u!r} -> {got[i]!r}, want {want!r}"


def test_canonicalize_url_matches_duckdb_re2(spark):
    """The chain must be RE2-portable: DuckDB running the same patterns
    produces the same canonical forms (the oracle contract)."""
    import duckdb
    from etl_excel_to_hyper_tableau_spark.operators.web import (
        canonicalize_url,
    )
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(CASES)],
                               "i long, url string")
    got = [r["c"] for r in
           df.select("i", canonicalize_url(F.col("url")).alias("c"))
           .orderBy("i").collect()]
    con = duckdb.connect()
    duck = []
    for u, _ in CASES:
        duck.append(con.execute(r"""
WITH s1 AS (SELECT regexp_replace(?, '#.*$', '') AS u),
s2 AS (SELECT lower(regexp_extract(u, '^([^/?#]*://[^/?#]*)', 1))
         || regexp_replace(u, '^[^/?#]*://[^/?#]*', '') AS u FROM s1),
s3 AS (SELECT regexp_replace(u,
         '^(https?://[^/:?#]+):(?:80|443)([/?#].*)?$', '\1\2') AS u FROM s2),
s4 AS (SELECT regexp_replace(u,
         '[?&](?:utm_[a-z]+|gclid|fbclid|msclkid|mc_cid|mc_eid)=[^&#]*',
         '', 'g') AS u FROM s3),
s5 AS (SELECT regexp_replace(u, '^([^?]*)&', '\1?') AS u FROM s4),
s6 AS (SELECT regexp_replace(u, '[?&]$', '') AS u FROM s5)
SELECT regexp_replace(u, '^(https?://[^/?#]+)/$', '\1') FROM s6
""", [u]).fetchone()[0])
    assert got == duck


def test_url_dedup_collapses_variants(spark):
    from etl_excel_to_hyper_tableau_spark.operators.web import url_dedup
    rows = [
        (1, "https://ex.com/a"),
        (2, "HTTPS://EX.com/a#x"),
        (3, "https://ex.com:443/a?utm_source=s"),
        (4, "https://ex.com/a?real=1"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r["canonical_url"]: (r["keep_id"], r["n_variants"])
           for r in url_dedup(df, "url", "doc_id").collect()}
    assert out == {"https://ex.com/a": (1, 3),
                   "https://ex.com/a?real=1": (4, 1)}


# ---------------------------------------------------------------------------
# pca_variance
# ---------------------------------------------------------------------------

def test_pca_variance_matches_numpy_and_sums_to_one(spark):
    rng = np.random.default_rng(7)
    # anisotropic data: dim 0 has 9x the std of dim 2
    x = rng.normal(size=(400, 3)) * np.array([9.0, 3.0, 1.0])
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "id long, emb array<double>")
    from etl_excel_to_hyper_tableau_spark.operators.similarity import (
        pca_variance,
    )
    out = sorted(pca_variance(df, "emb").collect(),
                 key=lambda r: r["component"])
    lam = [r["eigenvalue"] for r in out]
    assert lam == sorted(lam, reverse=True)
    # explained fractions sum to 1 and cum matches the running sum
    assert out[-1]["cum_explained"] == pytest.approx(1.0, abs=1e-9)
    assert sum(r["explained"] for r in out) == pytest.approx(1.0, abs=1e-9)
    # spectrum ≈ numpy eigvalsh of the population covariance
    cov = np.cov(x.T, bias=True)
    ref = np.linalg.eigvalsh(cov)[::-1]
    for got, want in zip(lam, ref):
        assert got == pytest.approx(want, rel=1e-6, abs=1e-6)


# ---------------------------------------------------------------------------
# TPC-H round-5 shapes: plan hygiene spot checks
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name", [
    "cheapest_type_supplier", "supplier_variety",
])
def test_round5_tpch_dims_broadcast(spark, sf_dir, name):
    """The dim sides (part/supplier) must broadcast — no shuffle of the
    lineitem fact against a metadata-sized dimension."""
    import __spark_entry__ as entry
    df = entry.queries()[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_dominant_part_suppliers_share_is_exact_decimal(spark, sf_dir):
    """The 30%-share threshold compares decimals, not doubles: scaling
    both sides by 10/3 keeps the comparison exact (no FP boundary)."""
    import __spark_entry__ as entry
    out = entry.queries()["dominant_part_suppliers"](spark, sf_dir)
    rows = out.collect()
    assert len(rows) > 0
    assert all(r["n_dominant"] >= 1 for r in rows)
