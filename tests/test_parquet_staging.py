"""Parquet staging mode: same results as in-memory staging, and queries
scan parquet with pushdown (the parse-once-query-parquet scale layout)."""

import contextlib
import io

from etl_excel_to_hyper_tableau_spark.bundles import Query, QueryBundle
from etl_excel_to_hyper_tableau_spark.engine import QueryEngine
from etl_excel_to_hyper_tableau_spark.sources import xlsx_io


def _mk_inputs(d):
    rows = [[i, "grp%d" % (i % 3), i * 1.5] for i in range(60)]
    xlsx_io.write_workbook(f"{d}/data.xlsx",
                           [("Sheet1", ["id", "grp", "val"], rows)])


def _run(spark, d, out, stage_format):
    b = QueryBundle.from_strings(
        "o", "excel", ["data"], ["Sheet1"],
        ["SELECT grp, COUNT(id) AS n FROM Sheet1.sheet "
         "WHERE id > 10 GROUP BY grp"], ["q"])
    eng = QueryEngine(spark, d, [b], out, stage_format=stage_format)
    match_map = eng.match_files()
    eng.stage(eng.distinct_sheets(match_map))
    try:
        df = eng.run_query(b.queries[0], match_map["data"])
        rows = sorted(tuple(r) for r in df.collect())
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return rows, buf.getvalue()
    finally:
        from etl_excel_to_hyper_tableau_spark.sources.registry import unregister_all
        unregister_all(spark, eng._registered)
        eng._registered.clear()


def test_parquet_staging_matches_memory_and_pushes_down(spark, tmp_path):
    d = str(tmp_path / "in")
    import os
    os.makedirs(d)
    _mk_inputs(d)
    mem_rows, mem_plan = _run(spark, d, str(tmp_path / "o1"), "memory")
    pq_rows, pq_plan = _run(spark, d, str(tmp_path / "o2"), "parquet")
    assert pq_rows == mem_rows
    # the filter reaches the parquet scan, and only the queried columns
    # are read — the properties xlsx scans cannot give
    assert "Scan parquet" in pq_plan
    assert "PushedFilters: [IsNotNull(id), GreaterThan(id,10)]" in pq_plan
    assert "id" in pq_plan and "val" not in pq_plan.split("ReadSchema")[1][:120]


def test_compact_parquet_merges_small_files(spark, tmp_path):
    from etl_excel_to_hyper_tableau_spark.sinks.parquet import (
        compact_parquet, parquet_file_stats,
    )
    src = str(tmp_path / "frag")
    # simulate an incremental ingest: 40 tiny files
    spark.range(0, 4000).selectExpr("id", "id % 7 as k", "cast(id as string) as s") \
        .repartition(40).write.parquet(src)
    n_in, _ = parquet_file_stats(src)
    assert n_in >= 40
    out = str(tmp_path / "compact")
    stats = compact_parquet(spark, src, out, target_file_mb=512,
                            sort_within_by=["k", "id"])
    assert stats["files_out"] == stats["partitions"] == 1  # tiny data → one file
    back = spark.read.parquet(out)
    assert back.count() == 4000
    assert {r["id"] for r in back.collect()} == set(range(4000))


def test_zorder_key_matches_morton_reference(spark):
    from pyspark.sql import functions as F
    from etl_excel_to_hyper_tableau_spark.sinks.parquet import zorder_key
    rows = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {(r["x"], r["y"]): r["z"]
           for r in df.select("x", "y",
                              zorder_key(["x", "y"], bits=4).alias("z"))
                      .collect()}

    def morton(x, y, bits=4):
        z = 0
        for b in range(bits):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z

    for (x, y), z in got.items():
        assert z == morton(x, y), (x, y, z)


def test_stage_zordered_tightens_both_columns(spark, tmp_path):
    import pyarrow.parquet as pq
    import glob
    from etl_excel_to_hyper_tableau_spark.sinks.parquet import stage_zordered
    # two independent uniform dims; row order random-ish by construction
    rows = [((i * 2654435761) % 256, (i * 40503) % 256) for i in range(20000)]
    df = spark.createDataFrame(rows, "x long, y long")
    src = str(tmp_path / "src")
    df.repartition(4).write.parquet(src)
    out = str(tmp_path / "zout")
    stats = stage_zordered(spark, src, out, ["x", "y"], bits=8,
                           partitions=8)
    # force multiple output files for a meaningful skipping measure
    assert stats["files_out"] >= 2

    def mean_area(path):
        areas = []
        for f in glob.glob(path + "/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            lo = {c: None for c in ("x", "y")}
            hi = {c: None for c in ("x", "y")}
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    name = col.path_in_schema
                    if name in lo and col.statistics is not None:
                        mn, mx = col.statistics.min, col.statistics.max
                        lo[name] = mn if lo[name] is None else min(lo[name], mn)
                        hi[name] = mx if hi[name] is None else max(hi[name], mx)
            areas.append(((hi["x"] - lo["x"] + 1) / 256.0)
                         * ((hi["y"] - lo["y"] + 1) / 256.0))
        return sum(areas) / len(areas)

    # each z-ordered file covers a small fraction of the (x, y) square;
    # the unsorted input's files each cover ~the whole square
    assert mean_area(out) < 0.5 < mean_area(src)


def test_zorder_key_refuses_bit_overflow(spark):
    import pytest
    from etl_excel_to_hyper_tableau_spark.sinks.parquet import zorder_key
    with pytest.raises(ValueError, match="bits"):
        zorder_key(["a", "b", "c", "d"], bits=16)


def test_quantile_buckets_equalize_skewed_column(spark):
    from pyspark.sql import functions as F
    from etl_excel_to_hyper_tableau_spark.sinks.parquet import (
        quantile_buckets, zorder_key,
    )
    # heavily skewed: 90% of values in [0, 10), long tail to 10^6
    rows = [(i, float(i % 10) if i % 10 else float(i) * 100.0)
            for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, v double")
    b = quantile_buckets(df, "v", bits=4)  # 16 buckets
    counts = (df.select(b.alias("bk")).groupBy("bk").count().collect())
    ns = [r["count"] for r in counts]
    assert all(0 <= r["bk"] < 16 for r in counts)
    # approx-equal population: no bucket is wildly oversized
    assert max(ns) <= 5 * (2000 // 16)
    # bucketized columns compose with the Morton key
    df2 = df.select(b.alias("x"), (F.col("id") % 16).alias("y"))
    z = df2.select(zorder_key(["x", "y"], bits=4).alias("z")).collect()
    assert all(0 <= r["z"] < 256 for r in z)


def test_quantile_buckets_binary_search_matches_linear_scan(spark):
    """The O(bits) bit-refinement search must produce exactly the
    count-of-boundaries-<=-value bucket the old linear scan computed,
    including on duplicated boundaries (constant runs from skew)."""
    from pyspark.sql import functions as F
    from etl_excel_to_hyper_tableau_spark.sinks.parquet import quantile_buckets
    # 60% constant value -> long runs of identical quantile boundaries
    rows = [(i, 5.0 if i % 5 < 3 else float(i)) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, v double")
    n = 1 << 4
    probs = [i / n for i in range(1, n)]
    bounds = df.approxQuantile("v", probs, 0.001)
    arr = "array(" + ",".join(f"{b!r}D" for b in bounds) + ")"
    linear = F.expr(
        f"size(filter({arr}, b -> b <= coalesce(cast(v as double), "
        f"cast('-Infinity' as double))))")
    got = (df.select((quantile_buckets(df, "v", bits=4) == linear)
                     .alias("same")).agg(F.min("same")).collect()[0][0])
    assert got is True


def test_quantile_buckets_default_bits16_finishes_fast(spark):
    """At the documented default bits=16 (65,535 boundaries) bucket
    assignment must be O(bits) probes per row — 100k rows in seconds,
    not the ~6.5e9 comparisons of a per-row linear scan."""
    import time
    from pyspark.sql import functions as F
    from etl_excel_to_hyper_tableau_spark.sinks.parquet import quantile_buckets
    df = spark.range(100_000).select(
        F.col("id"), (F.pmod(F.col("id") * 2654435761, F.lit(1_000_003))
                      .cast("double")).alias("v"))
    t0 = time.monotonic()
    b = quantile_buckets(df, "v", bits=16)
    res = (df.select(b.alias("bk"))
           .agg(F.min("bk").alias("lo"), F.max("bk").alias("hi"),
                F.count("*").alias("n")).collect()[0])
    elapsed = time.monotonic() - t0
    assert res["n"] == 100_000
    assert 0 <= res["lo"] and res["hi"] < (1 << 16)
    # near-uniform input should spread across most of the bucket range
    assert res["hi"] - res["lo"] > (1 << 15)
    assert elapsed < 60.0, f"bits=16 bucket assignment took {elapsed:.1f}s"


def test_dpp_filter_planned_on_partitioned_join(spark, tmp_path):
    # round 8 (plans/pruning.py): a selective dim filter against a
    # directory-partitioned fact must plan a dynamicpruningexpression
    # in the fact scan's PartitionFilters; the same join against the
    # UNpartitioned fact must not (nothing to prune)
    from pyspark.sql import functions as F
    from etl_excel_to_hyper_tableau_spark.plans.pruning import (
        dpp_filter_count, stage_partitioned,
    )

    fact = spark.createDataFrame(
        [(i, f"g{i % 5}", i * 10) for i in range(200)],
        "id long, grp string, v long")
    path = str(tmp_path / "fact_by_grp")
    stage_partitioned(fact, path, ["grp"])
    staged = spark.read.parquet(path)
    dim_path = str(tmp_path / "dim")
    (spark.createDataFrame([("g1", 1), ("g3", 1), ("g4", 0)],
                           "grp string, keep int")
     .write.parquet(dim_path))
    # DPP preconditions exercised deliberately: the dim is a real
    # source (a LocalRelation never plans DPP), and its filter is on a
    # NON-join column — a join-key filter gets propagated as a STATIC
    # partition predicate instead, and no runtime pruning is needed
    dim = spark.read.parquet(dim_path).filter(F.col("keep") == 1)
    j = staged.join(dim.hint("broadcast"), "grp")
    assert dpp_filter_count(j) >= 1
    assert dpp_filter_count(fact.join(dim, "grp")) == 0
    # values unchanged by the layout
    got = sorted((r["grp"], r["id"]) for r in j.collect())
    want = sorted((f"g{i % 5}", i) for i in range(200) if i % 5 in (1, 3))
    assert got == want
    import pytest as _pt
    with _pt.raises(ValueError, match="partition_cols"):
        stage_partitioned(fact, path, [])
