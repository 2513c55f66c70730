"""Z-order clustered staging (plans/zorder.py): Morton interleave
correctness vs a Python reference, per-file bounding-box quality via
pyarrow row-group stats (the property a Delta/Iceberg manifest would
use to skip whole files at 100 TB), pushdown audit, and staged-scan
value parity."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from etl_excel_to_hyper_tableau_spark.plans.zorder import (
    normalize_to_bits, pushed_filter_count, stage_zordered, zvalue,
)


def _morton_ref(vals: tuple[int, ...], bits: int) -> int:
    z = 0
    for b in range(bits):
        for j, v in enumerate(vals):
            z |= ((v >> b) & 1) << (b * len(vals) + j)
    return z


@pytest.fixture(scope="module")
def staged(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("zorder") / "lineitem")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    stage_zordered(li, path, ["l_shipdate", "l_partkey"], n_files=16)
    return path, li


class TestZValue:
    def test_matches_python_reference(self, spark):
        pts = [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 1), (7, 65535)]
        df = spark.createDataFrame(pts, "x long, y long")
        got = {(r["x"], r["y"]): r["z"] for r in
               df.withColumn(
                   "z", zvalue([F.col("x"), F.col("y")], 16)).collect()}
        for p in pts:
            assert got[p] == _morton_ref(p, 16)

    def test_rejects_overflow_and_empty(self):
        with pytest.raises(ValueError):
            zvalue([F.lit(1), F.lit(2)], bits=32)   # 64 > 62
        with pytest.raises(ValueError):
            zvalue([], bits=8)

    def test_normalize_clamps_and_degenerates(self, spark):
        df = spark.range(1).select(
            normalize_to_bits(F.lit(5.0), 0.0, 10.0, 4).alias("mid"),
            normalize_to_bits(F.lit(-1.0), 0.0, 10.0, 4).alias("lo"),
            normalize_to_bits(F.lit(99.0), 0.0, 10.0, 4).alias("hi"),
            normalize_to_bits(F.lit(7.0), 3.0, 3.0, 4).alias("deg"),
            normalize_to_bits(F.lit(None).cast("double"),
                              0.0, 10.0, 4).alias("nul"))
        r = df.collect()[0]
        assert r["mid"] == 7 and r["lo"] == 0 and r["hi"] == 15
        assert r["deg"] == 0 and r["nul"] == 0


class TestStagedLayout:
    def test_row_count_and_values_preserved(self, spark, staged):
        path, li = staged
        st = spark.read.parquet(path)
        assert st.count() == li.count()
        key = ["l_orderkey", "l_linenumber"]
        assert st.select(*key).exceptAll(li.select(*key)).isEmpty()

    def test_bounding_boxes_compact_in_both_dims(self, staged):
        path, _ = staged
        spans_d, spans_p = [], []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                row = md.row_group(rg)
                st = {row.column(i).path_in_schema:
                      row.column(i).statistics
                      for i in range(row.num_columns)}
                spans_d.append((st["l_shipdate"].min,
                                st["l_shipdate"].max))
                spans_p.append((st["l_partkey"].min,
                                st["l_partkey"].max))
        full_d = (max(s[1] for s in spans_d)
                  - min(s[0] for s in spans_d)).total_seconds()
        full_p = (max(s[1] for s in spans_p)
                  - min(s[0] for s in spans_p))
        frac_d = [((s[1] - s[0]).total_seconds() / full_d)
                  for s in spans_d]
        frac_p = [(s[1] - s[0]) / full_p for s in spans_p]
        # a 1-D sort gives ~1/n_files in its dimension and ~1.0 in the
        # other; z-order must be compact in BOTH simultaneously
        assert sum(frac_d) / len(frac_d) < 0.6
        assert sum(frac_p) / len(frac_p) < 0.6

    def test_range_box_skips_row_groups(self, staged):
        import datetime

        path, _ = staged
        lo = datetime.datetime(1996, 3, 1)
        hi = datetime.datetime(1996, 6, 1)
        total, hit = 0, 0
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                row = md.row_group(rg)
                st = {row.column(i).path_in_schema:
                      row.column(i).statistics
                      for i in range(row.num_columns)}
                total += 1
                d, p = st["l_shipdate"], st["l_partkey"]
                if (d.max >= lo and d.min < hi
                        and p.max >= 100 and p.min <= 400):
                    hit += 1
        assert total >= 8
        assert hit < 0.8 * total, (hit, total)

    def test_pushdown_reaches_reader(self, spark, staged):
        path, _ = staged
        st = spark.read.parquet(path)
        q = st.filter((F.col("l_shipdate") >= "1996-03-01")
                      & (F.col("l_shipdate") < "1996-06-01")
                      & (F.col("l_partkey") >= 100)
                      & (F.col("l_partkey") <= 400))
        assert pushed_filter_count(q) == 6
        assert pushed_filter_count(st) == 0

    def test_pushed_in_filter_counts_as_one(self, spark, staged):
        # regression (round-9 ADVICE): a pushed In filter prints as
        # In(col, [100,200,300]) — the old first-']' regex truncated
        # the capture mid-list and the paren-only comma counter split
        # it into three.  A bare In is ONE pushed filter (Catalyst
        # emits no IsNotNull companion for In); adding a range bound
        # adds IsNotNull + GreaterThanOrEqual on the other column.
        path, _ = staged
        st = spark.read.parquet(path)
        q = st.filter(F.col("l_partkey").isin(100, 200, 300))
        assert pushed_filter_count(q) == 1
        q2 = q.filter(F.col("l_shipdate") >= "1996-03-01")
        assert pushed_filter_count(q2) == 3

    def test_all_null_dimension_degrades_gracefully(self, spark,
                                                    tmp_path):
        df = spark.range(100).select(
            F.col("id"),
            F.lit(None).cast("double").alias("dead"),
            (F.col("id") % 7).alias("live"))
        path = str(tmp_path / "nulldim")
        stage_zordered(df, path, ["dead", "live"], n_files=4)
        back = spark.read.parquet(path)
        assert back.count() == 100
        assert back.selectExpr("sum(id)").collect()[0][0] == 4950


class TestFileSkipManifest:
    """round 9: the file-level skip path the module's honest-scope note
    always pointed at — stage_zordered now emits _stats_manifest.json
    and read_file_pruned prunes FILES before spark.read."""

    def test_manifest_written_and_invisible_to_reader(self, spark,
                                                      staged):
        import json
        import os

        path, li = staged
        man = os.path.join(path, "_stats_manifest.json")
        assert os.path.exists(man)
        with open(man) as fh:
            m = json.load(fh)
        assert m["columns"] == ["l_shipdate", "l_partkey"]
        assert len(m["files"]) == len(glob.glob(f"{path}/*.parquet"))
        assert sum(e["rows"] for e in m["files"]) == li.count()
        # the underscore prefix keeps the staging a plain parquet table
        assert spark.read.parquet(path).count() == li.count()

    def test_pruned_read_loses_no_rows(self, spark, staged):
        import datetime

        from etl_excel_to_hyper_tableau_spark.plans.zorder import (
            read_file_pruned,
        )

        path, li = staged
        pred = ((F.col("l_shipdate") >= "1996-03-01")
                & (F.col("l_shipdate") < "1996-06-01")
                & (F.col("l_partkey") >= 100)
                & (F.col("l_partkey") <= 400))
        st, n_read, n_total = read_file_pruned(spark, path, [
            ("l_shipdate", ">=", datetime.datetime(1996, 3, 1)),
            ("l_shipdate", "<", datetime.datetime(1996, 6, 1)),
            ("l_partkey", ">=", 100),
            ("l_partkey", "<=", 400)])
        want = li.filter(pred).count()
        assert st.filter(pred).count() == want
        assert 0 < n_read < n_total          # skipped some, kept some
        assert (n_total - n_read) * 2 >= n_total   # the entry's pin

    def test_zero_survivors_keeps_schema(self, spark, staged):
        from etl_excel_to_hyper_tableau_spark.plans.zorder import (
            read_file_pruned,
        )

        path, li = staged
        st, n_read, n_total = read_file_pruned(
            spark, path, [("l_partkey", "<", -1)])
        assert n_read == 0 and n_total > 0
        assert st.count() == 0
        assert st.schema == spark.read.parquet(path).schema

    def test_missing_stats_column_is_conservative(self, staged):
        from etl_excel_to_hyper_tableau_spark.plans.zorder import (
            prune_files,
        )

        path, _ = staged
        # a column absent from the manifest cannot prune anything
        kept, total = prune_files(
            path, [("no_such_column", ">=", 10 ** 12)])
        assert len(kept) == total

    def test_prune_ops_against_point_stats(self, spark, tmp_path):
        from etl_excel_to_hyper_tableau_spark.plans.zorder import (
            prune_files, write_stats_manifest,
        )

        # two files with disjoint known ranges: ids 0-9 and 100-109
        p = str(tmp_path / "two")
        spark.range(10).coalesce(1).write.parquet(p)
        (spark.range(100, 110).coalesce(1)
         .write.mode("append").parquet(p))
        write_stats_manifest(p, ["id"])
        for pred, want in ((("id", ">=", 50), 1), (("id", "<", 5), 1),
                           (("id", "=", 105), 1), (("id", "<=", 9), 1),
                           (("id", ">", 109), 0), (("id", "=", 50), 0),
                           (("id", ">=", 9), 2)):
            kept, total = prune_files(p, [pred])
            assert total == 2 and len(kept) == want, (pred, len(kept))

    def test_file_skip_composes_with_rowgroup_pushdown(self, spark,
                                                       staged):
        # the two skipping levers stack: the manifest drops whole FILES
        # before spark.read, and the residual predicate still reaches
        # the surviving files' readers for row-group pruning
        import datetime

        from etl_excel_to_hyper_tableau_spark.plans.zorder import (
            read_file_pruned,
        )

        path, _ = staged
        st, n_read, n_total = read_file_pruned(spark, path, [
            ("l_shipdate", ">=", datetime.datetime(1996, 3, 1)),
            ("l_shipdate", "<", datetime.datetime(1996, 6, 1))])
        q = st.filter((F.col("l_shipdate") >= "1996-03-01")
                      & (F.col("l_shipdate") < "1996-06-01"))
        assert 0 < n_read < n_total
        assert pushed_filter_count(q) == 3   # IsNotNull + two bounds

    def test_tz_aware_stats_normalize_to_utc_naive(self):
        # round-10 ADVICE fix: pyarrow emits tz-AWARE datetimes for
        # UTC-adjusted timestamp columns; their isoformat carried a
        # '+00:00' suffix that lexicographically mis-compared against
        # naive predicate encodings at boundary predicates
        import datetime

        from etl_excel_to_hyper_tableau_spark.plans.zorder import (
            _stat_encode,
        )
        naive = datetime.datetime(1996, 3, 1)
        aware = datetime.datetime(1996, 3, 1,
                                  tzinfo=datetime.timezone.utc)
        plus2 = datetime.datetime(1996, 3, 1, 2, 0, tzinfo=
                                  datetime.timezone(
                                      datetime.timedelta(hours=2)))
        assert _stat_encode(aware) == _stat_encode(naive)
        assert _stat_encode(plus2) == _stat_encode(naive)  # same instant
        assert "+" not in _stat_encode(aware)

    def test_unlisted_file_is_kept_conservatively(self, spark,
                                                  tmp_path):
        # round-10 ADVICE fix: a parquet file appended AFTER the
        # manifest was written must be KEPT (a stale manifest may only
        # lose pruning power, never rows)
        from etl_excel_to_hyper_tableau_spark.plans.zorder import (
            prune_files, read_file_pruned, write_stats_manifest,
        )
        p = str(tmp_path / "stale")
        spark.range(10).coalesce(1).write.parquet(p)
        write_stats_manifest(p, ["id"])
        (spark.range(1000, 1010).coalesce(1)
         .write.mode("append").parquet(p))      # external append
        kept, total = prune_files(p, [("id", ">=", 500)])
        assert total == 2
        # the listed file prunes away; the unlisted one survives
        assert len(kept) == 1
        df, n_read, n_total = read_file_pruned(
            spark, p, [("id", ">=", 500)])
        assert {r["id"] for r in df.filter("id >= 500").collect()} \
            == set(range(1000, 1010))
