"""Round-8 surfaces: bucket-pruned point lookups (plans/bucketing.
selected_buckets) and the JL random projection (operators.similarity.
random_project) — values vs brute force, physical plan asserted."""

from __future__ import annotations

import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from etl_excel_to_hyper_tableau_spark.operators.similarity import (
    jl_matrix, random_project,
)
from etl_excel_to_hyper_tableau_spark.plans.bucketing import (
    selected_buckets, write_bucketed,
)


@pytest.fixture(scope="module")
def lookup_table(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    write_bucketed(orders.select("o_custkey", "o_orderstatus",
                                 "o_totalprice"),
                   "t8_orders_lookup", ["o_custkey"], 8,
                   sort_cols=["o_custkey"])
    yield "t8_orders_lookup"
    spark.sql("DROP TABLE IF EXISTS t8_orders_lookup")


class TestBucketPruning:
    def test_point_lookup_reads_one_bucket(self, spark, lookup_table):
        agg = (spark.table(lookup_table)
               .filter(F.col("o_custkey") == 1)
               .groupBy("o_custkey", "o_orderstatus").count())
        assert selected_buckets(agg) == [(1, 8)]

    def test_in_list_prunes_to_at_most_k_buckets(self, spark,
                                                 lookup_table):
        agg = (spark.table(lookup_table)
               .filter(F.col("o_custkey").isin(1, 3, 5))
               .groupBy("o_custkey").count())
        sel = selected_buckets(agg)
        assert len(sel) == 1
        s, n = sel[0]
        assert n == 8 and 1 <= s <= 3

    def test_pruned_values_equal_plain_scan(self, spark, sf_dir,
                                            lookup_table):
        pruned = (spark.table(lookup_table)
                  .filter(F.col("o_custkey") == 1)
                  .groupBy("o_custkey", "o_orderstatus")
                  .agg(F.count(F.lit(1)).alias("n")))
        plain = (spark.read.parquet(f"{sf_dir}/orders.parquet")
                 .filter(F.col("o_custkey") == 1)
                 .groupBy("o_custkey", "o_orderstatus")
                 .agg(F.count(F.lit(1)).alias("n")))
        assert sorted(map(tuple, pruned.collect())) \
            == sorted(map(tuple, plain.collect()))

    def test_non_bucket_predicate_reports_empty(self, spark,
                                                lookup_table):
        t = spark.table(lookup_table).filter(
            F.col("o_orderstatus") == "F")
        assert selected_buckets(t) == []


class TestRandomProject:
    def test_matches_numpy_left_fold_bitwise(self, spark, sf_dir):
        emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
               .select(F.col("vec_id").alias("id"),
                       F.col("embedding").alias("emb")))
        out = {r["id"]: np.asarray(r["vec"]) for r in
               random_project(emb, "emb", "id", 16, seed=0).collect()}
        pdf = emb.limit(80).toPandas()
        r = np.asarray(jl_matrix(64, 16, 0))
        for _, row in pdf.iterrows():
            x = np.asarray(row["emb"], dtype=np.float64)
            ref = np.cumsum(x[:, None] * r, axis=0)[-1]
            assert np.array_equal(ref, out[row["id"]])

    def test_jl_matrix_is_deterministic_rademacher(self):
        a = jl_matrix(8, 4, seed=7)
        assert a == jl_matrix(8, 4, seed=7)
        assert a != jl_matrix(8, 4, seed=8)
        s = 1.0 / math.sqrt(4.0)
        assert all(abs(v) == s for row in a for v in row)

    def test_distances_preserved_within_jl_bound(self, spark, sf_dir):
        emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
               .select(F.col("vec_id").alias("id"),
                       F.col("embedding").alias("emb")))
        proj = {r["id"]: np.asarray(r["vec"]) for r in
                random_project(emb, "emb", "id", 16, seed=0).collect()}
        pdf = emb.limit(40).toPandas()
        x = np.asarray([np.asarray(v) for v in pdf["emb"]])
        p = np.asarray([proj[i] for i in pdf["id"]])
        dx = np.linalg.norm(x[:, None, :] - x[None, :, :], axis=2)
        dp = np.linalg.norm(p[:, None, :] - p[None, :, :], axis=2)
        m = dx > 0
        ratio = dp[m] / dx[m]
        # k=16 gives a loose ε; the mean must sit near 1 and no pair
        # may collapse or blow up past the Rademacher tail
        assert 0.85 < float(ratio.mean()) < 1.15
        assert float(ratio.min()) > 0.3 and float(ratio.max()) < 2.5

    def test_rejects_bad_out_dim(self, spark, sf_dir):
        emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
               .select(F.col("vec_id").alias("id"),
                       F.col("embedding").alias("emb")))
        with pytest.raises(ValueError):
            random_project(emb, "emb", "id", 0)

    def test_map_only_no_exchange(self, spark, sf_dir):
        emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
               .select(F.col("vec_id").alias("id"),
                       F.col("embedding").alias("emb")))
        plan = (random_project(emb, "emb", "id", 16)
                ._jdf.queryExecution().executedPlan().toString())
        assert "Exchange hashpartitioning" not in plan


class TestRandomProjectValidation:
    def test_null_embedding_refused_loudly(self, spark):
        df = spark.createDataFrame(
            [(1, [1.0, 2.0]), (2, None)], "id long, emb array<double>")
        with pytest.raises(Exception, match="NULL or ragged"):
            random_project(df, "emb", "id", 2).collect()

    def test_ragged_embedding_refused_loudly(self, spark):
        # enough interleaved widths that every Arrow batch sees both
        # (the guard is per-task: a batch of homogeneous width passes)
        rows = [(i, [1.0, 2.0] if i % 2 else [1.0, 2.0, 3.0])
                for i in range(200)]
        df = spark.createDataFrame(rows, "id long, emb array<double>")
        with pytest.raises(Exception, match="NULL or ragged"):
            random_project(df, "emb", "id", 2).collect()
