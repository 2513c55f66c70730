"""Scaling spot-check: run the most expensive headline queries at sf0.1
and at a 10x-scaled copy of the same data, and report the time ratio.

Purpose (VERDICT r1, next-round item 5): turn the "tiny-query wall time
is constant scheduling overhead, compute-bound plans scale linearly"
claim into measured evidence, and catch any accidentally-quadratic
candidate generation.

The 10x corpus is built so that the *duplicate/similarity structure per
stratum matches the original* rather than exploding:

* documents — 10 copies, copy k Caesar-ciphered by k
  (``translate(text, 'a..z', rot_k('a..z'))``): a bijective char map
  preserves every intra-copy shingle relationship exactly (identical
  docs stay identical, near-dups stay near-dups) while cross-copy
  shingle overlap drops to ~zero — so pair output grows 10x, not 100x.
  (A token-suffix transform was tried first and left most char-3-grams
  shared across copies: minhash buckets merged all 10 copies into
  giant clusters and the candidate listing exploded 4700x — a data
  property, not a plan property.)
* embeddings — 10 copies, copy k's vector circularly shifted by k
  dimensions: an orthogonal permutation preserves intra-copy cosines
  bit-for-bit; cross-copy pairs land in unrelated LSH buckets.
* lineitem — 10 copies with offset keys.

Usage: python tools/scale_check.py [out_json] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from etl_excel_to_hyper_tableau_spark import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sfscale10"
COPIES = 10

QUERIES = [
    "pricing_summary",          # scan-heavy aggregate (lineitem 6M rows)
    "minhash_candidates",       # signature + LSH band join
    "simhash_pairs",            # signature + pigeonhole band join
    "text_profile",             # pure projection pipeline
    "doc_repetition",           # explode + two groupBys
    "ivf_topk",                 # ANN probe
    "embedding_near_dup_lsh",   # sign-LSH bucket join
    "bm25_search",              # in-array prefilter + tf/df aggregates
    "vocab_zipf",               # token aggregate + distributed top-k
    "incremental_dedup",        # new-batch vs corpus band join
    "cdc_latest_events",        # key-bounded partial aggregate
    "scd2_event_history",       # single-Exchange two-window history
    "doc_compression",          # Arrow pandas-UDF throughput
    "fuzzy_part_pairs",         # distinct-name collapse + multi-key blocking
    # round 4
    "balanced_shards",          # distributed two-phase size rank
    "mmr_select",               # k sequential map-only argmax scans
    "embedding_covariance",     # fixed d^2-rows-per-partition exchange
    "text_normalize",           # regex chain + Arrow NFC pass
    "cluster_representatives",  # pair graph + per-cluster max(struct)
    "content_chunks",           # rolling-hash boundaries, map-only
    "minhash_quality",          # truth/pred pair plans + hit join
    "hll_distinct",             # fixed m-registers-per-partition exchange
    # round 8
    "embedding_project",        # literal-plane JL fold, map-only
]

_AZ = "abcdefghijklmnopqrstuvwxyz"


def _docs_arm(k: int) -> str:
    rot = _AZ[k:] + _AZ[:k]
    text = "text" if k == 0 else f"translate(text, '{_AZ}', '{rot}')"
    return (f"SELECT doc_id + {k * 1000000} AS doc_id, {text} AS text, "
            f"lang, source, n_chars "
            f"FROM read_parquet('{SRC}/documents.parquet')")


def _emb_arm(k: int) -> str:
    # circular shift by k dims (1-based list slicing); keep the 3 query
    # vectors (vec_id < 3) unique to copy 0
    vec = "embedding" if k == 0 else f"embedding[{k + 1}:] || embedding[1:{k}]"
    where = "" if k == 0 else " WHERE vec_id >= 3"
    return (f"SELECT vec_id + {k * 1000000} AS vec_id, {vec} AS embedding, "
            f"label FROM read_parquet('{SRC}/embeddings.parquet'){where}")


# tables the selected queries touch (others symlink to the originals)
SCALED_SQL = {
    "documents": " UNION ALL ".join(_docs_arm(k) for k in range(COPIES)),
    "embeddings": " UNION ALL ".join(_emb_arm(k) for k in range(COPIES)),
    "lineitem": f"""
        SELECT l_orderkey + k * 100000000 AS l_orderkey, l_partkey, l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
        FROM read_parquet('{SRC}/lineitem.parquet'),
             (SELECT unnest(range({COPIES})) AS k)""",
    # 10 copies with offset keys and the SAME 64-name vocabulary — the
    # distinct-name table the fuzzy matcher pairs over stays constant
    # while the row count (and the groupBy's input) grows 10x
    "part": f"""
        SELECT p_partkey + k * 100000000 AS p_partkey, p_name, p_brand,
               p_type, p_size, p_retailprice
        FROM read_parquet('{SRC}/part.parquet'),
             (SELECT unnest(range({COPIES})) AS k)""",
    # 10 disjoint user populations with identical per-user histories —
    # CDC/SCD2 change-point density per key matches the original
    "events": f"""
        SELECT event_id + k * 100000000 AS event_id, ts,
               user_id + k * 1000000 AS user_id, event_type, value, props
        FROM read_parquet('{SRC}/events.parquet'),
             (SELECT unnest(range({COPIES})) AS k)""",
}


def build_scaled(file_size_bytes: int | None = None) -> None:
    """``file_size_bytes`` splits each scaled table into a DIRECTORY of
    parquet files of roughly that size — the honest big-corpus layout
    (a single 100+ MB file is one input split at the session's 128 MB
    ``maxPartitionBytes``, serializing every scan onto one task; real
    corpora arrive as many files)."""
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    opts = ("FORMAT PARQUET" if file_size_bytes is None
            else f"FORMAT PARQUET, FILE_SIZE_BYTES {int(file_size_bytes)}")
    for t, sql in SCALED_SQL.items():
        out = f"{DST}/{t}.parquet"
        if not os.path.exists(out):
            con.execute(f"COPY ({sql}) TO '{out}' ({opts})")
    for t in entry.TABLES:
        out = f"{DST}/{t}.parquet"
        if not os.path.exists(out):
            os.symlink(f"{SRC}/{t}.parquet", out)


def _near_dup_lsh_auto(spark, sf_dir):
    """embedding near-dup on the LSH path with AUTO plane count — the
    production configuration (the queries() entry pins planes=4 so the
    DuckDB oracle can reproduce the buckets; a pinned plane count is
    quadratic at scale, the auto count is what a 100 TB run uses)."""
    from etl_excel_to_hyper_tableau_spark.operators.dedup import (
        embedding_cosine_pairs,
    )
    emb = entry._t(spark, sf_dir, "embeddings")
    return embedding_cosine_pairs(emb, "embedding", "vec_id", threshold=0.4,
                                  use_lsh=True)


def _semantic_dedup_auto(spark, sf_dir):
    """semantic_dedup on the sub-bucketed scale path (lsh_planes=None →
    auto-scaled per-cell sign-LSH) — the production configuration (the
    queries() entry pins lsh_planes=0 so the DuckDB oracle reproduces
    the exact within-cell pair set; exact-within-cell with a FIXED cell
    count is quadratic at scale, the sub-bucketed path is what a 100 TB
    run uses)."""
    from etl_excel_to_hyper_tableau_spark.operators.similarity import (
        semantic_dedup,
    )
    emb = entry._t(spark, sf_dir, "embeddings")
    return semantic_dedup(emb, "embedding", "vec_id", n_cells=16,
                          threshold=0.5, lsh_planes=None)


def _image_phash_scaled(spark, sf_dir):
    """image_phash_dedup with the class count scaled to the corpus
    (~100 docs/class), the production configuration: the queries()
    entry pins n_classes=50 so the oracle enumerates fixed classes,
    but a FIXED class count over a growing corpus grows per-class
    membership linearly and pair output quadratically — the same documented hazard as semantic_dedup's
    pinned cells.  Scaling classes with the corpus keeps duplicate
    density constant, which is what a real dedup corpus looks like."""
    from etl_excel_to_hyper_tableau_spark.operators.multimodal import (
        make_class_png_media, phash_pairs,
    )
    docs = entry._t(spark, sf_dir, "documents").select("doc_id")
    n_classes = max(50, docs.count() // 100)
    media = make_class_png_media(docs, "doc_id", n_classes=n_classes)
    return phash_pairs(media, max_hamming=6)


def _audio_fp_scaled(spark, sf_dir):
    """audio_fp_dedup with the class count scaled to the corpus —
    the same density-preserving production configuration as
    _image_phash_scaled (the queries() entry pins n_classes=40 for
    its enumeration oracle)."""
    from etl_excel_to_hyper_tableau_spark.operators.multimodal import (
        audio_fp_pairs, make_class_wav_media,
    )
    docs = entry._t(spark, sf_dir, "documents").select("doc_id")
    n_classes = max(40, docs.count() // 100)
    media = make_class_wav_media(docs, "doc_id", n_classes=n_classes)
    return audio_fp_pairs(media, max_hamming=6)


def time_queries(spark, sf_dir: str, names: list[str]) -> dict[str, float]:
    qs = dict(entry.queries())
    qs["embedding_near_dup_lsh"] = _near_dup_lsh_auto
    qs["semantic_dedup"] = _semantic_dedup_auto
    qs["image_phash_dedup"] = _image_phash_scaled
    qs["audio_fp_dedup"] = _audio_fp_scaled
    out: dict[str, float] = {}
    for name in names:
        best = None
        for _ in range(2):  # cold then warm; report warm
            t0 = time.perf_counter()
            n = len(qs[name](spark, sf_dir).toPandas())
            best = time.perf_counter() - t0
        out[name] = round(best, 3)
        print(f"# {sf_dir} {name}: {best:.3f}s ({n} rows)", file=sys.stderr)
    return out


def main() -> None:
    build_scaled()
    # local-mode driver == the whole "cluster"; the 10x corpus needs a
    # real heap (the default 1g JVM dies on the 6M-row shuffles)
    spark = get_spark(app_name="scale_check",
                      extra_conf={"spark.driver.memory": "24g"})
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    names = sys.argv[2:] or QUERIES
    base = time_queries(spark, SRC, names)
    scaled = time_queries(spark, DST, names)
    report = {
        name: {"sf0.1_s": base[name], "x10_s": scaled[name],
               "ratio": round(scaled[name] / base[name], 2)}
        for name in names
    }
    print(json.dumps(report, indent=2))
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            json.dump(report, f, indent=2)
    spark.stop()


if __name__ == "__main__":
    main()
