"""Continuous-curation ingest stream (streaming/ingest.py): per-batch
clean + self-dedup + incremental dedup against the growing corpus,
with idempotent per-batch partitions."""

from __future__ import annotations

import os
import time

from etl_excel_to_hyper_tableau_spark.streaming.ingest import curated_ingest

BASE = ("the quick brown fox jumps over the lazy dog and keeps "
        "jumping until the dog finally wakes up and barks loudly")


def _write_batch(spark, path, rows, mtime):
    import pyarrow as pa
    import pyarrow.parquet as pq
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tbl = pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows], pa.string())})
    pq.write_table(tbl, path)
    os.utime(path, (mtime, mtime))


def test_curated_ingest_dedups_across_batches(spark, tmp_path):
    inp = str(tmp_path / "in")
    corpus = str(tmp_path / "corpus")
    t0 = time.time() - 100
    # batch 1: two distinct docs
    _write_batch(spark, f"{inp}/b1.parquet",
                 [(1, BASE), (2, "completely different text about spark "
                                 "engines and distributed query planning")],
                 t0)
    # batch 2: near-dup of doc 1 (must be dropped) + one new doc
    _write_batch(spark, f"{inp}/b2.parquet",
                 [(10, BASE + " extra"), (11, "a third subject entirely: "
                                              "benchmarks of columnar file "
                                              "formats at petabyte scale")],
                 t0 + 10)
    # batch 3: exact dup of doc 11 (dropped) + a fresh doc
    _write_batch(spark, f"{inp}/b3.parquet",
                 [(20, "a third subject entirely: benchmarks of columnar "
                       "file formats at petabyte scale"),
                  (21, "finally some unrelated prose regarding gardening "
                       "and the correct watering of tomato plants")],
                 t0 + 20)

    stats = curated_ingest(spark, inp, corpus, threshold=0.5)
    assert stats["batches"] == 3
    accepted = {r["doc_id"] for r in spark.read.parquet(corpus).collect()}
    assert accepted == {1, 2, 11, 21}
    assert stats["accepted"] == 4
    # batch provenance is recorded for idempotent replay
    parts = {r["batch_id"] for r in
             spark.read.parquet(corpus).select("batch_id").distinct().collect()}
    assert len(parts) == 3


def test_band_index_is_staged_and_used(spark, tmp_path):
    """The staged band index must exist, carry one batch partition per
    accepted batch, and joining a repeat batch against it (no corpus
    text) must flag the duplicates."""
    from pyspark.sql import functions as F
    from etl_excel_to_hyper_tableau_spark.operators.dedup import (
        minhash_incremental_candidates,
    )
    inp = str(tmp_path / "in")
    corpus = str(tmp_path / "corpus")
    t0 = time.time() - 50
    _write_batch(spark, f"{inp}/b1.parquet", [(1, BASE)], t0)
    _write_batch(spark, f"{inp}/b2.parquet",
                 [(2, "an unrelated document about compilers and "
                      "intermediate representations")], t0 + 5)
    curated_ingest(spark, inp, corpus, threshold=0.5)
    staged = spark.read.parquet(corpus + "__bands")
    assert {r["id"] for r in staged.select("id").distinct().collect()} == {1, 2}
    repeat = spark.createDataFrame([(99, BASE + " slightly")],
                                   "doc_id long, text string")
    hits = (minhash_incremental_candidates(
                repeat, None, "text", "doc_id", k=16, bands=4,
                corpus_bands=staged.select("id", "band", "bh", "sig"))
            .filter(F.col("est_jaccard") >= 0.5).collect())
    assert {r["corpus_id"] for r in hits} == {1}


def test_curated_ingest_from_jsonl(spark, tmp_path):
    """The same curation stream over JSONL landing files."""
    import json
    inp = str(tmp_path / "in")
    os.makedirs(inp)
    t0 = time.time() - 30
    for i, (name, rows) in enumerate([
            ("b1.jsonl", [{"doc_id": 1, "text": BASE}]),
            ("b2.jsonl", [{"doc_id": 2, "text": BASE + " tail"},   # near-dup
                          {"doc_id": 3, "text": "fresh prose about nothing "
                                                "in particular at all"}])]):
        p = os.path.join(inp, name)
        with open(p, "w") as f:
            f.write("\n".join(json.dumps(r) for r in rows))
        os.utime(p, (t0 + i * 5, t0 + i * 5))
    corpus = str(tmp_path / "corpus")
    stats = curated_ingest(spark, inp, corpus, threshold=0.5,
                           source_format="jsonl")
    assert stats["batches"] == 2
    assert {r["doc_id"] for r in spark.read.parquet(corpus).collect()} == {1, 3}


def test_vector_index_ingest_cross_batch_dedup_and_probe(spark, tmp_path):
    import time
    from etl_excel_to_hyper_tableau_spark.operators.similarity import (
        ivf_topk_staged,
    )
    from etl_excel_to_hyper_tableau_spark.streaming.ingest import (
        vector_index_ingest,
    )
    land = tmp_path / "land"
    land.mkdir()
    index = str(tmp_path / "vecindex")
    centroids = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]

    def write_batch(rows, name):
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        df.coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / f"stage_{name}"))
        import shutil, glob, os
        src = glob.glob(str(tmp_path / f"stage_{name}" / "part-*.parquet"))[0]
        shutil.copy(src, str(land / f"{name}.parquet"))

    # batch 1: two vectors, one per cell
    write_batch([(1, [1.0, 0.02]), (2, [0.05, 1.0])], "b1")
    s1 = vector_index_ingest(spark, str(land), index, centroids,
                             dedup_threshold=0.999)
    assert s1["accepted"] == 2

    # batch 2: a near-duplicate of vec 1 (same cell -> dropped) and a
    # genuinely new vector (accepted)
    time.sleep(1.1)  # distinct file mtime for the stream source
    write_batch([(3, [1.0, 0.0201]), (4, [-1.0, 0.1])], "b2")
    s2 = vector_index_ingest(spark, str(land), index, centroids,
                             dedup_threshold=0.999)
    assert s2["accepted"] == 1

    staged = spark.read.parquet(index)
    ids = sorted(r["id"] for r in staged.collect())
    assert ids == [1, 2, 4]

    # probes work against the accreted index with the frozen centroids
    qs = spark.createDataFrame([(100, [1.0, 0.01])],
                               "qid long, qv array<double>")
    out = ivf_topk_staged(spark, index, centroids, qs, "qv", "qid",
                          k=2, nprobe=1).collect()
    assert [r["id"] for r in sorted(out, key=lambda r: r["rank"])][0] == 1


def test_sketch_ingest_accumulates_across_batches(spark, tmp_path):
    import time
    from etl_excel_to_hyper_tableau_spark.operators.sketches import (
        count_min_build, count_min_estimate,
    )
    from etl_excel_to_hyper_tableau_spark.streaming.ingest import sketch_ingest
    land = tmp_path / "cmsland"
    land.mkdir()
    sketch_dir = str(tmp_path / "sketch")

    def write_batch(keys, name):
        df = spark.createDataFrame([(k,) for k in keys], "k long")
        df.coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / f"s_{name}"))
        import shutil, glob
        src = glob.glob(str(tmp_path / f"s_{name}" / "part-*.parquet"))[0]
        shutil.copy(src, str(land / f"{name}.parquet"))

    write_batch([1] * 5 + [2] * 3, "b1")
    ckpt = str(tmp_path / "cms_ckpt")
    s1 = sketch_ingest(spark, str(land), sketch_dir, "k", "k long",
                       depth=2, width=64, checkpoint_dir=ckpt)
    assert s1["rows"] == 8
    time.sleep(1.1)
    write_batch([1] * 4 + [3] * 7, "b2")
    sketch_ingest(spark, str(land), sketch_dir, "k", "k long",
                  depth=2, width=64, checkpoint_dir=ckpt)

    # staged sketch == one-shot sketch over the concatenated stream
    whole = count_min_build(
        spark.createDataFrame([(k,) for k in [1] * 9 + [2] * 3 + [3] * 7],
                              "k long"), "k", depth=2, width=64)
    probes = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    staged = spark.read.parquet(sketch_dir)
    es = {r["key"]: r["est"] for r in count_min_estimate(
        staged, probes, "k", depth=2, width=64).collect()}
    ew = {r["key"]: r["est"] for r in count_min_estimate(
        whole, probes, "k", depth=2, width=64).collect()}
    assert es == ew
    assert es["1"] >= 9 and es["3"] >= 7


def test_sketch_ingest_skips_already_merged_epochs(spark, tmp_path):
    """Replay idempotency: a batch whose epoch_id is <= the watermark
    persisted with the staged sketch is skipped, not re-merged — the
    post-swap / pre-checkpoint-commit crash window cannot double-count."""
    import glob
    import shutil
    from etl_excel_to_hyper_tableau_spark.operators.sketches import (
        count_min_estimate,
    )
    from etl_excel_to_hyper_tableau_spark.streaming.ingest import sketch_ingest
    land = tmp_path / "cmsland2"
    land.mkdir()
    sketch_dir = str(tmp_path / "sketch2")

    df = spark.createDataFrame([(1,)] * 6 + [(2,)] * 2, "k long")
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "s2_b1"))
    src = glob.glob(str(tmp_path / "s2_b1" / "part-*.parquet"))[0]
    shutil.copy(src, str(land / "b1.parquet"))

    sketch_ingest(spark, str(land), sketch_dir, "k", "k long",
                  depth=2, width=64,
                  checkpoint_dir=str(tmp_path / "ck_a"))
    probes = spark.createDataFrame([(1,), (2,)], "k long")

    def estimates():
        staged = spark.read.parquet(sketch_dir)
        return {r["key"]: r["est"] for r in count_min_estimate(
            staged, probes, "k", depth=2, width=64).collect()}

    before = estimates()
    # fresh checkpoint over the same landing dir re-delivers the same
    # file as epoch 0 — exactly what a replayed uncommitted epoch looks
    # like to the sink; the staged watermark (0) must reject it
    sketch_ingest(spark, str(land), sketch_dir, "k", "k long",
                  depth=2, width=64,
                  checkpoint_dir=str(tmp_path / "ck_b"))
    assert estimates() == before


def test_vector_index_ingest_within_batch_dedup(spark, tmp_path):
    """Two near-duplicate vectors arriving in the SAME micro-batch:
    only the smaller id is accepted (the staged comparison alone can't
    see them — they'd both pass against an empty/earlier index)."""
    import glob
    import shutil
    from etl_excel_to_hyper_tableau_spark.streaming.ingest import (
        vector_index_ingest,
    )
    land = tmp_path / "land_wb"
    land.mkdir()
    index = str(tmp_path / "vecindex_wb")
    centroids = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]

    rows = [(1, [1.0, 0.02]), (2, [1.0, 0.0201]),  # near-dups, same cell
            (3, [0.05, 1.0])]                       # distinct, other cell
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "st_wb"))
    src = glob.glob(str(tmp_path / "st_wb" / "part-*.parquet"))[0]
    shutil.copy(src, str(land / "b1.parquet"))

    s = vector_index_ingest(spark, str(land), index, centroids,
                            dedup_threshold=0.999)
    assert s["accepted"] == 2
    ids = sorted(r["id"] for r in spark.read.parquet(index).collect())
    assert ids == [1, 3]


def test_budget_gate_state_survives_micro_batches(spark, tmp_path):
    """The point of the stateful gate: a source that exhausted its
    budget in batch 1 stays closed in batch 2 (the spent counter lives
    in the state store, not in the batch)."""
    import glob
    import shutil
    import time
    from etl_excel_to_hyper_tableau_spark.streaming.ingest import (
        run_budget_gate_availablenow,
    )
    land = tmp_path / "bg_land"
    land.mkdir()

    def write_batch(rows, name):
        df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, "
                  "n_chars long")
        df.coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / f"bg_{name}"))
        src = glob.glob(str(tmp_path / f"bg_{name}" / "part-*.parquet"))[0]
        shutil.copy(src, str(land / f"{name}.parquet"))

    # batch 1: source s0 spends 8 of its 10-token budget
    write_batch([(1, "w w w w w", "en", "s0", 9),
                 (2, "w w w", "en", "s0", 5)], "b1")
    time.sleep(1.1)
    # batch 2: 3 more tokens would fit a FRESH budget but not the
    # carried-over one; s1's first doc is fine
    write_batch([(3, "w w w", "en", "s0", 5),
                 (4, "w w", "en", "s1", 3)], "b2")
    out = run_budget_gate_availablenow(spark, str(land),
                                       budget_per_source=10,
                                       max_files_per_trigger=1).collect()
    got = {r["doc_id"]: (r["source"], r["n_tokens"], r["spent_after"])
           for r in out}
    assert got == {1: ("s0", 5, 5), 2: ("s0", 3, 8), 4: ("s1", 2, 2)}
    assert 3 not in got  # 8 + 3 > 10: state carried across batches


def test_hll_ingest_accumulates_and_remerge_is_noop(spark, tmp_path):
    """Registers accumulate across micro-batches to exactly the batch
    sketch; re-running the whole stream into the same sketch dir (a
    full replay with a fresh checkpoint) changes nothing — max-merge
    is idempotent, the property that lets hll_ingest skip the CMS
    epoch-watermark machinery."""
    import glob
    import shutil
    from etl_excel_to_hyper_tableau_spark.operators.sketches import (
        hll_build,
    )
    from etl_excel_to_hyper_tableau_spark.streaming.ingest import hll_ingest

    land = tmp_path / "hll_land"
    land.mkdir()
    all_rows = []

    def write_batch(ids, name):
        rows = [(i, f"user_{i}") for i in ids]
        all_rows.extend(rows)
        df = spark.createDataFrame(rows, "id long, uid string")
        df.coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / f"hb_{name}"))
        src = glob.glob(str(tmp_path / f"hb_{name}" / "part-*.parquet"))[0]
        shutil.copy(src, str(land / f"{name}.parquet"))

    write_batch(range(0, 300), "b1")
    write_batch(range(200, 500), "b2")  # overlap: 200..299 repeat
    sk = str(tmp_path / "sketch")
    stats = hll_ingest(spark, str(land), sk, "uid",
                       schema="id long, uid string", p=6)
    assert stats["batches"] == 2
    staged = {(r["register"], r["max_rank"])
              for r in spark.read.parquet(sk).collect()}
    batch = {(r["register"], r["max_rank"])
             for r in hll_build(
                 spark.createDataFrame(all_rows, "id long, uid string"),
                 "uid", p=6).collect()}
    assert staged == batch
    # full replay into the same sketch dir: a no-op on the registers
    hll_ingest(spark, str(land), sk, "uid",
               schema="id long, uid string", p=6)
    staged2 = {(r["register"], r["max_rank"])
               for r in spark.read.parquet(sk).collect()}
    assert staged2 == staged


def test_histogram_ingest_accumulates_and_skips_replayed_epochs(spark,
                                                                tmp_path):
    """Two-batch staged cells == one-shot pinned-grid sketch over the
    concatenated stream; a replayed epoch (fresh checkpoint, same
    landing file) is rejected by the watermark — summed cells must
    never double-count."""
    import glob
    import shutil
    import time
    from etl_excel_to_hyper_tableau_spark.operators.sketches import (
        histogram_sketch,
    )
    from etl_excel_to_hyper_tableau_spark.streaming.ingest import (
        histogram_ingest, staged_histogram_quantiles,
    )
    land = tmp_path / "histland"
    land.mkdir()
    sketch_dir = str(tmp_path / "hsketch")

    def write_batch(vals, name):
        df = spark.createDataFrame([(float(v),) for v in vals], "v double")
        df.coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / f"h_{name}"))
        src = glob.glob(str(tmp_path / f"h_{name}" / "part-*.parquet"))[0]
        shutil.copy(src, str(land / f"{name}.parquet"))

    b1 = list(range(0, 50))
    b2 = list(range(50, 120)) + [999.0]  # 999 clamps into the top bin
    ckpt = str(tmp_path / "hist_ckpt")
    write_batch(b1, "b1")
    histogram_ingest(spark, str(land), sketch_dir, "v", "v double",
                     bins=16, lo=0.0, hi=100.0, checkpoint_dir=ckpt)
    time.sleep(1.1)
    write_batch(b2, "b2")
    histogram_ingest(spark, str(land), sketch_dir, "v", "v double",
                     bins=16, lo=0.0, hi=100.0, checkpoint_dir=ckpt)

    whole = spark.createDataFrame([(float(v),) for v in b1 + b2],
                                  "v double")
    want = {r["bin"]: r["cnt"] for r in histogram_sketch(
        whole, "v", bins=16, lo=0.0, hi=100.0).collect()}
    got = {r["bin"]: r["cnt"]
           for r in spark.read.parquet(sketch_dir).collect()}
    assert got == want

    before = {r["q"]: r["estimate"] for r in staged_histogram_quantiles(
        spark, sketch_dir, 16, (0.5, 0.9)).collect()}
    # fresh checkpoint re-delivers both files as replayed epochs
    histogram_ingest(spark, str(land), sketch_dir, "v", "v double",
                     bins=16, lo=0.0, hi=100.0,
                     checkpoint_dir=str(tmp_path / "hist_ckpt2"))
    after = {r["q"]: r["estimate"] for r in staged_histogram_quantiles(
        spark, sketch_dir, 16, (0.5, 0.9)).collect()}
    assert after == before


def _write_media_batch(spark, path, ids_classes, mtime):
    """Parquet batch of MEDIA_SCHEMA rows: real PNG bytes, class-seeded
    (same class => byte-identical image)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from etl_excel_to_hyper_tableau_spark.functions.png import encode_png

    os.makedirs(os.path.dirname(path), exist_ok=True)
    contents = []
    for _mid, k in ids_classes:
        arr = np.random.default_rng(1000 + k).integers(
            0, 256, size=(24, 32), dtype=np.uint8)
        contents.append(encode_png(arr))
    meta_t = pa.struct([("format", pa.string()), ("width", pa.int32()),
                        ("height", pa.int32()), ("sample_rate", pa.int32()),
                        ("n_frames", pa.int32())])
    tbl = pa.table({
        "media_id": pa.array([m for m, _ in ids_classes], pa.int64()),
        "kind": pa.array(["image"] * len(ids_classes), pa.string()),
        "content": pa.array(contents, pa.binary()),
        "meta": pa.array([("png", 32, 24, None, None)] * len(ids_classes),
                         meta_t),
    })
    pq.write_table(tbl, path)
    os.utime(path, (mtime, mtime))


def test_media_dedup_ingest_within_and_cross_batch(spark, tmp_path):
    from etl_excel_to_hyper_tableau_spark.streaming.ingest import (
        media_dedup_ingest,
    )

    inp = str(tmp_path / "media_in")
    idx = str(tmp_path / "media_idx")
    t0 = time.time() - 100
    # batch 1: ids 0,1 duplicates (class 5) + id 2 unique (class 6)
    _write_media_batch(spark, f"{inp}/b1.parquet",
                       [(0, 5), (1, 5), (2, 6)], t0)
    # batch 2: id 10 dup of staged class 5, id 11 new class 7
    _write_media_batch(spark, f"{inp}/b2.parquet",
                       [(10, 5), (11, 7)], t0 + 10)

    stats = media_dedup_ingest(spark, inp, idx, kind="image")
    assert stats["batches"] == 2
    assert stats["accepted"] == 3  # 0, 2, 11 (1 intra-dup, 10 cross-dup)
    staged = spark.read.parquet(idx)
    assert sorted(r["media_id"] for r in staged.collect()) == [0, 2, 11]
    # signatures staged alongside content — later batches never re-decode
    assert "sig" in staged.columns
    assert staged.filter(staged.sig.isNull()).count() == 0


def test_curation_pipeline_end_to_end(spark, tmp_path):
    """round 9: the composed pipeline (boilerplate -> exact+minhash
    dedup -> quality -> budget -> WebDataset).  Regression for the
    index-append cache invalidation: writing the digest index BEFORE
    downstream stages consumed the batch uncached the anti-join plan
    (refreshByPath), and re-execution saw the batch's own digests —
    annihilating every batch after the first.  Multi-batch survivors
    prove the ordering fix."""
    import glob
    import json

    from etl_excel_to_hyper_tableau_spark.sinks.webdataset import (
        read_webdataset,
    )
    from etl_excel_to_hyper_tableau_spark.streaming.ingest import (
        curation_pipeline,
    )

    inp = str(tmp_path / "land")
    out = str(tmp_path / "wds")
    os.makedirs(inp)
    hdr, ftr = "NAV: home", "(c) example"
    body = ("the quick brown fox jumps over the lazy dog and keeps "
            "jumping until the dog finally wakes up and barks loudly "
            "at the moon while owls watch from the old oak tree")
    mk = {0: [(1, body + " v1"), (2, "exact duplicate payload here "
                                     + body)],
          1: [(10, body + " v2 totally"),          # fresh content
              (11, "exact duplicate payload here " + body)]}  # dup of 2
    t0 = time.time() - 100
    for b, rows in mk.items():
        path = f"{inp}/b{b}.jsonl"
        with open(path, "w") as fh:
            for d, t in rows:
                fh.write(json.dumps({"doc_id": d,
                                     "text": f"{hdr}\n{t}\n{ftr}",
                                     "lang": "en", "source": "s"}) + "\n")
        os.utime(path, (t0 + b, t0 + b))

    # min_frac 0.9 -> ceil(0.9*2) = 2 of the 2 docs per batch: the
    # shared header/footer strip, each unique payload line survives
    # (0.5 would make ceil(0.5*2)=1 — every line boilerplate).
    # cross_batch_minhash=False: this test pins the DIGEST-index
    # regression, and doc 10 is deliberately a cross-batch NEAR-dup of
    # doc 1 that must survive here; the staged band path has its own
    # test (test_curation_pipeline_crossbatch_neardup)
    stats = curation_pipeline(spark, inp, out, budget_per_source=10_000,
                              min_frac=0.9, min_tokens=5,
                              minhash_bands=2, minhash_k=16,
                              cross_batch_minhash=False)
    assert stats["batches"] == 2
    shards = glob.glob(f"{out}/batch=*/shard-*.tar")
    assert shards
    back = read_webdataset(spark, f"{out}/batch=*/shard-*.tar")
    keys = sorted({int(r["key"]) for r in back.collect()})
    # doc 11 is the cross-batch exact dup of doc 2 -> dropped; batch 1's
    # fresh doc 10 MUST survive (the cache-invalidation bug killed it);
    # minhash may drop near-dups of doc 1 within a batch, never across
    assert 11 not in keys
    assert 10 in keys and 2 in keys
    # boilerplate stripped: payloads carry neither header nor footer
    for r in back.filter("ext = 'txt'").collect():
        txt = bytes(r["content"]).decode("utf-8")
        assert hdr not in txt and ftr not in txt


def test_curation_pipeline_replay_is_byte_identical(spark, tmp_path):
    """Two full pipeline runs over the same landing dir must produce
    byte-identical shards: every stage is deterministic and the
    WebDataset writer pins tar metadata — the property that makes a
    failure-recovery replay safe to serve."""
    import glob
    import hashlib
    import json

    from etl_excel_to_hyper_tableau_spark.streaming.ingest import (
        curation_pipeline,
    )

    inp = str(tmp_path / "land")
    os.makedirs(inp)
    body = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    t0 = time.time() - 50
    for b in range(2):
        path = f"{inp}/b{b}.jsonl"
        with open(path, "w") as fh:
            for i in range(3):
                d = b * 10 + i
                fh.write(json.dumps(
                    {"doc_id": d, "text": f"HDR\n{body} doc{d}\nFTR",
                     "lang": "en", "source": f"s{i}"}) + "\n")
        os.utime(path, (t0 + b, t0 + b))

    def run(out):
        curation_pipeline(spark, inp, out, budget_per_source=10_000,
                          min_frac=0.9, min_tokens=5,
                          minhash_bands=2, minhash_k=16)
        return {os.path.relpath(p, out):
                hashlib.md5(open(p, "rb").read()).hexdigest()
                for p in glob.glob(f"{out}/batch=*/shard-*.tar")}

    a = run(str(tmp_path / "wds_a"))
    b = run(str(tmp_path / "wds_b"))
    assert a and a == b


def test_curation_pipeline_survives_fully_filtered_batch(spark,
                                                         tmp_path):
    """A batch whose every doc fails the quality gate must produce no
    shards for that batch and leave later batches unaffected."""
    import glob
    import json

    from etl_excel_to_hyper_tableau_spark.streaming.ingest import (
        curation_pipeline,
    )

    inp = str(tmp_path / "land")
    out = str(tmp_path / "wds")
    os.makedirs(inp)
    good_a = ("one two three four five six seven eight nine ten eleven "
              "twelve thirteen fourteen fifteen sixteen")
    good_b = ("entirely different prose about compilers registers and "
              "intermediate representations with many plain words here")
    t0 = time.time() - 40
    batches = {0: [(1, "tiny"), (2, "too short")],          # all fail
               1: [(10, good_a), (11, good_b)]}
    for b, rows in batches.items():
        p = f"{inp}/b{b}.jsonl"
        with open(p, "w") as fh:
            for d, t in rows:
                fh.write(json.dumps({"doc_id": d,
                                     "text": f"H\n{t}\nF",
                                     "lang": "en", "source": "s"}) + "\n")
        os.utime(p, (t0 + b, t0 + b))
    stats = curation_pipeline(spark, inp, out, budget_per_source=10_000,
                              min_frac=0.9, min_tokens=5,
                              minhash_bands=2, minhash_k=16)
    assert stats["batches"] == 2 and stats["admitted"] == 2
    assert not glob.glob(f"{out}/batch=0/*")
    assert glob.glob(f"{out}/batch=1/shard-*.tar")


def test_crossdup_corpus_margins(spark):
    """Pins the construction margins behind the
    stream_pipeline_crossdup oracle against the REAL band tables
    (k=16, n=3, bands=2).  Both dedup paths key candidacy on a BAND
    collision (8 consecutive signature agreements): the batch-local
    election clusters band-mates, and the cross-batch probe only
    est-filters docs that already share a band.  So the margins that
    make the VALUES survivor oracle exact are (a) the collision set is
    EXACTLY the planted pairs, and (b) the planted pairs' estimated
    jaccard sits far above the 0.7 cross-batch threshold (16/16
    agreement = 1.0).  Raw est between non-colliding English sentences
    can run ~0.6 (minima land on shared common trigrams) — irrelevant
    without a collision, hence not asserted."""
    import itertools
    from collections import defaultdict

    import __spark_entry__ as entry
    from etl_excel_to_hyper_tableau_spark.operators.dedup import (
        minhash_band_table,
    )
    rows = [(d, t) for d, t in sorted(entry._CROSSDUP_DOCS.items())]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    bt = minhash_band_table(df, "text", "doc_id",
                            k=16, n=3, bands=2).collect()
    bucket: dict = defaultdict(set)
    sig = {}
    for r in bt:
        bucket[(r["band"], r["bh"])].add(r["id"])
        sig[r["id"]] = list(r["sig"])
    colliding = {tuple(sorted(p)) for s in bucket.values() if len(s) > 1
                 for p in itertools.combinations(s, 2)}
    assert colliding == {(0, 2), (1, 5)}

    def est(a, b):
        return (sum(1 for x, y in zip(sig[a], sig[b]) if x == y)
                / len(sig[a]))

    assert est(0, 2) == 1.0 and est(1, 5) == 1.0


def test_curation_pipeline_crossbatch_neardup(spark, tmp_path):
    """round 10 (verdict item 6): inside ONE composed availableNow
    run, the STAGED band index drops a planted cross-batch
    near-duplicate (doc 2 ~ batch-0's doc 0, one character off so the
    exact digest index cannot see it) while the batch-local election
    drops doc 5 ~ doc 1 — exactly the construction survivor set
    ships."""
    import glob

    import __spark_entry__ as entry
    from etl_excel_to_hyper_tableau_spark.sinks.webdataset import (
        read_webdataset,
    )
    from etl_excel_to_hyper_tableau_spark.streaming.ingest import (
        curation_pipeline,
    )
    landing = str(tmp_path / "land")
    out = str(tmp_path / "wds")
    entry._stage_crossdup_landing(landing)
    stats = curation_pipeline(spark, landing, out,
                              budget_per_source=10**9, min_frac=0.9,
                              min_quality=0.0, min_tokens=2,
                              max_tokens=10_000, max_dup_bigram=1.0,
                              n_shards=2, cross_batch_minhash=True)
    assert stats["batches"] == 4
    back = read_webdataset(spark, f"{out}/batch=*/shard-*.tar")
    keys = sorted({int(r["key"]) for r in back.collect()})
    assert keys == entry._CROSSDUP_SURVIVORS
    # the index holds exactly the dedup survivors' band rows
    idx = spark.read.parquet(out + "__bands")
    assert (sorted({r["id"] for r in idx.select("id").collect()})
            == entry._CROSSDUP_SURVIVORS)
    # doc 2 arrived in batch 2 and left no shard entry there
    b2 = read_webdataset(spark, f"{out}/batch=2/shard-*.tar") \
        if glob.glob(f"{out}/batch=2/shard-*.tar") else None
    if b2 is not None:
        assert 2 not in {int(r["key"]) for r in b2.collect()}
