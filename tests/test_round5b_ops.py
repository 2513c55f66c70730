"""Round-5b operators: sliding-window exact-substring dedup, the
Naive-Bayes quality classifier, bit-replayable distributed k-means,
and cross-video frame-level pHash dedup."""

from __future__ import annotations

import itertools
import math

import numpy as np
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# dup_span_removal
# ---------------------------------------------------------------------------

def _mk(words):
    return " ".join(words)


def test_dup_span_basic_excision(spark):
    """A 10-token passage repeated in a later doc (at a SHIFTED offset —
    the case segment_dedup's fixed chunks miss) is removed from the
    later doc only."""
    from etl_excel_to_hyper_tableau_spark.operators.dedup import (
        dup_span_removal,
    )
    passage = [f"p{i}" for i in range(10)]
    a = _mk([f"a{i}" for i in range(5)] + passage + [f"z{i}" for i in range(5)])
    b = _mk([f"b{i}" for i in range(3)] + passage + [f"y{i}" for i in range(4)])
    df = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           dup_span_removal(df, "text", "doc_id").collect()}
    assert got[1]["n_removed"] == 0
    assert got[1]["cleaned_text"] == a
    assert got[2]["n_removed"] == 10
    assert got[2]["cleaned_text"] == _mk(
        [f"b{i}" for i in range(3)] + [f"y{i}" for i in range(4)])


def test_dup_span_short_and_full_dup(spark):
    from etl_excel_to_hyper_tableau_spark.operators.dedup import (
        dup_span_removal,
    )
    text = _mk([f"w{i}" for i in range(12)])
    short = "tiny doc"
    df = spark.createDataFrame(
        [(1, text), (2, text), (3, short)], "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           dup_span_removal(df, "text", "doc_id").collect()}
    # first occurrence intact; exact-duplicate doc fully excised
    assert got[1]["cleaned_text"] == text and got[1]["n_removed"] == 0
    assert got[2]["cleaned_text"] == "" and got[2]["n_removed"] == 12
    # sub-span doc passes through untouched
    assert got[3]["cleaned_text"] == short and got[3]["n_removed"] == 0
    assert got[3]["n_tokens"] == 2


def test_dup_span_intra_document_repeat(spark):
    """The same window twice WITHIN one document: the earlier start
    wins, the later occurrence is excised."""
    from etl_excel_to_hyper_tableau_spark.operators.dedup import (
        dup_span_removal,
    )
    passage = [f"p{i}" for i in range(10)]
    text = _mk(passage + ["mid"] + passage)
    df = spark.createDataFrame([(7, text)], "doc_id long, text string")
    row = dup_span_removal(df, "text", "doc_id").collect()[0]
    assert row["n_tokens"] == 21
    assert row["n_removed"] == 10
    assert row["cleaned_text"] == _mk(passage + ["mid"])


# ---------------------------------------------------------------------------
# Naive-Bayes quality classifier
# ---------------------------------------------------------------------------

def _nb_reference(rows):
    """Pure-Python replication of the integer micro-nat NB contract."""
    from collections import Counter
    c1, c0 = Counter(), Counter()
    n1 = n0 = 0
    for _i, text, y in rows:
        toks = text.split()
        if y:
            n1 += 1
            c1.update(toks)
        else:
            n0 += 1
            c0.update(toks)
    vocab = set(c1) | set(c0)
    t1, t0, v = sum(c1.values()), sum(c0.values()), len(vocab)
    w = {t: round((math.log((c1[t] + 1) / (t1 + v))
                   - math.log((c0[t] + 1) / (t0 + v))) * 1e6)
         for t in vocab}
    prior = round((math.log(n1) - math.log(n0)) * 1e6)
    out = {}
    for i, text, y in rows:
        toks = text.split()
        score = prior + sum(w[t] for t in toks)
        out[i] = (y, len(toks), score, int(score > 0))
    return out


def test_nb_quality_score_matches_reference(spark):
    from etl_excel_to_hyper_tableau_spark.operators.classify import (
        nb_quality_score,
    )
    rows = [
        (1, "clean prose with verbs and structure", 1),
        (2, "more clean prose with citations", 1),
        (3, "buy buy buy click here spam spam", 0),
        (4, "spam click buy now now now", 0),
        (5, "prose with some spam words click", 0),
        (6, "clean structure and citations with verbs", 1),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, label int")
    got = {r["doc_id"]: (r["label"], r["n_tokens"], r["score"], r["pred"])
           for r in nb_quality_score(df, "text", "doc_id", "label").collect()}
    assert got == _nb_reference(rows)


def test_nb_empty_doc_gets_prior_only(spark):
    from etl_excel_to_hyper_tableau_spark.operators.classify import (
        nb_quality_score,
    )
    rows = [(1, "alpha beta", 1), (2, "gamma delta", 0), (3, "   ", 0)]
    df = spark.createDataFrame(rows, "doc_id long, text string, label int")
    got = {r["doc_id"]: r for r in
           nb_quality_score(df, "text", "doc_id", "label").collect()}
    # prior = ln(1) - ln(2) in micro-nats
    assert got[3]["n_tokens"] == 0
    assert got[3]["score"] == round((math.log(1) - math.log(2)) * 1e6)


# ---------------------------------------------------------------------------
# kmeans_clusters
# ---------------------------------------------------------------------------

def _kmeans_reference(vecs, k, iters):
    """Numpy replication of the quantized Lloyd's contract."""
    prod = np.asarray(vecs, dtype=np.float64) * 1e6
    # HALF_UP (away from zero) — the engine/oracle rounding contract;
    # np.round would be banker's
    xq = np.where(prod >= 0, np.floor(prod + 0.5),
                  np.ceil(prod - 0.5)).astype(np.int64)
    cents = {c: (xq[c].tolist(), 1) for c in range(k)}  # ids 0..k-1 seed

    def assign():
        out = []
        for row in xq:
            best = None
            for cid, (s, n) in sorted(cents.items()):
                mu = [si / n for si in s]
                d = 0.0
                for a, m in zip(row, mu):
                    t = float(a) - m
                    d += t * t
                if best is None or (d, cid) < best[:2]:
                    best = (d, cid)
            out.append(best)
        return out

    a = []
    for _ in range(iters):
        a = assign()
        sums = {}
        for (d, cid), row in zip(a, xq):
            s, n = sums.setdefault(cid, ([0] * xq.shape[1], 0))
            for j, vv in enumerate(row):
                s[j] += int(vv)
            sums[cid] = (s, n + 1)
        cents = {cid: sums.get(cid, prev) for cid, prev in cents.items()}
    # stats from the LAST E-step's assignment (scikit-learn labels_/
    # inertia_ semantics — round 6 fused the reporting pass into the
    # final update pass; no re-assignment against updated centroids)
    agg = {}
    for d, cid in a:
        n, inert = agg.get(cid, (0, 0))
        agg[cid] = (n + 1, inert + int(np.floor(d)))
    return agg


def test_kmeans_matches_reference(spark):
    from etl_excel_to_hyper_tableau_spark.operators.clustering import (
        kmeans_clusters,
    )
    rng = np.random.default_rng(42)
    blob_a = rng.normal(0.3, 0.02, size=(20, 6))
    blob_b = rng.normal(-0.3, 0.02, size=(20, 6))
    vecs = np.vstack([blob_a, blob_b]).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))],
        "vid long, vec array<float>")
    got = {r["cluster_id"]: (r["n_members"], r["inertia"])
           for r in kmeans_clusters(df, "vec", "vid", k=2, iters=2).collect()}
    want = _kmeans_reference(vecs, k=2, iters=2)
    assert got == want
    # the two seeds both sit in blob_a (ids 0,1) — Lloyd's must still
    # separate the blobs by the second assignment
    assert sorted(got[c][0] for c in got) == [20, 20]


def test_kmeans_empty_cluster_keeps_previous_centroid(spark):
    from etl_excel_to_hyper_tableau_spark.operators.clustering import (
        kmeans_clusters,
    )
    # all points identical → every point lands in cluster 0; cluster 1
    # keeps its (identical) seed forever; only cluster 0 is emitted
    df = spark.createDataFrame([(i, [0.5, 0.5]) for i in range(6)],
                               "vid long, vec array<double>")
    rows = kmeans_clusters(df, "vec", "vid", k=2, iters=2).collect()
    assert [(r["cluster_id"], r["n_members"], r["inertia"])
            for r in rows] == [(0, 6, 0)]


# ---------------------------------------------------------------------------
# video frame dedup
# ---------------------------------------------------------------------------

def test_class_avi_margin():
    """The construction-oracle soundness bound: over the 40-class ×
    6-sampled-frame seed family the 240 frame pHashes are all distinct
    and every cross pair sits ≥ 16 bits apart — a wide margin over the
    entry's max_hamming=6 gate (the make_class_png_media doctrine)."""
    from etl_excel_to_hyper_tableau_spark.functions.avi import (
        decode_avi_mjpeg, encode_avi_mjpeg,
    )
    from etl_excel_to_hyper_tableau_spark.operators.multimodal import phash63
    hashes = []
    for k in range(40):
        frames = np.stack([
            np.random.default_rng(9000 + k * 1024 + f).integers(
                0, 256, size=(24, 32), dtype=np.uint8)
            for f in range(12)])
        dec, _ = decode_avi_mjpeg(encode_avi_mjpeg(frames, quality=90))
        hashes.extend(phash63(dec[f]) for f in range(0, 12, 2))
    assert len(set(hashes)) == 240
    mind = min(bin(a ^ b).count("1")
               for a, b in itertools.combinations(hashes, 2))
    assert mind >= 16


def test_video_dup_pairs_same_class_only(spark):
    from etl_excel_to_hyper_tableau_spark.operators.multimodal import (
        make_class_avi_media, video_dup_pairs,
    )
    ids = spark.createDataFrame([(i,) for i in range(12)], "doc_id long")
    media = make_class_avi_media(ids, "doc_id", n_classes=4)
    got = {(r["id_a"], r["id_b"]): (r["n_shared_frames"], r["min_hamming"])
           for r in video_dup_pairs(media, every_n=2, max_hamming=6)
           .collect()}
    want_pairs = {(a, b) for a in range(12) for b in range(12)
                  if a < b and a % 4 == b % 4}
    assert set(got) == want_pairs
    assert all(v == (6, 0) for v in got.values())


def test_video_dedup_linear_form(spark):
    """The linear-output election: per class the smallest id is the
    keeper (dup_of NULL), every other video is a full duplicate of
    it."""
    from etl_excel_to_hyper_tableau_spark.operators.multimodal import (
        make_class_avi_media, video_dedup,
    )
    ids = spark.createDataFrame([(i,) for i in range(12)], "doc_id long")
    media = make_class_avi_media(ids, "doc_id", n_classes=4)
    got = {r["media_id"]: (r["n_sampled"], r["n_dup_frames"], r["dup_of"])
           for r in video_dedup(media, every_n=2).collect()}
    for i in range(12):
        want = (6, 0, None) if i < 4 else (6, 6, i % 4)
        assert got[i] == want, (i, got[i])
