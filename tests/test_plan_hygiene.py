"""Plan-hygiene sweep over EVERY inventory query: no accidental
cartesian products or nested-loop joins anywhere in the shipped plans —
the whole-inventory generalization of the per-operator plan assertions
(skew, sampling, groups-frames, as-of).

Streaming entries are excluded because constructing them executes the
stream (availableNow run); their plan properties are pinned by the
dedicated streaming tests instead.
"""

import contextlib
import io

import __spark_entry__ as entry

# intentional nested-loops: embedding_topk's / hard_negatives' exact
# scans are a crossJoin against the BROADCAST query set — the corpus
# never shuffles and only (queries × k) rows leave the scan
# (similarity.py docstrings); doc_lm_surprisal / bm25_search /
# negative_samples / embedding_quantize / tfidf_topk / mixture_weights
# cross-join a broadcast ONE-ROW aggregate (corpus totals / per-dim
# calibration stats / doc counts / Σ and Σ√ scalars)
NESTED_LOOP_OK = {"embedding_topk", "doc_lm_surprisal", "bm25_search",
                  "negative_samples", "hard_negatives",
                  "embedding_quantize", "tfidf_topk", "mixture_weights",
                  "ann_recall", "pq_topk", "key_skew"}


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_no_accidental_cartesian_or_nested_loop(spark, sf_dir):
    bad = []
    for name, fn in entry.queries().items():
        if name.startswith("stream_"):
            continue
        plan = _plan(fn(spark, sf_dir))
        if "CartesianProduct" in plan:
            bad.append((name, "CartesianProduct"))
        if "BroadcastNestedLoopJoin" in plan and name not in NESTED_LOOP_OK:
            bad.append((name, "BroadcastNestedLoopJoin"))
    assert bad == []
