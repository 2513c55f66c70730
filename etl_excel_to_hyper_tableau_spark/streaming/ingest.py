"""Continuous corpus curation: streaming document ingest with
per-micro-batch cleaning and deduplication against the growing corpus.

This is the production shape of a training-data pipeline once it goes
from one-shot to continuous: new document files land in a directory;
each micro-batch is quality-gated, deduplicated within itself, then
deduplicated *incrementally* against everything already accepted
(:func:`..operators.dedup.minhash_incremental_candidates` — cost
proportional to the batch, the corpus is never re-paired), and the
survivors append to the corpus.  ``foreachBatch`` is the right tool:
the dedup logic is a batch computation per micro-batch, and Structured
Streaming supplies exactly-once file tracking, checkpointed progress,
and restart recovery around it.

Idempotency note: ``foreachBatch`` bodies can re-run on failure
recovery; the appends here are therefore at-least-once.  A production
deployment writes each batch to ``{corpus}/batch_id={id}`` (as done
here) so a replayed batch overwrites its own partition instead of
duplicating rows.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import dedup as dd
from ..sinks.parquet import has_parquet_files
from ..operators import text as tx


def curated_ingest(spark: SparkSession, input_dir: str, corpus_dir: str,
                   schema: str = "doc_id long, text string",
                   min_quality: float = 0.0, min_tokens: int = 1,
                   max_tokens: int = 100_000,
                   minhash_k: int = 16, bands: int = 4,
                   threshold: float = 0.7,
                   max_files_per_trigger: int = 1,
                   source_format: str = "parquet") -> dict:
    """Run the curation stream over ``input_dir`` with ``availableNow``
    (process everything currently present, then stop — the same code
    path runs unbounded with a live trigger).  Returns
    ``{"batches", "accepted"}``.

    Per micro-batch: C4-style clean gate → exact self-dedup →
    MinHash-LSH dedup against the accepted corpus (smaller id is not
    meaningful across batches — the *corpus* side always wins, because
    it was accepted first) → append survivors under
    ``batch_id={epoch}`` for idempotent replay.

    The dedup index is **staged, not recomputed**: each accepted batch
    also appends its :func:`..operators.dedup.minhash_band_table` rows
    to ``{corpus}__bands``, and subsequent batches join against that
    index — per-batch cost never re-reads or re-hashes corpus text, so
    the stream's work stays proportional to the batch no matter how
    large the accepted corpus grows.
    """

    bands_dir = corpus_dir.rstrip("/") + "__bands"
    stats = {"batches": 0, "accepted": 0}

    def process(batch: DataFrame, epoch_id: int) -> None:
        batch = tx.clean_corpus(batch, "text", "doc_id",
                                min_quality=min_quality,
                                min_tokens=min_tokens,
                                max_tokens=max_tokens,
                                max_dup_bigram=1.0) \
            .select("doc_id", "text")
        batch = dd.exact_dedup(batch, ["text"], "doc_id")
        # persist the gated batch: three consumers below (band table,
        # corpus write, count) would otherwise each re-run the clean +
        # dedup lineage
        gated = dd.minhash_dedup(batch, "text", "doc_id", k=minhash_k,
                                 bands=bands, threshold=threshold).persist()
        batch = gated
        # the batch's band table is computed ONCE and reused for both
        # the incremental join and the staged-index append
        bt = dd.minhash_band_table(gated, "text", "doc_id",
                                   k=minhash_k, bands=bands).persist()
        # Existence-gated, not exception-gated: a broad except here
        # would treat corrupt index files / transient FS errors /
        # schema drift as "first batch" and silently skip cross-batch
        # dedup, accepting duplicates into the curated corpus.  Only a
        # genuinely absent index directory means "first batch"; any
        # read failure on an existing one must surface (same contract
        # as cdc.merge_upsert's target read).
        if has_parquet_files(bands_dir):
            staged = spark.read.parquet(bands_dir) \
                .select("id", "band", "bh", "sig")
        else:
            staged = None
        if staged is not None:
            dup = (dd.minhash_incremental_candidates(
                       None, None, "text", "doc_id",
                       k=minhash_k, bands=bands,
                       new_bands=bt, corpus_bands=staged)
                   .filter(F.col("est_jaccard") >= threshold)
                   .select(F.col("new_id").alias("doc_id")).distinct())
            batch = batch.join(dup, "doc_id", "left_anti")
        n = batch.count()
        if n:
            (batch.withColumn("batch_id", F.lit(int(epoch_id)))
             .write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy("batch_id").parquet(corpus_dir))
            # stage only the ACCEPTED docs' band rows
            accepted = batch.select(F.col("doc_id").alias("id"))
            (bt.join(accepted, "id", "left_semi")
             .withColumn("batch_id", F.lit(int(epoch_id)))
             .write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy("batch_id").parquet(bands_dir))
        bt.unpersist()
        gated.unpersist()
        stats["batches"] += 1
        stats["accepted"] += n

    name = "ingest_" + uuid.uuid4().hex[:8]
    reader = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", max_files_per_trigger))
    if source_format == "parquet":
        stream = reader.parquet(input_dir)
    elif source_format in ("json", "jsonl"):
        # landing corpora usually arrive as JSONL; the file stream
        # source parses line-delimited JSON natively
        stream = reader.json(input_dir)
    else:
        raise ValueError(f"unsupported source_format: {source_format!r}")
    # fresh checkpoint per invocation (re-invocations re-scan the
    # landing dir and rely on the dedup indexes for idempotency — a
    # persistent checkpoint would instead SKIP already-seen files,
    # a different incremental contract), removed on completion so
    # repeated runs don't accumulate ckpt_ing_* dirs in /tmp
    ckpt = tempfile.mkdtemp(prefix="ckpt_ing_")
    q = (stream
         .writeStream.foreachBatch(process).queryName(name)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True)
         .start())
    try:
        q.awaitTermination()
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    return stats


def vector_index_ingest(spark: SparkSession, input_dir: str, index_dir: str,
                        centroids: list[tuple[int, list[float]]],
                        schema: str = "vec_id long, embedding array<float>",
                        dedup_threshold: float | None = None,
                        max_files_per_trigger: int = 1) -> dict:
    """Continuous embedding-index maintenance — the vector analogue of
    :func:`curated_ingest`: new embedding files land in ``input_dir``;
    each micro-batch is assigned to IVF cells against FROZEN centroids
    (the production discipline — retraining the quantizer would
    invalidate every staged cell id, so centroids come from
    :func:`..operators.similarity.stage_ivf` or an offline training
    run), optionally near-dup-gated — first within the batch itself
    (cell-scoped self-pairs, smaller id survives: two near-duplicates
    arriving in the same micro-batch can't both slip in), then against
    the vectors already staged in the SAME cells — and appended to the
    partitioned index that :func:`..operators.similarity.ivf_topk_staged`
    probes.

    Scale shape: assignment is a map over literal centroids (no
    shuffle); the dedup join is cell-scoped (batch rows only meet
    staged rows sharing a cell — never the whole index); the append
    writes ``cell=…/batch_id=…`` partitions so a replayed micro-batch
    overwrites itself (same idempotency contract as
    :func:`curated_ingest`), and probes keep pruning by cell directory
    regardless of how many batches accreted.

    Returns ``{"batches", "accepted"}``.
    """

    from ..operators.dedup import _dot, _norm
    from ..operators.similarity import _nearest_cells

    stats = {"batches": 0, "accepted": 0}

    def process(batch: DataFrame, epoch_id: int) -> None:
        b = (batch.select(F.col("vec_id").alias("id"),
                          F.col("embedding").cast("array<double>")
                           .alias("vec"))
             .withColumn("__nrm__", _norm(F.col("vec")))
             .withColumn("cell",
                         _nearest_cells("vec", "__nrm__", centroids, 1)[0]))
        if dedup_threshold is not None:
            # within-batch gate first: two near-duplicates arriving in
            # the SAME micro-batch must not both be accepted (the
            # staged comparison below only sees earlier batches).
            # Cell-scoped self-pairs, smaller id wins — same election
            # as the cross-batch rule (first-accepted survives).
            lhs = b.select("cell", F.col("id").alias("__ida__"),
                           F.col("vec").alias("__va__"),
                           F.col("__nrm__").alias("__na__"))
            rhs = b.select("cell", F.col("id").alias("__idb__"),
                           F.col("vec").alias("__vb__"),
                           F.col("__nrm__").alias("__nb__"))
            intra = (lhs.join(rhs, "cell")
                     .where(F.col("__ida__") < F.col("__idb__"))
                     .where(_dot(F.col("__va__"), F.col("__vb__"))
                            / (F.col("__na__") * F.col("__nb__"))
                            >= F.lit(dedup_threshold))
                     .select(F.col("__idb__").alias("id")).distinct())
            b = b.join(intra, "id", "left_anti")
        if dedup_threshold is not None and has_parquet_files(index_dir):
            staged = (spark.read.parquet(index_dir)
                      .select("cell", F.col("vec").alias("sv"))
                      .withColumn("__snrm__", _norm(F.col("sv"))))
            dup = (b.join(staged, "cell")
                   .where(_dot(F.col("vec"), F.col("sv"))
                          / (F.col("__nrm__") * F.col("__snrm__"))
                          >= F.lit(dedup_threshold))
                   .select("id").distinct())
            b = b.join(dup, "id", "left_anti")
        b = b.drop("__nrm__")
        n = b.count()
        if n:
            (b.withColumn("batch_id", F.lit(int(epoch_id)))
             .write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy("cell", "batch_id").parquet(index_dir))
        stats["batches"] += 1
        stats["accepted"] += n

    name = "vecingest_" + uuid.uuid4().hex[:8]
    ckpt = tempfile.mkdtemp(prefix="ckpt_vec_")
    q = (spark.readStream.schema(schema)
         .option("maxFilesPerTrigger", max_files_per_trigger)
         .parquet(input_dir)
         .writeStream.foreachBatch(process).queryName(name)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True)
         .start())
    try:
        q.awaitTermination()
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    return stats


def sketch_ingest(spark: SparkSession, input_dir: str, sketch_dir: str,
                  key_col: str, schema: str,
                  depth: int = 3, width: int = 256,
                  max_files_per_trigger: int = 1,
                  checkpoint_dir: str | None = None) -> dict:
    """Continuous frequency tracking: fold every arriving micro-batch
    into a persistent count-min sketch (``..operators.sketches``) —
    heavy-hitter monitoring over an unbounded stream with FIXED state
    (d×w cells on disk), the sketch-native alternative to keeping exact
    per-key counts that grow with cardinality.

    Per batch: build the batch's sketch (map-only ×d + one partial-agg
    groupBy), merge cell-wise with the staged sketch, and atomically
    replace it (write to ``__tmp``, swap).  Replay safety: the last
    merged ``epoch_id`` is persisted WITH the sketch (a ``_merged_epoch``
    marker file written into the tmp directory before the swap, so
    sketch state and merge watermark move atomically together); a
    replayed batch whose epoch is already ``<=`` the staged watermark
    is skipped instead of re-merged — without this, a crash after the
    swap but before the streaming checkpoint commits the epoch would
    double-count the batch on recovery.  One stream (one checkpoint)
    per ``sketch_dir``: the watermark is a single monotone epoch
    counter, not a per-source set.  Estimates at any point come from
    :func:`..operators.sketches.count_min_estimate` over the staged
    table.  Returns ``{"batches", "rows"}``.
    """

    from ..operators.sketches import count_min_build

    stats = {"batches": 0, "rows": 0}
    marker = "_merged_epoch"  # leading '_': invisible to parquet listing

    def _staged_epoch() -> int | None:
        p = os.path.join(sketch_dir, marker)
        if os.path.isfile(p):
            with open(p) as fh:
                return int(fh.read().strip())
        return None

    def process(batch: DataFrame, epoch_id: int) -> None:
        staged_exists = has_parquet_files(sketch_dir)
        if staged_exists:
            last = _staged_epoch()
            if last is not None and int(epoch_id) <= last:
                # replayed, already-merged batch (post-swap crash
                # before the checkpoint commit): merging again would
                # double-count — skip.
                stats["batches"] += 1
                return
        sk = count_min_build(batch, key_col, depth=depth, width=width)
        if staged_exists:
            staged = spark.read.parquet(sketch_dir)
            sk = (staged.unionByName(sk)
                  .groupBy("depth", "bucket")
                  .agg(F.sum("cnt").alias("cnt")))
        tmp = sketch_dir.rstrip("/") + "__tmp"
        sk.write.mode("overwrite").parquet(tmp)
        with open(os.path.join(tmp, marker), "w") as fh:
            fh.write(str(int(epoch_id)))
        old = sketch_dir.rstrip("/") + "__old"
        shutil.rmtree(old, ignore_errors=True)
        if os.path.isdir(sketch_dir):
            os.rename(sketch_dir, old)
        os.rename(tmp, sketch_dir)
        shutil.rmtree(old, ignore_errors=True)
        stats["batches"] += 1
        stats["rows"] += batch.count()

    name = "cms_" + uuid.uuid4().hex[:8]
    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="ckpt_cms_")
    q = (spark.readStream.schema(schema)
         .option("maxFilesPerTrigger", max_files_per_trigger)
         .parquet(input_dir)
         .writeStream.foreachBatch(process).queryName(name)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True)
         .start())
    try:
        q.awaitTermination()
    finally:
        if checkpoint_dir is None:
            shutil.rmtree(ckpt, ignore_errors=True)
    return stats


def budget_gate_stream(spark: SparkSession, input_dir: str,
                       budget_per_source: int,
                       schema: str = ("doc_id long, text string, "
                                      "lang string, source string, "
                                      "n_chars long"),
                       max_files_per_trigger: int | None = None):
    """Streaming per-source token-budget gate: each source's cumulative
    token count lives in keyed state; a document is admitted iff the
    running total INCLUDING it stays within the budget (the same
    prefix-cumsum contract as :func:`..operators.sampling.budget_select`
    — this is literally its continuous form, and what makes the bounded
    single-batch run SQL-oracle-checkable as a windowed running sum).
    The counter SURVIVES across micro-batches, so a source that
    exhausted its budget yesterday stays closed today.

    Implemented on ``applyInPandasWithState``.  Spark 4's
    ``transformWithStateInPandas`` (typed ValueState, timers, TTL) is
    the designated successor, but its state-server protocol needs the
    ``protobuf`` Python package, which this container does not ship —
    the same environment-blocker class as ``tableauhyperapi`` (verified:
    the driver pre-init worker dies with ``ImportError: google.protobuf``
    before any user code runs).  The state contract here is one long per
    source either way, so the swap is mechanical when the dependency
    exists.

    Scale shape: state is ONE long per source (keys = sources, tiny);
    rows shuffle once on source to their state partition; within each
    (source, batch) group the admit loop is a pandas pass over that
    group only.  Cross-batch admission order = file arrival order —
    the streaming contract; within a batch, doc_id order
    (deterministic, which is what lets a single-batch run be
    SQL-oracle-checked against the batch running-sum formulation).

    Returns the lazy streaming DataFrame; pair with
    :func:`run_budget_gate_availablenow` for the bounded-source form.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..operators.text import token_count

    def gate(key, pdf_iter, state: GroupState):
        spent = state.get[0] if state.exists else 0
        pdf = pd.concat(list(pdf_iter), ignore_index=True)
        pdf = pdf.sort_values("doc_id")
        out_rows = []
        for r in pdf.itertuples(index=False):
            spent += int(r.n_tokens)  # prefix cumsum over ALL arrivals
            if spent <= budget_per_source:
                out_rows.append((int(r.doc_id), key[0],
                                 int(r.n_tokens), spent))
        state.update((spent,))
        yield pd.DataFrame(
            out_rows,
            columns=["doc_id", "source", "n_tokens", "spent_after"])

    reader = (spark.readStream.schema(schema))
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    # the file source streams a *directory*; accept a single-file path
    # by splitting it into (parent, glob) — same contract as the event
    # streams
    if input_dir.endswith(".parquet") and not os.path.isdir(input_dir):
        parent, _, fname = input_dir.rpartition("/")
        reader = reader.option("pathGlobFilter", fname)
        input_dir = parent
    stream = (reader.parquet(input_dir)
              .withColumn("n_tokens", token_count(F.col("text"))
                          .cast("long"))
              .select("doc_id", "source", "n_tokens"))
    return (stream.groupBy("source")
            .applyInPandasWithState(
                gate,
                outputStructType=("doc_id long, source string, "
                                  "n_tokens long, spent_after long"),
                stateStructType="spent long",
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


def run_budget_gate_availablenow(spark: SparkSession, input_dir: str,
                                 budget_per_source: int,
                                 max_files_per_trigger: int | None = None,
                                 ) -> DataFrame:
    """Execute :func:`budget_gate_stream` over the currently-available
    files (availableNow) and return the admitted rows."""

    name = "budget_" + uuid.uuid4().hex[:8]
    ckpt = tempfile.mkdtemp(prefix="ckpt_bg_")
    q = (budget_gate_stream(spark, input_dir, budget_per_source,
                            max_files_per_trigger=max_files_per_trigger)
         .writeStream.format("memory").queryName(name)
         .outputMode("append")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True)
         .start())
    try:
        q.awaitTermination()
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(name)


def hll_ingest(spark: SparkSession, input_dir: str, sketch_dir: str,
               key_col: str, schema: str, p: int = 8,
               max_files_per_trigger: int = 1,
               checkpoint_dir: str | None = None) -> dict:
    """Continuous distinct-count tracking: fold every arriving
    micro-batch's PORTABLE HyperLogLog registers
    (``..operators.sketches.hll_build``) into a staged sketch by
    per-register MAX — "distinct ids seen so far" over an unbounded
    stream with FIXED state (≤ 2^p register rows on disk), the
    streaming companion to :func:`sketch_ingest`'s count-min
    frequencies.

    Replay safety differs from CMS by construction: register merge is
    ``max`` — IDEMPOTENT — so re-merging a replayed batch after a
    post-swap crash is a no-op and no epoch watermark is needed (CMS
    cells are summed, which double-counts; hence sketch_ingest's
    ``_merged_epoch`` marker).  The swap is still atomic
    (write-to-tmp + rename) so readers never see a torn sketch.

    Estimates at any point: ``hll_estimate(spark.read.parquet(
    sketch_dir), p)``.  Returns ``{"batches", "rows"}``.
    """

    from ..operators.sketches import hll_build

    stats = {"batches": 0, "rows": 0}

    def process(batch: DataFrame, epoch_id: int) -> None:
        sk = hll_build(batch, key_col, p=p)
        if has_parquet_files(sketch_dir):
            staged = spark.read.parquet(sketch_dir)
            sk = (staged.unionByName(sk)
                  .groupBy("register")
                  .agg(F.max("max_rank").alias("max_rank")))
        tmp = sketch_dir.rstrip("/") + "__tmp"
        sk.write.mode("overwrite").parquet(tmp)
        old = sketch_dir.rstrip("/") + "__old"
        shutil.rmtree(old, ignore_errors=True)
        if os.path.isdir(sketch_dir):
            os.rename(sketch_dir, old)
        os.rename(tmp, sketch_dir)
        shutil.rmtree(old, ignore_errors=True)
        stats["batches"] += 1
        stats["rows"] += batch.count()

    name = "hll_" + uuid.uuid4().hex[:8]
    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="ckpt_hll_")
    reader = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", max_files_per_trigger))
    # file source streams a *directory*; accept a single-file path by
    # splitting into (parent, glob) — the budget_gate_stream contract
    if input_dir.endswith(".parquet") and not os.path.isdir(input_dir):
        parent, _, fname = input_dir.rpartition("/")
        reader = reader.option("pathGlobFilter", fname)
        input_dir = parent
    q = (reader.parquet(input_dir)
         .writeStream.foreachBatch(process).queryName(name)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True)
         .start())
    try:
        q.awaitTermination()
    finally:
        if checkpoint_dir is None:
            shutil.rmtree(ckpt, ignore_errors=True)
    return stats


def histogram_ingest(spark: SparkSession, input_dir: str, sketch_dir: str,
                     value_col: str, schema: str, bins: int,
                     lo: float, hi: float,
                     max_files_per_trigger: int = 1,
                     checkpoint_dir: str | None = None) -> dict:
    """Continuous quantile tracking: fold every arriving micro-batch's
    equi-width histogram cells (``..operators.sketches.
    histogram_sketch`` with PINNED bounds — the explicit-``lo/hi``
    shard-merge contract) into staged state by cell-wise SUM —
    "distribution so far" over an unbounded stream with FIXED state
    (≤ ``bins`` cell rows on disk).  Completes the streaming sketch
    family: CMS frequencies (:func:`sketch_ingest`), HLL distincts
    (:func:`hll_ingest`), and now quantiles.

    Bounds must be pinned up front (domain knowledge or a bounds job
    over a seed batch): cells from different grids don't merge.
    Out-of-range values clamp into the edge bins, so ``Σ cnt`` equals
    the number of non-null values seen — the ``n`` the quantile
    estimator needs, derived instead of stored.

    Replay safety: cells are SUMMED (like CMS, unlike HLL's max), so a
    replayed batch after a post-swap crash would double-count — the
    same ``_merged_epoch`` watermark as :func:`sketch_ingest` skips
    already-merged epochs.  The swap is atomic (write-tmp + rename).

    Estimates at any point: :func:`staged_histogram_quantiles`.
    Returns ``{"batches", "rows"}``.
    """

    from ..operators.sketches import histogram_sketch

    stats = {"batches": 0, "rows": 0}
    marker = "_merged_epoch"

    def _staged_epoch() -> int | None:
        p = os.path.join(sketch_dir, marker)
        if os.path.isfile(p):
            with open(p) as fh:
                return int(fh.read().strip())
        return None

    def process(batch: DataFrame, epoch_id: int) -> None:
        staged_exists = has_parquet_files(sketch_dir)
        if staged_exists:
            last = _staged_epoch()
            if last is not None and int(epoch_id) <= last:
                stats["batches"] += 1
                return
        sk = histogram_sketch(batch, value_col, bins=bins,
                              lo=lo, hi=hi).select("bin", "cnt",
                                                   "lo", "hi")
        if staged_exists:
            staged = spark.read.parquet(sketch_dir)
            sk = (staged.unionByName(sk)
                  .groupBy("bin", "lo", "hi")
                  .agg(F.sum("cnt").alias("cnt"))
                  .select("bin", "cnt", "lo", "hi"))
        tmp = sketch_dir.rstrip("/") + "__tmp"
        sk.write.mode("overwrite").parquet(tmp)
        with open(os.path.join(tmp, marker), "w") as fh:
            fh.write(str(int(epoch_id)))
        old = sketch_dir.rstrip("/") + "__old"
        shutil.rmtree(old, ignore_errors=True)
        if os.path.isdir(sketch_dir):
            os.rename(sketch_dir, old)
        os.rename(tmp, sketch_dir)
        shutil.rmtree(old, ignore_errors=True)
        stats["batches"] += 1
        stats["rows"] += batch.count()

    name = "hist_" + uuid.uuid4().hex[:8]
    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="ckpt_hist_")
    reader = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", max_files_per_trigger))
    if input_dir.endswith(".parquet") and not os.path.isdir(input_dir):
        parent, _, fname = input_dir.rpartition("/")
        reader = reader.option("pathGlobFilter", fname)
        input_dir = parent
    q = (reader.parquet(input_dir)
         .writeStream.foreachBatch(process).queryName(name)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True)
         .start())
    try:
        q.awaitTermination()
    finally:
        if checkpoint_dir is None:
            shutil.rmtree(ckpt, ignore_errors=True)
    return stats


def staged_histogram_quantiles(spark: SparkSession, sketch_dir: str,
                               bins: int,
                               qs: tuple[float, ...] = (0.5, 0.95, 0.99),
                               round_to: int = 6) -> DataFrame:
    """Quantile estimates from a :func:`histogram_ingest` staged sketch:
    re-attach ``n = Σ cnt`` (exact — clamping guarantees every
    non-null value landed in a cell) and run the standard
    :func:`..operators.sketches.histogram_quantiles` estimator."""
    from ..operators.sketches import histogram_quantiles

    sk = spark.read.parquet(sketch_dir)
    n = sk.agg(F.sum("cnt").cast("long").alias("n"))
    return histogram_quantiles(
        sk.crossJoin(F.broadcast(n)), bins, qs, round_to=round_to)


def media_dedup_ingest(spark: SparkSession, input_dir: str, index_dir: str,
                       kind: str = "image", max_hamming: int = 6,
                       max_files_per_trigger: int = 1,
                       checkpoint_dir: str | None = None) -> dict:
    """Continuous MEDIA curation — the multimodal analogue of
    :func:`vector_index_ingest`: media files (MEDIA_SCHEMA parquet)
    land in ``input_dir``; each micro-batch is perceptually
    fingerprinted (63-bit DCT pHash for images, Haitsma–Kalker
    fingerprint for audio — real stdlib codecs, Arrow batches,
    map-only), near-dup-gated FIRST within the batch itself (smaller
    id survives — two near-identical images arriving together can't
    both slip in), THEN against the signatures already staged, and
    accepted rows are appended with their signature so later batches
    never re-decode staged media.

    Scale shape: media bytes never shuffle (signatures are two longs a
    row); the staged comparison is a pigeonhole band equi-join between
    batch signatures and the staged signature column — a batch row
    meets only staged rows sharing a ``max_hamming + 1``-chunk band,
    never the whole index; the append writes ``batch_id=…`` partitions
    with dynamic overwrite, so a replayed micro-batch overwrites
    itself (the :func:`curated_ingest` idempotency contract).

    Returns ``{"batches", "accepted"}``.
    """

    from ..operators.multimodal import audio_fingerprint, image_phash

    fingerprint = image_phash if kind == "image" else audio_fingerprint
    sig_col = "phash" if kind == "image" else "afp"
    chunks = max_hamming + 1
    width = 63 // chunks

    def _bands(df: DataFrame, h: str) -> DataFrame:
        arms = ", ".join(
            f"struct({i} as chunk, "
            f"(shiftright({h}, {i * width}) & {(1 << width) - 1}) as ck)"
            for i in range(chunks))
        return df.selectExpr("*", f"inline(array({arms}))")

    stats = {"batches": 0, "accepted": 0}

    def process(batch: DataFrame, epoch_id: int) -> None:
        sig = (fingerprint(batch)
               .withColumnRenamed(sig_col, "sig")
               .filter(F.col("sig").isNotNull()))
        b = batch.join(sig, "media_id")
        # within-batch gate: smaller id survives any ≤ max_hamming pair
        lhs = b.select("sig", F.col("media_id").alias("__ida__"))
        rhs = b.select(F.col("sig").alias("__sb__"),
                       F.col("media_id").alias("__idb__"))
        ham = F.bit_count(F.col("sig").bitwiseXOR(F.col("__sb__")))
        intra = (_bands(lhs, "sig")
                 .join(_bands(rhs, "__sb__"), ["chunk", "ck"])
                 .where(F.col("__ida__") < F.col("__idb__"))
                 .where(ham <= max_hamming)
                 .select(F.col("__idb__").alias("media_id")).distinct())
        b = b.join(intra, "media_id", "left_anti")
        # cross-batch gate: band join against the staged signatures
        if has_parquet_files(index_dir):
            staged = (spark.read.parquet(index_dir)
                      .select(F.col("sig").alias("__sb__")).distinct())
            dup = (_bands(b.select("media_id", "sig"), "sig")
                   .join(_bands(staged, "__sb__"), ["chunk", "ck"])
                   .where(ham <= max_hamming)
                   .select("media_id").distinct())
            b = b.join(dup, "media_id", "left_anti")
        n = b.count()
        if n:
            (b.withColumn("batch_id", F.lit(int(epoch_id)))
             .write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy("batch_id").parquet(index_dir))
        stats["batches"] += 1
        stats["accepted"] += n

    schema = ("media_id long, kind string, content binary, "
              "meta struct<format:string,width:int,height:int,"
              "sample_rate:int,n_frames:int>")
    name = "mediaingest_" + uuid.uuid4().hex[:8]
    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="ckpt_media_")
    q = (spark.readStream.schema(schema)
         .option("maxFilesPerTrigger", max_files_per_trigger)
         .parquet(input_dir)
         .writeStream.foreachBatch(process).queryName(name)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True)
         .start())
    try:
        q.awaitTermination()
    finally:
        if checkpoint_dir is None:
            shutil.rmtree(ckpt, ignore_errors=True)
    return stats


def media_curation_pipeline(spark: SparkSession, input_dir: str,
                            out_dir: str, kind: str = "image",
                            max_hamming: int = 6, n_shards: int = 2,
                            max_files_per_trigger: int = 1) -> dict:
    """The COMPOSED multimodal curation pipeline, as ONE
    ``availableNow`` streaming query — the media sibling of
    :func:`curation_pipeline` (round-10 verdict item #6): MEDIA_SCHEMA
    parquet lands in ``input_dir``; each micro-batch is REALLY decoded
    and perceptually fingerprinted (63-bit DCT pHash for images,
    Haitsma–Kalker fingerprint for audio — stdlib codecs in Arrow
    batches, map-only), near-dup-gated within the batch (smaller
    media_id survives), then against the accumulated STAGED signature
    index (pigeonhole band join — a batch row meets only staged rows
    sharing a band, never the whole index), and the admitted samples
    ship as WebDataset shards under ``{out}/batch={epoch}`` with their
    original bytes plus a sidecar JSON (media_id, kind, signature).

    Ordering contract inside a batch (the refreshByPath eviction trap,
    round 10): the admitted set is persisted, the SHARD write runs
    first, and the signature-index append runs LAST — appending to the
    index path un-caches every plan that reads it, and any later
    action re-executing the gate lineage would then see the batch's
    OWN signatures and annihilate it.  The batch_id-partitioned
    dynamic-overwrite append keeps replays idempotent (same landing →
    byte-identical shards and index; pinned by the round-11 replay
    property test).

    Scale shape: media BYTES shuffle only into the shard route (one
    hash exchange, the write_webdataset contract); every dedup
    decision travels as (media_id, sig) longs.  ``out_dir`` and the
    index are cleared at start — the pipeline owns its output.

    Returns ``{"batches", "accepted"}``.
    """

    from ..operators.multimodal import audio_fingerprint, image_phash
    from ..sinks.webdataset import write_webdataset

    fingerprint = image_phash if kind == "image" else audio_fingerprint
    sig_col = "phash" if kind == "image" else "afp"
    chunks = max_hamming + 1
    width = 63 // chunks
    index_dir = out_dir.rstrip("/") + "__sigs"
    ckpt = out_dir.rstrip("/") + "__ckpt"
    for d in (out_dir, index_dir, ckpt):
        shutil.rmtree(d, ignore_errors=True)

    def _bands(df: DataFrame, h: str) -> DataFrame:
        arms = ", ".join(
            f"struct({i} as chunk, "
            f"(shiftright({h}, {i * width}) & {(1 << width) - 1}) as ck)"
            for i in range(chunks))
        return df.selectExpr("*", f"inline(array({arms}))")

    stats = {"batches": 0, "accepted": 0}

    def process(batch: DataFrame, epoch_id: int) -> None:
        sig = (fingerprint(batch)
               .withColumnRenamed(sig_col, "sig")
               .filter(F.col("sig").isNotNull()))
        b = batch.join(sig, "media_id")
        lhs = b.select("sig", F.col("media_id").alias("__ida__"))
        rhs = b.select(F.col("sig").alias("__sb__"),
                       F.col("media_id").alias("__idb__"))
        ham = F.bit_count(F.col("sig").bitwiseXOR(F.col("__sb__")))
        intra = (_bands(lhs, "sig")
                 .join(_bands(rhs, "__sb__"), ["chunk", "ck"])
                 .where(F.col("__ida__") < F.col("__idb__"))
                 .where(ham <= max_hamming)
                 .select(F.col("__idb__").alias("media_id")).distinct())
        b = b.join(intra, "media_id", "left_anti")
        if has_parquet_files(index_dir):
            staged = (spark.read.parquet(index_dir)
                      .select(F.col("sig").alias("__sb__")).distinct())
            dup = (_bands(b.select("media_id", "sig"), "sig")
                   .join(_bands(staged, "__sb__"), ["chunk", "ck"])
                   .where(ham <= max_hamming)
                   .select("media_id").distinct())
            b = b.join(dup, "media_id", "left_anti")
        b = b.persist()
        n = b.count()
        if n:
            meta_json = F.concat(
                F.lit('{"media_id": '), F.col("media_id").cast("string"),
                F.lit(', "kind": "'), F.col("kind"),
                F.lit('", "sig": '), F.col("sig").cast("string"),
                F.lit("}"))
            write_webdataset(
                b.withColumn("__meta__", meta_json),
                f"{out_dir}/batch={int(epoch_id)}", "media_id",
                {"bin": "content", "json": "__meta__"},
                n_shards=n_shards)
            # index append LAST — see the ordering contract above
            (b.select("media_id", "sig")
             .withColumn("batch_id", F.lit(int(epoch_id)))
             .write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy("batch_id").parquet(index_dir))
        b.unpersist()
        stats["batches"] += 1
        stats["accepted"] += n

    schema = ("media_id long, kind string, content binary, "
              "meta struct<format:string,width:int,height:int,"
              "sample_rate:int,n_frames:int>")
    name = "mediapipe_" + uuid.uuid4().hex[:8]
    q = (spark.readStream.schema(schema)
         .option("maxFilesPerTrigger", max_files_per_trigger)
         .parquet(input_dir)
         .writeStream.foreachBatch(process).queryName(name)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True)
         .start())
    try:
        q.awaitTermination()
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    return stats


def curation_pipeline(spark: SparkSession, input_dir: str, out_dir: str,
                      budget_per_source: int,
                      schema: str = ("doc_id long, text string, "
                                     "lang string, source string"),
                      min_frac: float = 0.5, delimiter: str = "\n",
                      minhash_k: int = 16, minhash_n: int = 3,
                      minhash_bands: int = 2,
                      min_quality: float = 0.4, min_tokens: int = 20,
                      max_tokens: int = 2000, max_dup_bigram: float = 0.2,
                      n_shards: int = 4,
                      max_files_per_trigger: int = 1,
                      cross_batch_minhash: bool = True,
                      cross_batch_threshold: float = 0.7) -> dict:
    """The END-TO-END curation pipeline a training-data run actually
    executes, as ONE ``availableNow`` streaming query: JSONL landing
    files → per-batch boilerplate strip → exact dedup (within batch +
    against the accumulated digest index) → MinHash-LSH dedup (within
    batch, linear election; with ``cross_batch_minhash`` also against
    the accumulated STAGED band index — the :func:`curated_ingest`
    recipe, so a near-duplicate of content seen in ANY earlier batch is
    dropped too) → C4/Gopher quality gate → per-source token-budget
    gate (state survives across micro-batches) → WebDataset shards
    under ``{out}/batch={epoch}``.  The units are individually verified
    elsewhere (boilerplate_lines, dedup_exact, minhash_dedup,
    minhash_incremental_candidates, corpus_clean, stream_budget_gate,
    the loader sinks); this is the COMPOSITION, which is what catches
    interface mismatches units cannot.

    Cross-batch near-dup contract: the band index accumulates every
    DEDUP-STAGE survivor (batch-local election + cross-batch anti-join
    winners), not only budget-admitted docs — a near-duplicate of SEEN
    content is redundant even when the original later failed quality or
    budget (dedup measures redundancy, not admission;
    :func:`curated_ingest`'s index-of-accepted is the admission-keyed
    alternative).  A candidate is dropped iff its estimated signature
    jaccard against any indexed doc reaches ``cross_batch_threshold``.

    Determinism contract (what makes the run SQL-oracle-checkable):
    batches process in landing-file mtime order; within a batch,
    admission order is doc_id; the cross-batch exact-dedup index means
    "first (batch, doc_id) with a digest wins" — globally a
    row_number() over (digest ORDER BY batch, doc_id); the budget is
    the prefix cumsum over ALL quality survivors in (batch, doc_id)
    order per source (rejected docs still consume —
    :func:`budget_gate_stream`'s contract), admitted iff the running
    total INCLUDING the doc stays within budget.

    State: the digest index is STAGED parquet (``{out}__digests``,
    batch-partitioned, dynamic overwrite — the :func:`curated_ingest`
    idempotency recipe); the budget counters are a driver dict rebuilt
    per run (this function owns one bounded availableNow run; the
    unbounded deployment swaps in :func:`budget_gate_stream`'s keyed
    state, same contract).  ``out_dir`` and the index are cleared at
    start — the pipeline owns its output.

    Returns ``{"batches", "admitted"}``.
    """

    from pyspark.sql import Window

    from ..operators.dedup import (
        exact_dedup, minhash_band_table, minhash_dedup,
        minhash_incremental_candidates,
    )
    from ..operators.text import clean_corpus, remove_boilerplate_lines
    from ..sinks.webdataset import write_webdataset

    digest_dir = out_dir.rstrip("/") + "__digests"
    bands_dir = out_dir.rstrip("/") + "__bands"
    ckpt_dir = out_dir.rstrip("/") + "__ckpt"
    for d in (out_dir, digest_dir, bands_dir, ckpt_dir):
        shutil.rmtree(d, ignore_errors=True)
    spent: dict[str, int] = {}
    stats = {"batches": 0, "admitted": 0}

    def process(batch: DataFrame, epoch_id: int) -> None:
        # 1. boilerplate strip — batch-local corpus-frequency census
        bp = remove_boilerplate_lines(batch, "text", "doc_id",
                                      min_frac=min_frac,
                                      delimiter=delimiter)
        docs = (bp.select(F.col("id").alias("doc_id"), "clean_text")
                .join(batch.select("doc_id", "source"), "doc_id"))
        # 2a. exact dedup within the batch (smallest doc_id wins)
        docs = exact_dedup(docs, ["clean_text"], "doc_id")
        # 2b. exact dedup against every earlier batch's survivors.
        # The index APPEND happens at the END of the batch: writing a
        # path UNCACHES every plan that reads it (refreshByPath), so an
        # early append would evict this persisted anti-join and any
        # later stage re-executing the lineage would re-read an index
        # that now contains the batch's OWN digests — annihilating the
        # batch (found by the composed-pipeline oracle in round 9; the
        # unit tests could not see it).
        docs = docs.withColumn("__dg__", F.md5("clean_text"))
        if has_parquet_files(digest_dir):
            seen = spark.read.parquet(digest_dir).select("dg")
            docs = docs.join(seen, docs["__dg__"] == seen["dg"],
                             "left_anti")
        docs = docs.persist()
        n2 = docs.count()
        # 3. MinHash-LSH dedup within the batch — the linear election
        # (threshold=None): no pairwise join, O(m·bands) per cluster
        s3 = minhash_dedup(docs.drop("__dg__"), "clean_text", "doc_id",
                           k=minhash_k, n=minhash_n,
                           bands=minhash_bands, threshold=None)
        # 3b. cross-batch near-dup: the batch's band table joins the
        # STAGED index of every earlier batch's dedup survivors (the
        # curated_ingest recipe — per-batch cost never re-reads or
        # re-hashes earlier text); est_jaccard >= threshold drops the
        # newcomer.  bt is persisted: it serves both the probe and the
        # end-of-batch index append (which, like the digest append,
        # runs LAST — see the stage-2b note).
        bt = bt_p = None
        if cross_batch_minhash:
            bt = bt_p = minhash_band_table(s3, "clean_text", "doc_id",
                                           k=minhash_k, n=minhash_n,
                                           bands=minhash_bands).persist()
            if has_parquet_files(bands_dir):
                dup = (minhash_incremental_candidates(
                           None, None, "clean_text", "doc_id",
                           k=minhash_k, n=minhash_n, bands=minhash_bands,
                           new_bands=bt,
                           corpus_bands=spark.read.parquet(bands_dir)
                           .select("id", "band", "bh", "sig"))
                       .filter(F.col("est_jaccard")
                               >= cross_batch_threshold)
                       .select(F.col("new_id").alias("doc_id"))
                       .distinct())
                s3 = s3.join(dup, "doc_id", "left_anti")
                # the append rows are MATERIALIZED here, before any
                # index write: bt's lineage reads BOTH index paths
                # (digest_dir via docs, bands_dir via dup), so either
                # append's refreshByPath would evict a lazy plan and
                # the recompute would anti-join the batch against its
                # OWN just-written digests — writing an empty band
                # partition (the round-9 annihilation bug's shape,
                # found again by the crossdup composition test)
                bt = (bt.join(dup.withColumnRenamed("doc_id", "id"),
                              "id", "left_anti").persist())
                bt.count()
        # 4. quality gate (adds n_tokens, quality, dup_bigram_frac)
        s4 = clean_corpus(s3, "clean_text", "doc_id",
                          min_quality=min_quality, min_tokens=min_tokens,
                          max_tokens=max_tokens,
                          max_dup_bigram=max_dup_bigram).persist()
        # 5. budget gate: prefix cumsum per source in doc_id order,
        # offset by the tokens already consumed in earlier batches
        w = (Window.partitionBy("source").orderBy("doc_id")
             .rowsBetween(Window.unboundedPreceding, 0))
        cum = s4.withColumn("__cum__", F.sum("n_tokens").over(w))
        if spent:
            pairs: list = []
            for k in sorted(spent):
                pairs += [F.lit(k), F.lit(spent[k])]
            prev = F.coalesce(F.create_map(*pairs)[F.col("source")],
                              F.lit(0))
        else:
            prev = F.lit(0)
        admitted = (cum.withColumn("spent_after",
                                   (prev + F.col("__cum__")).cast("long"))
                    .filter(F.col("spent_after")
                            <= F.lit(int(budget_per_source))))
        # state update counts ALL survivors' tokens, admitted or not
        for r in (s4.groupBy("source")
                  .agg(F.sum("n_tokens").alias("t")).collect()):
            spent[r["source"]] = spent.get(r["source"], 0) + int(r["t"])
        # 6. WebDataset shards, one subdir per batch (replay-idempotent)
        n = admitted.count()
        if n:
            write_webdataset(admitted, f"{out_dir}/batch={int(epoch_id)}",
                             "doc_id",
                             {"txt": "clean_text", "src": "source"},
                             n_shards=n_shards)
        # digest-index append LAST (see the stage-2b note): every
        # consumer of `docs` has run, so the write's cache invalidation
        # can no longer change this batch's results; the write itself
        # still reads the intact cache
        if n2:
            # band-index append (dedup survivors only) runs FIRST of
            # the two index writes and from bt's own materialized
            # cache: writing bands_dir uncaches every reader of that
            # path (s4's lineage included — all its consumers have
            # run), and writing digest_dir would evict bt's cache
            # (lineage reads digest_dir via docs), so bands must land
            # before digests
            if bt is not None:
                (bt.withColumn("batch_id", F.lit(int(epoch_id)))
                 .write.mode("overwrite")
                 .option("partitionOverwriteMode", "dynamic")
                 .partitionBy("batch_id").parquet(bands_dir))
            (docs.select(F.col("__dg__").alias("dg"))
             .withColumn("batch_id", F.lit(int(epoch_id)))
             .write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy("batch_id").parquet(digest_dir))
        if bt is not None and bt is not bt_p:
            bt.unpersist()
        if bt_p is not None:
            bt_p.unpersist()
        s4.unpersist()
        docs.unpersist()
        stats["batches"] += 1
        stats["admitted"] += n

    # checkpoint lives NEXT TO the output the pipeline already owns and
    # clears (``{out}__ckpt``), not a leaked tempfile.mkdtemp — the e2e
    # bench entry re-runs this per cold/warm pass and a fresh /tmp dir
    # per run accumulates forever; a bounded availableNow run has no
    # resume story anyway, so the checkpoint is removed on completion.
    name = "pipe_" + uuid.uuid4().hex[:8]
    q = (spark.readStream.schema(schema)
         .option("maxFilesPerTrigger", max_files_per_trigger)
         .json(input_dir)
         .writeStream.foreachBatch(process).queryName(name)
         .option("checkpointLocation", ckpt_dir)
         .trigger(availableNow=True)
         .start())
    try:
        q.awaitTermination()
    finally:
        shutil.rmtree(ckpt_dir, ignore_errors=True)
    return stats
