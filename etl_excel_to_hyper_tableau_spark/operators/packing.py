"""Sequence packing: lay a corpus of tokenized documents end-to-end and
cut it into fixed-size context windows — the batch-construction step of
every LLM pre-training pipeline (documents are concatenated in a
deterministic order and split every ``window_tokens`` tokens; a document
may span several windows).

The core primitive is a DISTRIBUTED prefix sum.  The naive formulation
— ``sum(n) OVER (ORDER BY id)`` with no PARTITION BY — collapses to a
single partition in Spark and is the canonical 100 TB scale-killer.
Instead this uses the classic two-phase scan:

1. range-repartition + sort within partitions by the order key,
2. per-partition token totals (one tiny aggregate — #partitions rows),
3. exclusive partition offsets via a driver-side running sum over that
   metadata-sized list (same size class as parquet footer stats; this
   is NOT a data collect),
4. map-side: window id = (partition offset + within-partition running
   sum) — the within-partition window is partitioned by
   ``spark_partition_id`` so no executor ever sees more than one
   partition's rows.

Equivalent to the single-ordered-window plan row-for-row, but every
stage is bounded by partition size, not corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .text import tokens
from ..functions.hashing import md5_int64


def pack_sequences(df: DataFrame, text_col: str, id_col: str,
                   window_tokens: int = 256,
                   num_partitions: int | None = None) -> DataFrame:
    """Assign every document its span of fixed-size context windows.

    Documents are ordered by ``id_col``, their whitespace-token counts
    laid end-to-end, and the stream cut every ``window_tokens`` tokens.
    For each document: the global offset of its first token, the first
    and last window it lands in, and its offset within the first
    window.  Zero-token documents carry their boundary position with an
    empty span (``start_window = end_window = window of the boundary``).

    Output: ``id, n_tokens, start_offset, start_window, offset_in_window,
    end_window, n_windows``.
    """
    sized = df.select(F.col(id_col).alias("id"),
                      F.size(tokens(F.col(text_col))).cast("long")
                       .alias("n_tokens"))
    if num_partitions:
        sized = sized.repartitionByRange(num_partitions, "id")
    else:
        sized = sized.repartitionByRange("id")
    # localCheckpoint (eager) pins the partition layout so the totals
    # job and the downstream scan see identical contents (range
    # boundaries are sampled, so an unpinned recompute could move
    # rows); lineage is truncated and the blocks are reclaimed by the
    # ContextCleaner when the DataFrame is garbage-collected — no
    # explicit unpersist obligation leaks to the caller.
    sized = (sized.sortWithinPartitions("id")
             .withColumn("__pid__", F.spark_partition_id())
             .localCheckpoint(eager=True))
    # phase 2+3: per-partition totals — #partitions rows, metadata-sized
    part_totals = (sized.groupBy("__pid__")
                   .agg(F.sum("n_tokens").alias("t"))
                   .orderBy("__pid__")
                   .collect())
    offsets, acc = {}, 0
    for r in part_totals:
        offsets[r["__pid__"]] = acc
        acc += r["t"] or 0
    # phase 4: partition offset + within-partition inclusive scan
    if offsets:
        off = F.create_map(
            *[F.lit(x) for kv in offsets.items() for x in kv]
        )[F.col("__pid__")]
    else:
        # empty input: an untyped empty map literal is map<void,void>
        # and indexing it with the int partition id fails analysis —
        # there are no rows, so the offset is a typed zero
        off = F.lit(0).cast("long")
    w = (Window.partitionBy("__pid__").orderBy("id")
         .rowsBetween(Window.unboundedPreceding, 0))
    cum = (off + F.sum("n_tokens").over(w)).alias("__cum__")
    out = sized.select("id", "n_tokens", cum)
    wt = F.lit(window_tokens).cast("long")
    start_off = (F.col("__cum__") - F.col("n_tokens"))
    end_win = F.when(F.col("n_tokens") > 0,
                     F.floor((F.col("__cum__") - 1) / wt)) \
               .otherwise(F.floor(start_off / wt))
    return out.select(
        "id", "n_tokens",
        start_off.alias("start_offset"),
        F.floor(start_off / wt).alias("start_window"),
        (start_off % wt).alias("offset_in_window"),
        end_win.alias("end_window"),
        F.when(F.col("n_tokens") > 0,
               end_win - F.floor(start_off / wt) + 1)
         .otherwise(F.lit(0)).cast("long").alias("n_windows"),
    )


def window_doc_map(df: DataFrame, text_col: str, id_col: str,
                   window_tokens: int = 256,
                   num_partitions: int | None = None) -> DataFrame:
    """Inverse of :func:`pack_sequences`: one row per (window, document)
    overlap — "which documents feed context window w", the lookup a
    training job needs to materialize batches from packed spans.

    Built on :func:`pack_sequences`' distributed prefix sum; the only
    extra work is a map-only ``explode(sequence(start_window,
    end_window))`` per non-empty document — output rows are bounded by
    Σ n_windows-per-doc ≈ corpus_tokens / window_tokens + n_docs.

    Output: ``window_id, id, n_tokens, offset_in_window`` (the doc's
    start offset within its FIRST window; later windows it spans start
    at offset 0 by construction).
    """
    packed = pack_sequences(df, text_col, id_col,
                            window_tokens=window_tokens,
                            num_partitions=num_partitions)
    ex = (packed.where(F.col("n_tokens") > 0)
          .select(F.explode(F.sequence(F.col("start_window"),
                                       F.col("end_window")))
                   .alias("window_id"),
                  "id", "n_tokens", "start_window", "offset_in_window"))
    return ex.select(
        "window_id", "id", "n_tokens",
        F.when(F.col("start_window") == F.col("window_id"),
               F.col("offset_in_window"))
         .otherwise(F.lit(0)).cast("long").alias("offset_in_window"))


def balanced_shards(df: DataFrame, text_col: str, id_col: str,
                    n_shards: int = 8,
                    num_partitions: int | None = None) -> DataFrame:
    """Token-balanced shard assignment — the "write the corpus as N
    training shards of near-equal token mass" step (hash sharding
    balances row COUNTS; with heavy-tailed document lengths the token
    mass per shard can skew badly, and stragglers follow).

    Longest-processing-time-style striping: documents are ranked by
    token count (descending, id tiebreak) and dealt serpentine across
    shards — rank pass 0 deals shards 0..N-1, pass 1 deals N-1..0, so
    every shard's k-th card comes from adjacent size ranks and totals
    stay within one document of each other for sorted inputs (classic
    LPT bound: makespan ≤ 4/3·OPT; serpentine on fully sorted input is
    far tighter in practice).

    The global size rank is the same DISTRIBUTED two-phase scan as
    :func:`pack_sequences` — range-repartition on (n_tokens DESC, id),
    per-partition counts (metadata-sized collect), partition-offset +
    within-partition ``row_number`` — never a single-partition global
    window.

    Output: ``id, n_tokens, rank (1-based), shard``.
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    sized = df.select(F.col(id_col).alias("id"),
                      F.size(tokens(F.col(text_col))).cast("long")
                       .alias("n_tokens"))
    keys = [F.col("n_tokens").desc(), F.col("id").asc()]
    if num_partitions:
        sized = sized.repartitionByRange(num_partitions, *keys)
    else:
        sized = sized.repartitionByRange(*keys)
    # same layout-pinning rationale as pack_sequences: the counts job
    # and the rank scan must see identical partition contents
    sized = (sized.sortWithinPartitions(*keys)
             .withColumn("__pid__", F.spark_partition_id())
             .localCheckpoint(eager=True))
    part_counts = (sized.groupBy("__pid__")
                   .agg(F.count(F.lit(1)).alias("c"))
                   .orderBy("__pid__")
                   .collect())
    offsets, acc = {}, 0
    for r in part_counts:
        offsets[r["__pid__"]] = acc
        acc += r["c"]
    off_map = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]) \
        if offsets else F.create_map()
    w = Window.partitionBy("__pid__").orderBy(*keys)
    rank = (off_map[F.col("__pid__")]
            + F.row_number().over(w)).cast("long").alias("rank")
    out = sized.select("id", "n_tokens", rank)
    p = F.lit(int(n_shards)).cast("long")
    pos = (F.col("rank") - 1) % p
    pass_ = F.floor((F.col("rank") - 1) / p)
    shard = F.when(pass_ % 2 == 0, pos).otherwise(p - 1 - pos)
    return out.select("id", "n_tokens", "rank",
                      shard.cast("long").alias("shard"))


def training_order(df: DataFrame, id_col: str, n_shards: int = 8,
                   salt: str = "shuffle") -> DataFrame:
    """Deterministic global training-order shuffle: every row gets a
    position in a pseudorandom permutation of the corpus (order =
    60-bit md5 of the id — collision-free in practice, id tiebreak
    regardless), striped round-robin into ``n_shards`` shards with a
    position within each shard.  This is the "shuffle the corpus
    before training" step — SGD needs documents decorrelated from
    ingestion order (a crawl is ordered by host; feeding it raw trains
    on one domain at a time) — made reproducible: same corpus, same
    salt → the same permutation on every run, any partitioning, any
    engine (vs ``ORDER BY rand()``, different every execution).

    The global rank is the same DISTRIBUTED two-phase scan as
    :func:`pack_sequences` / :func:`balanced_shards` — range-partition
    on the hash key, metadata-sized per-partition counts, partition
    offset + within-partition ``row_number`` — never a global ordered
    window on one reducer.  Round-robin striping means each shard is a
    uniform sample of the permutation AND consecutive training steps
    across shards read hash-adjacent (i.e. unrelated) documents.

    Output: ``id, rank (1-based global), shard, pos (0-based within
    shard)``.
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    h = md5_int64(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))
    sized = df.select(F.col(id_col).alias("id"), h.alias("__h__"))
    keys = [F.col("__h__").asc(), F.col("id").asc()]
    sized = (sized.repartitionByRange(*keys)
             .sortWithinPartitions(*keys)
             .withColumn("__pid__", F.spark_partition_id())
             .localCheckpoint(eager=True))
    part_counts = (sized.groupBy("__pid__")
                   .agg(F.count(F.lit(1)).alias("c"))
                   .orderBy("__pid__")
                   .collect())
    offsets, acc = {}, 0
    for r in part_counts:
        offsets[r["__pid__"]] = acc
        acc += r["c"]
    off_map = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]) \
        if offsets else F.create_map()
    w = Window.partitionBy("__pid__").orderBy(*keys)
    rank = (off_map[F.col("__pid__")]
            + F.row_number().over(w)).cast("long").alias("rank")
    p = F.lit(int(n_shards)).cast("long")
    return (sized.select("id", rank)
            .select("id", "rank",
                    ((F.col("rank") - 1) % p).cast("long").alias("shard"),
                    F.floor((F.col("rank") - 1) / p).cast("long")
                     .alias("pos")))
