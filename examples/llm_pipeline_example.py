"""End-to-end training-data pipeline over the testdata corpus — the
operators a 100 TB data-curation run chains, on one page:

    normalize (NFC/lower/strip) → clean → exact dedup → near-dup dedup
    (MinHash-LSH scale path) → repeated-passage removal →
    canonical-document election (highest-quality survivor per cluster)
    → decontaminate vs a benchmark slice → PII redact →
    train/val/test split → mixture weights + sample → negative pairs →
    context-window packing → token-balanced shards → epoch
    upsampling + reproducible training-order shuffle → stage to
    parquet → compact

Every stage is one of the engine's oracle-verified operators; this
script just composes them.  Run:

    python examples/llm_pipeline_example.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from etl_excel_to_hyper_tableau_spark import get_spark  # noqa: E402
from etl_excel_to_hyper_tableau_spark.operators import (  # noqa: E402
    dedup as dd, sampling as sp, text as tx,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/llm_pipeline_out"
    spark = get_spark(app_name="llm_pipeline_example")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()

    # -1. crawl-entry extraction: a real pipeline starts from raw HTML
    # pages, not clean text — synthesize full pages (JVM expressions)
    # and strip boilerplate with the stdlib-parser walk, re-joining the
    # kept <p> blocks per document.  Map-only both halves; on this
    # corpus the round trip reconstructs the text exactly, which is the
    # stage's contract check.
    from etl_excel_to_hyper_tableau_spark.operators.html import (
        html_extract, wrap_html,
    )
    blocks = html_extract(wrap_html(docs))
    extracted = (blocks.filter(F.col("tag") == "p")
                 .groupBy("doc_id")
                 .agg(F.concat_ws("", F.array_sort(F.collect_list(
                     F.struct("block_idx", "block_text"))
                 ).getField("block_text")).alias("text")))
    docs = docs.drop("text").join(extracted, "doc_id")

    # 0. canonical normalization FIRST — dedup keys, tokenizers and
    # contamination shingles all assume it (NFC composition, lowercase,
    # URL/email strip, whitespace collapse)
    docs = (docs.drop("text")
            .join(tx.normalize_text(docs, "text", "doc_id")
                  .select(F.col("id").alias("doc_id"), "text"), "doc_id"))

    # 0b. corpus-frequency boilerplate removal (RefinedWeb line-wise
    # filter; token granularity here — the synthetic corpus is
    # single-line): anything present in ≥ 95% of documents is
    # template, not content, and must go BEFORE dedup so boilerplate
    # doesn't glue unrelated documents into near-dup clusters.  The
    # threshold is deliberately high: this corpus IS template-built,
    # and a 60% gate strips so much that every doc fails the later
    # min-token gate (measured — the whole pipeline emptied)
    # localCheckpoint: the normalize + census lineage above re-executes
    # under every downstream dedup stage otherwise — truncating here
    # keeps the plan (and the driver heap) flat for the whole chain
    docs = (docs.drop("text")
            .join(tx.remove_boilerplate_lines(docs, "text", "doc_id",
                                              min_frac=0.95, delimiter=" ")
                  .select(F.col("id").alias("doc_id"),
                          F.col("clean_text").alias("text")), "doc_id")
            .localCheckpoint(eager=True))

    # 1. quality gates (C4/Gopher-style trio)
    cleaned = tx.clean_corpus(docs, "text", "doc_id",
                              min_quality=0.3, min_tokens=5, max_tokens=5000,
                              max_dup_bigram=0.5)
    n1 = cleaned.count()

    # 2. exact dedup, then near-dup dedup on the linear LSH scale path
    # (wide bands = strict collisions: this synthetic corpus is built
    # from templates, so narrow bands would collapse it entirely)
    exact = dd.exact_dedup(cleaned, ["text"], "doc_id")
    deduped = dd.minhash_dedup(exact, "text", "doc_id", k=32, bands=2,
                               threshold=None)
    n2 = deduped.count()

    # 2b. strip passages repeated ACROSS surviving documents (licence
    # boilerplate / template blocks), keeping each passage's first
    # occurrence (Lee et al. exact-substring dedup, chunk-approximated)
    deduped = (dd.segment_dedup(deduped, "text", "doc_id", seg_tokens=10)
               .where(F.col("n_kept") > 0)
               .join(deduped.drop("text"), "doc_id")
               .withColumnRenamed("cleaned_text", "text"))

    # 2c. canonical-document election on the remaining near-dup
    # clusters: keep the highest-QUALITY member, not the smallest id
    # (the ad-free mirror should survive, not whichever crawled first)
    clusters = dd.duplicate_clusters(deduped, "text", "doc_id",
                                     threshold=0.8, max_df=100)
    reps = dd.cluster_representatives(deduped, "text", "doc_id",
                                      threshold=0.8, max_df=100)
    losers = clusters.join(
        reps.select(F.col("rep_doc_id").alias("doc_id")),
        "doc_id", "left_anti")
    deduped = deduped.join(losers.select("doc_id"), "doc_id", "left_anti")

    # 3. decontaminate against a held-out "benchmark" slice (12-gram
    # overlap — long shingles, so only real template overlap flags)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    flagged = dd.contamination_pairs(deduped, bench, "text", "doc_id",
                                     n=12, min_common=30) \
        .select(F.col("corpus_id").alias("doc_id")).distinct()
    decontaminated = deduped.join(flagged, "doc_id", "left_anti")
    n3 = decontaminated.count()

    # 3b. taxonomy tagging: route documents to topic buckets by phrase
    # dictionary (broadcast n-gram join — map-side on the corpus); a
    # real run keys its mixture/filter policies off these tags
    tags = tx.dictionary_tag(decontaminated, "text", "doc_id",
                             ["table scan", "hash join", "sort merge"])
    n_tagged = tags.select("doc_id").distinct().count()

    # 4. PII scrub
    scrubbed = decontaminated.withColumn("text", tx.pii_redact(F.col("text")))

    # 5. deterministic split + mixture thinning of the train split
    split = sp.hash_split(scrubbed, "doc_id",
                          {"train": 0.9, "val": 0.05, "test": 0.05})
    train = split.filter(F.col("split") == "train")
    # α-temperature rebalancing report for the sources feeding train
    # (what a 100 TB run feeds its sampler): share vs √-damped weight
    weights = sp.mixture_weights(train, "source",
                                 tx.token_count(F.col("text"))).collect()
    mixed = sp.sample_to_mixture(train, "doc_id", "lang",
                                 {"en": 0.4, "zh": 0.3, "de": 0.2, "fr": 0.1},
                                 total=max(n3 // 2, 1))
    n4 = mixed.count()

    # 6. contrastive negatives for the mixed train slice (hash-derived,
    # reproducible across re-runs and engines)
    pairs = sp.negative_pairs(mixed, "doc_id", k=2)
    n5 = pairs.count()

    # 6a. tokenizer: train a unigram-LM piece vocab on the train slice
    # (hard-EM over the distinct-word table only) and tokenize it —
    # the token counts every later stage (packing, shard balancing,
    # budgeting) would use in a real run
    vocab = tx.unigram_train(mixed, "text", vocab_size=200,
                             max_piece_len=4, iters=1)
    tokenized = tx.unigram_apply(mixed, "text", "doc_id", vocab)
    n_subword = tokenized.agg(F.sum("n_tokens")).first()[0]

    # 6b. context-window packing of the mixed train slice (the batch
    # layout a training job reads; distributed prefix sum, no global
    # ordered window)
    from etl_excel_to_hyper_tableau_spark.operators.packing import pack_sequences
    packed = pack_sequences(mixed, "text", "doc_id", window_tokens=256)
    n_windows = packed.agg(F.max("end_window")).first()[0]

    # 6c. token-balanced training shards (LPT serpentine over the
    # distributed size rank — byte/token mass per shard, not row count)
    from etl_excel_to_hyper_tableau_spark.operators.packing import (
        balanced_shards,
    )
    shard_tokens = (balanced_shards(mixed, "text", "doc_id", n_shards=8)
                    .groupBy("shard").agg(F.sum("n_tokens").alias("t"))
                    .collect())
    tmax = max(r["t"] for r in shard_tokens)
    tmin = min(r["t"] for r in shard_tokens)

    # 6d. data-recipe repetition: the high-quality source trains for
    # 2 epochs, everything else for 1 (Touvron et al. §2.1) — then a
    # reproducible global order shuffle so SGD doesn't see one domain
    # at a time (hash permutation, never ORDER BY rand())
    from etl_excel_to_hyper_tableau_spark.operators.packing import (
        training_order,
    )
    repeated = sp.upsample_epochs(mixed, "doc_id", "source",
                                  {"src0": 2.0}, default=1.0)
    n_rep = repeated.count()
    ordered = training_order(mixed, "doc_id", n_shards=8)
    first_ids = [r["id"] for r in ordered.orderBy("rank").limit(3).collect()]

    # 6e. training-ready delivery: the mixed train slice leaves the
    # engine as WebDataset tar shards (what a streaming data loader
    # consumes) — hash-routed, in-shard key sort, byte-deterministic
    from etl_excel_to_hyper_tableau_spark.sinks.webdataset import (
        write_webdataset,
    )
    wds_shards = write_webdataset(
        mixed.withColumn("meta", F.to_json(F.struct("lang", "source"))),
        out_dir + "_wds", "doc_id", {"txt": "text", "json": "meta"},
        n_shards=4)

    # 7. stage to parquet partitioned by split (the training-ready
    # layout), then compact — incremental ingests accrete small files
    split.write.mode("overwrite").partitionBy("split").parquet(out_dir)
    from etl_excel_to_hyper_tableau_spark.sinks.parquet import compact_parquet
    stats = compact_parquet(spark, out_dir, out_dir + "_compact",
                            target_file_mb=512, sort_within_by=["doc_id"])

    mix_report = ", ".join(
        f"{r['stratum']}: {r['share']:.2f}→{r['weight']:.2f}"
        for r in sorted(weights, key=lambda r: r["stratum"])[:4])
    print(f"corpus {n0} → cleaned {n1} → deduped {n2} "
          f"→ decontaminated {n3} ({n_tagged} taxonomy-tagged) "
          f"→ mixed-train {n4} "
          f"({n_subword} subword tokens under the trained unigram vocab) "
          f"(+{n5} negative pairs, "
          f"{(n_windows or 0) + 1} context windows; α-weights {mix_report} …); "
          f"staged at {out_dir} "
          f"({stats['files_in']}→{stats['files_out']} files compacted; "
          f"{len(wds_shards)} WebDataset shards); "
          f"8 shards balanced to {tmin}-{tmax} tokens; "
          f"epoch-repeated to {n_rep} rows; "
          f"training order opens with docs {first_ids}")
    spark.stop()


if __name__ == "__main__":
    main()
