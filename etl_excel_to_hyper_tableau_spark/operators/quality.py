"""Data-quality expectations: declarative row-level checks evaluated
in ONE aggregate pass.

The shape every production pipeline bolts on (dbt tests, Great
Expectations, Deequ): declare predicates, get a violations report.
The scale property that matters is that *all* checks share a single
scan + a single partial aggregate — each check is a
``sum(case when violated then 1 end)`` column, map-side combinable, so
the report costs one pass over 100 TB regardless of how many checks
run.  The per-check rows are unpivoted from the one-row aggregate
(stack over a 1-row frame — driver-free, trivially cheap).

Uniqueness checks need a second shape (duplicates are a property of
the whole column, not a row), expressed as ``count - count_distinct``
inside the same aggregate — still one pass, with the usual caveat that
count_distinct adds an expand; put uniqueness checks on key columns
only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def check_report(df: DataFrame, checks: dict[str, Column],
                 unique: list[str] | None = None) -> DataFrame:
    """Evaluate named row predicates (``True`` = row passes) plus
    optional column-uniqueness checks, in one aggregate pass.

    Output: ``check, n_violations, n_rows, passed`` — one row per
    check, deterministic order by check name.
    """
    if not checks and not unique:
        raise ValueError("no checks given")
    aggs = [F.count("*").alias("__n__")]
    names = []
    for name, pred in checks.items():
        names.append(name)
        # NULL predicate result counts as a violation (a row that can't
        # prove it passes doesn't pass) — coalesce, don't negate; the
        # outer coalesce makes an EMPTY frame report 0 violations /
        # passed=true instead of NULLs (sum over zero rows is NULL)
        aggs.append(F.coalesce(
            F.sum(F.when(F.coalesce(pred, F.lit(False)), 0).otherwise(1)),
            F.lit(0)).cast("long").alias(f"__c_{len(names) - 1}__"))
    for col in unique or []:
        names.append(f"unique({col})")
        aggs.append((F.count(col) - F.countDistinct(col))
                    .cast("long").alias(f"__c_{len(names) - 1}__"))
    one = df.agg(*aggs)

    def _lit(n: str) -> str:  # escape backslashes, then quotes
        return n.replace("\\", "\\\\").replace("'", "''")

    stack = ", ".join(f"'{_lit(n)}', __c_{i}__" for i, n in enumerate(names))
    return (one.selectExpr(f"stack({len(names)}, {stack}) as (check, n_violations)",
                           "__n__ as n_rows")
            .withColumn("passed", F.col("n_violations") == 0)
            .orderBy("check"))


def corpus_summary(df: DataFrame, text_col: str, lang_col: str,
                   source_col: str) -> DataFrame:
    """One-row corpus "data card" (the dataset-nutrition-label header:
    Gebru et al. 2021 datasheets; what every training-corpus release
    publishes first): document and token totals, language diversity as
    Shannon entropy over the language mix, and source concentration as
    the hottest source's share — the two numbers that flag a skewed
    crawl before any per-document gate runs.

    ONE corpus scan: the three aggregation keys (per-language,
    per-source, global) run as a single GROUPING SETS pass — Expand
    emits three grouping arms per row but the partial aggregate
    collapses them map-side, so the shuffle carries ≤ 3·(langs +
    sources + 1) rows per partition.  (The naive formulation — three
    separate ``groupBy``s off one base — re-scans the corpus three
    times: AQE's exchange reuse cannot merge shuffles with different
    keys.  Measured: 9 parquet scans in the executed plan vs 1 here.)
    The metadata-sized grouped result is pinned with an eager
    ``localCheckpoint`` so the three downstream branches read ~tens of
    rows instead of re-running the pass.  The language entropy
    ``−Σ p·ln p`` folds in sorted language order (``aggregate`` over
    ``sort_array(collect_list(...))``, the bm25 doctrine) so the double
    sum is bit-reproducible by an external engine.

    Output columns: ``n_docs, n_tokens, avg_doc_tokens, n_langs,
    lang_entropy, n_sources, top_source_share``.
    """
    from .text import spread, token_count

    base = spread(df).select(
        F.col(lang_col).alias("lang"), F.col(source_col).alias("source"),
        token_count(F.col(text_col)).cast("long").alias("n_tok"))
    # gid: 1 = by lang (source aggregated), 2 = by source, 3 = global
    g = (base.groupingSets([["lang"], ["source"], []], "lang", "source")
         .agg(F.grouping_id().alias("gid"),
              F.count(F.lit(1)).alias("n"),
              F.sum("n_tok").alias("tok"))
         .localCheckpoint(eager=True))
    totals = (g.filter(F.col("gid") == 3)
              .select(F.col("n").alias("n_docs"),
                      F.col("tok").alias("n_tokens")))
    by_lang = g.filter(F.col("gid") == 1).select("lang", "n")
    by_src = g.filter(F.col("gid") == 2).select("source", "n")
    ent = F.aggregate(
        F.transform(F.sort_array(F.collect_list(F.struct("lang", "n"))),
                    lambda s: s["n"]),
        F.lit(0.0),
        lambda acc, n: acc - (n / F.col("n_docs").cast("double"))
        * F.log(n / F.col("n_docs").cast("double")))
    lang_row = (by_lang.crossJoin(F.broadcast(totals))
                .groupBy("n_docs")
                .agg(F.count(F.lit(1)).cast("long").alias("n_langs"),
                     F.round(ent, 9).alias("lang_entropy")))
    src_row = (by_src.crossJoin(F.broadcast(totals))
               .groupBy("n_docs")
               .agg(F.count(F.lit(1)).cast("long").alias("n_sources"),
                    (F.max("n") / F.col("n_docs").cast("double"))
                    .alias("top_source_share")))
    return (totals
            .join(F.broadcast(lang_row), "n_docs")
            .join(F.broadcast(src_row), "n_docs")
            .select(F.col("n_docs").cast("long").alias("n_docs"),
                    F.col("n_tokens").cast("long").alias("n_tokens"),
                    (F.col("n_tokens")
                     / F.col("n_docs").cast("double")).alias("avg_doc_tokens"),
                    "n_langs", "lang_entropy", "n_sources",
                    "top_source_share"))


def k_anonymity_report(df: DataFrame, quasi_cols: list[str],
                       k: int = 5) -> DataFrame:
    """k-anonymity audit (Sweeney 2002): rows whose quasi-identifier
    combination is shared by fewer than ``k`` records are
    re-identifiable by linkage — the structural privacy check that
    complements the regex PII scrub (``pii_redact`` finds explicit
    identifiers; this finds rows made identifiable by the COMBINATION
    of innocuous attributes).  Training-data releases run both.

    One partial-aggregating ``groupBy`` over the quasi-identifier
    columns → filter groups under ``k``.  Output: one row per
    violating group (``*quasi_cols, group_size``) — release-blocking
    until generalization/suppression brings every group to ≥ k.
    Group-count output is bounded by the number of DISTINCT
    quasi-identifier combinations, not rows.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    return (df.groupBy(*quasi_cols)
            .agg(F.count(F.lit(1)).cast("long").alias("group_size"))
            .where(F.col("group_size") < k))


def json_field_profile(df: DataFrame, json_col: str,
                       approx_ndv: bool = False, p: int = 8,
                       fuse_final: bool = False) -> DataFrame:
    """Schema-on-read discovery for a JSON-string column: one row per
    top-level key with presence, numeric-parse, and distinct-value
    counts — the profile that decides which fields become typed
    columns before a `from_json`-with-schema extraction is committed.

    Plan: ONE scan — `from_json` to ``map<string,string>`` (scalar
    values arrive unquoted), explode, partial-agg groupBy on the key.
    The exchange is bounded by |keys| × partitions for the count
    columns; the exact distinct-count pays the usual distinct
    expansion — pass ``approx_ndv=True`` to swap it for the portable
    grouped-HLL estimate (:func:`.sketches.grouped_hll_ndv` — the
    exchange then stays ≤ |keys|·2^p rows per partition, the scale
    path when |values| is corpus-sized).  Rows whose JSON fails to
    parse contribute nothing (from_json → NULL map; count them
    upstream if the failure rate matters — see check_report).

    Output: ``key, n_present, n_numeric, n_distinct`` (exact ints,
    engine-portable); with ``approx_ndv=True`` the last column is the
    HLL double ``n_distinct`` estimate instead (rounded to 4).

    ``fuse_final=True`` (approx path only) inserts ``coalesce(1)``
    between the two register aggregations: SinglePartition satisfies
    every downstream clustering requirement, so the final
    (key, register) merge, the per-key estimate, and any trailing
    in-partition sort all fuse into ONE task with no further exchange
    — two whole stages cheaper, measured 1.37 s → 1.14 s at sf0.1.
    The single merge task reads every map-side partial block, bounded
    by ``upstream_partitions × |keys| × (2^p + 1)`` rows — fine
    through ~10^4 input partitions; for a 100 TB scan (10^5-10^6
    splits) leave it False and keep the parallel two-exchange merge.
    """
    from .parallelism import spread

    # spread BEFORE the parse: a single-file local corpus is one input
    # split, and from_json is the dominant cost — shuffling the raw
    # strings once buys 32× parse parallelism (no-op when the scan
    # already has ≥ default-parallelism splits, i.e. any real corpus)
    kv = spread(df).select(F.explode(F.from_json(F.col(json_col),
                                                 "map<string,string>"))
                           .alias("key", "value"))
    if approx_ndv:
        # ONE pass: a two-branch formulation (count agg ⋈ grouped_hll_ndv)
        # runs the from_json parse twice — measured no faster than the
        # exact path at sf0.1 because the parse dominates.  Aggregating
        # counts at (key, register) granularity first keeps one scan and
        # the same ≤ |keys|·(2^p+1) exchange bound; the estimate
        # arithmetic below is term-for-term grouped_hll_ndv's, so the
        # portable-HLL oracle is unchanged.
        from ..functions.hashing import md5_int64
        from .sketches import _hll_alpha
        m = 1 << p
        nbits = 60 - p
        alpha = _hll_alpha(m)
        h = md5_int64(F.col("value").cast("string"))
        w = F.floor(h / m)
        rank = F.when(w > 0, F.lit(nbits + 1) - F.length(F.bin(w))) \
            .otherwise(F.lit(nbits + 1))
        has_v = F.col("value").isNotNull()
        g1 = (kv.select(
                  "key",
                  F.when(has_v, h % m).otherwise(F.lit(-1)).alias("register"),
                  F.when(has_v, rank).cast("int").alias("rank"),
                  F.expr("try_cast(value AS double)").alias("num"))
              .groupBy("key", "register")
              .agg(F.count(F.lit(1)).alias("cnt"),
                   F.count("num").alias("n_num"),
                   F.max("rank").alias("max_rank")))
        if fuse_final:
            g1 = g1.coalesce(1)
        hit = F.col("register") >= 0
        agg = g1.groupBy("key").agg(
            F.sum("cnt").cast("long").alias("n_present"),
            F.sum("n_num").cast("long").alias("n_numeric"),
            F.count(F.when(hit, F.lit(1))).cast("long").alias("n_hit"),
            F.coalesce(F.sum(F.when(hit, F.pow(
                F.lit(2.0), F.lit(nbits) - F.col("max_rank"))
                .cast("long"))), F.lit(0))
             .cast("long").alias("s_hit"))
        v_zero = F.lit(m) - F.col("n_hit")
        s = (F.col("s_hit") + v_zero * F.lit(1 << nbits)).cast("double")
        e_raw = (F.lit(alpha) * F.lit(float(m)) * F.lit(float(m))
                 * F.lit(float(1 << nbits)) / s)
        e = F.when((e_raw <= F.lit(2.5 * m)) & (v_zero > 0),
                   F.lit(float(m)) * F.log(F.lit(float(m))
                                           / v_zero.cast("double"))) \
            .otherwise(e_raw)
        return agg.select("key", "n_present", "n_numeric",
                          F.round(e, 4).alias("n_distinct"))
    return (kv.groupBy("key")
            .agg(F.count(F.lit(1)).cast("long").alias("n_present"),
                 F.count(F.expr("try_cast(value AS double)"))
                 .cast("long").alias("n_numeric"),
                 F.countDistinct("value").cast("long")
                 .alias("n_distinct")))
