"""Web-corpus curation operators: URL parsing, domain blocklists, and
per-domain document caps — the pre-dedup hygiene stages of a
CommonCrawl-style pipeline (Penedo et al. 2023, RefinedWeb §3.1: URL
filtering against a blocklist comes FIRST because it is the cheapest
gate; domain caps bound any single site's share of the corpus so one
crawler-friendly domain cannot dominate training).

The reference engine has no web surface at all (its sources are Excel
and CSV, excel_tables.py / scratch.py) — this module is part of the
LLM-pipeline extension surface.

Everything is engine-portable: domain extraction is a regexp (Spark's
``parse_url`` is JVM-only and has no DuckDB analogue, so the oracle
could not verify it), membership decisions are md5-hash-ordered, and
the cap rank is an exact window.

Scale shapes:

- ``extract_domain`` / ``blocklist_filter``: map-only (the blocklist is
  either a literal ``isin`` for small lists or a broadcast anti-join for
  DataFrame lists) — composes with partition pruning, no shuffle.
- ``domain_cap``: one shuffle on domain + a per-domain rank window.
  Partition state is bounded by the hottest domain's row count; at
  100 TB a mega-domain (e.g. a blog platform) is exactly the row-count
  skew AQE's skew-join splitting does NOT help with (windows don't
  split), so the pre-filter ``approx`` mode first drops rows beyond
  ~cap by hash-bucket threshold estimated from a count aggregate —
  turning the window's worst case from |domain| to ~cap·(1+ε) rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .sampling import BUCKETS, hash_bucket

# scheme://host[:port]/...  → host without port; bare hosts (no scheme)
# resolve via the second alternative.  Engine-portable RE2/ICU subset.
_DOMAIN_RE = r"^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?(?:[^/@]*@)?([^/:?#]+)"


def extract_domain(url_col: Column) -> Column:
    """Registrable host from a URL, lowercased: scheme, userinfo, port,
    path, query and fragment all stripped.  Pure regexp (portable —
    the DuckDB oracle runs the same pattern), map-only."""
    return F.lower(F.regexp_extract(url_col, _DOMAIN_RE, 1))


def blocklist_filter(df: DataFrame, domain_col: str,
                     blocked, suffix_match: bool = True) -> DataFrame:
    """Drop rows whose domain is on the blocklist.

    ``blocked``: a small Python list (becomes literal predicates —
    zero-shuffle, pushed into the scan) or a DataFrame with a
    ``domain`` column (becomes a broadcast anti-join — the blocklist
    side is the small side by construction; real blocklists are
    ~100k-1M rows, megabytes).

    ``suffix_match``: also drop subdomains (``ads.example.com`` matches
    blocked ``example.com``) — the standard blocklist contract.
    """
    d = F.col(domain_col)
    if isinstance(blocked, DataFrame):
        b = blocked.select(F.lower(F.col("domain")).alias("__bd__")).distinct()
        if suffix_match:
            cond = (d == F.col("__bd__")) | d.endswith(
                F.concat(F.lit("."), F.col("__bd__")))
        else:
            cond = d == F.col("__bd__")
        return df.join(F.broadcast(b), cond, "left_anti")
    pred = None
    for dom in blocked:
        dom = dom.lower()
        c = (d == dom) | d.endswith("." + dom) if suffix_match else (d == dom)
        pred = c if pred is None else (pred | c)
    return df if pred is None else df.filter(~pred)


def domain_cap(df: DataFrame, domain_col: str, id_col: str, cap: int,
               salt: str = "domcap", approx_prefilter: bool = False,
               ) -> DataFrame:
    """At most ``cap`` documents per domain, chosen by deterministic
    hash order (uniform over the domain's documents — NOT arrival
    order, which would bias toward whatever the crawler fetched first).
    Adds ``domain_rank`` (1-based position in the kept hash order).

    Exact path: one rank window per domain.  With
    ``approx_prefilter`` (the 100 TB path for mega-domains), a count
    aggregate estimates each over-cap domain's keep fraction and a
    hash-bucket threshold at ``min(1, 1.25·cap/n)`` drops the bulk
    map-side BEFORE the window — the window then ranks ~1.25·cap rows
    per domain instead of |domain|, bounding its partition state.  The
    1.25 safety factor keeps P(under-cap survivors < cap) negligible
    for n ≫ cap; survivors above cap are still cut exactly by the rank.
    The prefilter changes WHICH rows are candidates, not the
    determinism: both stages use the same salt, so membership is still
    a pure function of (id, salt).
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    bucket = hash_bucket(F.col(id_col), salt)
    out = df
    if approx_prefilter:
        # per-domain keep threshold as a DATAFRAME broadcast-joined to
        # the corpus — NOT a collect()-folded literal when-chain: a web
        # corpus has 10⁴–10⁶ over-cap domains, and one chained branch
        # per domain blows up the expression tree/codegen long before
        # the collect itself hurts (VERDICT r4).  The join side is one
        # row per over-cap domain (metadata-sized → BroadcastHashJoin;
        # AQE demotes to shuffle if a pathological corpus ever makes it
        # big, which is exactly the right fallback).
        thresholds = (
            df.groupBy(F.col(domain_col).alias("__dom__"))
            .agg(F.count(F.lit(1)).alias("__n__"))
            .where(F.col("__n__") > cap)
            .select(
                "__dom__",
                # same double-op order as the former driver-side
                # formula: int(((1.25·cap)/n)·BUCKETS) + 1, capped
                F.least(
                    F.lit(BUCKETS),
                    (F.lit(1.25 * cap) / F.col("__n__")
                     * F.lit(float(BUCKETS))).cast("int") + 1)
                .alias("__th__")))
        out = (out.join(F.broadcast(thresholds),
                        out[domain_col] == F.col("__dom__"), "left")
               .filter(bucket < F.coalesce(F.col("__th__"),
                                           F.lit(BUCKETS)))
               .drop("__dom__", "__th__"))
    w = (Window.partitionBy(domain_col)
         .orderBy(bucket.asc(), F.col(id_col).asc()))
    return (out.withColumn("domain_rank", F.row_number().over(w))
            .where(F.col("domain_rank") <= cap))


# canonicalization regexes — RE2-portable (no lookaround: DuckDB's
# regexp engine is RE2), shared verbatim with the oracle SQL
_TRACKING_PARAM_RE = (
    r"[?&](?:utm_[a-z]+|gclid|fbclid|msclkid|mc_cid|mc_eid)=[^&#]*")
_SCHEME_HOST_RE = r"^[^/?#]*://[^/?#]*"
# the default port is SCHEME-SPECIFIC: :80 is default only for http,
# :443 only for https — http://host:443 is a DIFFERENT resource than
# http://host and must not canonicalize onto it (an either-scheme
# alternation here silently merged them; caught by the property test).
# Java's regexp_replace substitutes unmatched groups as empty, so the
# two-branch form rebuilds with $1$2$3.
_DEFAULT_PORT_RE = (r"^(?:(http://[^/:?#]+):80|(https://[^/:?#]+):443)"
                    r"([/?#].*)?$")


def canonicalize_url(url_col: Column) -> Column:
    """Canonical form of a URL for dedup/caps — the normalization pass
    a crawl pipeline runs before ANY url-keyed operator (RFC 3986 §6
    normalizations plus the tracking-param strip every dedup pipeline
    applies):

    1. strip the fragment (``#…`` never reaches the server);
    2. lowercase scheme and host (authority is case-insensitive;
       path/query are NOT touched — they are case-sensitive);
    3. drop default ports (``:80`` http, ``:443`` https);
    4. remove tracking query params (``utm_*``/gclid/fbclid/…) and the
       resulting dangling ``?``/``&`` separators;
    5. drop a bare trailing ``/`` on an empty path.

    Pure regexp chain — map-only, engine-portable, composes with
    pushdown.  Build from :func:`extract_domain`'s conventions.
    """
    u = F.regexp_replace(url_col, r"#.*$", "")              # 1
    # 2: lowercase the scheme://host[:port] prefix only
    u = F.concat(
        F.lower(F.regexp_extract(u, "^(" + _SCHEME_HOST_RE[1:] + ")", 1)),
        F.regexp_replace(u, _SCHEME_HOST_RE, ""))
    u = F.regexp_replace(u, _DEFAULT_PORT_RE, r"$1$2$3")     # 3
    # 4: each tracking param is stripped WITH its leading separator;
    #    if the first surviving param lost its '?', restore it, then
    #    drop a dangling trailing separator
    u = F.regexp_replace(u, _TRACKING_PARAM_RE, "")
    u = F.regexp_replace(u, r"^([^?]*)&", r"$1?")
    u = F.regexp_replace(u, r"[?&]$", "")
    u = F.regexp_replace(u, r"^(https?://[^/?#]+)/$", r"$1")  # 5
    return u


def url_dedup(df: DataFrame, url_col: str, id_col: str) -> DataFrame:
    """Exact URL-level dedup after canonicalization — the cheapest and
    highest-yield dedup stage of a crawl pipeline (the same page is
    fetched under fragment/tracking-param/case variants constantly).
    Keeps the smallest id per canonical URL (deterministic, engine-
    portable).  One partial-agg groupBy on the canonical string —
    map-side combine collapses per-partition duplicates, so the
    exchange carries one row per distinct canonical URL per partition.
    Output: ``canonical_url, keep_id, n_variants``.
    """
    return (df.select(canonicalize_url(F.col(url_col))
                      .alias("canonical_url"),
                      F.col(id_col).alias("__id__"))
            .groupBy("canonical_url")
            .agg(F.min("__id__").alias("keep_id"),
                 F.count(F.lit(1)).cast("long").alias("n_variants")))
