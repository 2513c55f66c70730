"""The pipeline orchestrator — Spark-native replacement for the
reference's ``QueryIterator`` (query_iterator.py:15-246).

Lifecycle (SURVEY §3.4): match files → load sheets → register temp views
→ run each (query × file) through ``spark.sql`` → combine per query
(pivot union / horizontal concat) → export per bundle.  All heavy work is
declarative DataFrame ops executed by Catalyst; the orchestrator itself
is metadata-only driver code.

Reference quirks fixed here (SURVEY §2A):
* A17 — cleanup runs once after all bundles (reference's misspelled call
  inside the per-query loop would have dropped tables mid-run);
* A19 — sink dispatch by equality, suffix derived from the sink;
* A6  — the distinct-(file,sheet) set is a real set, not the accidental
  ``{str: list}`` dict.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.errors.exceptions.captured import AnalysisException

from .bundles import Query, QueryBundle
from .operators.combinators import horizontal_concat, pivot_union, prefix_columns
from .plans.dialect import rewrite_bare_column, sqlite_to_spark
from .plans.macro import format_query, sql_table_name
from .plans.recursive import is_recursive_union, run_recursive_union_sql
from .sinks.excel import write_excel
from .sinks.hyper import write_hyper
from .sinks.parquet import write_parquet
from .sources.excel import read_excel_sheet
from .sources.registry import discover_files, register_sheet, resolve_match, unregister_all


class QueryEngine:
    """Run QueryBundles over a directory of Excel inputs.

    ``dialect="sqlite"`` applies the SQLite→Spark shim to every query
    before execution (default: the reference's contract);
    ``dialect="spark"`` passes SQL through untouched.
    """

    def __init__(self, spark: SparkSession, directory: str,
                 bundles: list[QueryBundle], export_dir: str,
                 dialect: str = "sqlite",
                 stage_format: str = "memory",
                 stage_dir: str | None = None):
        self.spark = spark
        self.directory = directory
        self.bundles = bundles
        self.export_dir = export_dir.rstrip("/")
        if dialect not in {"sqlite", "spark"}:
            raise ValueError(f"unknown dialect {dialect!r}")
        if stage_format not in {"memory", "parquet"}:
            raise ValueError(f"unknown stage_format {stage_format!r}")
        self.dialect = dialect
        self.stage_format = stage_format
        self.stage_dir = (stage_dir or f"{self.export_dir}/__stage__").rstrip("/")
        self._registered: list[str] = []

    # -- stages -----------------------------------------------------------
    def match_files(self) -> dict[str, str]:
        """match-string → file-name for every match in every bundle
        (reference query_iterator.py:58-86)."""
        files = discover_files(self.directory)
        return {m: resolve_match(files, m)
                for b in self.bundles for m in b.matches}

    def distinct_sheets(self, match_map: dict[str, str]) -> list[tuple[str, str]]:
        """Distinct (file, sheet) pairs across all bundles (reference A6),
        ordered deterministically."""
        pairs = {(match_map[m], s)
                 for b in self.bundles for m in b.matches for s in b.sheets}
        return sorted(pairs)

    def stage(self, pairs: list[tuple[str, str]]) -> None:
        """Load each (file, sheet) once and register it as a temp view
        (reference A7; SQLite staging replaced by the Catalyst catalog).

        ``stage_format="parquet"`` additionally writes each sheet to
        ``stage_dir`` and registers the parquet read instead of the
        in-memory frame — the scale path: xlsx (zipped XML, not
        splittable, no pushdown) is parsed ONCE, and every query then
        scans columnar parquet with predicate pushdown and column
        pruning (``PushedFilters``/``ReadSchema`` reach the scan; the
        plan-property test pins this).  This is the "parse once, query
        Parquet" layout SCALING.md prescribes for 100 TB workbook
        ingest; "memory" (default) skips the I/O round-trip for
        reference-sized inputs.
        """
        for file_name, sheet in pairs:
            df = read_excel_sheet(self.spark, f"{self.directory}/{file_name}", sheet)
            if self.stage_format == "parquet":
                name = sql_table_name(file_name, sheet)
                path = f"{self.stage_dir}/{name}"
                df.write.mode("overwrite").parquet(path)
                df = self.spark.read.parquet(path)
            self._registered.append(
                register_sheet(self.spark, df, file_name, sheet))

    def run_query(self, query: Query, file_name: str) -> DataFrame:
        """Rewrite (.sheet macro + dialect shim) and execute one
        (query, file) pair.

        SQLite permits bare (non-grouped, non-aggregated) select items in
        aggregate queries — an arbitrary in-group row's value is taken
        (SURVEY §2C).  Spark rejects these at analysis; in sqlite dialect
        each such item is wrapped in ``any_value`` and retried, using
        Catalyst's MISSING_AGGREGATION error itself to identify the bare
        columns instead of reimplementing the analyzer's grouping check.
        """
        sql = format_query(query.sql, file_name)
        if self.dialect != "sqlite":
            return self.spark.sql(sql)
        sql = sqlite_to_spark(sql)
        # WITH RECURSIVE … UNION ALL runs natively on Spark 4.1; the
        # UNION-distinct form (SQLite's cyclic-closure idiom) does not —
        # route it through the iterative-fixpoint evaluator
        if is_recursive_union(sql):
            return run_recursive_union_sql(self.spark, sql)
        for _ in range(20):  # one retry per bare column; select lists are short
            try:
                return self.spark.sql(sql)
            except AnalysisException as e:
                m = re.search(r'non-aggregating expression "(\w+)"', str(e))
                if "MISSING_AGGREGATION" not in str(e) or not m:
                    raise
                rewritten = rewrite_bare_column(sql, m.group(1))
                if rewritten == sql:
                    raise
                sql = rewritten
        return self.spark.sql(sql)

    def combine(self, bundle: QueryBundle, query: Query,
                per_file: list[tuple[str, str, DataFrame]]) -> DataFrame:
        """Combine per-file results of one query: pivot → vertical union
        with provenance; non-pivot → match-prefixed horizontal concat."""
        if query.pivot:
            return pivot_union([(file_name, df) for _, file_name, df in per_file])
        return horizontal_concat(
            [prefix_columns(df, match) for match, _, df in per_file])

    def export(self, bundle: QueryBundle,
               results: list[tuple[str, DataFrame]]) -> str:
        os.makedirs(self.export_dir, exist_ok=True)
        base = f"{self.export_dir}/{bundle.export_name}"
        if bundle.sink == "hyper":
            return write_hyper(base, results)
        if bundle.sink == "excel":
            return write_excel(base, results)
        return write_parquet(base, results)

    # -- the pipeline -----------------------------------------------------
    def process_queries(self) -> dict[str, str]:
        """Full run; returns {bundle_export_name: written_path}.

        The reference's equivalent is ``process_queries``
        (query_iterator.py:32-55).  Each (query × file) job is
        independent — on a cluster they parallelize trivially; driver
        orchestration stays sequential for determinism.
        """
        outputs: dict[str, str] = {}
        match_map = self.match_files()
        try:
            self.stage(self.distinct_sheets(match_map))
            for bundle in self.bundles:
                results: list[tuple[str, DataFrame]] = []
                for query in bundle.queries:
                    per_file = [
                        (m, match_map[m], self.run_query(query, match_map[m]))
                        for m in bundle.matches
                    ]
                    bundle.queried_dfs_by_query_name[query.name] = [
                        (f, df) for _, f, df in per_file]
                    results.append((query.name, self.combine(bundle, query, per_file)))
                outputs[bundle.export_name] = self.export(bundle, results)
        finally:
            unregister_all(self.spark, self._registered)
            self._registered.clear()
        return outputs
