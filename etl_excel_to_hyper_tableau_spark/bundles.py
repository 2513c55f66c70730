"""Public config objects: ``Query`` and ``QueryBundle``.

Mirrors the reference's API surface (query.py:5-27, query_bundle.py:4-59)
with its documented quirks fixed:

* pivot flags are keyed **by query name**, not by dict insertion order
  (reference relied on ``pivot_table.values()`` order matching
  ``query_names`` order, query_bundle.py:56 — SURVEY §2A A20);
* the export file name is NOT unconditionally suffixed ``.hyper``
  (reference produced ``foo.hyper.xlsx`` for Excel exports,
  query_bundle.py:33 + query_iterator.py:198 — SURVEY §2A A19); the sink
  derives the suffix;
* sink dispatch is by equality on a normalized extension, not substring
  containment (reference: ``file_extension in '.hyper'`` matched ``''``,
  ``'.h'``, ``'er'`` — query_iterator.py:46).
"""

from __future__ import annotations

from dataclasses import dataclass, field


def _as_list(value) -> list:
    """Scalar→list coercion, as the reference ctor does (query_bundle.py:36-50)."""
    if value is None:
        return []
    if isinstance(value, (list, tuple)):
        return list(value)
    return [value]


@dataclass
class Query:
    """One named SQL query plus its combine mode (reference query.py:5-27).

    ``sql`` may use the ``.sheet`` macro: any whitespace-delimited token
    ending in ``.sheet`` (e.g. ``Sheet1.sheet``) is rewritten per input
    file to the mangled table name ``{file_base}_{sheet}_sheet``.
    ``pivot`` selects the vertical-union combinator (True) or the
    horizontal positional concat (False) when results from multiple input
    files are combined.
    """

    name: str
    sql: str
    pivot: bool = False


@dataclass
class QueryBundle:
    """A batch of queries over a set of matched input files, bound to one
    export target (reference query_bundle.py:4-59).

    ``matches``: substrings resolved against the input directory — each
    must match at least one file (reference query_iterator.py:71-76).
    ``sheets``: sheet names loaded from every matched file.
    ``export_name``: base name of the output (no extension — the sink
    appends ``.hyper`` / ``.xlsx``).
    ``sink``: ``"hyper"`` | ``"excel"`` | ``"parquet"`` (equality
    dispatch; parquet is the scale-native addition).
    """

    export_name: str
    sink: str
    matches: list = field(default_factory=list)
    sheets: list = field(default_factory=list)
    queries: list = field(default_factory=list)

    # results accumulate here during a run: {query_name: [(file_name, DataFrame)]}
    queried_dfs_by_query_name: dict = field(default_factory=dict, repr=False)

    def __post_init__(self):
        self.matches = _as_list(self.matches)
        self.sheets = _as_list(self.sheets)
        self.queries = _as_list(self.queries)
        sink = self.sink.lstrip(".").lower()
        if sink not in {"hyper", "excel", "parquet"}:
            raise ValueError(f"unknown sink {self.sink!r}; expected hyper|excel|parquet")
        self.sink = sink
        names = [q.name for q in self.queries]
        if len(names) != len(set(names)):
            raise ValueError(f"duplicate query names in bundle: {names}")

    @classmethod
    def from_strings(cls, export_name: str, sink: str, matches, sheets,
                     query_strings, query_names, pivot_by_name: dict | None = None,
                     ) -> "QueryBundle":
        """Reference-ctor-shaped constructor (query_bundle.py:6-52) with the
        pivot flags keyed by query name (quirk A20 fixed)."""
        query_strings = _as_list(query_strings)
        query_names = _as_list(query_names)
        if len(query_strings) != len(query_names):
            raise ValueError("query_strings and query_names length mismatch")
        pivot_by_name = pivot_by_name or {}
        queries = [Query(n, s, bool(pivot_by_name.get(n, False)))
                   for n, s in zip(query_names, query_strings)]
        return cls(export_name=export_name, sink=sink, matches=matches,
                   sheets=sheets, queries=queries)
