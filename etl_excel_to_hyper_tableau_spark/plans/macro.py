"""The ``.sheet`` macro rewriter and table-name mangling.

This is the reference's entire query "frontend" (SURVEY §3.2): a macro
expander, not a parser.  Semantics preserved exactly from the reference:

* table name is ``{file_base}_{sheet}_sheet`` where ``file_base`` is the
  input file name with its extension stripped (fsheet.py:38-42);
* rewrite splits the SQL on whitespace, replaces each token whose suffix
  is ``.sheet`` (matched via rightmost find, query.py:18-23), and re-joins
  with single spaces — whitespace is normalized as a side effect
  (query.py:24-26);
* Spark addition: mangled names are sanitized for Spark identifier rules
  (non ``[A-Za-z0-9_]`` chars → ``_``) since temp-view names cannot be
  backtick-escaped at registration time.
"""

from __future__ import annotations

import re

_IDENT_RE = re.compile(r"[^A-Za-z0-9_]")
_SUFFIX = ".sheet"


def sanitize_identifier(name: str) -> str:
    """Make a string a legal unquoted Spark identifier."""
    out = _IDENT_RE.sub("_", name)
    if out and out[0].isdigit():
        out = "_" + out
    return out


def strip_extension(file_name: str) -> str:
    """Drop the final extension: ``a.b.xlsx`` → ``a.b`` (reference uses
    ``file_name[:file_name.rfind('.')]``, fsheet.py:40)."""
    dot = file_name.rfind(".")
    return file_name[:dot] if dot > 0 else file_name


def sql_table_name(file_name: str, sheet: str) -> str:
    """Mangled staging-table name for one (file, sheet) pair
    (reference fsheet.py:38-42)."""
    return sanitize_identifier(f"{strip_extension(file_name)}_{sheet}_sheet")


def format_query(sql: str, file_name: str) -> str:
    """Rewrite every whitespace-delimited token ending in ``.sheet`` to the
    mangled table name for ``file_name`` (reference query.py:13-27).

    ``"SELECT * FROM Sheet1.sheet"`` with file ``data.xlsx`` →
    ``"SELECT * FROM data_Sheet1_sheet"``.

    Tokens carrying trailing punctuation (``a.sheet,`` from a comma
    join list, ``b.sheet)`` closing a subquery) are rewritten with the
    punctuation re-attached.  The reference mangles this case (its
    rightmost-find rewrite silently eats the comma, query.py:18-23);
    implement-the-intent here means the user's join list keeps working.
    """
    tokens = sql.split()
    out = []
    for tok in tokens:
        core = tok.rstrip(",;)")
        suffix = tok[len(core):]
        idx = core.rfind(_SUFFIX)
        if idx != -1 and idx + len(_SUFFIX) == len(core):
            sheet = core[:idx]
            out.append(sql_table_name(file_name, sheet) + suffix)
        else:
            out.append(tok)
    return " ".join(out)
