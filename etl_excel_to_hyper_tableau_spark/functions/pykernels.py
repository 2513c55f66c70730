"""Worker-side Python primitives for Arrow (``mapInPandas``) kernels —
the vectorized fast path for the corpus-linear string operators.

Why this exists: Spark's higher-order-function lambdas
(``transform``/``filter``/``aggregate``) are INTERPRETED per element —
they never enter whole-stage codegen — so a kernel that walks every
character n-gram of every document pays an expression-tree walk per
gram.  At sf1 that interpretation premium measured 2-4× of a
single-process C++ engine on six corpus-linear entries
(MATCHED_PAIR_sf1_computebound.json, round 10), and the in-Catalyst
rewrite routes are exhausted (the Karp-Rabin arithmetic form measured
SLOWER than md5-per-gram — see BASELINE.md round 10).  The remaining
lever is to move the per-document inner loop into an Arrow-batched
Python kernel: hashlib's md5 is C, numpy does the windowing, and the
batch transfer is columnar — measured ~1 µs/gram single-threaded,
which across 32 workers beats the interpreted path by ~5-10×.

Everything here reproduces the Catalyst/oracle semantics BIT-FOR-BIT:

* :func:`md5_60` == ``functions.hashing.md5_int64`` (first 15 hex
  digits of md5 as int64 == top 60 bits of the digest);
* :func:`gram_hashes` == ``transform(char_ngrams(col, k), md5_int64)``
  including the CHARACTER (not byte) slicing contract — the ASCII fast
  path slices bytes only because byte==char there; non-ASCII falls
  back to str slicing with per-gram UTF-8 encode;
* :func:`py_tokens` == ``filter(split(trim(col), '\\s+'), t -> t != '')``
  under Java regex semantics (``\\s`` is ASCII-only): for ASCII text
  ``str.split()``'s whitespace set is exactly Java's ``\\s``; non-ASCII
  text splits on an ``re.ASCII`` pattern so Unicode spaces stay inside
  tokens on both engines.

These run on executors inside ``mapInPandas`` generators — import cost
is per-worker-process, not per-row.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np

_WS_ASCII = re.compile(r"\s+", re.ASCII)


def md5_60(b: bytes) -> int:
    """int64 of the first 15 hex digits of md5(b) — identical to
    ``functions.hashing.md5_int64`` (top 60 bits of the digest)."""
    return int.from_bytes(hashlib.md5(b).digest()[:8], "big") >> 4


def gram_hashes(t: str | None, k: int) -> np.ndarray:
    """md5_60 over every character ``k``-gram of ``t`` (empty for
    NULL/short strings) — the Python replay of
    ``transform(char_ngrams(col, k), md5_int64)``."""
    if t is None:
        return np.empty(0, np.int64)
    n = len(t) - (k - 1)
    if n <= 0:
        return np.empty(0, np.int64)
    md5 = hashlib.md5
    fb = int.from_bytes
    if t.isascii():  # byte slicing == char slicing, one encode
        b = t.encode()
        return np.fromiter(
            (fb(md5(b[i:i + k]).digest()[:8], "big") >> 4
             for i in range(n)), np.int64, count=n)
    return np.fromiter(
        (fb(md5(t[i:i + k].encode("utf-8")).digest()[:8], "big") >> 4
         for i in range(n)), np.int64, count=n)


def py_tokens(t: str | None) -> list[str]:
    """Whitespace tokens, empties removed — the Python replay of the
    engine's ``tokens()`` column (Java ``\\s+`` split semantics)."""
    if t is None:
        return []
    if t.isascii():
        return t.split()
    return [x for x in _WS_ASCII.split(t) if x]
