"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference ETL project ``rsnyderaustin/ETL-excel-to-hyper-tableau``.

Architecture (SURVEY.md §7): the reference's SQLite staging database becomes
Catalyst temp views, its pandas post-processing combinators become DataFrame
operators, and its row-wise sinks become Arrow-batch sinks.  The public API
mirrors the reference's three nouns — ``Query``, ``QueryBundle``, and
``QueryEngine`` (replacing the reference's ``QueryIterator``,
query_iterator.py:16-21) — with its documented quirks fixed.

Beyond reference parity the package adds the operators a large-scale
training-data pipeline needs: deduplication (exact / MinHash-LSH / SimHash /
n-gram Jaccard / embedding-cosine), similarity search, text analysis, and
multimodal-column plumbing, each designed for a multi-executor cluster even
though tests run on ``local[*]``.
"""

from .bundles import Query, QueryBundle
from .engine import QueryEngine
from .session import get_spark

__all__ = ["Query", "QueryBundle", "QueryEngine", "get_spark"]

__version__ = "0.1.0"
