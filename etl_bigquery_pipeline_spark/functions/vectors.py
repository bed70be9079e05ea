"""Vector column functions (similarity-search tier, SURVEY.md §7.3).

Embeddings are plain array<float> columns; all math happens JVM-side with
higher-order functions (zip_with + aggregate), accumulating in double. A
sequential left-to-right double accumulation is deterministic — the same
bits on any partitioning and in external engines — which is what lets the
cosine top-k be oracle-checked exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential double-precision dot product of two float arrays."""
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column | str) -> Column:
    """L2 norm, double precision."""
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; null-safe via try_divide (0-norm -> null)."""
    return F.try_divide(dot(a, b), norm(a) * norm(b))
