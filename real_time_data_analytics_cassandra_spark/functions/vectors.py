"""Vector math over array<float> embedding columns.

Implemented as SQL higher-order functions (zip_with + aggregate), not
Python UDFs: the fold runs JVM-side per row with a deterministic
left-to-right summation order, which both keeps it fast (no Python
serialization in the hot path) and makes results bit-identical to the
DuckDB oracle's sequential list functions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_expr(a: str, b: str) -> Column:
    """Dot product of two array columns, computed in double."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def norm_expr(a: str) -> Column:
    return F.sqrt(dot_expr(a, a))


def cosine_expr(a: str, b: str) -> Column:
    """Cosine similarity; NULL when either vector has zero norm."""
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))
