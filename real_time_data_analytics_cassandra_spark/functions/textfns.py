"""Text tokenization / normalization column helpers.

All pure column expressions (no UDFs): tokenization, word n-gram
shingling, and normalization stay inside whole-stage codegen, which is
what makes the dedup/text-analysis operators viable at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(c: Column | str) -> Column:
    """Whitespace tokens. The corpus is single-space separated."""
    return F.split(c, " ")


def norm_text(c: Column | str) -> Column:
    """Canonical form for near-exact dedup: lowercase, collapse runs of
    whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(c), " +", " "))


def word_ngrams(tokens_col: str, n: int) -> Column:
    """Word n-gram shingles from an array<string> column, as
    array<string>.  Empty array when the doc has < n tokens (guards the
    sequence() start>stop pitfall where Spark would flip the step
    sign)."""
    parts = ", ".join(f"{tokens_col}[i+{j}]" for j in range(n))
    return F.expr(
        f"CASE WHEN size({tokens_col}) >= {n} THEN "
        f"transform(sequence(0, size({tokens_col}) - {n}), "
        f"i -> concat_ws(' ', {parts})) "
        f"ELSE array() END"
    )
