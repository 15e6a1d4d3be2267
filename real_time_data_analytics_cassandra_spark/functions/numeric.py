"""Exact-decimal aggregate helpers.

Why: floating-point SUM is order-dependent; a 32-thread Spark shuffle
and single-threaded DuckDB will sum doubles in different orders, and
at sf0.1 (~600k rows) the wobble (~1e-4 absolute on billions) cannot
be rounded away reliably.  Casting inputs to DECIMAL makes the
aggregation exact and therefore order-insensitive — both engines
produce the *identical* value, which the driver's value-hash compare
requires.  The final cast back to DOUBLE keeps result schemas simple.

Precision choices keep every intermediate within DECIMAL(38,_) in
both Spark and DuckDB so neither engine's precision-loss rules kick
in (Spark mult width is p1+p2+1, DuckDB p1+p2; overflow would trigger
Spark's precision-loss truncation or a DuckDB error): money/quantity
DECIMAL(12,2), fractions DECIMAL(9,4); the money*(frac*frac) chain
peaks at width 34/scale 10 in Spark, 32/10 in DuckDB.  Double->decimal
casts cannot tie-break differently across engines: a decimal tie
requires the double to be exactly k/(2*10^scale), which is not a
dyadic rational — so no such double exists.

At 100 TB this is also the *right* plan shape: decimal sums are
JVM-side, codegen-friendly, and partial-aggregated map-side exactly
like double sums.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY = "decimal(12,2)"  # prices, quantities, account balances
FRAC = "decimal(9,4)"  # discounts, tax rates
ONE = "decimal(5,4)"  # literal 1 in (1 - discount) style expressions


def money(c: Column | str) -> Column:
    return F.col(c).cast(MONEY) if isinstance(c, str) else c.cast(MONEY)


def frac(c: Column | str) -> Column:
    return F.col(c).cast(FRAC) if isinstance(c, str) else c.cast(FRAC)


def dsum(c: Column, alias: str) -> Column:
    """Exact decimal SUM of an (already decimal) expression, as double.

    The sum is rescaled to DECIMAL(15,2) before the double cast: with
    the unscaled value < 2^53 both engines' decimal->double conversion
    is a single correctly-rounded IEEE division, so the doubles are
    bit-identical.  (A direct cast of a scale-10 decimal differs by
    1 ulp between DuckDB's int128/10^s double arithmetic and Java's
    correctly-rounded BigDecimal.doubleValue.)  The rescale uses an
    explicit round() (half-up in both engines) because DuckDB's
    decimal->decimal CAST *truncates* while Spark's rounds.
    """
    return F.round(F.sum(c), 2).cast("decimal(15,2)").cast("double").alias(alias)


def dsum_over(c: Column, w, alias: str) -> Column:
    """Windowed form of dsum: exact decimal running SUM over a window
    frame, rescaled and cast to double identically (order-insensitive
    within each frame, so Spark and DuckDB agree bit-for-bit)."""
    return F.round(F.sum(c).over(w), 2).cast("decimal(15,2)").cast("double").alias(alias)


def davg_over(c: Column, w, alias: str, scale: int = 6) -> Column:
    """Windowed form of davg: deterministic per-frame average (exact
    decimal sum / frame count), same rescale discipline as dsum."""
    return F.round(
        F.round(F.sum(c).over(w), 4).cast("decimal(15,4)").cast("double")
        / F.count(F.lit(1)).over(w),
        scale,
    ).alias(alias)


def davg(c: Column, alias: str, scale: int = 6) -> Column:
    """Deterministic AVG: exact decimal SUM rescaled to DECIMAL(15,4)
    (see dsum), cast to double, divided by count, rounded.  Both
    engines divide identical doubles by identical longs."""
    return F.round(
        F.round(F.sum(c), 4).cast("decimal(15,4)").cast("double") / F.count(F.lit(1)),
        scale,
    ).alias(alias)
