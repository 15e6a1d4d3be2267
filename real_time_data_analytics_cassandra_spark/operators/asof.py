"""As-of join (point-in-time lookup).

Not in the reference (its data model answers only pre-materialized
questions); this is the standard event-attribution operator a
training/analytics pipeline needs: for each left row, the most recent
right row with the same key at-or-before the left timestamp.

Spark-first implementation: the *union trick* — tag both sides, union,
one ranking window per key ordered by time carries the last-seen right
payload forward (``last(..., ignorenulls=True)`` over an unbounded
preceding frame).  One shuffle on the key, linear in rows, no per-key
loops and no range-join explosion — this is the 100 TB-safe shape.
Skewed keys fall under AQE skew handling like any other window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: tuple[str, ...] = (),
    suffix: str = "_asof",
) -> DataFrame:
    """For every left row: latest right row with right.ts <= left.ts.

    Right rows sort before left rows at equal timestamps (inclusive
    match).  Output = left columns + ``<right_ts><suffix>`` +
    ``<payload><suffix>`` columns (NULL when no prior right row).

    The right timestamp and payload travel as ONE struct carried by a
    single ``last(..., ignorenulls=True)`` — per-column carries could
    stitch fields from different right rows when a payload column is
    NULL in one row but not another.  The struct itself is the final
    ordering key, so right rows tied on timestamp resolve
    deterministically (greatest (ts, payload...) tuple wins) in any
    engine and any partitioning.

    Contract: because the payload struct participates in the sort,
    every ``right_payload`` column must be an ORDERABLE type — an
    atomic, struct, or array column.  A map-typed payload fails
    analysis (Spark cannot sort maps); wrap it, e.g. pass
    ``map_entries(m)`` (sorted arrays of entries are orderable) or
    ``to_json(m)``, or project the specific map keys you need into
    plain columns before the join.
    """
    r_cols = (right_ts, *right_payload)
    r_struct_type = right.select(
        F.struct(*[F.col(c) for c in r_cols]).alias("__r")
    ).schema["__r"].dataType
    l_full = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(0).alias("__is_right"),
        F.struct(*left.columns).alias("__l"),
        F.lit(None).cast(r_struct_type).alias("__r"),
    )
    r_full = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(1).alias("__is_right"),
        F.lit(None).cast(l_full.schema["__l"].dataType).alias("__l"),
        F.struct(*[F.col(c) for c in r_cols]).alias("__r"),
    )
    unioned = l_full.unionByName(r_full)
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t"), F.desc("__is_right"), F.col("__r"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "__l",
        "__is_right",
        F.last("__r", ignorenulls=True).over(w).alias("__r_carried"),
    )
    out = carried.filter(F.col("__is_right") == 0).select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        *[
            F.col("__r_carried").getField(c).alias(f"{c}{suffix}")
            for c in r_cols
        ],
    )
    return out


def asof_join_cogrouped(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: tuple[str, ...] = (),
    suffix: str = "_asof",
) -> DataFrame:
    """Same contract as :func:`asof_join`, expressed through Spark's
    OTHER keyed-alignment primitive: ``groupBy(key).cogroup(...)
    .applyInPandas`` — each key's two groups arrive together in one
    Arrow task and a vectorized ``searchsorted`` does the at-or-before
    lookup.

    This exists (a) to cover the cogrouped-UDF API surface (SURVEY.md
    §2.8) and (b) as the shape to reach for when per-key logic
    outgrows what window expressions can say (model scoring over the
    aligned pair, per-key state machines).  For the plain as-of
    semantics the union-trick window IS the production path — it stays
    whole-stage JVM; this is the Arrow-batched equivalent, proven
    BIT-IDENTICAL to it in tests/test_properties.py.

    Limitations vs the window form: one shuffle per side instead of
    one total, and ``right_payload`` columns must be ATOMIC (tie-break
    sorting happens in pandas; struct/array payloads are only
    orderable JVM-side).
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import StructField, StructType

    r_cols = (right_ts, *right_payload)
    r_schema = right.select(*r_cols).schema
    out_schema = StructType(
        list(left.schema.fields)
        + [StructField(f"{f.name}{suffix}", f.dataType) for f in r_schema.fields]
    )
    left_cols = list(left.columns)
    # ALIAS the right side to fresh internal names: when both sides
    # derive from the same scan (self-cogroup), like-named attributes
    # share expression ids and Spark's cogroup binding silently drops
    # the right copy — a renamed Alias mints new ids and new names
    internal = [f"__r{i}" for i in range(len(r_cols))]
    r_int = right.select(
        F.col(key).alias("__rk"),
        *[F.col(c).alias(n) for c, n in zip(r_cols, internal)],
    )

    def fn(l_pdf: pd.DataFrame, r_pdf: pd.DataFrame) -> pd.DataFrame:
        out = l_pdf[left_cols].copy()
        if len(r_pdf):
            # ascending (ts, payload...) sort => the LAST right row at
            # or before each left ts is the greatest (ts, payload)
            # tuple — the same tie-break the window form's struct
            # ordering yields
            r_sorted = r_pdf.sort_values(
                by=internal, kind="mergesort"
            ).reset_index(drop=True)
            idx = (
                np.searchsorted(
                    r_sorted[internal[0]].to_numpy(),
                    l_pdf[left_ts].to_numpy(),
                    side="right",
                )
                - 1
            )
            for c, n in zip(r_cols, internal):
                vals = r_sorted[n].to_numpy()
                data = [vals[i] if i >= 0 else None for i in idx]
                if data:
                    # pandas infers the right dtype (datetime64 with
                    # NaT, numeric with NaN-as-null) from the values
                    out[f"{c}{suffix}"] = data
                else:
                    # EMPTY left group (right-only key): an empty list
                    # would infer float64, which Arrow refuses to cast
                    # to timestamp — empty object is castable to any
                    out[f"{c}{suffix}"] = pd.Series(
                        [], index=out.index, dtype="object"
                    )
        else:
            for c in r_cols:
                out[f"{c}{suffix}"] = (
                    None
                    if len(out)
                    else pd.Series([], index=out.index, dtype="object")
                )
        return out

    return (
        left.groupBy(key)
        .cogroup(r_int.groupBy("__rk"))
        .applyInPandas(fn, out_schema)
    )
