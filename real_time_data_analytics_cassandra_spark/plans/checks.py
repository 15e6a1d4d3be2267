"""Physical-plan assertions.

The 100 TB posture is only real if the plans stay right: filters
pushed to the parquet scan, small dims broadcast, expressions inside
whole-stage codegen.  Tests assert these invariants so a refactor
that silently degrades a plan (e.g. a broadcast falling back to a
shuffle join) fails CI rather than a future cluster bill.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries from every parquet scan in the plan."""
    text = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        if m.group(1).strip():
            out.extend(s.strip() for s in m.group(1).split(","))
    return out


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df) or "BroadcastNestedLoopJoin" in explain_str(df)


def wholestage_codegen_count(df: DataFrame) -> int:
    return explain_str(df).count("WholeStageCodegen")
