"""Plan inspection helpers — scale-assurance tooling.

The reference has no optimizer (SURVEY.md §4.1); Catalyst provides one.
These helpers make its decisions assertable in tests: filter/projection
pushdown reached the scan, a join really broadcast, no accidental
cartesian products — the things that decide whether a plan survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters section of the scan nodes (empty string if none)."""
    plan = formatted_plan(df)
    return "\n".join(l.strip() for l in plan.splitlines() if "PushedFilters" in l)


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def has_cartesian(df: DataFrame) -> bool:
    p = formatted_plan(df)
    return "CartesianProduct" in p or "BroadcastNestedLoopJoin" in p


def wholestage_codegen_ids(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans (more fused = fewer breaks)."""
    return formatted_plan(df).count("WholeStageCodegen")


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from parquet (ReadSchema) — column-pruning check."""
    plan = formatted_plan(df)
    out: list[str] = []
    for line in plan.splitlines():
        line = line.strip()
        if line.startswith("ReadSchema:"):
            inner = line.split("struct<", 1)[-1].rstrip(">")
            out.extend(f.split(":")[0] for f in inner.split(",") if f)
    return out
