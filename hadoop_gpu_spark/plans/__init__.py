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
    """Number of distinct WholeStageCodegen spans (more fused = fewer
    breaks). Formatted explain labels codegen'd operators with
    ``[codegen id : N]`` rather than a WholeStageCodegen node, so count
    distinct ids."""
    import re

    ids = re.findall(r"codegen id : (\d+)", formatted_plan(df))
    return len(set(ids))


def shuffled_columns(df: DataFrame, keyed_only: bool = True) -> set[str]:
    """Attribute names crossing Exchanges (shuffle or broadcast).

    Parsed from the formatted plan: each ``(N) Exchange`` /
    ``(N) BroadcastExchange`` node is followed by ``Input [n]: [...]`` /
    ``Arguments:`` lines listing exactly what moves and how. With
    ``keyed_only`` (default), RoundRobinPartitioning exchanges are
    ignored: those are explicit compute-spreading repartitions
    (utils.ensure_min_partitions) that only fire when the scan has fewer
    partitions than cores — a no-op on real multi-file data — while
    hash/range/broadcast exchanges are the data-proportional movements
    that decide 100 TB viability. The dedup invariant — document text
    never crosses a keyed shuffle, only hashes/ids do — is assertable as
    ``'text' not in shuffled_columns(q)``.
    """
    import re

    plan = formatted_plan(df)
    lines = plan.splitlines()
    out: set[str] = set()
    parsed_any = False
    for i, line in enumerate(lines):
        if re.match(r"^\(\d+\) (Exchange|BroadcastExchange)\b", line.strip()):
            attrs: set[str] = set()
            keyed = "BroadcastExchange" in line
            # Scan the node's whole detail block — everything up to the
            # next "(N) <node>" header — not a fixed 3-line window, so a
            # formatted-plan layout change cannot silently drop the Input
            # line and make callers' assertions pass vacuously.
            for nxt in lines[i + 1 :]:
                nxt = nxt.strip()
                if re.match(r"^\(\d+\) ", nxt):
                    break
                if nxt.startswith("Input ["):
                    raw = nxt.split(":", 1)[1].strip().strip("[]")
                    attrs = {a.strip().split("#")[0] for a in raw.split(",") if a.strip()}
                elif nxt.startswith("Arguments:"):
                    if "RoundRobinPartitioning" not in nxt:
                        keyed = True
            if attrs:
                parsed_any = True
            if attrs and (keyed or not keyed_only):
                out |= attrs
    # Non-vacuous guard: a plan that contains exchange nodes but yields
    # zero parsed attribute sets means the parser lost track of the plan
    # format — fail loudly instead of letting "never shuffles X" tests
    # pass on an empty set. (ReusedExchange is fine: its source Exchange
    # node is always present in the same plan and parses above.)
    if not parsed_any and re.search(r"^\(\d+\) (Exchange|BroadcastExchange)\b", plan, re.M):
        raise RuntimeError(
            "shuffled_columns: plan contains Exchange nodes but none parsed — "
            "formatted-plan layout changed; update the parser:\n" + plan[:2000]
        )
    return out


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
