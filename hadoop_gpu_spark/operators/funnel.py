"""Ordered-funnel analysis: per entity, the first completion time of each
step where step i must happen STRICTLY AFTER step i-1 (view -> click ->
purchase), plus how many steps were completed.

Beyond-ref analytics operator (same family as the sessionization /
as-of-join temporal group): the reference has no funnel analog, but any
events product built on it would run this daily.

Scale design — ONE shuffle for any number of steps: the naive
formulation is k iterated join+aggregate passes (step i filters on step
i-1's time), i.e. k shuffles of the full event set. Here events are
hash-partitioned by entity once (`repartition`), each partition then
resolves its complete entity groups VECTORIZED in pandas (per-step
`groupby(...).min()` merges across all entities in the batch at once —
no per-entity Python), and only (entity, k timestamps) rows leave the
kernel. State per partition is its entity count, not its event count.
Times compare at native microsecond precision (exact integers in both
engines); outputs expose epoch MICROS as BIGINT, never raw timestamps
(sub-second timestamp hashing is engine-specific — repo rule).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_IDENT_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*\Z")


def funnel(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    n_partitions: int | None = None,
) -> DataFrame:
    """Return one row per entity that performed step 0 at least once:
    (user_col, t_<step> epoch-us BIGINT or null per step,
    steps_completed BIGINT).

    Step i's time is min(ts where type == steps[i] and ts > t_{i-1});
    strict ordering, so a same-timestamp pair does not complete.

    The entity column keeps its input type (the output schema is derived
    from ``df.schema``, so string entity ids work); step names must be
    identifier-safe (``[A-Za-z_][A-Za-z0-9_]*``) because each becomes the
    DDL column ``t_<step>`` — validated up front, not at executor time.

    Memory contract / partition-sizing knob: each partition's full event
    set is concatenated into ONE pandas frame before resolving (the
    partition, not the Arrow batch, is the completeness unit), so
    per-task memory is the partition's event rows. ``n_partitions`` is
    the knob the caller must scale with the input — size it so
    input_rows / n_partitions fits the executor (e.g. total event bytes
    / ~256 MB); at 100 TB that means thousands of partitions, NOT the
    session's default shuffle.partitions. When None, the keyed
    repartition uses spark.sql.shuffle.partitions (falling back to
    defaultParallelism when that conf is non-numeric, e.g. "auto" on
    managed deployments), floored at the cluster's defaultParallelism
    (the ensure_min_partitions discipline — a single-row-group test
    file must not serialize the whole operator through one task).
    Note the sizing trade: an EXPLICIT partition count here opts this
    exchange out of AQE partition coalescing (a column-only repartition
    would let AQE shrink post-shuffle partitions, but could also leave
    the operator at a default count its memory contract can't afford —
    the explicit count IS the contract).
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    bad = [s for s in steps if not _IDENT_RE.match(s)]
    if bad:
        raise ValueError(
            f"step names must be identifier-safe ([A-Za-z_][A-Za-z0-9_]*) to "
            f"form t_<step> output columns; got {bad!r}"
        )
    for c in (user_col, ts_col, type_col):
        if not _IDENT_RE.match(c):
            raise ValueError(f"column name {c!r} is not identifier-safe")
    user_type = df.schema[user_col].dataType.simpleString()
    out_cols = [f"t_{s}" for s in steps]
    schema = ", ".join(
        [f"{user_col} {user_type}"]
        + [f"{c} long" for c in out_cols]
        + ["steps_completed long"]
    )

    def resolve(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        # A partition arrives as MULTIPLE Arrow batches and an entity's
        # events can span them — concatenate first (the partition, not the
        # batch, is the completeness unit; partition sizing bounds memory,
        # same contract as applyInPandas).
        parts = [p for p in batches if len(p)]
        if not parts:
            return
        pdf = parts[0] if len(parts) == 1 else pd.concat(parts, ignore_index=True)
        # first-step times for every entity in this partition
        base = pdf[pdf[type_col] == steps[0]]
        cur = base.groupby(user_col, sort=False)[ts_col].min().rename(out_cols[0])
        res = cur.to_frame()
        for i, step in enumerate(steps[1:], start=1):
            # merge on COLUMNS, never right_index: with an empty left
            # frame (a partition holding zero step-i events — routine at
            # real partition counts) pandas names the merge result's
            # index after the right frame's index, and the groupby below
            # dies with "both an index level and a column label". Caught
            # when the n_partitions knob widened the test layouts.
            ev = pdf[pdf[type_col] == step].merge(
                res[[out_cols[i - 1]]].reset_index(),
                on=user_col,
                how="inner",
            )
            ev = ev[ev[ts_col] > ev[out_cols[i - 1]]]
            nxt = ev.groupby(user_col, sort=False)[ts_col].min().rename(out_cols[i])
            res = res.join(nxt, how="left")
        out = res.reset_index()
        completed = sum((out[c].notna()).astype(int) for c in out_cols)
        for c in out_cols:
            # datetime64[us] -> epoch micros as nullable Int64 (NaT-safe)
            arr = out[c].to_numpy(dtype="datetime64[us]")
            out[c] = pd.Series(arr.view("int64"), dtype="Int64").mask(np.isnat(arr))
        out["steps_completed"] = completed.astype("int64")
        yield out[[user_col, *out_cols, "steps_completed"]]

    # one hash shuffle on the entity key; groups are complete per partition
    ev = df.select(user_col, ts_col, type_col)
    if n_partitions is None:
        default_par = df.sparkSession.sparkContext.defaultParallelism
        try:
            conf_parts = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        except (TypeError, ValueError):  # e.g. "auto" on managed deployments
            conf_parts = default_par
        n_partitions = max(conf_parts, default_par)
    return ev.repartition(n_partitions, F.col(user_col)).mapInPandas(
        resolve, schema=schema
    )


def funnel_sql(table: str, user_col: str, ts_col: str, type_col: str, steps: list[str]) -> str:
    """DuckDB twin (oracle generator): the k-pass iterated-min
    formulation — semantically identical, deliberately naive (the oracle
    optimizes for auditability, the operator for shuffle count)."""
    assert steps
    ctes = [
        f"s0 AS (SELECT {user_col}, min({ts_col}) AS t0 FROM {table} "
        f"WHERE {type_col} = '{steps[0]}' GROUP BY {user_col})"
    ]
    for i, step in enumerate(steps[1:], start=1):
        ctes.append(
            f"s{i} AS (SELECT e.{user_col}, min(e.{ts_col}) AS t{i} "
            f"FROM {table} e JOIN s{i - 1} USING ({user_col}) "
            f"WHERE e.{type_col} = '{step}' AND e.{ts_col} > s{i - 1}.t{i - 1} "
            f"GROUP BY e.{user_col})"
        )
    sel_times = ", ".join(
        f"CAST(epoch_us(s{i}.t{i}) AS BIGINT) AS t_{s}" for i, s in enumerate(steps)
    )
    joins = " ".join(f"LEFT JOIN s{i} USING ({user_col})" for i in range(1, len(steps)))
    completed = " + ".join(
        f"CASE WHEN s{i}.t{i} IS NOT NULL THEN 1 ELSE 0 END" for i in range(len(steps))
    )
    return f"""
    WITH {", ".join(ctes)}
    SELECT {user_col}, {sel_times},
           CAST({completed} AS BIGINT) AS steps_completed
    FROM s0 {joins}
    """
