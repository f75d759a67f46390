"""The reference's map-side join expression language, re-expressed.

Reference: ``mapred.join.expr`` strings parsed by a shift-reduce parser
(M/join/Parser.java:64,466; CompositeInputFormat.java:48,138-170; ops doc
M/join/package.html:59-74):

    inner(tbl(...,"a"), tbl(...,"b"))      — equi-join, all sources present
    outer(a, b)                            — full outer
    override(a, b, c)                      — rightmost non-null wins per key
    expressions nest arbitrarily: outer(inner(a,b), override(b,c))

Here ``tbl(name)`` references a named DataFrame; composition produces one
Catalyst plan, so the reference's "zero-shuffle over identically
partitioned sorted sources" property is recovered by bucketing all sources
on the key (Catalyst then plans shuffle-free sort-merge joins) — the
declarative equivalent of CompositeInputFormat's physical precondition.

Semantics note (TupleWritable vs relational): the reference's inner/outer
emit per-source value slots; relationally that is the key plus each
source's value columns side by side, which is what these produce. Each
source must expose the key columns plus value columns; same-named value
columns are suffixed by source position (_0, _1, ...) exactly once at
leaf level so nesting stays unambiguous.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hadoop_gpu_spark.operators.joins import override_join

_TOKEN_RE = re.compile(r"\s*([a-zA-Z_][a-zA-Z0-9_]*|\(|\)|,)")


@dataclass
class _Node:
    op: str  # 'inner' | 'outer' | 'override' | 'tbl'
    args: list


def parse_join_expr(expr: str) -> _Node:
    """Recursive-descent parse of the expression grammar
    (op '(' expr (',' expr)* ')' | identifier)."""
    pos = 0

    def peek():
        m = _TOKEN_RE.match(expr, pos)
        return m.group(1) if m else None

    def take():
        nonlocal pos
        m = _TOKEN_RE.match(expr, pos)
        if not m:
            raise ValueError(f"parse error at {expr[pos:]!r}")
        pos = m.end()
        return m.group(1)

    def parse() -> _Node:
        tok = take()
        if tok in ("(", ")", ","):
            raise ValueError(f"unexpected {tok!r} in {expr!r}")
        if peek() == "(":
            take()
            if tok not in ("inner", "outer", "override"):
                raise ValueError(f"unknown op {tok!r}")
            args = [parse()]
            while peek() == ",":
                take()
                args.append(parse())
            if take() != ")":
                raise ValueError("expected ')'")
            return _Node(tok, args)
        return _Node("tbl", [tok])

    node = parse()
    if pos != len(expr.strip()) and expr[pos:].strip():
        raise ValueError(f"trailing input {expr[pos:]!r}")
    return node


def compose_join(expr: str, sources: dict[str, DataFrame], on: list[str] | str) -> DataFrame:
    """Evaluate a join expression over named sources.

    inner/outer become n-way equi-joins on ``on``; override keeps the
    rightmost non-null value columns per key (joins.override_join).
    """
    keys = [on] if isinstance(on, str) else list(on)
    counter = [0]

    def leaf(name: str) -> DataFrame:
        df = sources[name]
        i = counter[0]
        counter[0] += 1
        renames = {c: f"{c}_{i}" for c in df.columns if c not in keys}
        out = df
        for old, new in renames.items():
            out = out.withColumnRenamed(old, new)
        return out

    def ev(node: _Node) -> DataFrame:
        if node.op == "tbl":
            return leaf(node.args[0])
        children = [ev(a) for a in node.args]
        if node.op == "inner":
            return reduce(lambda a, b: a.join(b, on=keys, how="inner"), children)
        if node.op == "outer":
            return reduce(lambda a, b: a.join(b, on=keys, how="full_outer"), children)
        if node.op == "override":
            # override semantics need aligned value columns: strip the
            # per-leaf suffixes to a common 'val' layout per child.
            aligned = []
            for ch in children:
                vals = [c for c in ch.columns if c not in keys]
                sel = [F.col(k) for k in keys] + [
                    F.col(c).alias(re.sub(r"_\d+$", "", c)) for c in vals
                ]
                aligned.append(ch.select(*sel))
            return override_join(aligned, on=keys)
        raise AssertionError(node.op)

    return ev(parse_join_expr(expr))
