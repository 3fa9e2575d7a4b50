"""Physical-plan audit helpers (the ".explain and iterate" discipline as code).

A 100 TB plan is wrong if a filter doesn't reach the parquet scan, a small
dim isn't broadcast, or a projection drags unused columns through a shuffle.
These helpers parse `explain("formatted")` output so tests can pin those
properties — plan regressions then fail CI instead of surfacing as a 10x
slowdown on the cluster.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # same path .explain() uses
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every parquet scan in the plan."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        entry = m.group(1).strip()
        if entry:
            out.extend(p.strip() for p in entry.split(","))
    return out


def read_schema_columns(df: DataFrame) -> set[str]:
    """Columns actually read from parquet (column-pruning check)."""
    cols: set[str] = set()
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", formatted_plan(df)):
        for field in m.group(1).split(","):
            name = field.split(":")[0].strip()
            if name:
                cols.add(name)
    return cols


def count_occurrences(df: DataFrame, node: str) -> int:
    return len(re.findall(node, formatted_plan(df)))


def count_shuffles(df: DataFrame) -> int:
    """Exchange nodes == shuffles (AQE may later coalesce but not remove).
    Formatted mode prints nodes as '(n) Exchange' with the partitioning on an
    Arguments: line; BroadcastExchange is NOT a shuffle and is excluded."""
    plan = formatted_plan(df)
    return len(re.findall(r"\(\d+\) Exchange\b", plan))


def has_broadcast_join(df: DataFrame) -> bool:
    return count_occurrences(df, r"BroadcastHashJoin|BroadcastNestedLoopJoin") > 0


def codegen_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "codegen"
    )


def whole_stage_codegen_spans(df: DataFrame) -> int:
    """Codegen subtree count ('explain codegen' mode — the formatted mode
    under AQE doesn't render codegen annotations pre-execution)."""
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", codegen_plan(df))
    return int(m.group(1)) if m else 0
