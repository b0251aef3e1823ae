"""Physical-plan assertions — the 100 TB posture checks.

These helpers read ``df._jdf``'s formatted explain output and assert
the properties every operator in this engine is designed around:

- ``uses_take_ordered``: top-k compiles to TakeOrderedAndProject
  (per-partition top-k + driver merge — the reference's scatter/merge,
  client.go:1497-1576 — and NOT a global sort-exchange);
- ``pushed_filters``: predicates reach the parquet scan
  (PushedFilters), so a selective filter prunes IO, not just rows;
- ``read_schema_only``: column pruning reached the scan — a 2-column
  projection must not read 16 columns;
- ``count_exchanges``: shuffle budget — an operator claiming to be
  narrow must show 0 exchanges, a single-agg plan at most its one
  shuffle;
- ``uses_broadcast``: small-side joins must broadcast, never
  sort-merge.

Used by tests/test_plans.py; also handy interactively while tuning.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def simple_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def uses_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in formatted_plan(df)


def _strip_cached_subtrees(plan: str) -> str:
    """Drop the child plans of InMemoryRelation nodes: they describe how
    a cache was BUILT (paid once at fit/persist time), not what a query
    over the cache executes. Exchange counts over query plans must not
    charge the query for the index-build shuffle."""
    out: list[str] = []
    skip_deeper_than: int | None = None
    for line in plan.splitlines():
        indent = len(line) - len(line.lstrip(" :+-*"))
        if skip_deeper_than is not None:
            if indent > skip_deeper_than:
                continue
            skip_deeper_than = None
        out.append(line)
        if "InMemoryRelation" in line:
            skip_deeper_than = indent
    return "\n".join(out)


def count_exchanges(df: DataFrame) -> int:
    # count only shuffle exchanges; broadcast exchanges are cheap fan-out.
    # simple plan inlines "Exchange hashpartitioning(...)"; formatted mode
    # hides arguments in a detail section.
    return len(
        re.findall(
            r"\bExchange (?:hashpartitioning|rangepartitioning|SinglePartition)",
            _strip_cached_subtrees(simple_plan(df)),
        )
    )


def uses_broadcast(df: DataFrame) -> bool:
    return "BroadcastExchange" in formatted_plan(df) or "BroadcastNestedLoopJoin" in formatted_plan(df) or "BroadcastHashJoin" in formatted_plan(df)


def pushed_filters(df: DataFrame) -> list[str]:
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", formatted_plan(df)):
        if m.group(1).strip():
            out.extend(s.strip() for s in m.group(1).split(","))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    return re.findall(r"ReadSchema: (struct<[^\n]*)", formatted_plan(df))


def whole_stage_codegen_spans(df: DataFrame) -> int:
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", formatted_plan(df))))
