"""Physical-plan audit helpers — the tooling behind the engine's
"is this the plan you'd want at 100 TB?" discipline.

Used by tests/test_plans.py to ASSERT (not eyeball) that:
* filters reach the parquet scan (``PushedFilters``),
* only referenced columns are read (``ReadSchema``),
* fixed-size dims join as broadcast-hash, not shuffle,
* hot expression paths stay inside WholeStageCodegen,
* top-N queries use TakeOrderedAndProject, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def simple_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True when the parquet scan's PushedFilters mentions ``fragment``."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and fragment in line:
            return True
    return False


def _split_top_level(body: str) -> list[str]:
    """Split a struct body on TOP-LEVEL commas only: 'a:decimal(18,2),
    b:map<string,int>' has commas inside (...)/<...> that a bare split
    would turn into phantom columns, silently corrupting the pruning
    audit."""
    parts, depth, cur = [], 0, []
    for ch in body:
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return parts


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column sets actually read by each scan (column-pruning audit)."""
    out = []
    for line in formatted_plan(df).splitlines():
        if "ReadSchema" in line:
            cols = line.split("struct<", 1)[-1]
            out.append(
                [c.split(":")[0]
                 for c in _split_top_level(cols.rstrip(">")) if c]
            )
    return out


def count_broadcast_joins(df: DataFrame) -> int:
    """Number of BroadcastHashJoin NODES. Counted from the '(n) NodeName'
    details headers only — a bare substring count sees each node twice
    (tree line + details header), so one broadcast join counted as 2
    would let a '>= 2 joins broadcast' audit pass after a regression
    dropped one of them to a shuffle join."""
    import re

    return len(re.findall(r"\(\d+\) BroadcastHashJoin\b", formatted_plan(df)))


def count_shuffle_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange nodes (broadcast exchanges excluded).
    The formatted plan lists each node as '(n) Exchange' with its
    partitioning on a separate Arguments line."""
    import re

    plan = formatted_plan(df)
    return len(re.findall(r"\(\d+\) Exchange\b", plan))


def uses_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in formatted_plan(df)


def has_whole_stage_codegen(df: DataFrame) -> bool:
    """Check the EXECUTED plan: under AQE the codegen stages only appear in
    the final plan, so force materialization of THIS plan first (``count``
    would execute a different, wrapped plan and leave this one unfinalized).
    Test-sized inputs only."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # '*(n) ' prefixes mark WholeStageCodegen stages in the simple plan string
    return "WholeStageCodegen" in plan or "*(" in plan


def codegen_covers(df: DataFrame, node: str) -> bool:
    """True when a node whose name contains ``node`` sits INSIDE a
    WholeStageCodegen stage — the ``'*(n) NodeName'`` prefix in the
    executed simple plan. Stronger than :func:`has_whole_stage_codegen`
    (r8 review: ANY codegen stage anywhere made that check pass, so the
    hot aggregate dropping to CodegenFallback went undetected as long
    as the scan still codegens). Test-sized inputs only (collects)."""
    import re

    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return re.search(
        r"\*\(\d+\)\s+\w*" + re.escape(node), plan
    ) is not None
