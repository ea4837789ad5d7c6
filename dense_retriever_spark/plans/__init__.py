"""Plan inspection helpers — the engine's scale-review tooling.

The reference has no plan layer (execution is eager pandas, SURVEY.md §3);
Catalyst's logical/physical plan is this engine's IR. These helpers let tests
and reviews assert plan properties (pushdown reached the scan, join strategy,
codegen coverage) instead of eyeballing `.explain()` output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def scan_pushdown_info(df: DataFrame) -> dict:
    """Extract PushedFilters / ReadSchema from the first parquet scan in the
    formatted plan — the 'did pruning reach the scan' check."""
    txt = formatted_plan(df)
    out = {"pushed_filters": None, "read_schema": None}
    for line in txt.splitlines():
        s = line.strip()
        if s.startswith("PushedFilters:") and out["pushed_filters"] is None:
            out["pushed_filters"] = s[len("PushedFilters:"):].strip()
        if s.startswith("ReadSchema:") and out["read_schema"] is None:
            out["read_schema"] = s[len("ReadSchema:"):].strip()
    return out


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df)


def _top_level_groups(s: str) -> list[str]:
    """Top-level [...] group contents in a plan-node argument string."""
    depth = 0
    groups: list[str] = []
    buf: list[str] = []
    for ch in s:
        if ch == "[":
            if depth == 0:
                buf = []
            else:
                buf.append(ch)
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append("".join(buf))
            else:
                buf.append(ch)
        elif depth > 0:
            buf.append(ch)
    return groups


def global_window_violations(df: DataFrame) -> list[str]:
    """Partition-less Window nodes NOT bounded by a limit below them.

    A `Window` with no partitionBy moves ALL rows to one reducer — the
    classic scale-killer. It is only acceptable when a GlobalLimit /
    TakeOrderedAndProject below it has already shrunk the input to O(k) rows
    (e.g. ranking the final top-N). Window prints its arg groups as
    ``[exprs], [partitionSpec], [orderSpec]``; partitionSpec/orderSpec are
    omitted when empty, and orderSpec entries carry ASC/DESC markers — a
    partition-less ordered window is therefore exactly 2 groups with ordering
    markers in the last one (vs a partitioned unordered window's plain cols).
    """
    lines = physical_plan(df).splitlines()
    viol = []
    for i, line in enumerate(lines):
        if "Window [" not in line:
            continue
        groups = _top_level_groups(line.split("Window ", 1)[1])
        if len(groups) >= 3:
            continue  # partitioned + ordered
        if len(groups) == 2 and not (
            " ASC" in groups[1] or " DESC" in groups[1]
        ):
            continue  # partitioned, unordered (whole-partition frame)
        below = "\n".join(lines[i + 1 :])
        if not any(
            tag in below
            for tag in ("GlobalLimit", "TakeOrderedAndProject", "CollectLimit")
        ):
            viol.append(line.strip())
    return viol


def codegen_stage_count(df: DataFrame) -> int:
    """Count distinct whole-stage-codegen spans in the FINAL plan.

    Codegen'd operators print as ``*(id) Op`` in the simple plan string.
    Under AQE the final plan exists only after THIS df executes (a derived
    count() plan would not finalize it), so collect() first."""
    import re

    df.collect()
    ids = set(re.findall(r"\*\((\d+)\)", physical_plan(df)))
    return len(ids)
