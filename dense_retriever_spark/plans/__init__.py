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


def codegen_stage_count(df: DataFrame) -> int:
    """Count distinct whole-stage-codegen spans in the FINAL plan.

    Codegen'd operators print as ``*(id) Op`` in the simple plan string.
    Under AQE the final plan exists only after THIS df executes (a derived
    count() plan would not finalize it), so collect() first."""
    import re

    df.collect()
    ids = set(re.findall(r"\*\((\d+)\)", physical_plan(df)))
    return len(ids)
