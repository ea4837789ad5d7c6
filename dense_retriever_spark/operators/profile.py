"""Column profiling — the data-quality summary a large ingest pipeline runs
before anything else (the Deequ/TFDV family, reduced to exact,
cross-engine-verifiable statistics).

One row per profiled column (col_name — 'column' is a reserved word in the oracle engine): row count, null count, exact distinct count,
min/max, and exact interpolated quartiles. The wide table is UNPIVOTED
(``stack``) into (column, value) first, so the whole profile is ONE
aggregation shuffle regardless of how many columns are profiled — not one
job per column. All outputs are rounded to 6dp so JVM/libm last-ulp
interpolation differences cannot flip the DuckDB hash gate (q52).

Reference analog: none (the reference profiles nothing); part of the
task-brief pipeline-operator family. For sketch-based profiling at
cardinalities where exact distinct is too heavy, compose with
operators.sketches.kmv_distinct instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PROFILE_SCHEMA_COLS = [
    "col_name", "n", "n_null", "n_distinct",
    "min_value", "max_value", "p25", "p50", "p75",
]


def profile_numeric(
    df: DataFrame, cols: list[str], exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """Numeric profile of ``cols``:
    (col_name, n, n_null, n_distinct, min_value, max_value, p25, p50, p75).

    ``n`` counts ALL rows (including nulls); ``n_null`` the null rows;
    aggregates ignore nulls per SQL semantics.

    ``exact=True``: quartiles via Spark ``percentile`` — exact linear
    interpolation, == DuckDB ``quantile_cont`` (the q52 oracle mode). The
    exact aggregate BUFFERS every value of a group in executor memory, and
    here one group is one whole column — right for test/sample-scale
    profiling, an OOM at 10^11 rows. ``exact=False`` is the 100 TB mode:
    ``approx_percentile`` (mergeable bounded-memory sketch, rank error
    ≤ 1/``accuracy``) — not bit-reproducible cross-engine, hence pytest-only.
    """
    if not cols:
        raise ValueError("profile_numeric needs at least one column")
    # backtick-quoted identifiers: reserved words ('order') and special
    # characters in column names must profile, not parse-error
    pairs = ", ".join(
        "'{0}', CAST(`{1}` AS DOUBLE)".format(
            c.replace("\\", "\\\\").replace("'", "\\'"),
            c.replace("`", "``"),
        )
        for c in cols
    )
    stacked = df.selectExpr(
        f"stack({len(cols)}, {pairs}) AS (col_name, value)"
    )
    if exact:
        pct = "percentile(value, {q})"
    else:
        pct = f"approx_percentile(value, {{q}}, {accuracy})"
    r6 = lambda c: F.round(c, 6)  # noqa: E731
    return (
        stacked.groupBy("col_name")
        .agg(
            F.count("*").alias("n"),
            (F.count("*") - F.count("value")).alias("n_null"),
            F.countDistinct("value").alias("n_distinct"),
            r6(F.min("value")).alias("min_value"),
            r6(F.max("value")).alias("max_value"),
            r6(F.expr(pct.format(q=0.25)).cast("double")).alias("p25"),
            r6(F.expr(pct.format(q=0.5)).cast("double")).alias("p50"),
            r6(F.expr(pct.format(q=0.75)).cast("double")).alias("p75"),
        )
        .orderBy("col_name")
    )


def profile_sql(table: str, cols: list[str]) -> str:
    """The DuckDB twin of ``profile_numeric`` over ``table`` — same unpivot,
    same exact statistics, same 6dp rounding."""
    stacked = " UNION ALL ".join(
        'SELECT \'{0}\' AS col_name, CAST("{1}" AS DOUBLE) AS value '
        "FROM {2}".format(c.replace("'", "''"), c.replace('"', '""'), table)
        for c in cols
    )
    return f"""
SELECT col_name,
       count(*) AS n,
       count(*) - count(value) AS n_null,
       count(DISTINCT value) AS n_distinct,
       round(min(value), 6) AS min_value,
       round(max(value), 6) AS max_value,
       round(quantile_cont(value, 0.25), 6) AS p25,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.75), 6) AS p75
FROM ({stacked})
GROUP BY col_name
ORDER BY col_name
"""
