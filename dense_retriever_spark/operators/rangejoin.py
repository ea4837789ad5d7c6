"""Range (point-in-interval) join — the second temporal/interval operator
Spark has no built-in for (the task brief's "as-of join, range join" pair;
see operators/asof.py for the other half).

A naive inequality join plans as BroadcastNestedLoopJoin — O(|P|·|I|) work
and a mandatory broadcast of one whole side. This implementation uses the
standard BINNING construction, which turns the inequality into an EQUI-join:

  point  → one bin:   floor(p / w)
  interval → the bins it covers: sequence(floor(lo/w), floor(hi/w))
  equi-join on (by..., bin)  →  exact BETWEEN filter

With ``bin_width`` chosen ≥ the typical interval length, each interval
explodes to O(1) bins, the join is a plain shuffle-hash join on
(keys, bin), and skew is bounded by how many intervals overlap one bin —
the same reasoning as the dedup banding joins. Candidate pairs that share a
bin but don't truly overlap are removed by the exact filter, so the result
is exact at any bin width (bin width only tunes cost).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    by: list[str] | None = None,
    bin_width: int | float = 1,
) -> DataFrame:
    """Inner join of ``points`` rows onto every ``intervals`` row whose
    [start_col, end_col] (inclusive both ends) contains the point, matching
    equality on ``by`` keys first. Column names of the two inputs must be
    disjoint apart from ``by`` (pre-alias otherwise). Join columns are
    NUMERIC (cast timestamps to epoch first — unix_micros — so bin math is
    exact integer arithmetic).

    Intervals with end < start are dropped (not errors): real event feeds
    contain them, and ANSI ``sequence`` would otherwise count DOWN and
    fabricate bins.
    """
    by = by or []
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    w = F.lit(bin_width)

    p = points.withColumn(
        "_rj_bin", F.floor(F.col(point_col).cast("double") / w).cast("long")
    )
    iv = intervals.filter(
        F.col(end_col) >= F.col(start_col)
    ).withColumn(
        "_rj_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col).cast("double") / w).cast("long"),
                F.floor(F.col(end_col).cast("double") / w).cast("long"),
            )
        ),
    )
    joined = p.join(iv, [*by, "_rj_bin"]).filter(
        F.col(point_col).between(F.col(start_col), F.col(end_col))
    )
    return joined.drop("_rj_bin")
