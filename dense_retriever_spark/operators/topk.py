"""Per-group top-k via window ranking.

Reference analog: FAISS ``index.search(q, top_n)`` returns per-query top-n in
descending score order (/root/reference/dense_retriever/transforms/ann_index.py:95-98).
The reference has no tie-break (FAISS internal order); the rebuild defines the
explicit deterministic order ``(score DESC, doc_id ASC)`` everywhere
(SURVEY.md §7.4) so ranks are reproducible run-to-run and engine-vs-oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    group_col: str,
    score_col: str,
    k: int,
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """row_number over (partition by group order by score desc, id asc) <= k.

    Scale note: Spark executes rank-limit windows with a per-partition
    top-k ("WindowGroupLimit" pushdown in the physical plan), so each shuffle
    partition carries at most k rows per group into the final sort — this does
    NOT materialize full per-group sorts at 100 TB.
    """
    w = Window.partitionBy(group_col).orderBy(F.desc(score_col), F.asc(id_col))
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def global_topn_ranked(
    df: DataFrame,
    order: list[tuple[str, bool]],
    n: int,
    rank_col: str = "r",
) -> DataFrame:
    """Global top-N with a 1-based rank column, WITHOUT any partition-less
    window anywhere in the plan.

    orderBy().limit(n) plans TakeOrderedAndProject (per-partition top-N, then
    a single O(n) merge). The rank is then computed over the ≤ n surviving
    rows by a broadcast self-join count (rank = 1 + #rows strictly before) —
    n² ≤ 400 comparisons for n = 20, and the plan stays WindowExec-free so
    the scale linter (plans.global_window_violations) and the executor logs
    stay clean.

    ``order``: [(col, descending?), ...] — must be a TOTAL order (include a
    unique tie-break column) or ranks will collide.
    """
    sort_cols = [F.desc(c) if d else F.asc(c) for c, d in order]
    top = df.orderBy(*sort_cols).limit(n)
    t = top.alias("t")
    u = top.select(*[c for c, _ in order]).alias("u")

    def before(i: int):
        """u strictly before t on the i-prefix: equal on keys < i, then key i."""
        cond = F.lit(True)
        for c, _ in order[:i]:
            cond = cond & (F.col(f"u.{c}") == F.col(f"t.{c}"))
        c, desc = order[i]
        cmp = (
            F.col(f"u.{c}") > F.col(f"t.{c}")
            if desc
            else F.col(f"u.{c}") < F.col(f"t.{c}")
        )
        return cond & cmp

    strictly_before = before(0)
    for i in range(1, len(order)):
        strictly_before = strictly_before | before(i)
    first_key = order[0][0]
    counted = (
        t.join(F.broadcast(u), strictly_before, "left")
        .groupBy(*[F.col(f"t.{c}") for c in top.columns])
        .agg(
            (F.count(F.col(f"u.{first_key}")) + 1).cast("int").alias(rank_col)
        )
    )
    return counted.select(*top.columns, rank_col)
