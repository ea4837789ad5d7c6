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
