"""Rank metrics: reciprocal rank and MRR@k.

Reference analog: ``SearchEvaluator`` — inner-merge search results with query
samples on query_id, per-row 1-based rank of the positive doc in the ranked
list, reciprocal rank (0 when absent), global mean
(/root/reference/dense_retriever/transforms/ann_index.py:122-137,152-156).
Implemented as native column expressions (array_position + when) — no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def results_as_ranked_lists(results: DataFrame, id_to_str: bool = True) -> DataFrame:
    """(query_id, search_results ARRAY) from flat (query_id, doc_id, score, rank).

    Mirrors the reference's ANNSearchRes shape
    (/root/reference/dense_retriever/data_model.py:12-15): list ordered by
    descending score. Ordering is enforced by sorting collected (rank, doc_id)
    structs — never rely on collect_list order (it is partition-order dependent).
    """
    doc = F.format_string("D%d", F.col("doc_id")) if id_to_str else F.col("doc_id")
    return (
        results.select("query_id", F.struct("rank", doc.alias("doc")).alias("rd"))
        .groupBy("query_id")
        .agg(
            F.transform(
                F.sort_array(F.collect_list("rd")), lambda x: x["doc"]
            ).alias("search_results")
        )
    )


def reciprocal_rank(
    ranked_lists: DataFrame,
    qrels: DataFrame,
    positive_col: str = "positive_doc_id",
    k: int | None = None,
) -> DataFrame:
    """(query_id, reciprocal_rank) — RR = 1/position, 0.0 if not found.

    Exact twin of _calc_reciprocal_rank
    (/root/reference/dense_retriever/transforms/ann_index.py:122-129), as
    array_position + when instead of a row-wise apply. qrels side is small →
    broadcast. ``k`` cuts the list to its first k entries first — the
    reference reports MRR@{k} with k inferred from the returned list length
    (ann_index.py:153-156); here the cutoff is explicit so a top-100 result
    set can still score MRR@10.
    """
    joined = ranked_lists.join(F.broadcast(qrels), "query_id")
    lst = (
        F.slice(F.col("search_results"), 1, k)
        if k is not None
        else F.col("search_results")
    )
    pos = F.array_position(lst, F.col(positive_col))
    return joined.select(
        "query_id",
        F.when(pos > 0, F.lit(1.0) / pos.cast("double"))
        .otherwise(F.lit(0.0))
        .alias("reciprocal_rank"),
    )


def mrr(rr: DataFrame) -> DataFrame:
    """Global mean of reciprocal ranks — MRR@k
    (/root/reference/dense_retriever/transforms/ann_index.py:154)."""
    return rr.agg(F.avg("reciprocal_rank").alias("mrr"))


def ndcg_recall(
    results: DataFrame,
    qrels: DataFrame,
    k: int,
    query_col: str = "query_id",
) -> DataFrame:
    """Graded ranking metrics per query: nDCG@k and recall@k.

    Beyond-reference surface (the reference evaluates MRR only,
    /root/reference/dense_retriever/transforms/ann_index.py:122-156); nDCG
    and recall are the standard companions for multi-positive / graded
    judgments.

    ``results``: (query_col, doc_id, rank) — 1-based ranks, one ranked list
    per query (a ``search``/``search_fields`` output works as-is).
    ``qrels``: (query_col, doc_id, rel) with rel > 0 for every judged-
    relevant doc (graded; binary judgments just use rel=1).

    Definitions (standard exponential-gain form):
      DCG@k    = Σ_{i≤k} (2^rel_i − 1) / log2(i + 1) over the RANKED list
      IDCG@k   = the same sum over the query's judgments sorted by
                 (rel DESC, doc_id ASC), cut at k
      nDCG@k   = DCG/IDCG
      recall@k = |relevant ∩ top-k| / |relevant|

    Every step is a join or aggregation on the query key — no UDF, no
    driver state. The QRELS side drives the output: a judged query whose
    results missed every judgment still appears with metrics 0.0 (a broken
    search cannot silently drop its worst queries from the average), while
    a query with NO rel>0 judgments is omitted entirely — both metrics are
    undefined there (IDCG and the recall denominator are 0; trec_eval
    drops such queries the same way).
    """
    gain = lambda rel: F.pow(F.lit(2.0), rel.cast("double")) - F.lit(1.0)  # noqa: E731

    topk = results.filter(F.col("rank") <= k).select(
        query_col, "doc_id", "rank"
    )
    judged = qrels.select(
        query_col, "doc_id", F.col("rel").cast("double").alias("rel")
    ).filter(F.col("rel") > 0)

    hit = topk.join(judged, [query_col, "doc_id"])
    dcg = hit.groupBy(query_col).agg(
        F.sum(
            gain(F.col("rel"))
            / F.log2(F.col("rank").cast("double") + F.lit(1.0))
        ).alias("dcg"),
        F.count("*").cast("double").alias("hits"),
    )

    w = Window.partitionBy(query_col).orderBy(
        F.desc("rel"), F.asc("doc_id")
    )
    ideal = (
        judged.withColumn("irank", F.row_number().over(w))
        .filter(F.col("irank") <= k)
        .groupBy(query_col)
        .agg(
            F.sum(
                gain(F.col("rel"))
                / F.log2(F.col("irank").cast("double") + F.lit(1.0))
            ).alias("idcg")
        )
    )
    nrel = judged.groupBy(query_col).agg(
        F.count("*").cast("double").alias("n_rel")
    )

    return (
        nrel.join(ideal, query_col)
        .join(dcg, query_col, "left")
        .select(
            query_col,
            (F.coalesce(F.col("dcg"), F.lit(0.0)) / F.col("idcg")).alias(
                "ndcg"
            ),
            (F.coalesce(F.col("hits"), F.lit(0.0)) / F.col("n_rel")).alias(
                "recall"
            ),
        )
    )
