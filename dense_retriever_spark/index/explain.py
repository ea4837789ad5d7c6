"""Score explanation: the per-term BM25 breakdown behind a search result.

The Lucene ``explain`` API analog — the tool a relevance engineer reaches
for when a ranking looks wrong: for each (query, doc) pair, every matching
term's tf, dl, df, idf, and its exact score contribution, summing to the
``search`` score (same formula, same statistics; the sum over a doc's rows
reproduces the scorer's result to float accumulation order).

Fully relational: the term-pruned shard scan (the same scan ``search``
runs) decodes only the query terms' postings, explodes them to (term,
doc_id, tf, dl) rows filtered to the requested docs INSIDE the Arrow
batch (never materializing full postings as rows), joins the global
(term, df) relation, and computes idf/contribution as column expressions
— restatable in ANSI SQL for the oracle. Cost is bounded by the query
terms' posting sizes, same as a search; with ``results`` given, the
explode emits only the requested pairs' rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dense_retriever_spark.index.build import IndexPaths
from dense_retriever_spark.index.codec import decode_postings
from dense_retriever_spark.index.search import (
    _term_pruned,
    global_term_stats,
    load_stats,
)

EXPLAIN_SCHEMA = (
    "query_id long, doc_id long, term string, tf long, dl long, "
    "df long, idf double, contribution double"
)


def explain_scores(
    spark: SparkSession,
    index_dir: str,
    queries_df: DataFrame,
    results: DataFrame | None = None,
) -> DataFrame:
    """(query_id, doc_id, term, tf, dl, df, idf, contribution) — one row
    per matching (query term, doc). ``results`` (a search output or any
    (query_id, doc_id) relation) restricts the explanation to those pairs
    — the normal flow: explain the top-k you just retrieved. Without it,
    every matching doc is explained (the ``score_matches`` cost class).

    sum(contribution) grouped by (query_id, doc_id) equals the ``search``
    score for that pair (same BM25 statistics and formula; float
    accumulation order may differ in the last ulp — round before
    comparing, the gate convention)."""
    from dense_retriever_spark.operators.bm25 import query_terms

    stats = load_stats(index_dir)
    n_docs, avgdl = float(stats["n_docs"]), float(stats["avgdl"])
    k1, b = float(stats["k1"]), float(stats["b"])
    paths = IndexPaths(index_dir)

    qt = query_terms(queries_df).collect()
    qmap: dict[str, list[int]] = {}
    for r in qt:
        qmap.setdefault(r["term"], []).append(int(r["query_id"]))
    terms = sorted(qmap)
    if not terms:
        return spark.createDataFrame([], EXPLAIN_SCHEMA)

    pair_filter = None
    if results is not None:
        wanted = results.select(
            F.col("query_id").cast("long"), F.col("doc_id").cast("long")
        ).distinct().collect()
        pair_filter = {(int(r["query_id"]), int(r["doc_id"])) for r in wanted}
        if not pair_filter:
            return spark.createDataFrame([], EXPLAIN_SCHEMA)

    bc = spark.sparkContext.broadcast((qmap, pair_filter))
    shard_rows = _term_pruned(
        spark.read.parquet(paths.shards), terms, spark
    ).select("term", "postings")

    flat_schema = "query_id long, doc_id long, term string, tf long, dl long"

    def _explode(batches):
        qm, pairs = bc.value
        for pdf in batches:
            out_q, out_d, out_t, out_tf, out_dl = [], [], [], [], []
            for r in pdf.itertuples(index=False):
                qids = qm.get(r.term)
                if not qids:
                    continue
                ids, tfs, dls = decode_postings(r.postings)
                for qid in qids:
                    if pairs is not None:
                        keep = np.fromiter(
                            ((qid, int(d)) in pairs for d in ids),
                            dtype=bool, count=ids.size,
                        )
                        if not keep.any():
                            continue
                        di, ti, li = ids[keep], tfs[keep], dls[keep]
                    else:
                        di, ti, li = ids, tfs, dls
                    out_q.append(np.full(di.size, qid, dtype=np.int64))
                    out_d.append(di)
                    out_t.extend([r.term] * di.size)
                    out_tf.append(ti)
                    out_dl.append(li)
            if out_q:
                yield pd.DataFrame({
                    "query_id": np.concatenate(out_q),
                    "doc_id": np.concatenate(out_d),
                    "term": out_t,
                    "tf": np.concatenate(out_tf),
                    "dl": np.concatenate(out_dl),
                })

    flat = shard_rows.mapInPandas(_explode, schema=flat_schema)
    dfs = global_term_stats(spark, index_dir, stats).select(
        "term", F.col("df").cast("long").alias("df")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.lit(n_docs) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    tf_d = F.col("tf").cast("double")
    contrib = (idf * tf_d * F.lit(k1 + 1.0)) / (
        tf_d
        + F.lit(k1)
        * (F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / F.lit(avgdl))
    )
    return flat.join(dfs, "term").select(
        F.col("query_id").cast("long"),
        F.col("doc_id").cast("long"),
        F.col("term").cast("string"),
        F.col("tf").cast("long"),
        F.col("dl").cast("long"),
        F.col("df").cast("long"),
        idf.cast("double").alias("idf"),
        contrib.cast("double").alias("contribution"),
    )


__all__ = ["explain_scores", "EXPLAIN_SCHEMA"]
