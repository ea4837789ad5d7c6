"""Exact (index-free) Okapi BM25 top-k — the rank-identity oracle.

Reference analog: exact brute-force FAISS Flat inner-product search
(/root/reference/dense_retriever/transforms/ann_index.py:87-98) — the reference
is also index-free/exact, so this operator IS the semantic twin of the
reference's search, with the dense dot-product replaced by BM25 (north_rule).

Pipeline (one lazy DAG, two shuffles):
  tokenized docs --explode--> (doc_id, term) --groupBy--> tf
  query terms (tiny) --broadcast join--> per-(query,doc,term) contributions
  --groupBy(query,doc) + sorted-term-order float64 sum--> score
  --window top-k (score DESC, doc_id ASC)--> (query_id, doc_id, score, rank)

Determinism: contributions are summed in sorted-term order via
sort_array(collect_list(struct(term, contrib))) + aggregate, so float64
addition order is fixed; the WAND engine (index/wand.py) accumulates in the
same order — scores are bit-identical, ranks identical (SURVEY.md §7.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dense_retriever_spark import BM25_B, BM25_K1
from dense_retriever_spark.functions.tokenizer import (
    tokenize_code_expr,
    tokenize_code_pandas,
)
from dense_retriever_spark.operators.topk import topk_per_group


def tokenize_corpus(corpus: DataFrame, content_col: str = "content") -> DataFrame:
    """(doc_id, terms, dl) from an ingested corpus. dl = total token count.

    Uses the Arrow pandas-UDF tokenizer (measured 5x faster than the
    equivalent Catalyst expression — see functions/tokenizer.py)."""
    return corpus.select(
        "doc_id",
        tokenize_code_pandas(content_col).alias("terms"),
    ).withColumn("dl", F.size("terms"))


def doc_term_freqs(tokenized: DataFrame) -> DataFrame:
    """(doc_id, term, tf, dl) — the exploded posting relation."""
    return (
        tokenized.select("doc_id", "dl", F.explode("terms").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"), F.first("dl").alias("dl"))
    )


def corpus_stats(tokenized: DataFrame) -> tuple[int, float]:
    """(N, avgdl) — two scalars, broadcast to every task as literals.

    Reference analog: FAISS index carries N vectors implicitly
    (/root/reference/dense_retriever/transforms/ann_index.py:87-91); BM25 needs
    (N, avgdl, df) per north_star "broadcast term statistics".
    """
    row = tokenized.agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    return int(row["n"]), float(row["avgdl"] or 0.0)


def idf_expr(df_col, n_docs: int):
    """Lucene-style nonnegative idf: ln(1 + (N - df + .5)/(df + .5)), float64."""
    return F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - df_col + F.lit(0.5)) / (df_col + F.lit(0.5))
    )


def bm25_contrib_expr(tf_col, df_col, dl_col, n_docs: int, avgdl: float,
                      k1: float = BM25_K1, b: float = BM25_B):
    """Per-(doc, term) BM25 contribution, all float64 native column math."""
    tf = tf_col.cast("double")
    dl = dl_col.cast("double")
    denom = tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl / F.lit(avgdl))
    return idf_expr(df_col.cast("double"), n_docs) * tf * F.lit(k1 + 1.0) / denom


def query_terms(queries: DataFrame, tokenizer=tokenize_code_expr) -> DataFrame:
    """(query_id, term) — DISTINCT terms per query (standard BM25 treats the
    query as a set; duplicate query terms score once)."""
    return (
        queries.select("query_id", F.explode(tokenizer("query")).alias("term"))
        .distinct()
    )


def bm25_exact_topk(
    tokenized: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
    tokenizer=tokenize_code_expr,
    stats: tuple[int, float] | None = None,
) -> DataFrame:
    """Exact BM25 top-k for every query. Output: (query_id, doc_id, score, rank).

    The query-term relation is tiny (|Q| * ~5 rows) → broadcast hash join
    against the exploded corpus; Catalyst prunes every untouched column down
    to the parquet scan.
    """
    n_docs, avgdl = stats if stats is not None else corpus_stats(tokenized)
    tf = doc_term_freqs(tokenized)
    qt = query_terms(queries, tokenizer)
    # df per query term only (not the whole vocabulary): semi-restrict the tf
    # relation to query terms first, then count — one row per (doc, term) in tf
    # means count(*) == document frequency. term_df is ≤ |query terms| rows →
    # broadcast back.
    distinct_terms = qt.select("term").distinct()
    term_df = (
        tf.join(F.broadcast(distinct_terms), "term")
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )
    matched = tf.join(F.broadcast(qt), "term").join(F.broadcast(term_df), "term")
    contrib = matched.withColumn(
        "contrib", bm25_contrib_expr(F.col("tf"), F.col("df"), F.col("dl"),
                                     n_docs, avgdl, k1, b)
    )
    scored = (
        contrib.groupBy("query_id", "doc_id")
        .agg(
            F.aggregate(
                F.sort_array(F.collect_list(F.struct("term", "contrib"))),
                F.lit(0.0).cast("double"),
                lambda acc, x: acc + x["contrib"],
            ).alias("score")
        )
    )
    out = topk_per_group(scored, "query_id", "score", k)
    return out.select(
        F.col("query_id").cast("long"),
        F.col("doc_id").cast("long"),
        F.col("score").cast("double"),
        F.col("rank").cast("int"),
    )
