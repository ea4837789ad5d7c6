"""Similarity search over embedding columns (ARRAY<FLOAT>).

Reference analog: the FAISS exact inner-product top-n search
(/root/reference/dense_retriever/transforms/ann_index.py:88,95). Two paths:

- ``cosine_topk_bruteforce`` — the exact baseline: broadcast the (small) query
  vectors against the corpus, dot products as native ``F.aggregate``/
  ``F.zip_with`` column math (JVM-side), window top-k. At 100 TB this is the
  "Flat index" equivalent: one scan, no index.
- ``lsh_bucketed_topk`` — the scale path: sign-random-projection LSH buckets
  (hyperplanes derived deterministically from the first dims), candidates only
  within the query's bucket → the scan is restricted to matching buckets via a
  shuffle-free broadcast join on bucket id. Recall < 1 by construction; the
  bruteforce path is the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dense_retriever_spark.operators.topk import topk_per_group


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_expr(a, b):
    return F.round(
        _dot(a, b)
        / F.greatest(_norm(a) * _norm(b), F.lit(1e-12)),
        6,
    )


def cosine_topk_bruteforce(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_vec_id",
) -> DataFrame:
    """Exact cosine top-k: (query_vec_id, vec_id, cosine, rank).

    ``queries``: (query_vec_id, qvec). Cross join is |Q| × N with |Q| tiny and
    broadcast — each executor scans its corpus slice once per batch of queries.
    Self-matches (same id) are excluded.
    """
    q = F.broadcast(queries)
    joined = embeddings.alias("e").crossJoin(q.alias("q")).filter(
        F.col(f"q.{qid_col}") != F.col(f"e.{id_col}")
    )
    scored = joined.select(
        F.col(f"q.{qid_col}").alias("query_vec_id"),
        F.col(f"e.{id_col}").alias("vec_id"),
        cosine_expr(F.col("q.qvec"), F.col(f"e.{vec_col}")).alias("cosine"),
    )
    return topk_per_group(scored, "query_vec_id", "cosine", k, id_col="vec_id")


def srp_bucket_expr(vec_col, n_bits: int = 4):
    """Sign-random-projection bucket id from the first n_bits dimensions:
    bit i = (vec[i] > 0). Deterministic, SQL-reproducible; a production setup
    would use seeded random hyperplanes via a broadcast matrix."""
    bits = [
        F.when(F.element_at(vec_col, i + 1) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i in range(n_bits)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_bucketed_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_vec_id",
) -> DataFrame:
    """ANN top-k within the query's SRP bucket: (query_vec_id, vec_id, cosine,
    rank). Equi-join on bucket replaces the cross join — candidate set is
    ~N/2^n_bits per query."""
    e = embeddings.withColumn("bucket", srp_bucket_expr(F.col(vec_col), n_bits))
    q = F.broadcast(
        queries.withColumn("bucket", srp_bucket_expr(F.col("qvec"), n_bits))
    )
    joined = e.alias("e").join(q.alias("q"), "bucket").filter(
        F.col(qid_col) != F.col(id_col)
    )
    scored = joined.select(
        F.col(qid_col).alias("query_vec_id"),
        F.col(id_col).alias("vec_id"),
        cosine_expr(F.col("qvec"), F.col(vec_col)).alias("cosine"),
    )
    return topk_per_group(scored, "query_vec_id", "cosine", k, id_col="vec_id")
