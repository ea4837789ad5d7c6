"""Driver-contract queries, wave 3: the remaining reference operator analogs.

q26 — A3 softmax (pipeline_steps/training.py:13-16): numerically-stable
      exp(x - max)/sum within groups, as window expressions.
q27 — A2 mean pooling (models/bert_dot.py:19,67,96): element-wise mean of an
      embedding column, emitted as (label, pos, mean_val) scalar rows.
q28 — S12/M2 encoding-cache (utils/redis_utils.py:16-25,
      transforms/preprocessing.py:31-43): the reference's Redis KV lookup
      becomes a persisted terms table + equi-join — no external service.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dense_retriever_spark.contract import _docs, _read


def q26_softmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    x = (F.col("n_chars") / 100.0).alias("x")
    w = Window.partitionBy("lang")
    df = docs.select("doc_id", "lang", x)
    mx = F.max("x").over(w)
    ex = F.exp(F.col("x") - mx)
    denom = F.sum(ex).over(w)
    return df.select(
        "doc_id", "lang", F.round(ex / denom, 6).alias("softmax")
    )


Q26_SQL = """
WITH s AS (
  SELECT doc_id, lang, n_chars / 100.0 AS x,
         max(n_chars / 100.0) OVER (PARTITION BY lang) AS mx
  FROM documents
),
e AS (
  SELECT doc_id, lang, exp(x - mx) AS ex,
         sum(exp(x - mx)) OVER (PARTITION BY lang) AS denom
  FROM s
)
SELECT doc_id, lang, round(ex / denom, 6) AS softmax FROM e
"""


def q27_mean_pooling(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _read(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "label", F.posexplode("embedding").alias("pos0", "v")
    ).select("label", (F.col("pos0") + 1).alias("pos"), F.col("v").cast("double"))
    return exploded.groupBy("label", "pos").agg(
        F.round(F.avg("v"), 6).alias("mean_val")
    )


Q27_SQL = """
WITH e AS (
  SELECT label,
         unnest(CAST(embedding AS DOUBLE[])) AS v,
         unnest(range(1, len(embedding) + 1)) AS pos
  FROM embeddings
)
SELECT label, pos::INT AS pos, round(avg(v), 6) AS mean_val
FROM e GROUP BY label, pos
"""


def q28_cache_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dense_retriever_spark.functions.tokenizer import tokenize_text_expr

    docs = _docs(spark, sf_dir)
    # the "cache": a terms table computed once (in production: persisted /
    # checkpointed parquet — replaces the reference's Redis KV store)
    cache = docs.select(
        "doc_id", F.size(tokenize_text_expr("text")).alias("dl")
    )
    lookups = docs.filter(F.col("doc_id") % 7 == 0).select("doc_id", "lang")
    return lookups.join(cache, "doc_id").select("doc_id", "lang", "dl")


Q28_SQL = """
WITH cache AS (
  SELECT doc_id,
         len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         x -> x <> ''))::INT AS dl
  FROM documents
)
SELECT d.doc_id, d.lang, cache.dl
FROM documents d JOIN cache USING (doc_id)
WHERE d.doc_id % 7 = 0
"""


QUERIES3: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q26_softmax": q26_softmax,
    "q27_mean_pooling": q27_mean_pooling,
    "q28_cache_join": q28_cache_join,
}

ORACLES3: dict[str, str] = {
    "q26_softmax": Q26_SQL,
    "q27_mean_pooling": Q27_SQL,
    "q28_cache_join": Q28_SQL,
}
