"""Driver-contract queries, wave 8 (round 7, session 4): multi-field
weighted search under the hash gate.

q68/q69 gate ``search_fields`` (index/fields.py) on the broadcast and
distributed planes against ONE from-scratch DuckDB oracle. The fields are
derived deterministically from the single-text documents table (title =
first 8 tokens, body = the rest — every sf's docs carry >= 10 tokens, so
both fields are non-empty for every doc); each field is indexed separately
and the oracle recomputes BOTH fields' BM25 from their own collection
statistics, combines 2.0·title + 1.0·body in that fixed order, rounds to
4dp, and ranks — the engine over-fetches, rounds, re-ranks (the q38
round-before-rank rule).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dense_retriever_spark import BM25_B, BM25_K1
from dense_retriever_spark.contract import (
    _QUERY_VALUES_SQL,
    _TOK_SQL,
    BM25_QUERIES,
    _docs,
)

_N_HEAD = 8
_W_TITLE = 2.0
_W_BODY = 1.0
_K = 10
_OVERFETCH = 50

_FLD_IDX_CACHE: dict[str, tuple[str, str]] = {}


def _field_index_dirs(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Build (once per sf_dir per process) the title/body field indexes."""
    import atexit
    import shutil
    import tempfile

    from dense_retriever_spark.index.build import build_index
    from dense_retriever_spark.index.fields import derive_field

    if sf_dir in _FLD_IDX_CACHE:
        return _FLD_IDX_CACHE[sf_dir]
    root = tempfile.mkdtemp(prefix="q68_fields_")
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    from pyspark.sql import functions as F

    base = _docs(spark, sf_dir)
    for name, head in (("title", True), ("body", False)):
        fld = derive_field(base, "text", _N_HEAD, head=head)
        # the q38 input shape (contract4._docs_as_index_input) with the
        # derived field text as content, doc_id preserved
        inp = fld.select(
            "doc_id",
            F.lit("docs").alias("repo"),
            F.concat(F.lit("p"), F.col("doc_id")).alias("path"),
            F.concat(F.lit("c"), F.col("doc_id")).alias("commit"),
            F.col("lang"),
            F.col("text").alias("content"),
            F.sha2(F.col("text"), 256).alias("content_sha"),
        )
        build_index(inp, f"{root}/{name}", docs_per_shard=128, term_buckets=2)
    _FLD_IDX_CACHE[sf_dir] = (root + "/title", root + "/body")
    return _FLD_IDX_CACHE[sf_dir]


def _q68(spark: SparkSession, sf_dir: str, query_mode: str) -> DataFrame:
    from dense_retriever_spark.contract5 import _rounded_topk
    from dense_retriever_spark.index.fields import search_fields

    title, body = _field_index_dirs(spark, sf_dir)
    queries = spark.createDataFrame(
        BM25_QUERIES, "query_id long, query string"
    )
    raw = search_fields(
        spark,
        [("title", title, _W_TITLE), ("body", body, _W_BODY)],
        queries,
        k=_OVERFETCH,
        query_mode=query_mode,
    )
    return _rounded_topk(raw, _K)


def q68_multifield_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _q68(spark, sf_dir, "broadcast")


def q69_multifield_search_distributed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The distributed plane under the SAME oracle as q68 — plane
    interchangeability, exactly like q38/q49, q58/q59, q61/q62."""
    return _q68(spark, sf_dir, "distributed")


def _multifield_sql() -> str:
    return f"""
WITH q(query_id, query) AS (VALUES {_QUERY_VALUES_SQL}),
tok AS (
  SELECT doc_id, {_TOK_SQL.format(c='text')} AS terms FROM documents
),
fld AS (
  SELECT doc_id, 'title' AS field, terms[1:{_N_HEAD}] AS terms FROM tok
  UNION ALL
  SELECT doc_id, 'body', terms[{_N_HEAD + 1}:len(terms)] FROM tok
),
dd  AS (
  SELECT field, doc_id, terms, len(terms) AS dl FROM fld
  WHERE len(terms) > 0
),
st  AS (
  SELECT field, count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dd
  GROUP BY field
),
tf  AS (
  SELECT field, doc_id, term, count(*)::DOUBLE AS tf, min(dl)::DOUBLE AS dl
  FROM (SELECT field, doc_id, unnest(terms) AS term, dl FROM dd)
  GROUP BY field, doc_id, term
),
qt  AS (
  SELECT DISTINCT query_id, unnest({_TOK_SQL.format(c='query')}) AS term
  FROM q
),
dfr AS (
  SELECT field, term, count(*)::DOUBLE AS df FROM tf
  WHERE term IN (SELECT term FROM qt) GROUP BY field, term
),
con AS (
  SELECT tf.field, qt.query_id, tf.doc_id,
         ((ln(1 + (st.n - dfr.df + 0.5)/(dfr.df + 0.5)) * tf.tf) * {BM25_K1 + 1.0})
         / (tf.tf + {BM25_K1}*({1.0 - BM25_B} + ({BM25_B}*tf.dl)/st.avgdl)) AS c
  FROM tf
  JOIN qt USING (term)
  JOIN dfr ON dfr.field = tf.field AND dfr.term = tf.term
  JOIN st  ON st.field = tf.field
),
scf AS (
  SELECT field, query_id, doc_id, sum(c) AS s
  FROM con GROUP BY field, query_id, doc_id
),
comb AS (
  SELECT query_id, doc_id,
         round({_W_TITLE} * coalesce(max(CASE WHEN field = 'title' THEN s END), 0)
             + {_W_BODY} * coalesce(max(CASE WHEN field = 'body' THEN s END), 0),
               4) AS score
  FROM scf GROUP BY query_id, doc_id
),
rk AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS rank
  FROM comb
)
SELECT query_id::BIGINT AS query_id, doc_id::BIGINT AS doc_id,
       score::DOUBLE AS score, rank::INT AS rank
FROM rk WHERE rank <= {_K}
"""


QUERIES9: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q68_multifield_search": q68_multifield_search,
    "q69_multifield_search_distributed": q69_multifield_search_distributed,
}


def _oracles9() -> dict[str, str]:
    msql = _multifield_sql()
    return {
        "q68_multifield_search": msql,
        "q69_multifield_search_distributed": msql,
    }


ORACLES9: dict[str, str] = _oracles9()
