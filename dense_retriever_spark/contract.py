"""Driver-contract queries: Spark implementations + DuckDB oracle SQL.

Every operator from SURVEY.md §2 that is SQL-expressible appears here twice —
once as a Spark DataFrame pipeline (via the library operators) and once as
ANSI SQL for DuckDB — with IDENTICAL column names and rounding, so the
driver's row-count/schema/value-hash comparison passes.

Conventions:
- float outputs are rounded (4-6 dp) BEFORE ranking/sorting so JVM-vs-DuckDB
  last-ulp differences cannot flip a rank or a hash;
- every computed column is aliased the same on both sides;
- deterministic tie-breaks everywhere.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dense_retriever_spark import BM25_B, BM25_K1
from dense_retriever_spark.functions.tokenizer import tokenize_text_expr

# ---------------------------------------------------------------------------
# shared fixtures
# ---------------------------------------------------------------------------

BM25_QUERIES: list[tuple[int, str]] = [
    (0, "query plan window"),
    (1, "customer data stream"),
    (2, "join filter group"),
    (3, "slow table scan merge"),
    (4, "spark row"),
]

_QUERY_VALUES_SQL = ", ".join(f"({i}, '{q}')" for i, q in BM25_QUERIES)

_TOK_SQL = "list_filter(regexp_split_to_array(lower({c}), '[^a-z0-9]+'), x -> x <> '')"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# q01 — flagship: BM25 top-10 over documents (T1 exact path)
# ---------------------------------------------------------------------------

def q01_bm25_topk(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    docs = _docs(spark, sf_dir)
    tokenized = (
        docs.select("doc_id", tokenize_text_expr("text").alias("terms"))
        .withColumn("dl", F.size("terms"))
        .filter(F.col("dl") > 0)
    )
    queries = spark.createDataFrame(BM25_QUERIES, "query_id long, query string")
    from dense_retriever_spark.operators.bm25 import (
        bm25_contrib_expr,
        corpus_stats,
        doc_term_freqs,
        query_terms,
    )

    n_docs, avgdl = corpus_stats(tokenized)
    tf = doc_term_freqs(tokenized)
    qt = query_terms(queries, tokenize_text_expr)
    term_df = (
        tf.join(F.broadcast(qt.select("term").distinct()), "term")
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )
    contrib = (
        tf.join(F.broadcast(qt), "term")
        .join(F.broadcast(term_df), "term")
        .withColumn(
            "c",
            bm25_contrib_expr(F.col("tf"), F.col("df"), F.col("dl"), n_docs, avgdl),
        )
    )
    scored = contrib.groupBy("query_id", "doc_id").agg(
        F.round(F.sum("c"), 4).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("query_id").cast("long").alias("query_id"),
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("score").cast("double").alias("score"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


Q01_SQL = f"""
WITH q(query_id, query) AS (VALUES {_QUERY_VALUES_SQL}),
tok AS (
  SELECT doc_id, {_TOK_SQL.format(c='text')} AS terms FROM documents
),
dd  AS (SELECT doc_id, terms, len(terms) AS dl FROM tok WHERE len(terms) > 0),
st  AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dd),
tf  AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf, min(dl)::DOUBLE AS dl
  FROM (SELECT doc_id, unnest(terms) AS term, dl FROM dd)
  GROUP BY doc_id, term
),
qt  AS (
  SELECT DISTINCT query_id, unnest({_TOK_SQL.format(c='query')}) AS term FROM q
),
dfr AS (
  SELECT term, count(*)::DOUBLE AS df FROM tf
  WHERE term IN (SELECT term FROM qt) GROUP BY term
),
con AS (
  SELECT qt.query_id, tf.doc_id,
         ((ln(1 + (st.n - dfr.df + 0.5)/(dfr.df + 0.5)) * tf.tf) * {BM25_K1 + 1.0})
         / (tf.tf + {BM25_K1}*({1.0 - BM25_B} + ({BM25_B}*tf.dl)/st.avgdl)) AS c
  FROM tf JOIN qt USING (term) JOIN dfr USING (term) CROSS JOIN st
),
sc AS (
  SELECT query_id, doc_id, round(sum(c), 4) AS score
  FROM con GROUP BY query_id, doc_id
),
rk AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC)
           AS rank
  FROM sc
)
SELECT query_id::BIGINT AS query_id, doc_id::BIGINT AS doc_id,
       score::DOUBLE AS score, rank::INT AS rank
FROM rk WHERE rank <= 10
"""


# ---------------------------------------------------------------------------
# q02 — J1: queries ⋈ qrels → query samples
# ---------------------------------------------------------------------------

def q02_query_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    queries = docs.filter(F.col("doc_id") % 5 == 0).select(
        F.col("doc_id").alias("qid"), F.col("text")
    )
    qrels = docs.filter(F.col("doc_id") % 5 == 0).select(
        F.col("doc_id").alias("qid"),
        F.concat(F.lit("D"), ((F.col("doc_id") * 7) % 500)).alias("doc_id"),
    )
    from dense_retriever_spark.operators.negatives import construct_query_samples

    return construct_query_samples(queries, qrels)


Q02_SQL = """
WITH q AS (SELECT doc_id AS qid, text FROM documents WHERE doc_id % 5 = 0),
r AS (SELECT doc_id AS qid, 'D' || CAST((doc_id * 7) % 500 AS VARCHAR) AS doc_id
      FROM documents WHERE doc_id % 5 = 0)
SELECT q.text AS query, q.qid AS query_id, r.doc_id AS positive_doc_id
FROM q JOIN r USING (qid)
"""


# ---------------------------------------------------------------------------
# q03 — J2+P5+R2: hard-negative mining (deterministic modulo pick)
# ---------------------------------------------------------------------------

def q03_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    samples = docs.filter(F.col("doc_id") % 5 == 0).select(
        F.col("doc_id").alias("query_id"),
        F.col("text").alias("query"),
        F.concat(F.lit("D"), ((F.col("doc_id") * 7) % 500)).alias("positive_doc_id"),
    )
    results = samples.select(
        "query_id",
        F.transform(
            F.sequence(F.lit(1), F.lit(5)),
            lambda i: F.concat(F.lit("D"), (F.col("query_id") + i * 13) % 500),
        ).alias("search_results"),
    )
    joined = samples.join(results, "query_id")
    cands = F.array_remove(F.col("search_results"), F.col("positive_doc_id"))
    pick = F.element_at(cands, (F.pmod(F.col("query_id"), F.size(cands)) + 1).cast("int"))
    return (
        joined.filter(F.size(cands) > 0)
        .select("query_id", "positive_doc_id", pick.alias("hard_negative_id"))
    )


Q03_SQL = """
WITH s AS (
  SELECT doc_id AS query_id, text AS query,
         'D' || CAST((doc_id * 7) % 500 AS VARCHAR) AS positive_doc_id
  FROM documents WHERE doc_id % 5 = 0
),
r AS (
  SELECT query_id,
         list_transform(range(1, 6),
                        i -> 'D' || CAST((query_id + i * 13) % 500 AS VARCHAR))
           AS search_results
  FROM s
),
j AS (
  SELECT s.query_id, s.positive_doc_id,
         list_filter(r.search_results, x -> x <> s.positive_doc_id) AS cands
  FROM s JOIN r USING (query_id)
)
SELECT query_id, positive_doc_id,
       cands[CAST(query_id % len(cands) AS INT) + 1] AS hard_negative_id
FROM j WHERE len(cands) > 0
"""


# ---------------------------------------------------------------------------
# q04/q05 — T2 reciprocal rank + A1 MRR
# ---------------------------------------------------------------------------

def _ranked_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    w = Window.partitionBy("lang").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    top = (
        docs.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= 10)
        .groupBy("lang")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("r", "doc_id"))),
                lambda s: F.concat(F.lit("D"), s["doc_id"]),
            ).alias("search_results")
        )
    )
    pos = docs.groupBy("lang").agg(
        F.concat(F.lit("D"), F.min("doc_id")).alias("positive_doc_id")
    )
    return top.join(pos, "lang")


def q04_reciprocal_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    j = _ranked_lists(spark, sf_dir)
    p = F.array_position(F.col("search_results"), F.col("positive_doc_id"))
    return j.select(
        "lang",
        F.when(p > 0, F.round(F.lit(1.0) / p.cast("double"), 6))
        .otherwise(F.lit(0.0))
        .alias("reciprocal_rank"),
    )


_Q04_BODY = """
WITH rk AS (
  SELECT lang, doc_id,
         row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id ASC) AS r
  FROM documents
),
top AS (
  SELECT lang, list_transform(array_agg(doc_id ORDER BY r), d -> 'D' || CAST(d AS VARCHAR))
           AS search_results
  FROM rk WHERE r <= 10 GROUP BY lang
),
pos AS (
  SELECT lang, 'D' || CAST(min(doc_id) AS VARCHAR) AS positive_doc_id
  FROM documents GROUP BY lang
),
rr AS (
  SELECT top.lang,
         CASE WHEN list_position(search_results, positive_doc_id) IS NOT NULL
                   AND list_position(search_results, positive_doc_id) > 0
              THEN round(1.0 / list_position(search_results, positive_doc_id), 6)
              ELSE 0.0 END AS reciprocal_rank
  FROM top JOIN pos USING (lang)
)
"""

Q04_SQL = _Q04_BODY + "SELECT lang, reciprocal_rank FROM rr"


def q05_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dense_retriever_spark.operators.rank_metrics import mrr

    rr = q04_reciprocal_rank(spark, sf_dir)
    return rr.agg(F.round(F.avg("reciprocal_rank"), 6).alias("mrr"))


Q05_SQL = _Q04_BODY + "SELECT round(avg(reciprocal_rank), 6) AS mrr FROM rr"


# ---------------------------------------------------------------------------
# q06 — F3/F4/F6: doc-id codec round trip
# ---------------------------------------------------------------------------

def q06_docid_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    enc = F.concat(F.lit("D"), F.col("doc_id"))
    dec = F.substring(enc, 2, 18).cast("bigint")
    return docs.select(
        "doc_id",
        enc.alias("doc_id_str"),
        dec.alias("decoded"),
        (dec == F.col("doc_id")).alias("roundtrip_ok"),
    )


Q06_SQL = """
SELECT doc_id,
       'D' || CAST(doc_id AS VARCHAR) AS doc_id_str,
       CAST(substr('D' || CAST(doc_id AS VARCHAR), 2, 18) AS BIGINT) AS decoded,
       CAST(substr('D' || CAST(doc_id AS VARCHAR), 2, 18) AS BIGINT) = doc_id
         AS roundtrip_ok
FROM documents
"""


# ---------------------------------------------------------------------------
# q07 — F2: whitespace truncation
# ---------------------------------------------------------------------------

def q07_truncate(spark: SparkSession, sf_dir: str, n: int = 10) -> DataFrame:
    docs = _docs(spark, sf_dir)
    toks = F.filter(F.split(F.col("text"), "\\s+"), lambda x: x != "")
    return docs.select(
        "doc_id",
        F.array_join(F.slice(toks, 1, n), " ").alias("truncated"),
        F.least(F.size(toks), F.lit(n)).alias("n_words"),
    )


Q07_SQL = """
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS toks
  FROM documents
)
SELECT doc_id,
       array_to_string(toks[1:10], ' ') AS truncated,
       least(len(toks), 10)::INT AS n_words
FROM t
"""


# ---------------------------------------------------------------------------
# q08 — A4/F7: thresholded confusion matrix + macro F1
# ---------------------------------------------------------------------------

def q08_f1_macro(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    scored = docs.select(
        "doc_id",
        (((F.col("doc_id") * 37) % 100) / 100.0).alias("p"),
        (F.col("doc_id") % 2).alias("label"),
    ).withColumn("pred", F.when(F.col("p") > 0.5, 1).otherwise(0))
    agg = scored.agg(
        F.sum(F.when((F.col("pred") == 1) & (F.col("label") == 1), 1).otherwise(0)).alias("tp"),
        F.sum(F.when((F.col("pred") == 1) & (F.col("label") == 0), 1).otherwise(0)).alias("fp"),
        F.sum(F.when((F.col("pred") == 0) & (F.col("label") == 1), 1).otherwise(0)).alias("fn"),
        F.sum(F.when((F.col("pred") == 0) & (F.col("label") == 0), 1).otherwise(0)).alias("tn"),
    )
    f1_pos = 2 * F.col("tp") / (2 * F.col("tp") + F.col("fp") + F.col("fn"))
    f1_neg = 2 * F.col("tn") / (2 * F.col("tn") + F.col("fp") + F.col("fn"))
    return agg.select(
        F.col("tp").cast("long"),
        F.col("fp").cast("long"),
        F.col("fn").cast("long"),
        F.col("tn").cast("long"),
        F.round((f1_pos + f1_neg) / 2.0, 6).alias("f1_macro"),
    )


Q08_SQL = """
WITH s AS (
  SELECT doc_id, ((doc_id * 37) % 100) / 100.0 AS p, doc_id % 2 AS label
  FROM documents
),
c AS (
  SELECT CASE WHEN p > 0.5 THEN 1 ELSE 0 END AS pred, label FROM s
),
a AS (
  SELECT sum(CASE WHEN pred = 1 AND label = 1 THEN 1 ELSE 0 END)::BIGINT AS tp,
         sum(CASE WHEN pred = 1 AND label = 0 THEN 1 ELSE 0 END)::BIGINT AS fp,
         sum(CASE WHEN pred = 0 AND label = 1 THEN 1 ELSE 0 END)::BIGINT AS fn,
         sum(CASE WHEN pred = 0 AND label = 0 THEN 1 ELSE 0 END)::BIGINT AS tn
  FROM c
)
SELECT tp, fp, fn, tn,
       round((2.0*tp/(2*tp+fp+fn) + 2.0*tn/(2*tn+fp+fn)) / 2.0, 6) AS f1_macro
FROM a
"""


# ---------------------------------------------------------------------------
# q09 — R3: deterministic split counts
# ---------------------------------------------------------------------------

def q09_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    split = F.when(F.col("doc_id") % 10 < 2, "test").otherwise("train")
    return (
        docs.withColumn("split", split)
        .groupBy("split")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
    )


Q09_SQL = """
SELECT CASE WHEN doc_id % 10 < 2 THEN 'test' ELSE 'train' END AS split,
       count(*) AS n, round(avg(n_chars), 4) AS avg_chars
FROM documents GROUP BY 1
"""


# ---------------------------------------------------------------------------
# q10 — F1/M1 analog: term document-frequency stats
# ---------------------------------------------------------------------------

def q10_term_stats(spark: SparkSession, sf_dir: str, top_n: int = 20) -> DataFrame:
    docs = _docs(spark, sf_dir)
    toks = docs.select("doc_id", F.explode(tokenize_text_expr("text")).alias("term"))
    stats = toks.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df"), F.count("*").alias("cf")
    )
    # global top-N as orderBy().limit(): Spark plans TakeOrderedAndProject
    # (per-partition top-N, then merge) — NOT a single-partition global
    # window, which would pull every distinct term through one reducer.
    from dense_retriever_spark.operators.topk import global_topn_ranked

    return global_topn_ranked(
        stats, [("df", True), ("cf", True), ("term", False)], top_n, "r"
    ).select("term", "df", "cf", "r")


Q10_SQL = f"""
WITH t AS (
  SELECT doc_id, unnest({_TOK_SQL.format(c='text')}) AS term FROM documents
),
s AS (
  SELECT term, count(DISTINCT doc_id) AS df, count(*) AS cf FROM t GROUP BY term
),
r AS (
  SELECT term, df, cf,
         row_number() OVER (ORDER BY df DESC, cf DESC, term ASC) AS r
  FROM s
)
SELECT term, df, cf, r::INT AS r FROM r WHERE r <= 20
"""


# ---------------------------------------------------------------------------
# registry (wave 1)
# ---------------------------------------------------------------------------

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q01_bm25_topk": q01_bm25_topk,
    "q02_query_samples": q02_query_samples,
    "q03_hard_negatives": q03_hard_negatives,
    "q04_reciprocal_rank": q04_reciprocal_rank,
    "q05_mrr": q05_mrr,
    "q06_docid_codec": q06_docid_codec,
    "q07_truncate": q07_truncate,
    "q08_f1_macro": q08_f1_macro,
    "q09_split": q09_split,
    "q10_term_stats": q10_term_stats,
}

ORACLES: dict[str, str] = {
    "q01_bm25_topk": Q01_SQL,
    "q02_query_samples": Q02_SQL,
    "q03_hard_negatives": Q03_SQL,
    "q04_reciprocal_rank": Q04_SQL,
    "q05_mrr": Q05_SQL,
    "q06_docid_codec": Q06_SQL,
    "q07_truncate": Q07_SQL,
    "q08_f1_macro": Q08_SQL,
    "q09_split": Q09_SQL,
    "q10_term_stats": Q10_SQL,
}
