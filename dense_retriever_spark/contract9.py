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


# ---------------------------------------------------------------------------
# q70 — graded ranking metrics (nDCG@k + recall@k, operators/rank_metrics.py)
# over a deterministic ranked-list + graded-qrels derivation: the per-lang
# ranked list is the q04 construction (top-10 docs by n_chars DESC, doc_id
# ASC), judgments are docs with doc_id % 5 == 0 graded rel = 1 + doc_id % 3.
# ---------------------------------------------------------------------------

_NDCG_K = 10


def q70_ndcg_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dense_retriever_spark.operators.rank_metrics import ndcg_recall

    docs = _docs(spark, sf_dir)
    w = Window.partitionBy("lang").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    res = (
        docs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _NDCG_K)
        .select("lang", "doc_id", "rank")
    )
    qrels = docs.filter(F.col("doc_id") % 5 == 0).select(
        "lang", "doc_id", (F.lit(1) + F.col("doc_id") % 3).alias("rel")
    )
    out = ndcg_recall(res, qrels, k=_NDCG_K, query_col="lang")
    return out.select(
        F.col("lang").cast("string"),
        F.round("ndcg", 6).alias("ndcg"),
        F.round("recall", 6).alias("recall"),
    )


def _ndcg_sql() -> str:
    return f"""
WITH res AS (
  SELECT lang, doc_id,
         row_number() OVER (PARTITION BY lang
                            ORDER BY n_chars DESC, doc_id ASC) AS rank
  FROM documents
),
topk AS (SELECT lang, doc_id, rank FROM res WHERE rank <= {_NDCG_K}),
judged AS (
  SELECT lang, doc_id, (1 + doc_id % 3)::DOUBLE AS rel
  FROM documents WHERE doc_id % 5 = 0
),
hit AS (
  SELECT t.lang, t.rank, j.rel
  FROM topk t JOIN judged j ON t.lang = j.lang AND t.doc_id = j.doc_id
),
dcg AS (
  SELECT lang, sum((pow(2.0, rel) - 1) / log2(rank + 1.0)) AS dcg,
         count(*)::DOUBLE AS hits
  FROM hit GROUP BY lang
),
ideal AS (
  SELECT lang, sum((pow(2.0, rel) - 1) / log2(irank + 1.0)) AS idcg
  FROM (
    SELECT lang, rel,
           row_number() OVER (PARTITION BY lang
                              ORDER BY rel DESC, doc_id ASC) AS irank
    FROM judged
  ) WHERE irank <= {_NDCG_K}
  GROUP BY lang
),
nrel AS (SELECT lang, count(*)::DOUBLE AS n_rel FROM judged GROUP BY lang)
SELECT n.lang::VARCHAR AS lang,
       round(coalesce(d.dcg, 0) / i.idcg, 6)::DOUBLE AS ndcg,
       round(coalesce(d.hits, 0) / n.n_rel, 6)::DOUBLE AS recall
FROM nrel n
JOIN ideal i USING (lang)
LEFT JOIN dcg d USING (lang)
"""


# ---------------------------------------------------------------------------
# q71/q72 — more-like-this (index/mlt.py) on both query planes: seed docs
# 0/1/2 as their own queries, top-5 interesting terms by round(tf·idf, 6)
# with (tscore DESC, term ASC) ties, q01 BM25 over the selected terms, the
# seed anti-joined out, round-before-rank top 10. The oracle re-derives the
# whole chain relationally from the raw text.
# ---------------------------------------------------------------------------

_MLT_SEEDS: list[tuple[int, int]] = [(0, 0), (1, 1), (2, 2)]
_MLT_TERMS = 5


def _q71(spark: SparkSession, sf_dir: str, query_mode: str) -> DataFrame:
    from dense_retriever_spark.contract4 import _q38_index_dir
    from dense_retriever_spark.contract5 import _rounded_topk
    from dense_retriever_spark.index.mlt import more_like_this

    idx = _q38_index_dir(spark, sf_dir)
    seeds = spark.createDataFrame(
        _MLT_SEEDS, "query_id long, doc_id long"
    )
    raw = more_like_this(
        spark, idx, seeds, k=_OVERFETCH, max_terms=_MLT_TERMS,
        query_mode=query_mode,
    )
    return _rounded_topk(raw, _K)


def q71_more_like_this(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _q71(spark, sf_dir, "broadcast")


def q72_more_like_this_distributed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return _q71(spark, sf_dir, "distributed")


def _mlt_sql() -> str:
    seed_vals = ", ".join(f"({q}, {d})" for q, d in _MLT_SEEDS)
    return f"""
WITH seeds(query_id, doc_id) AS (VALUES {seed_vals}),
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
dfr_all AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
seedtf AS (
  SELECT s.query_id, u.term, count(*)::DOUBLE AS stf
  FROM seeds s
  JOIN (SELECT doc_id, unnest(terms) AS term FROM dd) u USING (doc_id)
  GROUP BY s.query_id, u.term
),
tsc AS (
  SELECT query_id, term,
         round(stf * ln(1 + (st.n - d.df + 0.5)/(d.df + 0.5)), 6) AS tscore
  FROM seedtf JOIN dfr_all d USING (term) CROSS JOIN st
),
qt AS (
  SELECT query_id, term FROM (
    SELECT query_id, term,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY tscore DESC, term ASC) AS rn
    FROM tsc
  ) WHERE rn <= {_MLT_TERMS}
),
dfr AS (
  SELECT term, df FROM dfr_all WHERE term IN (SELECT term FROM qt)
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
ok AS (
  SELECT sc.* FROM sc
  WHERE NOT EXISTS (SELECT 1 FROM seeds s
                    WHERE s.query_id = sc.query_id
                      AND s.doc_id = sc.doc_id)
),
rk AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS rank
  FROM ok
)
SELECT query_id::BIGINT AS query_id, doc_id::BIGINT AS doc_id,
       score::DOUBLE AS score, rank::INT AS rank
FROM rk WHERE rank <= {_K}
"""


# ---------------------------------------------------------------------------
# q73 — synonym-expansion search (index/synonyms.py): query terms expand
# through a (term, variant) relation, variants score as ordinary terms with
# their own df; the oracle re-derives the expansion with a SQL join. The
# distributed plane is pytest-gated (plane-identity test) like the other
# expansion modes.
# ---------------------------------------------------------------------------

_SYNONYMS: list[tuple[str, str]] = [
    ("plan", "scan"),        # widen q0
    ("scan", "plan"),        # symmetric direction exercised via q3
    ("customer", "value"),   # cross-topic variant
    ("merge", "join"),
    ("zzqqnope", "table"),   # synonym of a term no query uses: inert
]


def q73_synonym_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dense_retriever_spark.contract4 import _q38_index_dir
    from dense_retriever_spark.contract5 import _rounded_topk
    from dense_retriever_spark.index.synonyms import search_synonyms

    idx = _q38_index_dir(spark, sf_dir)
    queries = spark.createDataFrame(
        BM25_QUERIES, "query_id long, query string"
    )
    syn = spark.createDataFrame(_SYNONYMS, "term string, variant string")
    raw = search_synonyms(spark, idx, queries, syn, k=_OVERFETCH)
    return _rounded_topk(raw, _K)


def _synonym_sql() -> str:
    syn_vals = ", ".join(f"('{t}', '{v}')" for t, v in _SYNONYMS)
    return f"""
WITH q(query_id, query) AS (VALUES {_QUERY_VALUES_SQL}),
syn(term, variant) AS (VALUES {syn_vals}),
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
qt0 AS (
  SELECT DISTINCT query_id, unnest({_TOK_SQL.format(c='query')}) AS term
  FROM q
),
qt AS (
  SELECT DISTINCT query_id, term FROM (
    SELECT query_id, term FROM qt0
    UNION ALL
    SELECT q0.query_id, s.variant FROM qt0 q0 JOIN syn s USING (term)
  )
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
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS rank
  FROM sc
)
SELECT query_id::BIGINT AS query_id, doc_id::BIGINT AS doc_id,
       score::DOUBLE AS score, rank::INT AS rank
FROM rk WHERE rank <= {_K}
"""


# ---------------------------------------------------------------------------
# q74 — build-time stopwords (build_index(stopwords=...)): the corpus
# vocabulary contains 'a' and 'the'; the index drops them at build time
# (Lucene-StopFilter semantics: dl/avgdl count indexed terms only), and the
# oracle restates that by filtering the token lists before every statistic.
# A query containing a stopword scores exactly as if the word were absent.
# ---------------------------------------------------------------------------

_STOPWORDS: list[str] = ["a", "the"]
_STOP_QUERIES: list[tuple[int, str]] = [
    (0, "the query plan"),      # stopword + scored terms
    (1, "a customer stream"),
    (2, "table scan"),          # no stopwords: sanity leg
    (3, "the a"),               # stopword-only: empty result
]

_STOP_IDX_CACHE: dict[str, str] = {}


def _stop_index_dir(spark: SparkSession, sf_dir: str) -> str:
    import atexit
    import shutil
    import tempfile

    from dense_retriever_spark.contract4 import _docs_as_index_input
    from dense_retriever_spark.index.build import build_index

    if sf_dir in _STOP_IDX_CACHE:
        return _STOP_IDX_CACHE[sf_dir]
    root = tempfile.mkdtemp(prefix="q74_stop_idx_")
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    idx = root + "/index"
    build_index(
        _docs_as_index_input(spark, sf_dir), idx,
        docs_per_shard=128, term_buckets=2, stopwords=_STOPWORDS,
    )
    _STOP_IDX_CACHE[sf_dir] = idx
    return idx


def q74_stopword_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dense_retriever_spark.contract5 import _rounded_topk
    from dense_retriever_spark.index.search import search

    idx = _stop_index_dir(spark, sf_dir)
    queries = spark.createDataFrame(
        _STOP_QUERIES, "query_id long, query string"
    )
    return _rounded_topk(search(spark, idx, queries, k=_OVERFETCH), _K)


def _stopword_sql() -> str:
    qvals = ", ".join(f"({i}, '{q}')" for i, q in _STOP_QUERIES)
    stop_in = ", ".join(f"'{w}'" for w in _STOPWORDS)
    return f"""
WITH q(query_id, query) AS (VALUES {qvals}),
tok AS (
  SELECT doc_id,
         list_filter({_TOK_SQL.format(c='text')},
                     t -> t NOT IN ({stop_in})) AS terms
  FROM documents
),
dd  AS (SELECT doc_id, terms, len(terms) AS dl FROM tok WHERE len(terms) > 0),
st  AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dd),
tf  AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf, min(dl)::DOUBLE AS dl
  FROM (SELECT doc_id, unnest(terms) AS term, dl FROM dd)
  GROUP BY doc_id, term
),
qt  AS (
  SELECT DISTINCT query_id, term FROM (
    SELECT query_id, unnest({_TOK_SQL.format(c='query')}) AS term FROM q
  ) WHERE term NOT IN ({stop_in})
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
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS rank
  FROM sc
)
SELECT query_id::BIGINT AS query_id, doc_id::BIGINT AS doc_id,
       score::DOUBLE AS score, rank::INT AS rank
FROM rk WHERE rank <= {_K}
"""




# ---------------------------------------------------------------------------
# q75 — regex term search (index/regexq.py): /pattern/ segments expand
# against the term dictionary with FULL anchoring; the oracle re-derives the
# dictionary and states the same match with regexp_full_match. Patterns kept
# to the RE2/Java-regex common dialect.
# ---------------------------------------------------------------------------

_REGEX_QUERIES: list[tuple[int, str]] = [
    (0, "/quer(y|ies)/ plan"),     # alternation + literal
    (1, "/s(can|low)/"),           # two-branch class
    (2, "/filt.r/ group"),         # single-char wildcard
    (3, "/zzz+q/ table"),          # no-match pattern + literal
]


def q75_regex_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dense_retriever_spark.contract4 import _q38_index_dir
    from dense_retriever_spark.contract5 import _rounded_topk
    from dense_retriever_spark.index.regexq import search_regex

    idx = _q38_index_dir(spark, sf_dir)
    queries = spark.createDataFrame(
        _REGEX_QUERIES, "query_id long, query string"
    )
    return _rounded_topk(
        search_regex(spark, idx, queries, k=_OVERFETCH), _K
    )


def _regex_sql() -> str:
    from dense_retriever_spark.index.regexq import split_regex_query

    lit_vals, pat_vals = [], []
    for qid, q in _REGEX_QUERIES:
        lits, pats = split_regex_query(q)
        for seg in lits:
            lit_vals.append(f"({qid}, '{seg.lower()}')")
        for p in pats:
            pat_vals.append(f"({qid}, '{p}')")
    lit_sql = ", ".join(lit_vals) or "(NULL, NULL)"
    pat_sql = ", ".join(pat_vals) or "(NULL, NULL)"
    return f"""
WITH qlit(query_id, term) AS (VALUES {lit_sql}),
qpat(query_id, pattern) AS (VALUES {pat_sql}),
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
dict AS (SELECT DISTINCT term FROM tf),
expd AS (
  SELECT p.query_id, d.term
  FROM qpat p JOIN dict d ON regexp_full_match(d.term, p.pattern)
  WHERE p.query_id IS NOT NULL
),
qt AS (
  SELECT DISTINCT query_id, term FROM (
    SELECT query_id, term FROM qlit WHERE query_id IS NOT NULL
    UNION ALL
    SELECT query_id, term FROM expd
  )
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
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS rank
  FROM sc
)
SELECT query_id::BIGINT AS query_id, doc_id::BIGINT AS doc_id,
       score::DOUBLE AS score, rank::INT AS rank
FROM rk WHERE rank <= {_K}
"""




# ---------------------------------------------------------------------------
# q76 — bag-of-terms snippets (operators/snippets.py::term_snippet_windows)
# over the q38 top-10 result set: window anchored at the first occurrence of
# ANY query term; the oracle recomputes the q01 top-10 and the same window
# arithmetic with list functions.
# ---------------------------------------------------------------------------

_SNIP_WINDOW = 4


def q76_term_snippets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dense_retriever_spark.contract4 import q38_indexed_search
    from dense_retriever_spark.operators.snippets import term_snippet_windows

    res = q38_indexed_search(spark, sf_dir)  # hash-matches Q01's top-10
    docs = _docs(spark, sf_dir)
    queries = spark.createDataFrame(
        BM25_QUERIES, "query_id long, query string"
    )
    return term_snippet_windows(
        docs, queries, results=res, window=_SNIP_WINDOW
    )


def _term_snip_sql() -> str:
    from dense_retriever_spark.contract import Q01_SQL

    w = _SNIP_WINDOW
    return f"""
WITH res AS ({Q01_SQL}),
q(query_id, query) AS (VALUES {_QUERY_VALUES_SQL}),
qt AS (
  SELECT query_id, {_TOK_SQL.format(c='query')} AS qtoks FROM q
),
tok AS (
  SELECT doc_id, {_TOK_SQL.format(c='text')} AS terms FROM documents
),
m AS (
  SELECT r.query_id, r.doc_id, t.terms,
         list_filter(range(1, len(t.terms)+1),
                     i -> list_contains(qt.qtoks, t.terms[i]))[1] AS first_pos
  FROM (SELECT DISTINCT query_id, doc_id FROM res) r
  JOIN tok t USING (doc_id)
  JOIN qt  USING (query_id)
),
f AS (SELECT * FROM m WHERE first_pos IS NOT NULL),
s AS (
  SELECT query_id, doc_id, first_pos,
         greatest(first_pos - {w}, 1) AS st, terms
  FROM f
)
SELECT query_id::BIGINT AS query_id, doc_id::BIGINT AS doc_id,
       first_pos::BIGINT AS first_pos,
       array_to_string(list_slice(terms, st, st + {2 * w}), ' ') AS snippet
FROM s
"""




# ---------------------------------------------------------------------------
# q77 — minimum_should_match (index/boolean.py, search --min-should-match):
# docs must match >= m distinct optional terms on top of every required
# term; pure conjunctions are unconstrained (the Lucene msm rule). The
# oracle extends the boolean restatement with a distinct-optional count.
# ---------------------------------------------------------------------------

_MSM = 2
_MSM_QUERIES: list[tuple[int, str]] = [
    (0, "window customer stream"),   # 3 optional, need any 2
    (1, "+table scan merge"),        # required + 2 optional, need both
    (2, "join filter"),              # 2 optional, need both (AND-like)
    (3, "+spark +row"),              # pure conjunction: unconstrained
    (4, "customer zzqqnope slow"),   # OOV optional: 2 in-vocab, need both
]


def q77_msm_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dense_retriever_spark.contract4 import _q38_index_dir
    from dense_retriever_spark.contract5 import _rounded_topk
    from dense_retriever_spark.index.boolean import search_boolean

    idx = _q38_index_dir(spark, sf_dir)
    queries = spark.createDataFrame(
        _MSM_QUERIES, "query_id long, query string"
    )
    return _rounded_topk(
        search_boolean(
            spark, idx, queries, k=_OVERFETCH, min_should_match=_MSM
        ),
        _K,
    )


def _msm_sql() -> str:
    from dense_retriever_spark.index.boolean import parse_boolean_query

    vals = []
    for qid, q in _MSM_QUERIES:
        for term, role in parse_boolean_query(q):
            vals.append(f"({qid}, '{term}', {role})")
    qterms = ", ".join(vals)
    return f"""
WITH qterms(query_id, term, role) AS (VALUES {qterms}),
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
dfr AS (
  SELECT term, count(*)::DOUBLE AS df FROM tf
  WHERE term IN (SELECT term FROM qterms WHERE role < 2) GROUP BY term
),
dead AS (
  SELECT DISTINCT q.query_id FROM qterms q LEFT JOIN dfr USING (term)
  WHERE q.role = 1 AND dfr.term IS NULL
),
reqn AS (
  SELECT query_id, count(*) AS n_req FROM qterms WHERE role = 1
  GROUP BY query_id
),
optn AS (  -- in-vocabulary OPTIONAL terms per query (the msm domain)
  SELECT q.query_id, count(*) AS n_opt
  FROM qterms q JOIN dfr USING (term) WHERE q.role = 0
  GROUP BY q.query_id
),
con AS (
  SELECT q.query_id, tf.doc_id, q.role, q.term,
         ((ln(1 + (st.n - dfr.df + 0.5)/(dfr.df + 0.5)) * tf.tf) * {BM25_K1 + 1.0})
         / (tf.tf + {BM25_K1}*({1.0 - BM25_B} + ({BM25_B}*tf.dl)/st.avgdl)) AS c
  FROM tf JOIN qterms q USING (term) JOIN dfr USING (term) CROSS JOIN st
  WHERE q.role < 2
),
sc AS (
  SELECT query_id, doc_id, round(sum(c), 4) AS score,
         count(DISTINCT CASE WHEN role = 1 THEN term END) AS got_req,
         count(DISTINCT CASE WHEN role = 0 THEN term END) AS got_opt
  FROM con GROUP BY query_id, doc_id
),
ok AS (
  SELECT sc.query_id, sc.doc_id, sc.score
  FROM sc
  LEFT JOIN reqn USING (query_id)
  LEFT JOIN optn USING (query_id)
  WHERE coalesce(reqn.n_req, 0) = sc.got_req
    AND (coalesce(optn.n_opt, 0) = 0 OR sc.got_opt >= {_MSM})
    AND sc.query_id NOT IN (SELECT query_id FROM dead)
),
rk AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS rank
  FROM ok
)
SELECT query_id::BIGINT AS query_id, doc_id::BIGINT AS doc_id,
       score::DOUBLE AS score, rank::INT AS rank
FROM rk WHERE rank <= {_K}
"""




# ---------------------------------------------------------------------------
# q78 — numeric range facets (operators/facets.py::facet_ranges) over the
# q38 result set on n_chars: equal-width width_bucket bins, restated in the
# oracle with the explicit CASE/floor arithmetic (DuckDB has no
# width_bucket). Bin edges chosen so every boundary product is exact in
# float64.
# ---------------------------------------------------------------------------

_FR_LO, _FR_HI, _FR_BINS = 0.0, 200.0, 5


def q78_range_facets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from dense_retriever_spark.contract4 import q38_indexed_search
    from dense_retriever_spark.operators.facets import facet_ranges

    res = q38_indexed_search(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    return facet_ranges(
        res, docs, "n_chars", _FR_LO, _FR_HI, _FR_BINS
    ).select(
        F.col("query_id").cast("long"),
        F.col("bucket").cast("int"),
        F.col("n_docs").cast("long"),
    )


def _range_facet_sql() -> str:
    from dense_retriever_spark.contract import Q01_SQL

    lo, hi, n = _FR_LO, _FR_HI, _FR_BINS
    return f"""
WITH res AS ({Q01_SQL}),
j AS (
  SELECT DISTINCT r.query_id, r.doc_id, d.n_chars
  FROM res r JOIN documents d USING (doc_id)
),
b AS (
  SELECT query_id,
         CASE WHEN n_chars < {lo} THEN 0
              WHEN n_chars >= {hi} THEN {n + 1}
              ELSE 1 + CAST(floor((n_chars - {lo}) * {n} / ({hi} - {lo}))
                           AS INT)
         END AS bucket
  FROM j
)
SELECT query_id::BIGINT AS query_id, bucket::INT AS bucket,
       count(*)::BIGINT AS n_docs
FROM b GROUP BY query_id, bucket
"""




# ---------------------------------------------------------------------------
# q79 — score explanation (index/explain.py): the per-term BM25 breakdown
# of the q38 top-10 pairs — the oracle is the q01 con CTE WITHOUT the sum,
# extended with the raw statistics columns. Engine computes idf/contribution
# as JVM column expressions; both sides round to 6dp.
# ---------------------------------------------------------------------------


def q79_explain_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from dense_retriever_spark.contract4 import (
        _q38_index_dir,
        q38_indexed_search,
    )
    from dense_retriever_spark.index.explain import explain_scores

    idx = _q38_index_dir(spark, sf_dir)
    res = q38_indexed_search(spark, sf_dir)
    queries = spark.createDataFrame(
        BM25_QUERIES, "query_id long, query string"
    )
    out = explain_scores(spark, idx, queries, results=res)
    return out.select(
        F.col("query_id").cast("long"),
        F.col("doc_id").cast("long"),
        F.col("term").cast("string"),
        F.col("tf").cast("long"),
        F.col("dl").cast("long"),
        F.col("df").cast("long"),
        F.round("idf", 6).alias("idf"),
        F.round("contribution", 6).alias("contribution"),
    )


def _explain_sql() -> str:
    from dense_retriever_spark.contract import Q01_SQL

    return f"""
WITH res AS ({Q01_SQL}),
q(query_id, query) AS (VALUES {_QUERY_VALUES_SQL}),
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
  SELECT DISTINCT query_id, unnest({_TOK_SQL.format(c='query')}) AS term
  FROM q
),
dfr AS (
  SELECT term, count(*)::DOUBLE AS df FROM tf
  WHERE term IN (SELECT term FROM qt) GROUP BY term
),
pairs AS (SELECT DISTINCT query_id, doc_id FROM res),
con AS (
  SELECT qt.query_id, tf.doc_id, qt.term,
         tf.tf::BIGINT AS tf, tf.dl::BIGINT AS dl, dfr.df::BIGINT AS df,
         ln(1 + (st.n - dfr.df + 0.5)/(dfr.df + 0.5)) AS idf,
         ((ln(1 + (st.n - dfr.df + 0.5)/(dfr.df + 0.5)) * tf.tf) * {BM25_K1 + 1.0})
         / (tf.tf + {BM25_K1}*({1.0 - BM25_B} + ({BM25_B}*tf.dl)/st.avgdl))
           AS contribution
  FROM tf JOIN qt USING (term) JOIN dfr USING (term) CROSS JOIN st
)
SELECT c.query_id::BIGINT AS query_id, c.doc_id::BIGINT AS doc_id,
       c.term::VARCHAR AS term, c.tf, c.dl, c.df,
       round(c.idf, 6)::DOUBLE AS idf,
       round(c.contribution, 6)::DOUBLE AS contribution
FROM con c JOIN pairs p
  ON p.query_id = c.query_id AND p.doc_id = c.doc_id
"""


QUERIES9: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q68_multifield_search": q68_multifield_search,
    "q69_multifield_search_distributed": q69_multifield_search_distributed,
    "q70_ndcg_recall": q70_ndcg_recall,
    "q71_more_like_this": q71_more_like_this,
    "q72_more_like_this_distributed": q72_more_like_this_distributed,
    "q73_synonym_search": q73_synonym_search,
    "q74_stopword_search": q74_stopword_search,
    "q75_regex_search": q75_regex_search,
    "q76_term_snippets": q76_term_snippets,
    "q77_msm_search": q77_msm_search,
    "q78_range_facets": q78_range_facets,
    "q79_explain_scores": q79_explain_scores,
}


def _oracles9() -> dict[str, str]:
    msql = _multifield_sql()
    mlt = _mlt_sql()
    return {
        "q68_multifield_search": msql,
        "q69_multifield_search_distributed": msql,
        "q70_ndcg_recall": _ndcg_sql(),
        "q71_more_like_this": mlt,
        "q72_more_like_this_distributed": mlt,
        "q73_synonym_search": _synonym_sql(),
        "q74_stopword_search": _stopword_sql(),
        "q75_regex_search": _regex_sql(),
        "q76_term_snippets": _term_snip_sql(),
        "q77_msm_search": _msm_sql(),
        "q78_range_facets": _range_facet_sql(),
        "q79_explain_scores": _explain_sql(),
    }


ORACLES9: dict[str, str] = _oracles9()
