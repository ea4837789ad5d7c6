"""Driver-contract queries, wave 7 (round 7, session 3): the boolean /
prefix / facet query-language extensions under the hash gate.

q61/q62 gate boolean BM25 search (+required / -forbidden / bare scored —
index/boolean.py) on the broadcast and distributed planes against ONE
from-scratch DuckDB oracle that re-derives the conjunction, exclusion,
OOV-required and role-conflict rules relationally from the raw text. q63
gates prefix expansion (index/prefix.py): the oracle rebuilds the term
dictionary from the corpus, expands ``LIKE prefix%`` with the same
deterministic per-pattern truncation, and scores the expanded disjunction
with the q01 BM25 math. q64 gates facet_counts (operators/facets.py) over
the q38 result set — the oracle recomputes the top-10 with Q01_SQL and
aggregates the same (lang, source) histograms. q65 gates fuzzy search
(index/fuzzy.py): the engine's deletion-neighborhood join + levenshtein
verify must produce exactly {t : lev(stem, t) <= e}, which the oracle
states directly with DuckDB's levenshtein() over the rebuilt dictionary.

All five run over the SAME index artifact q38 builds (contract4's cached
fixture), so the wave adds zero extra index builds to the gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dense_retriever_spark import BM25_B, BM25_K1

# documents-table vocabulary (TESTDATA.md): query plan window customer data
# stream join filter group slow table scan merge spark row batch sort hash
# value part key agg fast small big line column vector order a the
BOOLEAN_QUERIES: list[tuple[int, str]] = [
    (0, "+table scan"),            # one required + one optional
    (1, "+join +filter group"),    # conjunction + optional
    (2, "customer -stream"),       # exclusion
    (3, "+merge -batch -sort"),    # required + two exclusions
    (4, "+zzqqnope table"),        # OOV required → matches nothing
    (5, "spark -spark row"),       # role conflict: forbidden wins
]

PREFIX_QUERIES: list[tuple[int, str]] = [
    (0, "s* customer"),            # wide expansion (scan slow spark sort …)
    (1, "quer*"),                  # single-term expansion
    (2, "zzqq* merge"),            # no-match pattern + literal
    (3, "val* part"),
]

_K = 10
_OVERFETCH = 50
_MAX_EXP = 1024


def _rounded(raw: DataFrame, k: int = _K) -> DataFrame:
    from dense_retriever_spark.contract5 import _rounded_topk

    return _rounded_topk(raw, k)


def q61_boolean_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dense_retriever_spark.contract4 import _q38_index_dir
    from dense_retriever_spark.index.boolean import search_boolean

    idx = _q38_index_dir(spark, sf_dir)
    queries = spark.createDataFrame(
        BOOLEAN_QUERIES, "query_id long, query string"
    )
    return _rounded(search_boolean(spark, idx, queries, k=_OVERFETCH))


def q62_boolean_search_distributed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The distributed boolean plane under the SAME oracle as q61 — the
    q61/q62 pair proves plane interchangeability exactly like q38/q49 and
    q58/q59."""
    from dense_retriever_spark.contract4 import _q38_index_dir
    from dense_retriever_spark.index.boolean import search_boolean

    idx = _q38_index_dir(spark, sf_dir)
    queries = spark.createDataFrame(
        BOOLEAN_QUERIES, "query_id long, query string"
    )
    return _rounded(
        search_boolean(
            spark, idx, queries, k=_OVERFETCH, query_mode="distributed"
        )
    )


def _boolean_sql() -> str:
    from dense_retriever_spark.contract import _TOK_SQL
    from dense_retriever_spark.index.boolean import parse_boolean_query

    vals = []
    for qid, q in BOOLEAN_QUERIES:
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
dead AS (  -- an out-of-vocabulary REQUIRED term kills its query
  SELECT DISTINCT q.query_id FROM qterms q LEFT JOIN dfr USING (term)
  WHERE q.role = 1 AND dfr.term IS NULL
),
reqn AS (
  SELECT query_id, count(*) AS n_req FROM qterms WHERE role = 1
  GROUP BY query_id
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
         count(DISTINCT CASE WHEN role = 1 THEN term END) AS got_req
  FROM con GROUP BY query_id, doc_id
),
neg AS (
  SELECT DISTINCT q.query_id, tf.doc_id
  FROM tf JOIN qterms q USING (term) WHERE q.role = 2
),
ok AS (
  SELECT sc.query_id, sc.doc_id, sc.score
  FROM sc LEFT JOIN reqn USING (query_id)
  WHERE coalesce(reqn.n_req, 0) = sc.got_req
    AND sc.query_id NOT IN (SELECT query_id FROM dead)
    AND NOT EXISTS (SELECT 1 FROM neg
                    WHERE neg.query_id = sc.query_id
                      AND neg.doc_id = sc.doc_id)
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


def q63_prefix_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dense_retriever_spark.contract4 import _q38_index_dir
    from dense_retriever_spark.index.prefix import search_prefix

    idx = _q38_index_dir(spark, sf_dir)
    queries = spark.createDataFrame(
        PREFIX_QUERIES, "query_id long, query string"
    )
    return _rounded(
        search_prefix(
            spark, idx, queries, k=_OVERFETCH, max_expansions=_MAX_EXP
        )
    )


def _prefix_sql() -> str:
    from dense_retriever_spark.contract import _TOK_SQL
    from dense_retriever_spark.index.prefix import split_prefix_query

    lit_vals, pfx_vals = [], []
    for qid, q in PREFIX_QUERIES:
        lits, stems = split_prefix_query(q)
        for seg in lits:
            # literal segments tokenize like any query text (the gate's
            # segments are single plain tokens, so lower() is the whole
            # tokenizer here — asserted by the engine side matching)
            lit_vals.append(f"({qid}, '{seg.lower()}')")
        for s in stems:
            pfx_vals.append(f"({qid}, '{s}')")
    lit_sql = ", ".join(lit_vals) or "(NULL, NULL)"
    pfx_sql = ", ".join(pfx_vals) or "(NULL, NULL)"
    return f"""
WITH qlit(query_id, term) AS (VALUES {lit_sql}),
qpfx(query_id, prefix) AS (VALUES {pfx_sql}),
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
expd AS (  -- per-pattern deterministic truncation, engine rule
  SELECT prefix, term FROM (
    SELECT dp.prefix, d.term,
           row_number() OVER (PARTITION BY dp.prefix ORDER BY d.term) AS rn
    FROM (SELECT DISTINCT prefix FROM qpfx WHERE prefix IS NOT NULL) dp
    JOIN dict d ON starts_with(d.term, dp.prefix)
  ) WHERE rn <= {_MAX_EXP}
),
qt AS (
  SELECT DISTINCT query_id, term FROM (
    SELECT query_id, term FROM qlit WHERE query_id IS NOT NULL
    UNION ALL
    SELECT p.query_id, e.term FROM qpfx p JOIN expd e USING (prefix)
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


FUZZY_QUERIES: list[tuple[int, str]] = [
    (0, "merg~ window"),     # 1-edit neighbor + literal
    (1, "qery~2 table"),     # 2-edit segment
    (2, "zzzzzz~ scan"),     # no fuzzy match + literal
    (3, "stram~"),           # 1-edit only
    (4, "haash~2"),
]


def q65_fuzzy_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dense_retriever_spark.contract4 import _q38_index_dir
    from dense_retriever_spark.index.fuzzy import search_fuzzy

    idx = _q38_index_dir(spark, sf_dir)
    queries = spark.createDataFrame(
        FUZZY_QUERIES, "query_id long, query string"
    )
    return _rounded(search_fuzzy(spark, idx, queries, k=_OVERFETCH))


def _fuzzy_sql() -> str:
    from dense_retriever_spark.contract import _TOK_SQL
    from dense_retriever_spark.index.fuzzy import split_fuzzy_query

    lit_vals, fz_vals = [], []
    for qid, q in FUZZY_QUERIES:
        lits, fuzz = split_fuzzy_query(q)
        for seg in lits:
            lit_vals.append(f"({qid}, '{seg.lower()}')")
        for stem, edits in fuzz:
            fz_vals.append(f"({qid}, '{stem}', {edits})")
    lit_sql = ", ".join(lit_vals) or "(NULL, NULL)"
    fz_sql = ", ".join(fz_vals) or "(NULL, NULL, NULL)"
    return f"""
WITH qlit(query_id, term) AS (VALUES {lit_sql}),
qfz(query_id, stem, edits) AS (VALUES {fz_sql}),
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
expd AS (  -- the engine's expansion set is exactly {{t : lev(stem,t) <= e}}
  SELECT f.query_id, d.term
  FROM qfz f JOIN dict d ON levenshtein(f.stem, d.term) <= f.edits
  WHERE f.query_id IS NOT NULL
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


def q64_facet_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dense_retriever_spark.contract import _docs
    from dense_retriever_spark.contract4 import q38_indexed_search
    from dense_retriever_spark.operators.facets import facet_counts

    res = q38_indexed_search(spark, sf_dir)  # hash-matches Q01's top-10
    docs = _docs(spark, sf_dir)
    return facet_counts(res, docs, ["lang", "source"]).select(
        F.col("query_id").cast("long"),
        F.col("facet").cast("string"),
        F.col("value").cast("string"),
        F.col("n_docs").cast("long"),
    )


def _facet_sql() -> str:
    from dense_retriever_spark.contract import Q01_SQL

    return f"""
WITH res AS ({Q01_SQL}),
j AS (
  SELECT r.query_id, d.lang, d.source
  FROM res r JOIN documents d USING (doc_id)
)
SELECT query_id::BIGINT AS query_id, 'lang' AS facet,
       lang::VARCHAR AS value, count(*)::BIGINT AS n_docs
FROM j GROUP BY 1, 3
UNION ALL
SELECT query_id::BIGINT, 'source', source::VARCHAR, count(*)::BIGINT
FROM j GROUP BY 1, 3
"""


def q66_count_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dense_retriever_spark.contract4 import _q38_index_dir
    from dense_retriever_spark.index.boolean import count_matches

    idx = _q38_index_dir(spark, sf_dir)
    queries = spark.createDataFrame(
        BOOLEAN_QUERIES, "query_id long, query string"
    )
    return count_matches(spark, idx, queries).select(
        F.col("query_id").cast("long"),
        F.col("n_matches").cast("long"),
    )


def _count_sql() -> str:
    from dense_retriever_spark.contract import _TOK_SQL
    from dense_retriever_spark.index.boolean import parse_boolean_query

    vals, allq = [], []
    for qid, q in BOOLEAN_QUERIES:
        allq.append(f"({qid})")
        for term, role in parse_boolean_query(q):
            vals.append(f"({qid}, '{term}', {role})")
    return f"""
WITH qterms(query_id, term, role) AS (VALUES {", ".join(vals)}),
allq(query_id) AS (VALUES {", ".join(allq)}),
tok AS (
  SELECT doc_id, {_TOK_SQL.format(c='text')} AS terms FROM documents
),
dd  AS (SELECT doc_id, terms FROM tok WHERE len(terms) > 0),
tfp AS (
  SELECT DISTINCT doc_id, term
  FROM (SELECT doc_id, unnest(terms) AS term FROM dd)
),
reqn AS (
  SELECT query_id, count(*) AS n_req FROM qterms WHERE role = 1
  GROUP BY query_id
),
hit AS (  -- docs with >=1 positive term; count required hits alongside
  SELECT q.query_id, tfp.doc_id,
         count(DISTINCT CASE WHEN q.role = 1 THEN q.term END) AS got_req
  FROM tfp JOIN qterms q USING (term)
  WHERE q.role < 2
  GROUP BY q.query_id, tfp.doc_id
),
neg AS (
  SELECT DISTINCT q.query_id, tfp.doc_id
  FROM tfp JOIN qterms q USING (term) WHERE q.role = 2
),
ok AS (
  SELECT hit.query_id, hit.doc_id
  FROM hit LEFT JOIN reqn USING (query_id)
  WHERE coalesce(reqn.n_req, 0) = hit.got_req
    AND NOT EXISTS (SELECT 1 FROM neg
                    WHERE neg.query_id = hit.query_id
                      AND neg.doc_id = hit.doc_id)
),
cnt AS (SELECT query_id, count(*) AS n FROM ok GROUP BY query_id)
SELECT a.query_id::BIGINT AS query_id,
       coalesce(cnt.n, 0)::BIGINT AS n_matches
FROM allq a LEFT JOIN cnt USING (query_id)
"""


SUGGEST_TERMS: list[str] = ["tble", "scann", "merge", "qery", "zzqqzz"]


def q67_suggest_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dense_retriever_spark.contract4 import _q38_index_dir
    from dense_retriever_spark.index.fuzzy import suggest_terms

    idx = _q38_index_dir(spark, sf_dir)
    terms = spark.createDataFrame(
        [(t,) for t in SUGGEST_TERMS], "term string"
    )
    return suggest_terms(spark, idx, terms, max_edits=2, k=3).select(
        F.col("term").cast("string"),
        F.col("suggestion").cast("string"),
        F.col("distance").cast("int"),
        F.col("df").cast("long"),
        F.col("rank").cast("int"),
    )


def _suggest_sql() -> str:
    from dense_retriever_spark.contract import _TOK_SQL

    tvals = ", ".join(f"('{t}')" for t in SUGGEST_TERMS)
    return f"""
WITH q(term) AS (VALUES {tvals}),
tok AS (
  SELECT doc_id, {_TOK_SQL.format(c='text')} AS terms FROM documents
),
dd  AS (SELECT doc_id, terms FROM tok WHERE len(terms) > 0),
dict AS (
  SELECT term AS suggestion, count(DISTINCT doc_id)::BIGINT AS df
  FROM (SELECT doc_id, unnest(terms) AS term FROM dd)
  GROUP BY term
),
m AS (
  SELECT q.term, d.suggestion,
         levenshtein(q.term, d.suggestion)::INT AS distance, d.df
  FROM q JOIN dict d ON levenshtein(q.term, d.suggestion) <= 2
),
r AS (
  SELECT term, suggestion, distance, df,
         row_number() OVER (PARTITION BY term
                            ORDER BY distance ASC, df DESC,
                                     suggestion ASC) AS rank
  FROM m
)
SELECT term::VARCHAR AS term, suggestion::VARCHAR AS suggestion,
       distance::INT AS distance, df::BIGINT AS df, rank::INT AS rank
FROM r WHERE rank <= 3
"""


QUERIES8: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q61_boolean_search": q61_boolean_search,
    "q62_boolean_search_distributed": q62_boolean_search_distributed,
    "q63_prefix_search": q63_prefix_search,
    "q64_facet_counts": q64_facet_counts,
    "q65_fuzzy_search": q65_fuzzy_search,
    "q66_count_matches": q66_count_matches,
    "q67_suggest_terms": q67_suggest_terms,
}


def _oracles8() -> dict[str, str]:
    bsql = _boolean_sql()
    return {
        "q61_boolean_search": bsql,
        "q62_boolean_search_distributed": bsql,
        "q63_prefix_search": _prefix_sql(),
        "q64_facet_counts": _facet_sql(),
        "q65_fuzzy_search": _fuzzy_sql(),
        "q66_count_matches": _count_sql(),
        "q67_suggest_terms": _suggest_sql(),
    }


ORACLES8: dict[str, str] = _oracles8()
