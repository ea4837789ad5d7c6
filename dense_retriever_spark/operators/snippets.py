"""Snippet extraction: token context windows around phrase occurrences.

The retrieval-pipeline companion to phrase search (index/phrase.py): given a
phrase batch and a document table, emit a token window centered on each
document's FIRST phrase occurrence — the passage a training-data pipeline
feeds to a reranker/reader, or a UI shows as the hit context.

Implemented entirely as Catalyst column expressions (tokenize → guarded
position sequence → array-slice equality → window slice → join) — zero
Python in the data path, whole-stage-codegen friendly, and reproducible in
ANSI SQL for the driver oracle (the q60 gate). The phrase batch is a small
relation and rides a broadcast cross join; docs flow through one narrow
projection — no shuffle at any |docs|.

Definition (deterministic, oracle-matched):
  first   = smallest 1-based token index i with tokens[i : i+L-1] == phrase
  start   = max(first - window, 1)
  snippet = tokens[start : start + L + 2*window - 1]   (clamped at the end)
Documents with no occurrence emit nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dense_retriever_spark.functions.tokenizer import tokenize_text_expr


def snippet_windows(
    docs: DataFrame,
    queries_df: DataFrame,
    window: int = 5,
    doc_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(query_id, doc_id, first_pos, snippet) for every doc containing the
    phrase. ``first_pos`` is 1-based; ``snippet`` is the space-joined token
    window. Pure column expressions end-to-end."""
    qt = queries_df.select(
        "query_id", tokenize_text_expr("query").alias("qtoks")
    ).filter(F.size("qtoks") > 0)
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        tokenize_text_expr(doc_col).alias("t"),
    )
    j = d.join(F.broadcast(qt))
    L = F.size("qtoks")
    n = F.size("t")
    # guarded sequence: Spark's sequence(1, 0) is DESCENDING [1, 0], so a
    # doc shorter than the phrase must yield an empty candidate list, not a
    # reversed one
    starts = F.when(
        n >= L, F.sequence(F.lit(1), n - L + F.lit(1))
    ).otherwise(F.array().cast("array<int>"))
    hits = F.filter(
        starts, lambda i: F.slice(F.col("t"), i, L) == F.col("qtoks")
    )
    # try_element_at: NULL (no occurrence) instead of the ANSI-mode throw
    first = F.try_element_at(hits, F.lit(1))
    s = F.greatest(first - F.lit(int(window)), F.lit(1))
    snip = F.array_join(
        F.slice(F.col("t"), s, L + F.lit(2 * int(window))), " "
    )
    return (
        j.withColumn("first_pos", first)
        .filter(F.col("first_pos").isNotNull())
        .select(
            F.col("query_id").cast("long"),
            F.col("doc_id").cast("long"),
            F.col("first_pos").cast("long"),
            snip.alias("snippet"),
        )
    )


def term_snippet_windows(
    docs: DataFrame,
    queries_df: DataFrame,
    results: DataFrame | None = None,
    window: int = 5,
    doc_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Bag-of-terms hit context: (query_id, doc_id, first_pos, snippet)
    with the window anchored at the FIRST occurrence of ANY query term —
    the highlighting companion to plain ``search`` the way
    ``snippet_windows`` companions phrase search.

    ``results`` (optional, the realistic flow): a search output
    (query_id, doc_id, ...) restricting the pairs to the hits — the doc
    scan then joins only k × |Q| rows instead of crossing every doc with
    every query. Pure column expressions either way; deterministic
    (first = smallest 1-based token index whose token is a query token)."""
    qt = queries_df.select(
        "query_id", tokenize_text_expr("query").alias("qtoks")
    ).filter(F.size("qtoks") > 0)
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        tokenize_text_expr(doc_col).alias("t"),
    )
    if results is not None:
        pairs = results.select("query_id", "doc_id").distinct()
        j = (
            pairs.join(d, "doc_id")
            .join(F.broadcast(qt), "query_id")
        )
    else:
        j = d.join(F.broadcast(qt))
    n = F.size("t")
    idxs = F.when(n > 0, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )
    hits = F.filter(
        idxs,
        lambda i: F.array_contains(
            F.col("qtoks"), F.element_at(F.col("t"), i)
        ),
    )
    first = F.try_element_at(hits, F.lit(1))
    s = F.greatest(first - F.lit(int(window)), F.lit(1))
    snip = F.array_join(
        F.slice(F.col("t"), s, F.lit(2 * int(window) + 1)), " "
    )
    return (
        j.withColumn("first_pos", first)
        .filter(F.col("first_pos").isNotNull())
        .select(
            F.col("query_id").cast("long"),
            F.col("doc_id").cast("long"),
            F.col("first_pos").cast("long"),
            snip.alias("snippet"),
        )
    )


def snippet_sql(
    phrase_arms: list[tuple[int, list[str]]],
    window: int,
    tok_sql: str,
    table: str = "documents",
) -> str:
    """DuckDB twin of snippet_windows for the driver oracle: one UNION arm
    per (query_id, phrase tokens)."""
    arms = []
    for qid, toks in phrase_arms:
        L = len(toks)
        cond = " AND ".join(
            f"terms[i+{j}] = '{t}'" for j, t in enumerate(toks)
        )
        arms.append(f"""
  SELECT {qid} AS query_id, doc_id, terms,
         list_filter(range(1, greatest(len(terms)-{L - 1}, 0)+1),
                     i -> {cond})[1] AS first_pos,
         {L} AS _l
  FROM tok""")
    body = " UNION ALL ".join(arms)
    return f"""
WITH tok AS (
  SELECT doc_id, {tok_sql} AS terms FROM {table}
),
m AS ({body}),
f AS (SELECT * FROM m WHERE first_pos IS NOT NULL),
s AS (
  SELECT query_id, doc_id, first_pos,
         greatest(first_pos - {window}, 1) AS st, _l
  FROM f
)
SELECT query_id::BIGINT AS query_id, doc_id::BIGINT AS doc_id,
       first_pos::BIGINT AS first_pos,
       array_to_string(
         list_slice(terms, st, st + _l + {2 * window} - 1), ' '
       ) AS snippet
FROM s JOIN tok USING (doc_id)
"""
