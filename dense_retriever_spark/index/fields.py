"""Multi-field search: weighted combination of per-field BM25 indexes.

Reference analog: the reference engine scores ONE text per document (the
`text` column fed to the encoder, /root/reference/dense_retriever/
transforms/text_transforms.py); real corpora carry several retrievable
fields (title/body, docstring/code) whose hits should not weigh equally.
The classic IR construction (Lucene's MultiFieldQueryParser with per-field
boosts, Robertson's BM25F family) scores each field with its OWN collection
statistics and combines per-field scores with caller weights:

    score(q, d) = Σ_f  w_f · BM25_f(q, d)        (combine='sum')
    score(q, d) = max_f w_f · BM25_f(q, d)       (combine='max', dismax)

where BM25_f uses field f's n_docs / avgdl / df — a short title field gets
title-appropriate length normalization instead of being drowned by body
statistics. Each field is a plain index built by ``build_index`` over that
field's text, so every index feature (incremental refresh, compaction,
tombstones, generational layout, both query planes) applies per field
unchanged.

The combination is exact, not top-k-merged: a per-field top-k would lose
score mass exactly where fields disagree (a doc ranked 200th by body but
1st by title must still receive its body contribution). ``score_matches``
(index/search.py) supplies the full per-field matched relation — per-shard
cost identical to a normal search minus the top-k heap — and the combine is
ONE hash aggregation on (query_id, doc_id) over the unioned legs, then the
standard windowed top-k. Nothing is collected; the plan survives any corpus
size that the single-field search survives.

Determinism: the combined score is computed as a FIXED-ORDER expression
over pivoted per-field columns (coalesce(s_f, 0)·w_f summed in the caller's
field order), not a float SUM aggregate whose partial-aggregation order
Spark does not define — so engine and oracle add the same numbers in the
same order, and the usual round-to-4dp-then-rank gate convention holds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dense_retriever_spark.index.search import MATCHES_SCHEMA, score_matches
from dense_retriever_spark.operators.topk import topk_per_group


def search_fields(
    spark: SparkSession,
    fields: list[tuple[str, str, float]],
    queries_df: DataFrame,
    k: int = 10,
    combine: str = "sum",
    exclude_doc_ids: DataFrame | None = None,
    include_doc_ids: DataFrame | None = None,
    query_mode: str = "broadcast",
) -> DataFrame:
    """Top-k weighted multi-field BM25. Output: (query_id, doc_id, score,
    rank) — the ``search`` contract.

    ``fields``: [(field_name, index_dir, weight), ...] in the score-
    accumulation order (fixed-order float addition — see module docstring).
    Field names must be distinct. Every index must cover the SAME doc_id
    space (they are different projections of one corpus); a doc missing
    from a field simply contributes 0 for that field.

    ``combine``: 'sum' (BM25F-style weighted sum) or 'max' (dismax — best
    single field wins; ties broken by doc_id as everywhere).

    ``exclude_doc_ids`` / ``include_doc_ids`` apply to every field leg
    (masking happens inside each field's scorer, before any combination, so
    a tombstoned doc can never surface through a second field).

    Plan shape: |fields| term-pruned index scans (each the plain search
    scan) → union → ONE shuffle on (query_id, doc_id) (pivot aggregation)
    → windowed top-k. The per-field legs carry only matched (query, doc)
    rows, bounded by the query terms' posting sizes — the same intermediate
    any disjunctive scorer holds before truncation.
    """
    if combine not in ("sum", "max"):
        raise ValueError(f"unknown combine {combine!r}")
    names = [f[0] for f in fields]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate field names in {names}")
    if not fields:
        raise ValueError("fields must be non-empty")
    if query_mode == "auto":  # probe ONCE, not once per field leg
        from dense_retriever_spark.index.search import QUERY_BROADCAST_LIMIT

        n_q = queries_df.limit(QUERY_BROADCAST_LIMIT + 1).count()
        query_mode = (
            "broadcast" if n_q <= QUERY_BROADCAST_LIMIT else "distributed"
        )

    legs = []
    for name, index_dir, _w in fields:
        m = score_matches(
            spark, index_dir, queries_df,
            exclude_doc_ids=exclude_doc_ids,
            include_doc_ids=include_doc_ids,
            query_mode=query_mode,
        )
        legs.append(m.withColumn("field", F.lit(name)))
    u = legs[0]
    for leg in legs[1:]:
        u = u.unionByName(leg)

    # one (query_id, doc_id) row per matched doc, per-field scores as
    # columns; the explicit pivot value list keeps Spark from running a
    # discovery job and fixes the column order
    per_doc = (
        u.groupBy("query_id", "doc_id")
        .pivot("field", names)
        .agg(F.first("score"))
    )
    contribs = [
        F.coalesce(F.col(name), F.lit(0.0)) * F.lit(float(w))
        for name, _d, w in fields
    ]
    if combine == "sum":
        total = contribs[0]
        for c in contribs[1:]:
            total = total + c
    else:
        total = F.greatest(*contribs) if len(contribs) > 1 else contribs[0]
    scored = per_doc.select(
        "query_id", "doc_id", total.alias("score")
    )
    out = topk_per_group(scored, "query_id", "score", k)
    return out.select(
        F.col("query_id").cast("long"),
        F.col("doc_id").cast("long"),
        F.col("score").cast("double"),
        F.col("rank").cast("int"),
    )


def derive_field(
    docs: DataFrame,
    text_col: str,
    n_head: int,
    head: bool,
    out_col: str = "text",
) -> DataFrame:
    """Deterministic token-split field projection for corpora that carry a
    single text column: ``head=True`` keeps the first ``n_head`` tokens
    (a synthetic 'title'), ``head=False`` the rest (the 'body'). Tokens are
    the engine tokenizer's ([a-z0-9]+ of the lowercased text), re-joined
    with single spaces — tokenizing the derived field reproduces exactly
    the token slice, so per-field statistics are well-defined. Pure column
    expressions; no UDF."""
    from dense_retriever_spark.functions.tokenizer import tokenize_text_expr

    toks = tokenize_text_expr(F.col(text_col))
    if head:
        part = F.slice(toks, 1, n_head)
    else:
        tail_len = F.greatest(F.size(toks) - n_head, F.lit(0))
        part = F.when(
            tail_len > 0, F.slice(toks, n_head + 1, tail_len)
        ).otherwise(F.array().cast("array<string>"))
    return docs.withColumn(out_col, F.array_join(part, " "))


__all__ = ["search_fields", "derive_field", "MATCHES_SCHEMA"]
