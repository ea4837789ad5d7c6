"""Faceted aggregation over search results.

The classic fulltext-engine companion query: given a top-k result set and
the document metadata table, count the result docs per metadata value (one
histogram per query per facet column) — the sidebar counts of every search
UI, and at pipeline scale the "what did this query surface, by source/
language" audit.

Plan shape (design-for-100-TB): the result set is bounded (k × |Q| rows)
while the docs table is corpus-sized, so the join broadcasts the RESULTS
side into a hash join against docs — no shuffle of the big table, column
pruning keeps the docs scan to (doc_id ∪ facet columns). The facet columns
are then unpivoted with one ``stack`` projection (no extra scan or join per
facet) and counted with a single partial-aggregated groupBy. Facet-value
cardinality bounds the output, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def facet_counts(
    results: DataFrame,
    docs: DataFrame,
    facet_cols: list[str],
    id_col: str = "doc_id",
) -> DataFrame:
    """(query_id, facet, value, n_docs) — per-query histograms of the
    result docs over each facet column (values cast to string; NULL
    metadata counts under value NULL). ``results`` needs (query_id,
    ``id_col``); duplicate (query_id, doc_id) result rows count once."""
    if not facet_cols:
        raise ValueError("facet_cols must name at least one docs column")
    res = results.select("query_id", id_col).distinct()
    joined = F.broadcast(res).join(
        docs.select(id_col, *facet_cols), id_col
    )
    pairs = []
    for c in facet_cols:
        pairs.append(F.lit(c))
        pairs.append(F.col(c).cast("string"))
    stacked = joined.select(
        "query_id",
        F.stack(F.lit(len(facet_cols)), *pairs).alias("facet", "value"),
    )
    return stacked.groupBy("query_id", "facet", "value").agg(
        F.count("*").cast("long").alias("n_docs")
    )
