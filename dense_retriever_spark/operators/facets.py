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


def facet_ranges(
    results: DataFrame,
    docs: DataFrame,
    col: str,
    lo: float,
    hi: float,
    n_bins: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """(query_id, bucket, n_docs) — per-query histogram of a NUMERIC
    metadata column over the result docs, the range-facet sidebar (price/
    size/date sliders). Fixed equal-width bins via ``width_bucket``:
    bucket 0 is below ``lo``, 1..n_bins the in-range bins, n_bins+1 above
    ``hi`` — deterministic and restatable in ANSI SQL. Same plan shape as
    ``facet_counts``: broadcast the bounded result side, prune the docs
    scan to (id, col), one partial-aggregated groupBy."""
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    if not lo < hi:
        raise ValueError(f"need lo < hi, got [{lo}, {hi})")
    res = results.select("query_id", id_col).distinct()
    joined = F.broadcast(res).join(docs.select(id_col, col), id_col)
    bucket = F.width_bucket(
        F.col(col).cast("double"),
        F.lit(float(lo)),
        F.lit(float(hi)),
        F.lit(int(n_bins)),
    )
    return joined.groupBy(
        "query_id", bucket.cast("int").alias("bucket")
    ).agg(F.count("*").cast("long").alias("n_docs"))
