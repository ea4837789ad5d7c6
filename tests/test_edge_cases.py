"""Robustness: degenerate corpora through the full build+search path, and
partition-pruning plan evidence on the sharded index."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_build_search_degenerate_corpus(spark, tmp_path):
    """Unicode, emoji, empty, whitespace-only, and megatoken docs must build
    and search without crashing; zero-token docs count toward N but produce
    no postings."""
    from dense_retriever_spark.index.build import (
        assign_doc_ids_scalable,
        build_index,
    )
    from dense_retriever_spark.index.search import search

    rows = [
        ("r/a", "p0", "c0", "py", "def naïve_führer москва 東京 def"),
        ("r/a", "p1", "c1", "py", ""),
        ("r/a", "p2", "c2", "py", "   \t\n  "),
        ("r/a", "p3", "c3", "py", "🎉🎊✨"),
        ("r/a", "p4", "c4", "py", "x" * 100_000),
        ("r/a", "p5", "c5", "py", "def def def def def"),
        ("r/a", "p6", "c6", "py", "camelCaseToken snake_case_token def"),
    ]
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    idx = str(tmp_path / "edge_idx")
    paths = build_index(
        assign_doc_ids_scalable(corpus), idx, docs_per_shard=4, term_buckets=2
    )
    import json

    stats = json.load(open(paths.stats))
    assert stats["n_docs"] == 7  # empty docs still count toward N

    queries = spark.createDataFrame(
        [(0, "def"), (1, "🎉"), (2, ""), (3, "camelCaseToken")],
        "query_id long, query string",
    )
    res = search(spark, idx, queries, k=5).collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r["query_id"], []).append(r)
    assert len(by_q[0]) >= 2      # 'def' matches docs 0, 5, 6
    assert 1 not in by_q          # emoji tokenizes to nothing
    assert 2 not in by_q          # empty query -> no rows, no crash
    assert len(by_q[3]) >= 1      # camelCase segmentation found it
    # k larger than matches: returns what exists, never pads
    assert all(r["rank"] <= 5 for r in res)


def test_shard_scan_partition_pruning(spark, tmp_path, tiny_corpus):
    """A shard-filtered scan of shards/ must prune partitions (the index is
    partitioned by shard on disk) — the per-batch resume scan relies on it."""
    from dense_retriever_spark.index.build import build_index
    from dense_retriever_spark.plans import formatted_plan

    d = str(tmp_path / "prune_idx")
    build_index(tiny_corpus, d, docs_per_shard=64, term_buckets=2)
    pruned = spark.read.parquet(f"{d}/shards").filter(F.col("shard") == 1)
    txt = formatted_plan(pruned)
    assert "PartitionFilters" in txt
    line = [ln for ln in txt.splitlines() if "PartitionFilters" in ln][0]
    assert "shard" in line


def test_search_offset_pagination(spark, tiny_corpus, tiny_queries, tmp_path):
    """offset returns the absolute-rank window [offset+1, offset+k] and
    pages tile the un-paged ranking exactly."""
    import pandas as pd
    import pytest
    from pyspark.sql import functions as F

    from dense_retriever_spark.index.build import build_index
    from dense_retriever_spark.index.search import search

    d = str(tmp_path / "pidx")
    build_index(tiny_corpus, d, docs_per_shard=32, term_buckets=2)
    qs = tiny_queries.limit(5)
    full = search(spark, d, qs, k=10).toPandas()
    p1 = search(spark, d, qs, k=5).toPandas()
    p2 = search(spark, d, qs, k=5, offset=5).toPandas()
    pages = pd.concat([p1, p2]).sort_values(
        ["query_id", "rank"]).reset_index(drop=True)
    fulls = full.sort_values(["query_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(pages, fulls)
    assert (p2["rank"] > 5).all()
    with pytest.raises(ValueError, match="offset"):
        search(spark, d, qs, k=5, offset=-1)
