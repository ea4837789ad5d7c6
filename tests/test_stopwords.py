"""Build-time stopwords (build_index(stopwords=...)).

The defining property: building WITH a stopword set is score-identical to
building over text with those words textually removed (dl/avgdl count
indexed terms only — the Lucene-StopFilter analyzer semantics). Plus the
lifecycle guards: incremental builds can't change the set, compaction
inherits it, merges refuse mixed sets.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dense_retriever_spark.index.build import build_index, compact_index
from dense_retriever_spark.index.search import load_stats, search

ROWS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "a quick brown dog sleeps under a tree"),
    (2, "the tree is a very lazy plant indeed"),
    (3, "quick quick slow the a the a filler words"),
    (4, "brown bark of the tree and the fox den"),
]
STOP = ["the", "a"]


def _inp(docs):
    return docs.select(
        "doc_id",
        F.lit("docs").alias("repo"),
        F.concat(F.lit("p"), F.col("doc_id")).alias("path"),
        F.concat(F.lit("c"), F.col("doc_id")).alias("commit"),
        F.lit("en").alias("lang"),
        F.col("text").alias("content"),
        F.sha2(F.col("text"), 256).alias("content_sha"),
    )


@pytest.fixture(scope="module")
def stop_indexes(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("stop"))
    docs = spark.createDataFrame(ROWS, "doc_id long, text string")
    stripped = docs.withColumn(
        "text",
        F.array_join(
            F.filter(
                F.split(F.col("text"), " "),
                lambda t: ~t.isin(STOP),
            ),
            " ",
        ),
    )
    build_index(_inp(docs), root + "/sw", docs_per_shard=4, stopwords=STOP)
    build_index(_inp(stripped), root + "/strip", docs_per_shard=4)
    return root + "/sw", root + "/strip", root


def test_stats_record_stopwords_and_filtered_avgdl(spark, stop_indexes):
    sw, strip, _ = stop_indexes
    s1, s2 = load_stats(sw), load_stats(strip)
    assert s1["stopwords"] == sorted(STOP)
    assert s2["stopwords"] == []
    # identical token totals -> identical avgdl: dl counts indexed terms
    assert s1["avgdl"] == s2["avgdl"]
    assert s1["metrics"]["total_tokens"] == s2["metrics"]["total_tokens"]


def test_stopword_build_scores_like_stripped_text(spark, stop_indexes):
    sw, strip, _ = stop_indexes
    qs = spark.createDataFrame(
        [(0, "quick brown"), (1, "lazy tree"), (2, "the fox")],
        "query_id long, query string",
    )
    a = search(spark, sw, qs, k=5).toPandas()
    b = search(spark, strip, qs, k=5).toPandas()
    a = a.sort_values(["query_id", "rank"]).reset_index(drop=True)
    b = b.sort_values(["query_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_stopword_only_query_returns_nothing(spark, stop_indexes):
    sw, _, _ = stop_indexes
    qs = spark.createDataFrame(
        [(0, "the a the")], "query_id long, query string"
    )
    assert search(spark, sw, qs, k=5).count() == 0


def test_incremental_build_cannot_change_set(spark, stop_indexes):
    sw, _, _ = stop_indexes
    docs = spark.createDataFrame(ROWS, "doc_id long, text string")
    with pytest.raises(ValueError, match="stopwords"):
        build_index(
            _inp(docs), sw, docs_per_shard=4, stopwords=["different"]
        )
    # None inherits silently (the resume path)
    build_index(_inp(docs), sw, docs_per_shard=4)
    assert load_stats(sw)["stopwords"] == sorted(STOP)


def test_compaction_inherits_stopwords(spark, stop_indexes, tmp_path):
    """compact ≡ fresh stopword build over the survivors (the established
    compaction invariant, with the stopword set inherited via stats)."""
    sw, strip, root = stop_indexes
    import shutil

    cp = root + "/sw_compact"
    shutil.copytree(sw, cp)
    kill = spark.createDataFrame([(3,)], "doc_id long")
    compact_index(spark, cp, kill)
    assert load_stats(cp)["stopwords"] == sorted(STOP)

    docs = spark.createDataFrame(
        [r for r in ROWS if r[0] != 3], "doc_id long, text string"
    )
    fresh = str(tmp_path / "fresh")
    build_index(_inp(docs), fresh, docs_per_shard=4, stopwords=STOP)
    qs = spark.createDataFrame(
        [(0, "quick brown")], "query_id long, query string"
    )
    a = search(spark, cp, qs, k=5).toPandas()
    b = search(spark, fresh, qs, k=5).toPandas()
    a = a.sort_values("rank").reset_index(drop=True)
    b = b.sort_values("rank").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_merge_refuses_mixed_stopword_sets(spark, stop_indexes, tmp_path):
    from dense_retriever_spark.index.merge import merge_indexes

    sw, strip, _ = stop_indexes
    with pytest.raises(ValueError, match="stopwords"):
        merge_indexes(spark, [sw, strip], str(tmp_path / "m"))
