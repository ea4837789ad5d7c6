"""Synonym-expansion search (index/synonyms.py)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dense_retriever_spark.index.build import build_index
from dense_retriever_spark.index.search import search
from dense_retriever_spark.index.synonyms import (
    expand_query_terms,
    search_synonyms,
    symmetric_synonyms,
)

ROWS = [
    (0, "fast quick rapid sort"),
    (1, "quick merge sort"),
    (2, "rapid hash join"),
    (3, "slow bubble sort"),
    (4, "fast hash aggregate"),
]


@pytest.fixture(scope="module")
def syn_index(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("syn"))
    docs = spark.createDataFrame(ROWS, "doc_id long, text string")
    inp = docs.select(
        "doc_id",
        F.lit("docs").alias("repo"),
        F.concat(F.lit("p"), F.col("doc_id")).alias("path"),
        F.concat(F.lit("c"), F.col("doc_id")).alias("commit"),
        F.lit("en").alias("lang"),
        F.col("text").alias("content"),
        F.sha2(F.col("text"), 256).alias("content_sha"),
    )
    build_index(inp, root + "/idx", docs_per_shard=4)
    return root + "/idx"


@pytest.fixture(scope="module")
def syn_table(spark):
    return spark.createDataFrame(
        [("fast", "quick"), ("fast", "rapid")], "term string, variant string"
    )


def test_expansion_widens_recall(spark, syn_index, syn_table):
    q = spark.createDataFrame([(0, "fast")], "query_id long, query string")
    plain = search(spark, syn_index, q, k=10).toPandas()
    syn = search_synonyms(spark, syn_index, q, syn_table, k=10).toPandas()
    # plain 'fast' hits docs 0 and 4 only; with quick/rapid variants docs
    # 1 and 2 join the result set
    assert set(plain["doc_id"]) == {0, 4}
    assert {0, 1, 2, 4} <= set(syn["doc_id"])


def test_no_synonym_hit_is_bit_identical_to_search(spark, syn_index, syn_table):
    q = spark.createDataFrame(
        [(0, "hash join")], "query_id long, query string"
    )
    a = search(spark, syn_index, q, k=10).toPandas()
    b = search_synonyms(spark, syn_index, q, syn_table, k=10).toPandas()
    a = a.sort_values("rank").reset_index(drop=True)
    b = b.sort_values("rank").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_planes_identical(spark, syn_index, syn_table):
    q = spark.createDataFrame(
        [(0, "fast sort"), (1, "fast")], "query_id long, query string"
    )
    a = search_synonyms(spark, syn_index, q, syn_table, k=5).toPandas()
    b = search_synonyms(
        spark, syn_index, q, syn_table, k=5, query_mode="distributed"
    ).toPandas()
    a = a.sort_values(["query_id", "rank"]).reset_index(drop=True)
    b = b.sort_values(["query_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_oov_variant_is_inert(spark, syn_index):
    syn = spark.createDataFrame(
        [("fast", "zzqqnope")], "term string, variant string"
    )
    q = spark.createDataFrame([(0, "fast")], "query_id long, query string")
    a = search(spark, syn_index, q, k=10).toPandas()
    b = search_synonyms(spark, syn_index, q, syn, k=10).toPandas()
    a = a.sort_values("rank").reset_index(drop=True)
    b = b.sort_values("rank").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_expand_query_terms_relation(spark, syn_table):
    q = spark.createDataFrame(
        [(0, "fast fast sort")], "query_id long, query string"
    )
    got = {
        (r["query_id"], r["term"])
        for r in expand_query_terms(q, syn_table).collect()
    }
    assert got == {(0, "fast"), (0, "sort"), (0, "quick"), (0, "rapid")}


def test_symmetric_synonyms_builds_both_directions(spark):
    groups = spark.createDataFrame(
        [(0, "fast"), (0, "quick"), (0, "rapid"), (1, "slow")],
        "group_id long, term string",
    )
    got = {
        (r["term"], r["variant"])
        for r in symmetric_synonyms(groups).collect()
    }
    assert got == {
        ("fast", "quick"), ("quick", "fast"),
        ("fast", "rapid"), ("rapid", "fast"),
        ("quick", "rapid"), ("rapid", "quick"),
    }


def test_tombstone_composes(spark, syn_index, syn_table):
    q = spark.createDataFrame([(0, "fast")], "query_id long, query string")
    kill = spark.createDataFrame([(1,)], "doc_id long")
    r = search_synonyms(
        spark, syn_index, q, syn_table, k=10, exclude_doc_ids=kill
    ).toPandas()
    assert 1 not in set(r["doc_id"]) and {0, 2, 4} <= set(r["doc_id"])
