"""Score explanation (index/explain.py): per-term BM25 breakdown."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dense_retriever_spark.index.build import build_index
from dense_retriever_spark.index.explain import explain_scores
from dense_retriever_spark.index.search import search

ROWS = [
    (0, "alpha beta beta gamma"),
    (1, "alpha gamma delta"),
    (2, "beta delta epsilon zeta"),
    (3, "alpha alpha beta gamma delta"),
]


@pytest.fixture(scope="module")
def ex_index(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("explain"))
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
    build_index(inp, root + "/idx", docs_per_shard=2)
    return root + "/idx"


def test_contributions_sum_to_search_score(spark, ex_index):
    qs = spark.createDataFrame(
        [(0, "alpha beta"), (1, "delta")], "query_id long, query string"
    )
    res = search(spark, ex_index, qs, k=10)
    exp = explain_scores(spark, ex_index, qs, results=res)
    sums = (
        exp.groupBy("query_id", "doc_id")
        .agg(F.sum("contribution").alias("s"))
        .collect()
    )
    scores = {
        (r["query_id"], r["doc_id"]): r["score"] for r in res.collect()
    }
    assert len(sums) == len(scores)
    for r in sums:
        assert abs(r["s"] - scores[(r["query_id"], r["doc_id"])]) < 1e-9


def test_explain_rows_carry_true_statistics(spark, ex_index):
    qs = spark.createDataFrame([(0, "beta")], "query_id long, query string")
    rows = {
        r["doc_id"]: r
        for r in explain_scores(spark, ex_index, qs).collect()
    }
    # beta: docs 0 (tf 2, dl 4), 2 (tf 1, dl 4), 3 (tf 1, dl 5); df 3
    assert set(rows) == {0, 2, 3}
    assert rows[0]["tf"] == 2 and rows[0]["dl"] == 4
    assert rows[3]["tf"] == 1 and rows[3]["dl"] == 5
    assert all(r["df"] == 3 for r in rows.values())
    assert all(r["term"] == "beta" for r in rows.values())


def test_explain_restricts_to_result_pairs(spark, ex_index):
    qs = spark.createDataFrame(
        [(0, "alpha beta")], "query_id long, query string"
    )
    res = spark.createDataFrame([(0, 3)], "query_id long, doc_id long")
    got = explain_scores(spark, ex_index, qs, results=res).collect()
    assert {r["doc_id"] for r in got} == {3}
    assert {r["term"] for r in got} == {"alpha", "beta"}


def test_explain_oov_and_empty(spark, ex_index):
    qs = spark.createDataFrame(
        [(0, "zzqqnope")], "query_id long, query string"
    )
    assert explain_scores(spark, ex_index, qs).count() == 0
    empty_res = spark.createDataFrame([], "query_id long, doc_id long")
    qs2 = spark.createDataFrame([(0, "alpha")], "query_id long, query string")
    assert explain_scores(
        spark, ex_index, qs2, results=empty_res
    ).count() == 0
