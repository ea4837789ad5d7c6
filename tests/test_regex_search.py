"""Regex term search (index/regexq.py)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dense_retriever_spark.index.build import build_index
from dense_retriever_spark.index.regexq import (
    literal_prefix,
    search_regex,
    split_regex_query,
)
from dense_retriever_spark.index.search import search

ROWS = [
    (0, "merged branch history log"),
    (1, "merger of two companies"),
    (2, "margin settings for print"),
    (3, "merge conflict in branch"),
    (4, "colour color colouring pages"),
]


@pytest.fixture(scope="module")
def re_index(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("re"))
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


def test_literal_prefix_derivation():
    assert literal_prefix("merge(r|d)") == "merge"
    assert literal_prefix("colou?r") == "colo"
    assert literal_prefix("ab?c") == "a"
    assert literal_prefix(".*ing") == ""
    assert literal_prefix("a{2}b") == ""
    assert literal_prefix("mer\\w+") == "mer"
    assert literal_prefix("plain") == "plain"


def test_split_regex_query():
    assert split_regex_query("/merge(r|d)/ branch") == (
        ["branch"], ["merge(r|d)"]
    )
    assert split_regex_query("plain words") == (["plain", "words"], [])
    # a bare "//" is not a pattern
    assert split_regex_query("// x") == (["//", "x"], [])


def test_regex_expansion_matches_full_anchored(spark, re_index):
    q = spark.createDataFrame(
        [(0, "/merge(r|d)/")], "query_id long, query string"
    )
    r = search_regex(spark, re_index, q, k=10).toPandas()
    # merged (doc 0) and merger (doc 1) match; 'merge' (doc 3) and
    # 'margin' (doc 2) must NOT (full anchoring)
    assert set(r["doc_id"]) == {0, 1}


def test_regex_equals_expanded_literal_search(spark, re_index):
    """A regex expanding to exactly {colour, color} scores identically to
    the literal two-term disjunction."""
    q_re = spark.createDataFrame(
        [(0, "/colou?r/")], "query_id long, query string"
    )
    q_lit = spark.createDataFrame(
        [(0, "colour color")], "query_id long, query string"
    )
    a = search_regex(spark, re_index, q_re, k=10).toPandas()
    b = search(spark, re_index, q_lit, k=10).toPandas()
    a = a.sort_values("rank").reset_index(drop=True)
    b = b.sort_values("rank").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_regex_planes_identical(spark, re_index):
    q = spark.createDataFrame(
        [(0, "/merge(r|d)?/ branch"), (1, "/col.*/")],
        "query_id long, query string",
    )
    a = search_regex(spark, re_index, q, k=10).toPandas()
    b = search_regex(
        spark, re_index, q, k=10, query_mode="distributed"
    ).toPandas()
    a = a.sort_values(["query_id", "rank"]).reset_index(drop=True)
    b = b.sort_values(["query_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_regex_no_match_and_bad_pattern(spark, re_index):
    q = spark.createDataFrame(
        [(0, "/zzz+qq/")], "query_id long, query string"
    )
    assert search_regex(spark, re_index, q, k=10).count() == 0
    bad = spark.createDataFrame(
        [(0, "/merge(/")], "query_id long, query string"
    )
    with pytest.raises(ValueError, match="bad regex"):
        search_regex(spark, re_index, bad, k=10)


def test_regex_truncation_warns(spark, re_index):
    q = spark.createDataFrame(
        [(0, "/.*/")], "query_id long, query string"
    )
    with pytest.warns(RuntimeWarning, match="truncated"):
        r = search_regex(spark, re_index, q, k=10, max_expansions=3)
        r.count()


def test_literal_prefix_top_level_alternation_voids_prefix():
    """Round-7 review finding: a top-level | means the leading literal is
    NOT required of every match — the prefilter must not assume it."""
    assert literal_prefix("cat|dog") == ""
    assert literal_prefix("cat|cab") == ""
    # grouped alternation keeps the shared prefix
    assert literal_prefix("merge(r|d)") == "merge"
    # escaped pipe is a literal, not an alternation
    assert literal_prefix(r"a\|b") == "a"


def test_top_level_alternation_matches_all_branches(spark, re_index):
    """/merged|margin/ must match docs for BOTH branches despite their
    different first letters (the prefilter bug would drop 'margin')."""
    q = spark.createDataFrame(
        [(0, "/merged|margin/")], "query_id long, query string"
    )
    r = search_regex(spark, re_index, q, k=10).toPandas()
    assert set(r["doc_id"]) == {0, 2}


def test_exactly_at_cap_does_not_warn(spark, re_index):
    """A pattern matching exactly max_expansions terms is complete, not
    truncated — no warning (the sentinel-row fix)."""
    import warnings as _w

    # /colou?r/ matches exactly {color, colour}
    q = spark.createDataFrame(
        [(0, "/colou?r/")], "query_id long, query string"
    )
    with _w.catch_warnings():
        _w.simplefilter("error", RuntimeWarning)
        r = search_regex(spark, re_index, q, k=10, max_expansions=2)
        assert r.count() > 0
