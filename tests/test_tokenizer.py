"""Tokenizer golden cases + expr/pandas-UDF equivalence (SURVEY.md §5.1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dense_retriever_spark.functions.tokenizer import (
    tokenize_code_expr,
    tokenize_code_pandas,
    tokenize_text_expr,
)

GOLDEN = [
    # (input, expected tokens)
    ("getHTTPResponse", ["get", "http", "response", "gethttpresponse"]),
    ("snake_case_var", ["snake", "case", "var", "snake_case_var"]),
    ("def foo(x): return x", ["def", "foo", "x", "return", "x"]),
    ("camelCase", ["camel", "case", "camelcase"]),
    ("HTTPServer", ["http", "server", "httpserver"]),
    ("Box2D", ["box2", "d", "box2d"]),
    ("plain", ["plain"]),
    ("UPPER", ["upper"]),
    ("", []),
    ("  \t\n ", []),
    ("a_b cD", ["a", "b", "c", "d", "a_b", "cd"]),
]


def _run(spark, col_fn, texts):
    df = spark.createDataFrame([(t,) for t in texts], ["content"])
    rows = df.select(col_fn("content").alias("t")).collect()
    return [r["t"] for r in rows]


def test_code_expr_golden(spark):
    got = _run(spark, tokenize_code_expr, [g[0] for g in GOLDEN])
    for (inp, want), out in zip(GOLDEN, got):
        assert out == want, f"{inp!r}: {out} != {want}"


def test_pandas_udf_matches_expr(spark, tiny_corpus):
    """The Arrow pandas_udf and the Catalyst expr are semantically identical."""
    df = tiny_corpus.select("doc_id", "content").union(
        spark.createDataFrame([(9000 + i, g[0]) for i, g in enumerate(GOLDEN)],
                              ["doc_id", "content"])
    )
    cmp = df.select(
        "doc_id",
        tokenize_code_expr("content").alias("a"),
        tokenize_code_pandas("content").alias("b"),
    ).filter(F.col("a") != F.col("b"))
    assert cmp.count() == 0


def test_text_expr_simple(spark):
    got = _run(spark, tokenize_text_expr, ["Hello, World! 42", ""])
    assert got[0] == ["hello", "world", "42"]
    assert got[1] == []


def test_null_safety(spark):
    df = spark.createDataFrame([(None,)], "content string")
    out = df.select(
        tokenize_code_expr("content").alias("a"),
        tokenize_code_pandas("content").alias("b"),
        tokenize_text_expr("content").alias("c"),
    ).collect()[0]
    # expr path yields NULL for NULL input; pandas path coalesces to [] —
    # corpus ingest filters NULL content before tokenize, both acceptable.
    assert out["a"] is None or out["a"] == []
    assert out["b"] == []
    assert out["c"] is None or out["c"] == []
