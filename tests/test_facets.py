"""facet_counts (operators/facets.py): histogram correctness, NULL and
duplicate handling, and the broadcast-the-small-side plan shape."""

from __future__ import annotations

import pytest

from dense_retriever_spark.operators.facets import facet_counts


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "py", "web"),
        (1, "py", None),
        (2, "go", "web"),
        (3, "rs", "code"),
        (4, "py", "code"),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, lang string, source string"
    )


def test_counts(spark, docs):
    res = spark.createDataFrame(
        [(0, 0), (0, 1), (0, 4), (1, 2), (1, 3)],
        "query_id long, doc_id long",
    )
    got = {
        (r["query_id"], r["facet"], r["value"]): r["n_docs"]
        for r in facet_counts(res, docs, ["lang", "source"]).collect()
    }
    assert got == {
        (0, "lang", "py"): 3,
        (0, "source", "web"): 1,
        (0, "source", None): 1,
        (0, "source", "code"): 1,
        (1, "lang", "go"): 1,
        (1, "lang", "rs"): 1,
        (1, "source", "web"): 1,
        (1, "source", "code"): 1,
    }


def test_duplicate_result_rows_count_once(spark, docs):
    res = spark.createDataFrame(
        [(0, 2), (0, 2), (0, 2)], "query_id long, doc_id long"
    )
    got = facet_counts(res, docs, ["lang"]).collect()
    assert len(got) == 1 and got[0]["n_docs"] == 1


def test_requires_facet_cols(spark, docs):
    res = spark.createDataFrame([(0, 0)], "query_id long, doc_id long")
    with pytest.raises(ValueError):
        facet_counts(res, docs, [])


def test_broadcasts_result_side(spark, docs):
    from dense_retriever_spark.plans import uses_broadcast_join

    res = spark.createDataFrame([(0, 0)], "query_id long, doc_id long")
    assert uses_broadcast_join(facet_counts(res, docs, ["lang"]))


# --- numeric range facets ---------------------------------------------------


def test_facet_ranges_width_bucket(spark):
    from dense_retriever_spark.operators.facets import facet_ranges

    docs = spark.createDataFrame(
        [(0, 5), (1, 15), (2, 25), (3, 95), (4, 150), (5, -3)],
        "doc_id long, n_chars long",
    )
    res = spark.createDataFrame(
        [(0, d) for d in range(6)], "query_id long, doc_id long"
    )
    got = {
        (r["query_id"], r["bucket"]): r["n_docs"]
        for r in facet_ranges(res, docs, "n_chars", 0, 100, 4).collect()
    }
    # bins of width 25 over [0, 100): 5->1, 15->1, 25->2, 95->4;
    # 150 -> overflow bucket 5; -3 -> underflow bucket 0
    assert got == {(0, 1): 2, (0, 2): 1, (0, 4): 1, (0, 5): 1, (0, 0): 1}


def test_facet_ranges_validates(spark):
    import pytest as _pt

    from dense_retriever_spark.operators.facets import facet_ranges

    docs = spark.createDataFrame([(0, 1)], "doc_id long, v long")
    res = spark.createDataFrame([(0, 0)], "query_id long, doc_id long")
    with _pt.raises(ValueError, match="n_bins"):
        facet_ranges(res, docs, "v", 0, 1, 0)
    with _pt.raises(ValueError, match="lo"):
        facet_ranges(res, docs, "v", 5, 5, 2)
