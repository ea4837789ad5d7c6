"""Snippet extraction (operators/snippets.py): pure-expression token
windows around the first phrase occurrence, edge cases included."""

from __future__ import annotations

from dense_retriever_spark.operators.snippets import snippet_windows


def test_snippet_windows_edges(spark):
    docs = spark.createDataFrame(
        [
            (0, "a b c d e f g h i j"),
            (1, "c d"),            # phrase == whole doc
            (2, "x y z"),          # no match
            (3, "c"),              # doc shorter than phrase (guarded seq)
            (4, "c d a a c d"),    # repeated: FIRST occurrence wins
        ],
        "doc_id long, text string",
    )
    qs = spark.createDataFrame(
        [(0, "c d"), (1, "h i j"), (2, "")],
        "query_id long, query string",
    )
    rows = {
        (r["query_id"], r["doc_id"]): (r["first_pos"], r["snippet"])
        for r in snippet_windows(docs, qs, window=2).collect()
    }
    # window clamps at doc start and end
    assert rows[(0, 0)] == (3, "a b c d e f")
    assert rows[(0, 1)] == (1, "c d")
    # first occurrence wins; start clamps to 1 and the window keeps its
    # L+2w length from the clamped start (the documented definition)
    assert rows[(0, 4)] == (1, "c d a a c d")
    # suffix match: window extends left, clamps right
    assert rows[(1, 0)] == (8, "f g h i j")
    # no-match doc, too-short doc, empty phrase: absent
    assert (0, 2) not in rows and (0, 3) not in rows
    assert not any(q == 2 for q, _ in rows)


# --- bag-of-terms (best-term) snippets -------------------------------------


def test_term_snippets_first_any_match(spark):
    from dense_retriever_spark.operators.snippets import term_snippet_windows

    docs = spark.createDataFrame(
        [
            (0, "one two three four five six seven eight"),
            (1, "alpha beta three gamma"),
            (2, "no match here"),
        ],
        "doc_id long, text string",
    )
    qs = spark.createDataFrame(
        [(0, "three seven")], "query_id long, query string"
    )
    got = {
        r["doc_id"]: (r["first_pos"], r["snippet"])
        for r in term_snippet_windows(docs, qs, window=2).collect()
    }
    # doc 0: 'three' at pos 3 beats 'seven' at 7; window [1, 5]
    assert got[0] == (3, "one two three four five")
    # doc 1: 'three' at pos 3, window clamped left
    assert got[1] == (3, "alpha beta three gamma")
    assert 2 not in got


def test_term_snippets_restricted_to_results(spark):
    from dense_retriever_spark.operators.snippets import term_snippet_windows

    docs = spark.createDataFrame(
        [(0, "three x"), (1, "three y")], "doc_id long, text string"
    )
    qs = spark.createDataFrame(
        [(0, "three")], "query_id long, query string"
    )
    res = spark.createDataFrame(
        [(0, 1)], "query_id long, doc_id long"
    )
    got = term_snippet_windows(docs, qs, results=res, window=2).collect()
    assert [r["doc_id"] for r in got] == [1]
