"""Fuzzy BM25 search (index/fuzzy.py): deletion-neighborhood expansion vs a
from-scratch Levenshtein reference, plane bit-identity, per-segment edit
bounds, and equivalence with plain search() on the expanded term set."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dense_retriever_spark.index.build import build_index
from dense_retriever_spark.index.fuzzy import (
    search_fuzzy,
    split_fuzzy_query,
)
from dense_retriever_spark.index.search import search


@pytest.fixture(scope="module")
def idx(spark, tiny_corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("fzidx") / "index")
    build_index(tiny_corpus, d, docs_per_shard=64, term_buckets=4)
    return d


@pytest.fixture(scope="module")
def vocab_terms(tiny_corpus):
    from dense_retriever_spark.functions.tokenizer import tokenize_code_series

    pdf = tiny_corpus.select("content").toPandas()
    terms = set()
    for ts in tokenize_code_series(pdf["content"]):
        terms.update(ts)
    return sorted(terms)


def _lev(a: str, b: str) -> int:
    """Plain DP Levenshtein — the independent reference."""
    if a == b:
        return 0
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(
                prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)
            ))
        prev = cur
    return prev[-1]


def _queries(spark, qs):
    return spark.createDataFrame(
        list(enumerate(qs)), "query_id long, query string"
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_expansion_equals_explicit_or(spark, idx, vocab_terms):
    # "merg~" must score exactly like the explicit OR of every dictionary
    # term at edit distance <= 1, fed through plain search()
    matching = [t for t in vocab_terms if _lev("merg", t) <= 1]
    assert "merge" in matching
    a = _rows(search_fuzzy(spark, idx, _queries(spark, ["merg~"]), k=10))
    b = _rows(search(spark, idx, _queries(spark, [" ".join(matching)]), k=10))
    assert a == b and len(a) > 0


def test_distance_two_expansion(spark, idx, vocab_terms):
    matching = [t for t in vocab_terms if _lev("mereg", t) <= 2]
    assert "merge" in matching
    a = _rows(search_fuzzy(spark, idx, _queries(spark, ["mereg~2"]), k=10))
    b = _rows(search(spark, idx, _queries(spark, [" ".join(matching)]), k=10))
    assert a == b and len(a) > 0
    # at distance 1 the same stem matches nothing
    assert not [t for t in vocab_terms if _lev("mereg", t) <= 1]
    empty = search_fuzzy(spark, idx, _queries(spark, ["mereg~1"]), k=10)
    assert empty.count() == 0


def test_exact_stem_is_plain_search(spark, idx, vocab_terms):
    # a fuzzy stem may pull in neighbors; restrict to one whose only
    # <=1-neighbor is itself, so fuzzy == literal
    stem = next(
        t for t in vocab_terms
        if len(t) > 6
        and sum(1 for o in vocab_terms if _lev(t, o) <= 1) == 1
    )
    a = _rows(search_fuzzy(spark, idx, _queries(spark, [f"{stem}~"]), k=10))
    b = _rows(search(spark, idx, _queries(spark, [stem]), k=10))
    assert a == b and len(a) > 0


def test_planes_bit_identical_with_masks(spark, idx, tiny_corpus):
    qs = _queries(spark, ["merg~ batch", "mereg~2 def", "zzqq~", "sym0001~"])
    kill = tiny_corpus.filter(F.col("doc_id") % 3 == 0).select("doc_id")
    allowed = tiny_corpus.filter(F.col("doc_id") % 2 == 0).select("doc_id")
    a = _rows(search_fuzzy(
        spark, idx, qs, k=10, query_mode="broadcast",
        exclude_doc_ids=kill, include_doc_ids=allowed,
    ))
    b = _rows(search_fuzzy(
        spark, idx, qs, k=10, query_mode="distributed",
        exclude_doc_ids=kill, include_doc_ids=allowed,
    ))
    assert a == b and len(a) > 0
    assert all(d % 3 != 0 and d % 2 == 0 for _, d, _, _ in a)


def test_no_match_is_empty(spark, idx):
    res = search_fuzzy(spark, idx, _queries(spark, ["qqqqqqqqqq~"]), k=10)
    assert res.count() == 0


def test_max_edits_validation(spark, idx):
    with pytest.raises(ValueError):
        search_fuzzy(spark, idx, _queries(spark, ["a~"]), max_edits=3)


def test_split_fuzzy_query():
    lits, fuzz = split_fuzzy_query("Merg~ plain miss~2 bad~9 ~ x~0")
    assert fuzz == [("merg", 1), ("miss", 2)]
    # out-of-range distances (~9, ~0) and a bare ~ are dropped entirely —
    # deterministic on both planes
    assert lits == ["plain"]


def test_split_fuzzy_query_default_edits():
    _, fuzz = split_fuzzy_query("merg~", default_edits=2)
    assert fuzz == [("merg", 2)]
