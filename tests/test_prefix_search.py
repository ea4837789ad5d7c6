"""Prefix-expanded BM25 search (index/prefix.py): expansion semantics vs a
from-scratch reference, plane bit-identity, truncation determinism, and
equivalence with plain search() when the expansion is the literal term set.
"""

from __future__ import annotations

import warnings

import pytest
from pyspark.sql import functions as F

from dense_retriever_spark.index.build import build_index
from dense_retriever_spark.index.prefix import search_prefix, split_prefix_query
from dense_retriever_spark.index.search import search


@pytest.fixture(scope="module")
def idx(spark, tiny_corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pfxidx") / "index")
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


def _queries(spark, qs):
    return spark.createDataFrame(
        list(enumerate(qs)), "query_id long, query string"
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_expansion_equals_explicit_or(spark, idx, vocab_terms):
    # "sym000*" must score exactly like the explicit OR of the matching
    # dictionary terms fed through plain search()
    matching = [t for t in vocab_terms if t.startswith("sym000")]
    assert 2 <= len(matching) <= 10
    a = _rows(search_prefix(spark, idx, _queries(spark, ["sym000*"]), k=10))
    b = _rows(search(spark, idx, _queries(spark, [" ".join(matching)]), k=10))
    assert a == b and len(a) > 0


def test_mixed_literals_and_prefix(spark, idx, vocab_terms):
    matching = [t for t in vocab_terms if t.startswith("sym000")]
    a = _rows(search_prefix(
        spark, idx, _queries(spark, ["merge sym000* batch"]), k=10
    ))
    b = _rows(search(
        spark, idx,
        _queries(spark, ["merge batch " + " ".join(matching)]), k=10,
    ))
    assert a == b and len(a) > 0


def test_planes_bit_identical(spark, idx):
    qs = _queries(spark, [
        "sym000*", "merge sym01* batch", "nomatchxyz*", "merge batch", "*",
    ])
    a = _rows(search_prefix(spark, idx, qs, k=10, query_mode="broadcast"))
    b = _rows(search_prefix(spark, idx, qs, k=10, query_mode="distributed"))
    assert a == b and len(a) > 0


def test_no_match_prefix_empty(spark, idx):
    res = search_prefix(spark, idx, _queries(spark, ["zzqqxx*"]), k=10)
    assert res.count() == 0


def test_compound_identifier_prefix(spark, idx, vocab_terms):
    # the dictionary keeps compounds lowercased with underscores: skew_sa*
    # must reach skew_salt
    assert "skew_salt" in vocab_terms
    res = search_prefix(
        spark, idx, _queries(spark, ["skew_sa*"]), k=5
    )
    assert res.count() > 0


def test_truncation_deterministic_and_warns(spark, idx, vocab_terms):
    matching = sorted(t for t in vocab_terms if t.startswith("sym0"))
    assert len(matching) > 5
    keep = matching[:5]  # lexicographically smallest win
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        a = _rows(search_prefix(
            spark, idx, _queries(spark, ["sym0*"]), k=10, max_expansions=5
        ))
        assert any("truncated" in str(x.message) for x in w)
    b = _rows(search(spark, idx, _queries(spark, [" ".join(keep)]), k=10))
    assert a == b and len(a) > 0
    # distributed plane truncates identically (no warning there — documented)
    c = _rows(search_prefix(
        spark, idx, _queries(spark, ["sym0*"]), k=10, max_expansions=5,
        query_mode="distributed",
    ))
    assert c == a


def test_masks_compose(spark, idx, tiny_corpus):
    kill = tiny_corpus.filter(F.col("doc_id") % 3 == 0).select("doc_id")
    allowed = tiny_corpus.filter(F.col("doc_id") % 2 == 0).select("doc_id")
    qs = _queries(spark, ["sym000* merge"])
    a = _rows(search_prefix(
        spark, idx, qs, k=10,
        exclude_doc_ids=kill, include_doc_ids=allowed,
    ))
    b = _rows(search_prefix(
        spark, idx, qs, k=10, query_mode="distributed",
        exclude_doc_ids=kill, include_doc_ids=allowed,
    ))
    assert a == b and len(a) > 0
    assert all(d % 3 != 0 and d % 2 == 0 for _, d, _, _ in a)


def test_expansion_scan_pushdown(spark, idx):
    # the dictionary scan must carry the StartsWith predicate down to
    # parquet (row-group pruning on the sorted term dictionary)
    from dense_retriever_spark.index.prefix import _expand
    from dense_retriever_spark.index.search import load_stats
    from dense_retriever_spark.plans import formatted_plan

    pfx = spark.createDataFrame(
        [(0, "sym0"), (1, "merge")], "query_id long, prefix string"
    )
    exp = _expand(spark, idx, load_stats(idx), pfx, 1024)
    plan = formatted_plan(exp)
    pushed = [
        ln for ln in plan.splitlines() if "PushedFilters" in ln
    ]
    assert any("StartsWith(term,sym0)" in ln for ln in pushed), pushed


def test_split_prefix_query_basic():
    lits, stems = split_prefix_query("MergeSh* plain skew_sa** *")
    assert stems == ["mergesh", "skew_sa"]
    assert lits == ["plain"]
