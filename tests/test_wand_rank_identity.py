"""End-to-end rank identity: indexed engine == exact oracle (north_rule).

The indexed WAND/exact scorers must reproduce the brute-force BM25 oracle's
top-k docIDs rank-identically, with scores within 1e-9 (JVM log vs libm log
can differ in the last ulp; operation order is otherwise identical)."""

from __future__ import annotations

import pytest

from dense_retriever_spark.index.build import build_index
from dense_retriever_spark.index.search import search
from dense_retriever_spark.operators.bm25 import bm25_exact_topk, tokenize_corpus

K = 10


@pytest.fixture(scope="module")
def idx(spark, tiny_corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("widx") / "index")
    build_index(tiny_corpus, d, docs_per_shard=64, term_buckets=4)
    return d


def _by_query(rows):
    out = {}
    for r in sorted(rows, key=lambda r: (r["query_id"], r["rank"])):
        out.setdefault(r["query_id"], []).append((r["doc_id"], r["score"], r["rank"]))
    return out


def _assert_rank_identical(got_rows, want_rows):
    got, want = _by_query(got_rows), _by_query(want_rows)
    assert set(got) == set(want), f"query coverage differs: {set(got) ^ set(want)}"
    for qid in want:
        g, w = got[qid], want[qid]
        assert [x[0] for x in g] == [x[0] for x in w], (
            f"q{qid} docs: {[x[0] for x in g]} != {[x[0] for x in w]}"
        )
        assert [x[2] for x in g] == [x[2] for x in w]
        for a, e in zip(g, w):
            assert abs(a[1] - e[1]) <= 1e-9 * max(1.0, abs(e[1])), (qid, a, e)


@pytest.fixture(scope="module")
def oracle_rows(spark, tiny_corpus, tiny_queries):
    return bm25_exact_topk(tokenize_corpus(tiny_corpus), tiny_queries, k=K).collect()


def test_exact_scorer_rank_identity(spark, idx, tiny_queries, oracle_rows):
    got = search(spark, idx, tiny_queries, k=K, use_blockmax=False).collect()
    _assert_rank_identical(got, oracle_rows)


def test_blockmax_scorer_rank_identity(spark, idx, tiny_queries, oracle_rows):
    got = search(spark, idx, tiny_queries, k=K, use_blockmax=True).collect()
    _assert_rank_identical(got, oracle_rows)


def test_k1_and_k50(spark, idx, tiny_corpus, tiny_queries):
    tok = tokenize_corpus(tiny_corpus)
    for k in (1, 50):  # reference default top_n=50 (cli/model_training.py:39)
        want = bm25_exact_topk(tok, tiny_queries, k=k).collect()
        got = search(spark, idx, tiny_queries, k=k, use_blockmax=True).collect()
        _assert_rank_identical(got, want)


def test_oov_and_empty(spark, idx):
    s = idx
    oov = (
        search(
            spark,
            s,
            spark.createDataFrame([(1, "zzzznotaterm")], "query_id long, query string"),
            k=5,
        )
    )
    assert oov.count() == 0
