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


def test_suggest_terms(spark, idx, vocab_terms):
    from dense_retriever_spark.index.fuzzy import suggest_terms

    terms = spark.createDataFrame(
        [("merg",), ("merge",), ("zzqqzz",)], "term string"
    )
    got = suggest_terms(spark, idx, terms, max_edits=1, k=5).collect()
    by_term = {}
    for r in got:
        by_term.setdefault(r["term"], []).append(
            (r["rank"], r["suggestion"], r["distance"], r["df"])
        )
    # an in-vocabulary term suggests itself first at distance 0
    merge_sugs = sorted(by_term["merge"])
    assert merge_sugs[0][1] == "merge" and merge_sugs[0][2] == 0
    # "merg" finds merge at distance 1
    assert any(s == "merge" and d == 1 for _, s, d, _ in by_term["merg"])
    assert "zzqqzz" not in by_term
    # ranking mirror: distance asc, df desc, suggestion asc
    want = sorted(
        (
            (_lev("merg", t), t)
            for t in vocab_terms
            if _lev("merg", t) <= 1
        ),
    )
    # recompute expected order with df from the engine rows themselves
    got_merg = sorted(by_term["merg"])
    dists = [d for _, _, d, _ in got_merg]
    assert dists == sorted(dists)
    for (_, _, d1x, df1), (_, _, d2x, df2) in zip(got_merg, got_merg[1:]):
        if d1x == d2x:
            assert df1 >= df2
    assert {s for _, s in want} >= {s for _, s, _, _ in got_merg}


def test_count_matches(spark, idx, tiny_corpus, doc_tokens_fz):
    from dense_retriever_spark.index.boolean import count_matches

    qs = ["merge batch", "+merge +batch", "merge -batch",
          "+zzqqnope merge", "zzqqnope"]
    qdf = spark.createDataFrame(
        list(enumerate(qs)), "query_id long, query string"
    )
    got = {
        int(r["query_id"]): int(r["n_matches"])
        for r in count_matches(spark, idx, qdf).collect()
    }

    def brute(q):
        from dense_retriever_spark.index.boolean import parse_boolean_query

        parsed = parse_boolean_query(q)
        pos = [t for t, r in parsed if r != 2]
        req = [t for t, r in parsed if r == 1]
        neg = {t for t, r in parsed if r == 2}
        n = 0
        for toks in doc_tokens_fz.values():
            ts = set(toks)
            if req and not all(t in ts for t in req):
                continue
            if neg & ts:
                continue
            if any(t in ts for t in pos):
                n += 1
        return n

    assert set(got) == set(range(len(qs)))  # zero rows present
    for qid, q in enumerate(qs):
        assert got[qid] == brute(q), (qid, q)
    assert got[3] == 0 and got[4] == 0


def test_count_matches_with_masks(spark, idx, tiny_corpus, doc_tokens_fz):
    from pyspark.sql import functions as FF

    from dense_retriever_spark.index.boolean import count_matches

    qdf = spark.createDataFrame(
        [(0, "merge batch")], "query_id long, query string"
    )
    kill = tiny_corpus.filter(FF.col("doc_id") % 3 == 0).select("doc_id")
    allowed = tiny_corpus.filter(FF.col("doc_id") % 2 == 0).select("doc_id")
    got = count_matches(
        spark, idx, qdf, exclude_doc_ids=kill, include_doc_ids=allowed
    ).collect()[0]["n_matches"]
    want = sum(
        1
        for did, toks in doc_tokens_fz.items()
        if did % 3 != 0 and did % 2 == 0
        and ({"merge", "batch"} & set(toks))
    )
    assert got == want > 0


import pytest as _pytest


@_pytest.fixture(scope="module")
def doc_tokens_fz(tiny_corpus):
    from dense_retriever_spark.functions.tokenizer import tokenize_code_series

    pdf = tiny_corpus.select("doc_id", "content").toPandas()
    toks = tokenize_code_series(pdf["content"])
    return dict(zip(pdf["doc_id"].astype(int), toks))


def test_split_fuzzy_query_mirrors_executor_edges(spark):
    """Round-7 review finding: '~1' is a fuzzy segment with an empty stem
    (dropped) on BOTH sides, and non-ASCII digits are not edit counts."""
    from dense_retriever_spark.index.fuzzy import (
        _fuzzy_segments,
        split_fuzzy_query,
    )

    q = "~1 merg~ x~٣"  # arabic digit 3: literal, not an edit count
    lits, fuzz = split_fuzzy_query(q)
    assert ("merg", 1) in fuzz
    assert all(s != "" for s, _ in fuzz)          # "~1" dropped
    assert "~1" not in lits                       # ...not a literal either
    qdf = spark.createDataFrame([(0, q)], "query_id long, query string")
    lit_df, fz_df = _fuzzy_segments(qdf, 1)
    exec_lits = {r["term"] for r in lit_df.collect()}
    exec_fuzz = {(r["stem"], r["edits"]) for r in fz_df.collect()}
    # driver mirror == executor classification on these edge segments
    drv_lits = set()
    from dense_retriever_spark.functions.tokenizer import tokenize_code_series
    import pandas as pd
    for seg in lits:
        drv_lits |= set(tokenize_code_series(pd.Series([seg]))[0])
    assert exec_lits == drv_lits
    assert exec_fuzz == {(s, e) for s, e in fuzz}
