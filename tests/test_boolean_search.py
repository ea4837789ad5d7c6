"""Boolean BM25 search (index/boolean.py): semantics vs a from-scratch
pandas reference, plane bit-identity, role/OOV edge rules, mask composition.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from dense_retriever_spark.index.boolean import (
    parse_boolean_query,
    search_boolean,
)
from dense_retriever_spark.index.build import build_index
from dense_retriever_spark.index.search import load_stats, search


@pytest.fixture(scope="module")
def idx(spark, tiny_corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("boolidx") / "index")
    build_index(tiny_corpus, d, docs_per_shard=64, term_buckets=4)
    return d


@pytest.fixture(scope="module")
def doc_tokens(tiny_corpus):
    from dense_retriever_spark.functions.tokenizer import tokenize_code_series

    pdf = tiny_corpus.select("doc_id", "content").toPandas()
    toks = tokenize_code_series(pdf["content"])
    return dict(zip(pdf["doc_id"].astype(int), toks))


def _queries(spark, qs):
    return spark.createDataFrame(
        list(enumerate(qs)), "query_id long, query string"
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def brute_boolean(doc_tokens, stats, query, k):
    """From-scratch reference: same grammar, same BM25 math, float64
    accumulation in sorted-term order."""
    parsed = parse_boolean_query(query)
    scored = sorted(t for t, r in parsed if r != 2)
    req = [t for t, r in parsed if r == 1]
    neg = {t for t, r in parsed if r == 2}
    n, avgdl = float(stats["n_docs"]), float(stats["avgdl"])
    k1, b = stats["k1"], stats["b"]
    df_of = {}
    for toks in doc_tokens.values():
        for t in set(toks):
            df_of[t] = df_of.get(t, 0) + 1
    if any(t not in df_of for t in req):
        return []
    scored = [t for t in scored if t in df_of]
    if not scored:
        return []
    hits = []
    for did, toks in doc_tokens.items():
        ts = set(toks)
        if req and not all(t in ts for t in req):
            continue
        if neg & ts:
            continue
        present = [t for t in scored if t in ts]
        if not present:
            continue
        dl = np.float64(len(toks))
        s = np.float64(0.0)
        for t in scored:
            if t not in ts:
                continue
            tf = np.float64(sum(1 for x in toks if x == t))
            idf = np.log(np.float64(1.0) + (n - df_of[t] + 0.5) / (df_of[t] + 0.5))
            denom = tf + k1 * ((1.0 - b) + (b * dl) / avgdl)
            s += ((idf * tf) * (k1 + 1.0)) / denom
        hits.append((did, float(s)))
    hits.sort(key=lambda x: (-x[1], x[0]))
    return hits[:k]


BOOL_QUERIES = [
    "merge batch",                     # bare only == plain BM25
    "+merge batch",                    # one required
    "+merge +batch def",               # conjunction + optional
    "merge -batch",                    # exclusion
    "+merge -batch -shards",           # required + two exclusions
    "+zzqq_oov_term merge",            # OOV required → empty
    "-merge",                          # forbidden only → empty
    "+merge -merge batch",             # conflict: forbidden wins
    "+sym0001 merge",                  # rare-term conjunction
]


def test_semantics_vs_brute_force(spark, idx, doc_tokens):
    stats = load_stats(idx)
    res = search_boolean(
        spark, idx, _queries(spark, BOOL_QUERIES), k=10
    ).collect()
    got = {}
    for r in res:
        got.setdefault(int(r["query_id"]), []).append(
            (int(r["doc_id"]), float(r["score"]), int(r["rank"]))
        )
    for qid in got:
        got[qid].sort(key=lambda x: x[2])
    for qid, q in enumerate(BOOL_QUERIES):
        want = brute_boolean(doc_tokens, stats, q, 10)
        have = got.get(qid, [])
        assert [d for d, _, _ in have] == [d for d, _ in want], (qid, q)
        for (gd, gs, _), (wd, ws) in zip(have, want):
            assert gs == pytest.approx(ws, rel=1e-12), (qid, q, gd)


def test_bare_only_equals_search(spark, idx):
    qs = _queries(spark, ["merge batch", "def import self"])
    a = _rows(search_boolean(spark, idx, qs, k=10))
    b = _rows(search(spark, idx, qs, k=10))
    assert a == b and len(a) > 0


def test_planes_bit_identical(spark, idx):
    qs = _queries(spark, BOOL_QUERIES)
    a = _rows(search_boolean(spark, idx, qs, k=10, query_mode="broadcast"))
    b = _rows(search_boolean(spark, idx, qs, k=10, query_mode="distributed"))
    assert a == b and len(a) > 0


def test_planes_bit_identical_with_masks(spark, idx, tiny_corpus):
    qs = _queries(spark, BOOL_QUERIES)
    kill = tiny_corpus.filter(F.col("doc_id") % 3 == 0).select("doc_id")
    allowed = tiny_corpus.filter(F.col("doc_id") % 2 == 0).select("doc_id")
    a = _rows(search_boolean(
        spark, idx, qs, k=10, query_mode="broadcast",
        exclude_doc_ids=kill, include_doc_ids=allowed,
    ))
    b = _rows(search_boolean(
        spark, idx, qs, k=10, query_mode="distributed",
        exclude_doc_ids=kill, include_doc_ids=allowed,
    ))
    assert a == b and len(a) > 0
    docs = {int(r[1]) for r in a}
    assert all(d % 3 != 0 and d % 2 == 0 for d in docs)


def test_masks_respect_boolean_semantics(spark, idx, doc_tokens):
    # tombstoning a doc that contains a required term must drop it from
    # results without breaking the conjunction for other docs
    stats = load_stats(idx)
    want_full = brute_boolean(doc_tokens, stats, "+merge +batch", 200)
    assert len(want_full) >= 2, "fixture needs >=2 conjunction matches"
    kill_id = want_full[0][0]
    kill = spark.createDataFrame([(kill_id,)], "doc_id long")
    res = search_boolean(
        spark, idx, _queries(spark, ["+merge +batch"]), k=10,
        exclude_doc_ids=kill,
    ).collect()
    got_ids = [int(r["doc_id"]) for r in sorted(res, key=lambda r: r["rank"])]
    want_ids = [d for d, _ in want_full if d != kill_id][:10]
    assert got_ids == want_ids


def test_oov_required_is_empty(spark, idx):
    res = search_boolean(
        spark, idx, _queries(spark, ["+zzqq_oov_term merge"]), k=10
    )
    assert res.count() == 0


def test_conflict_forbidden_wins(spark, idx):
    a = _rows(search_boolean(
        spark, idx, _queries(spark, ["+merge -merge batch"]), k=10
    ))
    b = _rows(search_boolean(
        spark, idx, _queries(spark, ["batch -merge"]), k=10
    ))
    assert a == b and len(a) > 0


def test_parse_boolean_query_roles():
    assert parse_boolean_query("+a -b c") == [("a", 1), ("b", 2), ("c", 0)]
    assert parse_boolean_query("+a -a a") == [("a", 2)]
    assert parse_boolean_query("  ") == []
    assert parse_boolean_query("+") == []
    # compound identifiers require every indexed term
    got = dict(parse_boolean_query("+snake_case"))
    assert got == {"snake": 1, "case": 1, "snake_case": 1}


# --- minimum_should_match ---------------------------------------------------


def test_msm_filters_by_optional_count(spark, idx):
    """msm=2: docs matching only one optional term drop out; scores of the
    survivors are unchanged (filtering, not rescoring)."""
    from dense_retriever_spark.index.boolean import search_boolean

    q = spark.createDataFrame(
        [(0, "window customer stream")], "query_id long, query string"
    )
    base = search_boolean(spark, idx, q, k=50).toPandas()
    m2 = search_boolean(
        spark, idx, q, k=50, min_should_match=2
    ).toPandas()
    assert set(m2["doc_id"]) <= set(base["doc_id"])
    assert len(m2) < len(base)
    merged = m2.merge(base, on=["query_id", "doc_id"], suffixes=("_m", "_b"))
    assert (merged["score_m"] == merged["score_b"]).all()


def test_msm_zero_is_identity_and_planes_agree(spark, idx):
    import pandas as pd

    from dense_retriever_spark.index.boolean import search_boolean

    q = spark.createDataFrame(
        [(0, "+table window customer stream"), (1, "window stream")],
        "query_id long, query string",
    )
    a = search_boolean(spark, idx, q, k=20).toPandas()
    b = search_boolean(
        spark, idx, q, k=20, min_should_match=0
    ).toPandas()
    pd.testing.assert_frame_equal(
        a.sort_values(["query_id", "rank"]).reset_index(drop=True),
        b.sort_values(["query_id", "rank"]).reset_index(drop=True),
    )
    c = search_boolean(
        spark, idx, q, k=20, min_should_match=2
    ).toPandas()
    d = search_boolean(
        spark, idx, q, k=20, min_should_match=2,
        query_mode="distributed",
    ).toPandas()
    pd.testing.assert_frame_equal(
        c.sort_values(["query_id", "rank"]).reset_index(drop=True),
        d.sort_values(["query_id", "rank"]).reset_index(drop=True),
    )


def test_msm_above_optional_count_matches_nothing(spark, idx):
    from dense_retriever_spark.index.boolean import search_boolean

    q = spark.createDataFrame(
        [(0, "window stream")], "query_id long, query string"
    )
    assert search_boolean(
        spark, idx, q, k=10, min_should_match=3
    ).count() == 0


def test_msm_ignores_pure_conjunction(spark, idx):
    """A query with only +required terms is unconstrained by msm."""
    import pandas as pd

    from dense_retriever_spark.index.boolean import search_boolean

    q = spark.createDataFrame(
        [(0, "+table +scan")], "query_id long, query string"
    )
    a = search_boolean(spark, idx, q, k=20).toPandas()
    b = search_boolean(
        spark, idx, q, k=20, min_should_match=5
    ).toPandas()
    pd.testing.assert_frame_equal(
        a.sort_values("rank").reset_index(drop=True),
        b.sort_values("rank").reset_index(drop=True),
    )


def test_msm_composes_with_masks(spark, idx):
    """Regression for the refactor-caught bug: msm must apply on the
    MASKED (cogrouped) broadcast path too. An include_doc_ids filter
    forces the cogroup plan; k exceeds the corpus so truncation cannot
    perturb the doc sets."""
    import pandas as pd

    from dense_retriever_spark.index.boolean import search_boolean

    # hot keywords co-occur in nearly every synthetic doc
    q = spark.createDataFrame(
        [(0, "def import return")], "query_id long, query string"
    )
    plain = search_boolean(
        spark, idx, q, k=300, min_should_match=3
    ).toPandas()
    loose = search_boolean(spark, idx, q, k=300).toPandas()
    assert 0 < len(plain) < len(loose)  # msm=3 actually filters

    allowed_ids = sorted(loose["doc_id"])[: len(loose) // 2]
    allowed = spark.createDataFrame(
        [(int(i),) for i in allowed_ids], "doc_id long"
    )
    a = search_boolean(
        spark, idx, q, k=300, min_should_match=3, include_doc_ids=allowed
    ).toPandas()
    # msm enforced INSIDE the cogrouped mask path: exactly the plain
    # msm survivors that are also allowed
    assert set(a["doc_id"]) == set(plain["doc_id"]) & set(allowed_ids)
    b = search_boolean(
        spark, idx, q, k=300, min_should_match=3, include_doc_ids=allowed,
        query_mode="distributed",
    ).toPandas()
    pd.testing.assert_frame_equal(
        a.sort_values(["query_id", "rank"]).reset_index(drop=True),
        b.sort_values(["query_id", "rank"]).reset_index(drop=True),
    )


def test_count_matches_agrees_with_msm_search(spark, idx):
    """Total-hits under msm must equal the msm search's full match-set
    size — a UI shows them side by side."""
    from dense_retriever_spark.index.boolean import (
        count_matches,
        search_boolean,
    )

    q = spark.createDataFrame(
        [(0, "def import return"), (1, "+class self zzqqnope")],
        "query_id long, query string",
    )
    full = search_boolean(
        spark, idx, q, k=10_000, min_should_match=2
    ).toPandas()
    counts = {
        r["query_id"]: r["n_matches"]
        for r in count_matches(spark, idx, q, min_should_match=2).collect()
    }
    sizes = full.groupby("query_id").size().to_dict()
    assert counts == {0: sizes.get(0, 0), 1: sizes.get(1, 0)}


def test_msm_shard_local_optional_absence_planes_agree(spark, tmp_path):
    """ADVICE r7 repro: a shard that holds a query's REQUIRED term but NONE
    of its optional terms must still enforce min_should_match on the
    distributed plane — the shard-present optional list is empty there, and
    the matcher's `msm > 0 and opt` guard alone would wave every doc
    through (the broadcast plane carries the GLOBAL optional list and was
    always correct)."""
    rows = [(i, "alpha gamma delta") for i in range(4)] + [
        (i, "alpha beta gamma") for i in range(4, 8)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    inp = docs.select(
        "doc_id",
        F.lit("r").alias("repo"),
        F.concat(F.lit("p"), F.col("doc_id").cast("string")).alias("path"),
        F.concat(F.lit("c"), F.col("doc_id").cast("string")).alias("commit"),
        F.lit("py").alias("lang"),
        F.col("text").alias("content"),
        F.sha2(F.col("text"), 256).alias("content_sha"),
    )
    d = str(tmp_path / "idx")
    build_index(inp, d, docs_per_shard=4, term_buckets=2)
    q = spark.createDataFrame(
        [(0, "+alpha beta")], "query_id long, query string"
    )
    bc = search_boolean(
        spark, d, q, k=50, min_should_match=1
    ).toPandas()
    ds = search_boolean(
        spark, d, q, k=50, min_should_match=1, query_mode="distributed"
    ).toPandas()
    # only the docs that actually contain >= 1 optional term may match
    assert sorted(bc["doc_id"].astype(int)) == [4, 5, 6, 7]
    pd.testing.assert_frame_equal(
        bc.sort_values(["query_id", "rank"]).reset_index(drop=True),
        ds.sort_values(["query_id", "rank"]).reset_index(drop=True),
    )
