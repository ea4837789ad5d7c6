"""Positional indexes + phrase search (index/phrase.py).

Correctness model: a brute-force Python tokenizer+scan over the corpus —
positions must follow the canonical tokenize_code_series order, phrase
occurrence counts include overlapping starts, ranks are (n_occ DESC,
doc_id ASC).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dense_retriever_spark.corpus import ingest, synth_corpus
from dense_retriever_spark.functions.tokenizer import (
    tokenize_code_flat,
    tokenize_code_series,
)
from dense_retriever_spark.index.build import build_index
from dense_retriever_spark.index.codec import (
    decode_position_stream,
    encode_position_stream,
)
from dense_retriever_spark.index.phrase import search_phrase
from dense_retriever_spark.index.search import load_stats, search

import pandas as pd


def test_position_stream_roundtrip():
    rng = np.random.default_rng(3)
    tfs = rng.integers(1, 6, size=40).astype(np.int64)
    parts = [
        np.sort(rng.choice(500, size=int(t), replace=False)) for t in tfs
    ]
    flat = np.concatenate(parts).astype(np.int64)
    blob = encode_position_stream(flat, tfs)
    back = decode_position_stream(blob, tfs)
    assert (back == flat).all()
    assert encode_position_stream(np.empty(0, np.int64), np.empty(0, np.int64)) == b""


def test_flat_positions_match_series_order():
    texts = pd.Series(
        [
            "getHTTPResponse snake_case foo bar foo",
            "plain words only here",
            "",
            "a a a",
        ]
    )
    doc_idx, codes, uniques, dl, pos = tokenize_code_flat(
        texts, with_positions=True
    )
    canonical = tokenize_code_series(texts)
    terms = np.asarray(uniques)[codes]
    for d in range(len(texts)):
        mask = doc_idx == d
        got = [None] * int(dl[d])
        for t, p in zip(terms[mask], pos[mask]):
            got[int(p)] = t
        assert got == list(canonical.iloc[d])


def _brute_phrase(corpus_rows, phrase_tokens):
    """doc_id -> n overlapping starts."""
    out = {}
    L = len(phrase_tokens)
    for doc_id, toks in corpus_rows:
        n = sum(
            1
            for i in range(len(toks) - L + 1)
            if toks[i : i + L] == phrase_tokens
        )
        if n:
            out[doc_id] = n
    return out


@pytest.fixture(scope="module")
def phrase_idx(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("phrase") / "idx")
    corpus = ingest(synth_corpus(spark, 260, seed=9)).localCheckpoint(
        eager=True
    )
    build_index(corpus, idx, docs_per_shard=32, term_buckets=2,
                positions=True)
    rows = corpus.select("doc_id", "content").collect()
    toks = tokenize_code_series(
        pd.Series([r["content"] for r in rows])
    )
    corpus_rows = [
        (int(r["doc_id"]), list(t)) for r, t in zip(rows, toks)
    ]
    return idx, corpus_rows


def test_phrase_search_matches_bruteforce(spark, phrase_idx):
    idx, corpus_rows = phrase_idx
    assert load_stats(idx)["positions"] is True
    # pick phrases that actually occur: take bigrams/trigram from doc 0
    toks0 = corpus_rows[0][1]
    phrases = [
        (0, " ".join(toks0[0:2])),
        (1, " ".join(toks0[3:6])),
        (2, toks0[1]),                      # single-term phrase: n_occ == tf
        (3, "zzz notaterm never"),          # no match
    ]
    qdf = spark.createDataFrame(phrases, "query_id long, query string")
    got = search_phrase(spark, idx, qdf, k=1000).collect()
    got_map: dict[tuple[int, int], int] = {
        (int(r["query_id"]), int(r["doc_id"])): int(r["n_occ"]) for r in got
    }
    for qid, phrase in phrases:
        expect = _brute_phrase(
            corpus_rows, list(tokenize_code_series(pd.Series([phrase]))[0])
        )
        for doc_id, n in expect.items():
            assert got_map.get((qid, doc_id)) == n, (qid, phrase, doc_id)
        assert sum(1 for (q, _d) in got_map if q == qid) == len(expect)


def test_phrase_planes_bit_identical(spark, phrase_idx):
    """broadcast and distributed phrase planes must return identical rows
    (the q38/q49 interchangeability guarantee, phrase edition) — including
    multi-shard matches, repeated-term phrases, and no-match phrases."""
    idx, corpus_rows = phrase_idx
    toks0 = corpus_rows[0][1]
    qdf = spark.createDataFrame(
        [
            (0, " ".join(toks0[0:2])),
            (1, toks0[2]),
            (2, " ".join([toks0[1], toks0[1]])),  # repeated term
            (3, "zzznotaterm never"),
        ],
        "query_id long, query string",
    )
    b = sorted(map(tuple, search_phrase(
        spark, idx, qdf, k=100, query_mode="broadcast").collect()))
    d = sorted(map(tuple, search_phrase(
        spark, idx, qdf, k=100, query_mode="distributed").collect()))
    assert b == d and len(b) > 0
    a = sorted(map(tuple, search_phrase(
        spark, idx, qdf, k=100, query_mode="auto").collect()))
    assert a == b
    with pytest.raises(ValueError, match="query_mode"):
        search_phrase(spark, idx, qdf, query_mode="nope")


def test_phrase_rank_and_k(spark, phrase_idx):
    idx, corpus_rows = phrase_idx
    toks0 = corpus_rows[0][1]
    qdf = spark.createDataFrame(
        [(7, toks0[0])], "query_id long, query string"
    )
    res = search_phrase(spark, idx, qdf, k=5).collect()
    assert len(res) <= 5
    ordered = sorted(
        res, key=lambda r: (-int(r["n_occ"]), int(r["doc_id"]))
    )
    assert [int(r["rank"]) for r in ordered] == list(range(1, len(res) + 1))


def test_phrase_tombstones(spark, phrase_idx):
    """exclude_doc_ids masks phrase matches exactly at query time on both
    planes — same contract as search()'s kill-list."""
    idx, corpus_rows = phrase_idx
    toks0 = corpus_rows[0][1]
    qdf = spark.createDataFrame(
        [(0, toks0[1])], "query_id long, query string"
    )
    full = search_phrase(spark, idx, qdf, k=1000).collect()
    assert full
    killed_ids = sorted({int(r["doc_id"]) for r in full})[::2]
    kill = spark.createDataFrame(
        [(i,) for i in killed_ids], "doc_id long"
    )
    for mode in ("broadcast", "distributed"):
        masked = search_phrase(
            spark, idx, qdf, k=1000, query_mode=mode, exclude_doc_ids=kill
        ).collect()
        got = {int(r["doc_id"]) for r in masked}
        assert got == {int(r["doc_id"]) for r in full} - set(killed_ids)
        # surviving n_occ values unchanged
        full_map = {int(r["doc_id"]): int(r["n_occ"]) for r in full}
        for r in masked:
            assert int(r["n_occ"]) == full_map[int(r["doc_id"])]
        # include_doc_ids: the allowed-set filter is the exact complement
        incl = spark.createDataFrame(
            [(i,) for i in killed_ids], "doc_id long"
        )
        only = search_phrase(
            spark, idx, qdf, k=1000, query_mode=mode, include_doc_ids=incl
        ).collect()
        assert {int(r["doc_id"]) for r in only} == (
            {int(r["doc_id"]) for r in full} & set(killed_ids)
        )


def test_positions_flag_guards(spark, tmp_path):
    corpus = ingest(synth_corpus(spark, 64, seed=11)).localCheckpoint(
        eager=True
    )
    plain = str(tmp_path / "plain")
    build_index(corpus, plain, docs_per_shard=32, term_buckets=2)
    qdf = spark.createDataFrame([(0, "x")], "query_id long, query string")
    with pytest.raises(ValueError, match="without positions"):
        search_phrase(spark, plain, qdf)
    # incremental flag switch is rejected
    with pytest.raises(ValueError, match="cannot switch"):
        build_index(corpus, plain, docs_per_shard=32, term_buckets=2,
                    positions=True)
    # scoring search is unaffected by the positional layout
    pos = str(tmp_path / "pos")
    build_index(corpus, pos, docs_per_shard=32, term_buckets=2,
                positions=True)
    qs = spark.createDataFrame(
        [(0, "row table hash")], "query_id long, query string"
    )
    a = sorted(map(tuple, search(spark, plain, qs, k=5).collect()))
    b = sorted(map(tuple, search(spark, pos, qs, k=5).collect()))
    assert a == b


def test_positional_index_resume_and_inherit(spark, tmp_path):
    """positions=None inherits; incremental append keeps the flag and old
    shards' fingerprints."""
    idx = str(tmp_path / "idx")
    c1 = ingest(synth_corpus(spark, 96, seed=13)).localCheckpoint(eager=True)
    build_index(c1, idx, docs_per_shard=32, term_buckets=2, positions=True)
    c2 = c1.unionByName(
        ingest(synth_corpus(spark, 32, seed=14))
        .withColumn("doc_id", F.col("doc_id") + F.lit(96))
    ).localCheckpoint(eager=True)
    build_index(c2, idx, docs_per_shard=32, term_buckets=2)  # inherit
    st = load_stats(idx)
    assert st["positions"] is True and st["n_docs"] == 128
    qdf = spark.createDataFrame(
        [(0, "table hash")], "query_id long, query string"
    )
    search_phrase(spark, idx, qdf, k=5).collect()  # still phrase-capable
