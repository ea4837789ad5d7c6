"""Exact BM25 operator vs an independent pure-Python oracle (SURVEY.md §5.2).

The pure-Python oracle below is a third, from-first-principles implementation
(own tokenizer regexes, own BM25 loop) — not a call into the library code — so
agreement is evidence of correctness, not of shared bugs.
"""

from __future__ import annotations

import math
import re
from collections import Counter

from dense_retriever_spark import BM25_B, BM25_K1
from dense_retriever_spark.operators.bm25 import bm25_exact_topk, tokenize_corpus

K = 10

_CAMEL2 = re.compile(r"([A-Z]+)([A-Z][a-z])")
_CAMEL1 = re.compile(r"([a-z0-9])([A-Z])")
_COMPOUND = re.compile(r"(_|[a-z0-9][A-Z]|[A-Z]{2,}[a-z])")


def py_tokenize(text: str) -> list[str]:
    seg = _CAMEL1.sub(r"\1 \2", _CAMEL2.sub(r"\1 \2", text))
    segments = [t for t in re.split(r"[^a-z0-9]+", seg.lower()) if t]
    idents = [t for t in re.split(r"[^A-Za-z0-9_]+", text) if t]
    compounds = [t.lower() for t in idents if _COMPOUND.search(t)]
    return segments + compounds


def py_bm25_topk(docs: dict[int, str], queries: dict[int, str], k: int):
    toks = {d: py_tokenize(t) for d, t in docs.items()}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    df: Counter = Counter()
    tfs = {}
    for d, ts in toks.items():
        tf = Counter(ts)
        tfs[d] = tf
        df.update(tf.keys())
    out = {}
    for qid, q in queries.items():
        qterms = sorted(set(py_tokenize(q)))
        scores = {}
        for d, tf in tfs.items():
            s = 0.0
            for t in qterms:  # sorted-term order, matching the engine
                f = tf.get(t)
                if not f:
                    continue
                idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
                dl = len(toks[d])
                s += idf * f * (BM25_K1 + 1.0) / (
                    f + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl)
                )
            if s > 0.0:
                scores[d] = s
        ranked = sorted(scores.items(), key=lambda x: (-x[1], x[0]))[:k]
        out[qid] = [(d, s, i + 1) for i, (d, s) in enumerate(ranked)]
    return out


def test_exact_bm25_matches_python_oracle(spark, tiny_corpus, tiny_queries):
    tokenized = tokenize_corpus(tiny_corpus)
    got = bm25_exact_topk(tokenized, tiny_queries, k=K)
    got_rows = got.collect()

    docs = {r["doc_id"]: r["content"] for r in tiny_corpus.collect()}
    qs = {r["query_id"]: r["query"] for r in tiny_queries.collect()}
    want = py_bm25_topk(docs, qs, K)

    got_by_q: dict[int, list] = {}
    for r in sorted(got_rows, key=lambda r: (r["query_id"], r["rank"])):
        got_by_q.setdefault(r["query_id"], []).append(
            (r["doc_id"], r["score"], r["rank"])
        )
    for qid, expected in want.items():
        actual = got_by_q.get(qid, [])
        assert [a[0] for a in actual] == [e[0] for e in expected], (
            f"doc order mismatch for query {qid}: {actual} vs {expected}"
        )
        for a, e in zip(actual, expected):
            assert abs(a[1] - e[1]) < 1e-9, f"score drift q{qid}: {a} vs {e}"
    # queries with no expected hits must have no rows
    for qid in got_by_q:
        assert qid in want and want[qid], f"unexpected results for query {qid}"


def test_topk_tie_break_deterministic(spark, tiny_corpus, tiny_queries):
    """Two runs produce byte-identical results (ordering fully specified)."""
    tokenized = tokenize_corpus(tiny_corpus)
    a = bm25_exact_topk(tokenized, tiny_queries, k=K).collect()
    b = bm25_exact_topk(tokenized, tiny_queries, k=K).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
