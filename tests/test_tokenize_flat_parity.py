"""tokenize_code_flat (Arrow kernels) == tokenize_code_series (pandas), as
per-document token MULTISETS — the invariant the index build relies on."""

from __future__ import annotations

from collections import Counter

import pandas as pd

from dense_retriever_spark.functions.tokenizer import (
    tokenize_code_flat,
    tokenize_code_series,
)

CASES = [
    "getHTTPResponse snake_case_var",
    "def foo(x): return x",
    "Box2D plain UPPER",
    "",
    "   ",
    "camelCase HTTPServer a_b cD",
    "x" * 500,
    "def def def import import",
]


def test_flat_multiset_parity():
    s = pd.Series(CASES)
    doc_idx, codes, uniques, dl = tokenize_code_flat(s)
    got = [Counter() for _ in CASES]
    for d, c in zip(doc_idx, codes):
        got[d][uniques[c]] += 1
    want_lists = tokenize_code_series(s)
    for i, toks in enumerate(want_lists):
        assert got[i] == Counter(toks), f"doc {i}: {got[i]} != {Counter(toks)}"
        assert dl[i] == len(toks)


def test_flat_parity_on_synthetic_corpus(spark):
    from dense_retriever_spark.corpus import synth_corpus

    pdf = synth_corpus(spark, 300).toPandas()
    doc_idx, codes, uniques, dl = tokenize_code_flat(pdf["content"])
    want = tokenize_code_series(pdf["content"])
    assert (dl == want.map(len).to_numpy()).all()
    got0 = Counter(uniques[codes[doc_idx == 0]])
    assert got0 == Counter(want.iloc[0])


def test_doc_id_assignment_paths_agree(spark):
    """ingest() (windowed, test-scale) and assign_doc_ids_scalable
    (partition-offset, cluster-scale) assign IDENTICAL doc ids: both are the
    global rank in (repo, path, commit) order."""
    from dense_retriever_spark.corpus import ingest, synth_corpus
    from dense_retriever_spark.index.build import assign_doc_ids_scalable

    corpus = synth_corpus(spark, 400)
    a = {
        (r["repo"], r["path"], r["commit"]): r["doc_id"]
        for r in ingest(corpus).collect()
    }
    b = {
        (r["repo"], r["path"], r["commit"]): r["doc_id"]
        for r in assign_doc_ids_scalable(corpus, partitions=3).collect()
    }
    assert a == b
    assert sorted(a.values()) == list(range(400))  # dense 0..N-1
