"""End-to-end parity smoke on the reference's own MS MARCO fixture.

The reference ships a 5-doc MS MARCO slice
(/root/reference/tests/files/test_docs.json, ids D1555982, D301595,
D1359209, D2147834, D1568809 — (doc_id, text) JSONL, the shape its
preprocessing reads with pd.read_json(lines=True),
transforms/preprocessing.py:110) and evaluates retrieval with an MRR over
ranked doc-id-string lists (transforms/ann_index.py:122-156). This test
runs that exact file through our ingest → index → search → evaluate path:
read_docs_jsonl, the D-prefixed doc-id codec on the REAL ids (the
reference's FAISS IDMap int64 remap, ann_index.py:13-21,88-90), a BM25
index build, search, and MRR — same observable semantics, different
engine. Skipped when the reference checkout is absent (CI portability).
"""

import os

import pytest
from pyspark.sql import functions as F

FIXTURE = "/root/reference/tests/files/test_docs.json"
REF_IDS = {"D1555982", "D301595", "D1359209", "D2147834", "D1568809"}

pytestmark = pytest.mark.skipif(
    not os.path.exists(FIXTURE), reason="reference fixture not present"
)


def _read_fixture(spark):
    from dense_retriever_spark.sources.readers import read_docs_jsonl

    return read_docs_jsonl(spark, FIXTURE)


def test_read_docs_jsonl_reads_the_reference_fixture(spark):
    docs = _read_fixture(spark)
    rows = docs.collect()
    assert {r["doc_id"] for r in rows} == REF_IDS
    assert all(isinstance(r["text"], str) and len(r["text"]) > 100 for r in rows)


def test_docid_codec_roundtrips_real_msmarco_ids(spark):
    """The D-prefix codec must round-trip the reference's actual doc-id
    strings: strip the prefix to the FAISS-style int64, re-encode, get the
    original back — for every id in the fixture."""
    docs = _read_fixture(spark)
    rt = docs.select(
        "doc_id",
        F.substring("doc_id", 2, 18).cast("bigint").alias("num"),
    ).select(
        "doc_id",
        "num",
        F.format_string("D%d", F.col("num")).alias("re_encoded"),
    )
    rows = rt.collect()
    assert len(rows) == 5
    for r in rows:
        assert r["num"] is not None and r["num"] > 0
        assert r["re_encoded"] == r["doc_id"], (r["doc_id"], r["re_encoded"])


def test_index_search_evaluate_on_reference_corpus(spark, tmp_path):
    """Build an index over the 5 real docs (dense internal ids, original
    numeric ids carried through — the IDMap pattern), search with a
    mid-document phrase from each doc as its query, map results back to the
    reference's D… strings, and score MRR the reference's way. Every query
    must retrieve its source doc at rank 1 — MRR 1.0 on the reference's own
    data."""
    import json

    from pyspark.sql.window import Window

    from dense_retriever_spark.index.build import build_index
    from dense_retriever_spark.index.search import search
    from dense_retriever_spark.operators.rank_metrics import (
        mrr,
        reciprocal_rank,
        results_as_ranked_lists,
    )

    docs = _read_fixture(spark)
    # dense internal doc_id (the index's shard-range key) + the original
    # MS MARCO numeric id for the round-trip back to D… strings
    ingested = (
        docs.select(
            F.substring("doc_id", 2, 18).cast("bigint").alias("orig_num"),
            F.col("text").alias("content"),
            F.lit("msmarco").alias("repo"),
            F.col("doc_id").alias("path"),
            F.lit("fixture").alias("commit"),
            F.lit("en").alias("lang"),
        )
        .withColumn(
            "doc_id",
            F.row_number().over(Window.orderBy("orig_num")).cast("long") - 1,
        )
        .withColumn("content_sha", F.sha2("content", 256))
        .localCheckpoint(eager=True)
    )
    idx = str(tmp_path / "ref_idx")
    build_index(ingested, idx, docs_per_shard=4)

    # queries: words 20..31 of each doc (past any URL preamble) — a phrase
    # unique enough that BM25 must put the source doc first among 5
    with open(FIXTURE) as f:
        raw = [json.loads(line) for line in f]
    queries = spark.createDataFrame(
        [(d["doc_id"], " ".join(d["text"].split()[20:32])) for d in raw],
        "doc_id_str string, query string",
    ).withColumn(
        "query_id", F.substring("doc_id_str", 2, 18).cast("bigint")
    ).select("query_id", "query")

    res = search(spark, idx, queries, k=5)
    # internal dense id -> original numeric id, so ranked lists carry the
    # reference's real D… ids
    res_orig = (
        res.join(
            F.broadcast(ingested.select("doc_id", "orig_num")), "doc_id"
        )
        .select("query_id", F.col("orig_num").alias("doc_id"), "score", "rank")
    )
    ranked = results_as_ranked_lists(res_orig, id_to_str=True)
    qrels = spark.createDataFrame(
        [(int(d["doc_id"][1:]), d["doc_id"]) for d in raw],
        "query_id long, positive_doc_id string",
    )
    rr = reciprocal_rank(ranked, qrels, k=5)
    rows = {r["query_id"]: r["reciprocal_rank"] for r in rr.collect()}
    assert len(rows) == 5
    assert all(v == 1.0 for v in rows.values()), rows
    assert mrr(rr).collect()[0]["mrr"] == 1.0
