"""End-to-end refresh loop (reference training.py:49-96 analog): two rounds,
incremental index rebuild, round-seeded negative mining (SURVEY.md §2.12)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F


def test_refresh_two_rounds(spark, tmp_path):
    from dense_retriever_spark.corpus import synth_corpus, synth_queries
    from dense_retriever_spark.index.build import IndexPaths, _read_manifest
    from dense_retriever_spark.pipeline import refresh_rounds

    workdir = str(tmp_path / "refresh")
    batches = [synth_corpus(spark, 150, seed=1), synth_corpus(spark, 100, seed=2)]
    queries = synth_queries(spark, 12).select(
        F.col("query_id").alias("qid"), F.col("query").alias("text")
    )
    qrels = queries.select("qid", (F.col("qid") * 7 % 150).alias("doc_id"))

    rounds = refresh_rounds(
        spark, batches, queries, qrels, workdir, k=10, docs_per_shard=64
    )
    assert [r["round"] for r in rounds] == [0, 1]
    assert rounds[0]["n_docs"] == 150 and rounds[1]["n_docs"] == 250
    assert all(0.0 <= r["mrr@10"] <= 1.0 for r in rounds)

    # manifest records BOTH rounds, and round-0 shards were NOT rebuilt in
    # round 1 (incremental resume: fingerprints unchanged → build skipped)
    manifest = _read_manifest(IndexPaths(os.path.join(workdir, "index")), spark)
    tags = {row["build_tag"] for row in manifest.values()}
    assert tags == {"round0", "round1"}
    assert manifest[0]["build_tag"] == "round0"
    assert manifest[1]["build_tag"] == "round0"
    # shards covering the new docs carry the round-1 tag
    assert manifest[max(manifest)]["build_tag"] == "round1"

    # round-2 negatives differ from round-1 (new index + round-seeded pick)
    n0 = {
        (r["query_id"], r["hard_negative_id"])
        for r in spark.read.parquet(f"{workdir}/negatives_round0").collect()
    }
    n1 = {
        (r["query_id"], r["hard_negative_id"])
        for r in spark.read.parquet(f"{workdir}/negatives_round1").collect()
    }
    assert n0 and n1 and n0 != n1

    # train sets hydrate (query, doc, label) with both labels present
    t1 = spark.read.parquet(f"{workdir}/train_set_round1")
    labels = {r["label"] for r in t1.select("label").distinct().collect()}
    assert labels == {0, 1}

    # structured metrics on disk per round
    for rnd in (0, 1):
        m = json.load(open(f"{workdir}/metrics_round{rnd}.json"))
        assert m["round"] == rnd and "build_timings" in m


def test_refresh_dedup_exact_drops_recrawls(spark, tmp_path):
    """With dedup_exact, a batch that re-delivers existing docs contributes
    only its genuinely-new rows — no duplicate doc ids, no index growth from
    re-crawls."""
    from dense_retriever_spark.corpus import synth_corpus, synth_queries
    from dense_retriever_spark.pipeline import refresh_rounds

    workdir = str(tmp_path / "refresh_dd")
    b1 = synth_corpus(spark, 100, seed=5)
    # batch 2 = ALL of batch 1 again + 40 new docs
    b2 = b1.unionByName(synth_corpus(spark, 40, seed=6))
    queries = synth_queries(spark, 6).selectExpr("query_id as qid", "query as text")
    qrels = queries.select("qid", (F.col("qid") * 3 % 100).alias("doc_id"))
    rounds = refresh_rounds(
        spark, [b1, b2], queries, qrels, workdir, k=5,
        docs_per_shard=64, dedup_exact=True,
    )
    assert rounds[0]["n_docs"] == 100
    assert rounds[1]["n_docs"] == 140  # not 240: the 100 re-crawls dropped
    corpus = spark.read.parquet(f"{workdir}/corpus")
    assert corpus.select("doc_id").distinct().count() == 140
    assert corpus.select("content_sha").distinct().count() == 140


def test_search_excludes_tombstoned_docs(spark, tmp_path):
    """Search-time deletes: a dedup kill-list removes docs from results
    exactly, without rebuilding the index."""
    from dense_retriever_spark.corpus import synth_corpus, synth_queries
    from dense_retriever_spark.index.build import (
        assign_doc_ids_scalable,
        build_index,
    )
    from dense_retriever_spark.index.search import search

    idx = str(tmp_path / "tomb_idx")
    build_index(
        assign_doc_ids_scalable(synth_corpus(spark, 300, seed=9)), idx,
        docs_per_shard=64, term_buckets=2,
    )
    queries = synth_queries(spark, 10)
    base = search(spark, idx, queries, k=5).collect()
    assert base
    # tombstone every doc that currently ranks #1
    kill = {r["doc_id"] for r in base if r["rank"] == 1}
    kill_df = spark.createDataFrame([(d,) for d in kill], "doc_id long")
    after = search(spark, idx, queries, k=5, exclude_doc_ids=kill_df).collect()
    got_ids = {r["doc_id"] for r in after}
    assert not (kill & got_ids), "tombstoned doc appeared in results"
    # ranks still dense 1..k per query
    by_q = {}
    for r in after:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in by_q.values())
