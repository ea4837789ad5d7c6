"""Refresh-loop driver — the reference's flagship orchestration, Spark-first.

Reference analog: ``train_model_with_refresh``
(/root/reference/dense_retriever/pipeline_steps/training.py:49-96): iterate
{update embeddings → rebuild ANN index → search → construct train set →
continue training}. This engine has no GPU model, so the refresh signal is the
data itself: each round ingests the next corpus batch, INCREMENTALLY rebuilds
the index (the resumable build skips every shard whose fingerprint is
unchanged — only shards touched by new docs are built, tagged with the round
in the manifest), re-searches, mines round-seeded hard negatives, and writes a
new train set. That is the loop a user of the reference runs, minus the
PyTorch step the sandbox cannot host.

Scale notes: the corpus accumulates in an APPEND-ONLY parquet table — each
round appends just its batch (new docs get ids AFTER all existing ones, so
prior doc-range shards keep their ids and fingerprints, which is what makes
the rebuild incremental). Per-round driver state is a handful of scalars
(running doc count, MRR); every table stays executor-side.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def refresh_rounds(
    spark: SparkSession,
    corpus_batches: list[DataFrame],
    queries: DataFrame,
    qrels: DataFrame,
    workdir: str,
    k: int = 10,
    docs_per_shard: int = 256,
    term_buckets: int = 4,
    dedup_exact: bool = False,
) -> list[dict]:
    """Run one refresh round per corpus batch. Returns per-round metrics.

    ``queries``: (qid, text); ``qrels``: (qid, doc_id) — the reference's
    query-sample inputs (cli/preprocessing.py:8-14). Each round writes
    ``negatives_round{i}`` and ``train_set_round{i}`` under ``workdir`` and a
    ``metrics_round{i}.json`` with MRR@k + build timings (the north star's
    'structured metrics').

    ``dedup_exact``: drop byte-identical re-crawls at ingest — rows whose
    content sha already exists in the corpus (anti-join on content_sha) or
    is duplicated within the batch (keep the min-key row) never get a doc_id
    or enter the index. This is the dedup family wired into the refresh
    loop, where a real training pipeline applies it.
    """
    from dense_retriever_spark.index.build import (
        assign_doc_ids_scalable,
        build_index,
    )
    from dense_retriever_spark.index.search import search
    from dense_retriever_spark.operators.negatives import (
        build_train_set,
        construct_query_samples,
        mine_hard_negatives,
    )
    from dense_retriever_spark.operators.rank_metrics import (
        mrr,
        reciprocal_rank,
        results_as_ranked_lists,
    )

    os.makedirs(workdir, exist_ok=True)
    corpus_path = os.path.join(workdir, "corpus")
    index_dir = os.path.join(workdir, "index")
    # qrels may carry codec-prefixed ids ('D5'); the index keys on long
    # doc ids, so strip any non-digit prefix (contract.py F3/F4 codec)
    to_long = lambda c: F.regexp_replace(  # noqa: E731
        c.cast("string"), "^[^0-9]*", ""
    ).cast("long")
    samples = construct_query_samples(queries, qrels).withColumn(
        "positive_doc_id", to_long(F.col("positive_doc_id"))
    )

    rounds: list[dict] = []
    n_total = 0
    for rnd, batch in enumerate(corpus_batches):
        if dedup_exact:
            sha = F.sha2(F.col("content"), 256)
            # within-batch: one deterministic representative per content
            batch = (
                batch.groupBy(sha.alias("_sha"))
                .agg(
                    F.min(
                        F.struct("repo", "path", "commit", "lang", "content")
                    ).alias("r")
                )
                .select("_sha", "r.*")
            )
            if rnd > 0:
                # cross-round: drop shas already in the corpus; materialize
                # (localCheckpoint) so the append below doesn't write a path
                # its own lineage is reading
                seen = spark.read.parquet(corpus_path).select(
                    F.col("content_sha").alias("_sha")
                )
                batch = batch.join(seen, "_sha", "left_anti")
            batch = batch.drop("_sha").localCheckpoint(eager=True)
        # append this round's batch with doc ids AFTER all existing docs —
        # prior shards keep their (id, content) fingerprints, so the build
        # below reuses them byte-identically and constructs only new shards.
        # Keep a handle on the assignment result BEFORE withColumn: derived
        # DataFrames drop the _persisted_src attribute, so the unpersist
        # below must target assigned itself (round-2 ADVICE leak — one
        # DISK_ONLY partitioning leaked per refresh round)
        assigned = assign_doc_ids_scalable(batch)
        new_ing = assigned.withColumn(
            "doc_id", F.col("doc_id") + F.lit(n_total)
        )
        new_ing.write.mode("append").parquet(corpus_path)
        getattr(assigned, "_persisted_src", assigned).unpersist()
        ingested = spark.read.parquet(corpus_path)
        n_total = ingested.count()

        timings: dict = {}
        build_index(
            ingested,
            index_dir,
            docs_per_shard=docs_per_shard,
            term_buckets=term_buckets,
            timings=timings,
            build_tag=f"round{rnd}",
        )

        # query_mode='auto': the refresh loop searches the FULL query-sample
        # set each round (the reference's training.py:75-83 regime) — at
        # training-data scale that is millions of queries, which must flow
        # as a relation (distributed plane), not a driver-side broadcast
        results = search(
            spark, index_dir, samples.selectExpr("query_id", "query"), k=k,
            query_mode="auto",
        )
        ranked = results_as_ranked_lists(results, id_to_str=False)
        mined = mine_hard_negatives(samples, ranked, seed=rnd)
        mined.write.mode("overwrite").parquet(
            os.path.join(workdir, f"negatives_round{rnd}")
        )

        docs = spark.read.parquet(os.path.join(index_dir, "docs")).select(
            "doc_id", F.col("content").alias("text")
        )
        train = build_train_set(
            spark.read.parquet(os.path.join(workdir, f"negatives_round{rnd}")),
            docs,
        )
        train.write.mode("overwrite").parquet(
            os.path.join(workdir, f"train_set_round{rnd}")
        )

        rr = reciprocal_rank(
            ranked,
            qrels.select(
                F.col("qid").alias("query_id"),
                to_long(F.col("doc_id")).alias("positive_doc_id"),
            ),
            k=k,
        )
        round_mrr = float(mrr(rr).collect()[0]["mrr"])
        summary = {
            "round": rnd,
            "n_docs": int(n_total),
            f"mrr@{k}": round_mrr,
            "build_timings": timings,
        }
        with open(os.path.join(workdir, f"metrics_round{rnd}.json"), "w") as f:
            json.dump(summary, f)
        rounds.append(summary)
    return rounds
