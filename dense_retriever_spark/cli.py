"""spark-submit entry points mirroring the reference's retrieval CLI.

Reference: 12 click commands (cli/__init__.py:15-26); the three retrieval ones
(search_from_prebuilt, search_from_scratch, evaluate_index,
cli/ann_index.py:6-61) map to build-index / search / evaluate here. Package
with ``python tools/package.py`` → ``spark-submit --py-files engine.zip
-m dense_retriever_spark.cli <cmd> ...`` (or python -m locally).
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark(args):
    from dense_retriever_spark.session import get_spark

    return get_spark(app_name=f"dr-{args.cmd}", master=args.master)


def cmd_build_index(args) -> None:
    spark = _spark(args)
    from dense_retriever_spark.index.build import (
        assign_doc_ids_scalable,
        build_index,
    )
    from dense_retriever_spark.schemas import CORPUS_SCHEMA

    corpus = spark.read.schema(CORPUS_SCHEMA).parquet(args.corpus)
    ingested = assign_doc_ids_scalable(corpus)
    paths = build_index(
        ingested,
        args.index_dir,
        docs_per_shard=args.docs_per_shard,
        term_buckets=args.term_buckets,
        shard_batch=args.shard_batch,
    )
    print(json.dumps({"index": paths.root, "stats": json.load(open(paths.stats))}))


def cmd_search(args) -> None:
    spark = _spark(args)
    from dense_retriever_spark.index.search import search
    from dense_retriever_spark.sources.readers import read_queries_tsv

    queries = read_queries_tsv(spark, args.queries).selectExpr(
        "qid as query_id", "text as query"
    )
    res = search(spark, args.index_dir, queries, k=args.top_n)
    res.write.mode("overwrite").parquet(args.out)
    print(json.dumps({"results": args.out, "rows": res.count()}))


def cmd_evaluate(args) -> None:
    spark = _spark(args)
    from pyspark.sql import functions as F

    from dense_retriever_spark.operators.rank_metrics import (
        mrr,
        reciprocal_rank,
        results_as_ranked_lists,
    )
    from dense_retriever_spark.sources.readers import read_qrels

    results = spark.read.parquet(args.results)
    qrels = read_qrels(spark, args.qrels).select(
        F.col("qid").alias("query_id"), F.col("doc_id").alias("positive_doc_id")
    )
    rr = reciprocal_rank(results_as_ranked_lists(results), qrels)
    rr.write.mode("overwrite").option("header", "true").csv(args.out)
    print(json.dumps({"mrr": mrr(rr).collect()[0]["mrr"]}))


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="dense-retriever-spark")
    p.add_argument("--master", default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build-index")
    b.add_argument("--corpus", required=True)
    b.add_argument("--index-dir", required=True)
    b.add_argument("--docs-per-shard", type=int, default=1 << 14)
    b.add_argument("--term-buckets", type=int, default=8)
    b.add_argument("--shard-batch", type=int, default=None)
    b.set_defaults(fn=cmd_build_index)

    s = sub.add_parser("search")
    s.add_argument("--index-dir", required=True)
    s.add_argument("--queries", required=True, help="TSV qid\\ttext")
    s.add_argument("--top-n", type=int, default=50)  # reference default
    s.add_argument("--out", required=True)
    s.set_defaults(fn=cmd_search)

    e = sub.add_parser("evaluate")
    e.add_argument("--results", required=True)
    e.add_argument("--qrels", required=True)
    e.add_argument("--out", required=True)
    e.set_defaults(fn=cmd_evaluate)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main(sys.argv[1:])
