"""Incremental corpus ingestion via Structured Streaming.

The reference is batch-only (SURVEY.md §2.11) — its refresh loop re-reads
everything each round (pipeline_steps/training.py:49-96). Here new corpus
files are picked up incrementally: a file-source stream with
``trigger(availableNow=True)`` drains whatever arrived since the last
checkpoint, appends tokenized rows to the staging table, and the (resumable)
index build folds the new shards in. Exactly-once comes from the stream
checkpoint + idempotent parquet appends.

Also provides a watermarked windowed aggregation over an event stream — the
standard late-data pattern — used by tests as the streaming coverage probe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dense_retriever_spark.functions.tokenizer import tokenize_code_expr
from dense_retriever_spark.schemas import CORPUS_SCHEMA


def stream_tokenize_corpus(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
) -> None:
    """Drain newly-arrived corpus parquet files → tokenized staging table.

    availableNow processes the backlog then stops (batch-boundary semantics,
    cluster-friendly: the same query with a processingTime trigger is a
    long-running incremental ingest)."""
    stream = (
        spark.readStream.schema(CORPUS_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_dir)
    )
    tokenized = stream.select(
        "repo",
        "path",
        "commit",
        F.sha2(F.col("content"), 256).alias("content_sha"),
        tokenize_code_expr("content").alias("terms"),
    ).withColumn("dl", F.size("terms"))
    q = (
        tokenized.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def windowed_event_counts(
    events: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked tumbling-window counts per event_type over a streaming
    (or batch — same code) events DataFrame: the late-data-tolerant windowed
    aggregation pattern."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total",
        )
    )
