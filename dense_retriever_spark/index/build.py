"""Sharded inverted-index build — the rebuild of the reference's index `fit`.

Reference analog: ``ANNIndex._fit_transformer_fn`` builds one in-RAM FAISS flat
index from all embeddings on one node
(/root/reference/dense_retriever/transforms/ann_index.py:87-91) and OOMs at
scale (np.vstack of every shard, :64). The rebuild is a two-phase distributed
build over (doc-range × term-bucket) groups:

PHASE A  (doc-partitioned serving index, ``shards/``)
  tokenized --explode--> (doc_id, term, tf, dl)
     shard       = doc_id // docs_per_shard        (doc-range partition)
     term_bucket = pmod(xxhash64(term), B)         (salt: bounds group size)
  groupBy(shard, term_bucket).applyInPandas → one posting row per (shard, term)
  with delta+varbyte postings and per-128-doc block-max metadata.
  The salt makes hot terms ('def' with df≈N) physically impossible to overload
  a single reducer: no group exceeds docs_per_shard × (rows/bucket) rows.

PHASE B  (term-merged global index, ``global/``)
  phase-A rows --repartition(P, xxhash64(term))--> groupBy(term)
  → order-preserving merge of sub-postings (shard ranges are disjoint and
  sorted, so merge = concat) → global (term, df, cf, postings, block meta).
  This is the "merges shards with salted-key skew mitigation" step of the
  north star; it also yields the global term-statistics table (df per term)
  that query time broadcasts.

Resumability: the build loops over shard batches; each completed batch appends
a manifest row (shard id, term range, row counts, bytes, input fingerprint,
status). On restart, shards with status=complete are filtered out of the input
and their parquet is left untouched (byte-identical resume, SURVEY.md §7.3).
"""

from __future__ import annotations

import json
import math
import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dense_retriever_spark import BM25_B, BM25_K1
from dense_retriever_spark.index.codec import (
    block_meta,
    decode_postings,
    encode_postings,
    merge_postings,
)

POSTING_ROW_SCHEMA = (
    "shard long, term string, df long, cf long, n_blocks int, postings binary, "
    "block_last_doc_id array<long>, block_max_tfn array<double>"
)
GLOBAL_ROW_SCHEMA = (
    "term string, df long, cf long, n_blocks int, postings binary, "
    "block_last_doc_id array<long>, block_max_tfn array<double>"
)


# --- doc-id assignment --------------------------------------------------------

def assign_doc_ids_scalable(corpus: DataFrame, partitions: int = 0) -> DataFrame:
    """Dense deterministic doc_id without a global single-partition sort.

    Two cheap jobs: (1) range-repartition + sort within partitions by
    (repo, path, commit) and count rows per partition; (2) add the partition
    offset to the within-partition row index. This is the classic
    zipWithIndex shape expressed with DataFrames + one tiny driver collect —
    O(P) driver state, no global sort, scales to 10^12 rows.
    """
    spark = corpus.sparkSession
    keys = [F.col("repo"), F.col("path"), F.col("commit")]
    p = partitions or corpus.sparkSession.sparkContext.defaultParallelism
    arranged = corpus.repartitionByRange(p, *keys).sortWithinPartitions(*keys)
    counts = (
        arranged.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .collect()
    )
    offsets = {}
    acc = 0
    for row in sorted(counts, key=lambda r: r["pid"]):
        offsets[row["pid"]] = acc
        acc += row["count"]
    off_map = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )

    from pyspark.sql.window import Window

    w = Window.partitionBy(F.spark_partition_id()).orderBy(*keys)
    return (
        arranged.withColumn(
            "doc_id",
            (
                off_map[F.spark_partition_id()]
                + F.row_number().over(w)
                - F.lit(1)
            ).cast("long"),
        )
        .withColumn("content_sha", F.sha2(F.col("content"), 256))
    )


# --- paths & manifest ---------------------------------------------------------

@dataclass
class IndexPaths:
    root: str

    @property
    def shards(self) -> str:
        return os.path.join(self.root, "shards")

    @property
    def global_dir(self) -> str:
        return os.path.join(self.root, "global")

    @property
    def docs(self) -> str:
        return os.path.join(self.root, "docs")

    @property
    def manifest(self) -> str:
        return os.path.join(self.root, "manifest")

    @property
    def stats(self) -> str:
        return os.path.join(self.root, "stats.json")


def _read_manifest(paths: IndexPaths) -> dict[int, dict]:
    out: dict[int, dict] = {}
    if not os.path.isdir(paths.manifest):
        return out
    for name in sorted(os.listdir(paths.manifest)):
        if name.endswith(".json"):
            with open(os.path.join(paths.manifest, name)) as f:
                row = json.load(f)
            out[row["shard_id"]] = row
    return out


def _write_manifest_row(paths: IndexPaths, row: dict) -> None:
    os.makedirs(paths.manifest, exist_ok=True)
    tmp = os.path.join(paths.manifest, f"shard_{row['shard_id']:06d}.json.tmp")
    dst = tmp[: -len(".tmp")]
    with open(tmp, "w") as f:
        json.dump(row, f)
    os.replace(tmp, dst)  # atomic: a crash never leaves a half-written manifest


# --- phase A: per-(shard, term) postings -------------------------------------

def _build_postings_groups(pdf: pd.DataFrame, k1: float, b: float, avgdl: float):
    """applyInPandas body for one (shard, term_bucket) group: numpy per term."""
    out = []
    pdf = pdf.sort_values(["term", "doc_id"], kind="mergesort")
    terms = pdf["term"].to_numpy()
    doc_ids = pdf["doc_id"].to_numpy(np.int64)
    tfs = pdf["tf"].to_numpy(np.int64)
    dls = pdf["dl"].to_numpy(np.int64)
    shard = int(pdf["shard"].iloc[0]) if len(pdf) else 0
    bounds = np.flatnonzero(np.r_[True, terms[1:] != terms[:-1]])
    bounds = np.r_[bounds, terms.size]
    for i in range(bounds.size - 1):
        lo, hi = bounds[i], bounds[i + 1]
        ids, tf, dl = doc_ids[lo:hi], tfs[lo:hi], dls[lo:hi]
        blast, bmax = block_meta(ids, tf, dl, k1, b, avgdl)
        out.append(
            (
                shard,
                terms[lo],
                int(hi - lo),
                int(tf.sum()),
                int(blast.size),
                encode_postings(ids, tf, dl),
                blast.tolist(),
                bmax.tolist(),
            )
        )
    return pd.DataFrame(
        out,
        columns=[
            "shard", "term", "df", "cf", "n_blocks", "postings",
            "block_last_doc_id", "block_max_tfn",
        ],
    )


def _merge_term_groups(pdf: pd.DataFrame, k1: float, b: float, avgdl: float):
    """applyInPandas body for phase B: merge one term's shard sub-postings."""
    out = []
    for term, grp in pdf.groupby("term", sort=False):
        grp = grp.sort_values("shard")  # disjoint ascending doc ranges
        blob = merge_postings(list(grp["postings"]))
        ids, tf, dl = decode_postings(blob)
        blast, bmax = block_meta(ids, tf, dl, k1, b, avgdl)
        out.append(
            (
                term,
                int(ids.size),
                int(tf.sum()),
                int(blast.size),
                blob,
                blast.tolist(),
                bmax.tolist(),
            )
        )
    return pd.DataFrame(
        out,
        columns=[
            "term", "df", "cf", "n_blocks", "postings",
            "block_last_doc_id", "block_max_tfn",
        ],
    )


# --- the build ----------------------------------------------------------------

def build_index(
    ingested: DataFrame,
    index_dir: str,
    docs_per_shard: int = 1 << 14,
    term_buckets: int = 8,
    k1: float = BM25_K1,
    b: float = BM25_B,
    shard_batch: int | None = None,
    merge_partitions: int | None = None,
) -> IndexPaths:
    """Build the full index from an ingested corpus (doc_id + content_sha).

    ``shard_batch``: how many doc-range shards to build per driver round
    (None = all in one Spark job). Smaller batches = finer-grained
    resumability; each round commits its shards' parquet + manifest rows
    before the next starts.
    """
    from dense_retriever_spark.operators.bm25 import (
        corpus_stats,
        doc_term_freqs,
        tokenize_corpus,
    )

    spark = ingested.sparkSession
    paths = IndexPaths(index_dir)
    os.makedirs(index_dir, exist_ok=True)

    tokenized = tokenize_corpus(ingested).cache()
    n_docs, avgdl = corpus_stats(tokenized)
    n_shards = max(1, math.ceil(n_docs / docs_per_shard))

    # doc dimension table: id codec mapping + per-row invariant (content_sha)
    ingested.select(
        "doc_id", "repo", "path", "commit", "lang", "content_sha"
    ).withColumn("shard", (F.col("doc_id") / docs_per_shard).cast("long")).write.mode(
        "overwrite"
    ).parquet(paths.docs)

    # per-shard input fingerprint: sha256 over doc_id:content_sha sorted by id
    fingerprints = {
        r["shard"]: r["fp"]
        for r in spark.read.parquet(paths.docs)
        .groupBy("shard")
        .agg(
            F.sha2(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("doc_id", "content_sha"))
                        ),
                        lambda s: F.concat_ws(":", s["doc_id"], s["content_sha"]),
                    ),
                ),
                256,
            ).alias("fp")
        )
        .collect()
    }

    tf = doc_term_freqs(tokenized).withColumn(
        "shard", (F.col("doc_id") / docs_per_shard).cast("long")
    ).withColumn(
        "term_bucket", F.pmod(F.xxhash64("term"), F.lit(term_buckets))
    )

    done = {
        s for s, row in _read_manifest(paths).items() if row["status"] == "complete"
    }
    todo = [s for s in range(n_shards) if s not in done]
    batch = shard_batch or len(todo) or 1

    for i in range(0, len(todo), batch):
        group = todo[i : i + batch]
        part = tf.filter(F.col("shard").isin(group))
        rows = part.groupBy("shard", "term_bucket").applyInPandas(
            lambda pdf: _build_postings_groups(pdf, k1, b, avgdl),
            schema=POSTING_ROW_SCHEMA,
        )
        (
            rows.repartition("shard")
            .sortWithinPartitions("term")
            .write.mode("overwrite")
            .partitionBy("shard")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(paths.shards)
        )
        # commit manifest rows for this batch
        stats_rows = {
            r["shard"]: r
            for r in spark.read.parquet(paths.shards)
            .filter(F.col("shard").isin(group))
            .groupBy("shard")
            .agg(
                F.count("*").alias("row_count"),
                F.min("term").alias("term_lo"),
                F.max("term").alias("term_hi"),
                F.sum(F.length("postings")).alias("bytes"),
            )
            .collect()
        }
        for s in group:
            r = stats_rows.get(s)
            _write_manifest_row(
                paths,
                {
                    "shard_id": s,
                    "term_lo": r["term_lo"] if r else None,
                    "term_hi": r["term_hi"] if r else None,
                    "row_count": int(r["row_count"]) if r else 0,
                    "bytes": int(r["bytes"]) if r else 0,
                    "input_fingerprint": fingerprints.get(s),
                    "status": "complete",
                },
            )

    # phase B: term-merged global index (explicit term-hash repartition)
    shards_df = spark.read.parquet(paths.shards)
    p = merge_partitions or spark.sparkContext.defaultParallelism
    merged = (
        shards_df.repartition(p, F.xxhash64("term"))
        .groupBy(F.xxhash64("term").alias("_g"))
        .applyInPandas(
            lambda pdf: _merge_term_groups(pdf, k1, b, avgdl),
            schema=GLOBAL_ROW_SCHEMA,
        )
    )
    merged.write.mode("overwrite").parquet(paths.global_dir)

    with open(paths.stats, "w") as f:
        json.dump(
            {
                "n_docs": n_docs,
                "avgdl": avgdl,
                "k1": k1,
                "b": b,
                "docs_per_shard": docs_per_shard,
                "n_shards": n_shards,
                "term_buckets": term_buckets,
            },
            f,
        )
    tokenized.unpersist()
    return paths
