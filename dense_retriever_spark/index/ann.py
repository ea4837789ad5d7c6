"""Persisted IVF ANN index: build once, search prebuilt — the dense twin of
the sharded BM25 index.

Reference analog: the reference BUILDS a FAISS index and persists it
(``build_and_save_index``, /root/reference/dense_retriever/transforms/
ann_index.py:87-98), then serves queries from the prebuilt artifact
(``search_from_prebuilt``, cli/ann_index.py:27-48). The north rule replaces
the GPU embedding model with BM25 for the flagship path; this module keeps
the reference's *dense* index-artifact workflow alive for embedding columns
the pipeline already carries (operators/similarity.py computes the same IVF
construction inline — here the quantizer and assignments become a reusable
on-disk artifact instead of per-query work).

Layout (all Spark-written parquet + one fs.py metadata file, so any scheme
the cluster's Hadoop conf supports works end-to-end):

  index_dir/
    centroids/   (centroid_id, cvec)          — K rows, broadcastable
    cells/       (vec_id, evec) PARTITIONED BY centroid_id
    ann_meta.json

Partitioning by centroid_id is the scale point: a query probes ``nprobe``
cells, and the probed-cell filter is pushed as a PARTITION filter on the
cells scan — Spark prunes every unprobed cell's files without opening them,
so query cost is ~(nprobe/K) of the corpus at any N. The probed-cell id
list is bounded by K (NOT by |Q|) by construction, so collecting it to the
driver for the literal pushdown is O(K) at any query-batch size.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ANN_FORMAT_VERSION = 1


class AnnIndexPaths:
    def __init__(self, root: str):
        self.root = root
        self.centroids = os.path.join(root, "centroids")
        self.cells = os.path.join(root, "cells")
        self.meta = os.path.join(root, "ann_meta.json")


def build_ann_index(
    embeddings: DataFrame,
    index_dir: str,
    n_centroids: int = 256,
    quantizer: str = "hash",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> AnnIndexPaths:
    """Build the persisted IVF index over (id, embedding) rows.

    ``quantizer``: ``'hash'`` = the deterministic fixed-K hash-sampled
    centroids (oracle-reproducible, K independent of N); ``'kmeans'`` = the
    trained Spark-ML quantizer (better cells, not SQL-expressible).
    Assignment is the same top-1-by-(rounded cosine DESC, centroid_id ASC)
    rule as operators.similarity.ivf_ann_topk, so a search of this index is
    bit-identical to the inline operator (tested + q50 oracle).
    """
    from dense_retriever_spark.index import fs
    from dense_retriever_spark.operators.similarity import (
        cosine_expr,
        ivf_centroids,
        ivf_kmeans_centroids,
    )
    from dense_retriever_spark.operators.topk import topk_per_group

    if quantizer == "hash":
        cents = ivf_centroids(embeddings, n_centroids, id_col, vec_col)
    elif quantizer == "kmeans":
        cents = ivf_kmeans_centroids(
            embeddings, n_centroids, id_col, vec_col, seed=seed
        )
    else:
        raise ValueError(f"unknown quantizer {quantizer!r}")

    paths = AnnIndexPaths(index_dir)
    cents.write.mode("overwrite").parquet(paths.centroids)
    cents_b = F.broadcast(
        embeddings.sparkSession.read.parquet(paths.centroids)
    )

    # top-1 centroid per vector: K is fixed, so the assignment is N × K work
    # with a broadcast small side — one shuffle (the window's partition by
    # vec_id), then a partitioned write clustered by cell
    scored = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("evec")
    ).crossJoin(cents_b).select(
        "vec_id", "evec", "centroid_id",
        cosine_expr(F.col("evec"), F.col("cvec")).alias("cdot"),
    )
    cells = topk_per_group(
        scored, "vec_id", "cdot", 1, id_col="centroid_id"
    ).select("vec_id", "evec", "centroid_id")
    cells.write.mode("overwrite").partitionBy("centroid_id").parquet(
        paths.cells
    )

    n_vec = embeddings.count()
    fs.write_text(
        paths.meta,
        json.dumps(
            {
                "format_version": ANN_FORMAT_VERSION,
                "n_centroids": n_centroids,
                "quantizer": quantizer,
                "n_vectors": n_vec,
                "seed": seed,
            }
        ),
        embeddings.sparkSession,
    )
    return paths


def load_ann_meta(index_dir: str, spark: SparkSession | None = None) -> dict:
    from dense_retriever_spark.index import fs

    meta = json.loads(fs.read_text(AnnIndexPaths(index_dir).meta, spark))
    v = meta.get("format_version")
    if v != ANN_FORMAT_VERSION:
        raise ValueError(
            f"ANN index at {index_dir} has format v{v}; this engine reads "
            f"v{ANN_FORMAT_VERSION} — rebuild the index"
        )
    return meta


def search_ann_index(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = 3,
    nprobe: int = 8,
    qid_col: str = "query_vec_id",
    qvec_col: str = "qvec",
    exclude_self: bool = True,
) -> DataFrame:
    """Top-k cosine ANN from the prebuilt index:
    (query_vec_id, vec_id, cosine, rank).

    Plan: queries × broadcast centroids → nprobe probes per query → the
    DISTINCT probed cell ids (≤ K rows — bounded by the centroid count, not
    |Q|) become a literal partition filter on the cells scan, so unprobed
    cells are pruned at file-listing time → broadcast the probe relation
    into the surviving cells → exact cosine + engine-wide (rounded cosine
    DESC, vec_id ASC) top-k. ``exclude_self`` drops vec_id == query_vec_id
    (the self-query convention of the inline operator / q37 oracle).
    """
    from dense_retriever_spark.operators.similarity import cosine_expr
    from dense_retriever_spark.operators.topk import topk_per_group

    load_ann_meta(index_dir, spark)
    paths = AnnIndexPaths(index_dir)
    cents = F.broadcast(spark.read.parquet(paths.centroids))

    q = queries.select(
        F.col(qid_col).alias("query_vec_id"), F.col(qvec_col).alias("qvec")
    )
    q_scored = q.crossJoin(cents).select(
        "query_vec_id", "qvec", "centroid_id",
        cosine_expr(F.col("qvec"), F.col("cvec")).alias("cdot"),
    )
    # materialized ONCE (localCheckpoint): the probe relation feeds both the
    # probed-cell collect below and the candidate join, and every downstream
    # action over the (lazy) result would otherwise re-run the |Q|×K
    # probe scoring from scratch
    probes = topk_per_group(
        q_scored, "query_vec_id", "cdot", nprobe, id_col="centroid_id"
    ).select("query_vec_id", "qvec", "centroid_id").localCheckpoint(
        eager=True
    )

    # bounded collect: at most K distinct cell ids regardless of |Q|
    probed = [
        r["centroid_id"]
        for r in probes.select("centroid_id").distinct().collect()
    ]
    cells = spark.read.parquet(paths.cells).filter(
        F.col("centroid_id").isin(probed)
    )
    cand = cells.join(F.broadcast(probes), "centroid_id")
    if exclude_self:
        cand = cand.filter(F.col("query_vec_id") != F.col("vec_id"))
    scored = cand.select(
        "query_vec_id",
        "vec_id",
        cosine_expr(F.col("qvec"), F.col("evec")).alias("cosine"),
    ).distinct()
    return topk_per_group(scored, "query_vec_id", "cosine", k, id_col="vec_id")
