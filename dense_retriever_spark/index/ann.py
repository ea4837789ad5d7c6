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
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ANN_FORMAT_VERSION = 1


@dataclass
class AnnSearchHandle:
    """Lazy ``search_ann_index(eager=False)`` result: the composable result
    plan plus the probe-cache lifetime the caller owns. Call ``release()``
    (idempotent) once the plan has been executed/materialized. Explicit
    fields instead of an attribute monkeypatched onto the DataFrame
    (round-5 verdict): a ``.select()`` on a DataFrame silently dropped the
    attribute, orphaning the cached probe blocks — the handle keeps the
    lifetime visible however the plan is transformed. DataFrame attribute
    access delegates to ``df``, so the handle composes like the plan it
    wraps."""

    df: DataFrame
    probes: DataFrame

    def release(self) -> None:
        self.probes.unpersist()

    def __getattr__(self, name: str):
        return getattr(self.df, name)


#: query_mode='auto' switches the probes-side join broadcast → shuffle above
#: this many probe rows (= |Q| × nprobe). Unlike the probed-CELL id list
#: (bounded by K), the probe relation carries full query vectors and grows
#: linearly with |Q| — broadcasting it at training-set scale is the same
#: driver/executor-memory ceiling the BM25 distributed plane exists to
#: avoid. ~50k rows × a 64-dim double vector ≈ 25 MB; size down for fat
#: embeddings.
ANN_PROBE_BROADCAST_LIMIT = 50_000

#: warn at search time when the index's cluster-coherence statistic (mean
#: top-1 centroid cosine, computed at build time over the assignment the
#: build already materialized) says the corpus is in the noise-dominated
#: regime where coarse quantizers are blind: the round-5 recall sweep
#: (tools/bench_ann_recall.py, BENCH/ann_recall_sigma*.json) measured IVF
#: recall@10 ≤ 0.65 even at nprobe=32 on weakly-clustered data — which
#: shows a hash-quantizer mean top-1 cosine ≈ 0.36 (σ=0.35, dim 64) —
#: while tightly-clustered data (≈ 0.62 at σ=0.08) reaches recall 1.0.
#: 0.45 splits the two measured regimes. Reference analog: the index-type
#: choice at /root/reference/dense_retriever/transforms/ann_index.py:88.
ANN_COHERENCE_WARN = 0.45


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

    # ONE agg over the written cells (scan of what was just persisted, not
    # a re-run of the N×K assignment) yields the vector count AND the
    # cluster-coherence statistic: mean top-1 centroid cosine. Low values
    # mean the quantizer's cells don't capture neighborhoods — the regime
    # the round-5 recall sweep proved IVF is blind in (recall ≤ 0.65 at
    # nprobe=32) — so searches of this index warn and point at the SRP
    # operator, which handles weak structure by hashing the vectors
    # themselves (see ANN_COHERENCE_WARN).
    spark = embeddings.sparkSession
    row = (
        spark.read.parquet(paths.cells)
        .join(cents_b, "centroid_id")
        .agg(
            F.count("*").alias("n"),
            F.avg(cosine_expr(F.col("evec"), F.col("cvec"))).alias("coh"),
        )
        .collect()[0]
    )
    coh = None if row["coh"] is None else round(float(row["coh"]), 6)
    fs.write_text_atomic(
        paths.meta,
        json.dumps(
            {
                "format_version": ANN_FORMAT_VERSION,
                "n_centroids": n_centroids,
                "quantizer": quantizer,
                "n_vectors": int(row["n"]),
                "mean_top1_cosine": coh,
                # train-time reference points for should_recluster: how far
                # the incrementally-refreshed index has drifted from the
                # state its quantizer was actually trained on
                "n_at_train": int(row["n"]),
                "coherence_at_train": coh,
                "seed": seed,
            }
        ),
        spark,
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
    query_mode: str = "auto",
    eager: bool = True,
) -> DataFrame:
    """Top-k cosine ANN from the prebuilt index:
    (query_vec_id, vec_id, cosine, rank).

    Plan: queries × broadcast centroids → nprobe probes per query → the
    DISTINCT probed cell ids (≤ K rows — bounded by the centroid count, not
    |Q|) become a literal partition filter on the cells scan, so unprobed
    cells are pruned at file-listing time → join the probe relation into
    the surviving cells → exact cosine + engine-wide (rounded cosine
    DESC, vec_id ASC) top-k. ``exclude_self`` drops vec_id == query_vec_id
    (the self-query convention of the inline operator / q37 oracle).

    ``query_mode``: the probes-side join strategy — the dense twin of
    ``search(query_mode=...)``. ``'broadcast'`` hints the probe relation
    into every surviving cell partition (right for interactive batches);
    ``'shuffle'`` lets it be a shuffle join on centroid_id (the probe
    relation carries full query vectors, so at training-set |Q| the
    broadcast is exactly the driver/executor ceiling the distributed BM25
    plane removed); ``'auto'`` (default) counts the cached probe rows — a
    ~free job, the relation is persisted anyway — and picks broadcast below
    ``ANN_PROBE_BROADCAST_LIMIT``.

    ``eager`` (default): run the search now, materialize the bounded
    (≤ k × |Q|-row) result executor-side (localCheckpoint), and unpersist
    the probe relation immediately — otherwise each call pins probe blocks
    on executors until garbage collection (the leak class round-3 fixed for
    search()'s broadcasts). ``eager=False`` returns an ``AnnSearchHandle``
    — the lazy plan (``.df``, with DataFrame attribute delegation for
    composition) plus ``release()``, which the caller invokes once the plan
    has executed. On ANY error after the probe relation is persisted, the
    cache is released before the exception propagates.
    """
    from dense_retriever_spark.operators.similarity import cosine_expr
    from dense_retriever_spark.operators.topk import topk_per_group

    if query_mode not in ("auto", "broadcast", "shuffle"):
        # validate BEFORE any job runs: failing after the probe relation is
        # persisted would leak its cached blocks (no unpersist on the error
        # path)
        raise ValueError(f"unknown query_mode {query_mode!r}")
    meta = load_ann_meta(index_dir, spark)
    coh = meta.get("mean_top1_cosine")
    if coh is not None and coh < ANN_COHERENCE_WARN:
        import warnings

        warnings.warn(
            f"ANN index at {index_dir} has mean top-1 centroid cosine "
            f"{coh:.3f} < {ANN_COHERENCE_WARN} — the corpus is in the "
            "noise-dominated regime where IVF cells don't capture "
            "neighborhoods (measured recall@10 <= 0.65 at nprobe=32, "
            "BENCH/ann_recall_sigma0.35.json); raise nprobe, or prefer "
            "operators.similarity.srp_ann_topk, which stays accurate on "
            "weakly-clustered data",
            RuntimeWarning,
            stacklevel=2,
        )
    paths = AnnIndexPaths(index_dir)
    cents = F.broadcast(spark.read.parquet(paths.centroids))

    q = queries.select(
        F.col(qid_col).alias("query_vec_id"), F.col(qvec_col).alias("qvec")
    )
    q_scored = q.crossJoin(cents).select(
        "query_vec_id", "qvec", "centroid_id",
        cosine_expr(F.col("qvec"), F.col("cvec")).alias("cdot"),
    )
    # computed ONCE (persist; the probed-cell collect below materializes the
    # cache): the probe relation feeds the cell collect, the auto-mode row
    # count, and the candidate join — each would otherwise re-run the |Q|×K
    # probe scoring from scratch. persist (not localCheckpoint) so the
    # eager path can RELEASE the blocks explicitly via unpersist.
    probes = topk_per_group(
        q_scored, "query_vec_id", "cdot", nprobe, id_col="centroid_id"
    ).select("query_vec_id", "qvec", "centroid_id").persist()

    # everything from here on runs under the probes cache: any failure
    # (a dead executor, a bad cells dir) must release the persisted blocks
    # instead of leaking them until GC — the same leak class the early
    # query_mode validation guards (round-5 ADVICE)
    try:
        # ONE bounded job (≤ K result rows regardless of |Q|) yields both
        # the probed cell ids for partition pruning AND the probe-row total
        # for the auto-mode decision — and materializes the probes cache as
        # a side effect
        cell_counts = probes.groupBy("centroid_id").count().collect()
        probed = [r["centroid_id"] for r in cell_counts]
        cells = spark.read.parquet(paths.cells).filter(
            F.col("centroid_id").isin(probed)
        )
        if query_mode == "auto":
            n_probes = sum(r["count"] for r in cell_counts)
            query_mode = (
                "broadcast" if n_probes <= ANN_PROBE_BROADCAST_LIMIT
                else "shuffle"
            )
        if query_mode == "broadcast":
            cand = cells.join(F.broadcast(probes), "centroid_id")
        else:
            # cells/ is partitioned by centroid_id on disk; AQE may still
            # elect a runtime broadcast if the probe side turns out tiny —
            # the point is only that nothing FORCES a |Q|-growing broadcast
            cand = cells.join(probes, "centroid_id")
        if exclude_self:
            cand = cand.filter(F.col("query_vec_id") != F.col("vec_id"))
        # no dedup needed: cell assignment is top-1 (build_ann_index), so
        # each (query, vec) pair appears at most once — a distinct() here
        # would be a full extra exchange that removes nothing
        scored = cand.select(
            "query_vec_id",
            "vec_id",
            cosine_expr(F.col("qvec"), F.col("evec")).alias("cosine"),
        )
        out = topk_per_group(
            scored, "query_vec_id", "cosine", k, id_col="vec_id"
        )
        if eager:
            out = out.localCheckpoint(eager=True)
            probes.unpersist()
            return out
        return AnnSearchHandle(out, probes)
    except BaseException:
        probes.unpersist()
        raise


# --- incremental maintenance (round-7 ask #6) ---------------------------------
#
# The BM25 index refreshes O(window) per stream-refresh round; before round 7
# the ANN artifact rebuilt from scratch, so a deployment serving both paid
# O(corpus) per window anyway. The incremental protocol mirrors IVF practice
# (FAISS add-with-existing-quantizer): new vectors are assigned to the
# EXISTING centroids (O(window × K)) and appended to their cells; the
# quantizer itself is retrained only when the maintenance policy says the
# index has drifted from what the centroids were trained on — the
# should_reshard-style decision the BM25 side already has.

def refresh_ann_index(
    spark: SparkSession,
    index_dir: str,
    new_embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assume_new_ids: bool = False,
) -> dict:
    """Fold a window of new vectors into an existing ANN index — O(window).

    New vectors are assigned to the EXISTING centroids with the exact
    assignment rule of ``build_ann_index`` (top-1 by rounded-cosine DESC,
    centroid_id ASC), appended to their cell partitions (old cell files are
    never rewritten — the O(window) property), and the meta's vector count
    and coherence statistic are updated as an exact weighted blend (the
    running mean over ALL assignments, old and new). Returns the updated
    meta dict.

    Idempotent under replay by default: ids already present in cells/ are
    dropped by an anti-join before assignment, so a crashed-then-retried
    refresh window (the at-least-once drain protocol upstream) appends each
    vector once. That anti-join is a column-pruned scan of cells' vec_id —
    cheap relative to a rebuild, but O(index) rows; a caller whose ids are
    fresh by construction (the refresh loop: new docs get new doc ids)
    passes ``assume_new_ids=True`` to skip it and stay strictly O(window).

    Commit order: cells append, then meta (atomic replace). A crash between
    the two leaves the appended vectors searchable (searches scan cells/,
    not the meta counts) with a stale meta — healed by the retry, which
    dedups the ids and rewrites the meta.

    The quantizer is NOT retrained here — centroids are what makes the
    append O(window). Check ``should_recluster(meta)`` after refreshing and
    run ``recluster_ann_index`` when it fires (``maintain_ann_index`` does
    both)."""
    from dense_retriever_spark.index import fs
    from dense_retriever_spark.operators.similarity import cosine_expr
    from dense_retriever_spark.operators.topk import topk_per_group
    from pyspark import StorageLevel

    meta = load_ann_meta(index_dir, spark)
    paths = AnnIndexPaths(index_dir)
    new = new_embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("evec")
    )
    if not assume_new_ids:
        new = new.join(
            spark.read.parquet(paths.cells).select("vec_id"),
            "vec_id",
            "left_anti",
        )
    cents_b = F.broadcast(spark.read.parquet(paths.centroids))
    scored = new.crossJoin(cents_b).select(
        "vec_id", "evec", "centroid_id",
        cosine_expr(F.col("evec"), F.col("cvec")).alias("cdot"),
    )
    asg = (
        topk_per_group(scored, "vec_id", "cdot", 1, id_col="centroid_id")
        .select("vec_id", "evec", "centroid_id", "cdot")
        .persist(StorageLevel.DISK_ONLY)
    )
    try:
        row = asg.agg(
            F.count("*").alias("n"), F.sum("cdot").alias("s")
        ).collect()[0]
        n_w = int(row["n"])
        if n_w == 0:
            # nothing new — EXCEPT after a crash between the cells append
            # and the meta write: the replayed ids all dedup away (they're
            # in cells/) but the meta still excludes them. Reconcile
            # against the actual cells count; on mismatch, recompute the
            # coherence mean over cells (their assigned centroid is
            # recorded, so cdot is reconstructible) — O(N), paid only on
            # heal, never on a plain no-op refresh of a consistent index.
            n_cells = spark.read.parquet(paths.cells).count()
            if n_cells != int(meta["n_vectors"]):
                coh_row = (
                    spark.read.parquet(paths.cells)
                    .join(cents_b, "centroid_id")
                    .agg(
                        F.avg(
                            cosine_expr(F.col("evec"), F.col("cvec"))
                        ).alias("m")
                    )
                    .collect()[0]
                )
                meta["n_vectors"] = int(n_cells)
                meta["mean_top1_cosine"] = round(float(coh_row["m"]), 6)
                fs.write_text_atomic(paths.meta, json.dumps(meta), spark)
            return meta
        (
            asg.drop("cdot")
            .write.mode("append")
            .partitionBy("centroid_id")
            .parquet(paths.cells)
        )
    finally:
        asg.unpersist()
    n_old = int(meta["n_vectors"])
    coh_old = meta.get("mean_top1_cosine")
    old_sum = (coh_old or 0.0) * n_old
    meta["n_vectors"] = n_old + n_w
    meta["mean_top1_cosine"] = round(
        (old_sum + float(row["s"])) / (n_old + n_w), 6
    )
    fs.write_text_atomic(paths.meta, json.dumps(meta), spark)
    return meta


def should_recluster(
    meta: dict,
    growth_factor: float = 4.0,
    max_coherence_drop: float = 0.1,
) -> bool:
    """The quantizer-retrain policy (the ANN twin of ``should_reshard``).

    A fixed-K quantizer degrades two ways as an index refreshes past its
    training set. GROWTH: probe cost per query is ~(nprobe/K)·N, so cells
    fatten linearly with N — once the index is ``growth_factor``× its
    train-time size, K should be re-chosen (recluster defaults it toward
    the standard ~4·√N IVF rule). DRIFT: if the incoming distribution moved
    away from the training distribution, new vectors sit far from every
    centroid and the running mean top-1 cosine sags below its train-time
    value — cells stop capturing neighborhoods and recall decays (the same
    statistic the noise-regime warning keys on). Reads only the meta dict —
    no Spark job."""
    n = int(meta.get("n_vectors", 0))
    n0 = int(meta.get("n_at_train", n) or 0)
    coh = meta.get("mean_top1_cosine")
    coh0 = meta.get("coherence_at_train")
    grown = n0 > 0 and n >= growth_factor * n0
    drifted = (
        coh is not None
        and coh0 is not None
        and (float(coh0) - float(coh)) >= max_coherence_drop
    )
    return grown or drifted


def recluster_ann_index(
    spark: SparkSession,
    index_dir: str,
    n_centroids: int | None = None,
    quantizer: str | None = None,
    seed: int | None = None,
) -> AnnIndexPaths:
    """Retrain the quantizer over the index's own vectors and rebuild the
    cell layout — the maintenance event ``should_recluster`` fires.

    ``n_centroids`` defaults to max(current K, round(4·√N)) — the standard
    IVF sizing rule, never shrinking K; quantizer/seed default to the
    index's own. Crash-safe the same way reshard_index is: cells/ is MOVED
    aside to ``_recluster_staging`` (one rename — the staged table is the
    one copy known complete), the rebuild reads the staged vectors and
    overwrites centroids/ + cells/ + meta, and staging is deleted only
    after success. A re-run that finds leftover staging resumes from it
    unconditionally — a cells/ dir present alongside staging may be a
    partial rewrite and is never trusted."""
    import math

    from dense_retriever_spark.index import fs

    meta = load_ann_meta(index_dir, spark)
    paths = AnnIndexPaths(index_dir)
    staging = os.path.join(paths.root, "_recluster_staging")
    if fs.exists(staging, spark):
        fs.delete(paths.cells, spark)
    else:
        fs.rename(paths.cells, staging, spark)
    vecs = spark.read.parquet(staging).select("vec_id", "evec")
    k = n_centroids or max(
        int(meta["n_centroids"]),
        int(round(4 * math.sqrt(max(int(meta["n_vectors"]), 1)))),
    )
    out = build_ann_index(
        vecs,
        index_dir,
        n_centroids=k,
        quantizer=quantizer or meta["quantizer"],
        id_col="vec_id",
        vec_col="evec",
        seed=meta["seed"] if seed is None else seed,
    )
    fs.delete(staging, spark)
    return out


def maintain_ann_index(
    spark: SparkSession,
    index_dir: str,
    new_embeddings: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assume_new_ids: bool = False,
    auto_recluster: bool = True,
    growth_factor: float = 4.0,
    max_coherence_drop: float = 0.1,
) -> dict:
    """One maintenance window: fold the new vectors in O(window), then act
    on the recluster policy. Returns the final meta dict plus a
    ``reclustered`` key — the per-window call a stream-refresh deployment
    makes right after its BM25 refresh round."""
    if new_embeddings is not None:
        refresh_ann_index(
            spark, index_dir, new_embeddings, id_col, vec_col,
            assume_new_ids=assume_new_ids,
        )
    meta = load_ann_meta(index_dir, spark)
    fire = should_recluster(meta, growth_factor, max_coherence_drop)
    reclustered = False
    if auto_recluster and fire:
        recluster_ann_index(spark, index_dir)
        meta = load_ann_meta(index_dir, spark)
        fire = should_recluster(meta, growth_factor, max_coherence_drop)
        reclustered = True
    return {**meta, "reclustered": reclustered, "should_recluster": fire}
