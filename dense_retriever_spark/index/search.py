"""Distributed BM25 top-k search over the sharded inverted index.

Reference analog: ``search_from_prebuilt`` — load index, search, decode ids
(/root/reference/dense_retriever/transforms/ann_index.py:93-107 and
/root/reference/dense_retriever/cli/ann_index.py:27-48). The rebuild's plan:

  query set (tiny, driver)            index shards/ (parquet, doc-partitioned)
      │ tokenize + dedupe terms             │ scan with term-IN pushdown filter
      │ look up global df (global/)         │   (Catalyst prunes untouched
      │ broadcast {qid→terms},{term→idf}    │    columns + row groups)
      └──────────────┐                      │
                     ▼                      ▼
         groupBy(shard).applyInPandas(score all queries per shard)
                     │  shard-local top-k per query (numpy scorer)
                     ▼
         global window top-k (score DESC, doc_id ASC)  →  results

The per-shard scorer sees every query at once (queries are broadcast in the
closure — they are the small side), so the big index is read EXACTLY once per
search regardless of |Q|.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dense_retriever_spark.index.build import IndexPaths
from dense_retriever_spark.index.codec import decode_postings
from dense_retriever_spark.index.wand import (
    idf as idf_fn,
    score_query_blockmax,
    score_query_exact,
)
from dense_retriever_spark.operators.topk import topk_per_group

RESULT_SCHEMA = "query_id long, doc_id long, score double, rank int"


def load_stats(index_dir: str) -> dict:
    from dense_retriever_spark.index import fs
    from dense_retriever_spark.index.codec import FORMAT_VERSION

    # Hadoop FS read — index_dir may be file://, hdfs://, s3a:// (fs.py)
    stats = json.loads(fs.read_text(IndexPaths(index_dir).stats))
    v = stats.get("format_version", 1)
    if v != FORMAT_VERSION:
        raise ValueError(
            f"index at {index_dir} uses posting format v{v}; this engine "
            f"reads v{FORMAT_VERSION} — rebuild the index (a v1 blob decoded "
            "as v2 would silently misread payload bytes as header lengths)"
        )
    return stats


def _score_shard(
    pdf: pd.DataFrame,
    queries: dict[int, list[str]],
    idfs: dict[str, float],
    k: int,
    k1: float,
    b: float,
    avgdl: float,
    docs_per_shard: int,
    use_blockmax: bool,
    excl: np.ndarray | None = None,
    incl: np.ndarray | None = None,
) -> pd.DataFrame:
    """applyInPandas body: all index rows of ONE shard matching query terms.

    ``excl``: sorted array of tombstoned doc ids (search-time deletes, e.g. a
    dedup kill-list) — masked out of every term's postings before scoring.
    ``incl``: sorted array of ALLOWED doc ids for THIS shard (metadata-
    filtered search — only these docs may appear in results). Both masks can
    be live at once. Block-max pruning STAYS LIVE under any mask: block
    metadata is re-derived from the masked posting arrays (codec.block_meta
    over arrays already decoded — O(shard postings), the cost the scorer is
    paying anyway), so dedup-heavy / filtered query loads keep WAND pruning
    instead of silently falling back to the exact scan (the round-2 2-5×
    regression). Exactness is unaffected either way (blockmax is exact by
    construction).
    """
    from dense_retriever_spark.index.codec import block_meta

    if len(pdf) == 0:
        return pd.DataFrame(columns=["query_id", "doc_id", "score", "rank"])
    shard = int(pdf["shard"].iloc[0])
    base = shard * docs_per_shard
    shard_excl = None
    if excl is not None and excl.size:
        lo, hi = np.searchsorted(excl, [base, base + docs_per_shard])
        shard_excl = excl[lo:hi]
        if shard_excl.size == 0:
            shard_excl = None
    decoded: dict[str, tuple] = {}
    blocks: dict[str, tuple] = {}
    masked = shard_excl is not None or incl is not None
    for r in pdf.itertuples(index=False):  # one iteration per TERM, not per row
        ids, tfs, dls = decode_postings(r.postings)
        if shard_excl is not None:
            keep = ~np.isin(ids, shard_excl, assume_unique=True)
            ids, tfs, dls = ids[keep], tfs[keep], dls[keep]
        if incl is not None and ids.size:
            keep = np.isin(ids, incl, assume_unique=True)
            ids, tfs, dls = ids[keep], tfs[keep], dls[keep]
        if masked and ids.size == 0:
            continue
        decoded[r.term] = (ids, tfs, dls)
        if not use_blockmax:
            continue  # exact scorer never reads blocks — skip the numpy work
        if masked:
            # masked postings → stored blocks are misaligned; rebuild them
            blocks[r.term] = block_meta(ids, tfs, dls)
        else:
            blocks[r.term] = (
                np.asarray(r.block_last_doc_id, dtype=np.int64),
                np.asarray(r.block_max_tf, dtype=np.int64),
                np.asarray(r.block_min_dl, dtype=np.int64),
            )
    out_q, out_d, out_s = [], [], []
    for qid, terms in queries.items():
        term_rows = [
            (t, idfs[t], *decoded[t]) for t in terms if t in decoded
        ]
        if not term_rows:
            continue
        if use_blockmax:
            block_rows = [blocks[t[0]] for t in term_rows]
            scores, doc_ids = score_query_blockmax(
                term_rows, block_rows, base, docs_per_shard, k, k1, b, avgdl
            )
        else:
            scores, doc_ids = score_query_exact(
                term_rows, base, docs_per_shard, k, k1, b, avgdl
            )
        out_q.append(np.full(scores.size, qid, dtype=np.int64))
        out_d.append(doc_ids)
        out_s.append(scores)
    if not out_q:
        return pd.DataFrame(columns=["query_id", "doc_id", "score", "rank"])
    return pd.DataFrame(
        {
            "query_id": np.concatenate(out_q),
            "doc_id": np.concatenate(out_d),
            "score": np.concatenate(out_s),
            "rank": np.zeros(sum(x.size for x in out_q), dtype=np.int32),
        }
    )


def search(
    spark: SparkSession,
    index_dir: str,
    queries_df: DataFrame,
    k: int = 10,
    use_blockmax: bool = True,
    exclude_doc_ids: DataFrame | None = None,
    eager: bool = True,
    include_doc_ids: DataFrame | None = None,
) -> DataFrame:
    """Top-k BM25 search. Output: (query_id, doc_id, score, rank).

    ``exclude_doc_ids``: optional (doc_id) DataFrame of tombstoned docs —
    typically a dedup kill-list (dedup_exact / connected_components output) —
    removed EXACTLY at query time without rebuilding the index; block-max
    pruning stays live (blocks re-derived from the masked postings, see
    _score_shard). The list is collected and broadcast (fine to ~10^7 ids);
    a kill-list beyond that is a compaction event: ``compact_index`` /
    the ``compact`` CLI rebuilds exactly the affected shards.

    ``include_doc_ids``: optional (doc_id) DataFrame of ALLOWED docs —
    metadata-filtered search (e.g. ``docs.filter(lang == 'py')``); only these
    ids may appear in results (BM25 statistics stay those of the full index,
    mirroring the tombstone convention). Unlike the kill-list this set can be
    most of the corpus, so it is NEVER collected: the ids flow as a second
    Spark relation COGROUPED with the shard scan by shard id — each shard's
    scorer receives exactly its slice, shards with no allowed docs are
    semi-join-pruned from the scan, and driver state stays O(1) at any
    selectivity. Composes with ``exclude_doc_ids``.

    ``eager`` (default): run the search now, RELEASE the per-call
    (qmap, idfs, excl) broadcast immediately, and return the materialized
    result (k × |Q| rows — bounded by construction — via createDataFrame).
    Without this, every search() leaks one driver+executor broadcast until
    GC (round-2 ADVICE): the refresh loop runs one search per round for the
    session's lifetime. ``eager=False`` keeps the fully-lazy plan for
    composition; the caller then owns the broadcast's lifetime (it is
    released when the returned DataFrame is garbage-collected).
    """
    from dense_retriever_spark.operators.bm25 import query_terms

    paths = IndexPaths(index_dir)
    stats = load_stats(index_dir)
    n_docs, avgdl = stats["n_docs"], stats["avgdl"]
    k1, b = stats["k1"], stats["b"]

    # 1. tokenize queries, collect the tiny (qid, term) relation to the driver
    qt = query_terms(queries_df).collect()
    qmap: dict[int, list[str]] = {}
    for r in qt:
        qmap.setdefault(int(r["query_id"]), []).append(r["term"])
    for qid in qmap:
        qmap[qid] = sorted(set(qmap[qid]))  # sorted-term order everywhere
    all_terms = sorted({t for ts in qmap.values() for t in ts})
    if not all_terms:
        return spark.createDataFrame([], RESULT_SCHEMA)

    # 2. global term stats → idf (filter pushdown on global/; tiny collect)
    gstats = (
        spark.read.parquet(paths.global_dir)
        .filter(F.col("term").isin(all_terms))
        .select("term", "df")
        .collect()
    )
    idfs = {r["term"]: idf_fn(float(r["df"]), float(n_docs)) for r in gstats}
    present = [t for t in all_terms if t in idfs]
    if not present:
        return spark.createDataFrame([], RESULT_SCHEMA)
    qmap = {q: [t for t in ts if t in idfs] for q, ts in qmap.items()}
    qmap = {q: ts for q, ts in qmap.items() if ts}

    # 3. scan shards with a pushed-down term filter; score per shard.
    # qmap/idfs ride in an sc.broadcast, NOT the task closure: a closure is
    # re-pickled into EVERY task (n_shards × |qmap| duplicate bytes — 73 MB
    # of task payload at 733 shards × a 100 KB query set), a broadcast ships
    # once per executor and scales to very large query batches.
    dps = stats["docs_per_shard"]
    excl = None
    if exclude_doc_ids is not None:
        excl = np.unique(
            np.array(
                [r[0] for r in exclude_doc_ids.select("doc_id").collect()],
                dtype=np.int64,
            )
        )
    bc = spark.sparkContext.broadcast((qmap, idfs, excl))
    shard_rows = (
        spark.read.parquet(paths.shards)
        .filter(F.col("term").isin(present))
        .select("shard", "term", "postings", "block_last_doc_id",
                "block_max_tf", "block_min_dl")
    )

    if include_doc_ids is None:

        def _score(pdf):
            q, i, x = bc.value
            return _score_shard(pdf, q, i, k, k1, b, avgdl, dps, use_blockmax, x)

        local = shard_rows.groupBy("shard").applyInPandas(
            _score, schema=RESULT_SCHEMA,
        )
    else:
        # allowed ids cogrouped with the shard scan: each shard's scorer
        # sees exactly its slice, nothing is collected to the driver
        incl_flat = include_doc_ids.select(
            F.col("doc_id").cast("long").alias("doc_id")
        ).withColumn("shard", (F.col("doc_id") / dps).cast("long"))
        shard_rows = shard_rows.join(
            incl_flat.select("shard").distinct(), "shard", "left_semi"
        )

        def _score_co(left, right):
            q, i, x = bc.value
            incl = np.unique(right["doc_id"].to_numpy(np.int64))
            return _score_shard(
                left, q, i, k, k1, b, avgdl, dps, use_blockmax, x, incl
            )

        local = (
            shard_rows.groupby("shard")
            .cogroup(incl_flat.groupby("shard"))
            .applyInPandas(_score_co, schema=RESULT_SCHEMA)
        )
    # 4. global exact top-k with the deterministic tie-break
    out = topk_per_group(local.drop("rank"), "query_id", "score", k)
    out = out.select(
        F.col("query_id").cast("long"),
        F.col("doc_id").cast("long"),
        F.col("score").cast("double"),
        F.col("rank").cast("int"),
    )
    if not eager:
        return out
    rows = out.collect()  # bounded: ≤ k × |Q| rows by construction
    bc.destroy()
    return spark.createDataFrame(rows, RESULT_SCHEMA)
