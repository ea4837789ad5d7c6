"""Distributed BM25 top-k search over the sharded inverted index.

Reference analog: ``search_from_prebuilt`` — load index, search, decode ids
(/root/reference/dense_retriever/transforms/ann_index.py:93-107 and
/root/reference/dense_retriever/cli/ann_index.py:27-48). The rebuild's plan:

  query set                           index shards/ (parquet, doc-partitioned)
      │ tokenize + dedupe terms             │ scan with term-IN pushdown filter
      │ look up global df → idf             │   (Catalyst prunes untouched
      │ broadcast {qid→terms},{term→idf}    │    columns + row groups)
      │   (or: flow as a RELATION —         │
      │    query_mode='distributed')        │
      └──────────────┐                      │
                     ▼                      ▼
         groupBy(shard).applyInPandas(score all queries per shard)
                     │  shard-local top-k per query (numpy scorer)
                     ▼
         global window top-k (score DESC, doc_id ASC)  →  results

Two query planes, same scorer, bit-identical results (q38 vs q49 oracles):

* ``broadcast`` — the (qid, term) relation is collected and broadcast. Right
  for interactive/bench batches (a 200-query batch is KBs); the per-shard
  scorer sees every query at once, so the index is read EXACTLY once per
  search regardless of |Q|.
* ``distributed`` — the query relation NEVER touches the driver: query terms
  join the global stats for df, join the shard-term presence relation, and
  arrive at each shard's scorer COGROUPED with the shard scan. Driver state
  is O(1) at any |Q| — this is the plane the refresh loop's full-training-set
  search (millions of queries, the reference's training.py:75-83 regime)
  runs on, where a driver-side qmap/idf dict would be the scaling ceiling.
"""

from __future__ import annotations

import json
import os
import threading
import warnings
from collections import OrderedDict

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dense_retriever_spark.index.build import IndexPaths
from dense_retriever_spark.index.codec import decode_postings
from dense_retriever_spark.index.wand import (
    _contrib,
    idf as idf_fn,
    score_query_exact,
)
from dense_retriever_spark.operators.topk import topk_per_group

RESULT_SCHEMA = "query_id long, doc_id long, score double, rank int"
MATCHES_SCHEMA = "query_id long, doc_id long, score double"

#: query_mode='auto' switches broadcast → distributed above this many
#: queries. Sized so the driver-side qmap/idf dict stays a few tens of MB
#: (~5 terms/query); beyond it the collect itself is the scaling bug.
QUERY_BROADCAST_LIMIT = 100_000

#: distributed mode prefilters the shard scan by query terms with a
#: broadcast semi-join only while the distinct-term set is small enough to
#: broadcast; above this, query terms cover most of the vocabulary anyway
#: and the filter would not prune (the scorer still skips unasked terms).
TERM_FILTER_LIMIT = 1_000_000

#: the broadcast plane prunes its index scans by query term with an
#: IN-literal (parquet pushdown — row-group stats skip I/O) only up to this
#: many distinct terms; past it the filter becomes a broadcast left-semi
#: join, the same shape the distributed plane uses. MEASURED (BENCH/
#: BASELINE.md round 5): IN cost grows ~linearly in |terms| (compiled and
#: evaluated per task) — 0.78 s at 1k terms, 5.5 s at 8k, 332 s at 524k —
#: while the semi-join stays ~0.3-2.2 s flat; the crossover is a few
#: hundred terms. 512 keeps the IN (and its row-group pruning, which the
#: microbench's tiny scan undervalues) for genuinely small interactive
#: sets only.
TERM_ISIN_LIMIT = 512

#: driver-side (index-build, term) → df cache for the broadcast plane: the
#: reference loads its index once and serves every query from it; the Spark
#: analog is amortizing the global-stats lookup job across searches against
#: the same build. Keyed on the index's FULL stats.json content — which
#: embeds per-build phase timings, so any rebuild/compaction produces a new
#: key and stale df values can never be served. OOV terms are cached as -1
#: (a miss that re-ran the job every call would defeat the cache).
#:
#: Bounded in BYTES, not entries (round-5 verdict: 8 builds × 2M entries
#: was ~a GB of driver RSS worst-case): builds are evicted WHOLE in LRU
#: order (OrderedDict; every hit refreshes the build's recency) once the
#: estimated footprint crosses _TERM_DF_BUDGET_BYTES — a long-lived serving
#: driver that cycles through many index builds plateaus at the budget
#: instead of growing. A single build whose query vocabulary alone
#: overflows the budget is trimmed to the live query's terms (can't evict
#: the build being served). Guarded by _TERM_DF_LOCK: concurrent driver
#: threads may at worst double-run the stats job, never read a half-trimmed
#: dict.
_TERM_DF_CACHE: "OrderedDict[str, dict[str, float]]" = OrderedDict()
_TERM_DF_SIZES: dict[str, int] = {}  # estimated bytes per build, incremental
_TERM_DF_BUDGET_BYTES = 64 << 20
#: estimated bytes per cached entry beyond the term text itself: str object
#: header (~49) + float (24) + dict slot pair amortized (~100)
_TERM_DF_ENTRY_OVERHEAD = 180
_TERM_DF_LOCK = threading.Lock()


def _term_df_evict(current_key: str) -> None:
    """Evict least-recently-used builds until the cache fits the byte
    budget (never the build being served — its overflow case is handled by
    the caller's trim-to-live-terms path). Lock must be held. O(#builds)
    driver arithmetic; byte totals are tracked incrementally on insert."""
    # sum only keys still live in the cache: a caller that cleared the
    # OrderedDict directly would otherwise leave stale size entries that
    # inflate the total and over-evict live builds
    total = sum(_TERM_DF_SIZES.get(k, 0) for k in _TERM_DF_CACHE)
    while total > _TERM_DF_BUDGET_BYTES and len(_TERM_DF_CACHE) > 1:
        victim = next(iter(_TERM_DF_CACHE))
        if victim == current_key:
            _TERM_DF_CACHE.move_to_end(victim)
            continue
        _TERM_DF_CACHE.pop(victim)
        total -= _TERM_DF_SIZES.pop(victim, 0)


def _term_df_cache_clear() -> None:
    """Reset the cache AND its byte accounting together (test hook)."""
    with _TERM_DF_LOCK:
        _TERM_DF_CACHE.clear()
        _TERM_DF_SIZES.clear()

#: HISTORICAL (rounds 4-7): block-max pruning was skipped for queries with
#: more in-shard terms than this. As of round 8 the batch scorer is
#: exact-only (see _score_shard — with per-term contribution caching the
#: vectorized block-max path measured 2.6-5.4× slower in EVERY posting
#: regime, since its phase 1 already touches all postings), so this limit
#: no longer routes anything; kept for external importers/tests.
WIDE_QUERY_BLOCKMAX_LIMIT = 32

#: the tombstone broadcast ceiling: below it a kill-list collects to a
#: sorted driver array riding the score broadcast (latency fast path);
#: past it the list automatically stays a Spark relation cogrouped with
#: the shard scan (_excl_plan — O(1) driver state at any size) and a
#: RuntimeWarning recommends compaction (build.compact_index / the
#: `compact` CLI), which removes the per-query masking cost permanently.
TOMBSTONE_WARN_IDS = 10_000_000


def global_term_stats(
    spark: SparkSession, index_dir: str, stats: dict
) -> DataFrame:
    """(term, df) relation for idf lookups — layout-aware.

    Merged layout (default): global/ has one row per term; return it as-is
    (no aggregation exchange on the interactive path). Generational layout
    (build_index(global_layout='generational') — the incremental-refresh
    mode): df per term is the SUM over the gen segments plus the loose tail
    shards past ``genned_until`` (their stats come straight from shards/,
    partition-pruned). Term-predicate pushdown survives the union+aggregate
    (Catalyst pushes filters on grouping keys below the Aggregate and
    through the Union), so _term_pruned callers keep their row-group
    pruning on every leg. The gens scan is filtered to stats.json's
    COMMITTED gen id list: a partial gen dir left by a crashed build is
    visible to partition discovery but never committed, and must not be
    double-counted against the loose-tail leg."""
    paths = IndexPaths(index_dir)
    if stats.get("global_layout", "merged") != "generational":
        return spark.read.parquet(paths.global_dir)
    legs = []
    gen_ids = stats.get("gen_ids")
    if int(stats.get("n_gens", 0)) > 0:
        g = spark.read.parquet(paths.global_dir)
        if gen_ids is not None:
            g = g.filter(F.col("gen").isin([int(i) for i in gen_ids]))
        legs.append(g.select("term", "df"))
    gu = int(stats.get("genned_until", 0))
    legs.append(
        spark.read.parquet(paths.shards)
        .filter(F.col("shard") >= gu)
        .select("term", "df")
    )
    u = legs[0] if len(legs) == 1 else legs[0].unionByName(legs[1])
    return u.groupBy("term").agg(F.sum("df").alias("df"))


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

    Rows whose term no query asked for (``term not in idfs``) are skipped
    without decoding — distributed query mode may feed the unfiltered shard
    scan when the query-term set is too large to broadcast-prefilter.

    Scorer strategy (round 8, MEASURED): the batch scorer always runs the
    EXACT dense-accumulator path with per-term contribution caching.
    ``use_blockmax`` is accepted for API compatibility but no longer routes
    to ``score_query_blockmax``: the vectorized block-max formulation's
    phase 1 is itself O(total postings) (every posting's block bound is
    scatter-added), so once per-term contributions are cached and shared
    across the batch, block-max does strictly MORE work than exact in every
    regime — microbenched 2.6–5.4× slower across dense/sparse/skewed
    posting mixes, 19.0 s → 7.1 s on the 5k-query distributed batch and
    2.3 s → 1.65 s on the 100-query broadcast batch at sf0.1. Both scorers
    are exact by construction, so results are bit-identical either way
    (tests/test_wand_rank_identity.py asserts it).
    """
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
    masked = shard_excl is not None or incl is not None
    for r in pdf.itertuples(index=False):  # one iteration per TERM, not per row
        if r.term not in idfs:
            continue
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
    # BATCH amortization (round 8): per-term work is hoisted out of the
    # query loop — (a) queries with IDENTICAL shard-present term lists are
    # scored once (large batches over a shared vocabulary repeat term sets
    # constantly; identical inputs give identical outputs), and (b) each
    # term's BM25 contribution / per-posting block bound is computed once
    # per shard and shared across every query touching the term
    # (elementwise arrays — bit-identical to the per-query computation).
    by_sig: dict[tuple[str, ...], list[int]] = {}
    for qid, terms in queries.items():
        sig = tuple(t for t in terms if t in decoded)
        if sig:
            by_sig.setdefault(sig, []).append(qid)
    contribs: dict[str, np.ndarray] = {}

    def _contrib_of(t: str) -> np.ndarray:
        c = contribs.get(t)
        if c is None:
            ids, tf, dl = decoded[t]
            c = contribs[t] = _contrib(idfs[t], tf, dl, k1, b, avgdl)
        return c

    out_q, out_d, out_s = [], [], []
    for sig, qids in by_sig.items():
        term_rows = [(t, idfs[t], *decoded[t]) for t in sig]
        contrib_rows = [_contrib_of(t) for t in sig]
        scores, doc_ids = score_query_exact(
            term_rows, base, docs_per_shard, k, k1, b, avgdl,
            contrib_rows=contrib_rows,
        )
        for qid in qids:
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


def _term_pruned(
    df: DataFrame, terms: list[str], spark: SparkSession
) -> DataFrame:
    """Prune an index scan to the query-term set: IN-literal below
    TERM_ISIN_LIMIT (reaches parquet as PushedFilters), broadcast left-semi
    join above it (the driver already holds the list — shipping it once as
    a broadcast relation beats compiling a megabyte IN expression)."""
    if len(terms) <= TERM_ISIN_LIMIT:
        return df.filter(F.col("term").isin(terms))
    # pandas → Arrow batch conversion: a 500k-row python-list
    # createDataFrame would pickle row-by-row through py4j
    tdf = spark.createDataFrame(pd.DataFrame({"term": terms}))
    return df.join(F.broadcast(tdf), "term", "left_semi")


def _excl_plan(
    exclude_doc_ids: DataFrame | None, docs_per_shard: int
) -> tuple[np.ndarray | None, DataFrame | None]:
    """Kill-list routing: (driver_array, shard_keyed_relation) — exactly one
    is non-None when a kill-list is given.

    Below ``TOMBSTONE_WARN_IDS`` the list collects to a sorted driver array
    and rides the score broadcast (the fast path: zero extra shuffles on the
    latency plane). ABOVE the ceiling nothing is materialized on the driver:
    the probe collects at most ceiling+1 distinct ids, and the full list
    stays a Spark relation keyed by shard, cogrouped with the shard scan so
    each scorer receives exactly its slice — driver state is O(1) at any
    kill-list size. Masking still happens BEFORE top-k selection inside the
    scorer (an anti-join on the k-row result would lose recall when a
    query's whole top-k is tombstoned), and block-max stays live on the
    masked postings either way. A list past the ceiling still warns:
    compaction (build.compact_index / pipeline.apply_kill_list) removes the
    per-query masking cost permanently."""
    if exclude_doc_ids is None:
        return None, None
    ids = exclude_doc_ids.select(
        F.col("doc_id").cast("long").alias("doc_id")
    ).distinct()
    head = ids.limit(TOMBSTONE_WARN_IDS + 1).collect()
    if len(head) <= TOMBSTONE_WARN_IDS:
        arr = np.sort(np.array([r[0] for r in head], dtype=np.int64))
        return (arr if arr.size else None), None
    warnings.warn(
        f"tombstone list exceeds {TOMBSTONE_WARN_IDS} ids — switching to "
        "the distributed kill-list plane (ids stay a Spark relation "
        "cogrouped with the shard scan; nothing is collected to the "
        "driver). At this size a compaction event is cheaper per query: "
        "run build.compact_index (or the `compact` CLI) to drop the "
        "kill-list physically; pipeline.apply_kill_list automates the "
        "threshold decision",
        RuntimeWarning,
        stacklevel=4,
    )
    flat = ids.withColumn(
        "shard", (F.col("doc_id") / docs_per_shard).cast("long")
    )
    return None, flat


def _mask_right_rel(
    include_doc_ids: DataFrame | None,
    excl_rel: DataFrame | None,
    dps: int,
    shard_rows: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """The shared include/exclude cogroup construction for the BROADCAST
    planes (search / boolean / count_matches — previously copy-pasted).
    Both masks ride ONE right relation keyed by shard (cogroup has a
    single right slot; a second shuffle per mask would double the
    exchange): allowed ids carry xm=False, kill-list ids xm=True. Returns
    (right_rel, shard_rows) with shard_rows semi-join-pruned to the
    allowed shards when an include mask is present. Call only when at
    least one mask relation exists. The distributed planes union their
    masks into the query relation instead (different column shape) and do
    not use this helper."""
    legs = []
    if include_doc_ids is not None:
        incl_flat = include_doc_ids.select(
            F.col("doc_id").cast("long").alias("doc_id")
        ).withColumn("shard", (F.col("doc_id") / dps).cast("long"))
        legs.append(incl_flat.select(
            "shard", "doc_id", F.lit(False).alias("xm")
        ))
        shard_rows = shard_rows.join(
            incl_flat.select("shard").distinct(), "shard", "left_semi"
        )
    if excl_rel is not None:
        legs.append(excl_rel.select(
            "shard", "doc_id", F.lit(True).alias("xm")
        ))
    right_rel = legs[0] if len(legs) == 1 else legs[0].unionByName(legs[1])
    return right_rel, shard_rows


def _mask_split(right, has_include: bool, has_excl_rel: bool, default_excl):
    """pandas-side twin of _mask_right_rel: one cogrouped right slice →
    (excl_array, incl_array), keeping the xs.size == 0 → None convention
    in ONE place so the planes cannot silently diverge on it."""
    xm = right["xm"].to_numpy(dtype=bool)
    ids_r = right["doc_id"].to_numpy(np.int64)
    incl = np.unique(ids_r[~xm]) if has_include else None
    x = default_excl
    if has_excl_rel:
        xs = ids_r[xm]
        x = np.sort(xs) if xs.size else None
    return x, incl


def _finish(
    spark: SparkSession,
    local: DataFrame,
    k: int | None,
    eager: bool,
    bcs: list,
    cached: list | None = None,
) -> DataFrame:
    """Global exact top-k + deterministic tie-break; eager → materialize the
    (≤ k × |Q|)-row result EXECUTOR-SIDE via localCheckpoint (never funnelled
    through the driver — round-3 ADVICE), release the per-call broadcasts
    immediately instead of waiting for caller GC, and unpersist any
    intermediate relations in ``cached``.

    ``k=None`` (the ``score_matches`` plane): NO truncation and no rank
    column — the full (query_id, doc_id, score) matched relation flows out
    for relational composition (multi-field combination, rescoring). That
    relation is |matches| rows, so the eager localCheckpoint is skipped in
    favor of the lazy plan — the caller feeds it straight into an
    aggregation, never materializes it.

    localCheckpoint blocks are NOT replicated: on a cluster with dynamic
    allocation / executor churn, consume the eager result promptly (the CLI
    writes it immediately) or use ``eager=False`` and own the write — the
    lazy plan recomputes through lineage and is churn-safe."""
    if k is None:
        return local.select(
            F.col("query_id").cast("long"),
            F.col("doc_id").cast("long"),
            F.col("score").cast("double"),
        )
    out = topk_per_group(local.drop("rank"), "query_id", "score", k)
    out = out.select(
        F.col("query_id").cast("long"),
        F.col("doc_id").cast("long"),
        F.col("score").cast("double"),
        F.col("rank").cast("int"),
    )
    if not eager:
        return out
    out = out.localCheckpoint(eager=True)
    for bc in bcs:
        bc.destroy()
    for df in cached or []:
        df.unpersist()
    return out


def search(
    spark: SparkSession,
    index_dir: str,
    queries_df: DataFrame,
    k: int = 10,
    use_blockmax: bool = True,
    exclude_doc_ids: DataFrame | None = None,
    eager: bool = True,
    include_doc_ids: DataFrame | None = None,
    query_mode: str = "broadcast",
    offset: int = 0,
) -> DataFrame:
    """Top-k BM25 search. Output: (query_id, doc_id, score, rank).

    ``offset``: pagination — return the rank window [offset+1, offset+k]
    with ABSOLUTE ranks (page 2 of 10 carries ranks 11-20). Internally the
    search runs at k+offset and filters, so cost grows with page depth —
    the classic deep-paging caveat every search engine shares; for bulk
    export use ``score_matches`` (no truncation at all) instead of walking
    pages.

    ``exclude_doc_ids``: optional (doc_id) DataFrame of tombstoned docs —
    typically a dedup kill-list (dedup_exact / connected_components output) —
    removed EXACTLY at query time without rebuilding the index; block-max
    pruning stays live (blocks re-derived from the masked postings, see
    _score_shard). Below ~10^7 ids the list is collected and broadcast (the
    latency fast path); past that ceiling it automatically stays a Spark
    relation cogrouped with the shard scan (O(1) driver state at any size,
    see _excl_plan) and a RuntimeWarning recommends compaction: a kill-list
    that large is a compaction event — ``compact_index`` / the ``compact``
    CLI rebuilds exactly the affected shards, and
    ``pipeline.apply_kill_list`` automates the tombstone-vs-compact
    decision.

    ``include_doc_ids``: optional (doc_id) DataFrame of ALLOWED docs —
    metadata-filtered search (e.g. ``docs.filter(lang == 'py')``); only these
    ids may appear in results (BM25 statistics stay those of the full index,
    mirroring the tombstone convention). Unlike the kill-list this set can be
    most of the corpus, so it is NEVER collected: the ids flow as a Spark
    relation cogrouped with the shard scan by shard id — each shard's scorer
    receives exactly its slice, shards with no allowed docs are
    semi-join-pruned from the scan, and driver state stays O(1) at any
    selectivity. Composes with ``exclude_doc_ids``.

    ``query_mode``: ``'broadcast'`` (default) collects the (qid, term)
    relation to the driver and broadcasts it (exactly-once index scan with
    term-IN parquet pushdown — right for interactive/bench batches, and
    zero extra jobs on the latency path). ``'distributed'`` keeps the query
    relation executor-side end-to-end (see module docstring) — driver state
    is O(1) at any |Q|; this is the plane for training-set-scale query
    batches. ``'auto'`` probes |Q| with one bounded ``limit().count()`` job
    and picks broadcast below QUERY_BROADCAST_LIMIT — the right setting when
    the batch size is unknown (the CLI and the refresh loop use it). Both
    planes run the same scorer and are bit-identical (pytest + the q38/q49
    oracle pair).

    ``eager`` (default): run the search now, materialize the bounded
    (≤ k × |Q|-row) result executor-side (localCheckpoint — never collected
    to the driver), and release the per-call broadcasts immediately.
    ``eager=False`` keeps the fully-lazy plan for composition; the caller
    then owns the broadcast lifetime (released on garbage collection).
    """
    stats = load_stats(index_dir)
    if offset < 0:
        raise ValueError(f"offset must be >= 0, got {offset}")
    k_fetch = k + offset
    if query_mode == "auto":
        n_q = queries_df.limit(QUERY_BROADCAST_LIMIT + 1).count()
        query_mode = (
            "broadcast" if n_q <= QUERY_BROADCAST_LIMIT else "distributed"
        )
    if query_mode == "broadcast":
        out = _search_broadcast(
            spark, index_dir, stats, queries_df, k_fetch, use_blockmax,
            exclude_doc_ids, eager, include_doc_ids,
        )
    elif query_mode == "distributed":
        out = _search_distributed(
            spark, index_dir, stats, queries_df, k_fetch, use_blockmax,
            exclude_doc_ids, eager, include_doc_ids,
        )
    else:
        raise ValueError(f"unknown query_mode {query_mode!r}")
    if offset:
        out = out.filter(F.col("rank") > offset)
    return out


def score_matches(
    spark: SparkSession,
    index_dir: str,
    queries_df: DataFrame,
    exclude_doc_ids: DataFrame | None = None,
    include_doc_ids: DataFrame | None = None,
    query_mode: str = "broadcast",
) -> DataFrame:
    """FULL scored match relation: (query_id, doc_id, score) for EVERY doc
    matching ≥1 query term — ``search`` without the top-k truncation. The
    relational primitive under multi-field combination (index/fields.py)
    and rescoring: per-field contributions must cover every doc matched in
    ANY field, so a per-field top-k would lose mass exactly where fields
    disagree.

    The plan is the plain search plan with per-shard k = docs_per_shard (a
    shard cannot contribute more rows, so nothing is pruned) and the exact
    scorer (block-max prunes nothing when everything survives). The result
    is |matches| rows — an intermediate relation meant to feed an
    aggregation, never a ``.collect()``; it stays fully lazy (no eager
    localCheckpoint), so compose it and let one job run end-to-end.
    Tombstones / allowed-id filters compose exactly as in ``search``.
    """
    stats = load_stats(index_dir)
    if query_mode == "auto":  # same probe rule as search()
        n_q = queries_df.limit(QUERY_BROADCAST_LIMIT + 1).count()
        query_mode = (
            "broadcast" if n_q <= QUERY_BROADCAST_LIMIT else "distributed"
        )
    if query_mode == "broadcast":
        return _search_broadcast(
            spark, index_dir, stats, queries_df, None, False,
            exclude_doc_ids, False, include_doc_ids,
        )
    if query_mode != "distributed":
        raise ValueError(f"unknown query_mode {query_mode!r}")
    return _search_distributed(
        spark, index_dir, stats, queries_df, None, False,
        exclude_doc_ids, False, include_doc_ids,
    )


def _term_dfs_cached(
    spark: SparkSession, index_dir: str, stats: dict, all_terms: list[str]
) -> dict[str, float]:
    """term → df for ``all_terms`` (−1.0 marks OOV), served from the
    per-build driver cache where possible (term-pruned scan on global/
    otherwise; the collect is bounded by the query-term set, which the
    driver already holds). Repeated vocabulary — interactive sessions, the
    bench's tombstoned/filtered re-searches, the refresh loop's fixed query
    set — skips the Spark job entirely after the first lookup. Shared by
    the broadcast BM25 plane and the boolean plane (index/boolean.py)."""
    cache_key = json.dumps(
        {"dir": index_dir, "stats": stats}, sort_keys=True
    )
    with _TERM_DF_LOCK:
        if cache_key in _TERM_DF_CACHE:
            _TERM_DF_CACHE.move_to_end(cache_key)  # LRU recency on hit
        else:
            _TERM_DF_CACHE[cache_key] = {}
            _TERM_DF_SIZES[cache_key] = 0
        dfs = _TERM_DF_CACHE[cache_key]
        vals = {t: dfs[t] for t in all_terms if t in dfs}
    missing = [t for t in all_terms if t not in vals]
    if missing:
        # the collect runs OUTSIDE the lock (concurrent threads may double-
        # run the job for the same terms — benign; both write the same df)
        gstats = (
            _term_pruned(
                global_term_stats(spark, index_dir, stats), missing, spark
            )
            .select("term", "df")
            .collect()
        )
        found = {r["term"]: float(r["df"]) for r in gstats}
        for t in missing:
            vals[t] = found.get(t, -1.0)  # -1 = OOV, cached too
        with _TERM_DF_LOCK:
            # re-fetch under the lock: between the two locked sections a
            # concurrent thread may have EVICTED this build and another
            # RE-INSERTED a fresh dict at the same key — updating the dict
            # captured under the first lock would then add `added` bytes
            # (computed against the orphaned dict) to the fresh entry's
            # size accounting, inflating it into premature trims/evictions.
            # A changed dict object is treated exactly like the evicted
            # case: serve vals, let the fresh entry's owner account for it.
            if _TERM_DF_CACHE.get(cache_key) is dfs:
                added = 0
                for t in missing:
                    if t not in dfs:
                        added += len(t) + _TERM_DF_ENTRY_OVERHEAD
                    dfs[t] = vals[t]
                _TERM_DF_SIZES[cache_key] += added
                _term_df_evict(cache_key)
                build_bytes = _TERM_DF_SIZES.get(cache_key, 0)
                if build_bytes > _TERM_DF_BUDGET_BYTES:
                    # this build's vocabulary ALONE overflows the budget:
                    # trim to the live query's terms instead of growing
                    keep = {t: dfs[t] for t in all_terms if t in dfs}
                    dfs.clear()
                    dfs.update(keep)
                    _TERM_DF_SIZES[cache_key] = sum(
                        len(t) + _TERM_DF_ENTRY_OVERHEAD for t in dfs
                    )
            # else: this build was evicted (possibly evicted-then-replaced)
            # by a concurrent thread between the collect and here — serve
            # vals, don't resurrect or double-account the entry
    return vals


def _search_broadcast(
    spark: SparkSession,
    index_dir: str,
    stats: dict,
    queries_df: DataFrame,
    k: int | None,
    use_blockmax: bool,
    exclude_doc_ids: DataFrame | None,
    eager: bool,
    include_doc_ids: DataFrame | None,
    qt_pairs: list[tuple[int, str]] | None = None,
) -> DataFrame:
    from dense_retriever_spark.operators.bm25 import query_terms

    paths = IndexPaths(index_dir)
    n_docs, avgdl = stats["n_docs"], stats["avgdl"]
    k1, b = stats["k1"], stats["b"]
    if k is None:
        # score_matches plane: every match survives. A shard holds at most
        # docs_per_shard docs, so per-shard k = docs_per_shard IS "no
        # truncation" (``_finish`` still sees k=None and skips the global
        # top-k); block-max would prune nothing at that k, so take the
        # exact scorer (cheaper — no block algebra).
        k_shard, use_blockmax = stats["docs_per_shard"], False
    else:
        k_shard = k

    # 1. tokenize queries, collect the tiny (qid, term) relation to the
    # driver — unless the caller already holds the rewritten relation
    # (prefix expansion, index/prefix.py)
    if qt_pairs is None:
        qt = query_terms(queries_df).collect()
        qt_pairs = [(int(r["query_id"]), r["term"]) for r in qt]
    qmap: dict[int, list[str]] = {}
    for qid, term in qt_pairs:
        qmap.setdefault(int(qid), []).append(term)
    for qid in qmap:
        qmap[qid] = sorted(set(qmap[qid]))  # sorted-term order everywhere
    all_terms = sorted({t for ts in qmap.values() for t in ts})
    empty_schema = RESULT_SCHEMA if k is not None else MATCHES_SCHEMA
    if not all_terms:
        return spark.createDataFrame([], empty_schema)

    # 2. global term stats → idf (see _term_dfs_cached)
    vals = _term_dfs_cached(spark, index_dir, stats, all_terms)
    idfs = {
        t: idf_fn(v, float(n_docs)) for t, v in vals.items() if v >= 0.0
    }
    present = [t for t in all_terms if t in idfs]
    if not present:
        return spark.createDataFrame([], empty_schema)
    qmap = {q: [t for t in ts if t in idfs] for q, ts in qmap.items()}
    qmap = {q: ts for q, ts in qmap.items() if ts}

    # 3. scan shards with a pushed-down term filter; score per shard.
    # qmap/idfs ride in an sc.broadcast, NOT the task closure: a closure is
    # re-pickled into EVERY task (n_shards × |qmap| duplicate bytes — 73 MB
    # of task payload at 733 shards × a 100 KB query set), a broadcast ships
    # once per executor and scales to very large query batches.
    dps = stats["docs_per_shard"]
    excl, excl_rel = _excl_plan(exclude_doc_ids, dps)
    bc = spark.sparkContext.broadcast((qmap, idfs, excl))
    # only (shard, term, postings) — the batch scorer is exact-only as of
    # round 8, so the three block-metadata array columns stay out of the
    # scan, the Arrow transfer, and the grouping exchange entirely
    shard_rows = (
        _term_pruned(spark.read.parquet(paths.shards), present, spark)
        .select("shard", "term", "postings")
    )

    if include_doc_ids is None and excl_rel is None:

        def _score(pdf):
            q, i, x = bc.value
            return _score_shard(
                pdf, q, i, k_shard, k1, b, avgdl, dps, use_blockmax, x
            )

        local = shard_rows.groupBy("shard").applyInPandas(
            _score, schema=RESULT_SCHEMA,
        )
    else:
        # allowed ids (and, past the broadcast ceiling, tombstoned ids)
        # cogrouped with the shard scan: each shard's scorer sees exactly
        # its slice, nothing is collected to the driver (_mask_right_rel).
        has_include = include_doc_ids is not None
        has_excl_rel = excl_rel is not None
        right_rel, shard_rows = _mask_right_rel(
            include_doc_ids, excl_rel, dps, shard_rows
        )

        def _score_co(left, right):
            q, i, x = bc.value
            x, incl = _mask_split(right, has_include, has_excl_rel, x)
            return _score_shard(
                left, q, i, k_shard, k1, b, avgdl, dps, use_blockmax, x, incl
            )

        local = (
            shard_rows.groupby("shard")
            .cogroup(right_rel.groupby("shard"))
            .applyInPandas(_score_co, schema=RESULT_SCHEMA)
        )
    return _finish(spark, local, k, eager, [bc])


def _search_distributed(
    spark: SparkSession,
    index_dir: str,
    stats: dict,
    queries_df: DataFrame,
    k: int | None,
    use_blockmax: bool,
    exclude_doc_ids: DataFrame | None,
    eager: bool,
    include_doc_ids: DataFrame | None,
    qt_override: DataFrame | None = None,
) -> DataFrame:
    """The O(1)-driver-state query plane. The (qid, term) relation stays a
    DataFrame end-to-end:

      query_terms ⋈ global stats (df)            [inner join drops OOV terms]
                  ⋈ shard-term presence          [each shard learns ITS slice]
      → cogroup with the shard scan by shard id  [scorer rebuilds qmap/idf
                                                  per shard from its slice]

    idf is computed INSIDE the scorer from the joined df count with the same
    Python float math as the broadcast plane (wand.idf), so scores are
    bit-identical — log() in SQL could differ by an ulp between engines.

    The per-shard query slice contains exactly the (query, term) pairs whose
    term that shard holds — the same effective term set the broadcast scorer
    uses after its `t in decoded` filter — sorted by term so float
    accumulation order matches sorted(set(terms)).
    """
    paths = IndexPaths(index_dir)
    n_docs, avgdl = stats["n_docs"], stats["avgdl"]
    k1, b = stats["k1"], stats["b"]
    dps = stats["docs_per_shard"]
    if k is None:  # score_matches plane — see _search_broadcast
        k_shard, use_blockmax = dps, False
    else:
        k_shard = k
    from dense_retriever_spark.operators.bm25 import query_terms

    # (query_id, term) DISTINCT — never collected. PERSISTED (not
    # localCheckpoint-ed) so (a) the tokenizer runs once although the
    # relation feeds three jobs (term-count probe, stats join, scan
    # prefilter) and (b) the blocks are explicitly unpersisted in _finish's
    # eager path instead of leaking one checkpointed RDD per call until GC
    # (the training-set regime pins millions of rows per round otherwise).
    # ``qt_override``: a caller-rewritten (query_id, term) relation (prefix
    # expansion, index/prefix.py) replaces the tokenizer output.
    qt = (
        qt_override.select("query_id", "term").distinct()
        if qt_override is not None
        else query_terms(queries_df)
    )
    # the k=None (score_matches) plane returns a LAZY relation — _finish
    # never runs its unpersist, so persisting here would pin the qt rows in
    # executor storage until GC on every search_fields/more_like_this call;
    # re-running the tokenizer per consuming job is the cheaper steady state
    if k is not None:
        qt = qt.persist()
    gstats = global_term_stats(spark, index_dir, stats).select("term", "df")
    # inner join == the broadcast plane's `t in idfs` OOV filter
    qti = qt.join(gstats, "term").select(
        "query_id", "term", F.col("df").cast("long").alias("df")
    )

    # shard-term presence (postings column pruned from this scan): routes
    # each (query, term) pair to exactly the shards holding the term
    presence = spark.read.parquet(paths.shards).select("shard", "term")
    q_shard = qti.join(presence, "term").select(
        "shard", "query_id", "term", "df",
        F.lit(None).cast("long").alias("doc_id"),
        F.lit(False).alias("xm"),
    )

    # exact-only batch scorer (round 8): block metadata never leaves disk
    shard_rows = spark.read.parquet(paths.shards).select(
        "shard", "term", "postings",
    )
    # prefilter the shard scan by query terms while the distinct-term set is
    # small enough to broadcast; at vocabulary-scale |Q| the filter would
    # not prune (and the scorer skips unasked terms anyway)
    n_terms = qt.select("term").distinct().limit(TERM_FILTER_LIMIT + 1).count()
    if n_terms <= TERM_FILTER_LIMIT:
        shard_rows = shard_rows.join(
            F.broadcast(qt.select("term").distinct()), "term", "left_semi"
        )

    has_include = include_doc_ids is not None
    if has_include:
        # allowed ids ride in the SAME right relation (term NULL marks them):
        # cogroup has one right slot, and a second shuffle per mask would
        # double the query-side exchange
        incl_flat = include_doc_ids.select(
            F.col("doc_id").cast("long").alias("doc_id")
        ).withColumn("shard", (F.col("doc_id") / dps).cast("long"))
        q_shard = q_shard.unionByName(
            incl_flat.select(
                "shard",
                F.lit(None).cast("long").alias("query_id"),
                F.lit(None).cast("string").alias("term"),
                F.lit(None).cast("long").alias("df"),
                "doc_id",
                F.lit(False).alias("xm"),
            )
        )
        shard_rows = shard_rows.join(
            incl_flat.select("shard").distinct(), "shard", "left_semi"
        )

    excl, excl_rel = _excl_plan(exclude_doc_ids, dps)
    has_excl_rel = excl_rel is not None
    if has_excl_rel:
        # past the broadcast ceiling the kill-list rides the same right
        # relation too (term NULL + xm=True) — fully distributed, O(1)
        # driver state at any kill-list size
        q_shard = q_shard.unionByName(
            excl_rel.select(
                "shard",
                F.lit(None).cast("long").alias("query_id"),
                F.lit(None).cast("string").alias("term"),
                F.lit(None).cast("long").alias("df"),
                "doc_id",
                F.lit(True).alias("xm"),
            )
        )
    bcs = []
    bc_excl = None
    if excl is not None:
        bc_excl = spark.sparkContext.broadcast(excl)
        bcs.append(bc_excl)

    def _score_dist(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        x = bc_excl.value if bc_excl is not None else None
        if has_excl_rel:
            sel = right["term"].isna() & right["xm"]
            xs = right.loc[sel, "doc_id"].to_numpy(np.int64)
            x = np.sort(xs) if xs.size else None
        qpart = right[right["term"].notna()]
        # sorted-term accumulation order == broadcast plane's sorted(set())
        qpart = qpart.sort_values(["query_id", "term"], kind="mergesort")
        qmap: dict[int, list[str]] = {}
        idfs: dict[str, float] = {}
        for qid, t, df_ in zip(
            qpart["query_id"].to_numpy(np.int64),
            qpart["term"],
            qpart["df"].to_numpy(np.int64),
        ):
            qmap.setdefault(int(qid), []).append(t)
            if t not in idfs:
                idfs[t] = idf_fn(float(df_), float(n_docs))
        incl = None
        if has_include:
            sel_i = right["term"].isna() & ~right["xm"]
            incl = np.unique(right.loc[sel_i, "doc_id"].to_numpy(np.int64))
        return _score_shard(
            left, qmap, idfs, k_shard, k1, b, avgdl, dps, use_blockmax,
            x, incl,
        )

    local = (
        shard_rows.groupby("shard")
        .cogroup(q_shard.groupby("shard"))
        .applyInPandas(_score_dist, schema=RESULT_SCHEMA)
    )
    return _finish(
        spark, local, k, eager, bcs,
        cached=[qt] if k is not None else [],
    )
