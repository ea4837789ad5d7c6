"""Boolean BM25 search: +required / -forbidden / bare scored terms.

The reference engine's query surface is a flat bag of terms
(/root/reference/dense_retriever/transforms/ann_index.py:93-98 scores every
query token); a full-text index tier additionally needs the classic boolean
operators. Query grammar (one string per query row):

    whitespace-separated segments; a segment may carry a prefix
      +seg   every term the tokenizer yields for ``seg`` is REQUIRED
             (conjunction) — and scored
      -seg   every term is FORBIDDEN (docs containing any are excluded)
      seg    every term is optional and scored (plain BM25 disjunction)

Matching docs contain ALL required terms and NONE of the forbidden ones; with
no required terms a doc must contain at least one scored term. The score is
the plain BM25 sum over the query's scored terms (required terms score too,
exactly Lucene's scoring MUST clause), so a query with only bare segments is
bit-identical to ``search()`` (asserted by tests). Ranked (score DESC,
doc_id ASC), top-k.

Role edge rules (deterministic on both planes):
  * the same term in several roles → the strongest wins
    (forbidden > required > optional);
  * an out-of-vocabulary REQUIRED term → the query matches nothing;
  * OOV forbidden/optional terms are ignored.

Two query planes, mirroring index/search.py and sharing its scorer helpers:

- ``broadcast`` (default, interactive): parse + role-resolve driver-side,
  term→df served from the per-build driver cache (search._term_dfs_cached),
  union of all roles' terms pushed into the shard scan as a parquet filter,
  broadcast {query → roles} map into a per-shard ``applyInPandas`` matcher.
- ``distributed``: the (query_id, term, role) relation never touches the
  driver — executor-side segment explode + Arrow tokenizer, dead queries
  (OOV required term) removed with a distributed anti-join, per-query
  required-term counts carried on each row (the phrase plane's n_terms
  trick) so a shard missing a required term proves non-match locally.
- ``auto``: probes |Q| with one bounded count and picks like search().

Per shard the conjunction is evaluated postings-first (the classic
intersect-then-score plan): required posting lists are intersected
smallest-first (sorted-unique numpy set ops), forbidden lists subtracted,
and only the surviving candidate set is exact-scored in sorted-term order
(wand._exact_scores_sorted — float accumulation order identical to the
oracle and to search()'s scorers). OR-only queries accumulate over the
scored postings' union. No per-row Python anywhere; tombstone/allowed-set
masks compose exactly like search() (masked before shard-local top-k, so
recall is exact under any mask).

Scale: same plan shape as search() — one term-pruned scan, one cogroup/
groupBy exchange, shard-local top-k bounds the output at k × |Q| rows.
Driver state is O(|query batch|) on the broadcast plane and O(1) on the
distributed plane.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dense_retriever_spark.index.build import IndexPaths
from dense_retriever_spark.index.codec import decode_postings
from dense_retriever_spark.index.search import (
    QUERY_BROADCAST_LIMIT,
    RESULT_SCHEMA,
    TERM_FILTER_LIMIT,
    _excl_plan,
    _finish,
    _mask_right_rel,
    _mask_split,
    _term_dfs_cached,
    _term_pruned,
    global_term_stats,
    load_stats,
)
from dense_retriever_spark.index.wand import (
    _exact_scores_sorted,
    _topk,
    idf as idf_fn,
)

#: role codes — ordered so "strongest wins" is a plain max()
ROLE_OPTIONAL, ROLE_REQUIRED, ROLE_FORBIDDEN = 0, 1, 2


def parse_boolean_query(query: str) -> list[tuple[str, int]]:
    """query string → [(term, role)] with role conflicts resolved
    (max-role wins). Tokenization per segment uses the exact index
    tokenizer, so ``+getHTTPResponse`` requires every term that identifier
    was indexed under."""
    from dense_retriever_spark.functions.tokenizer import tokenize_code_series

    segs: list[tuple[str, int]] = []
    for seg in (query or "").split():
        role = ROLE_OPTIONAL
        if seg.startswith("+"):
            role, seg = ROLE_REQUIRED, seg[1:]
        elif seg.startswith("-"):
            role, seg = ROLE_FORBIDDEN, seg[1:]
        if seg:
            segs.append((seg, role))
    if not segs:
        return []
    toks = tokenize_code_series(pd.Series([s for s, _ in segs]))
    roles: dict[str, int] = {}
    for (_, role), ts in zip(segs, toks):
        for t in ts:
            roles[t] = max(roles.get(t, ROLE_OPTIONAL), role)
    return sorted(roles.items())


def _match_shard_boolean(
    pdf: pd.DataFrame,
    queries: dict[int, tuple[list[str], list[str], list[str]]],
    idfs: dict[str, float],
    k: int,
    k1: float,
    b: float,
    avgdl: float,
    dps: int,
    excl: np.ndarray | None = None,
    incl: np.ndarray | None = None,
    msm: int = 0,
) -> pd.DataFrame:
    """applyInPandas body over ONE shard's index rows.

    ``queries``: {qid: (scored_terms SORTED, required_terms, forbidden_terms)}
    — required ⊆ scored. Masks (``excl`` tombstones / ``incl`` allowed set)
    are applied to the decoded postings BEFORE matching, exactly like
    search._score_shard, so shard-local top-k never loses recall under a
    mask.

    ``msm`` (minimum_should_match): when > 0 and the query has OPTIONAL
    (non-required, in-vocabulary) terms, a matching doc must contain at
    least ``msm`` DISTINCT optional terms on top of every required term.
    Counting is exact shard-locally (a doc lives in exactly one shard). A
    query whose optional-term count is below ``msm`` matches nothing; a
    query with no optional terms is unconstrained (the Lucene rule)."""
    if len(pdf) == 0 or not queries:
        return pd.DataFrame(columns=["query_id", "doc_id", "score", "rank"])
    shard = int(pdf["shard"].iloc[0])
    base = shard * dps
    shard_excl = None
    if excl is not None and excl.size:
        lo, hi = np.searchsorted(excl, [base, base + dps])
        shard_excl = excl[lo:hi]
        if shard_excl.size == 0:
            shard_excl = None
    row_of = {t: i for i, t in enumerate(pdf["term"].to_numpy())}
    decoded: dict[str, tuple] = {}

    def dec(term):
        got = decoded.get(term)
        if got is None:
            ids, tfs, dls = decode_postings(
                pdf["postings"].iloc[row_of[term]]
            )
            if shard_excl is not None:
                keep = ~np.isin(ids, shard_excl, assume_unique=True)
                ids, tfs, dls = ids[keep], tfs[keep], dls[keep]
            if incl is not None and ids.size:
                keep = np.isin(ids, incl, assume_unique=True)
                ids, tfs, dls = ids[keep], tfs[keep], dls[keep]
            got = decoded[term] = (ids, tfs, dls)
        return got

    out_q, out_d, out_s = [], [], []
    for qid, (scored, req, neg) in queries.items():
        if any(r not in row_of for r in req):
            continue  # a required term is absent from this shard
        req_set = set(req)
        opt = [t for t in scored if t not in req_set]
        if msm > 0 and opt and len(opt) < msm:
            continue  # the query's optional terms can never reach msm
        if req:
            req_ids = sorted((dec(r)[0] for r in req), key=lambda a: a.size)
            sel = req_ids[0]
            for ids in req_ids[1:]:
                if sel.size == 0:
                    break
                sel = np.intersect1d(sel, ids, assume_unique=True)
        else:
            present = [dec(t)[0] for t in scored if t in row_of]
            if not present:
                continue
            sel = np.unique(np.concatenate(present))
        if msm > 0 and opt and sel.size:
            present_opt = [dec(t)[0] for t in opt if t in row_of]
            if len(present_opt) < msm:
                continue  # too few optional terms IN THIS SHARD to reach msm
            ids_u, cnt = np.unique(
                np.concatenate(present_opt), return_counts=True
            )
            ok = ids_u[cnt >= msm]
            sel = np.intersect1d(sel, ok, assume_unique=True)
        for f in neg:
            if sel.size == 0:
                break
            if f in row_of:
                sel = sel[~np.isin(sel, dec(f)[0], assume_unique=True)]
        if sel.size == 0:
            continue
        term_rows = [
            (t, idfs[t], *dec(t)) for t in scored if t in row_of
        ]
        sel_sorted, scores = _exact_scores_sorted(
            term_rows, sel - base, base, k1, b, avgdl
        )
        scores, doc_ids = _topk(scores, sel_sorted + base, k)
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


def _count_shard_boolean(
    pdf: pd.DataFrame,
    queries: dict[int, tuple[list[str], list[str], list[str]]],
    dps: int,
    excl: np.ndarray | None = None,
    incl: np.ndarray | None = None,
    msm: int = 0,
) -> pd.DataFrame:
    """Counting body: per-shard MATCH-SET SIZE per query (same candidate
    algebra as _match_shard_boolean INCLUDING ``msm``, no scoring — df/idf
    lookups are never run on the counting path; msm counts in-shard
    vocabulary, so an everywhere-OOV optional term affects count and
    search identically). Doc ids are unique to their shard, so the global
    count is a plain sum."""
    empty = pd.DataFrame({"query_id": [], "n_matches": []}).astype(
        {"query_id": "int64", "n_matches": "int64"}
    )
    if len(pdf) == 0 or not queries:
        return empty
    shard = int(pdf["shard"].iloc[0])
    base = shard * dps
    shard_excl = None
    if excl is not None and excl.size:
        lo, hi = np.searchsorted(excl, [base, base + dps])
        shard_excl = excl[lo:hi]
        if shard_excl.size == 0:
            shard_excl = None
    row_of = {t: i for i, t in enumerate(pdf["term"].to_numpy())}
    decoded: dict[str, np.ndarray] = {}

    def dec(term):
        got = decoded.get(term)
        if got is None:
            ids, _tfs, _dls = decode_postings(
                pdf["postings"].iloc[row_of[term]]
            )
            if shard_excl is not None:
                ids = ids[~np.isin(ids, shard_excl, assume_unique=True)]
            if incl is not None and ids.size:
                ids = ids[np.isin(ids, incl, assume_unique=True)]
            got = decoded[term] = ids
        return got

    out_q, out_n = [], []
    for qid, (scored, req, neg) in queries.items():
        if any(r not in row_of for r in req):
            continue
        req_set = set(req)
        opt = [t for t in scored if t not in req_set]
        if msm > 0 and opt and len(opt) < msm:
            continue
        if req:
            req_ids = sorted((dec(r) for r in req), key=lambda a: a.size)
            sel = req_ids[0]
            for ids in req_ids[1:]:
                if sel.size == 0:
                    break
                sel = np.intersect1d(sel, ids, assume_unique=True)
        else:
            present = [dec(t) for t in scored if t in row_of]
            if not present:
                continue
            sel = np.unique(np.concatenate(present))
        if msm > 0 and opt and sel.size:
            present_opt = [dec(t) for t in opt if t in row_of]
            if len(present_opt) < msm:
                continue
            ids_u, cnt = np.unique(
                np.concatenate(present_opt), return_counts=True
            )
            sel = np.intersect1d(
                sel, ids_u[cnt >= msm], assume_unique=True
            )
        for f in neg:
            if sel.size == 0:
                break
            if f in row_of:
                sel = sel[~np.isin(sel, dec(f), assume_unique=True)]
        if sel.size:
            out_q.append(qid)
            out_n.append(int(sel.size))
    if not out_q:
        return empty
    return pd.DataFrame(
        {
            "query_id": np.array(out_q, dtype=np.int64),
            "n_matches": np.array(out_n, dtype=np.int64),
        }
    )


def count_matches(
    spark: SparkSession,
    index_dir: str,
    queries_df: DataFrame,
    exclude_doc_ids: DataFrame | None = None,
    include_doc_ids: DataFrame | None = None,
    min_should_match: int = 0,
) -> DataFrame:
    """Total-hits: the NUMBER of matching docs per query (the count a
    search UI shows next to the top-k), under the full boolean grammar —
    a plain bag-of-terms query counts docs containing ≥1 query term.
    Output: (query_id, n_matches) with a zero row for every input query
    (OOV-required and no-match queries included).

    Counting needs NO document-frequency lookup (presence only), so this
    path never runs the global-stats job; an everywhere-absent required
    term yields 0 through the per-shard conjunction without a dead-query
    check. Per-shard match sets reduce to one long each; the global count
    is an exact sum because doc ids never span shards. Interactive
    (broadcast-plane) surface; training-set-scale counting composes the
    distributed boolean plane with its own aggregation."""
    stats = load_stats(index_dir)
    dps = stats["docs_per_shard"]
    msm = int(min_should_match)
    rows = queries_df.select("query_id", "query").collect()
    parsed = {
        int(r["query_id"]): parse_boolean_query(r["query"]) for r in rows
    }
    queries: dict[int, tuple[list[str], list[str], list[str]]] = {}
    scan_terms: set[str] = set()
    for qid, ts in parsed.items():
        req = [t for t, role in ts if role == ROLE_REQUIRED]
        scored = sorted(t for t, role in ts if role != ROLE_FORBIDDEN)
        if not scored:
            continue
        neg = [t for t, role in ts if role == ROLE_FORBIDDEN]
        queries[qid] = (scored, req, neg)
        scan_terms.update(scored)
        scan_terms.update(neg)

    all_qids = spark.createDataFrame(
        [(q,) for q in parsed], "query_id long"
    )
    zero = F.lit(0).cast("long")
    if not queries:
        return all_qids.select("query_id", zero.alias("n_matches"))

    paths = IndexPaths(index_dir)
    excl, excl_rel = _excl_plan(exclude_doc_ids, dps)
    bc = spark.sparkContext.broadcast((queries, excl))
    shard_rows = _term_pruned(
        spark.read.parquet(paths.shards), sorted(scan_terms), spark
    ).select("shard", "term", "postings")
    schema = "query_id long, n_matches long"

    if include_doc_ids is None and excl_rel is None:

        def _count(pdf):
            q, x = bc.value
            return _count_shard_boolean(pdf, q, dps, x, msm=msm)

        local = shard_rows.groupBy("shard").applyInPandas(
            _count, schema=schema
        )
    else:
        has_include = include_doc_ids is not None
        has_excl_rel = excl_rel is not None
        right_rel, shard_rows = _mask_right_rel(
            include_doc_ids, excl_rel, dps, shard_rows
        )

        def _count_co(left, right):
            q, x = bc.value
            x, incl = _mask_split(right, has_include, has_excl_rel, x)
            return _count_shard_boolean(left, q, dps, x, incl, msm=msm)

        local = (
            shard_rows.groupby("shard")
            .cogroup(right_rel.groupby("shard"))
            .applyInPandas(_count_co, schema=schema)
        )
    counts = local.groupBy("query_id").agg(
        F.sum("n_matches").cast("long").alias("n_matches")
    )
    out = (
        all_qids.join(counts, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("n_matches"), zero).alias("n_matches"),
        )
        .localCheckpoint(eager=True)
    )
    bc.destroy()
    return out


def search_boolean(
    spark: SparkSession,
    index_dir: str,
    queries_df: DataFrame,
    k: int = 10,
    query_mode: str = "broadcast",
    exclude_doc_ids: DataFrame | None = None,
    include_doc_ids: DataFrame | None = None,
    eager: bool = True,
    min_should_match: int = 0,
) -> DataFrame:
    """Top-k boolean BM25 search (module docstring has the grammar).
    Output: (query_id, doc_id, score, rank).

    ``min_should_match``: Lucene's msm knob — when > 0, a matching doc
    must contain at least that many DISTINCT optional (bare, in-vocab)
    terms on top of every ``+required`` term; queries with no optional
    terms are unconstrained. Identical on both planes (the count only
    depends on the doc's own shard)."""
    stats = load_stats(index_dir)
    if min_should_match < 0:
        raise ValueError(
            f"min_should_match must be >= 0, got {min_should_match}"
        )
    if query_mode == "auto":
        n_q = queries_df.limit(QUERY_BROADCAST_LIMIT + 1).count()
        query_mode = (
            "broadcast" if n_q <= QUERY_BROADCAST_LIMIT else "distributed"
        )
    if query_mode == "broadcast":
        return _boolean_broadcast(
            spark, index_dir, stats, queries_df, k,
            exclude_doc_ids, include_doc_ids, eager, min_should_match,
        )
    if query_mode != "distributed":
        raise ValueError(f"unknown query_mode {query_mode!r}")
    return _boolean_distributed(
        spark, index_dir, stats, queries_df, k,
        exclude_doc_ids, include_doc_ids, eager, min_should_match,
    )


def _boolean_broadcast(
    spark: SparkSession,
    index_dir: str,
    stats: dict,
    queries_df: DataFrame,
    k: int,
    exclude_doc_ids: DataFrame | None,
    include_doc_ids: DataFrame | None,
    eager: bool,
    msm: int = 0,
) -> DataFrame:
    n_docs, avgdl = stats["n_docs"], stats["avgdl"]
    k1, b = stats["k1"], stats["b"]
    dps = stats["docs_per_shard"]

    rows = queries_df.select("query_id", "query").collect()
    parsed = {
        int(r["query_id"]): parse_boolean_query(r["query"]) for r in rows
    }
    scored_terms = sorted(
        {t for ts in parsed.values() for t, role in ts
         if role != ROLE_FORBIDDEN}
    )
    if not scored_terms:
        return spark.createDataFrame([], RESULT_SCHEMA)
    vals = _term_dfs_cached(spark, index_dir, stats, scored_terms)
    idfs = {
        t: idf_fn(v, float(n_docs)) for t, v in vals.items() if v >= 0.0
    }

    queries: dict[int, tuple[list[str], list[str], list[str]]] = {}
    scan_terms: set[str] = set()
    for qid, ts in parsed.items():
        req = [t for t, role in ts if role == ROLE_REQUIRED]
        if any(t not in idfs for t in req):
            continue  # OOV required term: the query matches nothing
        scored = sorted(
            t for t, role in ts if role != ROLE_FORBIDDEN and t in idfs
        )
        if not scored:
            continue
        neg = [t for t, role in ts if role == ROLE_FORBIDDEN]
        queries[qid] = (scored, req, neg)
        scan_terms.update(scored)
        scan_terms.update(neg)
    if not queries:
        return spark.createDataFrame([], RESULT_SCHEMA)

    paths = IndexPaths(index_dir)
    excl, excl_rel = _excl_plan(exclude_doc_ids, dps)
    bc = spark.sparkContext.broadcast((queries, idfs, excl))
    shard_rows = _term_pruned(
        spark.read.parquet(paths.shards), sorted(scan_terms), spark
    ).select("shard", "term", "postings")

    if include_doc_ids is None and excl_rel is None:

        def _match(pdf):
            q, i, x = bc.value
            return _match_shard_boolean(
                pdf, q, i, k, k1, b, avgdl, dps, x, msm=msm
            )

        local = shard_rows.groupBy("shard").applyInPandas(
            _match, schema=RESULT_SCHEMA
        )
    else:
        # masks cogrouped with the shard scan — the shared construction
        # (search._mask_right_rel; xm=True marks kill-list rows)
        has_include = include_doc_ids is not None
        has_excl_rel = excl_rel is not None
        right_rel, shard_rows = _mask_right_rel(
            include_doc_ids, excl_rel, dps, shard_rows
        )

        def _match_co(left, right):
            q, i, x = bc.value
            x, incl = _mask_split(right, has_include, has_excl_rel, x)
            return _match_shard_boolean(
                left, q, i, k, k1, b, avgdl, dps, x, incl, msm=msm
            )

        local = (
            shard_rows.groupby("shard")
            .cogroup(right_rel.groupby("shard"))
            .applyInPandas(_match_co, schema=RESULT_SCHEMA)
        )
    return _finish(spark, local, k, eager, [bc])


def boolean_query_terms(queries_df: DataFrame) -> DataFrame:
    """(query_id, term, role) — executor-side mirror of
    parse_boolean_query: whitespace segments, +/- prefix → role, Arrow
    tokenizer per segment, max-role conflict resolution. Never collected."""
    from dense_retriever_spark.functions.tokenizer import tokenize_code_pandas

    seg = queries_df.select(
        "query_id",
        F.explode(F.split(F.col("query"), r"\s+")).alias("seg"),
    ).filter(F.col("seg") != "")
    role = (
        F.when(F.col("seg").startswith("+"), F.lit(ROLE_REQUIRED))
        .when(F.col("seg").startswith("-"), F.lit(ROLE_FORBIDDEN))
        .otherwise(F.lit(ROLE_OPTIONAL))
    )
    stem = F.when(
        role != ROLE_OPTIONAL, F.expr("substring(seg, 2)")
    ).otherwise(F.col("seg"))
    return (
        seg.select(
            "query_id",
            role.alias("role"),
            F.explode(tokenize_code_pandas(stem)).alias("term"),
        )
        .groupBy("query_id", "term")
        .agg(F.max("role").alias("role"))
    )


def _boolean_distributed(
    spark: SparkSession,
    index_dir: str,
    stats: dict,
    queries_df: DataFrame,
    k: int,
    exclude_doc_ids: DataFrame | None,
    include_doc_ids: DataFrame | None,
    eager: bool,
    msm: int = 0,
) -> DataFrame:
    """O(1)-driver-state boolean plane: the (query_id, term, role) relation
    stays a DataFrame end-to-end.

      boolean_query_terms ⟕ global stats      [left join: df NULL = OOV]
        → dead queries (OOV required) anti-joined out
        → per-query n_req window count        [phrase plane's n_terms trick]
        ⋈ shard-term presence                 [each shard learns ITS slice]
        → cogroup with the shard scan; the matcher rebuilds roles/idf per
          shard and proves required-term absence locally (slice req count
          < n_req → no match in this shard)
    """
    n_docs, avgdl = stats["n_docs"], stats["avgdl"]
    k1, b = stats["k1"], stats["b"]
    dps = stats["docs_per_shard"]
    paths = IndexPaths(index_dir)

    qt = boolean_query_terms(queries_df)
    gstats = global_term_stats(spark, index_dir, stats).select("term", "df")
    qtj = qt.join(gstats, "term", "left").select(
        "query_id", "term", "role", F.col("df").cast("long").alias("df")
    )
    dead = (
        qtj.filter(
            (F.col("role") == ROLE_REQUIRED) & F.col("df").isNull()
        )
        .select("query_id")
        .distinct()
    )
    # OOV non-required terms are inert (nothing to score or exclude); an
    # OOV REQUIRED term kills its whole query
    live = qtj.filter(F.col("df").isNotNull()).join(
        dead, "query_id", "left_anti"
    )
    qw = Window.partitionBy("query_id")
    live = (
        live.withColumn(
            "n_req",
            F.sum(
                F.when(F.col("role") == ROLE_REQUIRED, 1).otherwise(0)
            ).over(qw),
        )
        # n_opt = the query's GLOBAL live optional-term count: a shard that
        # holds a query's required terms but NONE of its optional terms
        # would otherwise see an empty opt list and silently skip the
        # min_should_match constraint (matching docs with zero optional
        # hits) — n_opt > 0 with too few shard-present optional terms
        # proves non-match locally instead (ADVICE r7, high)
        .withColumn(
            "n_opt",
            F.sum(
                F.when(F.col("role") == ROLE_OPTIONAL, 1).otherwise(0)
            ).over(qw),
        )
        .persist()
    )

    presence = spark.read.parquet(paths.shards).select("shard", "term")
    q_shard = live.join(presence, "term").select(
        "shard", "query_id", "term", "role", "df", "n_req", "n_opt",
        F.lit(None).cast("long").alias("doc_id"),
        F.lit(False).alias("xm"),
    )

    shard_rows = spark.read.parquet(paths.shards).select(
        "shard", "term", "postings"
    )
    n_terms = (
        live.select("term").distinct().limit(TERM_FILTER_LIMIT + 1).count()
    )
    if n_terms <= TERM_FILTER_LIMIT:
        shard_rows = shard_rows.join(
            F.broadcast(live.select("term").distinct()), "term", "left_semi"
        )

    has_include = include_doc_ids is not None
    if has_include:
        incl_flat = include_doc_ids.select(
            F.col("doc_id").cast("long").alias("doc_id")
        ).withColumn("shard", (F.col("doc_id") / dps).cast("long"))
        q_shard = q_shard.unionByName(
            incl_flat.select(
                "shard",
                F.lit(None).cast("long").alias("query_id"),
                F.lit(None).cast("string").alias("term"),
                F.lit(None).cast("int").alias("role"),
                F.lit(None).cast("long").alias("df"),
                F.lit(None).cast("long").alias("n_req"),
                F.lit(None).cast("long").alias("n_opt"),
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
        q_shard = q_shard.unionByName(
            excl_rel.select(
                "shard",
                F.lit(None).cast("long").alias("query_id"),
                F.lit(None).cast("string").alias("term"),
                F.lit(None).cast("int").alias("role"),
                F.lit(None).cast("long").alias("df"),
                F.lit(None).cast("long").alias("n_req"),
                F.lit(None).cast("long").alias("n_opt"),
                "doc_id",
                F.lit(True).alias("xm"),
            )
        )
    bcs = []
    bc_excl = None
    if excl is not None:
        bc_excl = spark.sparkContext.broadcast(excl)
        bcs.append(bc_excl)

    def _match_dist(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        x = bc_excl.value if bc_excl is not None else None
        if has_excl_rel:
            selx = right["term"].isna() & right["xm"]
            xs = right.loc[selx, "doc_id"].to_numpy(np.int64)
            x = np.sort(xs) if xs.size else None
        incl = None
        if has_include:
            seli = right["term"].isna() & ~right["xm"]
            incl = np.unique(right.loc[seli, "doc_id"].to_numpy(np.int64))
        qpart = right[right["term"].notna()]
        # sorted-term order == the broadcast plane's sorted() everywhere
        qpart = qpart.sort_values(["query_id", "term"], kind="mergesort")
        queries: dict[int, tuple[list[str], list[str], list[str]]] = {}
        idfs: dict[str, float] = {}
        for qid, grp in qpart.groupby("query_id", sort=False):
            roles = grp["role"].to_numpy(np.int64)
            terms = grp["term"].tolist()
            n_req = int(grp["n_req"].iloc[0])
            req = [t for t, r in zip(terms, roles) if r == ROLE_REQUIRED]
            if len(req) < n_req:
                continue  # a required term is absent from this shard
            if msm > 0 and int(grp["n_opt"].iloc[0]) > 0:
                n_opt_here = int((roles == ROLE_OPTIONAL).sum())
                if n_opt_here < msm:
                    # the query HAS optional terms but this shard holds
                    # fewer than msm of them — no doc here can reach the
                    # constraint (a doc's postings never span shards);
                    # covers the n_opt_here == 0 case the matcher's
                    # `msm > 0 and opt` guard would silently wave through
                    continue
            scored = [t for t, r in zip(terms, roles) if r != ROLE_FORBIDDEN]
            if not scored:
                continue
            neg = [t for t, r in zip(terms, roles) if r == ROLE_FORBIDDEN]
            queries[int(qid)] = (scored, req, neg)
            for t, df_ in zip(terms, grp["df"].to_numpy(np.int64)):
                if t not in idfs:
                    idfs[t] = idf_fn(float(df_), float(n_docs))
        return _match_shard_boolean(
            left, queries, idfs, k, k1, b, avgdl, dps, x, incl, msm=msm
        )

    local = (
        shard_rows.groupby("shard")
        .cogroup(q_shard.groupby("shard"))
        .applyInPandas(_match_dist, schema=RESULT_SCHEMA)
    )
    return _finish(spark, local, k, eager, bcs, cached=[live])
