"""Phrase search over positional indexes (build_index(positions=True)).

A phrase query matches documents where the phrase's tokens occur at
CONSECUTIVE canonical positions (the tokenize_code_flat order — plain
textual order for text without compound identifiers). The plan is the
broadcast query plane's shape: tokenize the (small, interactive) phrase
batch driver-side, push the union of phrase terms into the shard scan as a
parquet filter, then verify adjacency inside each doc-range shard with one
``applyInPandas`` pass — positions never cross shard boundaries, so there
is no shuffle beyond the scan itself and the ≤ |shards|×|matches| result.

Per shard the verification is vectorized: each term's occurrence list is a
lex-sorted (doc, position) array (decoded from the posting blob + position
stream); the phrase chain keeps candidate start pairs (d, p) where
(d, p+j) exists in term j's occurrences, via int64-keyed sorted-array
membership (key = shard-local doc offset * stride + position — bounded by
docs_per_shard × max document length, far inside int64 at any real scale).

Output: (query_id, doc_id, n_occ, rank) — n_occ counts ALL phrase starts
(overlapping included: "a a a" contains "a a" twice), top-k ranked by
(n_occ DESC, doc_id ASC). Compose with ``search`` (join on doc_id) when
BM25 scores over the phrase terms are also wanted.

Scale shape: the phrase plane is interactive — the phrase batch is collected
and broadcast like _search_broadcast's query map (same documented ceiling);
training-scale phrase matching should go through the tokenized corpus
directly (functions/text_stats-style column ops), not a serving index.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dense_retriever_spark.index.build import IndexPaths
from dense_retriever_spark.index.codec import (
    decode_position_stream,
    decode_postings,
)
from dense_retriever_spark.index.search import _term_pruned, load_stats

PHRASE_RESULT_SCHEMA = "query_id long, doc_id long, n_occ long, rank int"
_MATCH_SCHEMA = "query_id long, doc_id long, n_occ long"


def _phrase_tokens(queries_df: DataFrame) -> dict[int, list[str]]:
    """Collect + tokenize the phrase batch driver-side with the SAME
    tokenizer semantics the index build used (tokenize_code_series is
    golden-tested identical to the build's flat path, including order)."""
    from dense_retriever_spark.functions.tokenizer import tokenize_code_series

    rows = queries_df.select("query_id", "query").collect()
    if not rows:
        return {}
    toks = tokenize_code_series(pd.Series([r["query"] for r in rows]))
    return {
        int(r["query_id"]): list(ts)
        for r, ts in zip(rows, toks)
        if len(ts) > 0
    }


def search_phrase(
    spark: SparkSession,
    index_dir: str,
    queries_df: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Top-k phrase search. Output: (query_id, doc_id, n_occ, rank)."""
    stats = load_stats(index_dir)
    if not stats.get("positions", False):
        raise ValueError(
            f"index at {index_dir} was built without positions — phrase "
            "search needs build_index(positions=True)"
        )
    paths = IndexPaths(index_dir)
    dps = int(stats["docs_per_shard"])
    phrases = _phrase_tokens(queries_df)
    all_terms = sorted({t for ts in phrases.values() for t in ts})
    if not all_terms:
        return spark.createDataFrame([], PHRASE_RESULT_SCHEMA)

    bc = spark.sparkContext.broadcast(phrases)

    def _match(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame(
                {"query_id": [], "doc_id": [], "n_occ": []}
            ).astype({"query_id": "int64", "doc_id": "int64", "n_occ": "int64"})
        shard = int(pdf["shard"].iloc[0])
        base = shard * dps
        row_of = {t: i for i, t in enumerate(pdf["term"].to_numpy())}
        decoded: dict[str, tuple] = {}

        def occ(term):
            """(local_doc_offsets_per_occurrence, positions, ids, tfs) —
            lex-sorted by (doc, pos) by construction."""
            got = decoded.get(term)
            if got is None:
                i = row_of[term]
                ids, tfs, _dls = decode_postings(pdf["postings"].iloc[i])
                pos = decode_position_stream(pdf["positions"].iloc[i], tfs)
                ld = np.repeat(ids - base, tfs)
                got = decoded[term] = (ld, pos, ids, tfs)
            return got

        out_q: list[np.ndarray] = []
        out_d: list[np.ndarray] = []
        out_n: list[np.ndarray] = []
        for qid, toks in bc.value.items():
            if any(t not in row_of for t in toks):
                continue
            # stride > any position this shard can contain (+ phrase length
            # headroom so p+j never collides into the next doc's key space)
            max_pos = max(int(occ(t)[1].max(initial=0)) for t in toks)
            stride = np.int64(max_pos + len(toks) + 1)
            ld0, p0, _, _ = occ(toks[0])
            cand = ld0.astype(np.int64) * stride + p0
            for j, t in enumerate(toks[1:], start=1):
                if cand.size == 0:
                    break
                ldj, pj, _, _ = occ(t)
                keys_j = ldj.astype(np.int64) * stride + pj
                # sorted by construction → sorted-array membership
                idx = np.searchsorted(keys_j, cand + j)
                idx = np.minimum(idx, keys_j.size - 1)
                cand = cand[keys_j[idx] == cand + j]
            if cand.size == 0:
                continue
            docs = base + cand // stride
            uniq, counts = np.unique(docs, return_counts=True)
            out_q.append(np.full(uniq.size, qid, dtype=np.int64))
            out_d.append(uniq.astype(np.int64))
            out_n.append(counts.astype(np.int64))
        if not out_q:
            return pd.DataFrame(
                {"query_id": [], "doc_id": [], "n_occ": []}
            ).astype({"query_id": "int64", "doc_id": "int64", "n_occ": "int64"})
        return pd.DataFrame(
            {
                "query_id": np.concatenate(out_q),
                "doc_id": np.concatenate(out_d),
                "n_occ": np.concatenate(out_n),
            }
        )

    shard_rows = _term_pruned(
        spark.read.parquet(paths.shards), all_terms, spark
    ).select("shard", "term", "postings", "positions")
    matches = shard_rows.groupBy("shard").applyInPandas(
        _match, schema=_MATCH_SCHEMA
    )
    from dense_retriever_spark.operators.topk import topk_per_group

    out = topk_per_group(matches, "query_id", "n_occ", k).select(
        F.col("query_id").cast("long"),
        F.col("doc_id").cast("long"),
        F.col("n_occ").cast("long"),
        F.col("rank").cast("int"),
    )
    return out
