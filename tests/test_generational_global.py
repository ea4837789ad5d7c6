"""Generational global index (index/build.py phase B, 'generational'
layout): per-window gen segments must serve EXACTLY the statistics the
merged layout serves (search bit-identity on both query planes), while
incremental builds leave prior gens' files untouched (the O(window) vs
O(index) property), staleness re-merges exactly the affected gen, and the
fold policy bounds the generation count.

Reference analog: the single merged artifact the reference persists
(/root/reference/dense_retriever/transforms/ann_index.py:87-98),
generalized to LSM/Lucene-style segments for the incremental refresh mode.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from dense_retriever_spark.corpus import ingest, synth_corpus, synth_queries
from dense_retriever_spark.index.build import (
    IndexPaths,
    _read_gens,
    build_index,
    compact_index,
)
from dense_retriever_spark.index.search import load_stats, search


def _results(spark, idx, qs, **kw):
    return sorted(map(tuple, search(spark, idx, qs, k=5, **kw).collect()))


def _gen_file_mtimes(idx):
    return {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(idx, "global", "gen=*", "*.parquet"))
    }


def test_generational_equals_merged_and_incremental_is_o_window(
    spark, tmp_path
):
    m_idx = str(tmp_path / "m_idx")
    g_idx = str(tmp_path / "g_idx")
    qs = synth_queries(spark, 8)

    # append-only growth the way the refresh loop produces it: the second
    # window's docs get ids AFTER the first window's, so the first window's
    # shards keep their (doc_id, content) fingerprints byte-identically
    c1 = ingest(synth_corpus(spark, 300, seed=77)).localCheckpoint(eager=True)
    c2 = c1.unionByName(
        ingest(synth_corpus(spark, 150, seed=88))
        .withColumn("doc_id", F.col("doc_id") + F.lit(300))
    ).localCheckpoint(eager=True)

    build_index(c1, m_idx, docs_per_shard=32, term_buckets=2)
    build_index(c1, g_idx, docs_per_shard=32, term_buckets=2,
                global_layout="generational")
    sm, sg = load_stats(m_idx), load_stats(g_idx)
    assert sg["global_layout"] == "generational"
    assert sg["n_gens"] == 1 and sg["genned_until"] == sg["n_shards"] - 1
    assert sg["avgdl"] == sm["avgdl"] and sg["n_docs"] == sm["n_docs"]

    # both query planes bit-identical to the merged twin
    want = _results(spark, m_idx, qs)
    assert _results(spark, g_idx, qs) == want and len(want) > 0
    assert _results(spark, g_idx, qs, query_mode="distributed") == want

    # incremental growth: the appended corpus keeps the prefix, so the
    # rebuild must ADD one gen (old tail + new shards) without rewriting
    # gen 0's parquet files — the O(window) property
    before = _gen_file_mtimes(g_idx)
    assert before  # gen 0 exists on disk
    build_index(c2, g_idx, docs_per_shard=32, term_buckets=2)  # inherited
    sg2 = load_stats(g_idx)
    assert sg2["global_layout"] == "generational"  # None = inherit
    assert sg2["n_gens"] == 2
    assert sg2["genned_until"] == sg2["n_shards"] - 1
    after = _gen_file_mtimes(g_idx)
    for p, mt in before.items():
        assert after[p] == mt, f"gen-0 file rewritten: {p}"

    build_index(c2, m_idx, docs_per_shard=32, term_buckets=2)
    want2 = _results(spark, m_idx, qs)
    assert _results(spark, g_idx, qs) == want2 and len(want2) > 0
    assert _results(spark, g_idx, qs, query_mode="distributed") == want2


def test_uncommitted_gen_dir_is_invisible_to_readers(spark, tmp_path):
    """A partial gen=<id> dir left by a crashed build is visible to parquet
    partition discovery but absent from stats.json's committed gen_ids —
    readers must not count it (it would double every df it carries), and
    the next build must reclaim the id and heal it."""
    g_idx = str(tmp_path / "orphan_idx")
    qs = synth_queries(spark, 8)
    c1 = ingest(synth_corpus(spark, 300, seed=81)).localCheckpoint(eager=True)
    build_index(c1, g_idx, docs_per_shard=32, term_buckets=2,
                global_layout="generational")
    want = _results(spark, g_idx, qs)

    # fabricate the crash leftover: a copy of gen 0 under an uncommitted id
    # (the worst case — every df in it would double-count if read)
    import shutil

    shutil.copytree(os.path.join(g_idx, "global", "gen=0"),
                    os.path.join(g_idx, "global", "gen=99"))
    assert _results(spark, g_idx, qs) == want
    assert _results(spark, g_idx, qs, query_mode="distributed") == want

    # the next build sweeps the uncommitted dir and results stay correct
    c2 = c1.unionByName(
        ingest(synth_corpus(spark, 100, seed=82))
        .withColumn("doc_id", F.col("doc_id") + F.lit(300))
    ).localCheckpoint(eager=True)
    build_index(c2, g_idx, docs_per_shard=32, term_buckets=2)
    assert not os.path.exists(os.path.join(g_idx, "global", "gen=99"))
    m_idx = str(tmp_path / "orphan_m")
    build_index(c2, m_idx, docs_per_shard=32, term_buckets=2)
    assert _results(spark, g_idx, qs) == _results(spark, m_idx, qs)


def test_generational_staleness_on_compaction(spark, tmp_path):
    """compact_index rebuilds shards inside genned ranges — the fingerprint
    drift must re-merge exactly the affected gens, and post-compaction
    search must match the merged-layout twin of the same compaction."""
    m_idx = str(tmp_path / "mc_idx")
    g_idx = str(tmp_path / "gc_idx")
    qs = synth_queries(spark, 8)
    for idx, layout in ((m_idx, "merged"), (g_idx, "generational")):
        build_index(ingest(synth_corpus(spark, 300, seed=78)), idx,
                    docs_per_shard=32, term_buckets=2, global_layout=layout)

    # kill docs 0..39 — entirely inside gen 0's range [0, 9)
    kill = spark.range(0, 40).select(F.col("id").alias("doc_id"))
    compact_index(spark, m_idx, kill)
    compact_index(spark, g_idx, kill)
    sg = load_stats(g_idx)
    assert sg["global_layout"] == "generational"  # layout survives compact
    gens = _read_gens(spark, IndexPaths(g_idx))
    assert len(gens) == sg["n_gens"]
    assert _results(spark, g_idx, qs) == _results(spark, m_idx, qs)
    assert (
        _results(spark, g_idx, qs, query_mode="distributed")
        == _results(spark, m_idx, qs)
    )


def test_generational_fold_policy_bounds_gen_count(spark, tmp_path):
    """Growing the corpus window by window with max_gens=2 must fold
    adjacent gens instead of accumulating one per window — and results
    stay identical to a from-scratch merged build."""
    g_idx = str(tmp_path / "gf_idx")
    qs = synth_queries(spark, 8)
    for n in (120, 240, 360, 480):
        build_index(ingest(synth_corpus(spark, n, seed=79)), g_idx,
                    docs_per_shard=32, term_buckets=2,
                    global_layout="generational", max_gens=2)
    sg = load_stats(g_idx)
    assert sg["n_gens"] <= 2
    gens = _read_gens(spark, IndexPaths(g_idx))
    assert [g["lo"] for g in gens] == sorted(g["lo"] for g in gens)
    assert max(g["hi"] for g in gens) == sg["genned_until"]

    m_idx = str(tmp_path / "mf_idx")
    build_index(ingest(synth_corpus(spark, 480, seed=79)), m_idx,
                docs_per_shard=32, term_buckets=2)
    assert _results(spark, g_idx, qs) == _results(spark, m_idx, qs)
