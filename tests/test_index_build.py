"""Index build: structure, fingerprints, resumability (SURVEY.md §5.3-5.4)."""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from dense_retriever_spark.index.build import IndexPaths, build_index, _read_manifest
from dense_retriever_spark.index.codec import decode_postings


@pytest.fixture(scope="module")
def built(spark, tiny_corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx") / "index")
    paths = build_index(tiny_corpus, d, docs_per_shard=64, term_buckets=4)
    return paths


def _index_content(spark, paths: IndexPaths):
    rows = (
        spark.read.parquet(paths.shards)
        .select("shard", "term", "df", "cf", "postings")
        .collect()
    )
    return sorted((r["shard"], r["term"], r["df"], r["cf"], bytes(r["postings"]))
                  for r in rows)


def test_structure_and_stats(spark, built):
    stats = json.load(open(built.stats))
    assert stats["n_docs"] == 200
    assert stats["n_shards"] == 4  # 200 docs / 64 per shard
    shards = spark.read.parquet(built.shards)
    assert shards.filter(F.col("df") <= 0).count() == 0
    # postings round-trip: df equals decoded length for every row
    for r in shards.limit(50).collect():
        ids, tfs, dls = decode_postings(bytes(r["postings"]))
        assert ids.size == r["df"]
        assert (tfs >= 1).all()


def test_global_merge_consistency(spark, built, tiny_corpus):
    """Global df per term == exact count from the corpus (merge is lossless)."""
    from dense_retriever_spark.operators.bm25 import doc_term_freqs, tokenize_corpus

    expected = (
        doc_term_freqs(tokenize_corpus(tiny_corpus))
        .groupBy("term")
        .agg(F.count("*").alias("edf"))
    )
    got = spark.read.parquet(built.global_dir).select(
        "term", F.col("df").alias("gdf")
    )
    diff = got.join(expected, "term", "full").filter(
        F.col("gdf").isNull() | F.col("edf").isNull() | (F.col("gdf") != F.col("edf"))
    )
    assert diff.count() == 0
    # shard-level dfs sum to global df
    shard_sum = (
        spark.read.parquet(built.shards).groupBy("term").agg(F.sum("df").alias("s"))
    )
    bad = got.join(shard_sum, "term").filter(F.col("gdf") != F.col("s"))
    assert bad.count() == 0


def test_manifest_fingerprint_invariant(spark, built):
    """Per-row invariant: manifest fingerprint == recomputed sha256 over the
    (doc_id, content_sha) of the docs table (BASELINE.json:input_hint)."""
    manifest = _read_manifest(built)
    assert len(manifest) == 4
    recomputed = {
        r["shard"]: r["fp"]
        for r in spark.read.parquet(built.docs)
        .groupBy("shard")
        .agg(
            F.sha2(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("doc_id", "content_sha"))),
                        lambda s: F.concat_ws(":", s["doc_id"], s["content_sha"]),
                    ),
                ),
                256,
            ).alias("fp")
        )
        .collect()
    }
    for sid, row in manifest.items():
        assert row["status"] == "complete"
        assert row["input_fingerprint"] == recomputed[sid]
        assert row["row_count"] > 0 and row["bytes"] > 0


def test_resume_rebuilds_only_missing_shards(spark, tiny_corpus, built, tmp_path):
    # clone the built index, damage shards 1 and 2, resume, compare content
    clone = str(tmp_path / "index_clone")
    shutil.copytree(built.root, clone)
    cp = IndexPaths(clone)
    for sid in (1, 2):
        shutil.rmtree(os.path.join(cp.shards, f"shard={sid}"))
        os.remove(os.path.join(cp.manifest, f"shard_{sid:06d}.json"))
    untouched = os.path.join(cp.shards, "shard=0")
    mtime_before = max(
        os.path.getmtime(os.path.join(untouched, f)) for f in os.listdir(untouched)
    )
    build_index(tiny_corpus, clone, docs_per_shard=64, term_buckets=4)
    mtime_after = max(
        os.path.getmtime(os.path.join(untouched, f)) for f in os.listdir(untouched)
    )
    assert mtime_before == mtime_after, "completed shard was rebuilt"
    assert _index_content(spark, cp) == _index_content(spark, built)
    assert len(_read_manifest(cp)) == 4
