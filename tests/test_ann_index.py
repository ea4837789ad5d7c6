"""Persisted IVF ANN index (index/ann.py): build → search-prebuilt must be
bit-identical to the inline operator, with probed-cell PARTITION pruning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dense_retriever_spark.index.ann import (
    build_ann_index,
    load_ann_meta,
    search_ann_index,
)
from dense_retriever_spark.operators.similarity import ivf_ann_topk

SF_DIR = "/root/testdata/sf0.001"
K, NC, NPROBE = 3, 16, 8


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def ann_dir(spark, emb, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ann") / "ann_index")
    build_ann_index(emb, d, n_centroids=NC, quantizer="hash")
    return d


def _queries(emb):
    return emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_vec_id"),
        F.col("embedding").alias("qvec"),
    )


def test_prebuilt_equals_inline(spark, emb, ann_dir):
    want = sorted(
        map(tuple, ivf_ann_topk(
            emb, _queries(emb), k=K, n_centroids=NC, nprobe=NPROBE
        ).collect())
    )
    got = sorted(
        map(tuple, search_ann_index(
            spark, ann_dir, _queries(emb), k=K, nprobe=NPROBE
        ).collect())
    )
    assert got == want and len(got) > 0


def test_partition_pruning(spark, emb, ann_dir):
    from dense_retriever_spark.plans import formatted_plan

    # eager=False: the eager default localCheckpoints the RESULT, which
    # replaces the plan with an RDD scan — lazy keeps it inspectable
    df = search_ann_index(
        spark, ann_dir, _queries(emb), k=K, nprobe=NPROBE, eager=False
    )
    plan = formatted_plan(df)
    # the probed-cell filter must reach the cells scan as a PARTITION filter
    # (file-level pruning), not a post-scan row filter
    assert "PartitionFilters" in plan
    seg = plan[plan.index("cells") :]
    assert "centroid_id" in seg.split("PushedFilters")[0]
    df.release()


def test_big_batch_probes_not_broadcast(spark, emb, ann_dir, monkeypatch):
    """Round-4 verdict: the probe relation carries full query vectors and
    grows with |Q| — above ANN_PROBE_BROADCAST_LIMIT, query_mode='auto'
    must NOT force a probe broadcast into the cells join (the same ceiling
    the distributed BM25 plane removed on the text side)."""
    import dense_retriever_spark.index.ann as ann_mod
    from dense_retriever_spark.plans import physical_plan

    monkeypatch.setattr(ann_mod, "ANN_PROBE_BROADCAST_LIMIT", 1)
    # disable SIZE-based auto-broadcast so the plan shows only what the
    # code FORCES: at test scale Catalyst would broadcast the tiny probes
    # on its own statistics (which is fine and adaptive — at real |Q| the
    # size estimate exceeds the threshold and it picks a shuffle join)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = search_ann_index(
            spark, ann_dir, _queries(emb), k=K, nprobe=NPROBE, eager=False
        )
        plan = physical_plan(df)
        assert "BroadcastHashJoin" not in plan.split("InMemoryRelation")[0], (
            plan
        )
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
        df.release()

        # below the threshold the same call still HINT-broadcasts probes
        monkeypatch.setattr(ann_mod, "ANN_PROBE_BROADCAST_LIMIT", 50_000)
        df_small = search_ann_index(
            spark, ann_dir, _queries(emb), k=K, nprobe=NPROBE, eager=False
        )
        small_plan = physical_plan(df_small)
        assert "BroadcastHashJoin" in small_plan.split("InMemoryRelation")[0]
        df_small.release()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_coherence_stat_and_noise_regime_warning(spark, emb, ann_dir, tmp_path):
    """Round-5 verdict: the build records mean top-1 centroid cosine in
    ann_meta.json; searches of an index in the measured noise-dominated
    regime (stat < ANN_COHERENCE_WARN) warn and point at srp_ann_topk,
    while a tightly-clustered corpus stays silent."""
    import warnings as wmod

    import numpy as np

    # the synthetic testdata embeddings ARE weakly clustered (measured
    # ~0.38 at 64 centroids, sf0.01) — the fixture index must carry the
    # stat and searches must warn
    meta = load_ann_meta(ann_dir, spark)
    assert 0.0 < meta["mean_top1_cosine"] < 0.45
    with pytest.warns(RuntimeWarning, match="srp_ann_topk"):
        search_ann_index(spark, ann_dir, _queries(emb), k=K, nprobe=NPROBE)

    # tightly-clustered corpus: stat above threshold, no regime warning
    rng = np.random.default_rng(5)
    C = rng.normal(size=(8, 64))
    C /= np.linalg.norm(C, axis=1, keepdims=True)
    lab = rng.integers(0, 8, 2000)
    X = C[lab] + rng.normal(scale=0.05, size=(2000, 64))
    clustered = spark.createDataFrame(
        [(int(i), [float(v) for v in X[i]]) for i in range(2000)],
        "vec_id long, embedding array<double>",
    )
    d2 = str(tmp_path / "coh_idx")
    build_ann_index(clustered, d2, n_centroids=16, quantizer="hash")
    assert load_ann_meta(d2, spark)["mean_top1_cosine"] > 0.45
    qs2 = clustered.filter(F.col("vec_id") < 3).selectExpr(
        "vec_id as query_vec_id", "embedding as qvec"
    )
    with wmod.catch_warnings(record=True) as caught:
        wmod.simplefilter("always")
        search_ann_index(spark, d2, qs2, k=3, nprobe=4)
    assert not [w for w in caught if "noise-dominated" in str(w.message)]


def test_error_path_releases_probe_cache(spark, emb, tmp_path):
    """A failure AFTER the probe relation is persisted (here: a missing
    cells dir) must unpersist it before the exception propagates — the
    leak class round-5 ADVICE flagged (no try/finally around the
    post-persist jobs)."""
    import shutil

    from dense_retriever_spark.index.ann import AnnIndexPaths

    d = str(tmp_path / "ann_broken")
    build_ann_index(emb, d, n_centroids=NC, quantizer="hash")
    shutil.rmtree(AnnIndexPaths(d).cells)
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    with pytest.raises(Exception):
        search_ann_index(spark, d, _queries(emb), k=K, nprobe=NPROBE)
    # <= not ==: other tests' async unpersists may drain between the two
    # reads under a full-suite run; the leak under test would ADD an entry
    assert jsc.getPersistentRDDs().size() <= before


def test_shuffle_mode_bit_identical(spark, emb, ann_dir):
    """Both probe-join strategies are physical-plan choices only — results
    must match row for row (the search() broadcast/distributed invariant,
    dense twin)."""
    b = sorted(map(tuple, search_ann_index(
        spark, ann_dir, _queries(emb), k=K, nprobe=NPROBE,
        query_mode="broadcast",
    ).collect()))
    s = sorted(map(tuple, search_ann_index(
        spark, ann_dir, _queries(emb), k=K, nprobe=NPROBE,
        query_mode="shuffle",
    ).collect()))
    assert b == s and len(b) > 0


def test_meta_guard(spark, emb, tmp_path):
    d = str(tmp_path / "ann_bad")
    build_ann_index(emb, d, n_centroids=4)
    meta = load_ann_meta(d, spark)
    assert meta["n_centroids"] == 4 and meta["quantizer"] == "hash"
    from dense_retriever_spark.index import fs

    fs.write_text(d + "/ann_meta.json", '{"format_version": 99}', spark)
    with pytest.raises(ValueError, match="format v99"):
        search_ann_index(spark, d, _queries(emb))


def test_kmeans_quantizer_roundtrip(spark, emb, tmp_path):
    d = str(tmp_path / "ann_km")
    build_ann_index(emb, d, n_centroids=8, quantizer="kmeans", seed=5)
    got = search_ann_index(spark, d, _queries(emb), k=K, nprobe=4).collect()
    assert len(got) > 0
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_vec_id"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in by_q.values())


# --- incremental maintenance (round-7 ask #6) ---------------------------------

def _clustered(spark, lo, hi, sigma=0.08, dim=16, n_clusters=8, seed=1234):
    """Strongly-clustered deterministic vectors for ids [lo, hi) — the
    regime the IVF quantizer is built for (tools/bench_ann_recall.py)."""
    def gen(batches):
        import numpy as np
        import pandas as pd

        rs = np.random.RandomState(seed)
        centers = rs.randn(n_clusters, dim)
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        for pdf in batches:
            ids = pdf["id"].to_numpy(dtype=int)
            out = np.empty((len(ids), dim), dtype=np.float32)
            for j, i in enumerate(ids):
                r = np.random.RandomState((seed * 1_000_003 + i) % (2**31))
                v = centers[i % n_clusters] + sigma * r.randn(dim)
                out[j] = v / np.linalg.norm(v)
            yield pd.DataFrame({"vec_id": ids, "embedding": list(out)})

    return spark.range(lo, hi).mapInPandas(
        gen, "vec_id long, embedding array<float>"
    )


def _qset(emb_df, ids):
    return emb_df.filter(F.col("vec_id").isin(ids)).select(
        F.col("vec_id").alias("query_vec_id"),
        F.col("embedding").alias("qvec"),
    )


def test_refresh_appends_o_window_and_matches_inline(spark, tmp_path):
    """refresh_ann_index must (a) leave every pre-existing cell file
    byte-untouched (the O(window) property), (b) make the window's vectors
    searchable, and (c) be bit-identical to the inline operator run over
    the UNION corpus with the index's own centroids — i.e. the incremental
    path changes nothing but when the assignment happened."""
    import glob as _glob
    import os as _os

    from dense_retriever_spark.index.ann import refresh_ann_index
    from dense_retriever_spark.operators.similarity import ivf_ann_topk

    d = str(tmp_path / "ann_inc")
    base = _clustered(spark, 0, 400).localCheckpoint(eager=True)
    build_ann_index(base, d, n_centroids=16, quantizer="hash")
    before = {
        p: _os.path.getmtime(p)
        for p in _glob.glob(_os.path.join(d, "cells", "**", "*.parquet"),
                            recursive=True)
    }
    assert before

    win = _clustered(spark, 400, 600).localCheckpoint(eager=True)
    meta = refresh_ann_index(spark, d, win, assume_new_ids=True)
    assert meta["n_vectors"] == 600
    assert meta["n_at_train"] == 400  # train-time reference untouched
    after = {
        p: _os.path.getmtime(p)
        for p in _glob.glob(_os.path.join(d, "cells", "**", "*.parquet"),
                            recursive=True)
    }
    for p, mt in before.items():
        assert after[p] == mt, f"pre-existing cell file rewritten: {p}"

    union = base.unionByName(win)
    qs = _qset(union, [3, 410, 599]).localCheckpoint(eager=True)
    cents = spark.read.parquet(d + "/centroids")
    want = sorted(map(tuple, ivf_ann_topk(
        union, qs, k=K, nprobe=NPROBE, centroids=cents
    ).collect()))
    got = sorted(map(tuple, search_ann_index(
        spark, d, qs, k=K, nprobe=NPROBE
    ).collect()))
    assert got == want and len(got) > 0

    # a window vector finds itself at rank 1 when self-hits are kept
    self_hit = search_ann_index(
        spark, d, _qset(union, [599]), k=1, nprobe=NPROBE,
        exclude_self=False,
    ).collect()
    assert [(r["vec_id"], r["rank"]) for r in self_hit] == [(599, 1)]


def test_refresh_replay_is_idempotent(spark, tmp_path):
    """The at-least-once drain upstream can replay a window; the default
    anti-join dedup must make the second application a no-op (no duplicate
    cell rows, meta unchanged)."""
    from dense_retriever_spark.index.ann import refresh_ann_index

    d = str(tmp_path / "ann_replay")
    build_ann_index(
        _clustered(spark, 0, 200).localCheckpoint(eager=True),
        d, n_centroids=8,
    )
    win = _clustered(spark, 200, 260).localCheckpoint(eager=True)
    m1 = refresh_ann_index(spark, d, win)
    assert m1["n_vectors"] == 260
    m2 = refresh_ann_index(spark, d, win)  # replayed window
    assert m2["n_vectors"] == 260 and m2["mean_top1_cosine"] == m1["mean_top1_cosine"]
    assert spark.read.parquet(d + "/cells").count() == 260
    assert (
        spark.read.parquet(d + "/cells").select("vec_id").distinct().count()
        == 260
    )


def test_should_recluster_policy():
    from dense_retriever_spark.index.ann import should_recluster

    base = {
        "n_vectors": 100, "n_at_train": 100,
        "mean_top1_cosine": 0.6, "coherence_at_train": 0.6,
    }
    assert not should_recluster(base)
    assert should_recluster({**base, "n_vectors": 400})          # growth
    assert should_recluster({**base, "mean_top1_cosine": 0.45})  # drift
    assert not should_recluster({**base, "n_vectors": 399,
                                 "mean_top1_cosine": 0.51})
    # missing statistics (old meta) must not crash or fire the drift arm
    assert not should_recluster(
        {"n_vectors": 100, "n_at_train": 100, "mean_top1_cosine": None,
         "coherence_at_train": None}
    )


def test_maintain_reclusters_on_growth_and_recall_holds(spark, tmp_path):
    """Growing the index 4x past its training set must fire the recluster
    policy; after the retrain the index must beat brute-force-verified
    recall >= 0.9 on strongly-clustered data (the round-7 'recall
    re-measured' gate) and the policy must be reset."""
    from dense_retriever_spark.index.ann import (
        load_ann_meta,
        maintain_ann_index,
    )
    from dense_retriever_spark.operators.similarity import (
        cosine_topk_bruteforce,
    )

    d = str(tmp_path / "ann_grow")
    build_ann_index(
        _clustered(spark, 0, 300).localCheckpoint(eager=True),
        d, n_centroids=8,
    )
    win = _clustered(spark, 300, 1200).localCheckpoint(eager=True)
    out = maintain_ann_index(
        spark, d, win, assume_new_ids=True, auto_recluster=True,
    )
    assert out["reclustered"] is True and out["should_recluster"] is False
    meta = load_ann_meta(d, spark)
    assert meta["n_vectors"] == 1200 and meta["n_at_train"] == 1200
    assert meta["n_centroids"] >= 8  # the ~4*sqrt(N) re-sizing never shrinks

    union = _clustered(spark, 0, 1200).localCheckpoint(eager=True)
    qs = _qset(union, [7, 311, 777, 1101]).localCheckpoint(eager=True)
    truth = {
        (r["query_vec_id"], r["vec_id"])
        for r in cosine_topk_bruteforce(union, qs, k=5).collect()
    }
    # nprobe tracks K: the retrain re-sized K toward 4*sqrt(N), so a fixed
    # tiny nprobe would shrink the probed fraction as the index grows —
    # probe ~10% of the cells, the same fraction the pre-growth shape used
    nprobe = max(4, meta["n_centroids"] // 10)
    got = {
        (r["query_vec_id"], r["vec_id"])
        for r in search_ann_index(spark, d, qs, k=5, nprobe=nprobe).collect()
    }
    assert len(got & truth) / len(truth) >= 0.9


def test_refresh_heals_crash_between_cells_and_meta(spark, tmp_path):
    """Round-7 review finding: a crash AFTER the cells append but BEFORE
    the meta write used to be unhealable — the retry's anti-join dedups
    every replayed id, n_w == 0, and the stale meta was returned unchanged.
    The reconcile path must detect the cells/meta count mismatch and
    rewrite the meta (count + recomputed coherence)."""
    import json as _json

    from dense_retriever_spark.index.ann import (
        load_ann_meta,
        refresh_ann_index,
    )

    d = str(tmp_path / "ann_heal")
    base = _clustered(spark, 0, 300).localCheckpoint(eager=True)
    build_ann_index(base, d, n_centroids=8, quantizer="hash")
    win = _clustered(spark, 300, 400).localCheckpoint(eager=True)

    # simulate the crash: run the full refresh (cells + meta), then roll
    # the META back to its pre-refresh content — on-disk state is now
    # exactly "appended cells, unwritten meta"
    meta_before = dict(load_ann_meta(d, spark))
    healthy = refresh_ann_index(spark, d, win)
    assert healthy["n_vectors"] == 400
    with open(d + "/meta.json", "w") as f:
        f.write(_json.dumps(meta_before))

    # the retry: every id dedups away, but the reconcile must still fix
    # the counts and coherence
    healed = refresh_ann_index(spark, d, win)
    assert healed["n_vectors"] == 400
    assert abs(healed["mean_top1_cosine"] - healthy["mean_top1_cosine"]) < 1e-4
    on_disk = load_ann_meta(d, spark)
    assert on_disk["n_vectors"] == 400

    # and a consistent no-op refresh stays cheap: meta untouched
    again = refresh_ann_index(spark, d, win)
    assert again["n_vectors"] == 400
