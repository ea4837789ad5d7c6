"""ANN recall/latency sweep at realistic N (round-4 verdict items 5+6).

The repo's q31/q37 recall numbers (0.91 SRP, 0.77 IVF) come from tiny
weakly-clustered fixtures; this tool measures recall@k against the exact
brute-force oracle on a 200k-vector CLUSTERED synthetic set — the regime
ANN defaults must be justified in:

  - SRP multi-band OR (srp_ann_topk): planes × bands sweep
  - persisted IVF index (index/ann.py): nprobe sweep, hash AND kmeans
    quantizers — exercising the trained-quantizer path end-to-end through
    build_ann_index/search_ann_index (the same artifact the `build-ann-index`
    CLI writes)

Synthetic set: a mixture of n_clusters unit-norm Gaussian centers with
per-vector noise sigma, generated deterministically per vec_id (pure
function of the id — same data at any parallelism), so clusters are real
but overlapping: IVF has structure to exploit and recall < 1 is possible.

Usage: python tools/bench_ann_recall.py [n_vecs] [n_queries] [k] [sigma]
Writes one JSON line per config to stdout and the full sweep to
BENCH/ann_recall_sigma{sigma}.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DIM = 64
N_CLUSTERS = 200
SEED = 11

#: per-vector noise scale. The NOISE NORM is sigma*sqrt(dim) against a
#: unit-norm center, so at dim=64: sigma=0.35 -> noise ~2.8x the center
#: (weakly clustered — angle structure only, the repo's synthetic-fixture
#: regime) while sigma=0.08 -> noise ~0.64 (strongly clustered — the
#: real-embedding regime the IVF quantizer is built for). Sweep both.
SIGMA = 0.35


def clustered_embeddings(spark, n: int, sigma: float = SIGMA):
    """(vec_id, embedding): unit-norm center[vec_id % C] + sigma·noise,
    renormalized. Deterministic per vec_id at any parallelism."""
    def gen(batches):
        import numpy as np
        import pandas as pd

        rs = np.random.RandomState(SEED)
        centers = rs.randn(N_CLUSTERS, DIM)
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        for pdf in batches:
            ids = pdf["id"].to_numpy(dtype=int)
            # one RandomState per row, keyed on vec_id: order-independent
            out = np.empty((len(ids), DIM), dtype=np.float32)
            for j, i in enumerate(ids):
                r = np.random.RandomState((SEED * 1_000_003 + i) % (2**31))
                v = centers[i % N_CLUSTERS] + sigma * r.randn(DIM)
                out[j] = v / np.linalg.norm(v)
            yield pd.DataFrame({"vec_id": ids, "embedding": list(out)})

    return spark.range(n).mapInPandas(gen, "vec_id long, embedding array<float>")


def main() -> None:
    n_vecs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    sigma = float(sys.argv[4]) if len(sys.argv) > 4 else SIGMA

    from pyspark.sql import functions as F

    from dense_retriever_spark.index.ann import build_ann_index, search_ann_index
    from dense_retriever_spark.operators.similarity import (
        cosine_topk_bruteforce,
        srp_ann_topk,
    )
    from dense_retriever_spark.session import get_spark

    spark = get_spark(
        app_name="ann-recall", master="local[32]", shuffle_partitions=32,
        extra_conf={"spark.local.dir": "/dev/shm/spark-annrec"},
    )
    shm = f"/dev/shm/ann_recall_data_{sigma}"
    clustered_embeddings(spark, n_vecs, sigma).write.mode(
        "overwrite"
    ).parquet(shm)
    emb = spark.read.parquet(shm)
    stride = max(1, n_vecs // n_queries)
    qv = emb.filter(F.col("vec_id") % stride == 0).select(
        F.col("vec_id").alias("query_vec_id"),
        F.col("embedding").alias("qvec"),
    ).cache()
    nq = qv.count()

    def pairs(df) -> set:
        return {(r["query_vec_id"], r["vec_id"]) for r in df.collect()}

    t0 = time.time()
    oracle = pairs(cosine_topk_bruteforce(emb, qv, k=k))
    t_oracle = time.time() - t0
    results = [{
        "config": "bruteforce_oracle", "recall": 1.0,
        "seconds": round(t_oracle, 2), "n_vecs": n_vecs, "n_queries": nq,
        "k": k,
    }]
    print(json.dumps(results[0]), flush=True)

    def run(name: str, fn) -> None:
        t0 = time.time()
        got = pairs(fn())
        sec = time.time() - t0
        rec = len(got & oracle) / len(oracle)
        row = {"config": name, "recall": round(rec, 4),
               "seconds": round(sec, 2)}
        results.append(row)
        print(json.dumps(row), flush=True)

    # --- SRP: planes × bands (the q31 operator) ---
    for planes, bands in [(64, 8), (64, 16), (64, 32), (128, 16), (128, 32)]:
        run(
            f"srp_p{planes}_b{bands}",
            lambda p=planes, b=bands: srp_ann_topk(
                emb, qv, k=k, dim=DIM, n_planes=p, bands=b
            ),
        )

    # --- persisted IVF index: nprobe sweep × quantizer (the q50 artifact) ---
    for quant in ("hash", "kmeans"):
        idx = f"/dev/shm/ann_recall_idx_{quant}_{sigma}"
        t0 = time.time()
        build_ann_index(emb, idx, n_centroids=256, quantizer=quant)
        t_build = time.time() - t0
        row = {"config": f"ivf_{quant}_build_k256",
               "seconds": round(t_build, 2)}
        results.append(row)
        print(json.dumps(row), flush=True)
        for nprobe in (1, 2, 4, 8, 16, 32):
            run(
                f"ivf_{quant}_np{nprobe}",
                lambda np_=nprobe, d=idx: search_ann_index(
                    spark, d, qv, k=k, nprobe=np_
                ),
            )

    out_path = os.path.join(
        REPO, "BENCH", f"ann_recall_sigma{sigma}.json"
    )
    with open(out_path, "w") as f:
        json.dump({"n_vecs": n_vecs, "n_queries": nq, "k": k, "dim": DIM,
                   "n_clusters": N_CLUSTERS, "sigma": sigma,
                   "results": results}, f, indent=1)
    print(f"wrote {out_path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
