"""Search-side scaling evidence: both query planes at N and 4N cores.

The build side's N->4N scaling is covered by bench_scaling.py; this measures
the SEARCH side — the round-4 distributed query plane in particular. One
index is built once (local[32], tmpfs); then two fresh JVMs (local[N],
local[4N]) each run:

  - the broadcast plane over an interactive batch (n_queries, default 200)
  - the distributed plane over a large batch (n_big, default 5000) — the
    training-set regime where the query relation flows executor-side

Usage: python tools/bench_search_scaling.py [n_docs] [n_queries] [n_big] [n_cores] [dps]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BUILDER = r"""
import sys, tempfile
sys.path.insert(0, ".")
n_docs = int(sys.argv[1]); dps = int(sys.argv[2]); out = sys.argv[3]
from dense_retriever_spark.session import get_spark
spark = get_spark(app_name="stage-idx", master="local[32]",
                  shuffle_partitions=32,
                  extra_conf={"spark.local.dir": "/dev/shm/spark-sidx"})
from dense_retriever_spark.corpus import synth_corpus
from dense_retriever_spark.index.build import assign_doc_ids_scalable, build_index
corpus = assign_doc_ids_scalable(synth_corpus(spark, n_docs), partitions=32)
build_index(corpus, out, docs_per_shard=dps, term_buckets=4)
print("BUILT")
spark.stop()
"""

WORKER = r"""
import json, sys, time
sys.path.insert(0, ".")
cpus = int(sys.argv[1]); idx = sys.argv[2]
n_q = int(sys.argv[3]); n_big = int(sys.argv[4])
from dense_retriever_spark.session import get_spark
spark = get_spark(app_name=f"ss-{cpus}", master=f"local[{cpus}]",
                  shuffle_partitions=cpus,
                  extra_conf={"spark.local.dir": f"/dev/shm/spark-ss-{cpus}"})
from dense_retriever_spark.corpus import synth_queries
from dense_retriever_spark.index.search import search

q = synth_queries(spark, n_q).cache(); q.count()
bq = synth_queries(spark, n_big).cache(); bq.count()
# one warm call so JVM/py-worker startup is not attributed to either plane
search(spark, idx, q.limit(5), k=10).count()

t0 = time.time()
search(spark, idx, q, k=10, query_mode="broadcast").count()
t_b = time.time() - t0
t0 = time.time()
search(spark, idx, bq, k=10, query_mode="distributed").count()
t_d = time.time() - t0
print("RESULT " + json.dumps({
    "cpus": cpus,
    "broadcast_sec": round(t_b, 3),
    "broadcast_qps": round(n_q / t_b, 1),
    "distributed_sec": round(t_d, 3),
    "distributed_qps": round(n_big / t_d, 1),
}))
spark.stop()
"""


def run(script: str, *args: str) -> dict | None:
    out = subprocess.run(
        [sys.executable, "-c", script, *args],
        cwd=REPO, capture_output=True, text=True, timeout=1200,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    if "BUILT" in out.stdout:
        return None
    raise RuntimeError(out.stdout[-2000:] + out.stderr[-2000:])


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    n_big = int(sys.argv[3]) if len(sys.argv) > 3 else 5000
    n = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    dps = int(sys.argv[5]) if len(sys.argv) > 5 else 2048

    idx = "/dev/shm/search_scale_idx/index"
    run(BUILDER, str(n_docs), str(dps), idx)
    lo = run(WORKER, str(n), idx, str(n_q), str(n_big))
    hi = run(WORKER, str(4 * n), idx, str(n_q), str(n_big))
    report = {
        "ts": datetime.now(timezone.utc).isoformat(timespec="minutes"),
        "n_docs": n_docs, "n_queries": n_q, "n_big": n_big, "dps": dps,
        "low": lo, "high": hi,
        "broadcast_speedup": round(lo["broadcast_sec"] / hi["broadcast_sec"], 3),
        "distributed_speedup": round(
            lo["distributed_sec"] / hi["distributed_sec"], 3
        ),
        "distributed_efficiency": round(
            lo["distributed_sec"] / hi["distributed_sec"] / 4, 3
        ),
    }
    print(json.dumps(report, indent=2))
    import shutil

    shutil.rmtree(os.path.dirname(idx), ignore_errors=True)


if __name__ == "__main__":
    main()
