"""N→4N scaling evidence for the round-7 query surfaces (boolean / prefix /
fuzzy / multifield / mlt), per the task directive's two-parallelism-level
protocol.

The INDEX is staged+built once (untimed, local[32], tmpfs) and shared
read-only; each parallelism level then runs the same three query batches on
the DISTRIBUTED plane (the scale plane — O(1) driver state) in its own JVM:

  boolean — "+t1 t2 -t3" derived from the standard synthetic query set
  prefix  — first term as a 4-char trailing-* dictionary pattern
  fuzzy   — first term with its 3rd char deleted, trailing ~ (edit dist 1)

       efficiency = (qps_4N / qps_N) / 4   per mode

Usage: python tools/bench_modes_scaling.py [n_docs] [n_queries] [lo] [hi]
(defaults 600000 docs, 2000 queries, local[4] vs local[16])
Results print as one JSON line; paste into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BUILDER = r"""
import sys
sys.path.insert(0, ".")
n_docs = int(sys.argv[1]); corpus_path = sys.argv[2]; idx = sys.argv[3]
dps = int(sys.argv[4])
from dense_retriever_spark.session import get_spark
spark = get_spark(app_name="modes-build", master="local[32]",
                  shuffle_partitions=32,
                  extra_conf={"spark.local.dir": "/dev/shm/spark-modes-b"})
from dense_retriever_spark.corpus import synth_corpus
from dense_retriever_spark.index.build import (
    assign_doc_ids_scalable, build_index,
)
import os
if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
    corpus = assign_doc_ids_scalable(synth_corpus(spark, n_docs), partitions=32)
    corpus.write.mode("overwrite").parquet(corpus_path)
if not os.path.exists(os.path.join(idx, "stats.json")):
    build_index(spark.read.parquet(corpus_path), idx,
                docs_per_shard=dps, term_buckets=4)
print("BUILT")
spark.stop()
"""

WORKER = r"""
import json, sys, time
sys.path.insert(0, ".")
cpus = int(sys.argv[1]); idx = sys.argv[2]; n_queries = int(sys.argv[3])
from dense_retriever_spark.session import get_spark
spark = get_spark(app_name=f"modes-{cpus}", master=f"local[{cpus}]",
                  shuffle_partitions=cpus,
                  extra_conf={"spark.local.dir": f"/dev/shm/spark-modes-{cpus}"})
from dense_retriever_spark.corpus import synth_queries
from dense_retriever_spark.index.boolean import search_boolean
from dense_retriever_spark.index.fuzzy import search_fuzzy
from dense_retriever_spark.index.prefix import search_prefix

base = synth_queries(spark, n_queries).cache(); base.count()
bool_q = base.selectExpr("query_id",
    "concat('+', split(query, ' ')[0],"
    " case when size(split(query, ' ')) > 1"
    "      then concat(' ', split(query, ' ')[1]) else '' end,"
    " case when size(split(query, ' ')) > 2"
    "      then concat(' -', split(query, ' ')[2]) else '' end) as query")
pfx_q = base.selectExpr("query_id",
    "concat(substring(split(query, ' ')[0], 1, 4), '*',"
    " case when size(split(query, ' ')) > 1"
    "      then concat(' ', split(query, ' ')[1]) else '' end) as query")
fz_q = base.selectExpr("query_id",
    "concat(substring(split(query, ' ')[0], 1, 2),"
    "       substring(split(query, ' ')[0], 4), '~',"
    " case when size(split(query, ' ')) > 1"
    "      then concat(' ', split(query, ' ')[1]) else '' end) as query")

out = {"cpus": cpus, "n_queries": n_queries}
from dense_retriever_spark.index.fields import search_fields
from dense_retriever_spark.index.mlt import more_like_this
from dense_retriever_spark.index.search import load_stats

n_docs_idx = int(load_stats(idx)["n_docs"])
# multifield scores UNTRUNCATED per-field match relations and the synthetic
# 35-word vocabulary makes every query match most of the corpus — the
# worst-case density no real corpus has. 10x fewer queries keeps the mode
# measurable at local[4] while the N-vs-4N ratio (same workload both
# levels) stays meaningful; mlt is sized to match.
n_small = max(n_queries // 10, 50)
small = base.limit(n_small).cache(); small.count()
seeds = spark.range(n_small).selectExpr(
    "id as query_id",
    f"cast(id * {max(n_docs_idx // max(n_queries, 1), 1)} as long) as doc_id",
)
for name, n_q_mode, run in [
    ("boolean", n_queries, lambda: search_boolean(
        spark, idx, bool_q, k=10, query_mode="distributed").count()),
    ("prefix",  n_queries, lambda: search_prefix(
        spark, idx, pfx_q, k=10, query_mode="distributed").count()),
    ("fuzzy",   n_queries, lambda: search_fuzzy(
        spark, idx, fz_q, k=10, query_mode="distributed").count()),
    ("multifield", n_small, lambda: search_fields(
        spark, [("a", idx, 1.0), ("b", idx, 0.5)], small, k=10,
        query_mode="distributed").count()),
    ("mlt", n_small, lambda: more_like_this(
        spark, idx, seeds, k=10, max_terms=10,
        query_mode="distributed").count()),
]:
    t0 = time.time()
    n = run()
    dt = time.time() - t0
    out[name] = {"sec": round(dt, 3), "qps": round(n_q_mode / dt, 1),
                 "rows": n, "n_queries": n_q_mode}
print("RESULT " + json.dumps(out))
spark.stop()
"""


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    lo = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    hi = int(sys.argv[4]) if len(sys.argv) > 4 else 16
    dps = max(1024, n_docs // 64)
    corpus = f"/dev/shm/modes_corpus_{n_docs}"
    idx = f"/dev/shm/modes_idx_{n_docs}/index"

    b = subprocess.run(
        [sys.executable, "-c", BUILDER, str(n_docs), corpus, idx, str(dps)],
        capture_output=True, text=True, cwd=REPO,
    )
    if "BUILT" not in b.stdout:
        raise RuntimeError(f"build failed\n{b.stdout[-800:]}\n{b.stderr[-800:]}")

    results = {}
    for cpus in (lo, hi):
        out = subprocess.run(
            [sys.executable, "-c", WORKER, str(cpus), idx, str(n_queries)],
            capture_output=True, text=True, cwd=REPO,
        )
        for line in out.stdout.splitlines():
            if line.startswith("RESULT "):
                results[cpus] = json.loads(line[len("RESULT "):])
                break
        else:
            raise RuntimeError(
                f"worker local[{cpus}] no RESULT\n{out.stdout[-1500:]}"
                f"\n{out.stderr[-1500:]}"
            )

    factor = hi / lo
    report = {
        "ts": datetime.now(timezone.utc).isoformat(timespec="seconds"),
        "n_docs": n_docs, "n_queries": n_queries,
        "levels": [lo, hi], "runs": results,
    }
    for mode in ("boolean", "prefix", "fuzzy", "multifield", "mlt"):
        sp = results[hi][mode]["qps"] / results[lo][mode]["qps"]
        report[f"{mode}_speedup"] = round(sp, 3)
        report[f"{mode}_efficiency"] = round(sp / factor, 3)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
