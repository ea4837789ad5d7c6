"""Same-day hardware-ceiling control for the scaling evidence.

Measures what N -> 4N scaling is PHYSICALLY possible on this box for the
build's dominant workload (string tokenization over the corpus), with no
Spark at all: a multiprocessing.Pool runs the IDENTICAL tokenizer
(functions.tokenizer.tokenize_code_flat) over identical data at N and 4N
worker processes. Any shortfall below 1.0 here is the shared memory bus /
SMT, not the engine — on a real cluster each of the 4N executors has its own
memory bandwidth, so the ceiling there is ~1.0.

Writes BENCH/ceiling.json, which bench_scaling.write_report embeds so the
engine's measured efficiency is always read against a SAME-DAY control (VM
noise on this box swings single measurements by 2x across hours).

Usage: python tools/bench_ceiling.py [n_docs] [n_cores]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _tokenize_chunk(texts: list[str]) -> int:
    import pandas as pd

    from dense_retriever_spark.functions.tokenizer import tokenize_code_flat

    _, codes, _, _ = tokenize_code_flat(pd.Series(texts))
    return int(codes.size)


def _load_texts(n_docs: int) -> list[str]:
    """Corpus content without Spark: generate the same synthetic corpus
    deterministically (corpus.synth_corpus needs a session; the raw text
    generator below mirrors its content shape closely enough for a
    bandwidth control — what matters is identical data across N and 4N)."""
    import numpy as np

    rng = np.random.RandomState(42)
    words = [f"symbol_{i:04d}" for i in range(2000)]
    kws = ["def", "return", "import", "class", "for", "if", "else", "while"]
    out = []
    for i in range(n_docs):
        n = 40 + int(rng.randint(0, 160))
        idx = rng.randint(0, len(words), n)
        toks = [kws[j % len(kws)] if j % 7 == 0 else words[idx[j]] for j in range(n)]
        out.append("\n".join(" ".join(toks[k : k + 8]) for k in range(0, n, 8)))
    return out


def _run(texts: list[str], procs: int) -> float:
    chunk = max(1, len(texts) // (procs * 8))
    chunks = [texts[i : i + chunk] for i in range(0, len(texts), chunk)]
    t0 = time.time()
    with mp.Pool(procs) as pool:
        total = sum(pool.map(_tokenize_chunk, chunks))
    dt = time.time() - t0
    assert total > 0
    return len(texts) / dt


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_cores = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    texts = _load_texts(n_docs)
    # warm page cache / allocator with a throwaway pass
    _run(texts[: n_docs // 10], n_cores)
    lo = _run(texts, n_cores)
    hi = _run(texts, n_cores * 4)
    report = {
        "stamp": datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC"),
        "workload": "tokenize_code_flat over synthetic corpus text",
        "n_docs": n_docs,
        "low_procs": n_cores,
        "high_procs": n_cores * 4,
        "low_docs_per_sec": round(lo, 1),
        "high_docs_per_sec": round(hi, 1),
        "speedup": round(hi / lo, 3),
        "ceiling_efficiency": round(hi / lo / 4.0, 3),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "ceiling.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
