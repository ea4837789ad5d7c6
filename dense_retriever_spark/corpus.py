"""Deterministic synthetic source-code corpus + reference query set.

The engine's input is an Iceberg-layout table ``(repo, path, commit, lang,
content)`` (BASELINE.json:input_hint). This sandbox materializes it at small
scale with a FULLY Spark-native generator — ``spark.range`` + column
expressions keyed on ``xxhash64`` — so the same code generates 200 rows for a
unit test or 10^9 rows on a cluster with no driver-side data and perfect
determinism (no Python RNG, no Date.now; xxhash64 is a fixed function of the
row id and a salt literal).

Vocabulary is seeded with mega-hot terms ('def', 'import', ...) at high weight
to exercise the skew path (SURVEY.md §7.4), plus camelCase and snake_case
identifiers to exercise the code-aware tokenizer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# weighted vocabulary: repetition = weight. Hot keywords dominate like real code.
_HOT = ["def", "import", "return", "self", "the", "class", "for", "if"]
_IDENTS = [
    "getHTTPResponse",
    "snake_case_var",
    "parseQueryPlan",
    "build_index",
    "blockMaxWand",
    "posting_list",
    "DeltaCodec",
    "varbyte_encode",
    "shardManifest",
    "token_stream",
    "scoreAccumulator",
    "doc_frequency",
    "termStatistics",
    "inverted_index",
    "QueryEngine",
    "bm25_score",
    "mergeShards",
    "skew_salt",
    "ArrowBatch",
    "catalyst_plan",
    "TungstenRow",
    "shuffle_bytes",
    "broadcastJoin",
    "partition_pruning",
    "executorCore",
    "spill_metrics",
    "checkpointManifest",
    "lineage_graph",
    "adaptiveCoalesce",
    "codegen_stage",
]
_RARE = [f"sym{i:04d}" for i in range(400)]

#: full weighted vocab — hot terms repeated 40x, identifiers 4x, rare once.
VOCAB: list[str] = _HOT * 40 + _IDENTS * 4 + _RARE

LANGS = ["py", "py", "py", "java", "java", "go", "rs", "ts"]  # weighted


def _pick(arr_col, hash_col):
    return F.element_at(arr_col, (F.pmod(hash_col, F.size(arr_col)) + 1).cast("int"))


def _splitmix64(x):
    """Vectorized splitmix64 over numpy uint64 — the generator's only RNG.
    A pure function of the input, so generation is independent of
    partitioning and identical across runs and parallelism levels."""
    import numpy as np

    with np.errstate(over="ignore"):
        x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
    return x


def synth_corpus(spark: SparkSession, n_docs: int, seed: int = 42) -> DataFrame:
    """Generate ``n_docs`` deterministic code-like documents.

    Content is 20-400 vocab tokens joined by spaces. Layout matches the
    Iceberg input hint: (repo, path, commit, lang, content). Generation is a
    vectorized Arrow ``mapInPandas`` over ``spark.range`` — numpy splitmix64
    keyed on (seed, doc id, token position), so the output is a pure function
    of the row id (same corpus at any parallelism; ~100x faster than the
    equivalent Catalyst expression tree with an 840-literal array).
    """
    import hashlib

    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    vocab = np.array(VOCAB)
    langs = np.array(LANGS)
    v, nl = len(vocab), len(langs)
    max_tokens = 400

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy(np.uint64)
            b = ids.size
            n_tok = (
                20 + _splitmix64(ids + np.uint64(seed * 1_000_003)) % np.uint64(381)
            ).astype(np.int64)
            # token index matrix [b, max_tokens]: mix(seed, id, j)
            j = np.arange(max_tokens, dtype=np.uint64)
            keys = _splitmix64(
                (ids[:, None] * np.uint64(0x9E3779B1))
                + j[None, :]
                + np.uint64(seed)
            )
            tok_idx = (keys % np.uint64(v)).astype(np.int64)
            toks = vocab[tok_idx]
            contents = [
                " ".join(toks[r, : n_tok[r]]) for r in range(b)
            ]
            lang_idx = (_splitmix64(ids + np.uint64(seed + 7)) % np.uint64(nl)).astype(int)
            commits = [
                hashlib.sha256(f"{seed}:{i}".encode()).hexdigest()[:40] for i in ids
            ]
            # int(i): numpy uint64 % python-int promotes to float64 ('0.0')
            yield pd.DataFrame(
                {
                    "repo": [f"org{int(i) % 7}/repo{int(i) % 23}" for i in ids],
                    "path": [f"src/pkg{int(i) % 50}/mod_{int(i)}.py" for i in ids],
                    "commit": commits,
                    "lang": langs[lang_idx],
                    "content": contents,
                }
            )

    return spark.range(n_docs).mapInPandas(
        gen, schema="repo string, path string, commit string, lang string, content string"
    )


def ingest(corpus: DataFrame) -> DataFrame:
    """Assign the dense doc_id + per-row content fingerprint.

    doc_id = dense row_number over (repo, path, commit) — the rebuild's analog
    of the reference's FAISS IDMap int64 remapping
    (/root/reference/dense_retriever/transforms/ann_index.py:13-21,88-90).
    content_sha is the per-row invariant (BASELINE.json:input_hint).

    Note: a global row_number is a single-partition sort at 10^12 rows; the
    scale path uses ``zipWithIndex``-style partition-offset assignment (see
    index/build.py::assign_doc_ids_scalable) — this helper is the small-scale
    / testing entry where a window is fine and gives a stable oracle ordering.
    """
    from pyspark.sql import Window

    w = Window.orderBy("repo", "path", "commit")
    return corpus.withColumn("doc_id", F.row_number().over(w).cast("long") - 1).withColumn(
        "content_sha", F.sha2(F.col("content"), 256)
    )


def synth_queries(spark: SparkSession, n_queries: int = 100, seed: int = 43) -> DataFrame:
    """Reference query set: 1-5 seeded vocab terms per query, ~10% OOV."""
    vocab = F.array(*[F.lit(v) for v in VOCAB + ["zzqq_oov_term"] * (len(VOCAB) // 10)])
    df = spark.range(n_queries).withColumnRenamed("id", "query_id")
    h = lambda *cols: F.abs(F.xxhash64(F.lit(seed), *cols))  # noqa: E731
    n_terms = (F.pmod(h(F.col("query_id")), F.lit(5)) + 1).cast("int")
    toks = F.transform(
        F.sequence(F.lit(1), n_terms),
        lambda j: _pick(vocab, h(F.col("query_id"), j)),
    )
    return df.select(
        F.col("query_id").cast("long").alias("query_id"),
        F.array_join(toks, " ").alias("query"),
    )
