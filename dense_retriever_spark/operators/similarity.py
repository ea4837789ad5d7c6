"""Similarity search over embedding columns (ARRAY<FLOAT>).

Reference analog: the FAISS exact inner-product top-n search
(/root/reference/dense_retriever/transforms/ann_index.py:88,95). Two paths:

- ``cosine_topk_bruteforce`` — the exact baseline: broadcast the (small) query
  vectors against the corpus, dot products as native ``F.aggregate``/
  ``F.zip_with`` column math (JVM-side), window top-k. At 100 TB this is the
  "Flat index" equivalent: one scan, no index.
- ``lsh_bucketed_topk`` — the scale path: sign-random-projection LSH buckets
  (hyperplanes derived deterministically from the first dims), candidates only
  within the query's bucket → the scan is restricted to matching buckets via a
  shuffle-free broadcast join on bucket id. Recall < 1 by construction; the
  bruteforce path is the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dense_retriever_spark.operators.topk import topk_per_group


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_expr(a, b):
    return F.round(
        _dot(a, b)
        / F.greatest(_norm(a) * _norm(b), F.lit(1e-12)),
        6,
    )


def cosine_topk_bruteforce(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_vec_id",
) -> DataFrame:
    """Exact cosine top-k: (query_vec_id, vec_id, cosine, rank).

    ``queries``: (query_vec_id, qvec). Cross join is |Q| × N with |Q| tiny and
    broadcast — each executor scans its corpus slice once per batch of queries.
    Self-matches (same id) are excluded.
    """
    q = F.broadcast(queries)
    joined = embeddings.alias("e").crossJoin(q.alias("q")).filter(
        F.col(f"q.{qid_col}") != F.col(f"e.{id_col}")
    )
    scored = joined.select(
        F.col(f"q.{qid_col}").alias("query_vec_id"),
        F.col(f"e.{id_col}").alias("vec_id"),
        cosine_expr(F.col("q.qvec"), F.col(f"e.{vec_col}")).alias("cosine"),
    )
    return topk_per_group(scored, "query_vec_id", "cosine", k, id_col="vec_id")


def srp_planes(dim: int, n_planes: int, seed: int = 7):
    """Seeded Gaussian hyperplanes, (n_planes, dim) float64. The SAME matrix
    parameterizes the Spark operator and the DuckDB oracle SQL (literals are
    emitted with repr(), which round-trips doubles exactly)."""
    import numpy as np

    return np.random.RandomState(seed).standard_normal((n_planes, dim))


def _plane_lit(plane):
    return F.array(*[F.lit(float(x)) for x in plane])


def _srp_band_structs(vec_col, planes, bands: int):
    """array<struct<band_id,band_key>>: band b's key packs the sign bits of
    its planes' projections. Projections are rounded to 6dp before the sign
    test so Spark and the SQL oracle agree even when summation order differs
    by an ulp around zero.

    All projections are computed by ONE ``transform`` lambda over a 2-D
    plane-matrix literal (not n_planes separate aggregate expressions): the
    values are identical, but Catalyst analyzes one higher-order function
    instead of 64 nested lambda trees — measured ~4x faster query planning
    on the 64×64 configuration."""
    bits = srp_bits_expr(vec_col, planes)
    return _band_structs_from_bits(bits, planes.shape[0], bands)


def srp_bits_expr(vec_col, planes):
    """array<long> of sign bits, all projections via ONE transform lambda
    over the 2-D plane-matrix literal."""
    planes_lit = F.array(
        *[F.array(*[F.lit(float(x)) for x in p]) for p in planes]
    )
    return F.transform(
        planes_lit, lambda p: (F.round(_dot(vec_col, p), 6) > 0).cast("long")
    )


def _band_structs_from_bits(bits_col, n_planes: int, bands: int):
    """Band structs from an ALREADY-MATERIALIZED bits column. Callers must
    withColumn the bits first: referencing the bits EXPRESSION 64 times would
    copy its 4096-literal subtree into every element_at (no cross-reference
    sharing in the unresolved plan) — that tree blow-up made Catalyst
    analysis take ~20s per SRP query."""
    w = n_planes // bands
    structs = []
    for b in range(bands):
        key = None
        for j in range(w):
            bit = F.element_at(bits_col, b * w + j + 1) * F.lit(1 << j)
            key = bit if key is None else key + bit
        structs.append(
            F.struct(F.lit(b).alias("band_id"), key.alias("band_key"))
        )
    return F.array(*structs)


def srp_ann_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 3,
    dim: int = 64,
    n_planes: int = 64,
    bands: int = 16,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_vec_id",
) -> DataFrame:
    """ANN top-k via seeded sign-random-projection LSH, multi-band OR.

    Candidates = vectors sharing ≥1 of ``bands`` band keys with the query
    (each band = ``n_planes/bands`` sign bits); exact cosine + top-k on the
    candidate set only. The equi-join on (band_id, band_key) replaces the
    cross join — per band the expected candidate fraction is the bucket
    collision mass, and the OR over bands sets the recall/candidate tradeoff
    (P[candidate] = 1-(1-p^w)^bands with p = 1-θ/π per SRP). On this repo's
    weakly-clustered synthetic embeddings 64×16 measures recall@3 ≈ 0.91 vs
    the bruteforce oracle (tests/test_similarity.py); strongly-clustered real
    embeddings prune far harder at the same recall. Replaces the round-1
    placeholder ('first 4 dims > 0', single band, unquantified recall).
    """
    planes = srp_planes(dim, n_planes, seed)
    e = (
        embeddings.select(
            F.col(id_col).alias("vec_id"), F.col(vec_col).alias("evec")
        )
        .withColumn("_bits", srp_bits_expr(F.col("evec"), planes))
        .withColumn(
            "bk", F.explode(_band_structs_from_bits(F.col("_bits"), n_planes, bands))
        )
    )
    q = (
        queries.select(F.col(qid_col).alias("query_vec_id"), F.col("qvec"))
        .withColumn("_bits", srp_bits_expr(F.col("qvec"), planes))
        .withColumn(
            "bk", F.explode(_band_structs_from_bits(F.col("_bits"), n_planes, bands))
        )
    )
    joined = e.join(
        F.broadcast(q),
        (e["bk.band_id"] == q["bk.band_id"])
        & (e["bk.band_key"] == q["bk.band_key"])
        & (F.col("query_vec_id") != F.col("vec_id")),
    )
    scored = joined.select(
        "query_vec_id",
        "vec_id",
        cosine_expr(F.col("qvec"), F.col("evec")).alias("cosine"),
    ).distinct()  # a pair matching in m bands appears m times; cosine is deterministic
    return topk_per_group(scored, "query_vec_id", "cosine", k, id_col="vec_id")


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.9,
    dim: int = 64,
    n_planes: int = 64,
    bands: int = 16,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int = 1024,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine ≥ threshold)
    — the embedding leg of the dedup family (task brief: 'embedding-cosine
    near-dup'), never a cross join.

    Candidates come from a banded SRP self-join (same seeded hyperplanes as
    srp_ann_topk); exact cosine verifies. High-cosine pairs collide with
    probability 1-(1-p^w)^bands, p = 1-θ/π — at threshold 0.9 (θ ≈ 0.45 rad)
    and 64×16 that is > 0.999, so recall on true near-dups is effectively
    exhaustive while the join touches only same-bucket pairs. Oversized
    buckets (degenerate embedding clusters) are capped like minhash LSH.
    """
    planes = srp_planes(dim, n_planes, seed)
    e = (
        embeddings.select(
            F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec")
        )
        .withColumn("_bits", srp_bits_expr(F.col("vec"), planes))
        .withColumn(
            "bk", F.explode(_band_structs_from_bits(F.col("_bits"), n_planes, bands))
        )
    )
    flat = e.select("vec_id", "vec", "bk.band_id", "bk.band_key")
    sizes = flat.groupBy("band_id", "band_key").agg(F.count("*").alias("_n"))
    bounded = flat.join(
        sizes.filter((F.col("_n") >= 2) & (F.col("_n") <= max_bucket)),
        ["band_id", "band_key"],
        "left_semi",
    )
    a = bounded.alias("a")
    b = bounded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            cosine_expr(F.col("a.vec"), F.col("b.vec")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .distinct()
    )


def ivf_ann_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 3,
    centroid_mod: int = 31,
    nprobe: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_vec_id",
) -> DataFrame:
    """IVF-style ANN: coarse quantizer + probe-limited exact scan.

    Centroids are SAMPLED VECTORS (every ``centroid_mod``-th row — the
    classic random-sampling init, and crucially a pure function of the table
    itself, so the construction works identically at any scale and the
    DuckDB oracle reproduces it with a plain self-join — no trained state).
    Every vector is assigned to its top-1 centroid by cosine; a query probes
    its ``nprobe`` nearest centroids and scans only those cells, exactly.
    All ordering uses the engine-wide (rounded cosine DESC, id ASC)
    tie-break, so cell assignment is deterministic cross-engine.

    Honest scale note (measured, tests/test_dedup_similarity.py): on this
    repo's weakly-clustered synthetic embeddings IVF recalls ≈ 0.77 @ k=3
    while scanning ≈ 47% of the corpus — the data has little cluster
    structure for the quantizer to exploit, and the SRP multi-band operator
    (srp_ann_topk, recall ≈ 0.91) is the better scale path HERE. On real
    embedding distributions (tight semantic clusters) the cell scan shrinks
    toward n/K per probe and IVF dominates; production would swap the
    sampled centroids for k-means-trained ones — same plumbing, the
    assignment/probe joins are unchanged.
    """
    cents = F.broadcast(
        embeddings.filter(F.pmod(F.col(id_col), F.lit(centroid_mod)) == 0).select(
            F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("cvec")
        )
    )
    e_scored = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("evec")
    ).crossJoin(cents).select(
        "vec_id", "evec", "centroid_id",
        cosine_expr(F.col("evec"), F.col("cvec")).alias("cdot"),
    )
    cells = topk_per_group(
        e_scored, "vec_id", "cdot", 1, id_col="centroid_id"
    ).select("vec_id", "evec", "centroid_id")
    q_scored = queries.select(
        F.col(qid_col).alias("query_vec_id"), F.col("qvec")
    ).crossJoin(cents).select(
        "query_vec_id", "qvec", "centroid_id",
        cosine_expr(F.col("qvec"), F.col("cvec")).alias("cdot"),
    )
    probes = topk_per_group(
        q_scored, "query_vec_id", "cdot", nprobe, id_col="centroid_id"
    ).select("query_vec_id", "qvec", "centroid_id")
    cand = cells.join(F.broadcast(probes), "centroid_id").filter(
        F.col("query_vec_id") != F.col("vec_id")
    )
    scored = cand.select(
        "query_vec_id",
        "vec_id",
        cosine_expr(F.col("qvec"), F.col("evec")).alias("cosine"),
    ).distinct()
    return topk_per_group(scored, "query_vec_id", "cosine", k, id_col="vec_id")


def srp_bucket_expr(vec_col, n_bits: int = 4):
    """Sign-random-projection bucket id from the first n_bits dimensions:
    bit i = (vec[i] > 0). Deterministic, SQL-reproducible; a production setup
    would use seeded random hyperplanes via a broadcast matrix."""
    bits = [
        F.when(F.element_at(vec_col, i + 1) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i in range(n_bits)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_bucketed_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_vec_id",
) -> DataFrame:
    """ANN top-k within the query's SRP bucket: (query_vec_id, vec_id, cosine,
    rank). Equi-join on bucket replaces the cross join — candidate set is
    ~N/2^n_bits per query."""
    e = embeddings.withColumn("bucket", srp_bucket_expr(F.col(vec_col), n_bits))
    q = F.broadcast(
        queries.withColumn("bucket", srp_bucket_expr(F.col("qvec"), n_bits))
    )
    joined = e.alias("e").join(q.alias("q"), "bucket").filter(
        F.col(qid_col) != F.col(id_col)
    )
    scored = joined.select(
        F.col(qid_col).alias("query_vec_id"),
        F.col(id_col).alias("vec_id"),
        cosine_expr(F.col("qvec"), F.col(vec_col)).alias("cosine"),
    )
    return topk_per_group(scored, "query_vec_id", "cosine", k, id_col="vec_id")
