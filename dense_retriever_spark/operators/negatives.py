"""Hard-negative mining + train-set construction (the reference's relational
preprocessing, re-expressed as pure dataflow).

Reference analog: ``construct_train_set``
(/root/reference/dense_retriever/transforms/preprocessing.py:86-164): join
query samples with search results (J2), drop the positive from the candidate
list (P5), sample one hard negative (R2 — UNSEEDED np.random.choice in the
reference; deterministic hash-pick here, SURVEY.md §7.4), join docs twice for
negative/positive texts (J3/J4), label and union (U1, F5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def construct_query_samples(queries: DataFrame, qrels: DataFrame) -> DataFrame:
    """J1: queries ⋈ qrels on qid → (query, query_id, positive_doc_id).
    Reference: /root/reference/dense_retriever/transforms/preprocessing.py:50-83."""
    return (
        queries.join(F.broadcast(qrels), "qid")
        .select(
            F.col("text").alias("query"),
            F.col("qid").alias("query_id"),
            F.col("doc_id").alias("positive_doc_id"),
        )
    )


def mine_hard_negatives(
    samples: DataFrame, search_results: DataFrame, seed: int = 0
) -> DataFrame:
    """J2 + P5 + R2: pick one deterministic hard negative per query.

    candidates = search_results minus the positive; pick index =
    xxhash64(seed, query_id) mod |candidates| (seeded determinism replacing
    the reference's unseeded np.random.choice, preprocessing.py:93-98). The
    refresh loop passes the round number as ``seed`` so successive rounds
    explore different negatives even where the candidate lists overlap —
    the analog of the reference's retrained-model drift between rounds.
    Output: (query_id, query, positive_doc_id, hard_negative_id).
    """
    joined = samples.join(search_results, "query_id")
    cands = F.array_remove(F.col("search_results"), F.col("positive_doc_id"))
    pick = F.element_at(
        cands,
        (F.pmod(F.xxhash64(F.lit(seed), "query_id"), F.size(cands)) + 1).cast(
            "int"
        ),
    )
    return joined.filter(F.size(cands) > 0).select(
        "query_id", "query", "positive_doc_id", pick.alias("hard_negative_id")
    )


def build_train_set(mined: DataFrame, docs: DataFrame) -> DataFrame:
    """J3 + J4 + F5 + U1: hydrate texts, label, union pos/neg.

    Output: (query, doc, label) — the reference's IRTrainSample
    (/root/reference/dense_retriever/data_model.py:26-30). docs is the big
    side; both joins are plain equi-joins Catalyst plans (broadcast if docs
    fits, sort-merge otherwise).
    """
    neg = (
        mined.join(docs, mined.hard_negative_id == docs.doc_id)
        .select("query", F.col("text").alias("doc"), F.lit(0).alias("label"))
    )
    pos = (
        mined.join(docs, mined.positive_doc_id == docs.doc_id)
        .select("query", F.col("text").alias("doc"), F.lit(1).alias("label"))
    )
    return pos.unionByName(neg)


def shuffle_rows(df: DataFrame, seed: int = 42, key_cols: list[str] | None = None) -> DataFrame:
    """R1: seeded full-row shuffle — a deterministic global permutation.

    Reference analog: ``df.sample(frac=1)`` (unseeded shuffle,
    /root/reference/dense_retriever/transforms/preprocessing.py:126). Here the
    permutation is a pure function of the row: sort by an md5-derived 60-bit
    hash of (seed, key columns) — reproducible across runs, partitionings and
    engines (the DuckDB oracle recomputes the identical order). The sort is a
    range-partitioned total sort (Spark samples bounds), which scales like
    any global sort; callers that only need a decorrelated ORDER WITHIN
    partitions can sortWithinPartitions on the same hash for zero shuffle.
    Output adds the sort key as ``_shuffle_key`` (drop it if unwanted).
    """
    cols = key_cols or df.columns
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("\x1f", F.lit(f"shuf{seed}"), *cols)), 1, 15
        ),
        16,
        10,
    ).cast("long")
    return df.withColumn("_shuffle_key", h).orderBy("_shuffle_key", *cols)


def train_test_split(df: DataFrame, test_frac: float = 0.2, seed: int = 42):
    """R3 — deterministic split. Returns (train, test).

    Hash-based (not randomSplit) so membership is a pure function of the row:
    stable under repartitioning and re-runs, unlike the reference's unseeded
    sklearn train_test_split (preprocessing.py:179)."""
    bucket = F.pmod(F.xxhash64(*df.columns, F.lit(seed)), F.lit(100))
    thresh = int(test_frac * 100)
    return df.filter(bucket >= thresh), df.filter(bucket < thresh)


def weighted_sample(
    df: DataFrame,
    n: int,
    weight_col: str,
    seed: int = 42,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Seeded weighted sampling WITHOUT replacement (Efraimidis–Spirakis
    A-Res): key = u^(1/w) with u uniform in (0,1], take the n largest keys.
    P[item in sample] is proportional-ish to weight, exactly the ES
    guarantee — the standard way to weight a training-data mix (sample code
    files by stars, documents by quality score) in one distributed pass.

    u is md5-derived from (seed, key columns), so the sample is a pure
    function of the data: reproducible across runs, partitionings and engines
    (the DuckDB oracle recomputes it bit-for-bit — q47). The key is rounded
    to 9dp BEFORE ranking (round-before-rank rule; pow last-ulp differences
    between JVM and libm must not flip an order) with the hash as the
    deterministic tie-break. Executes as TakeOrderedAndProject: O(n) per
    partition + driver merge, never a global sort.
    """
    cols = key_cols or df.columns
    key, h = _es_key(weight_col, seed, cols)
    return (
        df.withColumn("_es_key", key)
        .withColumn("_es_h", h)
        .orderBy(F.desc("_es_key"), F.asc("_es_h"))
        .limit(n)
    )


def _es_key(weight_col: str, seed: int, cols: list[str]):
    """(rounded ES key, tie-break hash) column pair shared by the global and
    stratified samplers — identical construction, so the two are consistent
    and both DuckDB-reproducible."""
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("\x1f", F.lit(f"ws{seed}"), *cols)), 1, 15
        ),
        16,
        10,
    ).cast("long")
    # u in (0, 1]: (h + 1) / 2^60 over the 60-bit hash domain
    u = (h + F.lit(1)).cast("double") / F.lit(float(1 << 60))
    w = F.greatest(F.col(weight_col).cast("double"), F.lit(1e-12))
    return F.round(F.pow(u, F.lit(1.0) / w), 9), h


def stratified_sample(
    df: DataFrame,
    group_col: str,
    n_per_group: int,
    weight_col: str,
    seed: int = 42,
    key_cols: list[str] | None = None,
    quotas: dict | None = None,
) -> DataFrame:
    """Seeded per-group weighted sampling without replacement — the
    TRAINING-MIX constructor: "take 200k docs per language, weighted by
    quality" in one distributed pass. Same Efraimidis–Spirakis keys as
    ``weighted_sample`` (md5-derived, rounded 9dp before ranking, hash
    tie-break — pure function of the data, DuckDB-reproducible: q51), ranked
    WITHIN each ``group_col`` value by a partitioned window, so there is no
    global sort and no driver state: one shuffle on the group key, and
    Spark's WindowGroupLimit keeps only ``max(quota)`` rows per partition
    before the final filter.

    ``quotas``: optional per-group override {group_value: n}; groups absent
    from the dict use ``n_per_group``. The quota map is a plan literal —
    training mixes have dozens of groups (languages/sources), not millions.
    """
    from pyspark.sql import Window

    cols = key_cols or [c for c in df.columns if c != group_col]
    key, h = _es_key(weight_col, seed, cols)
    w = Window.partitionBy(group_col).orderBy(
        F.desc("_es_key"), F.asc("_es_h")
    )
    ranked = (
        df.withColumn("_es_key", key)
        .withColumn("_es_h", h)
        .withColumn("_es_rank", F.row_number().over(w))
    )
    # TWO filters, deliberately: Spark's InferWindowGroupLimit only fires
    # when row_number() is compared to a FOLDABLE literal — a per-group
    # coalesce(map[...]) bound would keep the full ranked window (every row
    # of every group sorted and ranked). The literal max-quota bound gets
    # the per-partition group-limit pushdown; the per-group quota then
    # prunes the ≤ max-quota survivors.
    max_quota = int(n_per_group)
    if quotas:
        max_quota = max(max_quota, *(int(v) for v in quotas.values()))
    out = ranked.filter(F.col("_es_rank") <= F.lit(max_quota))
    if quotas:
        mapping = F.create_map(
            *[F.lit(x) for kv in quotas.items() for x in kv]
        )
        quota = F.coalesce(
            mapping[F.col(group_col)].cast("int"),
            F.lit(int(n_per_group)),
        )
        out = out.filter(F.col("_es_rank") <= quota)
    return out.drop("_es_rank")
