"""Training-data pipeline operators: dedup, similarity, negatives, multimodal."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (3, "completely different text about spark engines"),
        (4, "ab"),  # < 3 tokens -> no shingles
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dedup_exact(spark, docs):
    from dense_retriever_spark.operators.dedup import dedup_exact

    groups = {r["keep_id"]: r for r in dedup_exact(docs).collect()}
    assert groups[0]["n_dupes"] == 2 and groups[0]["dup_ids"] == [0, 2]
    assert groups[1]["n_dupes"] == 1


def test_minhash_lsh_finds_near_dups(spark, docs):
    from dense_retriever_spark.operators.dedup import jaccard_verify, minhash_lsh_pairs

    # collapse_exact=False: exact dups surface as pairs (legacy semantics);
    # the default collapses them to one representative (see
    # tests/test_dedup_similarity.py for the guard behavior)
    pairs = minhash_lsh_pairs(
        docs, n_hashes=16, bands=8, collapse_exact=False
    )  # narrow bands: high recall
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 2) in got  # exact dup always collides on every band
    verified = jaccard_verify(pairs, docs, threshold=0.5).collect()
    vm = {(r["id_a"], r["id_b"]): r["jaccard"] for r in verified}
    assert vm[(0, 2)] == 1.0
    if (0, 1) in vm:
        assert 0.5 <= vm[(0, 1)] < 1.0
    # doc 4 (no shingles) never appears
    assert not any(4 in p for p in got)


def test_simhash_close_for_near_dups(spark, docs):
    from dense_retriever_spark.operators.dedup import simhash

    sh = {r["doc_id"]: r["simhash"] for r in simhash(docs, bits=16).collect()}
    assert sh[0] == sh[2]  # identical docs, identical simhash
    ham_near = bin(sh[0] ^ sh[1]).count("1")
    ham_far = bin(sh[0] ^ sh[3]).count("1")
    assert ham_near <= ham_far


def test_cosine_vs_lsh_bucket(spark):
    from dense_retriever_spark.operators.similarity import (
        cosine_topk_bruteforce,
        lsh_bucketed_topk,
    )

    rows = [
        (0, [1.0, 0.5, 0.1, 0.2]),
        (1, [1.0, 0.5, 0.1, 0.21]),
        (2, [-1.0, -0.5, -0.1, -0.2]),
        (3, [0.9, 0.4, 0.2, 0.1]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qv = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_vec_id"), F.col("embedding").alias("qvec")
    )
    bf = cosine_topk_bruteforce(emb, qv, k=2).collect()
    assert [r["vec_id"] for r in bf] == [1, 3]  # 2 is anti-parallel
    lsh = lsh_bucketed_topk(emb, qv, k=2, n_bits=4).collect()
    # same bucket (all-positive dims) contains 1 and 3 but not 2
    assert [r["vec_id"] for r in lsh] == [1, 3]
    assert all(r["cosine"] > 0.9 for r in lsh)


def test_hard_negative_pipeline(spark):
    from dense_retriever_spark.operators.negatives import (
        build_train_set,
        construct_query_samples,
        mine_hard_negatives,
        train_test_split,
    )

    queries = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "qid long, text string"
    )
    qrels = spark.createDataFrame(
        [(1, "D10"), (2, "D20")], "qid long, doc_id string"
    )
    samples = construct_query_samples(queries, qrels)
    got = {r["query_id"]: r for r in samples.collect()}
    assert got[1]["positive_doc_id"] == "D10" and got[1]["query"] == "alpha"

    results = spark.createDataFrame(
        [(1, ["D10", "D11", "D12"]), (2, ["D21", "D20"])],
        "query_id long, search_results array<string>",
    )
    mined = mine_hard_negatives(samples, results)
    m = {r["query_id"]: r["hard_negative_id"] for r in mined.collect()}
    assert m[1] in ("D11", "D12") and m[2] == "D21"  # positive excluded

    docs = spark.createDataFrame(
        [(f"D{i}", f"text {i}") for i in (10, 11, 12, 20, 21)],
        "doc_id string, text string",
    )
    ts = build_train_set(mined, docs)
    rows = ts.collect()
    assert {r["label"] for r in rows} == {0, 1}
    assert len(rows) == 4  # 2 queries x (pos + neg)

    tr, te = train_test_split(ts, 0.5, seed=1)
    assert tr.count() + te.count() == 4
    # determinism: same split twice
    tr2, te2 = train_test_split(ts, 0.5, seed=1)
    assert sorted(map(tuple, tr.collect())) == sorted(map(tuple, tr2.collect()))


def test_multimodal_plumbing(spark):
    from dense_retriever_spark.operators.multimodal import (
        extract_features,
        synth_assets,
    )

    feats = extract_features(synth_assets(spark, 50), dim=8).collect()
    assert len(feats) == 50
    for r in feats:
        assert len(r["feat"]) == 8
        assert r["n_bytes"] > 0 and len(r["payload_sha"]) == 64
    # determinism
    feats2 = extract_features(synth_assets(spark, 50), dim=8).collect()
    assert sorted(r["asset_id"] for r in feats) == sorted(
        r["asset_id"] for r in feats2
    )
    f1 = {r["asset_id"]: r["feat"] for r in feats}
    f2 = {r["asset_id"]: r["feat"] for r in feats2}
    assert f1 == f2


def test_text_stats(spark):
    from dense_retriever_spark.functions.text_stats import (
        fingerprint_md5,
        fingerprint_rolling,
        langid_scores,
        quality_score,
        token_count_ws,
    )

    df = spark.createDataFrame(
        [
            (0, "the cat and the dog of to in"),
            (1, "der hund und die katze ist da"),
            (2, "xyzzy qwerty"),
            (3, "The   CAT and the Dog, of; to!! in"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            langid_scores("text").alias("lang"),
            token_count_ws("text").alias("n"),
            quality_score("text").alias("q"),
            fingerprint_md5("text").alias("fp"),
            fingerprint_rolling("text").alias("fpr"),
        ).collect()
    }
    assert out[0]["lang"] == "en"
    assert out[1]["lang"] == "de"
    assert out[2]["lang"] == "und"
    assert out[0]["n"] == 8
    assert 0.0 <= out[0]["q"] <= 1.0
    # normalization-insensitive fingerprint: 0 and 3 tokenize identically
    assert out[0]["fp"] == out[3]["fp"]
    assert out[0]["fpr"] == out[3]["fpr"]


def test_scrub_redaction_and_repetition(spark):
    """PII/secret scrubbing + repetition filter (functions/scrub.py):
    redaction replaces every occurrence, audit counts match, repetition
    ratio is the duplicate-line mass."""
    from dense_retriever_spark.functions.scrub import (
        redact_expr,
        redaction_counts,
        repetition_ratio,
    )

    rows = [
        (1, "mail a@b.com and c.d@e.org, ip 10.1.2.3, key " + "ab" * 20),
        (2, "clean prose with no pii at all"),
        (3, "dup\ndup\ndup\nunique"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            redact_expr("t").alias("red"),
            redaction_counts("t").alias("c"),
            repetition_ratio("t").alias("rep"),
        ).collect()
    }
    assert out[1]["c"]["email"] == 2
    assert out[1]["c"]["ipv4"] == 1
    assert out[1]["c"]["hex_secret"] == 1
    assert "<EMAIL>" in out[1]["red"] and "<IP>" in out[1]["red"]
    assert "<SECRET>" in out[1]["red"]
    assert "a@b.com" not in out[1]["red"] and "10.1.2.3" not in out[1]["red"]
    assert out[2]["red"] == rows[1][1]  # clean text untouched
    assert out[2]["c"]["email"] == 0
    assert abs(out[3]["rep"] - 0.5) < 1e-9  # 4 lines, 2 distinct
    assert out[4]["rep"] == 0.0  # empty doc: no lines, defined as 0


def test_stratified_sample_quotas(spark):
    """Per-group quotas + determinism under repartitioning (training-mix
    constructor, q51)."""
    from pyspark.sql import functions as F

    from dense_retriever_spark.operators.negatives import stratified_sample

    df = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.element_at(
            F.array(F.lit("a"), F.lit("b"), F.lit("c")),
            (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"),
        ).alias("grp"),
        (F.pmod(F.col("id") * 7, F.lit(50)) + 1).alias("wt"),
    )
    out = stratified_sample(
        df, "grp", 10, "wt", seed=3, key_cols=["doc_id"], quotas={"b": 25}
    )
    counts = {
        r["grp"]: r["n"]
        for r in out.groupBy("grp").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"a": 10, "b": 25, "c": 10}
    # a group smaller than its quota returns all its rows
    tiny = stratified_sample(
        df.filter(F.col("doc_id") < 4), "grp", 10, "wt", key_cols=["doc_id"]
    )
    assert tiny.count() == 4
    # pure function of the data: stable under repartitioning
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(
        r["doc_id"]
        for r in stratified_sample(
            df.repartition(13), "grp", 10, "wt", seed=3,
            key_cols=["doc_id"], quotas={"b": 25},
        ).collect()
    )
    assert a == b


def test_profile_numeric_nulls_and_quartiles(spark):
    from dense_retriever_spark.operators.profile import profile_numeric

    df = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0), (4, None), (5, 40.0)],
        "a long, b double",
    )
    rows = {r["col_name"]: r for r in profile_numeric(df, ["a", "b"]).collect()}
    a, b = rows["a"], rows["b"]
    assert (a["n"], a["n_null"], a["n_distinct"]) == (5, 0, 5)
    assert (a["min_value"], a["max_value"], a["p50"]) == (1.0, 5.0, 3.0)
    assert (b["n"], b["n_null"], b["n_distinct"]) == (5, 1, 4)
    # quartiles over non-null {10,20,30,40}: linear interpolation
    assert (b["p25"], b["p50"], b["p75"]) == (17.5, 25.0, 32.5)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        profile_numeric(df, [])


def test_asof_join_semantics(spark):
    """asof_join: latest right row at-or-before each left row per key;
    nulls when nothing precedes; equal timestamps match (l.on >= r.on)."""
    from dense_retriever_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, "u"), (2, 20, "u"), (3, 5, "v"), (4, 30, "w")],
        "id long, ts long, user string",
    )
    right = spark.createDataFrame(
        [(10, "u", 1.0), (15, "u", 2.0), (20, "u", 3.0), (9, "v", 9.0)],
        "ts long, user string, price double",
    )
    got = {
        r["id"]: (r["asof_ts"], r["asof_price"])
        for r in asof_join(
            left, right, on="ts", by=["user"], value_cols=["price"]
        ).collect()
    }
    assert got[1] == (10, 1.0)   # equal ts matches
    assert got[2] == (20, 3.0)   # latest at-or-before, not just any prior
    assert got[3] == (None, None)  # right row is AFTER the left row
    assert got[4] == (None, None)  # key with no right rows at all
    # left row count preserved exactly (left join semantics)
    assert len(got) == 4


def test_range_join_binning_exact(spark):
    """range_join (binned equi-join) must equal the naive inequality join at
    EVERY bin width, including widths smaller than the intervals."""
    from pyspark.sql import functions as F

    from dense_retriever_spark.operators.rangejoin import range_join

    pts = spark.createDataFrame(
        [(i, "k" + str(i % 3), (i * 37) % 100) for i in range(60)],
        "pid long, k string, x long",
    )
    ivs = spark.createDataFrame(
        [(j, "k" + str(j % 3), (j * 23) % 90, (j * 23) % 90 + 12)
         for j in range(20)] + [(99, "k0", 50, 40)],  # inverted: dropped
        "iid long, k string, lo long, hi long",
    )
    want = sorted(
        (r["pid"], r["iid"])
        for r in pts.join(ivs, "k")
        .filter(F.col("x").between(F.col("lo"), F.col("hi")))
        .collect()
    )
    assert want  # non-trivial fixture
    for w in (1, 5, 12, 100):
        got = sorted(
            (r["pid"], r["iid"])
            for r in range_join(
                pts, ivs, "x", "lo", "hi", by=["k"], bin_width=w
            ).collect()
        )
        assert got == want, f"bin_width={w}"
    import pytest as _pytest

    with _pytest.raises(ValueError):
        range_join(pts, ivs, "x", "lo", "hi", bin_width=0)


def test_profile_approx_mode_and_asof_warning(spark):
    from dense_retriever_spark.operators.asof import asof_join
    from dense_retriever_spark.operators.profile import profile_numeric

    df = spark.range(1000).selectExpr("id", "id * 2 AS v")
    rows = {
        r["col_name"]: r
        for r in profile_numeric(df, ["id", "v"], exact=False).collect()
    }
    # sketch quartiles land within rank-error of the exact values
    assert abs(rows["id"]["p50"] - 499.5) <= 2
    assert abs(rows["v"]["p75"] - 1499.0) <= 4
    assert rows["id"]["n_distinct"] == 1000

    import pytest as _pytest

    left = spark.createDataFrame([(1, 10)], "id long, ts long")
    right = spark.createDataFrame([(5, 1.0)], "ts long, price double")
    with _pytest.warns(RuntimeWarning, match="partition-less"):
        asof_join(left, right, on="ts")
