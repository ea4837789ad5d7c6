"""Cross-index merge: combine independently built BM25 indexes into one.

The north rule names "posting-list construction, merge, compression, top-k
scoring" as the engine's core. At 10^12-file scale the natural build topology
is MANY independent builds — one per dataset / crawl / tenant, each with its
own dense doc-id space starting at 0 — followed by a merge into one serving
index. ``merge_indexes`` is that merge, and it is a *byte-level* operation:

- doc ids of source i are rebased by ``doc_off[i] = shard_off[i] *
  docs_per_shard`` — shard-aligned, so source shard ``s`` becomes merged
  shard ``shard_off[i] + s`` and every shard keeps its doc-range invariant;
- posting blobs are rebased in O(1) each (codec.rebase_postings rewrites the
  single absolute v-byte at the head of the delta stream; tf/dl bytes are
  untouched) — the merge never decodes a posting list;
- block metadata arrays shift by the same offset via a native
  ``transform(...)`` column expression — JVM-side, no UDF;
- the global index, stats.json, and structured build metrics are produced by
  delegating to ``build_index`` over the rebased docs table: the recomputed
  per-shard fingerprints match the manifest rows this module writes, so
  phase A resumes as a complete no-op and only phase B (global merge) runs.
  All of build_index's crash-safety, orphan cleanup, and metrics machinery
  is reused instead of re-implemented.

Scale shape: one narrow scan+write per source for shards (no shuffle — rows
keep their shard partitioning), one metadata-sized fingerprint aggregation,
and phase B's usual term-bucketed merge. Nothing is proportional to corpus
content except the one docs-table write that every build pays.

The merged index is a fully standard index: searchable on both query planes,
resumable (a later incremental ``build_index`` over the merged docs table +
appended rows rebuilds only new shards), compactable, reshardable.

Reference analog: the reference rebuilds its FAISS artifact from scratch to
combine corpora (/root/reference/dense_retriever/transforms/ann_index.py:87-98
is a full re-add); this module replaces that with an O(metadata + shard
bytes) structural merge.
"""

from __future__ import annotations

import json
import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dense_retriever_spark.index import fs
from dense_retriever_spark.index.build import (
    MANIFEST_SCHEMA,
    IndexPaths,
    _fingerprint_df,
    _manifest_df,
    build_index,
)
from dense_retriever_spark.index.codec import FORMAT_VERSION


def _rebase_udf(off: int):
    """Arrow-batched rebase of posting blobs by a fixed offset — O(1) python
    work per blob (one v-byte rewrite) + a memcpy; never decodes postings."""

    def fn(blobs: pd.Series) -> pd.Series:
        from dense_retriever_spark.index.codec import rebase_postings

        return blobs.map(lambda b: rebase_postings(b, off))

    return F.pandas_udf(fn, "binary")


def _load_stats(spark: SparkSession, index_dir: str) -> dict:
    p = IndexPaths(index_dir).stats
    if not fs.exists(p, spark):
        raise ValueError(f"no index at {index_dir} (missing stats.json)")
    return json.loads(fs.read_text(p, spark))


def _validate_sources(spark: SparkSession, src_dirs: list[str]) -> list[dict]:
    """Fail fast on structurally incompatible sources (same class of checks
    build_index runs on resume: a silent mismatch would mis-route doc ids or
    mis-decode blobs)."""
    if len(src_dirs) < 2:
        raise ValueError("merge_indexes needs at least two source indexes")
    stats = [_load_stats(spark, d) for d in src_dirs]
    for d, st in zip(src_dirs, stats):
        pv = st.get("format_version", 1)
        if pv != FORMAT_VERSION:
            raise ValueError(
                f"index at {d} has posting format v{pv}; merge requires "
                f"v{FORMAT_VERSION}"
            )
    key_fields = ("docs_per_shard", "k1", "b")
    first = stats[0]
    for d, st in zip(src_dirs[1:], stats[1:]):
        for f_ in key_fields:
            if st.get(f_) != first.get(f_):
                raise ValueError(
                    f"index at {d} has {f_}={st.get(f_)!r}, expected "
                    f"{first.get(f_)!r} (from {src_dirs[0]}) — merged shards "
                    "must share one doc-range granularity and BM25 parameters"
                )
        if bool(st.get("positions", False)) != bool(
            first.get("positions", False)
        ):
            raise ValueError(
                f"index at {d} has positions={bool(st.get('positions', False))}, "
                f"expected {bool(first.get('positions', False))} — merged "
                "shards cannot mix positional and non-positional rows"
            )
        if sorted(st.get("stopwords", []) or []) != sorted(
            first.get("stopwords", []) or []
        ):
            raise ValueError(
                f"index at {d} has stopwords={st.get('stopwords')}, "
                f"expected {first.get('stopwords')} — merged shards must "
                "share one vocabulary filter"
            )
    return stats


def merge_indexes(
    spark: SparkSession,
    src_dirs: list[str],
    out_dir: str,
    content_source: DataFrame | None = None,
    global_layout: str | None = None,
    term_buckets: int | None = None,
    timings: dict | None = None,
    build_tag: str = "merge",
) -> IndexPaths:
    """Merge ``src_dirs`` (each a complete index) into a new index at
    ``out_dir``. Sources are untouched; ``out_dir`` must not already hold an
    index (merging INTO a live index would break its committed doc-id space).

    ``content_source``: required iff any source's docs table is
    metadata-only (no ``content`` column) — same contract as build_index.
    ``global_layout``: layout for the merged global/ (default: the first
    source's layout).

    Returns the merged IndexPaths. The merged docs table keeps every source
    row with ``doc_id += doc_off[i]`` — because offsets are shard-aligned,
    source i's id gaps (compaction) and partial tail shard carry over as
    plain id-space gaps, which every reader already supports.
    """
    paths = IndexPaths(out_dir)
    if fs.exists(paths.stats, spark):
        raise ValueError(
            f"{out_dir} already holds an index — merge writes a fresh one"
        )
    stats = _validate_sources(spark, src_dirs)
    docs_per_shard = int(stats[0]["docs_per_shard"])
    layout = global_layout or stats[0].get("global_layout", "merged")
    buckets = term_buckets or int(stats[0].get("term_buckets", 8))

    shard_off: list[int] = []
    acc = 0
    for st in stats:
        shard_off.append(acc)
        acc += int(st["n_shards"])

    fs.mkdirs(out_dir, spark)

    # --- shards: rebased byte-level copy, one narrow job per source -------
    # Source rows already live in shard=<s> partitions; the write keeps that
    # partitioning (shard is just shifted), so no shuffle moves posting
    # bytes — each task streams its input partition to its output partition.
    merged_shards = None
    for st, src, s_off in zip(stats, src_dirs, shard_off):
        sp = IndexPaths(src)
        d_off = s_off * docs_per_shard
        df = spark.read.parquet(sp.shards).withColumn(
            "shard", F.col("shard").cast("long") + F.lit(s_off)
        )
        if d_off:
            off = int(d_off)
            df = df.withColumn("postings", _rebase_udf(off)("postings")).withColumn(
                "block_last_doc_id",
                F.transform("block_last_doc_id", lambda x: x + F.lit(off)),
            )
        merged_shards = df if merged_shards is None else merged_shards.unionByName(df)
    (
        merged_shards.write.mode("overwrite")
        .partitionBy("shard")
        .parquet(paths.shards)
    )

    # --- docs: rebased union (ids shift; content/sha/keys unchanged) ------
    merged_docs = None
    for st, src, s_off in zip(stats, src_dirs, shard_off):
        sp = IndexPaths(src)
        d_off = s_off * docs_per_shard
        df = (
            spark.read.parquet(sp.docs)
            .drop("shard")  # re-derived by build_index from the new ids
            .withColumn("doc_id", F.col("doc_id") + F.lit(int(d_off)))
        )
        merged_docs = df if merged_docs is None else merged_docs.unionByName(
            df, allowMissingColumns=False
        )
    if "content" not in merged_docs.columns and content_source is None:
        raise ValueError(
            "sources carry metadata-only docs tables — pass content_source "
            "(the immutable input table) so the merged index can stage docs"
        )

    # --- manifest: carried rows + fingerprints recomputed over NEW ids ----
    # The fingerprint is sha256 over sorted (doc_id:content_sha) per shard —
    # ids changed, so it MUST be recomputed (with the same function
    # build_index's resume uses, so the delegation below sees every merged
    # shard as complete). Metadata-sized aggregation: never touches content.
    staged_like = merged_docs.select(
        "doc_id",
        "content_sha",
        (F.col("doc_id") / docs_per_shard).cast("long").alias("shard"),
    )
    fp_df = _fingerprint_df(staged_like).withColumnRenamed("shard", "shard_id")
    merged_manifest = None
    for st, src, s_off in zip(stats, src_dirs, shard_off):
        sp = IndexPaths(src)
        m = _manifest_df(spark, sp)
        if m is None:
            raise ValueError(f"index at {src} has no manifest — cannot merge")
        m = m.withColumn("shard_id", F.col("shard_id") + F.lit(s_off))
        merged_manifest = m if merged_manifest is None else merged_manifest.unionByName(m)
    # inner join: a stale manifest row whose docs vanished (source compacted
    # its corpus but never rebuilt) gets no fingerprint and is dropped here;
    # build_index's orphan cleanup then reaps its shard dir.
    cols = [c for c in MANIFEST_SCHEMA.split(", ")]
    col_names = [c.split(" ")[0] for c in cols]
    out_manifest = (
        merged_manifest.drop("input_fingerprint")
        .join(fp_df, "shard_id")
        .withColumn("input_fingerprint", F.col("fp"))
        .select(*col_names)
    )
    (
        out_manifest.write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(paths.manifest)
    )

    # --- generational carry-over: O(metadata) global merge ----------------
    # Gen stats (term, df, cf) are doc-id-INDEPENDENT — a uniform id shift
    # changes no count — so each source's committed gens carry over as a
    # parquet copy with range [lo+off, hi+off) under a fresh id. Only their
    # fingerprints change (they hash (shard_id, input_fingerprint) pairs,
    # both rebased), recomputed here from the new manifest in one pass.
    # A non-last source's loose region (its tail included — immutable once
    # merged) is covered by one small aggregate gen; a non-last MERGED-
    # layout source's global/ already IS its full-range (term, df, cf)
    # aggregate and is copied as a single gen with no aggregation at all.
    # The last source's loose region is left to the delegated phase B's
    # standard new-range gen (keeping the tail-shard-never-genned
    # invariant). The delegated _phase_b_generational then finds every
    # pre-written gen fingerprint-clean and re-aggregates NOTHING — the
    # global merge is O(gen metadata + loose windows), not O(term
    # dictionary of the union).
    if layout == "generational":
        from dense_retriever_spark.index.build import (
            _gen_dir,
            _gens_meta_path,
            _merge_range_to_gen,
            _range_fingerprints,
            _read_gens,
        )

        fs.mkdirs(paths.global_dir, spark)
        pre: list[dict] = []
        next_id = 0
        for i, (st, src, s_off) in enumerate(zip(stats, src_dirs, shard_off)):
            sp = IndexPaths(src)
            last = i == len(src_dirs) - 1
            committed = {int(x) for x in (st.get("gen_ids") or [])}
            src_gens = []
            if st.get("global_layout") == "generational" and committed:
                src_gens = sorted(
                    (g for g in _read_gens(spark, sp)
                     if int(g["id"]) in committed),
                    key=lambda g: g["lo"],
                )
            for g in src_gens:
                (
                    spark.read.parquet(_gen_dir(sp, int(g["id"])))
                    .select("term", "df", "cf")
                    .write.mode("overwrite")
                    .parquet(_gen_dir(paths, next_id))
                )
                pre.append({
                    "id": next_id,
                    "lo": int(g["lo"]) + s_off,
                    "hi": int(g["hi"]) + s_off,
                })
                next_id += 1
            if last:
                continue
            cov = max((int(g["hi"]) for g in src_gens), default=0)
            n_sh = int(st["n_shards"])
            if cov >= n_sh:
                continue
            if not src_gens and st.get("global_layout", "merged") == "merged":
                # merged global/ = the full-range aggregate already
                (
                    spark.read.parquet(sp.global_dir)
                    .select("term", "df", "cf")
                    .write.mode("overwrite")
                    .parquet(_gen_dir(paths, next_id))
                )
            else:
                _merge_range_to_gen(
                    spark, paths, next_id, cov + s_off, n_sh + s_off
                )
            pre.append({
                "id": next_id, "lo": cov + s_off, "hi": n_sh + s_off,
            })
            next_id += 1
        if pre:
            fps = _range_fingerprints(
                spark, paths, [(g["lo"], g["hi"]) for g in pre]
            )
            kept = []
            for g in pre:
                got = fps.get((g["lo"], g["hi"]))
                if got is None:
                    continue  # range has no live shards — drop, sweep reaps
                g["fp"], g["bytes"] = got[0], int(got[1])
                kept.append(g)
            fs.write_text_atomic(
                _gens_meta_path(paths), json.dumps({"gens": kept}), spark
            )

    # --- delegate: docs staging, resume no-op, phase B, stats, metrics ----
    # build_index re-stages docs from merged_docs (ids fixed — no
    # re-assignment happens; it selects the existing doc_id column),
    # recomputes fingerprints, finds every manifest row complete, skips
    # phase A entirely, and runs the standard global merge + stats commit.
    return build_index(
        merged_docs,
        out_dir,
        docs_per_shard=docs_per_shard,
        term_buckets=buckets,
        k1=float(stats[0].get("k1", 1.2)),
        b=float(stats[0].get("b", 0.75)),
        timings=timings,
        build_tag=build_tag,
        content_source=content_source,
        global_layout=layout,
        positions=bool(stats[0].get("positions", False)),
        stopwords=stats[0].get("stopwords") or None,
    )
