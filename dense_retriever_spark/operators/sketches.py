"""Mergeable cardinality sketches (task brief: 'a novel sketch' as a custom
operator class).

KMV (k-minimum-values): hash every element uniformly into [0, 2^60); keep the
k smallest DISTINCT hashes; estimate distinct count as (k-1) * M / kth_min.
Unlike HLL (whose register layout differs across engines), KMV is a pure
order statistic of a deterministic hash — the md5-derived 60-bit hash used
engine-wide here — so DuckDB reproduces the ESTIMATE bit-for-bit and the
driver's hash gate can verify a sketch, not just eyeball it.

Scale shape: the k-min selection is expressed as a per-group rank window over
DISTINCT hashes — Spark executes rank-limit windows with the WindowGroupLimit
pushdown (each shuffle partition forwards at most k rows per group), so the
shuffle carries O(groups × k) rows after partial pruning, not the full
distinct stream. Sketches merge by unioning value sets and re-taking the k
smallest — associative and commutative, the property that lets partial
sketches roll up across partitions, days, or tenants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: hash domain: 60-bit md5-derived integers (operators.dedup._hash60)
KMV_M = float(1 << 60)


def _hash60(col, salt: int):
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{salt}:"), col)), 1, 15), 16, 10
    ).cast("long")


def kmv_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    k: int = 64,
    salt: int = 7,
) -> DataFrame:
    """Per-group KMV distinct-count estimate.

    Output: group_cols + (kth_min, n_kept, estimate). Groups with fewer than
    k distinct values report the EXACT count (n_kept < k ⇒ every distinct
    hash was kept, estimate = n_kept) — the standard KMV small-set exactness.
    """
    groups = group_cols or []
    hashed = df.select(
        *groups, _hash60(F.col(value_col), salt).alias("_h")
    ).distinct()
    if groups:
        w = Window.partitionBy(*[F.col(g) for g in groups]).orderBy("_h")
        kept = hashed.withColumn("_r", F.row_number().over(w)).filter(
            F.col("_r") <= k
        )
    else:
        # global sketch: orderBy().limit() → TakeOrderedAndProject, never a
        # partition-less window (plans.global_window_violations-clean)
        kept = hashed.orderBy("_h").limit(k)
    agg = kept.groupBy(*groups).agg(
        F.max("_h").alias("kth_min"),
        F.count("*").alias("n_kept"),
    )
    est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(
        F.round(
            F.lit(float(k - 1)) * F.lit(KMV_M) / F.col("kth_min").cast("double"),
            4,
        )
    )
    return agg.withColumn("estimate", est)


def kmv_sql(
    source_sql: str,
    value_expr: str,
    group_cols: list[str] | None = None,
    k: int = 64,
    salt: int = 7,
) -> str:
    """DuckDB twin of kmv_distinct for oracle construction: identical hash,
    identical order statistic, identical estimate arithmetic."""
    groups = group_cols or []
    gsel = (", ".join(groups) + ",") if groups else ""
    gby = ("GROUP BY " + ", ".join(groups)) if groups else ""
    part = ("PARTITION BY " + ", ".join(groups)) if groups else ""
    return f"""
WITH vals AS (SELECT DISTINCT {gsel}
       CAST('0x' || substr(md5('{salt}:' || {value_expr}), 1, 15) AS BIGINT) AS h
  FROM ({source_sql})),
rk AS (
  SELECT {gsel} h, row_number() OVER ({part} ORDER BY h) AS r FROM vals
),
agg AS (
  SELECT {gsel} max(h) AS kth_min, count(*) AS n_kept
  FROM rk WHERE r <= {k} {gby}
)
SELECT {gsel} kth_min, n_kept,
       CASE WHEN n_kept < {k} THEN n_kept::DOUBLE
            ELSE round(({k - 1}.0 * {KMV_M!r}) / kth_min::DOUBLE, 4)
       END AS estimate
FROM agg
"""
