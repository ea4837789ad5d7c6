"""As-of (point-in-time) join — the temporal lookup Spark has no built-in
operator for.

For every left row, attach the LATEST right row whose ``on`` value is <= the
left row's, within the same ``by`` keys: "for each pageview, the most recent
prior click by that user", "for each trade, the prevailing quote". A naive
range join is O(|L|·|R|) per key; this implementation is the classic
union-and-carry-forward construction, which is a SINGLE shuffle on the
``by`` keys at any size:

  tag left/right → union → window(partition by keys, order by (on, side))
  → last(right payload, ignorenulls) carried forward → keep left rows

Rows tie-break so that a right row AT the left row's timestamp is visible
(right side sorts first at equal ``on`` — the `l.on >= r.on` convention,
matching the oracle engine's native ASOF JOIN, q53). Within the window the
running state is one struct per row; no per-key materialization, so a key
with millions of rows streams through the sort-based window operator.

Reference analog: none (the reference has no temporal operators); part of
the task-brief custom-operator family ("operator Spark lacks → composition
of existing DataFrame ops").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: list[str] | None = None,
    value_cols: list[str] | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join. Output: every left row + ``prefix``-ed copies of
    ``value_cols`` and ``on`` from the matched right row (nulls when no
    right row precedes the left row).

    ``by``: equality keys (e.g. user_id). ``value_cols``: right columns to
    carry (default: everything except ``by`` + ``on``). Duplicate right
    rows on the same (by, on) resolve deterministically by the payload
    struct's natural order (the max payload wins).
    """
    by = by or []
    if not by:
        import warnings

        warnings.warn(
            "asof_join with no `by` keys sorts BOTH inputs through a single "
            "partition-less window — fine for one bounded series, a scale "
            "hazard otherwise; partition by your entity key",
            RuntimeWarning,
            stacklevel=2,
        )
    value_cols = value_cols or [
        c for c in right.columns if c not in set(by) | {on}
    ]

    payload = F.struct(
        F.col(on).alias("_on"), *[F.col(c) for c in value_cols]
    )
    r = right.select(
        *by,
        F.col(on),
        F.lit(0).alias("_asof_side"),
        payload.alias("_asof_payload"),
    )
    payload_type = r.schema["_asof_payload"].dataType

    lcols = [c for c in left.columns]
    l = left.select(
        *lcols,
        F.lit(1).alias("_asof_side"),
        F.lit(None).cast(payload_type).alias("_asof_payload"),
    )
    # right rows widened with nulls for the left-only columns, so the union
    # is schema-aligned; by/on come from the right row itself
    r_wide = r.select(
        *[
            F.col(c) if c in set(by) | {on}
            else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        "_asof_side",
        "_asof_payload",
    )

    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("_asof_side").asc(),
                 F.col("_asof_payload").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        l.unionByName(r_wide)
        .withColumn("_asof_match", F.last("_asof_payload", ignorenulls=True).over(w))
        .filter(F.col("_asof_side") == 1)
    )
    out_cols = [F.col(c) for c in lcols]
    out_cols.append(F.col(f"_asof_match._on").alias(f"{prefix}{on}"))
    out_cols.extend(
        F.col(f"_asof_match.{c}").alias(f"{prefix}{c}") for c in value_cols
    )
    return carried.select(*out_cols)
