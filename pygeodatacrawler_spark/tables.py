"""Snapshot tables: versioned parquet tables with MERGE-style upsert.

The production design is Iceberg (HadoopCatalog + Spark extensions):
``MERGE INTO frontier ... WHEN MATCHED THEN UPDATE WHEN NOT MATCHED THEN
INSERT``, per-round snapshots, time-travel for resume. This sandbox has
no Iceberg runtime jar, so this module provides the same contract over
plain parquet:

    {root}/{name}/v{NNNNN}/  — one immutable snapshot per version
    {root}/{name}/_meta.json — committed version list (atomic rename)

Every write is write-new-dir-then-commit-manifest, so a killed job never
corrupts the latest committed snapshot — the property the north rule
needs for deterministic resume. Swapping this class for Iceberg is a
one-file change (the CrawlEngine only calls read/write/merge_upsert).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F


class SnapshotTable:
    """``log=False`` (default): each version is the full table state
    (overwrite/merge semantics — the frontier). ``log=True``: each
    version is a delta and ``read()`` unions all committed versions
    (append-only tables — records/visits/lineage); this keeps appends
    O(batch) instead of O(history) per round, like Iceberg's manifest
    of data files."""

    def __init__(self, spark: SparkSession, root: str, name: str, log: bool = False):
        self.spark = spark
        self.log = log
        self.dir = os.path.join(root, name)
        self.meta_path = os.path.join(self.dir, "_meta.json")
        os.makedirs(self.dir, exist_ok=True)

    # -- manifest ---------------------------------------------------------
    def _versions(self) -> list[int]:
        if not os.path.exists(self.meta_path):
            return []
        with open(self.meta_path) as f:
            return json.load(f)["versions"]

    def _commit(self, versions: list[int]) -> None:
        tmp = self.meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"versions": versions}, f)
        os.replace(tmp, self.meta_path)  # atomic on POSIX

    def latest_version(self) -> int | None:
        v = self._versions()
        return v[-1] if v else None

    def exists(self) -> bool:
        return self.latest_version() is not None

    # -- read/write -------------------------------------------------------
    def _vdir(self, version: int) -> str:
        return os.path.join(self.dir, f"v{version:05d}")

    def read(self, version: int | None = None) -> DataFrame:
        v = self.latest_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"snapshot table {self.dir} has no snapshots")
        if self.log:
            dirs = [self._vdir(x) for x in self._versions() if x <= v]
            return self.spark.read.parquet(*dirs)
        return self.spark.read.parquet(self._vdir(v))

    def write_snapshot(self, df: DataFrame) -> int:
        """Write a new immutable snapshot; returns the new version."""
        versions = self._versions()
        v = (versions[-1] + 1) if versions else 1
        df.write.mode("overwrite").parquet(self._vdir(v))
        self._commit(versions + [v])
        return v

    def merge_upsert(
        self,
        batch: DataFrame,
        key: str,
        order_col: str | None = None,
        current: DataFrame | None = None,
    ) -> int:
        """MERGE INTO semantics: batch rows win on key collision.

        Iceberg equivalent: WHEN MATCHED THEN UPDATE SET * WHEN NOT
        MATCHED THEN INSERT *. Implemented as union + keep-one-per-key
        (batch precedence, then ``order_col`` for determinism inside the
        batch). Copy-on-write of the whole table — fine for sandbox
        scale; Iceberg's merge-on-read replaces this at 10^10 rows.
        """
        if current is not None:
            cur = current.withColumn("_src", F.lit(0))
        elif self.exists():
            cur = self.read().withColumn("_src", F.lit(0))
        else:
            cur = None
        b = batch.withColumn("_src", F.lit(1))
        allrows = b if cur is None else cur.unionByName(b)
        order = [F.col("_src").desc()]
        if order_col is not None:
            order.append(F.col(order_col))
        w = Window.partitionBy(key).orderBy(*order)
        merged = (
            allrows.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "_src")
        )
        return self.write_snapshot(merged)

    def append(self, batch: DataFrame) -> int:
        if self.log or not self.exists():
            return self.write_snapshot(batch)
        return self.write_snapshot(self.read().unionByName(batch))

    def drop(self) -> None:
        shutil.rmtree(self.dir, ignore_errors=True)
