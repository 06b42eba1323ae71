"""Table IO seam: Iceberg when available, partitioned Parquet fallback.

The production spec (BASELINE.json north_rule) targets Iceberg tables;
this sandbox has no iceberg-spark-runtime jar (verified in SURVEY.md
§7.0), so TableIO exposes one API with two backends:

  - `iceberg`: spark.catalog tables, MERGE INTO upserts, snapshot ids
    from the snapshots metadata table (used when the configured catalog
    exists on the classpath);
  - `parquet`: directory-per-table layout partitioned by `source`,
    dynamic partition-overwrite emulating MERGE-by-partition, and a
    manifest JSON carrying a monotonically increasing snapshot id +
    row counts (the lineage anchor for checkpoint.py).

Writes are idempotent at partition granularity: re-writing a partition
replaces it (INSERT OVERWRITE semantics), which is what makes the
checkpoint/resume path safe to re-run.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class TableIO:
    def __init__(self, spark: SparkSession, base_dir: str,
                 backend: str = "auto", catalog: str = "spark_catalog"):
        self.spark = spark
        self.base_dir = base_dir
        self.catalog = catalog
        if backend == "auto":
            backend = "iceberg" if self._iceberg_available() else "parquet"
        self.backend = backend
        if backend == "parquet":
            os.makedirs(base_dir, exist_ok=True)

    def _iceberg_available(self) -> bool:
        try:
            self.spark._jvm.java.lang.Class.forName(
                "org.apache.iceberg.spark.SparkCatalog")
            return True
        except Exception:
            return False

    # ------------------------------------------------------------ paths

    def _path(self, table: str) -> str:
        return os.path.join(self.base_dir, table)

    def _manifest_path(self, table: str) -> str:
        return os.path.join(self._path(table), "_manifest.json")

    def _read_manifest(self, table: str) -> dict:
        p = self._manifest_path(table)
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        return {"snapshot_id": 0, "history": []}

    def _bump_manifest(self, table: str, op: str, rows: int) -> int:
        m = self._read_manifest(table)
        m["snapshot_id"] = int(m["snapshot_id"]) + 1
        m["history"].append({"snapshot_id": m["snapshot_id"], "op": op,
                             "rows": rows, "ts": time.time(),
                             "run": str(uuid.uuid4())[:8]})
        with open(self._manifest_path(table), "w") as f:
            json.dump(m, f)
        return m["snapshot_id"]

    # -------------------------------------------------------------- API

    def exists(self, table: str) -> bool:
        if self.backend == "iceberg":
            return self.spark.catalog.tableExists(f"{self.catalog}.{table}")
        p = self._path(table)
        return os.path.exists(p) and any(
            not e.startswith("_") for e in os.listdir(p))

    def read(self, table: str) -> DataFrame:
        if self.backend == "iceberg":
            return self.spark.read.table(f"{self.catalog}.{table}")
        return self.spark.read.parquet(self._path(table))

    def append(self, table: str, df: DataFrame,
               partition_by: tuple[str, ...] = ("source",)) -> int:
        if self.backend == "iceberg":
            df.writeTo(f"{self.catalog}.{table}").append()
            return self.snapshot_id(table)
        (df.write.mode("append").partitionBy(*partition_by)
           .parquet(self._path(table)))
        return self._bump_manifest(table, "append", -1)

    def overwrite_partitions(self, table: str, df: DataFrame,
                             partition_by: tuple[str, ...] = ("source",)) -> int:
        """INSERT OVERWRITE matching partitions (dynamic) — the
        parquet emulation of Iceberg MERGE-by-partition."""
        if self.backend == "iceberg":
            df.writeTo(f"{self.catalog}.{table}").overwritePartitions()
            return self.snapshot_id(table)
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        (df.write.mode("overwrite").partitionBy(*partition_by)
           .parquet(self._path(table)))
        return self._bump_manifest(table, "overwrite_partitions", -1)

    def overwrite(self, table: str, df: DataFrame,
                  partition_by: tuple[str, ...] = ("source",)) -> int:
        if self.backend == "iceberg":
            df.writeTo(f"{self.catalog}.{table}").createOrReplace()
            return self.snapshot_id(table)
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
        (df.write.mode("overwrite").partitionBy(*partition_by)
           .parquet(self._path(table)))
        return self._bump_manifest(table, "overwrite", -1)

    def overwrite_safe(self, table: str, df: DataFrame,
                       partition_by: tuple[str, ...] = ("source",)) -> int:
        """Overwrite a table with a DataFrame that may READ from the same
        table (merge-back). Iceberg snapshots make this safe natively;
        the parquet fallback stages to a sibling dir and swaps."""
        if self.backend == "iceberg" or not self.exists(table):
            return self.overwrite(table, df, partition_by)
        import shutil
        final = self._path(table)
        tmp = final + "__staging"
        (df.write.mode("overwrite").partitionBy(*partition_by).parquet(tmp))
        manifest = self._read_manifest(table)
        shutil.rmtree(final)
        os.rename(tmp, final)
        with open(self._manifest_path(table), "w") as f:
            json.dump(manifest, f)
        return self._bump_manifest(table, "overwrite_safe", -1)

    def delete_where(self, table: str, predicate: str) -> int:
        """Retention delete. Iceberg: metadata-only DELETE FROM;
        parquet fallback: rewrite the surviving rows."""
        if self.backend == "iceberg":
            self.spark.sql(
                f"DELETE FROM {self.catalog}.{table} WHERE {predicate}")
            return self.snapshot_id(table)
        df = self.read(table).filter(f"NOT ({predicate})")
        pdf_cols = df.columns
        tmp = self._path(table) + "__tmp"
        df.write.mode("overwrite").partitionBy("source").parquet(tmp)
        final = self._path(table)
        import shutil
        manifest = self._read_manifest(table)
        shutil.rmtree(final)
        os.rename(tmp, final)
        with open(self._manifest_path(table), "w") as f:
            json.dump(manifest, f)
        del pdf_cols
        return self._bump_manifest(table, f"delete_where:{predicate}", -1)

    def snapshot_id(self, table: str) -> int:
        if self.backend == "iceberg":
            row = self.spark.sql(
                f"SELECT snapshot_id FROM {self.catalog}.{table}.snapshots "
                f"ORDER BY committed_at DESC LIMIT 1").collect()
            return int(row[0][0]) if row else 0
        return int(self._read_manifest(table)["snapshot_id"])
