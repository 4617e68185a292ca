"""TableIO — Iceberg-catalog / parquet-path seam (SURVEY.md §1.1).

Production target is an Iceberg table (BASELINE.json:15).  This sandbox
has no Iceberg runtime jars, so the seam resolves each logical table
name either through a configured Spark catalog (``spark.read.table`` /
``df.writeTo``) or a parquet directory fallback.  All engine code goes
through this module; nothing else mentions file formats.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def _catalog_configured(spark: SparkSession, catalog: str) -> bool:
    try:
        return (
            spark.conf.get(f"spark.sql.catalog.{catalog}", None) is not None
        )
    except Exception:
        return False


class TableIO:
    """Resolve logical table names to Iceberg tables or parquet paths.

    ``root`` is the parquet fallback directory: table ``t`` lives at
    ``{root}/{t}.parquet`` (matching /root/testdata layout) or
    ``{root}/{t}`` (engine-written outputs).
    """

    def __init__(
        self, spark: SparkSession, root: str | None = None, catalog: str = "ice"
    ):
        self.spark = spark
        self.root = root or os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
        )
        self.catalog = catalog
        self.use_catalog = _catalog_configured(spark, catalog)

    def _path(self, name: str) -> str:
        p = os.path.join(self.root, f"{name}.parquet")
        return p if os.path.exists(p) else os.path.join(self.root, name)

    def read(self, name: str) -> DataFrame:
        if self.use_catalog:
            return self.spark.read.table(f"{self.catalog}.{name}")
        return self.spark.read.parquet(self._path(name))

    def write(self, df: DataFrame, name: str, mode: str = "overwrite",
              partition_by: list[str] | None = None) -> None:
        if self.use_catalog:
            w = df.writeTo(f"{self.catalog}.{name}")
            if mode == "overwrite":
                w.createOrReplace()
            else:
                w.append()
            return
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(os.path.join(self.root, name))

    def exists(self, name: str) -> bool:
        if self.use_catalog:
            return self.spark.catalog.tableExists(f"{self.catalog}.{name}")
        return os.path.exists(self._path(name))
