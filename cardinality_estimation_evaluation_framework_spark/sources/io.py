"""Input/output seam for the token corpus (Iceberg-shaped tables).

The production deployment reads an Iceberg table of pre-tokenized sequences
(BASELINE.json input_hint); this sandbox has no Iceberg runtime jars, so
the seam resolves:

- ``iceberg:<catalog.db.table>`` → ``spark.read.table`` (works when the
  Iceberg catalog is configured on the cluster; raises a clear error here),
- anything else → parquet path.

Writers mirror the same split. Keeping every read/write behind this seam
means switching the engine to Iceberg is a config change, not a code
change (partition pruning/pushdown semantics are identical through the
DataSourceV2 interface Iceberg implements).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

ICEBERG_PREFIX = "iceberg:"


def _iceberg_available(spark: SparkSession) -> bool:
    try:
        # Class.forName: py4j package traversal never fails, this does
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.catalog.Catalog"
        )
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, ref: str) -> DataFrame:
    if ref.startswith(ICEBERG_PREFIX):
        name = ref[len(ICEBERG_PREFIX):]
        if not _iceberg_available(spark):
            raise RuntimeError(
                f"Iceberg catalog not on the classpath; cannot read {name!r}. "
                "Add the iceberg-spark-runtime jar + catalog conf, or point "
                "at a parquet path."
            )
        return spark.read.table(name)
    return spark.read.parquet(ref)


def write_table(df: DataFrame, ref: str, mode: str = "append",
                partition_by: list[str] | None = None) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if ref.startswith(ICEBERG_PREFIX):
        name = ref[len(ICEBERG_PREFIX):]
        if not _iceberg_available(df.sparkSession):
            raise RuntimeError(
                f"Iceberg catalog not on the classpath; cannot write {name!r}."
            )
        writer.saveAsTable(name)
    else:
        writer.parquet(ref)
