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


_FORMAT_PREFIXES = ("csv:", "json:", "orc:", "parquet:")


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
    for prefix in _FORMAT_PREFIXES:
        if ref.startswith(prefix):
            fmt, path = prefix[:-1], ref[len(prefix):]
            reader = spark.read
            if fmt == "csv":
                # header+schema inference: the interchange default; columnar
                # formats carry their own schema
                reader = reader.option("header", "true").option(
                    "inferSchema", "true")
            return reader.format(fmt).load(path)
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
        return
    for prefix in _FORMAT_PREFIXES:
        if ref.startswith(prefix):
            fmt, path = prefix[:-1], ref[len(prefix):]
            if fmt == "csv":
                writer = writer.option("header", "true")
            writer.format(fmt).save(path)
            return
    writer.parquet(ref)


def write_bucketed_table(df: DataFrame, name: str, buckets: int,
                         bucket_cols: list[str], mode: str = "overwrite") -> None:
    """Save as a catalog table bucketed (and sorted) by ``bucket_cols``.

    The 100 TB co-located-join pattern: two tables bucketed the same way
    on the join key are joined WITHOUT a shuffle — each task zips matching
    buckets (SortMergeJoin with no Exchange; pinned by
    tests/test_io_and_misc.py). Use for the recurring joins of a pipeline:
    (doc_id)-keyed feature tables, (band, bucket)-keyed LSH candidate
    tables, per-key sketch tables re-joined across runs. On a real
    cluster this is a Hive/Iceberg-catalog table; local mode uses the
    in-memory catalog + spark.sql.warehouse.dir.
    """
    (
        df.write.mode(mode)
        .bucketBy(buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .saveAsTable(name)
    )
