"""Table IO seam: parquet now, Iceberg when the catalog jars are present."""
