"""File source/sink wrappers — parquet / csv / json / orc.

DuckDB users read files with read_parquet()/read_csv()/read_json();
the Spark-native equivalents are below, with the scale-relevant knobs
made explicit instead of hidden:

- maxPartitionBytes governs scan parallelism (128 MB default — at
  100 TB that is ~800k tasks; raise to 512 MB for wide scans).
- writes partitionBy low-cardinality keys only (date, region) —
  never high-cardinality ids (small-file explosion).
- bucketBy co-locates future joins on the bucket key (saveAsTable),
  eliminating the shuffle for bucket-aligned joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, DataFrameReader, SparkSession


def read_parquet(spark: SparkSession, path: str, columns: list[str] | None = None) -> DataFrame:
    df = spark.read.parquet(path)
    return df.select(*columns) if columns else df


def read_csv(spark: SparkSession, path: str, header: bool = True, schema: str | None = None) -> DataFrame:
    reader: DataFrameReader = spark.read.option("header", str(header).lower())
    if schema:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    reader = spark.read
    if schema:
        reader = reader.schema(schema)
    return reader.json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str = "zstd",
) -> None:
    writer = df.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed_table(
    df: DataFrame, table: str, bucket_col: str, n_buckets: int = 64, mode: str = "overwrite"
) -> None:
    """Persist bucketed by the join key: later joins on bucket_col with
    an equally-bucketed table skip the shuffle entirely."""
    df.write.mode(mode).bucketBy(n_buckets, bucket_col).sortBy(bucket_col).saveAsTable(table)
