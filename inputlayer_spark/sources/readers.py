"""Relation sources & sinks.

The reference persists relations as CSV (`src/storage/csv.rs`: header row,
int/float/bool/string inference) and Parquet (`src/storage/parquet.rs`:
Arrow-based, arbitrary arity); its streaming input is the WAL delta feed
(`src/storage/persist/wal.rs`). Spark-native mapping:

- batch: `spark.read.<fmt>` with schema inference; parquet is the
  canonical format (columnar, predicate pushdown, partition pruning)
- streaming: a directory file-source — each new file is a delta batch,
  the WAL-segment analog (see streaming/maintainer.py for the consumer)
- JSON lines is included because pipeline interchange needs it; the
  reference's wire format is JSON rows over WebSocket (protocol/wire.rs)

At 100 TB the only knobs that matter are already in the formats: parquet
scans prune columns and push filters; directory layouts can be
partitioned (`.../date=2026-08-13/...`) and Spark prunes partitions from
query predicates automatically.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_BATCH_FORMATS = ("parquet", "csv", "json", "orc")


def read_relation(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: Optional[T.StructType] = None,
    header: bool = True,
) -> DataFrame:
    if fmt not in _BATCH_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; use one of {_BATCH_FORMATS}")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        return reader.csv(path, header=header, inferSchema=schema is None)
    if fmt == "json":
        return reader.json(path)
    if fmt == "orc":
        return reader.orc(path)
    return reader.parquet(path)


def write_relation(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: Optional[list] = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        writer.csv(path, header=True)
    elif fmt == "json":
        writer.json(path)
    elif fmt == "parquet":
        writer.parquet(path)
    elif fmt == "orc":
        writer.orc(path)
    else:
        raise ValueError(f"unsupported format {fmt!r}")


def stream_relation(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    fmt: str = "parquet",
):
    """Streaming delta source over a directory (files appear = deltas
    arrive). Pair with streaming.IncrementalMaintainer or any
    foreachBatch consumer."""
    reader = spark.readStream.schema(schema)
    if fmt == "csv":
        return reader.option("header", True).csv(path)
    if fmt == "json":
        return reader.json(path)
    return reader.format("parquet").load(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols,
    num_buckets: int = 64,
    sort_cols=None,
    path: Optional[str] = None,
    mode: str = "overwrite",
) -> None:
    """Persist a relation bucketed (and optionally sorted) by join keys.

    The co-located-join layout for repeated big joins: two tables
    bucketed on the same keys with the same bucket count join with NO
    shuffle on either side (Catalyst recognizes the bucketing and plans
    a sort-merge join over matching buckets). At 100 TB this converts
    the dominant cost of a recurring join pipeline from a full network
    shuffle into local merges — write once, join many.

    Spark requires `saveAsTable` for bucketing metadata (a plain
    `.parquet(path)` write cannot record buckets); `path` pins the
    storage location of the managed table.
    """
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    w = df.write.mode(mode).bucketBy(num_buckets, *cols)
    if sort_cols:
        sc = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        w = w.sortBy(*sc)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a table written by `write_bucketed` (bucketing metadata
    intact, so joins on the bucket keys skip the shuffle)."""
    return spark.table(table)
