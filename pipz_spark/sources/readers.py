"""Additional sources beyond the parquet catalog (SURVEY §2.4:
"Spark readers/writers — parquet, CSV, JSON, JDBC").

Scale notes baked into the defaults:
* CSV/JSON take an explicit schema whenever the caller has one —
  schema inference is an extra full scan of the data.
* The JDBC reader exposes partitioned-read parameters; a single-
  connection JDBC scan is a driver bottleneck at any real size, so
  callers pass (partition_column, lower/upper bound, num_partitions)
  to fan the read across executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    header: bool = True,
    **options: str,
) -> DataFrame:
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    multiline: bool = False,
    **options: str,
) -> DataFrame:
    reader = spark.read.option("multiLine", str(multiline).lower())
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.json(path)


def read_orc(
    spark: SparkSession,
    path: str,
    **options: str,
) -> DataFrame:
    """ORC source — columnar like parquet (predicate pushdown, column
    pruning, vectorized read all apply), for corpora landed by
    Hive-lineage pipelines. No schema parameter: ORC carries its
    schema in the file footer, like parquet."""
    reader = spark.read
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.orc(path)


def read_text(
    spark: SparkSession,
    path: str,
    whole: bool = False,
    line_sep: str | None = None,
) -> DataFrame:
    """Raw text ingestion — one row per line (splittable: a large
    file scans in parallel by byte range), or with ``whole=True`` one
    row per FILE (for document-per-file corpora; parallelism becomes
    file count, same caveat as ``read_binary_dir``). The single
    ``value`` string column feeds the text datapipe directly.

    Options go through ``DataFrameReader.text``'s own parameters —
    the generic ``.option("wholetext", ...)`` string spelling is
    silently ignored by the current Spark (verified), the kwarg form
    is not."""
    return spark.read.text(path, wholetext=whole, lineSep=line_sep)


def read_binary_dir(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = True,
) -> DataFrame:
    """Media-file ingestion via Spark's ``binaryFile`` source — the
    entry point that turns a directory of images/audio/video into the
    (path, modificationTime, length, content BINARY) rows the
    multimodal operators (``attach_blob``/``decode_image_features``/
    ``sample_frames``) consume.

    Scale notes:
    * one FILE = one row; files are not splittable, so parallelism is
      file count, grouped into tasks by
      ``spark.sql.files.maxPartitionBytes`` — for media corpora of
      many small files the listing and grouping are the bottleneck,
      not the read (prefer landing media INTO parquet/webdataset-style
      binary columns once, which every downstream scan then prunes
      and splits properly; this reader is the first hop, not the
      steady state).
    * ``glob`` pushes the filename filter into the FILE LISTING
      (pathGlobFilter) — directories of mixed media never enumerate
      into the scan at all.
    * the source also respects ``spark.sql.binaryFile.maxLength``;
      oversize blobs fail loudly rather than OOMing a task."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    return reader.load(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    fetch_size: int = 10000,
    **options: str,
) -> DataFrame:
    """Partitioned JDBC scan. Without the partition quad the read is
    one task on one executor — fine for dimension snapshots, wrong
    for facts. Predicates on ``partition_column`` prune at the source
    (each task issues its own bounded WHERE)."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    reader = reader.option("fetchsize", str(fetch_size))
    if partition_column is not None:
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError(
                "partitioned JDBC read needs lower_bound, upper_bound and num_partitions"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()
