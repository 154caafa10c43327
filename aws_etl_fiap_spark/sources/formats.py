"""CSV / JSON-lines sources and sinks ([EXT] beyond the reference's
parquet-only at-rest format — the interchange formats an ETL engine meets at
its edges).

Scale rules baked in:
- ALWAYS pass an explicit schema on read. Schema inference runs an extra full
  scan of the data before the real job — at 100 TB that doubles the read; and
  inferred types drift with the sample (a column of "01" infers int today,
  string tomorrow).
- Malformed rows are a policy, not a crash: ``mode`` exposes Spark's
  PERMISSIVE (quarantine into a corrupt-record column) / DROPMALFORMED /
  FAILFAST tri-state. At 100 TB there WILL be broken lines; the default
  quarantines them for audit instead of killing the job or silently dropping.
- These formats are for the edges. Internal layers stay columnar parquet
  (SNAPPY): CSV/JSON can't column-prune or push filters, so a query over them
  always pays a full scan + parse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

CORRUPT_COL = "_corrupt_record"


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", "true").csv(path)


def read_csv(spark: SparkSession, path: str, schema: StructType | str) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON Lines (one object per line — the only JSON layout that splits
    across workers; a single top-level array cannot be parallelized)."""
    df.write.mode(mode).json(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """Schema-enforced JSON-lines read with malformed-row policy.

    PERMISSIVE (default): broken lines land in ``_corrupt_record`` with
    every schema column NULL — filter on it to quarantine. DROPMALFORMED:
    silently drop. FAILFAST: abort on first broken line.

    Caveat: Spark refuses a query that references ONLY the corrupt column
    over the raw scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — cache() the
    parsed frame before splitting good/bad on it.
    """
    reader = spark.read.option("mode", mode)
    if mode == "PERMISSIVE":
        full = (
            StructType.fromDDL(schema) if isinstance(schema, str) else schema
        ).add(CORRUPT_COL, "string")
        reader = reader.schema(full).option("columnNameOfCorruptRecord", CORRUPT_COL)
    else:
        reader = reader.schema(schema)
    return reader.json(path)


def write_orc(
    df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None
) -> None:
    """ORC sink (native vectorized writer, snappy by default). Same columnar
    properties as parquet — predicate pushdown, column pruning, splittable
    stripes — for pipelines whose downstream (Hive/Trino deployments) is
    ORC-standardized."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan; schema from file footers, partition columns recovered from
    the directory layout — symmetric with ``spark.read.parquet``."""
    return spark.read.orc(path)
