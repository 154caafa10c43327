"""Driver-graded queries for the Spark 4 Python DataSource source
(sources/pyds.py — the first-class re-expression of reference S1,
b3_collector.py:56-112).

The source's fake feed is pure integer arithmetic on each key's character
sum, so DuckDB reproduces every cell exactly in SQL: the driver's hash
compare verifies the WHOLE custom-source path — option parsing, partition
planning, executor-side row generation, Arrow transport — end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_etl_fiap_spark.queries.registry import query
from aws_etl_fiap_spark.sources import pyds
from aws_etl_fiap_spark.sources.readers import load_table

_DAYS = 8

# Mirrors pyds.series_row cell by cell: seed = ascii character sum of the
# key; close/volume are modular congruences scaled at the end (exact in
# both engines — same integer, same /100.0 double division).
_ORACLE = f"""
WITH seeds AS (
    SELECT n_name AS ticker,
           -- CAST: list_aggregate 'sum' yields HUGEINT, which pandas maps to
           -- float64/object and the driver's value hash then diverges from
           -- Spark's int64 (audit_types HUGEINT hazard)
           CAST(list_aggregate(list_transform(string_split(n_name, ''), x -> ascii(x)), 'sum') AS BIGINT) AS seed
    FROM nation
)
SELECT ticker,
       DATE '2024-01-01' + CAST(i AS INT) AS day,
       (2000 + (seed % 80) * 100 + ((seed * (i + 3)) % 17) * 25) / 100.0 AS close,
       CAST(1000 * ((seed + i * 7) % 97 + 1) AS BIGINT) AS volume
FROM seeds, range(0, {_DAYS}) t(i)
"""


@query("pyds_ticker_api_scan", oracle=_ORACLE)
def pyds_ticker_api_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Spark 4 Python DataSource API scan: the external-feed source as
    a real ``spark.read.format("ticker_api")`` with source-owned partition
    planning (one InputPartition per key chunk, rows generated on executors,
    Arrow-batched).

    The key list is source CONFIGURATION, not data: nation is a 25-row dim
    at every scale factor, collected bounded (``limit`` guard) the same way
    a production run would read its key universe from a catalog before
    planning the scan. The 100 TB-shaped work — per-key fetch — happens
    inside the source's ``read(partition)`` on executors.
    """
    pyds.register(spark)
    keys = [
        r.n_name
        for r in load_table(spark, sf_dir, "nation").select("n_name").limit(1000).collect()
    ]
    return (
        spark.read.format(pyds.FORMAT_NAME)
        .option("keys", pyds.encode_keys(sorted(keys)))
        .option("days", str(_DAYS))
        .option("chunk", "4")
        .load()
    )


@query(
    "pyds_ticker_api_agg",
    oracle=f"""
WITH feed AS ({_ORACLE})
SELECT ticker,
       COUNT(*) AS n_days,
       ROUND(SUM(close), 2) AS sum_close,
       MAX(volume) AS max_volume
FROM feed
GROUP BY ticker
""",
)
def pyds_ticker_api_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Aggregation pushed OVER the Python DataSource: proves the
    custom source composes with the normal Catalyst pipeline (partial
    aggregates on the source's own partitions, one shuffle on ticker)
    exactly like a parquet scan."""
    feed = pyds_ticker_api_scan(spark, sf_dir)
    return feed.groupBy("ticker").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(F.sum("close"), 2).alias("sum_close"),
        F.max("volume").alias("max_volume"),
    )


@query("pyds_stream_scan_equiv", oracle=_ORACLE)
def pyds_stream_scan_equiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Spark 4 Python STREAMING DataSource behind the exact gate: the
    same ticker feed consumed via ``spark.readStream.format("ticker_api")``
    — day-index offsets, per-micro-batch chunked partition planning, the
    engine's checkpointed (offset, commit) bookkeeping — drained with
    AvailableNow into a memory sink.  The drained rows must hash-equal the
    SAME DuckDB oracle as the batch scan: stream and batch paths agree
    bit-for-bit, the Kafka-shaped custom-ingest contract at 100 TB (a
    stateless source scales by partition count per batch)."""
    import uuid

    pyds.register(spark)
    keys = [
        r.n_name
        for r in load_table(spark, sf_dir, "nation").select("n_name").limit(1000).collect()
    ]
    stream = (
        spark.readStream.format(pyds.FORMAT_NAME)
        .option("keys", pyds.encode_keys(keys))
        .option("days", _DAYS)
        .option("chunk", 4)
        .load()
    )
    name = f"pyds_stream_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).localCheckpoint(eager=True)
