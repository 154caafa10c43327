"""Write-path round-trip query ([EXT]; reference S4/S6 sinks +
compaction maintenance) — puts the PARTITIONED PARQUET SINK itself behind
the driver's exact-value gate.

Everything else the driver grades is read-side; this entry writes a real
partitioned table (the reference's refined-layer sink shape,
b3_transform.py:309-312), litters it across many tasks, compacts it with the
staging+swap rewrite, reads it back, and aggregates.  The result must
hash-equal an oracle computed straight from the source table — so partition
layout, dynamic overwrite, the compaction rewrite, and partition-column
round-tripping (values survive the directory encoding) are all inside the
verified loop.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_etl_fiap_spark.functions.parity import dec_sum, sql_dec_sum
from aws_etl_fiap_spark.queries.registry import query
from aws_etl_fiap_spark.sources.readers import load_table
from aws_etl_fiap_spark.sources.writers import (
    compact_partitions,
    read_back,
    write_partitioned,
)


@query(
    "roundtrip_partitioned_agg",
    oracle=f"""
SELECT CAST(YEAR(o_orderdate) AS INT) AS o_year,
       o_orderstatus,
       COUNT(*) AS n_orders,
       {sql_dec_sum('o_totalprice', 2)} AS total_price
FROM orders
GROUP BY 1, 2
""",
)
def roundtrip_partitioned_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4/S6 + compaction under the driver's eye: orders -> partitioned
    parquet sink (by o_year, deliberately littered across 8 writer tasks) ->
    compact_partitions (staging + atomic swap) -> read back -> aggregate.
    The aggregate must match the oracle computed from the ORIGINAL table, so
    any row lost/duplicated/mangled by the write, the partition encoding, or
    the compaction rewrite hash-fails.

    The sink lands under ``SPARK_GRAFT_SINK_DIR`` (default: the local temp
    dir) in a per-run directory deleted before returning; the aggregate is
    localCheckpointed EAGERLY first, so the frame the driver later collects
    no longer references the deleted files.  NOTE: with the local-tempdir
    default this query assumes local[*] mode — on a real cluster executors
    cannot reach the driver's /tmp, so point SPARK_GRAFT_SINK_DIR at shared
    storage (round-3 advice)."""
    base = os.environ.get("SPARK_GRAFT_SINK_DIR") or tempfile.gettempdir()
    tmp = tempfile.mkdtemp(prefix="roundtrip_", dir=base)
    path = os.path.join(tmp, "orders_by_year")
    try:
        src = load_table(spark, sf_dir, "orders").withColumn(
            "o_year", F.year("o_orderdate").cast("int")
        )
        # Deliberately litter: 8 writer tasks x N years sliver files, the
        # daily-sink reality compaction exists for.
        write_partitioned(src.repartition(8), path, ["o_year"])
        stats = compact_partitions(spark, path, ["o_year"], target_rows_per_file=1_000_000)
        # Explicit raise, not assert (asserts vanish under python -O), and
        # against the real invariant: files_after is bounded by the
        # per-partition file budget sum(ceil(rows/target)), which equals
        # `partitions` only while every o_year stays under target rows
        # (breaks around sf>=5 for TPC-H orders — round-3 advice).
        if stats["files_after"] > stats["file_budget"]:
            raise RuntimeError(f"compaction exceeded its file budget: {stats}")
        back = read_back(spark, path)
        out = back.groupBy("o_year", "o_orderstatus").agg(
            F.count(F.lit(1)).alias("n_orders"),
            dec_sum("o_totalprice", 2).alias("total_price"),
        )
        # Eager materialization: the temp table is deleted on return, so the
        # frame the driver collects must not lazily re-scan it.
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
