"""Catalog layer (reference S7/S8): external partitioned tables + partition
discovery, on Spark's built-in catalog instead of boto3+Glue.

The reference hand-writes a Glue ``table_input`` dict with Hive Parquet SerDe
and EXTERNAL_TABLE type (b3_collector.py:191-237, b3_transform.py:146-199)
then runs ``MSCK REPAIR TABLE`` (b3_collector.py:241-250). In Spark the same
contract is one DDL statement + the identical MSCK statement; the Glue
Catalog's role is played by spark_catalog (backed by the local warehouse dir;
on a cluster, by the Hive metastore / Glue catalog integration — same code).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def ensure_database(spark: SparkSession, database: str) -> None:
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")


def create_external_table(
    spark: SparkSession,
    database: str,
    table: str,
    location: str,
    schema_ddl: str,
    partition_cols: dict[str, str] | None = None,
) -> None:
    """CREATE TABLE ... USING PARQUET PARTITIONED BY ... LOCATION ...

    ``schema_ddl``: non-partition columns as "name type, ..." (hyphenated
    names must be backtick-quoted by the caller — the reference's
    ``stock-splits`` case). Partition columns are declared separately,
    matching the Glue table_input split (b3_collector.py:215-217).
    """
    ensure_database(spark, database)
    parts = ""
    cols = schema_ddl
    if partition_cols:
        part_ddl = ", ".join(f"`{c}` {t}" for c, t in partition_cols.items())
        cols = f"{schema_ddl}, {part_ddl}"
        parts = f"PARTITIONED BY ({', '.join(f'`{c}`' for c in partition_cols)})"
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {database}.{table} ({cols}) "
        f"USING PARQUET {parts} LOCATION '{location}'"
    )


def repair_partitions(spark: SparkSession, database: str, table: str) -> None:
    """Reference S8 verbatim: MSCK REPAIR TABLE discovers directory-layout
    partitions into the catalog (errors tolerated like the reference's
    try/except around it, b3_collector.py:248-250)."""
    try:
        spark.sql(f"MSCK REPAIR TABLE {database}.{table}")
    except Exception:
        # Table may be unpartitioned or location empty — match the
        # reference's tolerance: discovery failure is not a pipeline failure.
        pass


def register_table(
    spark: SparkSession,
    df: DataFrame,
    database: str,
    table: str,
    location: str,
    partition_cols: list[str] | None = None,
) -> None:
    """Write + declare + repair in one step: the engine's replacement for the
    reference's write->create_glue_table->MSCK sequence."""
    partition_cols = partition_cols or []
    data_cols = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name not in partition_cols
    )
    part_types = {
        f.name: f.dataType.simpleString() for f in df.schema.fields if f.name in partition_cols
    }
    create_external_table(spark, database, table, location, data_cols, part_types or None)
    repair_partitions(spark, database, table)


def update_external_table(
    spark: SparkSession,
    df: DataFrame,
    database: str,
    table: str,
    location: str,
    partition_cols: list[str] | None = None,
) -> str:
    """Schema-evolving registration — the reference's get_table ->
    update_table | create_table branch (b3_transform.py:139-199, fallback at
    :192-199) as catalog DDL.

    * table absent            -> create (+ MSCK), like the :192-199 fallback;
    * new columns appended    -> ALTER TABLE ADD COLUMNS (old files read the
                                 new columns as NULL — parquet is by-name);
    * a column's type changed -> drop + re-declare the EXTERNAL table in
                                 place (metadata only: external drop leaves
                                 every data file untouched) + MSCK, the
                                 update_table overwrite semantics;
    * no difference           -> no-op.

    Returns which branch ran: "created" | "altered" | "recreated" |
    "unchanged" (the reference logs the same decision, :144-145).
    """
    partition_cols = partition_cols or []
    fqn = f"{database}.{table}"
    ensure_database(spark, database)
    if not spark.catalog.tableExists(fqn):
        register_table(spark, df, database, table, location, partition_cols)
        return "created"
    existing = {f.name: f.dataType.simpleString() for f in spark.table(fqn).schema.fields}
    desired = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    changed = {n for n, t in desired.items() if n in existing and existing[n] != t}
    added = {n: t for n, t in desired.items() if n not in existing}
    if changed:
        # DROP is metadata-only ONLY for external tables; if this name was
        # created as a MANAGED table outside register_table, dropping it
        # would delete the data files (round-2 advice).  Refuse instead.
        if spark.catalog.getTable(fqn).tableType != "EXTERNAL":
            raise ValueError(
                f"update_external_table: {fqn} is not an EXTERNAL table; "
                "dropping it would delete its data files — refusing. "
                "Migrate the managed table explicitly first."
            )
        spark.sql(f"DROP TABLE {fqn}")  # EXTERNAL: files survive the drop
        register_table(spark, df, database, table, location, partition_cols)
        return "recreated"
    if added:
        cols = ", ".join(f"`{n}` {t}" for n, t in added.items())
        spark.sql(f"ALTER TABLE {fqn} ADD COLUMNS ({cols})")
        repair_partitions(spark, database, table)
        return "altered"
    return "unchanged"


def analyze_table(
    spark: SparkSession,
    database: str,
    table: str,
    columns: list[str] | None = None,
) -> dict[str, str]:
    """ANALYZE TABLE ... COMPUTE STATISTICS [FOR COLUMNS ...] — the stats
    feed Catalyst's cost-based optimizer (join reordering, build-side choice,
    broadcast decisions from real sizes instead of file-size guesses). At
    100 TB, stale or missing stats are why a planner broadcasts the wrong
    side; a daily pipeline should re-analyze what it rewrote, scoped to the
    columns that appear in join keys and filters (full-column stats on a wide
    table are their own scan).

    Returns the table-level stats Spark recorded (sizeInBytes/rowCount) for
    observability.
    """
    fqn = f"{database}.{table}"
    spark.sql(f"ANALYZE TABLE {fqn} COMPUTE STATISTICS")
    if columns:
        cols = ", ".join(f"`{c}`" for c in columns)
        spark.sql(f"ANALYZE TABLE {fqn} COMPUTE STATISTICS FOR COLUMNS {cols}")
    rows = spark.sql(f"DESCRIBE EXTENDED {fqn}").collect()
    stats = {r.col_name: r.data_type for r in rows if r.col_name == "Statistics"}
    return stats
