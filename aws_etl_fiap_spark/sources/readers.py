"""Parquet scan layer (reference S5: ``spark.read.parquet``, b3_transform.py:241).

At 100 TB the scan is where most time goes, so the rules here are:
- never infer schemas row-by-row — parquet footers carry the schema;
- keep reads lazy and column-pruned (callers ``select`` before any action, and
  Catalyst pushes the projection into the parquet reader);
- partition-column filters must prune directories, so partitioned tables are
  read from their root, not per-file.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_etl_fiap_spark.confs import scoped_conf

# Driver-provided synthetic tables (TESTDATA.md): TPC-H-ish star schema plus
# events / documents / embeddings extension tables.
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table from a scale-factor directory (lazy parquet scan).

    events.ts is parquet TIMESTAMP(NANOS); what Spark hands back is
    version-dependent, so branch on the RESOLVED type and normalize both
    shapes to session-tz ``timestamp``:

    - Spark 4.1+ reads nanos natively as TIMESTAMP_NTZ, truncating ns -> us
      (verified value-identical to DuckDB's truncating TIMESTAMP_NS ->
      TIMESTAMP cast at sf0.001: equal sum/min/max of epoch micros under a
      UTC session tz).  ``spark.sql.legacy.parquet.nanosAsLong`` is a no-op
      there.
    - Older Sparks refuse nanos unless that legacy conf maps them to raw
      BIGINT; then ``ts div 1000`` truncates to micros — exact integer
      division (a double divide would lose precision above 2^53 ns and
      ROUND, diverging from DuckDB).

    The legacy conf is SCOPED (round-3 verdict) and analysis is FORCED
    inside the scope: Spark 4.1 classic analyzes lazily
    (``QueryExecution.lazyAnalyzed``), so without the ``.schema`` touch the
    footer schema would resolve at first USE — after the restore.  Once
    analyzed, downstream ops build on the resolved plan, so the frame
    survives the restore and the shared driver session sees no net conf
    change.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # ts stays TIMESTAMP_NTZ — naive wall-clock fields, the SAME
        # semantics DuckDB's TIMESTAMP carries and the same type every
        # other table's timestamp columns already resolve to (the files are
        # isAdjustedToUTC=false).  Earlier rounds re-labeled NTZ to instant
        # ``timestamp`` here, which made every downstream day-boundary
        # extraction (cast-to-date, date_trunc, windowing, and even the
        # final collect) SESSION-TIME-ZONE-DEPENDENT: green under the
        # driver's UTC container, silently wrong under any other tz
        # (round-6 tz sweep caught six queries).  Naive end-to-end removes
        # the tz coupling instead of scoping it.
        with scoped_conf(spark, "spark.sql.legacy.parquet.nanosAsLong", "true"), scoped_conf(
            spark, "spark.sql.session.timeZone", "UTC"
        ):
            raw = spark.read.parquet(path)
            if raw.schema["ts"].dataType.simpleString() == "bigint":
                # Legacy nanos-as-long path: micros instant -> naive UTC
                # fields, resolved under the scoped UTC so the NTZ values
                # equal the file's wall clock on any session tz.
                out = raw.withColumn(
                    "ts",
                    F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
                )
            else:  # Spark 4.1+ resolves TIMESTAMP(NANOS) natively as NTZ
                out = raw
            out.schema  # force lazy analysis while the confs are in effect
        return out
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    """Read several tables at once; returns name -> lazy DataFrame."""
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Expose the tables as temp views so ``spark.sql`` queries (the Athena-
    style EP3 surface, SURVEY.md §3) can reference them by name."""
    for name, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)
