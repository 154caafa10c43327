"""Scoped session-conf mutation, shared by every layer that needs one.

The driver runs ~100 registered queries through ONE shared SparkSession, so
any conf a query (or reader) sets and never restores leaks into every query
that follows.  Rule: every conf mutation on the shared session MUST go
through :func:`scoped_conf` — set for exactly the statements that need it,
then restore the previous value (or unset).

CAUTION — Spark 4.1 classic analyzes LAZILY (``QueryExecution.lazyAnalyzed``):
a DataFrame built inside the scope does NOT resolve its plan (including the
parquet footer schema the legacy nanos conf gates) until first use, which may
be after the restore.  Any read whose SCHEMA depends on the scoped conf must
force analysis inside the scope (touch ``df.schema``) before exiting —
verified by tests/test_formats.py::test_load_table_leaves_session_conf_untouched,
which counts events rows AFTER the restore.
"""

from __future__ import annotations

import contextlib
from collections.abc import Iterator

from pyspark.sql import SparkSession


@contextlib.contextmanager
def scoped_conf(spark: SparkSession, key: str, value: str) -> Iterator[None]:
    """Set ``key=value`` for the duration of the block, then restore the
    previous value (or unset if it was unset)."""
    try:
        old = spark.conf.get(key)
    except Exception:
        old = None
    spark.conf.set(key, value)
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)
