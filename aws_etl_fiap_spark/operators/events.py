"""Event-time window operators ([EXT], SURVEY.md §2.9).

The reference's only streaming-shaped construct is the S3-event trigger (S9);
its north-star extension is real event-time analytics over the ``events``
table. These operators are written against STATIC DataFrames using the same
``F.window`` / ``F.session_window`` expressions Structured Streaming uses, so
one definition serves batch backfill and the streaming path
(aws_etl_fiap_spark.streaming) unchanged — that duality is the Spark-native
replacement for a lambda architecture.

Scale notes:
- tumbling/sliding windows are pure groupBy aggregations: partial agg ->
  one hash exchange on (window, keys). A sliding window with slide s and
  length L replicates each row L/s times BEFORE the partial agg — keep L/s
  small (2 here) or pre-bucket to the slide then roll up.
- session windows shuffle by key and sort by time (same shape as W1); skewed
  keys are the hazard, AQE skew-split is on in session.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _flatten(out: DataFrame, struct_col: str, start: str, end: str, keys: Sequence[str]) -> DataFrame:
    value_cols = [c for c in out.columns if c != struct_col and c not in keys]
    return out.select(
        F.col(f"{struct_col}.start").alias(start),
        F.col(f"{struct_col}.end").alias(end),
        *keys,
        *value_cols,
    )


def tumbling_window_agg(
    df: DataFrame, ts_col: str, duration: str, keys: Sequence[str], aggs: Sequence[Column]
) -> DataFrame:
    """Fixed windows: groupBy(window(ts, d), keys).agg(...), window struct
    flattened to window_start/window_end."""
    out = df.groupBy(F.window(F.col(ts_col), duration), *keys).agg(*aggs)
    return _flatten(out, "window", "window_start", "window_end", keys)


def sliding_window_agg(
    df: DataFrame, ts_col: str, duration: str, slide: str, keys: Sequence[str], aggs: Sequence[Column]
) -> DataFrame:
    """Overlapping windows (each row lands in duration/slide windows)."""
    out = df.groupBy(F.window(F.col(ts_col), duration, slide), *keys).agg(*aggs)
    return _flatten(out, "window", "window_start", "window_end", keys)


def session_window_agg(
    df: DataFrame, ts_col: str, gap: str, keys: Sequence[str], aggs: Sequence[Column]
) -> DataFrame:
    """Gap-based sessions per key: a session breaks when the next event is
    STRICTLY MORE than gap after the previous one — an event at exactly
    prev + gap still MERGES (Spark coalesces touching windows; established
    empirically by the r10 boundary-tie model property, which falsified the
    earlier ``>=``-breaks reading and the two session oracles that encoded
    it).  Session end = last event + gap."""
    out = df.groupBy(F.session_window(F.col(ts_col), gap), *keys).agg(*aggs)
    return _flatten(out, "session_window", "session_start", "session_end", keys)
