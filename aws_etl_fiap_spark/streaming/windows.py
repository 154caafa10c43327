"""Streaming-native event-time operators ([EXT] §2.9): the same window
expressions as operators/events.py, plus the streaming-only pieces —
watermarks (late-data bound + state eviction) and stateful dedup.

State-size discipline at 100 TB/day:
- every stateful op here REQUIRES a watermark: without one, window and dedup
  state grows forever;
- dropDuplicatesWithinWatermark keys state by the dedup columns only, and
  evicts entries older than the watermark — the streaming twin of
  dedup.exact_dedup.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_watermark(df: DataFrame, ts_col: str, delay: str) -> DataFrame:
    """Declare event-time + lateness bound: rows later than ``delay`` behind
    the max seen ts may be dropped; window state older than it is evicted."""
    return df.withWatermark(ts_col, delay)


def streaming_tumbling_counts(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked tumbling-window aggregate — append-mode safe: a window
    emits once its end passes the watermark."""
    out = (
        with_watermark(df, ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), duration), *keys)
        .agg(*aggs)
    )
    value_cols = [c for c in out.columns if c != "window" and c not in keys]
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *keys,
        *value_cols,
    )


def streaming_dedup(
    df: DataFrame, ts_col: str, key_cols: Sequence[str], watermark: str = "1 hour"
) -> DataFrame:
    """Exactly-once-per-key within the watermark horizon: duplicates arriving
    inside ``watermark`` of the first occurrence are dropped; state for keys
    older than the horizon is evicted (bounded memory)."""
    return with_watermark(df, ts_col, watermark).dropDuplicatesWithinWatermark(list(key_cols))
