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


def stateful_running_totals(
    df: DataFrame,
    key_col: str,
    value_col: str,
    ts_col: str,
    watermark: str = "1 hour",
    integer_total: bool = False,
) -> DataFrame:
    """Custom stateful operator (``applyInPandasWithState``): per-key
    cumulative ``(n, total)`` maintained across micro-batches — the arbitrary-
    state primitive for anything the built-in window aggregates can't express
    (running counters, per-entity models, cross-batch sequences).

    Each micro-batch emits the updated running totals for the keys it
    touched (update semantics). State is bounded: the event-time timeout is
    pinned one watermark-delay past the newest event seen for the key, so
    idle keys are evicted once the stream's watermark passes them — the same
    eviction horizon the built-in stateful ops use.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    unit_ms = {"second": 1_000, "minute": 60_000, "hour": 3_600_000, "day": 86_400_000}
    amount, unit = watermark.split()
    delay_ms = int(amount) * unit_ms[unit.rstrip("s")]

    key_type = df.schema[key_col].dataType.simpleString()
    # integer_total: exact int64 accumulation (commutative, so the running
    # total is order- and batching-independent — the form a value-exact
    # oracle can check; float totals carry summation-order ulps).
    total_type = "long" if integer_total else "double"
    out_schema = f"{key_col} {key_type}, n long, total {total_type}"
    state_schema = f"n long, total {total_type}"
    zero = 0 if integer_total else 0.0
    cast = int if integer_total else float

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        n, total = state.get if state.exists else (0, zero)
        last_ts = None
        for pdf in pdfs:
            n += len(pdf)
            # Integer totals accumulate as arbitrary-precision Python ints
            # (object-dtype sum): a numpy int64 batch sum would WRAP
            # silently if a micro-batch's values ever summed past 2^63,
            # poisoning the running state (ADVICE r10 info item).
            batch_sum = (
                pdf[value_col].astype(object).sum()
                if integer_total
                else pdf[value_col].sum()
            )
            total += cast(batch_sum)
            batch_max = pdf[ts_col].max()
            last_ts = batch_max if last_ts is None else max(last_ts, batch_max)
        state.update((n, total))
        if last_ts is not None:
            # Evict once the watermark passes the newest event for this key
            # (setTimeoutTimestamp takes an absolute epoch-ms deadline).
            # Clamp to strictly above the CURRENT watermark: a straggler
            # key whose newest surviving event sits more than one delay
            # behind the stream's head has last_ts + delay <= watermark,
            # and Spark REJECTS a deadline at/behind the watermark
            # (INVALID_TIMEOUT_TIMESTAMP) — un-clamped, one slow source
            # partition kills the whole query (found by the r11 timeout-model
            # probes).  The clamped state evicts at the next watermark
            # advance, which is exactly the contract: its horizon passed.
            deadline = int(pd.Timestamp(last_ts).value // 1_000_000) + delay_ms
            wm_ms = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(deadline, wm_ms + 1))
        yield pd.DataFrame({key_col: [key[0]], "n": [n], "total": [total]})

    return (
        with_watermark(df, ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            update, out_schema, state_schema, "update", GroupStateTimeout.EventTimeTimeout
        )
    )


def streaming_session_counts(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked SESSION-window aggregate: a session extends while events
    arrive within ``gap`` of the previous one and closes after a quiet gap —
    the hardest standard streaming shape, because windows MERGE when a
    late-but-in-watermark event bridges two open sessions. State for a
    session is evictable once (session end + gap) passes the watermark, so
    memory stays bounded by the number of OPEN sessions, not event history.
    Batch-mode twin: operators/events.py session windows (oracled)."""
    out = (
        with_watermark(df, ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap), *keys)
        .agg(*aggs)
    )
    value_cols = [c for c in out.columns if c != "session_window" and c not in keys]
    return out.select(
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        *keys,
        *value_cols,
    )


def tws_running_totals(
    df: DataFrame,
    key_col: str,
    value_col: str,
    ts_col: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-key running ``(n, total)`` on the **transformWithStateInPandas**
    API (Spark 4's arbitrary-state v2: typed value/list/map state cells,
    timers, initial-state seeding — the successor to
    ``applyInPandasWithState``). Same integer-exact accumulation contract as
    :func:`stateful_running_totals`, so the same batch GROUP BY oracle
    verifies it.

    Requires the RocksDB state-store provider (the only provider
    implementing transformWithState's multi-column-family state layout) —
    callers scope ``spark.sql.streaming.stateStore.providerClass`` around
    the run; on a cluster that provider is also the right choice for any
    large-state job (off-heap, incremental snapshots).  ALSO requires a
    working ``google.protobuf`` (the TWS state server speaks proto to the
    Python worker); environments without it get the v1
    :func:`stateful_running_totals` path — the registered driver gate stays
    on v1 for exactly that reason, and the v2 test skips when protobuf is
    absent.
    """
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    key_type = df.schema[key_col].dataType.simpleString()
    out_schema = f"{key_col} {key_type}, n long, total long"

    class _Totals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", "n long, total long")

        def handleInputRows(self, key, rows, timerValues):
            n, total = self._state.get() if self._state.exists() else (0, 0)
            for pdf in rows:
                n += len(pdf)
                total += int(pdf[value_col].sum())
            self._state.update((n, total))
            yield pd.DataFrame({key_col: [key[0]], "n": [n], "total": [total]})

        def close(self) -> None:
            pass

    return (
        with_watermark(df, ts_col, watermark)
        .groupBy(key_col)
        .transformWithStateInPandas(
            _Totals(), outputStructType=out_schema, outputMode="Update", timeMode="None"
        )
    )
