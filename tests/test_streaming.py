"""Streaming layer tests: file-arrival trigger (reference S9) and
watermarked stateful ops, exercised with real streaming queries (memory/
parquet sinks, AvailableNow trigger)."""

from __future__ import annotations

import time

import pandas as pd
import pytest
from pyspark.sql import functions as F

from aws_etl_fiap_spark.streaming.file_trigger import (
    process_available_files,
    stream_from_directory,
)
from aws_etl_fiap_spark.streaming.windows import (
    stateful_running_totals,
    streaming_dedup,
    streaming_tumbling_counts,
)


def _write_batch(spark, path, ids):
    pdf = pd.DataFrame(
        {
            "event_id": ids,
            "ts": pd.to_datetime(["2024-01-01 00:00:05"] * len(ids)) + pd.to_timedelta(ids, "m"),
            "value": [float(i) for i in ids],
        }
    )
    spark.createDataFrame(pdf).write.mode("append").parquet(path)


def test_file_arrival_trigger(spark, tmp_path):
    """Files landing in raw/ flow through the transform into refined/ exactly
    once per file — incl. across two separate AvailableNow runs (the
    checkpoint is the Lambda-dedup the reference never had)."""
    raw = str(tmp_path / "raw")
    out = str(tmp_path / "refined")
    ckpt = str(tmp_path / "ckpt")
    _write_batch(spark, raw, [1, 2, 3])
    schema = spark.read.parquet(raw).schema

    def transform(df):
        return df.withColumn("doubled", F.col("value") * 2)

    stream = stream_from_directory(spark, raw, schema)
    process_available_files(stream, transform, out, ckpt)
    assert spark.read.parquet(out).count() == 3

    # Second "S3 event": only the new file is processed.
    _write_batch(spark, raw, [4, 5])
    stream = stream_from_directory(spark, raw, schema)
    process_available_files(stream, transform, out, ckpt)
    result = spark.read.parquet(out)
    assert result.count() == 5
    assert result.select(F.sum("doubled")).collect()[0][0] == 2.0 * (1 + 2 + 3 + 4 + 5)


def test_streaming_tumbling_window(spark, tmp_path):
    raw = str(tmp_path / "raw")
    _write_batch(spark, raw, list(range(25)))  # one event/min for 25 min
    schema = spark.read.parquet(raw).schema
    stream = stream_from_directory(spark, raw, schema)
    windowed = streaming_tumbling_counts(
        stream, "ts", "10 minutes", keys=[], aggs=[F.count(F.lit(1)).alias("n")]
    )
    q = (
        windowed.writeStream.format("memory")
        .queryName("tumbling_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    q.awaitTermination()
    rows = {r.window_start.minute: r.n for r in spark.sql("SELECT * FROM tumbling_test").collect()}
    assert rows == {0: 10, 10: 10, 20: 5}


def test_stateful_running_totals_across_batches(spark, tmp_path):
    """applyInPandasWithState carries per-key state across micro-batches:
    with maxFilesPerTrigger=1 the two files land in separate batches, and the
    second batch's emission must include the first batch's totals."""
    raw = str(tmp_path / "raw")
    pdf1 = pd.DataFrame(
        {
            "user": [1, 1, 2],
            "ts": pd.to_datetime(["2024-01-01 00:00:01"] * 3),
            "value": [10.0, 20.0, 5.0],
        }
    )
    pdf2 = pd.DataFrame(
        {
            "user": [1, 2],
            "ts": pd.to_datetime(["2024-01-01 00:10:00"] * 2),
            "value": [30.0, 7.0],
        }
    )
    spark.createDataFrame(pdf1).write.mode("append").parquet(raw)
    spark.createDataFrame(pdf2).write.mode("append").parquet(raw)
    schema = spark.read.parquet(raw).schema
    stream = stream_from_directory(spark, raw, schema, max_files_per_trigger=1)
    totals = stateful_running_totals(stream, "user", "value", "ts")
    q = (
        totals.writeStream.format("memory")
        .queryName("stateful_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_state"))
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM stateful_test").collect()
    # Last emission per user is the cumulative total over both batches.
    final = {}
    for r in rows:
        final[r.user] = (r.n, r.total)
    assert final[1] == (3, 60.0)
    assert final[2] == (2, 12.0)


def test_streaming_dedup_within_watermark(spark, tmp_path):
    raw = str(tmp_path / "raw")
    _write_batch(spark, raw, [1, 2, 3])
    _write_batch(spark, raw, [2, 3, 4])  # duplicates of 2 and 3
    schema = spark.read.parquet(raw).schema
    stream = stream_from_directory(spark, raw, schema)
    deduped = streaming_dedup(stream, "ts", ["event_id"], watermark="1 hour")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .start()
    )
    q.awaitTermination()
    ids = sorted(r.event_id for r in spark.sql("SELECT event_id FROM dedup_test").collect())
    assert ids == [1, 2, 3, 4]


def test_registered_streaming_queries_restore_session_conf(spark):
    """Registered streaming queries scope every conf they touch (shuffle
    partitions for state-store sizing, nanosAsLong for the events schema):
    the driver runs ~100 queries through one shared session, so any net
    session-conf change would leak into every query that follows."""
    from aws_etl_fiap_spark.queries.streaming_q import stream_dedup_equiv

    keys = ["spark.sql.shuffle.partitions", "spark.sql.legacy.parquet.nanosAsLong"]

    def snapshot():
        out = {}
        for k in keys:
            try:
                out[k] = spark.conf.get(k)
            except Exception:
                out[k] = None
        return out

    before = snapshot()
    stream_dedup_equiv(spark, "/root/testdata/sf0.001").count()
    assert snapshot() == before


def test_streaming_session_window_merges_across_batches(spark, tmp_path):
    """Sessions must merge when a bridging event arrives in a LATER batch:
    batch 1 leaves two sessions separated by a quiet gap; batch 2 drops an
    event into the gap, welding them into one session. State from batch 1
    must still be live (watermark) for the merge to happen."""
    from aws_etl_fiap_spark.streaming.windows import streaming_session_counts

    raw = str(tmp_path / "raw")
    # Minutes 0,1,2 then 10,11: two sessions with a 5-minute gap rule.
    _write_batch(spark, raw, [0, 1, 2, 10, 11])
    schema = spark.read.parquet(raw).schema

    def run(name):
        # Keyed by user: streaming session windows require a grouping key
        # (Spark rejects global session aggregation), which is also the only
        # shape that scales — state partitions by key.
        stream = stream_from_directory(spark, raw, schema).withColumn(
            "user", F.lit("u1")
        )
        sessions = streaming_session_counts(
            stream, "ts", "5 minutes", keys=["user"], aggs=[F.count(F.lit(1)).alias("n")]
        )
        q = (
            sessions.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
            .start()
        )
        q.awaitTermination()
        return sorted(
            (r.user, r.session_start.minute, r.session_end.minute, r.n)
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        )

    # Two sessions: [0..2+gap) and [10..11+gap). Events are at second 5,
    # so session_end = last event + 5 min lands in minute (last+5).
    assert run("sess_a") == [("u1", 0, 7, 3), ("u1", 10, 16, 2)]

    # The bridge: minute 6 is within 5 min of BOTH session edges.
    _write_batch(spark, raw, [6])
    assert run("sess_b") == [("u1", 0, 16, 6)]


def _has_protobuf() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithState's Python state server needs google.protobuf",
)
def test_tws_running_totals_matches_batch(spark, tmp_path, sf_smoke):
    """Arbitrary-state v2 (transformWithStateInPandas + RocksDB provider):
    drained running totals must equal the batch GROUP BY, like the v1 gate."""
    from aws_etl_fiap_spark.confs import scoped_conf
    from aws_etl_fiap_spark.queries.streaming_q import _run_to_table, _stream_events
    from aws_etl_fiap_spark.sources.readers import load_table
    from aws_etl_fiap_spark.streaming.windows import tws_running_totals

    cents = F.floor(F.col("value").cast("double") * 100.0 + 0.5).cast("long")
    events = _stream_events(spark, sf_smoke).withColumn("v_cents", cents)
    with scoped_conf(
        spark,
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    ):
        got = _run_to_table(
            tws_running_totals(events, "user_id", "v_cents", "ts"), spark, mode="update"
        )
    expect = (
        load_table(spark, sf_smoke, "events")
        .withColumn("v_cents", cents)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v_cents").alias("total"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expect.collect()))


def test_multibatch_state_carries_across_batches(spark, tmp_path):
    """With maxFilesPerTrigger=1, a key present in two files gets TWO
    update-mode emissions whose totals accumulate — proof the state cell
    survives the micro-batch boundary (the single-file gates never cross
    one)."""
    import uuid as _uuid

    from aws_etl_fiap_spark.streaming.windows import stateful_running_totals

    path = str(tmp_path / "split")
    for batch in ([(1, "2024-01-01 10:00:00", 5)], [(1, "2024-01-01 11:00:00", 7)]):
        spark.createDataFrame(
            batch, "user_id long, ts string, v long"
        ).withColumn("ts", F.col("ts").cast("timestamp")).coalesce(1).write.mode(
            "append"
        ).parquet(path)
    schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(path)
    totals = stateful_running_totals(
        stream, "user_id", "v", "ts", watermark="8760 hours", integer_total=True
    )
    name = f"mb_{_uuid.uuid4().hex[:8]}"
    q = (
        totals.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = sorted(map(tuple, spark.table(name).collect()))
    assert rows == [(1, 1, 5), (1, 2, 12)]  # two emissions, accumulated


def test_stateful_integer_totals_overflow_is_loud_not_wrapped(spark, tmp_path):
    """ADVICE r10 info item: pre-fix, a micro-batch summing to 2^63 hit
    numpy's int64 wrap and the operator SILENTLY emitted total = -2^63 —
    a poisoned running state indistinguishable from real data.  The fix
    accumulates per-batch sums as arbitrary-precision Python ints, so a
    true total past int64 now fails LOUDLY at the long-typed state/output
    serialization (the schema genuinely cannot represent it); totals that
    fit int64 stay exact through the extremes."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    def run(name, batches):
        raw = str(tmp_path / f"raw_{name}")
        for pdf in batches:
            spark.createDataFrame(pdf).write.mode("append").parquet(raw)
        schema = spark.read.parquet(raw).schema
        stream = stream_from_directory(
            spark, raw, schema, max_files_per_trigger=1
        )
        totals = stateful_running_totals(
            stream, "user", "value", "ts", integer_total=True
        )
        q = (
            totals.writeStream.format("memory")
            .queryName(f"stateful_{name}")
            .outputMode("update")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
            .start()
        )
        q.awaitTermination()
        rows = spark.sql(f"SELECT * FROM stateful_{name}").collect()
        return {r.user: (r.n, r.total) for r in rows}

    big = 2**62
    ts1 = pd.to_datetime(["2024-01-01 00:00:01"])
    ts2 = pd.to_datetime(["2024-01-01 00:10:00"])
    # Exact at the representable extreme: running total int64-max, then max-5.
    final = run(
        "extreme",
        [
            pd.DataFrame({"user": [1, 1], "ts": ts1.repeat(2), "value": [big, big - 1]}),
            pd.DataFrame({"user": [1], "ts": ts2, "value": [-5]}),
        ],
    )
    assert final[1] == (3, 2**63 - 6)
    # One past int64-max: loud stream failure, never a wrapped emission.
    with pytest.raises(StreamingQueryException):
        run(
            "overflow",
            [pd.DataFrame({"user": [1, 1], "ts": ts1.repeat(2), "value": [big, big]})],
        )


def test_tumbling_watermark_state_machine_matches_model_property(spark, tmp_path):
    """Property (r11, r10 verdict task 5): the append-mode watermarked
    tumbling aggregate over an arbitrary multi-batch replay must equal a
    pure-Python two-watermark state machine.  Spark's microbatch protocol
    (probed empirically on 4.1, matching WatermarkPropagator's design)
    carries TWO watermarks per batch: late rows are filtered with the
    PREVIOUS batch's watermark (drop iff window_end <= W(N-2)), state is
    evicted/emitted with the CURRENT one (emit iff window_end <= W(N-1),
    both inclusive), where W(i) = max event time through batch i minus
    the delay; trailing no-data batches run eviction until W(last).
    This pins exactly the late-data drop boundaries and expiry ordering
    the batch-equivalence gates sidestep (their watermark exceeds the
    data's span, so no row is ever late there)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from aws_etl_fiap_spark.streaming.windows import streaming_tumbling_counts

    WIN_MIN, DELAY_MIN = 10, 10
    base = pd.Timestamp("2024-01-01 00:00:00")
    row = st.tuples(st.integers(1, 2), st.integers(0, 120))
    batches_strategy = st.lists(
        st.lists(row, min_size=1, max_size=4), min_size=2, max_size=4
    )

    def model(batches):
        """Expected append-mode output: {(window_start_min, key): n}."""
        wm_hist = [0.0]  # W(i-1) entries; index i -> W up to batch i-1
        running_max = None
        wms = []
        for b in batches:
            m = max(minute for _, minute in b)
            running_max = m if running_max is None else max(running_max, m)
            wms.append(max(0.0, running_max - DELAY_MIN))
        state: dict = {}
        emitted: dict = {}
        for n_idx, b in enumerate(batches):
            f_wm = wms[n_idx - 2] if n_idx >= 2 else 0.0
            e_wm = wms[n_idx - 1] if n_idx >= 1 else 0.0
            for key, minute in b:
                w_start = (minute // WIN_MIN) * WIN_MIN
                if w_start + WIN_MIN <= f_wm:
                    continue  # late: window closed by the previous watermark
                if (w_start, key) in emitted:
                    continue  # emitted windows never reopen in append mode
                state[(w_start, key)] = state.get((w_start, key), 0) + 1
            for (w_start, key), n in list(state.items()):
                if w_start + WIN_MIN <= e_wm:
                    emitted[(w_start, key)] = n
                    del state[(w_start, key)]
        final_wm = wms[-1]
        for (w_start, key), n in list(state.items()):
            if w_start + WIN_MIN <= final_wm:
                emitted[(w_start, key)] = n
                del state[(w_start, key)]
        return emitted

    counter = [0]

    @settings(max_examples=5, deadline=None)
    @given(batches_strategy)
    def prop(batches):
        counter[0] += 1
        raw = str(tmp_path / f"wmprop_{counter[0]}")
        for b in batches:
            pdf = pd.DataFrame(
                {
                    "k": [k for k, _ in b],
                    "ts": [base + pd.Timedelta(minutes=m) for _, m in b],
                }
            )
            spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(raw)
            time.sleep(1.05)  # distinct mtimes pin the batch replay order
        schema = spark.read.parquet(raw).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(raw)
        )
        out = streaming_tumbling_counts(
            stream,
            "ts",
            f"{WIN_MIN} minutes",
            keys=["k"],
            aggs=[F.count(F.lit(1)).alias("n")],
            watermark=f"{DELAY_MIN} minutes",
        )
        name = f"wmprop_{counter[0]}"
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / f"ck_{counter[0]}"))
            .start()
        )
        q.awaitTermination()
        got = {
            (
                int((r.window_start - base).total_seconds() // 60),
                r.k,
            ): r.n
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        }
        assert got == model(batches), (batches, got, model(batches))

    prop()


def test_dedup_within_watermark_state_machine_matches_model_property(spark, tmp_path):
    """Property (r11): dropDuplicatesWithinWatermark over an arbitrary
    multi-batch replay must equal a pure-Python state machine.  Protocol
    pinned by 10 targeted probes of Spark 4.1 plus a hypothesis
    counterexample that killed the first two drafts: the late filter uses
    the PREVIOUS batch's watermark W(N-2) with an INCLUSIVE ts <= wm drop
    and a wm>0 guard (epoch-watermark batches filter nothing); a row
    surviving the filter is dropped iff its key is in state (expiry is
    NOT consulted on read and duplicates never extend it); eviction runs
    AFTER the batch's rows with the current watermark (expiry <= W(N-1),
    expiry = first-occurrence ts + delay).  The consequence the docs only hint at: a duplicate
    arriving after its key's state expired RE-EMITS — streaming dedup is
    exactly-once only within the watermark horizon, and this model pins
    where that horizon falls to the minute."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from aws_etl_fiap_spark.streaming.windows import streaming_dedup

    DELAY_MIN = 10
    base = pd.Timestamp("2024-01-01 00:00:00")
    row = st.tuples(st.integers(1, 3), st.integers(0, 60))
    batches_strategy = st.lists(
        st.lists(row, min_size=1, max_size=4), min_size=2, max_size=4
    )

    def model(batches):
        wms, mx = [], None
        for b in batches:
            m = max(t for _, t in b)
            mx = m if mx is None else max(mx, m)
            wms.append(max(0, mx - DELAY_MIN))
        state, out = {}, []
        for n_idx, b in enumerate(batches):
            f_wm = wms[n_idx - 2] if n_idx >= 2 else 0
            e_wm = wms[n_idx - 1] if n_idx >= 1 else 0
            for k, t in b:
                if (f_wm > 0 and t <= f_wm) or k in state:
                    continue
                out.append((k, t))
                state[k] = t + DELAY_MIN
            for k in [k for k, exp in state.items() if exp <= e_wm]:
                del state[k]
        return sorted(out)

    counter = [0]

    @settings(max_examples=5, deadline=None)
    @given(batches_strategy)
    def prop(batches):
        counter[0] += 1
        raw = str(tmp_path / f"ddprop_{counter[0]}")
        for b in batches:
            pdf = pd.DataFrame(
                {
                    "k": [k for k, _ in b],
                    "ts": [base + pd.Timedelta(minutes=m) for _, m in b],
                }
            )
            spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(raw)
            time.sleep(1.05)
        schema = spark.read.parquet(raw).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(raw)
        )
        out = streaming_dedup(
            stream, "ts", ["k"], watermark=f"{DELAY_MIN} minutes"
        )
        name = f"ddprop_{counter[0]}"
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / f"ddck_{counter[0]}"))
            .start()
        )
        q.awaitTermination()
        got = sorted(
            (r.k, int((r.ts - base).total_seconds() // 60))
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        )
        assert got == model(batches), (batches, got, model(batches))

    prop()


def test_stateful_totals_timeout_state_machine_matches_model_property(spark, tmp_path):
    """Property (r11): stateful_running_totals' custom EventTimeTimeout
    eviction — OUR code, not a Spark built-in — must equal a pure-Python
    state machine over arbitrary multi-batch replays.  Protocol pinned by
    probing: late rows filter on the PREVIOUS batch watermark W(N-2)
    (inclusive, zero-guarded, same machinery as the other stateful ops);
    a key with no surviving rows in a batch times out iff its deadline is
    STRICTLY below the current watermark W(N-1), removing state with NO
    emission (the next event starts a fresh running total); a key with
    data never times out and re-arms its deadline from THIS batch's max
    surviving ts (the deadline can regress).  The probe campaign for this
    model found a real crash first: a straggler key whose newest event
    sits more than one delay behind the stream head produced a deadline
    at/behind the watermark, which Spark rejects
    (INVALID_TIMEOUT_TIMESTAMP) — one slow source partition killed the
    whole query.  The operator now clamps the deadline one ms past the
    current watermark; the model carries the same clamp."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    DELAY_MIN, MS = 10, 60_000
    base = pd.Timestamp("2024-01-01 00:00:00")
    row = st.tuples(
        st.integers(1, 2), st.integers(0, 120), st.integers(-3, 9)
    )
    batches_strategy = st.lists(
        st.lists(row, min_size=1, max_size=4), min_size=2, max_size=4
    )

    def model(batches):
        delay = DELAY_MIN * MS
        wms, mx = [], None
        for b in batches:
            m = max(t for _, t, _ in b)
            mx = m if mx is None else max(mx, m)
            wms.append(max(0, mx * MS - delay))
        state, out = {}, []
        for n_idx, b in enumerate(batches):
            f_wm = wms[n_idx - 2] if n_idx >= 2 else 0
            e_wm = wms[n_idx - 1] if n_idx >= 1 else 0
            surviving: dict = {}
            for k, t, v in b:
                if f_wm > 0 and t * MS <= f_wm:
                    continue
                surviving.setdefault(k, []).append((t, v))
            for k in list(state):
                if k not in surviving and state[k][2] < e_wm:
                    del state[k]
            for k, rows in surviving.items():
                n, tot, _ = state.get(k, (0, 0, None))
                n += len(rows)
                tot += sum(v for _, v in rows)
                last = max(t for t, _ in rows)
                state[k] = (n, tot, max(last * MS + delay, e_wm + 1))
                out.append((k, n, tot))
        return sorted(out)

    counter = [0]

    @settings(max_examples=5, deadline=None)
    @given(batches_strategy)
    def prop(batches):
        counter[0] += 1
        raw = str(tmp_path / f"stprop_{counter[0]}")
        for b in batches:
            pdf = pd.DataFrame(
                {
                    "k": [k for k, _, _ in b],
                    "ts": [base + pd.Timedelta(minutes=m) for _, m, _ in b],
                    "v": [v for _, _, v in b],
                }
            )
            spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(raw)
            time.sleep(1.05)
        schema = spark.read.parquet(raw).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(raw)
        )
        out = stateful_running_totals(
            stream, "k", "v", "ts",
            watermark=f"{DELAY_MIN} minutes", integer_total=True,
        )
        name = f"stprop_{counter[0]}"
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / f"stck_{counter[0]}"))
            .start()
        )
        q.awaitTermination()
        got = sorted(
            (r.k, r.n, r.total)
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        )
        assert got == model(batches), (batches, got, model(batches))

    prop()


def test_session_window_complete_mode_matches_gap_merge_model_property(spark, tmp_path):
    """Property (r11): complete-mode streaming session windows over an
    arbitrary multi-batch replay must equal a pure-Python gap-merge over
    ALL rows — probed on Spark 4.1: in complete mode the watermark drops
    NOTHING (a row far behind the stream head still lands, and can still
    WELD two existing sessions), so the final table is batch-order
    independent.  Boundary ties are generated on purpose: an event at
    exactly prev_end (= prev_ts + gap) MERGES into the session — the
    off-by-one the r10 session-boundary property caught on the batch
    side's oracle.  Session end = last event + gap; counts per merged
    session verified exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from aws_etl_fiap_spark.streaming.windows import streaming_session_counts

    GAP_MIN = 5
    base = pd.Timestamp("2024-01-01 00:00:00")
    row = st.tuples(st.integers(1, 2), st.integers(0, 40))
    batches_strategy = st.lists(
        st.lists(row, min_size=1, max_size=5), min_size=1, max_size=3
    )

    def model(batches):
        by_user: dict = {}
        for b in batches:
            for u, t in b:
                by_user.setdefault(u, []).append(t)
        out = []
        for u, ts in by_user.items():
            ts.sort()
            start, last, n = ts[0], ts[0], 1
            for t in ts[1:]:
                if t <= last + GAP_MIN:  # tie at exactly prev+gap MERGES
                    last, n = t, n + 1
                else:
                    out.append((u, start, last + GAP_MIN, n))
                    start, last, n = t, t, 1
            out.append((u, start, last + GAP_MIN, n))
        return sorted(out)

    counter = [0]

    @settings(max_examples=5, deadline=None)
    @given(batches_strategy)
    def prop(batches):
        counter[0] += 1
        raw = str(tmp_path / f"ssprop_{counter[0]}")
        for b in batches:
            pdf = pd.DataFrame(
                {
                    "u": [u for u, _ in b],
                    "ts": [base + pd.Timedelta(minutes=m) for _, m in b],
                }
            )
            spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(raw)
            time.sleep(1.05)
        schema = spark.read.parquet(raw).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(raw)
        )
        out = streaming_session_counts(
            stream, "ts", f"{GAP_MIN} minutes",
            keys=["u"], aggs=[F.count(F.lit(1)).alias("n")],
        )
        name = f"ssprop_{counter[0]}"
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / f"ssck_{counter[0]}"))
            .start()
        )
        q.awaitTermination()
        got = sorted(
            (
                r.u,
                int((r.session_start - base).total_seconds() // 60),
                int((r.session_end - base).total_seconds() // 60),
                r.n,
            )
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        )
        assert got == model(batches), (batches, got, model(batches))

    prop()
