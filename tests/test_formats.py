"""CSV / JSON-lines edge-format tests: value-preserving round-trips under
explicit schemas, and the malformed-row policy tri-state."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from aws_etl_fiap_spark.sources.formats import (
    CORRUPT_COL,
    read_csv,
    read_jsonl,
    write_csv,
    write_jsonl,
)
from aws_etl_fiap_spark.sources.readers import load_table

SCHEMA = "o_orderkey bigint, o_custkey bigint, o_orderstatus string, o_totalprice double"


def _sample(spark, sf_smoke):
    return (
        load_table(spark, sf_smoke, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .filter(F.col("o_orderkey") < 500)
    )


def test_csv_roundtrip_value_exact(spark, sf_smoke, tmp_path):
    src = _sample(spark, sf_smoke)
    path = str(tmp_path / "orders_csv")
    write_csv(src, path)
    back = read_csv(spark, path, SCHEMA)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))
    assert back.schema == src.schema


def test_jsonl_roundtrip_value_exact(spark, sf_smoke, tmp_path):
    src = _sample(spark, sf_smoke)
    path = str(tmp_path / "orders_json")
    write_jsonl(src, path)
    back = read_jsonl(spark, path, SCHEMA).drop(CORRUPT_COL)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_jsonl_malformed_row_policy(spark, tmp_path):
    path = str(tmp_path / "dirty")
    os.makedirs(path)
    with open(os.path.join(path, "part-0.json"), "w") as f:
        f.write('{"o_orderkey": 1, "o_custkey": 10, "o_orderstatus": "O", "o_totalprice": 5.5}\n')
        f.write("THIS IS NOT JSON\n")
        f.write('{"o_orderkey": 2, "o_custkey": 20, "o_orderstatus": "F", "o_totalprice": 7.25}\n')

    # Spark disallows queries that touch ONLY the corrupt-record column on
    # the raw file scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN); cache first.
    permissive = read_jsonl(spark, path, SCHEMA).cache()
    good = permissive.filter(F.col(CORRUPT_COL).isNull())
    bad = permissive.filter(F.col(CORRUPT_COL).isNotNull())
    assert good.count() == 2
    assert bad.count() == 1
    assert bad.first()[CORRUPT_COL] == "THIS IS NOT JSON"

    dropped = read_jsonl(spark, path, SCHEMA, mode="DROPMALFORMED")
    assert dropped.count() == 2

    with pytest.raises(Exception):
        read_jsonl(spark, path, SCHEMA, mode="FAILFAST").collect()


def test_orc_roundtrip_and_pushdown(spark, sf_smoke, tmp_path):
    from aws_etl_fiap_spark.sources.formats import read_orc, write_orc

    src = load_table(spark, sf_smoke, "orders")
    path = str(tmp_path / "orders_orc")
    write_orc(src, path, partition_by=["o_orderstatus"])
    back = read_orc(spark, path)
    assert back.count() == src.count()
    assert set(back.columns) == set(src.columns)
    # Value-exact roundtrip (ORC preserves doubles/timestamps bit-for-bit).
    a = sorted(map(tuple, src.select("o_orderkey", "o_totalprice").collect()))
    b = sorted(map(tuple, back.select("o_orderkey", "o_totalprice").collect()))
    assert a == b
    # Partition pruning reaches the ORC scan.
    plan = (
        back.filter(F.col("o_orderstatus") == "F")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan


def test_load_table_leaves_session_conf_untouched(spark, sf_smoke):
    """The events read needs the legacy nanos conf only while the parquet
    footer schema resolves; the repo rule says every mutation on the shared
    session must be scoped (round-3 verdict: the batch reader was the one
    leak left).  The frame must stay executable AFTER the restore — footer
    schemas resolve eagerly at read time, which this count proves."""
    key = "spark.sql.legacy.parquet.nanosAsLong"
    try:
        before = spark.conf.get(key)
    except Exception:
        before = None
    ev = load_table(spark, sf_smoke, "events")
    try:
        after = spark.conf.get(key)
    except Exception:
        after = None
    assert after == before, f"load_table leaked {key}: {before!r} -> {after!r}"
    assert ev.count() > 0
    # r6: ts stays TIMESTAMP_NTZ end-to-end (naive wall clock, the DuckDB
    # semantics) — the instant re-label was the session-tz coupling.
    assert dict(ev.dtypes)["ts"] == "timestamp_ntz"


def test_events_ts_instants_invariant_under_session_tz(spark, sf_smoke):
    """events.ts values must be independent of the caller's session time
    zone (round-5 verdict #3, finished in r6 by keeping ts TIMESTAMP_NTZ —
    naive wall clock — instead of scoping a UTC re-label).  Fingerprint the
    naive epoch micros AND a day-boundary extraction (the expression class
    the old instant re-label silently shifted under non-UTC sessions)."""
    from aws_etl_fiap_spark.confs import scoped_conf

    EPOCH = "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)"

    def fingerprint():
        ev = load_table(spark, sf_smoke, "events")
        return ev.select(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr(EPOCH)).alias("s"),
            F.min(F.expr(EPOCH)).alias("lo"),
            F.max(F.expr(EPOCH)).alias("hi"),
            F.countDistinct(F.col("ts").cast("date")).alias("days"),
            F.min(F.col("ts").cast("date")).cast("string").alias("d0"),
        ).collect()[0]

    base = fingerprint()
    # Sao Paulo is UTC-3 year-round (DST abolished 2019): any re-label leak
    # would shift every instant by 3h = 10.8e9 micros.
    with scoped_conf(spark, "spark.sql.session.timeZone", "America/Sao_Paulo"):
        shifted_tz = fingerprint()
    assert tuple(base) == tuple(shifted_tz), (
        f"events instants drift with session tz: {base} vs {shifted_tz}"
    )


def test_sink_file_layout_orc_and_parquet(spark, sf_smoke, tmp_path):
    """Writer-fidelity layout assertions (round-6 verdict #6): pin the sink
    FILE layout — file counts, ORC stripe counts, parquet row-group counts,
    and footer-level row totals — independently of any read-back compare,
    so a driver hash divergence on a roundtrip gate can be attributed to
    the WRITER (layout/footer wrong) vs the COMPARATOR (values fetched or
    typed differently; the r6 failures were all comparator-side HUGEINT
    rendering).  pyarrow reads the footers directly — no Spark reader in
    the loop."""
    import glob

    import pyarrow.orc as pa_orc
    import pyarrow.parquet as pa_pq

    from aws_etl_fiap_spark.sources.formats import write_orc

    src = load_table(spark, sf_smoke, "orders")
    n_src = src.count()

    orc_path = str(tmp_path / "orders_orc_flat")
    write_orc(src.repartition(8), orc_path)
    orc_files = sorted(glob.glob(os.path.join(orc_path, "*.orc")))
    assert len(orc_files) == 8, "one ORC file per writer task"
    orc_rows = 0
    for f in orc_files:
        of = pa_orc.ORCFile(f)
        assert of.nstripes >= 1
        orc_rows += of.nrows
    assert orc_rows == n_src, "ORC footers must account for every row"

    pq_path = str(tmp_path / "orders_pq_flat")
    src.repartition(4).write.parquet(pq_path)
    pq_files = sorted(glob.glob(os.path.join(pq_path, "*.parquet")))
    assert len(pq_files) == 4, "one parquet file per writer task"
    pq_rows = 0
    for f in pq_files:
        pf = pa_pq.ParquetFile(f)
        assert pf.metadata.num_row_groups >= 1
        pq_rows += pf.metadata.num_rows
    assert pq_rows == n_src, "parquet footers must account for every row"
    # Schema survives in the footer (column set, not just row counts).
    assert set(pa_pq.read_schema(pq_files[0]).names) == set(src.columns)
