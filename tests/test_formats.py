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


def test_permissive_quarantine_matches_line_parser_model_property(spark, tmp_path):
    """Property (r11, r10 verdict task 5): PERMISSIVE JSON-lines
    classification must equal a pure-Python per-line parser model over an
    arbitrary mix of valid / partially-bad / structurally-broken lines.
    Semantics pinned by probing Spark 4.1 (all encoded below):
    - a valid object yields typed values; absent fields and JSON null
      read as NULL; extra fields are ignored; duplicate keys last-win;
    - a WRONG-TYPED field (string/float/bool/overflow for long) nulls
      THAT field, keeps every other convertible field (partial result,
      regardless of field order), and lands the raw line in
      _corrupt_record — there is NO string->long coercion, but ANY JSON
      value stringifies into a string field (5 -> '5', true -> 'true');
    - int64 boundary: max parses, max+1 is corrupt;
    - structurally broken lines (truncated object, bare words, scalar /
      non-object-array JSON) yield all-NULL + raw line;
    - '{}' is a valid all-NULL row with NO corrupt record — quarantine
      filters on _corrupt_record must not confuse it with garbage;
    - blank / whitespace-only lines produce NO row at all;
    - a top-level ARRAY OF OBJECTS explodes into one row per element.
    This is the model behind every roundtrip_*_quarantine gate's
    good/bad split."""
    import json as _json

    from hypothesis import given, settings
    from hypothesis import strategies as st

    I64MAX = 2**63 - 1
    words = st.sampled_from(["x", "y", "hello world", "", "ünïcode"])
    a_good = st.one_of(st.none(), st.integers(-5, 5), st.just(I64MAX))
    b_good = st.one_of(st.none(), words, st.integers(0, 9), st.booleans())
    line = st.one_of(
        st.tuples(st.just("valid"), a_good, b_good,
                  st.booleans(), st.booleans()),  # omit_a, omit_b
        st.tuples(st.just("bad_a"),
                  st.sampled_from(["quoted", "float", "bool", "overflow"]),
                  b_good),
        st.tuples(st.just("broken"),
                  st.sampled_from(["trunc", "garbage", "null", "scalar",
                                   "numarray"])),
        st.tuples(st.just("empty_obj")),
        st.tuples(st.just("blank"), st.sampled_from(["", "   "])),
        st.tuples(st.just("dupkey"), st.integers(-5, 5), st.integers(-5, 5)),
        st.tuples(st.just("explode"),
                  st.lists(st.tuples(st.integers(-5, 5), words),
                           min_size=1, max_size=3)),
    )

    def stringify(v):
        """Spark's string-field rendering of a non-string JSON value."""
        if isinstance(v, bool):
            return "true" if v else "false"
        return _json.dumps(v) if not isinstance(v, str) else v

    BAD_A = {"quoted": '"5"', "float": "1.5", "bool": "true",
             "overflow": str(2**63)}

    def render_and_model(spec):
        """-> (raw line text, list of expected (a, b, corrupt) rows)."""
        kind = spec[0]
        if kind == "valid":
            _, a, b, omit_a, omit_b = spec
            parts = []
            if not omit_a:
                parts.append(f'"a": {_json.dumps(a)}')
            if not omit_b:
                parts.append(f'"b": {_json.dumps(b)}')
            txt = "{" + ", ".join(parts) + "}"
            return txt, [(
                None if omit_a else a,
                None if omit_b or b is None else stringify(b),
                None,
            )]
        if kind == "bad_a":
            _, bad, b = spec
            txt = f'{{"a": {BAD_A[bad]}, "b": {_json.dumps(b)}}}'
            return txt, [(
                None, None if b is None else stringify(b), txt
            )]
        if kind == "broken":
            txt = {
                "trunc": '{"a": 1, ',
                "garbage": "not json at all",
                "null": "null",
                "scalar": '"str"',
                "numarray": "[1, 2]",
            }[spec[1]]
            return txt, [(None, None, txt)]
        if kind == "empty_obj":
            return "{}", [(None, None, None)]
        if kind == "blank":
            return spec[1], []
        if kind == "dupkey":
            _, v1, v2 = spec
            txt = f'{{"a": {v1}, "a": {v2}}}'
            return txt, [(v2, None, None)]
        # explode
        objs = [{"a": a, "b": b} for a, b in spec[1]]
        txt = _json.dumps(objs)
        return txt, [(a, b, None) for a, b in spec[1]]

    counter = [0]

    @settings(max_examples=25, deadline=None)
    @given(st.lists(line, min_size=1, max_size=10))
    def prop(specs):
        counter[0] += 1
        d = tmp_path / f"qprop_{counter[0]}"
        d.mkdir()
        lines, expected = [], []
        for spec in specs:
            txt, rows = render_and_model(spec)
            lines.append(txt)
            expected.extend(rows)
        (d / "part-0.json").write_text("\n".join(lines), encoding="utf-8")
        got = [
            (r["a"], r["b"], r[CORRUPT_COL])
            for r in read_jsonl(spark, str(d), "a long, b string").collect()
        ]
        assert sorted(got, key=str) == sorted(expected, key=str), (
            lines, got, expected
        )

    prop()
