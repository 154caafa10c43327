"""Python DataSource (sources/pyds.py) unit tests: key-list transport and
executor-side row generation.

The ``keys`` option is a flat string; round-4 advice flagged the original
comma-joined transport as lossy (a key containing ``,`` silently split into
two).  The transport is now a JSON array (:func:`pyds.encode_keys`), with
the bare comma list kept only as a legacy spelling for comma-free keys.
"""

from __future__ import annotations

import pytest

from aws_etl_fiap_spark.sources import pyds


def test_encode_decode_roundtrip_arbitrary_keys():
    keys = ["PETR4,SA", "VALE3", 'quo"te', "comma,comma,comma", "ünïcodé"]
    assert pyds.decode_keys(pyds.encode_keys(keys)) == keys


def test_decode_legacy_comma_list():
    assert pyds.decode_keys("A,B,C") == ["A", "B", "C"]
    assert pyds.decode_keys("") == []


def test_decode_rejects_non_string_json():
    with pytest.raises(ValueError):
        pyds.decode_keys('[1, 2, 3]')
    with pytest.raises(Exception):
        pyds.decode_keys('["unterminated')


def test_comma_bearing_key_survives_scan(spark):
    """End-to-end through the registered format: a key with an embedded
    comma must come back as ONE ticker, not two — the exact failure mode of
    the old transport."""
    pyds.register(spark)
    keys = ["AB,CD", "EF"]
    rows = (
        spark.read.format(pyds.FORMAT_NAME)
        .option("keys", pyds.encode_keys(keys))
        .option("days", "2")
        .load()
        .collect()
    )
    tickers = sorted({r.ticker for r in rows})
    assert tickers == ["AB,CD", "EF"]
    assert len(rows) == 4  # 2 keys x 2 days
    # Values still match the deterministic fixture arithmetic per key.
    expect = {(k, i): pyds.series_row(k, i) for k in keys for i in range(2)}
    for r in rows:
        k = (r.ticker, (r.day - pyds._BASE_DAY).days)
        assert (r.ticker, r.day, r.close, r.volume) == expect[k]


def test_stream_reader_offsets_partition_day_ranges():
    """The streaming reader's offset is the day index: partitions(start,
    end) must cover exactly [start, end) for every key chunk, so the
    engine's checkpointed offsets replay deterministically."""
    from aws_etl_fiap_spark.sources.pyds import _TickerApiStreamReader, encode_keys

    r = _TickerApiStreamReader(
        {"keys": encode_keys(["AAA", "BBB", "CCC"]), "days": "6", "chunk": "2"}
    )
    assert r.initialOffset() == {"day": 0}
    assert r.latestOffset() == {"day": 6}
    parts = r.partitions({"day": 2}, {"day": 5})
    assert [p.value for p in parts] == [(["AAA", "BBB"], 2, 5), (["CCC"], 2, 5)]
    rows = [row for p in parts for row in r.read(p)]
    assert len(rows) == 3 * 3  # 3 keys x days {2,3,4}
    assert {i for (_, day, _, _) in rows for i in [(day - rows[0][1]).days]} <= {0, 1, 2}


def test_stream_reader_resume_midway_no_overlap():
    """Replaying from a committed mid-stream offset yields exactly the
    remaining rows — no duplicates, no gaps (exactly-once bookkeeping)."""
    from aws_etl_fiap_spark.sources.pyds import _TickerApiStreamReader, encode_keys

    r = _TickerApiStreamReader({"keys": encode_keys(["XY"]), "days": "5", "chunk": "8"})
    first = [row for p in r.partitions({"day": 0}, {"day": 3}) for row in r.read(p)]
    rest = [row for p in r.partitions({"day": 3}, {"day": 5}) for row in r.read(p)]
    assert len(first) == 3 and len(rest) == 2
    assert not {x[1] for x in first} & {x[1] for x in rest}
