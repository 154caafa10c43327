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
