"""Spark 4 Python DataSource twin of the ingest layer (reference S1,
b3_collector.py:56-112).

``ingest.collect_keys`` re-expresses the reference's driver-side per-ticker
fetch loop as a distributed ``mapInPandas`` fan-out; this module lifts the
same contract one level further, into the first-class Spark 4 **Python
DataSource API** (`pyspark.sql.datasource`): the external feed becomes
``spark.read.format("ticker_api").option(...)`` with real partition planning
— one :class:`InputPartition` per key chunk, fetched ON EXECUTORS — instead
of an ad-hoc keys-frame trick.  Why this matters at 100 TB:

- partition planning is explicit and source-owned: 10 000 keys become
  ``ceil(10000/chunk)`` independent input partitions the scheduler
  distributes like any other scan, with no driver-side probe fetch and no
  synthetic keys DataFrame to repartition;
- the source composes with the rest of the reader stack (``.schema()``,
  ``.load()``, catalog registration) exactly like the built-in formats, so
  downstream pipelines cannot tell the feed is Python-backed;
- rows yielded as tuples are Arrow-batched by the harness (same transport
  class as mapInPandas — never row-at-a-time py4j).

The fetch itself stays deterministic and offline (this container has no
network): the per-key series is derived from the key's character sum, the
same fixture family as ``ingest.fixture_fetcher``, and simple enough that a
DuckDB oracle reproduces it exactly in SQL (queries/pyds_q.py).
"""

from __future__ import annotations

import json
from collections.abc import Iterator, Sequence
from datetime import date, timedelta

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

FORMAT_NAME = "ticker_api"
SCHEMA_DDL = "ticker string, day date, close double, volume bigint"
_BASE_DAY = date(2024, 1, 1)


def encode_keys(keys: Sequence[str]) -> str:
    """Lossless key-list transport for the ``keys`` option: a JSON array.

    DataSource options are flat strings; the original comma-joined form
    silently SPLIT any key containing ``,`` (round-4 advice).  JSON escapes
    every delimiter, so arbitrary keys round-trip byte-exactly."""
    return json.dumps(list(keys))


def decode_keys(raw: str) -> list[str]:
    """Inverse of :func:`encode_keys`, with a legacy comma-list fallback.

    JSON form (leading ``[``) is authoritative and lossless.  A bare comma
    list is still accepted for hand-written options, but any non-string
    JSON payload or malformed array raises instead of guessing."""
    raw = raw.strip()
    if raw.startswith("["):
        keys = json.loads(raw)
        if not isinstance(keys, list) or not all(isinstance(k, str) for k in keys):
            raise ValueError("ticker_api 'keys' JSON must be an array of strings")
        return keys
    return [k for k in raw.split(",") if k]


def series_row(key: str, i: int) -> tuple[str, date, float, int]:
    """Deterministic fake quote ``i`` for ``key`` — pure arithmetic on the
    key's character sum so the DuckDB oracle can recompute it in SQL
    (ascii-sum + modular congruences; no floats until the final scale)."""
    seed = sum(ord(c) for c in key)
    close = (2000 + (seed % 80) * 100 + ((seed * (i + 3)) % 17) * 25) / 100.0
    volume = 1000 * ((seed + i * 7) % 97 + 1)
    return key, _BASE_DAY + timedelta(days=i), close, volume


class _TickerApiReader(DataSourceReader):
    """Batch reader: key list -> chunked input partitions -> executor fetch."""

    def __init__(self, options: dict) -> None:
        keys = decode_keys(options.get("keys") or "")
        if not keys:
            raise ValueError(
                "ticker_api requires .option('keys', encode_keys([...]))"
            )
        self._keys = keys
        self._days = int(options.get("days", 5))
        self._chunk = max(1, int(options.get("chunk", 16)))

    def partitions(self) -> Sequence[InputPartition]:
        return [
            InputPartition((self._keys[i : i + self._chunk], self._days))
            for i in range(0, len(self._keys), self._chunk)
        ]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        keys, days = partition.value
        for key in keys:
            for i in range(days):
                yield series_row(key, i)


class TickerApiDataSource(DataSource):
    """``spark.read.format("ticker_api")`` — options: ``keys`` (JSON array
    via :func:`encode_keys`; bare comma list accepted for comma-free keys),
    ``days`` (rows per key, default 5), ``chunk`` (keys per input partition,
    default 16)."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> _TickerApiReader:
        return _TickerApiReader(self.options)

    def streamReader(self, schema: StructType) -> "_TickerApiStreamReader":
        return _TickerApiStreamReader(self.options)


class _TickerApiStreamReader(DataSourceStreamReader):
    """Streaming twin of the batch reader (Spark 4 Python streaming
    DataSource): the day index is the source OFFSET, so micro-batch N covers
    day range [start.day, end.day) for every key — each batch is planned
    into the same chunked executor partitions as the batch scan, and the
    (offset, commit) contract gives the engine exactly-once bookkeeping
    through its checkpoint like any built-in source.

    ``days`` bounds the feed (latestOffset parks there), so an
    ``availableNow`` verification run drains the whole series
    deterministically; a live deployment would instead advance
    latestOffset() per poll.  The rows for a given (key, day) are the SAME
    ``series_row`` arithmetic the batch reader and the DuckDB oracle use —
    stream and batch must agree bit-for-bit.
    """

    def __init__(self, options: dict) -> None:
        keys = decode_keys(options.get("keys") or "")
        if not keys:
            raise ValueError(
                "ticker_api requires .option('keys', encode_keys([...]))"
            )
        self._keys = keys
        self._days = int(options.get("days", 5))
        self._chunk = max(1, int(options.get("chunk", 16)))

    def initialOffset(self) -> dict:
        return {"day": 0}

    def latestOffset(self) -> dict:
        return {"day": self._days}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        lo, hi = int(start["day"]), int(end["day"])
        return [
            InputPartition((self._keys[i : i + self._chunk], lo, hi))
            for i in range(0, len(self._keys), self._chunk)
        ]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        keys, lo, hi = partition.value
        for key in keys:
            for i in range(lo, hi):
                yield series_row(key, i)

    def commit(self, end: dict) -> None:
        # Nothing external to clean up: the fixture feed is arithmetic.
        pass


def register(spark: SparkSession) -> None:
    """Idempotent format registration on the shared session."""
    spark.dataSource.register(TickerApiDataSource)
