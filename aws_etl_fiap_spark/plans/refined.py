"""The flagship plan: the reference's whole refined pipeline as one lazy
DataFrame program.

Reference lifecycle (EP2, src/glue/b3_transform.py:202-383):
    scan raw parquet -> null-filter (P1) -> to_date + year/month (P2/P3)
    -> renames (P4) -> per-ticker date-ordered lag(7)/lag(30) pct-change
    (W1/P9/P10) -> groupBy (ticker, year, month) summary (A1) -> orderBy (O1).

Here the same program runs over any "series-shaped" table: a key column, an
event-time column, a price-like value and a volume-like value. On the driver
testdata the analog is lineitem: key = l_suppkey, time = l_shipdate,
price = l_extendedprice, volume = l_quantity.

Execution shape (why this scales where the reference didn't):
- ONE window exchange (hash by key) shared by both lags, then ONE aggregation
  exchange on (key, year, month) — AQE coalesces both post-shuffle.
- The reference ran >=9 actions over an uncached lineage (up to 9x recompute,
  b3_transform.py:128-352); this plan is a single lazy expression — the caller
  decides when (and how often) to materialize.
- Tiebreaker columns make the within-key order total, so lag values are
  deterministic and oracle-verifiable.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from aws_etl_fiap_spark.operators.aggregates import monthly_summary
from aws_etl_fiap_spark.operators.cleaning import filter_nulls
from aws_etl_fiap_spark.operators.columns import add_date_parts, cast_to_date, rename_columns
from aws_etl_fiap_spark.operators.windows import lag_pct_change


@dataclass(frozen=True)
class SeriesSpec:
    """Column mapping for a series-shaped table."""

    key: str
    time: str
    price: str
    volume: str
    tiebreakers: tuple[str, ...] = field(default_factory=tuple)


LINEITEM_SPEC = SeriesSpec(
    key="l_suppkey",
    time="l_shipdate",
    price="l_extendedprice",
    volume="l_quantity",
    tiebreakers=("l_orderkey", "l_linenumber"),
)


def refined_detail(df: DataFrame, spec: SeriesSpec, extra_cols: tuple[str, ...] = ()) -> DataFrame:
    """Stages 1-4 of EP2: the row-level "refined" table with pct-change cols.

    Output columns: key, date, year, month, preco_fechamento,
    volume_negociado, <price>_{7,30}_back, variacao_{7,30}d (+ tiebreakers
    and any ``extra_cols`` passed through, e.g. a partition column).
    """
    df = filter_nulls(df, [spec.key, spec.time, spec.price, spec.volume])
    df = cast_to_date(df, spec.time, out="date")
    df = add_date_parts(df, "date")
    df = rename_columns(df, {spec.price: "preco_fechamento", spec.volume: "volume_negociado"})
    df = lag_pct_change(
        df,
        "preco_fechamento",
        partition_by=[spec.key],
        order_by=["date", *spec.tiebreakers],
        offsets=(7, 30),
        prev_tpl="preco_{n}d_atras",
        pct_tpl="variacao_{n}d",
    )
    return df.select(
        spec.key,
        "date",
        "year",
        "month",
        "preco_fechamento",
        "volume_negociado",
        "preco_7d_atras",
        "preco_30d_atras",
        "variacao_7d",
        "variacao_30d",
        *spec.tiebreakers,
        *extra_cols,
    )


def refined_summary(df: DataFrame, spec: SeriesSpec) -> DataFrame:
    """Stage 5 of EP2 (requirement A): monthly per-key summary over the
    refined detail, ordered by (key, year, month)."""
    detail = refined_detail(df, spec)
    return monthly_summary(
        detail,
        keys=[spec.key, "year", "month"],
        price_col="preco_fechamento",
        volume_col="volume_negociado",
        pct7_col="variacao_7d",
        pct30_col="variacao_30d",
    )
