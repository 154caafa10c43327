"""Unit tests for the reference's column-op quirks (SURVEY §2.2) that the
oracle queries only exercise indirectly: defensive renames, hyphenated
identifier survival, and null-filter count accounting."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_etl_fiap_spark.operators.cleaning import filter_nulls_with_counts
from aws_etl_fiap_spark.operators.columns import (
    add_processing_date,
    normalize_column_names,
    rename_date_fallback,
)


def test_normalize_produces_hyphenated_names(spark):
    df = spark.createDataFrame([(1.0, 2.0)], ["Stock Splits", "Close"])
    out = normalize_column_names(df)
    assert out.columns == ["stock-splits", "close"]
    # Hyphenated names must survive SQL via backticks (reference quirk,
    # b3_collector.py:78 + :202).
    out.createOrReplaceTempView("norm_test")
    assert spark.sql("SELECT `stock-splits` FROM norm_test").collect()[0][0] == 1.0


def test_rename_date_fallback_priority_and_noop(spark):
    df = spark.createDataFrame([(1, 2)], ["datetime", "timestamp"])
    assert rename_date_fallback(df).columns == ["date", "timestamp"]
    has_date = spark.createDataFrame([(1, 2)], ["date", "datetime"])
    assert rename_date_fallback(has_date).columns == ["date", "datetime"]
    no_candidates = spark.createDataFrame([(1,)], ["other"])
    assert rename_date_fallback(no_candidates).columns == ["other"]


def test_processing_date_format(spark):
    out = add_processing_date(spark.range(1))
    val = out.select("dataproc").first()[0]
    assert len(val) == 8 and val.isdigit()  # yyyyMMdd string partition key


def test_filter_nulls_with_counts_accounting(spark):
    df = spark.createDataFrame(
        [(1, "a"), (None, "b"), (3, None), (None, None)], "k int, v string"
    )
    out, before, after = filter_nulls_with_counts(df, ["k", "v"])
    assert (before, after) == (4, 1)
    assert out.collect() == [out.sparkSession.createDataFrame([(1, "a")], "k int, v string").collect()[0]]
    assert df.count() - out.count() == 3


def test_window_helpers_and_count_delta(spark):
    """Direct coverage for the small window helpers (top_n_per_group,
    rolling_agg) and the reference-A4 count_delta accounting — these back
    the registered queries' inline forms; pin them on crafted rows so the
    helpers stay first-class operators rather than drifting."""
    from aws_etl_fiap_spark.operators.aggregates import count_delta
    from aws_etl_fiap_spark.operators.windows import rolling_agg, top_n_per_group
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 30.0),
         ("b", 1, 5.0), ("b", 2, 7.0)],
        "g string, i int, v double",
    )
    top = top_n_per_group(df, ["g"], ["i"], 2)
    assert sorted((r.g, r.i) for r in top.collect()) == [
        ("a", 1), ("a", 2), ("b", 1), ("b", 2)
    ]
    assert "__rn" not in top.columns

    rolled = rolling_agg(df, "v", ["g"], ["i"], window_rows=2, out="ma")
    got = {(r.g, r.i): r.ma for r in rolled.collect()}
    assert got == {("a", 1): 10.0, ("a", 2): 15.0, ("a", 3): 25.0,
                   ("b", 1): 5.0, ("b", 2): 6.0}

    before, after, removed = count_delta(df, df.filter(F.col("g") == "a"))
    assert (before, after, removed) == (5, 3, 2)
