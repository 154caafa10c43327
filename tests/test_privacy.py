"""k-anonymity operators (operators/privacy.py): guarantee, report math,
and the broadcast-anti-join plan shape."""

import pyspark.sql.functions as F
import pytest

from aws_etl_fiap_spark.operators.privacy import (
    generalize_band,
    k_anonymity_report,
    k_anonymize,
)
from aws_etl_fiap_spark.sources.readers import load_table

QUASI = ["c_nationkey", "c_mktsegment", "bal_band"]


def _banded(spark, sf_dir):
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment",
        generalize_band("c_acctbal", 2000.0).alias("bal_band"),
    )


def test_every_released_group_has_k_members(spark, sf_smoke):
    cust = _banded(spark, sf_smoke)
    released = k_anonymize(cust, QUASI, 2)
    sizes = [
        r["n"]
        for r in released.groupBy(*QUASI)
        .agg(F.count("*").alias("n"))
        .collect()
    ]
    assert sizes and min(sizes) >= 2, min(sizes, default=None)
    # an unsatisfiable k suppresses the whole release, never errors
    assert k_anonymize(cust, QUASI, 10**6).count() == 0


def test_suppression_is_exactly_the_small_groups(spark, sf_smoke):
    cust = _banded(spark, sf_smoke)
    k = 3
    released = k_anonymize(cust, QUASI, k)
    w = {
        tuple(r[c] for c in QUASI)
        for r in cust.groupBy(*QUASI)
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= k)
        .collect()
    }
    got_rows = released.count()
    want_rows = cust.join(
        cust.groupBy(*QUASI).agg(F.count("*").alias("n")).filter(
            F.col("n") >= k
        ).select(*QUASI),
        QUASI,
    ).count()
    assert got_rows == want_rows
    got_groups = {
        tuple(r[c] for c in QUASI)
        for r in released.select(*QUASI).distinct().collect()
    }
    assert got_groups == w


def test_report_accounts_for_everything(spark, sf_smoke):
    cust = _banded(spark, sf_smoke)
    k = 4
    (rep,) = k_anonymity_report(cust, QUASI, k).collect()
    assert rep["n_rows"] == cust.count()
    assert rep["suppressed_rows"] == cust.count() - k_anonymize(
        cust, QUASI, k
    ).count()
    assert rep["min_kept_group"] is None or rep["min_kept_group"] >= k


def test_k_below_one_rejected(spark, sf_smoke):
    with pytest.raises(ValueError, match="k must be"):
        k_anonymize(_banded(spark, sf_smoke), QUASI, 0)


def test_band_edges_and_negatives():
    # floor semantics: negatives band DOWN (-1 -> -2000), edges stay put
    import math

    for v, want in ((0.0, 0.0), (1999.99, 0.0), (2000.0, 2000.0),
                    (-0.01, -2000.0), (-2000.0, -2000.0)):
        assert math.floor(v / 2000.0) * 2000.0 == want


def test_suppression_join_broadcasts_violators(spark, sf_smoke):
    cust = _banded(spark, sf_smoke)
    plan = (
        k_anonymize(cust, QUASI, 2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
