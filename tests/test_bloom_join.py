"""Bloom-prefiltered join (operators/joins.bloom_prefiltered_join):
result-exactness vs the plain join, semantics guards, and the no-shuffle
prefilter plan shape."""

import re

import pyspark.sql.functions as F
import pytest

from aws_etl_fiap_spark.operators.joins import bloom_prefiltered_join
from aws_etl_fiap_spark.sources.readers import load_table


def _rows(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


def _sides(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    sel = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_orderkey") % 5 == 0)
        )
        .select(F.col("o_orderkey").alias("l_orderkey"), "o_totalprice")
    )
    return li, sel


def test_equals_plain_inner_join(spark, sf_smoke):
    li, sel = _sides(spark, sf_smoke)
    got = bloom_prefiltered_join(li, sel, ["l_orderkey"], n_bits=1 << 14)
    want = li.join(sel, ["l_orderkey"], "inner")
    assert _rows(got) == _rows(want)


def test_equals_plain_left_semi(spark, sf_smoke):
    li, sel = _sides(spark, sf_smoke)
    got = bloom_prefiltered_join(
        li, sel, ["l_orderkey"], how="left_semi", n_bits=1 << 14
    )
    want = li.join(sel, ["l_orderkey"], "left_semi")
    assert _rows(got) == _rows(want)


def test_tiny_filter_still_exact(spark, sf_smoke):
    # A saturated bitmap (tiny n_bits) passes nearly everything — the
    # real join must still remove every false positive.
    li, sel = _sides(spark, sf_smoke)
    got = bloom_prefiltered_join(li, sel, ["l_orderkey"], n_bits=64)
    want = li.join(sel, ["l_orderkey"], "inner")
    assert _rows(got) == _rows(want)


def test_outer_joins_refused(spark, sf_smoke):
    # A bloom prefilter DROPS probe rows; for left/full-outer joins those
    # rows must survive with NULLs, so prefiltering would be wrong.
    li, sel = _sides(spark, sf_smoke)
    with pytest.raises(ValueError, match="inner/left_semi"):
        bloom_prefiltered_join(li, sel, ["l_orderkey"], how="left")


def test_composite_key(spark, sf_smoke):
    li = load_table(spark, sf_smoke, "lineitem")
    sel = (
        li.filter(F.col("l_quantity") > 45)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    got = bloom_prefiltered_join(
        li, sel, ["l_orderkey", "l_partkey"], n_bits=1 << 14
    )
    want = li.join(sel, ["l_orderkey", "l_partkey"], "inner")
    assert _rows(got) == _rows(want)


def test_prefilter_plan_is_broadcast_only(spark, sf_smoke):
    """The membership test adds NO shuffle to the probe side: every bloom
    word join is a BroadcastHashJoin, and the only hash/range exchanges in
    the whole plan belong to the final join/aggregate — never between the
    probe scan and the bloom filter."""
    li, sel = _sides(spark, sf_smoke)
    j = bloom_prefiltered_join(li, sel, ["l_orderkey"], n_bits=1 << 14)
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 3  # one per hash at minimum
    # walk the plan: the lineitem scan section up to the first bloom join
    # must contain no exchange other than broadcast
    probe_shuffles = re.findall(
        r"Exchange (?:hash|range)partitioning", plan
    )
    # final inner join may shuffle both sides; the prefilter itself none.
    # 3 word joins + 1 final join: allow at most the final join's 2.
    assert len(probe_shuffles) <= 2, plan


def test_bloom_prefiltered_join_equals_plain_join_property(spark):
    """Property (r10): the Bloom-prefiltered join is EXACTLY the plain
    join for arbitrary key distributions — NULL probe/build keys (never
    match, must not crash the filter), empty build sides, duplicate keys
    on both sides, and a width small enough to force false positives
    (which the real join must then remove)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from aws_etl_fiap_spark.operators.joins import bloom_prefiltered_join

    key = st.one_of(st.none(), st.integers(1, 6))

    @settings(max_examples=6, deadline=None)
    @given(
        st.lists(key, min_size=1, max_size=10),
        st.lists(key, min_size=0, max_size=6),
        st.sampled_from(["inner", "left_semi"]),
    )
    def prop(probe_keys, build_keys, how):
        probe = spark.createDataFrame(
            [(k, i) for i, k in enumerate(probe_keys)], "k int, pv int"
        )
        build = spark.createDataFrame(
            [(k, 10 + i) for i, k in enumerate(build_keys)] or [],
            "k int, bv int",
        )
        got = sorted(
            map(tuple, bloom_prefiltered_join(
                probe, build, ["k"], how=how, n_bits=64, n_hashes=2
            ).collect()),
            key=repr,
        )
        want = sorted(
            map(tuple, probe.join(build, ["k"], how).collect()), key=repr
        )
        assert got == want

    prop()
