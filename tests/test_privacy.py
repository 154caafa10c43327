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


def test_l_diversity_suppresses_homogeneous_groups(spark):
    from aws_etl_fiap_spark.operators.privacy import l_diversify

    rows = [
        # group A: 3 members, all one segment -> k ok, l=2 violated
        (1, "A", "AUTO"), (2, "A", "AUTO"), (3, "A", "AUTO"),
        # group B: 3 members, 2 segments -> released at k=2, l=2
        (4, "B", "AUTO"), (5, "B", "BIKE"), (6, "B", "AUTO"),
        # group C: 2 distinct segments but only 2 members -> k=3 violated
        (7, "C", "AUTO"), (8, "C", "BIKE"),
    ]
    df = spark.createDataFrame(rows, "id long, grp string, seg string")
    kept = l_diversify(df, ["grp"], "seg", k=2, l=2)
    assert sorted(r["id"] for r in kept.collect()) == [4, 5, 6, 7, 8]
    kept_k3 = l_diversify(df, ["grp"], "seg", k=3, l=2)
    assert sorted(r["id"] for r in kept_k3.collect()) == [4, 5, 6]
    # l=1 degenerates to plain k-anonymity
    kept_l1 = l_diversify(df, ["grp"], "seg", k=2, l=1)
    assert kept_l1.count() == 8


def test_l_diversity_validates_params(spark):
    from aws_etl_fiap_spark.operators.privacy import l_diversify

    df = spark.createDataFrame([(1, "A", "x")], "id long, grp string, seg string")
    with pytest.raises(ValueError):
        l_diversify(df, ["grp"], "seg", k=0, l=2)
    with pytest.raises(ValueError):
        l_diversify(df, ["grp"], "seg", k=2, l=0)


def test_dp_noisy_counts_hand_checked(spark):
    """The seeded Laplace draw is re-derivable in plain Python: md5 grid
    uniform -> inverse CDF -> count + noise, rounded half-up at 6 dp."""
    import hashlib
    import math

    from aws_etl_fiap_spark.operators.privacy import dp_noisy_counts

    rows = [("a",)] * 5 + [("b",)] * 3
    df = spark.createDataFrame(rows, "g string")
    got = {
        r["g"]: r["noisy_count"]
        for r in dp_noisy_counts(df, ["g"], epsilon=2.0, seed="s").collect()
    }
    for g, n in (("a", 5), ("b", 3)):
        h = int(hashlib.md5(f"s:{g}".encode()).hexdigest()[:15], 16)
        u = ((h % 1_000_000) + 0.5) / 1_000_000.0
        c = u - 0.5
        noise = -(1.0 / 2.0) * math.copysign(1.0, c) * math.log(1.0 - 2.0 * abs(c))
        want = math.floor((n + noise) * 1e6 + 0.5) / 1e6
        assert got[g] == want, (g, got[g], want)


def test_dp_noisy_counts_rejects_bad_epsilon(spark):
    import pytest

    from aws_etl_fiap_spark.operators.privacy import dp_noisy_counts

    df = spark.createDataFrame([("a",)], "g string")
    with pytest.raises(ValueError):
        dp_noisy_counts(df, ["g"], epsilon=0.0, seed="s")


def test_t_closeness_releases_global_like_classes_only(spark):
    from aws_etl_fiap_spark.operators.privacy import t_closeness_release

    # Global: 8x v=0, 4x v=1 (N=12).  Class A (4/4, n=8):
    # S = |4*12-8*8| + |4*12-4*8| = 32, dist = 32/(2*8*12) = 1/6.
    # Class B (4/0, n=4): S = |4*12-8*4| + tail 4*(12-8) = 32,
    # dist = 32/(2*4*12) = 1/3.  t=0.2 releases only A.
    rows = [("A", 0)] * 4 + [("A", 1)] * 4 + [("B", 0)] * 4
    df = spark.createDataFrame(rows, "grp string, v int")
    out = t_closeness_release(df, ["grp"], "v", t_num=1, t_den=5).collect()
    assert len(out) == 1 and out[0]["grp"] == "A"
    assert out[0]["n"] == 8 and out[0]["dist"] == 0.166667
    # at t = 0.5 both classes release, with B's exact 1/3 distance
    both = {
        r["grp"]: r["dist"]
        for r in t_closeness_release(df, ["grp"], "v", 1, 2).collect()
    }
    assert both == {"A": 0.166667, "B": 0.333333}


def test_t_closeness_validates_t(spark):
    import pytest

    from aws_etl_fiap_spark.operators.privacy import t_closeness_release

    df = spark.createDataFrame([("A", 1)], "grp string, v int")
    with pytest.raises(ValueError):
        t_closeness_release(df, ["grp"], "v", t_num=1, t_den=0)


def test_dp_noisy_counts_requires_explicit_seed(spark):
    """Round-8 advice: a default public seed makes every release trivially
    denoisable (noise is a deterministic function of seed + group key).
    The seed is keyword-only and has no default."""
    import pytest

    from aws_etl_fiap_spark.operators.privacy import dp_noisy_counts

    df = spark.createDataFrame([("a",)], "g string")
    with pytest.raises(TypeError):
        dp_noisy_counts(df, ["g"], epsilon=1.0)  # no seed -> refuse


def test_privacy_ladder_matches_python_models_property(spark):
    """Property (r10): k-anonymity suppression and distinct l-diversity
    equal their set-algebra definitions on arbitrary tiny tables — NULL
    quasi values form ONE equivalence class (groupBy groups NULLs) and a
    NULL-keyed violating class must be suppressed like any other; NULL
    sensitive values; all-suppressed and none-suppressed corners."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from aws_etl_fiap_spark.operators.privacy import (
        k_anonymize,
        l_diversify,
        t_closeness_release,
    )

    row = st.tuples(
        st.sampled_from(["q1", "q2", None]),     # quasi a
        st.integers(min_value=0, max_value=1),   # quasi b
        st.sampled_from(["s1", "s2", "s3", None]),  # sensitive
    )

    def classes(rows):
        out = {}
        for a, b, s in rows:
            out.setdefault((a, b), []).append(s)
        return out

    @settings(max_examples=6, deadline=None)
    @given(
        st.lists(row, min_size=1, max_size=12),
        st.integers(min_value=1, max_value=3),
        st.integers(min_value=1, max_value=3),
    )
    def prop(rows, k, l):
        df = spark.createDataFrame(rows, "a string, b int, s string")
        cls = classes(rows)

        got_k = sorted(
            ((r.a, r.b, r.s)
             for r in k_anonymize(df, ["a", "b"], k).collect()),
            key=repr)
        want_k = sorted(
            ((a, b, s) for a, b, s in rows if len(cls[(a, b)]) >= k),
            key=repr)
        assert got_k == want_k

        got_l = sorted(
            ((r.a, r.b, r.s)
             for r in l_diversify(df, ["a", "b"], "s", k, l).collect()),
            key=repr)
        # countDistinct skips NULL sensitive values (both engines).
        want_l = sorted(
            ((a, b, s)
             for a, b, s in rows
             if len(cls[(a, b)]) >= k
             and len({x for x in cls[(a, b)] if x is not None}) >= l),
            key=repr)
        assert got_l == want_l

        # t-closeness: NULL is a REAL point of the sensitive distribution
        # (unlike countDistinct above) and NULL quasi keys are real classes
        # — the exact integer release rule, common-denominator form.
        import math
        from collections import Counter

        t_num, t_den = k - 1, 3  # reuse k draw: t in {0, 1/3, 2/3}
        N = len(rows)
        gv = Counter(s for _, _, s in rows)
        want_t = {}
        for (a, b), sens in cls.items():
            n = len(sens)
            cnt = Counter(sens)
            s_int = sum(
                abs(cnt[v] * N - gv[v] * n) for v in cnt
            ) + n * (N - sum(gv[v] for v in cnt))
            if t_den * s_int <= 2 * t_num * n * N:
                dist = math.floor((s_int / (2.0 * n * N)) * 1e6 + 0.5) / 1e6
                want_t[(a, b)] = (n, dist)
        got_t = {
            (r.a, r.b): (r.n, r.dist)
            for r in t_closeness_release(
                df, ["a", "b"], "s", t_num=t_num, t_den=t_den
            ).collect()
        }
        assert got_t == want_t

    prop()


def test_dp_noisy_counts_hash_input_is_injective(spark):
    """r10 review regression: with multiple group columns the hash input
    joined raw values with ':' (and concat_ws SKIPS NULLs), so the distinct
    keys ('x','y:z') / ('x:y','z') — or NULL in either position — drew the
    SAME Laplace noise, and the two published noisy counts revealed their
    exact difference.  The per-column escape must separate all of them,
    stay the identity on clean keys, and keep NULL distinct from the
    literal strings '~n' and ''."""
    from aws_etl_fiap_spark.operators.privacy import dp_noisy_counts

    rows = [
        ("x", "y:z"),
        ("x:y", "z"),
        (None, "x"),
        ("x", None),
        ("~n", "x"),
        ("", "x"),
    ]
    df = spark.createDataFrame(rows, "a string, b string")
    out = {
        (r.a, r.b): r.noisy_count
        for r in dp_noisy_counts(df, ["a", "b"], seed="t").collect()
    }
    assert len(out) == len(rows)
    # Every group has count 1, so equal noise == equal noisy_count; all six
    # draws must be pairwise distinct (md5 collisions aside).
    assert len(set(out.values())) == len(rows)


def test_k_anonymity_report_matches_python_model_property(spark):
    """Property (r10): the one-row release audit equals the Python fold —
    NULL quasi values form one class, all-suppressed corpora report a
    NULL min_kept_group, totals reconcile (suppressed + kept = all)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from aws_etl_fiap_spark.operators.privacy import k_anonymity_report

    row = st.tuples(st.sampled_from(["a", "b", None]), st.integers(0, 1))

    @settings(max_examples=6, deadline=None)
    @given(st.lists(row, min_size=1, max_size=12), st.integers(1, 4))
    def prop(rows, k):
        df = spark.createDataFrame(rows, "a string, b int")
        r = k_anonymity_report(df, ["a", "b"], k).collect()[0]
        cls = {}
        for a, b in rows:
            cls[(a, b)] = cls.get((a, b), 0) + 1
        kept = [n for n in cls.values() if n >= k]
        supp = [n for n in cls.values() if n < k]
        assert (
            r.n_groups, r.n_rows, r.suppressed_groups,
            r.suppressed_rows, r.min_kept_group,
        ) == (
            len(cls), len(rows), len(supp), sum(supp),
            min(kept) if kept else None,
        )

    prop()
