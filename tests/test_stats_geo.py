"""Property tests for the batch-8/9/10 operators: the geo blocking join
must equal brute force on adversarial point sets (boundary cells), the
k-means trajectory must be partition-count invariant (the exactness claims
are about ORDER-independence — this is the direct falsifier), and the
trailing z-score must be leakage-free (current row excluded from its own
baseline)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from aws_etl_fiap_spark.operators.geo import grid_radius_pairs, synth_points
from aws_etl_fiap_spark.operators.similarity import kmeans_lloyd
from aws_etl_fiap_spark.operators.stats import (
    mad_outliers,
    modal_value,
    trailing_zscore,
)
from aws_etl_fiap_spark.sources.readers import load_table


def test_grid_radius_pairs_equals_bruteforce_including_boundaries(spark):
    """Points planted ON cell boundaries (x = multiples of the radius) and
    just inside/outside the radius: the blocking join must reproduce the
    exact brute-force pair set — a missed neighbor cell or an off-by-one
    in the 3x3 fanout shows up here."""
    pts = [
        # a cross of boundary-sitters around the (10, 10) cell corner
        (1, 50.0, 50.0),
        (2, 55.0, 50.0),   # exactly radius away (<= keeps it)
        (3, 50.0, 55.0),
        (4, 54.9, 50.0),
        (5, 45.1, 50.0),
        (6, 50.0, 44.9),
        (7, 57.6, 50.0),   # > radius from 1, < radius from 2
        (8, 0.0, 0.0),     # plane corner
        (9, 4.0, 3.0),     # 5.0 exactly from corner (3-4-5)
        (10, 999.9, 999.9),
    ]
    df = spark.createDataFrame(pts, "id long, x double, y double")
    got = {
        (r.id_a, r.id_b)
        for r in grid_radius_pairs(df, radius_km=5.0).collect()
    }
    want = set()
    for i, (ia, xa, ya) in enumerate(pts):
        for ib, xb, yb in pts[i + 1 :]:
            if (xa - xb) ** 2 + (ya - yb) ** 2 <= 25.0:
                want.add((min(ia, ib), max(ia, ib)))
    assert got == want


def test_synth_points_positions_are_stable_3dp(spark, sf_correctness):
    """Synthesized coordinates are exact milli-km grid positions in
    [0, 1000) — the parity precondition for the IEEE distance claims."""
    cust = load_table(spark, sf_correctness, "customer").select("c_custkey")
    rows = synth_points(cust, "c_custkey").limit(200).collect()
    for r in rows:
        for v in (r.x, r.y):
            assert 0.0 <= v < 1000.0
            assert v == round(v * 1000.0) / 1000.0


def test_kmeans_lloyd_partition_count_invariant(spark, sf_correctness):
    """The exactness argument is order-independence (decimal sums,
    MIN-struct argmin): re-partitioning the input must not move a single
    member or an inertia bit."""
    emb = load_table(spark, sf_correctness, "embeddings")
    a = {
        r.cluster_id: (r.n_members, r.inertia)
        for r in kmeans_lloyd(emb, k=4, iters=1).collect()
    }
    b = {
        r.cluster_id: (r.n_members, r.inertia)
        for r in kmeans_lloyd(emb.repartition(7), k=4, iters=1).collect()
    }
    assert a == b
    assert sum(n for n, _ in a.values()) == emb.count()


def test_trailing_zscore_excludes_current_row(spark):
    """A flat baseline followed by a spike: the spike's own value must not
    contaminate its baseline (variance 0 -> NULL z under try_divide), and
    the row AFTER the spike must see the spike in ITS baseline."""
    days = [(f"2024-01-{d:02d}", 100.0) for d in range(1, 9)]
    days.append(("2024-01-09", 1000.0))
    days.append(("2024-01-10", 100.0))
    df = spark.createDataFrame(days, "day string, total double").select(
        F.col("day").cast("date").alias("day"), "total"
    )
    rows = {
        str(r.day): r
        for r in trailing_zscore(df, "day", "total", n_rows=7, min_n=3).collect()
    }
    spike = rows["2024-01-09"]
    assert spike.z_score is None  # zero-variance baseline, spike excluded
    after = rows["2024-01-10"]
    assert after.n_baseline == 7
    assert after.z_score is not None and after.z_score < 0  # spike inflated mean
    assert rows["2024-01-02"].z_score is None  # < min_n baseline rows


def test_mad_outliers_invariants(spark, sf_correctness):
    """MAD >= 0, outliers <= rows, and a constant group has MAD 0 with no
    outliers."""
    ev = load_table(spark, sf_correctness, "events").select("event_type", "value")
    const = spark.createDataFrame(
        [("const", 7.0)] * 50, "event_type string, value double"
    )
    out = {
        r.event_type: r
        for r in mad_outliers(ev.unionByName(const), "event_type", "value").collect()
    }
    for r in out.values():
        assert r.mad >= 0.0
        assert 0 <= r.n_outliers <= r.n_rows
    assert out["const"].mad == 0.0
    assert out["const"].n_outliers == 0


def test_modal_value_tiebreak_is_smallest(spark):
    pdf = pd.DataFrame({"g": ["a"] * 4, "v": [3, 3, 1, 1]})
    df = spark.createDataFrame(pdf)
    row = modal_value(df, "g", "v").collect()[0]
    assert (row.mode, row.n_mode) == (1, 2)


def test_psi_drift_hand_checked(spark):
    """Two bins, known counts: psi terms match the closed form (Laplace
    add-one over the FULL bin count, including never-populated bins)."""
    import math

    from pyspark.sql import functions as F

    from aws_etl_fiap_spark.operators.stats import psi_drift

    rows = [(1.0, 0)] * 8 + [(9.0, 0)] * 2 + [(1.0, 1)] * 4 + [(9.0, 1)] * 6
    df = spark.createDataFrame(rows, "value double, period int")
    out = psi_drift(df, "value", F.col("period") == 1, (5.0,))
    got = {r["bin"]: r for r in out.collect()}
    assert got[0]["base_cnt"] == 8 and got[0]["cur_cnt"] == 4
    n_bins = 2
    pb, pc = (8 + 1) / (10 + n_bins), (4 + 1) / (10 + n_bins)
    assert abs(got[0]["psi_term"] - (pb - pc) * math.log(pb / pc)) < 1e-12
    assert got[1]["base_cnt"] == 2 and got[1]["cur_cnt"] == 6
    total_psi = sum(r["psi_term"] for r in got.values())
    assert total_psi > 0


def test_bigram_lm_nll_hand_checked(spark):
    """Tiny corpus where every probability is a known ratio: seen bigrams
    score c_ab/c_w1, pruned ones take the 0.4-backoff path."""
    import math

    from aws_etl_fiap_spark.operators.text import bigram_lm_nll

    # 'a b' twice (seen, passes floor 2); 'b a' once (pruned -> backoff).
    docs = [(1, "a b"), (2, "a b"), (3, "b a")]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = {r["doc_id"]: r for r in bigram_lm_nll(df).collect()}
    # unigrams: a=3, b=3, N=6; bigram 'a b' c=2.
    p_ab = 2 / 3  # c(a,b)/c(a)
    assert abs(got[1]["avg_nll"] - (-math.log(p_ab))) < 1e-12
    assert got[1]["n_bigrams"] == 1
    p_backoff = 0.4 * 3 / 6  # 0.4 * c(a)/N
    assert abs(got[3]["avg_nll"] - (-math.log(p_backoff))) < 1e-12


def test_kn_bigram_nll_hand_checked(spark):
    """Tiny corpus where every KN term is a known ratio: a kept bigram gets
    discounted mass + continuation, a pruned one continuation only."""
    import math

    from aws_etl_fiap_spark.operators.text import kn_bigram_nll

    # bigram instances: 'a b' x2 (kept, floor 2), 'b a' x1 (pruned).
    docs = [(1, "a b"), (2, "a b"), (3, "b a")]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = {r["doc_id"]: r for r in kn_bigram_nll(df).collect()}
    # types: (a,b) c=2, (b,a) c=1 -> B=2; c_ctx(a)=2, c_ctx(b)=1;
    # N1+(a,.)=1, N1+(b,.)=1; N1+(.,b)=1, N1+(.,a)=1.
    d = 0.75
    p_ab = (2 - d) / 2 + (d * 1 / 2) * (1 / 2)  # seen + continuation
    assert got[1]["n_bigrams"] == 1
    assert abs(got[1]["avg_nll"] - (-math.log(p_ab))) < 1e-12
    p_ba = 0.0 + (d * 1 / 1) * (1 / 2)  # pruned -> continuation only
    assert abs(got[3]["avg_nll"] - (-math.log(p_ba))) < 1e-12


def test_spearman_perfect_monotone_and_reverse(spark):
    from aws_etl_fiap_spark.operators.stats import spearman_rho

    up = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 35), (4, 70)], "x long, y long"
    )
    assert spearman_rho(up, "x", "y").collect()[0]["rho"] == 1.0
    down = spark.createDataFrame(
        [(1, 70), (2, 35), (3, 20), (4, 10)], "x long, y long"
    )
    assert spearman_rho(down, "x", "y").collect()[0]["rho"] == -1.0


def test_spearman_ties_match_scipy_definition(spark):
    from aws_etl_fiap_spark.operators.stats import spearman_rho

    # x: [1,2,2,3], y: [1,3,2,4] -> avg ranks x: [1, 2.5, 2.5, 4],
    # y: [1,3,2,4]; Pearson of ranks = 0.9486832980505138 -> 6dp half-up.
    df = spark.createDataFrame(
        [(1, 1), (2, 3), (2, 2), (3, 4)], "x long, y long"
    )
    out = spearman_rho(df, "x", "y").collect()[0]
    assert out["rho"] == 0.948683
    assert out["n"] == 4


def test_spearman_constant_column_is_null(spark):
    from aws_etl_fiap_spark.operators.stats import spearman_rho

    df = spark.createDataFrame([(1, 5), (2, 5), (3, 5)], "x long, y long")
    assert spearman_rho(df, "x", "y").collect()[0]["rho"] is None


def test_gini_known_values(spark):
    from aws_etl_fiap_spark.operators.stats import gini_by_group

    df = spark.createDataFrame(
        [("eq", 5.0), ("eq", 5.0), ("eq", 5.0), ("eq", 5.0)]
        + [("skew", 0.0), ("skew", 0.0), ("skew", 0.0), ("skew", 10.0)],
        "grp string, v double",
    )
    out = {r["grp"]: r for r in gini_by_group(df, "grp", "v").collect()}
    # perfectly equal -> G = 0
    assert out["eq"]["gini"] == 0.0
    # one member holds everything: G = (n-1)/n = 0.75 under average ranks
    assert out["skew"]["gini"] == 0.75
    assert out["eq"]["n"] == out["skew"]["n"] == 4


def test_gini_zero_total_is_null_and_ties_average(spark):
    from aws_etl_fiap_spark.operators.stats import gini_by_group

    df = spark.createDataFrame(
        [("z", 0.0), ("z", 0.0)] + [("t", 1.0), ("t", 1.0), ("t", 2.0)],
        "grp string, v double",
    )
    out = {r["grp"]: r["gini"] for r in gini_by_group(df, "grp", "v").collect()}
    assert out["z"] is None
    # hand: x=[1,1,2] cents [100,100,200]; doubled avg ranks: ties at 100
    # -> r2=3 both, 200 -> r2=6.  srx = 300+300+1200 = 1800; sx = 400;
    # n=3.  G = (1800 - 4*400) / (3*400) = 200/1200 = 1/6 — which matches
    # the mean-absolute-difference definition: MAD/(2*mean) = (4/9)/(8/3).
    assert out["t"] == 0.166667


def test_psi_drift_null_predicate_is_total(spark):
    """Round-8 advice: a NULL is_current predicate (null timestamp) used
    to vanish from BOTH periods' counts silently.  Default policy raises
    in-plan; explicit on_null buckets the rows."""
    import pytest
    from pyspark.sql import functions as F
    from pyspark.sql.utils import AnalysisException

    from aws_etl_fiap_spark.operators.stats import psi_drift

    rows = [(1.0, 0), (9.0, 1), (1.0, None), (9.0, None)]
    df = spark.createDataFrame(rows, "value double, period int")
    pred = F.col("period") == 1  # NULL period -> NULL predicate

    with pytest.raises(Exception, match="psi_drift: is_current"):
        psi_drift(df, "value", pred, (5.0,)).collect()

    base = {
        r["bin"]: r for r in psi_drift(df, "value", pred, (5.0,), on_null=False).collect()
    }
    assert base[0]["base_cnt"] == 2 and base[0]["cur_cnt"] == 0
    assert base[1]["base_cnt"] == 1 and base[1]["cur_cnt"] == 1

    cur = {
        r["bin"]: r for r in psi_drift(df, "value", pred, (5.0,), on_null=True).collect()
    }
    assert cur[0]["base_cnt"] == 1 and cur[0]["cur_cnt"] == 1
    assert cur[1]["base_cnt"] == 0 and cur[1]["cur_cnt"] == 2

    with pytest.raises(ValueError):
        psi_drift(df, "value", pred, (5.0,), on_null="bogus")


def test_psi_gates_agree_with_oracle_on_null_ts_corpus(spark, tmp_path):
    """Late-r9 review regression: the BATCH gate inherited psi_drift's
    on_null='raise' default (crashing where its oracle still answers) and
    the STREAMING twin's inlined predicate silently dropped NULL-ts rows
    from both periods.  Both gates now bucket NULL ts into BASELINE via
    the shared stats.psi_period_assignment, exactly like the oracle's
    CASE ... ELSE 0 END — proven here on a corpus that actually contains
    NULL timestamps, with string-exact three-way agreement."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from aws_etl_fiap_spark.queries.quality_q import (
        PSI_ORACLE,
        dq_psi_value_drift,
    )
    from aws_etl_fiap_spark.queries.streaming_q import stream_psi_drift_equiv

    src = pq.read_table("/root/testdata/sf0.001/events.parquet")
    nulls = pa.table(
        {
            "event_id": pa.array([10**9, 10**9 + 1], pa.int64()),
            "ts": pa.array([None, None], src.schema.field("ts").type),
            "user_id": pa.array([1, 2], pa.int64()),
            "event_type": pa.array(["view", "click"]),
            # one value per side of a bin edge so the NULL rows move counts
            "value": pa.array([3.0, 150.0], pa.float64()),
            "props": pa.array(["{}", "{}"]),
        }
    ).cast(src.schema)
    pq.write_table(pa.concat_tables([src, nulls]), str(tmp_path / "events.parquet"))

    def norm(rows, cols):
        order = sorted(range(len(cols)), key=lambda i: cols[i])
        return sorted(tuple(str(r[i]) for i in order) for r in rows)

    batch = dq_psi_value_drift(spark, str(tmp_path))
    got_batch = norm(batch.collect(), batch.columns)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')"
    )
    res = con.execute(PSI_ORACLE)
    want = norm(res.fetchall(), [d[0] for d in res.description])
    assert got_batch == want

    streamed = stream_psi_drift_equiv(spark, str(tmp_path))
    assert norm(streamed.collect(), streamed.columns) == want


def test_gini_by_group_matches_python_model_property(spark):
    """Property (r10): the tie-aware doubled-rank Gini equals the textbook
    tie-aware formula on arbitrary non-negative values — all-equal groups
    (G=0), single-row groups, zero-total groups (NULL), heavy ties, and
    NULL VALUES (complete-case since late r10: excluded from n and the
    moments — the engines rank NULLs on opposite ends, so any other
    semantics cannot be cross-engine exact)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from aws_etl_fiap_spark.operators.stats import gini_by_group

    val = st.one_of(
        st.none(),
        st.integers(min_value=0, max_value=50).map(lambda c: c / 2.0),
    )

    def model(vals):
        vals = [v for v in vals if v is not None]
        if not vals:
            return None
        n = len(vals)
        cents = [int(v * 100 + 0.5) for v in vals]
        sx = sum(cents)
        if sx == 0:
            return (n, None)
        # doubled tie-aware average ranks over the sorted distinct grid
        from collections import Counter

        cnt = Counter(cents)
        r2 = {}
        cum = 0
        for x in sorted(cnt):
            c = cnt[x]
            r2[x] = 2 * cum + c + 1
            cum += c
        srx = sum(r2[x] * x for x in cents)
        g = (srx - (n + 1.0) * sx) / (n * float(sx))
        import math

        return (n, math.floor(g * 1e6 + 0.5) / 1e6)

    @settings(max_examples=6, deadline=None)
    @given(
        st.dictionaries(
            st.sampled_from(["g1", "g2", "g3"]),
            st.lists(val, min_size=1, max_size=12),
            min_size=1,
            max_size=3,
        )
    )
    def prop(groups):
        rows = [(g, v) for g, vs in groups.items() for v in vs]
        df = spark.createDataFrame(rows, "grp string, x double")
        got = {
            r["grp"]: (r["n"], r["gini"])
            for r in gini_by_group(df, "grp", "x").collect()
        }
        want = {g: model(vs) for g, vs in groups.items()}
        # an all-NULL group has no complete-case rows at all -> absent
        want = {g: m for g, m in want.items() if m is not None}
        assert got == want

    prop()


def test_grid_radius_pairs_matches_bruteforce_property(spark):
    """Property (r10): 3x3 grid-cell blocking + exact squared-distance
    filter equals the O(n^2) brute-force pair set on ARBITRARY points —
    coordinates biased onto cell boundaries (multiples of r) and just
    inside/outside the radius, negative coordinates (floor-division cells),
    and coincident points (dist 0).  A missed boundary cell surfaces as a
    lost pair; a double-counted cell as a duplicated one."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from aws_etl_fiap_spark.operators.geo import grid_radius_pairs

    R = 2.0
    coord = st.one_of(
        st.integers(-6, 6).map(float),                 # cell corners (x R/2)
        st.integers(-60, 60).map(lambda v: v / 10.0),  # general grid
    )

    @settings(max_examples=6, deadline=None)
    @given(st.lists(st.tuples(coord, coord), min_size=1, max_size=10))
    def prop(pts):
        rows = [(i, x, y) for i, (x, y) in enumerate(pts)]
        df = spark.createDataFrame(rows, "id long, x double, y double")
        got = {
            (r.id_a, r.id_b): r.dist_sq
            for r in grid_radius_pairs(df, R).collect()
        }
        want = {}
        for i, (xa, ya) in enumerate(pts):
            for j in range(i + 1, len(pts)):
                xb, yb = pts[j]
                dsq = (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)
                if dsq <= R * R:
                    want[(i, j)] = dsq
        assert got == want

    prop()


def test_chi2_matches_python_model_property(spark):
    """Property (r10): the windowed contingency-grid chi-square replicates
    bit-exactly in Python (same IEEE op order: exact-integer marginal
    product / grand total, per-cell 9dp round-half-up, decimal term sum)
    — 1xK and Kx1 degenerate grids (chi2 exactly 0, dof 0), heavy ties."""
    import math

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from aws_etl_fiap_spark.operators.stats import chi2_independence

    def rhu(x, s):
        p = float(10 ** s)
        return math.floor(x * p + 0.5) / p

    @settings(max_examples=6, deadline=None)
    @given(
        st.lists(
            st.tuples(st.sampled_from("ab"), st.sampled_from("xyz")),
            min_size=1,
            max_size=16,
        )
    )
    def prop(pairs):
        df = spark.createDataFrame(pairs, "r string, c string")
        row = chi2_independence(df, F.col("r"), F.col("c")).collect()[0]
        grid = {}
        for r, c in pairs:
            grid[(r, c)] = grid.get((r, c), 0) + 1
        rows = {r for r, _ in grid}
        cols = {c for _, c in grid}
        n = len(pairs)
        from decimal import Decimal

        total = Decimal(0)
        for (r, c), o in grid.items():
            mr = sum(v for (rr, _), v in grid.items() if rr == r)
            mc = sum(v for (_, cc), v in grid.items() if cc == c)
            e = float(mr * mc) / float(n)
            total += Decimal(f"{rhu((o - e) * (o - e) / e, 9):.9f}")
        assert (row.chi2, row.dof, row.n_rows, row.n_cols, row.n_obs) == (
            rhu(float(total), 6),
            (len(rows) - 1) * (len(cols) - 1),
            len(rows),
            len(cols),
            n,
        )

    prop()


def test_welch_matches_python_model_property(spark):
    """Property (r10): the Welch z over exact cent moments replicates
    bit-exactly in Python — constant groups (zero pooled SE -> NULL z via
    try_divide), single-row groups, negative values."""
    import math

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from aws_etl_fiap_spark.operators.stats import welch_z_test

    def rhu(x, s=6):
        if x is None:
            return None
        p = float(10 ** s)
        return math.floor(x * p + 0.5) / p

    @settings(max_examples=6, deadline=None)
    @given(
        st.lists(st.integers(-99, 99), min_size=1, max_size=8),
        st.lists(st.integers(-99, 99), min_size=1, max_size=8),
    )
    def prop(a, b):
        rows = [("a", v / 100.0) for v in a] + [("b", v / 100.0) for v in b]
        df = spark.createDataFrame(rows, "g string, v double")
        row = welch_z_test(df, F.col("g"), "v", "a", "b").collect()[0]

        def moments(vals):
            cents = [math.floor(v / 100.0 * 100.0 + 0.5) for v in vals]
            return len(cents), sum(cents), sum(x * x for x in cents)

        na, s1a, s2a = moments(a)
        nb, s1b, s2b = moments(b)
        ma, mb = float(s1a) / (100.0 * na), float(s1b) / (100.0 * nb)
        va = float(na * s2a - s1a * s1a) / float(na * na) / 10000.0
        vb = float(nb * s2b - s1b * s1b) / float(nb * nb) / 10000.0
        se = math.sqrt(va / na + vb / nb)
        z = None if se == 0.0 else (ma - mb) / se
        assert (row.n_a, row.n_b, row.mean_a, row.mean_b,
                row.mean_diff, row.z_stat) == (
            na, nb, rhu(ma), rhu(mb), rhu(ma - mb), rhu(z)
        )

    prop()


def test_mad_outliers_matches_python_model_property(spark):
    """Property (r10): two-pass discrete-median MAD outliers equal the
    Python model (PERCENTILE_DISC: smallest element with cum fraction
    >= 0.5 — on even counts the LOWER middle, not an interpolation) —
    all-equal groups (mad 0: every unequal value is an outlier), heavy
    ties, single-row groups."""
    import math

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from aws_etl_fiap_spark.operators.stats import mad_outliers

    def disc(vals):
        s = sorted(vals)
        return s[math.ceil(0.5 * len(s)) - 1]

    @settings(max_examples=6, deadline=None)
    @given(
        st.lists(
            st.tuples(st.sampled_from("ab"), st.integers(-20, 20)),
            min_size=1,
            max_size=14,
        )
    )
    def prop(rows):
        data = [(g, v / 2.0) for g, v in rows]
        df = spark.createDataFrame(data, "g string, x double")
        got = {
            r.g: (r.median, r.mad, r.n_rows, r.n_outliers)
            for r in mad_outliers(df, "g", "x").collect()
        }
        want = {}
        for g in {g for g, _ in data}:
            vals = [x for gg, x in data if gg == g]
            med = disc(vals)
            devs = [abs(x - med) for x in vals]
            mad = disc(devs)
            fence = 3.0 * 1.4826 * mad
            want[g] = (med, mad, len(vals), sum(1 for d in devs if d > fence))
        assert got == want

    prop()


def test_rolling_corr_and_vwap_match_python_models_property(spark):
    """Property (r10): (a) rolling Pearson over exact cent bivariate
    moments replicates bit-exactly (two sqrts then one try_divide; n=1 and
    zero-variance windows NULL); (b) VWAP = exact decimal sums with one
    rounded divide, NULL on zero total quantity."""
    import math
    from decimal import Decimal

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from aws_etl_fiap_spark.operators.finance import vwap
    from aws_etl_fiap_spark.operators.stats import rolling_corr

    N = 3

    def rhu(x, s):
        if x is None:
            return None
        p = float(10 ** s)
        return math.floor(x * p + 0.5) / p

    @settings(max_examples=6, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(-30, 30), st.integers(-30, 30)),
            min_size=1,
            max_size=10,
        )
    )
    def prop(pairs):
        rows = [(d, a / 2.0, b / 2.0) for d, (a, b) in enumerate(pairs)]
        df = spark.createDataFrame(rows, "day int, x double, y double")
        got = {
            r.day: (r.n_in_window, r.rolling_corr)
            for r in rolling_corr(df, "day", "x", "y", n_rows=N).collect()
        }
        cents = [
            (math.floor(a * 100.0 + 0.5), math.floor(b * 100.0 + 0.5))
            for _, a, b in rows
        ]
        want = {}
        for i in range(len(cents)):
            frame = cents[max(0, i - N + 1): i + 1]
            n = len(frame)
            sx = sum(a for a, _ in frame)
            sy = sum(b for _, b in frame)
            sxx = sum(a * a for a, _ in frame)
            syy = sum(b * b for _, b in frame)
            sxy = sum(a * b for a, b in frame)
            num = float(n * sxy - sx * sy)
            den = math.sqrt(float(n * sxx - sx * sx)) * math.sqrt(
                float(n * syy - sy * sy)
            )
            r = None if den == 0.0 else num / den
            want[i] = (n, rhu(r, 6))
        assert got == want

        # VWAP over a 2-group split of the same rows.
        vdf = spark.createDataFrame(
            [(d % 2, a, abs(b)) for d, a, b in rows],
            "g int, total double, qty double",
        )
        got_v = {
            r.g: (r.vwap, Decimal(f"{r.total_value:.2f}"),
                  Decimal(f"{r.total_qty:.2f}"), r.n_fills)
            for r in vwap(vdf, ["g"], "total", "qty").collect()
        }
        want_v = {}
        for g in {d % 2 for d, _, _ in rows}:
            mine = [(a, abs(b)) for d, a, b in rows if d % 2 == g]
            tv = sum(Decimal(f"{a:.2f}") for a, _ in mine)
            tq = sum(Decimal(f"{q:.2f}") for _, q in mine)
            v = None if float(tq) == 0.0 else rhu(float(tv) / float(tq), 4)
            want_v[g] = (v, Decimal(f"{tv:.2f}"), Decimal(f"{tq:.2f}"), len(mine))
        assert got_v == want_v

    prop()
