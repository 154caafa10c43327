"""Blocked record-linkage semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_etl_fiap_spark.operators.linkage import blocked_levenshtein_pairs


def test_blocked_matches_respect_block_and_distance(spark):
    rows = [
        ("red bolt",), ("red bolt",), ("rad bolt",),  # dist 1, same block
        ("red gear",),                                # close to 'red bolt' but other block
        ("azure bolt",),                              # same block, dist > 3 from 'red bolt'
    ]
    df = spark.createDataFrame(rows, "p_name string")
    got = {
        (r.name_a, r.name_b): (r.dist, r.n_a, r.n_b)
        for r in blocked_levenshtein_pairs(
            df, "p_name", lambda n: F.split(n, " ")[1], max_dist=3
        ).collect()
    }
    # the dist-1 pair matches, with support counts from the pre-aggregation
    assert got == {("rad bolt", "red bolt"): (1, 1, 2)}


def test_blocking_bounds_candidates(spark):
    """No cross-block comparison happens: with a degenerate 1-name-per-block
    key the result is empty even for identical-distance names."""
    df = spark.createDataFrame([("a x",), ("a y",), ("a z",)], "p_name string")
    out = blocked_levenshtein_pairs(
        df, "p_name", lambda n: F.split(n, " ")[1], max_dist=5
    )
    assert out.count() == 0


def test_blocked_levenshtein_matches_python_model_property(spark):
    """Property (r10): blocked fuzzy matching equals the Python model —
    distinct names with support counts, candidate pairs ONLY within the
    blocking key (first character here), kept when edit distance <=
    max_dist, name_a < name_b."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from aws_etl_fiap_spark.operators.linkage import blocked_levenshtein_pairs
    from pyspark.sql import functions as F

    name = st.text(alphabet="abc", min_size=1, max_size=5)

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    @settings(max_examples=6, deadline=None)
    @given(st.lists(name, min_size=1, max_size=15), st.sampled_from([1, 2]))
    def prop(names, max_dist):
        df = spark.createDataFrame([(n,) for n in names], "name string")
        got = {
            (r["name_a"], r["name_b"]): (r["dist"], r["n_a"], r["n_b"])
            for r in blocked_levenshtein_pairs(
                df, "name", lambda c: F.substring(c, 1, 1), max_dist
            ).collect()
        }
        from collections import Counter

        cnt = Counter(names)
        uniq = sorted(cnt)
        want = {}
        for i, a in enumerate(uniq):
            for b in uniq[i + 1 :]:
                if a[0] != b[0]:
                    continue  # different block: never compared
                d = lev(a, b)
                if d <= max_dist:
                    want[(a, b)] = (d, cnt[a], cnt[b])
        assert got == want

    prop()
