"""Property-based checks (hypothesis) for the engine-agnostic numeric rules
in functions/parity.py: the cross-engine float discipline must hold for
ARBITRARY inputs, not just the fixture values the oracle queries happen to
hit. Each property drives the actual Spark expression against a DuckDB
evaluation of the sql_* twin on the same values.

hypothesis is invoked INSIDE plain pytest functions (inner @given) — this
environment's pytest plugin stack mis-handles module-level @given tests, and
the inner form is also what keeps the session-scoped Spark fixture out of
hypothesis's per-example lifecycle.
"""

from __future__ import annotations

import math

import duckdb
from hypothesis import assume, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from aws_etl_fiap_spark.functions.parity import (
    round_half_up,
    sql_dec_sum,
    sql_round_half_up,
)
from aws_etl_fiap_spark.operators.skew import salted_agg

# Money-like doubles: fixed-point with 2 decimals, the domain dec_sum(…, 2)
# is specified for.
money = st.integers(min_value=-(10**12), max_value=10**12).map(lambda c: c / 100.0)
free_doubles = st.floats(
    min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False
)


def test_dec_sum_engine_parity_and_order_independence(spark):
    """DECIMAL(38,2) sum of 2-dp doubles: Spark == DuckDB == exact cents sum,
    in any order."""
    duck = duckdb.connect()

    @settings(max_examples=15, deadline=None)
    @given(st.lists(money, min_size=1, max_size=50))
    def prop(values):
        df = spark.createDataFrame([(v,) for v in values], "x double")
        got = df.agg(F.sum(F.col("x").cast("decimal(38,2)")).cast("double")).first()[0]
        rev = (
            spark.createDataFrame([(v,) for v in reversed(values)], "x double")
            .agg(F.sum(F.col("x").cast("decimal(38,2)")).cast("double"))
            .first()[0]
        )
        placeholders = ", ".join(f"({v!r})" for v in values)
        want = duck.sql(
            f"SELECT {sql_dec_sum('x', 2)} FROM (VALUES {placeholders}) t(x)"
        ).fetchone()[0]
        exact = float(sum(round(v * 100) for v in values)) / 100.0
        assert got == rev == want == exact

    prop()


def test_round_half_up_engine_parity(spark):
    """FLOOR(x*100 + 0.5)/100 gives identical doubles on both engines for
    arbitrary (not just fixed-point) inputs — the property engine ROUND
    lacks. Batched: one Spark job checks all examples."""
    duck = duckdb.connect()

    @settings(max_examples=5, deadline=None)
    @given(st.lists(free_doubles, min_size=1, max_size=40))
    def prop(xs):
        df = spark.createDataFrame([(x,) for x in xs], "x double")
        got = sorted(r[0] for r in df.select(round_half_up("x", 2)).collect())
        # CAST each literal: DuckDB types bare decimal literals as DECIMAL
        # and overflows FLOOR(x*100+0.5) in decimal arithmetic; real oracles
        # always read DOUBLE parquet columns, which is what this must model.
        placeholders = ", ".join(f"(CAST({x!r} AS DOUBLE))" for x in xs)
        want = sorted(
            r[0]
            for r in duck.sql(
                f"SELECT {sql_round_half_up('x', 2)} FROM (VALUES {placeholders}) t(x)"
            ).fetchall()
        )
        assert got == want

    prop()


def test_salted_agg_property(spark):
    """salted_agg == plain groupBy for arbitrary key/value multisets."""

    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(min_value=0, max_value=3), money),
            min_size=1,
            max_size=60,
        )
    )
    def prop(rows):
        df = spark.createDataFrame(
            [(k, float(v), i) for i, (k, v) in enumerate(rows)], "k int, v double, rid long"
        )
        got = {
            r.k: (r.n_rows, r.sum_v)
            for r in salted_agg(df, ["k"], ["v"], salt_source=["rid"], n_salts=4).collect()
        }
        want = {
            r.k: (r.n, r.s)
            for r in df.groupBy("k")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("v").cast("decimal(38,2)")).cast("double").alias("s"),
            )
            .collect()
        }
        assert got == want

    prop()


def test_portable_hash60_engine_parity(spark):
    """The portable hash family's whole value proposition is cross-engine
    bit-equality: Spark conv(substr(md5)) must equal DuckDB's hex-cast form
    for ANY string, including unicode and empties (md5 runs over UTF-8 bytes
    in both engines)."""
    import duckdb

    from aws_etl_fiap_spark.operators.dedup import portable_hash60

    con = duckdb.connect()

    @given(
        st.lists(
            st.text(
                alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40
            ),
            min_size=1,
            max_size=20,
        )
    )
    @settings(max_examples=15, deadline=None)
    def check(texts):
        df = spark.createDataFrame([(t,) for t in texts], "s string")
        got = {
            r.s: r.h
            for r in df.select("s", portable_hash60(F.col("s")).alias("h")).collect()
        }
        for t in texts:
            (expect,) = con.execute(
                "SELECT CAST('0x' || substr(md5(?), 1, 15) AS BIGINT)", [t]
            ).fetchone()
            assert got[t] == expect, t

    check()


def test_portable_minhash_mixing_engine_parity(spark):
    """The word-split + fixed-constant mixing must agree with the DuckDB SQL
    twin for arbitrary shingle strings (guards the exact formula the
    dedup_minhash_lsh oracle embeds)."""
    import duckdb

    from aws_etl_fiap_spark.operators.dedup import _mix_constants

    con = duckdb.connect()
    rows = _mix_constants(8)

    @given(st.text(max_size=30))
    @settings(max_examples=10, deadline=None)
    def check(s):
        df = spark.createDataFrame([(s,)], "s string")
        digest = F.md5(F.col("s"))
        words = [
            F.conv(F.substring(digest, 8 * j + 1, 8), 16, 10).cast("long")
            for j in range(4)
        ]
        cols = [
            (sum(words[j] * F.lit(a) for j, a in enumerate(row)) % F.lit(1 << 32)).alias(
                f"h{i}"
            )
            for i, row in enumerate(rows)
        ]
        got = df.select(*cols).first()
        for i, row in enumerate(rows):
            mix = " + ".join(
                f"CAST('0x' || substr(md5(?), {8 * j + 1}, 8) AS BIGINT) * {a}"
                for j, a in enumerate(row)
            )
            (expect,) = con.execute(
                f"SELECT ({mix}) % 4294967296", [s] * 4
            ).fetchone()
            assert got[f"h{i}"] == expect, (s, i)

    check()


def test_quantize_int8_engine_parity_property(spark):
    """For arbitrary float vectors, the explicit floor-round quantization
    (scale, codes) must agree bit-for-bit with DuckDB's evaluation of the
    same arithmetic, and codes must stay within [-127, 127]."""
    duck = duckdb.connect()

    @settings(max_examples=15, deadline=None)
    @given(
        st.lists(
            st.floats(
                min_value=-1e3, max_value=1e3, allow_nan=False, allow_infinity=False,
                width=32,
            ),
            min_size=1,
            max_size=16,
        )
    )
    def prop(vec):
        from aws_etl_fiap_spark.operators.similarity import quantize_int8

        df = spark.createDataFrame([(1, vec)], "vec_id long, embedding array<float>")
        r = quantize_int8(df).collect()[0]
        assert all(abs(c) <= 127 for c in r["q"])
        # Ship the vector as a real float32 Arrow array (the registered
        # query's oracle reads float32 PARQUET): a SQL literal would parse
        # through DECIMAL/DOUBLE and can land one float32 ulp away.
        import pyarrow as pa

        duck.register("qv_t", pa.table({"emb": pa.array([vec], pa.list_(pa.float32()))}))
        d = duck.sql(
            """
            WITH v AS (SELECT list_transform(CAST(emb AS DOUBLE[]), x -> x) AS e FROM qv_t),
            m AS (SELECT e, list_max(list_transform(e, x -> abs(x))) AS max_abs,
                         list_max(list_transform(e, x -> abs(x))) / 127.0 AS scale FROM v)
            SELECT scale,
                   CASE WHEN max_abs > 0
                        THEN list_transform(e, x -> CAST(FLOOR(x / scale + 0.5) AS BIGINT))
                        ELSE list_transform(e, x -> CAST(0 AS BIGINT)) END AS qv
            FROM m
            """
        ).fetchone()
        assert r["scale"] == d[0]
        assert list(r["q"]) == list(d[1])

    prop()


def test_scd2_intervals_partition_timeline_property(spark):
    """For arbitrary per-key state sequences: versions are dense from 1,
    intervals chain exactly (next effective_from == previous effective_to),
    exactly one open interval per key, and consecutive rows never share a
    state."""
    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(1, 3), st.sampled_from(["A", "B", "C"])),
            min_size=1,
            max_size=25,
        )
    )
    def prop(seq):
        from aws_etl_fiap_spark.operators.windows import scd2_collapse

        rows = [
            (key, state, f"2024-01-{(i % 27) + 1:02d} 00:00:00", i)
            for i, (key, state) in enumerate(seq)
        ]
        df = spark.createDataFrame(
            rows, "user_id long, state string, ts string, event_id long"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        out = scd2_collapse(df, "user_id", "state", "ts", "event_id").collect()
        by_key = {}
        for r in out:
            by_key.setdefault(r["user_id"], []).append(r)
        for key, rs in by_key.items():
            rs.sort(key=lambda r: r["version"])
            assert [r["version"] for r in rs] == list(range(1, len(rs) + 1))
            opens = [r for r in rs if r["effective_to"] is None]
            assert len(opens) == 1 and rs[-1]["is_current"] == 1
            for a, b in zip(rs, rs[1:]):
                assert a["effective_to"] == b["effective_from"]
                assert a["state"] != b["state"]

    prop()


def test_winnowing_reference_model_and_guarantee_property(spark):
    """The distributed winnowing sketch equals a direct local model on
    arbitrary token streams, and the coverage guarantee holds: two docs
    sharing any w+k-1-token run share at least one fingerprint."""
    import hashlib

    from aws_etl_fiap_spark.operators.dedup import (
        WINNOW_K,
        WINNOW_W,
        winnow_fingerprints,
    )

    def local_fps(text, k=WINNOW_K, w=WINNOW_W):
        toks = text.split(" ")
        hs = [
            int(hashlib.md5(" ".join(toks[i : i + k]).encode()).hexdigest()[:15], 16)
            for i in range(len(toks) - k + 1)
        ]
        return {min(hs[i : i + w]) for i in range(len(hs) - w + 1)}

    token = st.integers(min_value=0, max_value=30).map(lambda i: f"t{i}")
    doc = st.lists(token, min_size=0, max_size=40).map(" ".join)

    @settings(max_examples=8, deadline=None)
    @given(st.lists(doc, min_size=1, max_size=4), st.lists(token, min_size=6, max_size=9))
    def prop(texts, run):
        run_s = " ".join(run)  # >= w + k - 1 = 6 tokens
        texts = list(texts) + [texts[0] + " " + run_s, run_s + " " + texts[-1]]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        got = {}
        for r in winnow_fingerprints(df, "doc_id", "text").collect():
            got.setdefault(r.doc, set()).add(r.fp)
        for i, t in enumerate(texts):
            assert got.get(i, set()) == local_fps(t), f"doc {i} sketch mismatch"
        a, b = len(texts) - 2, len(texts) - 1
        assert got[a] & got[b], "shared run must yield a shared fingerprint"

    prop()


def test_ordered_cosine_accumulate_matches_duckdb_fold():
    """The Arrow-batched dimension-ordered accumulate that scores SemDeDup
    candidate pairs (operators/similarity._ordered_cosine_filter) must be
    BIT-IDENTICAL to DuckDB's list_dot_product sequential fold for
    arbitrary vectors — same adds, same order, no pairwise/BLAS
    re-association."""
    import numpy as np

    duck = duckdb.connect()

    @settings(max_examples=30, deadline=None)
    @given(
        st.lists(
            st.lists(free_doubles, min_size=8, max_size=8),
            min_size=2,
            max_size=6,
        )
    )
    def prop(vecs):
        a = np.array(vecs, dtype=np.float64)
        b = np.roll(a, 1, axis=0)
        # the scorer's accumulation pattern, verbatim
        ab = np.zeros(len(a))
        for i in range(8):
            ab += a[:, i] * b[:, i]
        for row_a, row_b, got in zip(a, b, ab):
            # bind as parameters (exact DOUBLE[] transfer) — a rendered
            # decimal literal like 900719925.9921875 would parse as
            # DECIMAL(16,7), whose >2^53 mantissa converts to double with
            # DIFFERENT rounding than the decimal-string parse; parquet
            # columns (the real oracle input) are binary doubles like the
            # parameters here
            want = duck.execute(
                "SELECT list_dot_product(CAST(? AS DOUBLE[]), CAST(? AS DOUBLE[]))",
                [[float(x) for x in row_a], [float(x) for x in row_b]],
            ).fetchone()[0]
            assert got == want or (got != got and want != want)

    prop()


def test_bpe_single_pass_replace_matches_duckdb(spark):
    """The BPE merge step is a single-pass leftmost-non-overlapping
    ``replace`` on both engines (operators/bpe.py module docstring) — the
    assumption behind the whole trainer/encoder gate.  Drive random symbol
    sequences (including overlapping-run pathologies like 'a b a b a')
    through Spark F.replace and DuckDB replace and require identical
    strings."""
    duck = duckdb.connect()

    @settings(max_examples=20, deadline=None)
    @given(
        st.lists(
            st.lists(st.sampled_from("ab"), min_size=1, max_size=8).map("".join),
            min_size=1,
            max_size=6,
        )
    )
    def prop(words):
        seqs = [" " + " ".join(w) + " " for w in ("".join(ws) for ws in [words])]
        seq = seqs[0]
        pat, rep = " a b ", " ab "
        got = (
            spark.range(1)
            .select(F.replace(F.lit(seq), F.lit(pat), F.lit(rep)).alias("s"))
            .collect()[0]["s"]
        )
        want = duck.execute(
            "SELECT replace(?, ?, ?)", [seq, pat, rep]
        ).fetchone()[0]
        assert got == want

    prop()


def test_exact_auc_matches_pairwise_definition_property(spark):
    from aws_etl_fiap_spark.operators.ml import exact_auc

    pair = st.tuples(
        st.integers(min_value=0, max_value=12).map(lambda g: g / 12.0),
        st.booleans(),
    )

    @settings(max_examples=8, deadline=None)
    @given(st.lists(pair, min_size=4, max_size=60))
    def prop(rows):
        pos = [s for s, y in rows if y]
        neg = [s for s, y in rows if not y]
        assume(pos and neg)
        wins = sum(1.0 for p in pos for q in neg if p > q)
        ties = sum(1.0 for p in pos for q in neg if p == q)
        expect = (wins + 0.5 * ties) / (len(pos) * len(neg))
        df = spark.createDataFrame(
            [(s, int(y)) for s, y in rows], "score double, y int"
        )
        got = exact_auc(df, F.col("y"), F.col("score")).collect()[0]["auc"]
        assert got == math.floor(expect * 1e6 + 0.5) / 1e6

    prop()


def test_spearman_matches_rank_pearson_property(spark):
    from aws_etl_fiap_spark.operators.stats import spearman_rho

    cell = st.one_of(st.none(), st.integers(min_value=0, max_value=9))
    pair = st.tuples(cell, cell)

    @settings(max_examples=8, deadline=None)
    @given(st.lists(pair, min_size=3, max_size=50))
    def prop(all_rows):
        # COMPLETE-CASE semantics (late r10): NULL pairs drop before
        # ranking — incomplete rows must not shift the survivors' ranks.
        rows = [(x, y) for x, y in all_rows if x is not None and y is not None]
        assume(len(rows) >= 3)
        xs = [x for x, _ in rows]
        ys = [y for _, y in rows]
        assume(len(set(xs)) > 1 and len(set(ys)) > 1)

        def rank2(vals):
            # doubled tie-aware average ranks, the operator's integers
            return {
                v: 2 * sum(1 for u in vals if u < v)
                + sum(1 for u in vals if u == v) + 1
                for v in set(vals)
            }

        rx, ry = rank2(xs), rank2(ys)
        n = len(rows)
        sx = sum(rx[x] for x in xs)
        sy = sum(ry[y] for y in ys)
        sxx = sum(rx[x] * rx[x] for x in xs)
        syy = sum(ry[y] * ry[y] for y in ys)
        sxy = sum(rx[x] * ry[y] for x, y in rows)
        # mirror the operator's double arithmetic exactly
        num = float(n) * float(sxy) - float(sx) * float(sy)
        den = math.sqrt(
            (float(n) * float(sxx) - float(sx) * float(sx))
            * (float(n) * float(syy) - float(sy) * float(sy))
        )
        expect = (
            math.floor((num / den) * 1e6 + 0.5) / 1e6 if den > 0.0 else None
        )
        df = spark.createDataFrame(all_rows, "x long, y long")
        got = spearman_rho(df, "x", "y").collect()[0]["rho"]
        assert got == expect

    prop()


def test_asof_join_matches_bruteforce_property(spark):
    """The union-merge as-of join (operators/joins.asof_join) against the
    brute-force definition, for ARBITRARY key/time collisions including
    same-instant ties (right row wins) and tied right rows (greatest
    tiebreak wins): the window trick must equal 'latest right at-or-before'
    computed the naive way."""
    from aws_etl_fiap_spark.operators.joins import asof_join

    @settings(max_examples=6, deadline=None)
    @given(
        st.lists(  # left rows: (key, time, lid)
            st.tuples(
                st.integers(min_value=0, max_value=3),
                st.integers(min_value=0, max_value=8),
            ),
            min_size=1,
            max_size=15,
        ),
        st.lists(  # right rows: (key, time, val)
            st.tuples(
                st.integers(min_value=0, max_value=3),
                st.integers(min_value=0, max_value=8),
                st.integers(min_value=0, max_value=99),
            ),
            min_size=0,
            max_size=15,
        ),
    )
    def prop(left_rows, right_rows):
        left = spark.createDataFrame(
            [(k, t, i) for i, (k, t) in enumerate(left_rows)],
            "k int, t int, lid int",
        )
        # rid doubles as the unique tiebreak among same-instant right rows
        right = spark.createDataFrame(
            [(k, t, v, i) for i, (k, t, v) in enumerate(right_rows)],
            "k int, t int, v int, rid int",
        ) if right_rows else spark.createDataFrame([], "k int, t int, v int, rid int")
        got = {
            (r["lid"], r["asof_v"])
            for r in asof_join(
                left, right, ["k"], "t", "t", ["v"], right_tiebreak=["rid"]
            ).collect()
        }
        want = set()
        for i, (k, t) in enumerate(left_rows):
            cands = [
                (rt, ri, v)
                for ri, (rk, rt, v) in enumerate(right_rows)
                if rk == k and rt <= t
            ]
            want.add((i, max(cands)[2] if cands else None))
        assert got == want

    prop()
