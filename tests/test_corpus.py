"""Curation-funnel plan tests: stage wiring and monotone shrinkage."""

from pyspark.sql import functions as F

from aws_etl_fiap_spark.plans.corpus import curate_corpus, curation_funnel_counts
from aws_etl_fiap_spark.sources.readers import load_table


def test_funnel_monotone_and_survivors_consistent(spark, sf_correctness):
    docs = load_table(spark, sf_correctness, "documents")
    stages = curate_corpus(docs)
    counts = {r.stage: r.n_docs for r in curation_funnel_counts(docs).collect()}
    assert counts["raw"] >= counts["quality"] >= counts["exact_dedup"] >= counts["fuzzy_dedup"]
    assert counts["fuzzy_dedup"] == stages["survivors"].count()
    assert counts["fuzzy_dedup"] > 0
    # Survivors keep original columns untouched.
    assert set(stages["survivors"].columns) == set(docs.columns)


def test_chunking_covers_and_overlaps(spark):
    from pyspark.sql import functions as F

    from aws_etl_fiap_spark.operators.text import chunk_documents

    text = " ".join(f"t{i}" for i in range(150))
    df = spark.createDataFrame([(1, text), (2, "only three tokens")], "doc_id long, text string")
    rows = chunk_documents(df, chunk_tokens=64, overlap=16).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: starts 0,48,96 -> 3 chunks; sizes 64,64,54 (start 144 would
    # re-emit tokens 145-150, already covered by the start-96 chunk — the
    # late-r9 redundant-final-chunk fix drops it)
    d1 = sorted(by_doc[1], key=lambda r: r.chunk_idx)
    assert [r.n_chunk_tokens for r in d1] == [64, 64, 54]
    # consecutive chunks overlap by exactly 16 tokens
    a, b = d1[0].chunk.split(" "), d1[1].chunk.split(" ")
    assert a[-16:] == b[:16]
    # every token position is covered
    covered = set()
    for r in d1:
        start = r.chunk_idx * 48
        covered.update(range(start, start + r.n_chunk_tokens))
    assert covered == set(range(150))
    # short doc yields itself as one chunk
    (d2,) = by_doc[2]
    assert d2.chunk == "only three tokens" and d2.chunk_idx == 0


def test_deterministic_sample_monotone_and_stable(spark, sf_correctness):
    from aws_etl_fiap_spark.operators.sampling import deterministic_sample

    docs = load_table(spark, sf_correctness, "documents")
    s5 = {r.doc_id for r in deterministic_sample(docs, "doc_id", 5).select("doc_id").collect()}
    s10 = {r.doc_id for r in deterministic_sample(docs, "doc_id", 10).select("doc_id").collect()}
    again = {r.doc_id for r in deterministic_sample(docs, "doc_id", 10).select("doc_id").collect()}
    assert s5 <= s10          # rates compose monotonically
    assert s10 == again       # exactly re-derivable
    assert 0 < len(s10) < docs.count()


def test_sample_coherent_across_tables(spark, sf_correctness):
    """Hash-bucket sampling on a shared KEY keeps joined tables coherent:
    sampling orders and lineitem independently by order key (same salt)
    equals sampling their join — the property that makes hash sampling
    usable for multi-table training-data extracts (rand() sampling breaks
    referential integrity)."""
    from pyspark.sql import functions as F

    from aws_etl_fiap_spark.operators.sampling import deterministic_sample

    orders = load_table(spark, sf_correctness, "orders")
    li = load_table(spark, sf_correctness, "lineitem")
    o_s = deterministic_sample(orders, "o_orderkey", 20, salt="join")
    l_s = deterministic_sample(li, "l_orderkey", 20, salt="join")
    joined_then_sampled = deterministic_sample(
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey")),
        "o_orderkey",
        20,
        salt="join",
    )
    sampled_then_joined = o_s.join(l_s, F.col("o_orderkey") == F.col("l_orderkey"))
    a = {(r.o_orderkey, r.l_linenumber) for r in sampled_then_joined.collect()}
    b = {(r.o_orderkey, r.l_linenumber) for r in joined_then_sampled.collect()}
    assert a == b and a


def test_stratified_quota_sample_matches_naive_window(spark, sf_smoke):
    """The two-level bucket refinement must produce EXACTLY the set the
    naive per-stratum ROW_NUMBER window produces: the ceil(f * n) smallest
    rows per stratum under the portable (md5, id) order."""
    from pyspark.sql import Window

    from aws_etl_fiap_spark.operators.sampling import stratified_quota_sample
    from aws_etl_fiap_spark.sources.readers import load_table

    docs = load_table(spark, sf_smoke, "documents")
    got = stratified_quota_sample(docs, ["lang"], 0.1, "doc_id")
    key = F.md5(F.concat_ws(":", F.lit("strat"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("lang").orderBy(key, "doc_id")
    naive = (
        docs.withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(Window.partitionBy("lang")))
        .filter(F.col("__rn") <= F.ceil(0.1 * F.col("__n")))
        .select(*docs.columns)
    )
    got_ids = {r.doc_id for r in got.collect()}
    naive_ids = {r.doc_id for r in naive.collect()}
    assert got_ids == naive_ids
    # Hard per-stratum quota: exactly ceil(0.1 * n) docs per language.
    per_lang = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    got_per_lang = {r.lang: r.n for r in got.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    import math
    for lang, n in per_lang.items():
        assert got_per_lang.get(lang, 0) == math.ceil(0.1 * n), lang


def test_stratified_quota_sample_monotone_and_bounds(spark, sf_smoke):
    from aws_etl_fiap_spark.operators.sampling import stratified_quota_sample
    from aws_etl_fiap_spark.sources.readers import load_table

    docs = load_table(spark, sf_smoke, "documents")
    s10 = {r.doc_id for r in stratified_quota_sample(docs, ["lang"], 0.1, "doc_id").collect()}
    s25 = {r.doc_id for r in stratified_quota_sample(docs, ["lang"], 0.25, "doc_id").collect()}
    assert s10 <= s25  # quotas grow monotonically under one order
    all_rows = {r.doc_id for r in stratified_quota_sample(docs, ["lang"], 1.0, "doc_id").collect()}
    assert all_rows == {r.doc_id for r in docs.select("doc_id").collect()}
    import pytest as _pytest
    with _pytest.raises(ValueError):
        stratified_quota_sample(docs, ["lang"], 1.5, "doc_id")


def test_shard_assignment_balanced_and_stable(spark, sf_correctness):
    """Hash sharding: every shard occupied, sizes within 3x of each other
    (md5 uniformity at 500 docs / 16 shards), and the assignment is a pure
    function of doc_id (two runs identical)."""
    from aws_etl_fiap_spark.operators.dedup import portable_hash60
    from aws_etl_fiap_spark.sources.readers import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_correctness, "documents")
    shard = (
        portable_hash60(F.lit("shard"), F.col("doc_id").cast("string")) % 16
    ).cast("int")
    counts = {
        r["shard"]: r["n"]
        for r in docs.groupBy(shard.alias("shard")).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(counts) == set(range(16))
    assert max(counts.values()) <= 3 * min(counts.values())
    counts2 = {
        r["shard"]: r["n"]
        for r in docs.groupBy(shard.alias("shard")).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert counts == counts2


def test_ordered_global_index_dense_and_distributed(spark):
    """The two-pass global index is dense 0..n-1 in key order, equals the
    single-reducer window form, and actually spreads rows across many
    partitions (the point of not using that window)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from aws_etl_fiap_spark.operators.sampling import ordered_global_index

    n = 5000
    df = spark.range(n).select((F.col("id") * 7919 % n).alias("k"))  # scrambled
    out = ordered_global_index(df, ["k"], num_partitions=16)
    assert out.rdd.getNumPartitions() == 16
    got = {r["k"]: r["global_idx"] for r in out.collect()}
    assert sorted(got.values()) == list(range(n))
    expect = {
        r["k"]: r["idx"]
        for r in df.withColumn(
            "idx", F.row_number().over(Window.orderBy("k")) - 1
        ).collect()
    }
    assert got == expect


def test_bigram_pmi_known_corpus(spark):
    """Hand-checkable corpus: 'a b' occurs every doc, 'b c' never passes the
    floor; PMI matches the closed form."""
    import math

    from aws_etl_fiap_spark.operators.text import bigram_pmi

    docs = spark.createDataFrame([(i, "a b x") for i in range(30)], "doc_id long, text string")
    rows = bigram_pmi(docs, "text", min_count=10).collect()
    got = {(r["w1"], r["w2"]): (r["c_ab"], r["pmi"]) for r in rows}
    # tokens: 30x each of a,b,x (N=90); bigrams: 30x 'a b', 30x 'b x' (Nb=60)
    assert set(got) == {("a", "b"), ("b", "x")}
    expect = math.log((30 / 60) / ((30 / 90) * (30 / 90)))
    assert abs(got[("a", "b")][1] - expect) < 1e-12


def test_cluster_split_no_leakage_and_ratio(spark, sf_correctness):
    """Every near-dup cluster sits wholly inside ONE split, and the
    80/10/10 hash buckets land near their targets at corpus size."""
    from aws_etl_fiap_spark.queries.corpus_q import corpus_cluster_split

    rows = corpus_cluster_split(spark, sf_correctness).collect()
    by_cluster = {}
    from collections import Counter
    counts = Counter()
    for r in rows:
        by_cluster.setdefault(r.canonical, set()).add(r.split)
        counts[r.split] += 1
    assert all(len(s) == 1 for s in by_cluster.values()), "cluster straddles splits"
    multi = [c for c, _ in Counter(r.canonical for r in rows).items()
             if sum(1 for x in rows if x.canonical == c) > 1]
    assert multi, "testdata should contain at least one non-singleton cluster"
    n = sum(counts.values())
    assert n == 500
    assert 0.7 <= counts["train"] / n <= 0.9
    assert counts["val"] > 0 and counts["test"] > 0


# ----------------------------------------------- temperature mixing --


def test_temperature_quotas_flatten_and_cap(spark, sf_smoke):
    import pyspark.sql.functions as F

    from aws_etl_fiap_spark.operators.sampling import temperature_mix_quotas
    from aws_etl_fiap_spark.sources.readers import load_table

    docs = load_table(spark, sf_smoke, "documents")
    q = {r["lang"]: (r["__n"], r["quota"]) for r in
         temperature_mix_quotas(docs, "lang", budget=100).collect()}
    total_docs = sum(n for n, _ in q.values())
    for lang, (n, quota) in q.items():
        assert 0 <= quota <= n, (lang, n, quota)
    # flattening: the dominant stratum's share of the mix is SMALLER than
    # its share of the corpus; the smallest stratum's share is LARGER
    big = max(q, key=lambda k: q[k][0])
    small = min(q, key=lambda k: q[k][0])
    tot_quota = sum(qq for _, qq in q.values())
    if q[big][0] != q[small][0]:  # only meaningful under skew
        assert q[big][1] / tot_quota < q[big][0] / total_docs
        assert q[small][1] / tot_quota > q[small][0] / total_docs
    # rounding keeps the draw within one doc per stratum of the budget
    assert abs(tot_quota - 100) <= len(q)


def test_quota_plan_sample_equals_naive_window(spark, sf_smoke):
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from aws_etl_fiap_spark.operators.sampling import (
        quota_plan_sample,
        temperature_mix_quotas,
    )
    from aws_etl_fiap_spark.sources.readers import load_table

    docs = load_table(spark, sf_smoke, "documents").select(
        "doc_id", "lang", "source"
    )
    quotas = temperature_mix_quotas(docs, "lang", budget=150)
    got = quota_plan_sample(docs, ["lang"], quotas, "doc_id", salt="tmix")

    key = F.md5(F.concat_ws(":", F.lit("tmix"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("lang").orderBy(key.asc(), F.col("doc_id").asc())
    naive = (
        docs.withColumn("__rn", F.row_number().over(w))
        .join(quotas.select("lang", "quota"), "lang")
        .filter(F.col("__rn") <= F.col("quota"))
        .select(*docs.columns)
    )
    assert sorted(map(str, got.collect())) == sorted(map(str, naive.collect()))


def test_quota_plan_sample_missing_and_oversized_strata(spark, sf_smoke):
    import pyspark.sql.functions as F

    from aws_etl_fiap_spark.operators.sampling import quota_plan_sample
    from aws_etl_fiap_spark.sources.readers import load_table

    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "lang")
    spark_q = docs.sparkSession.createDataFrame(
        [("en", 1_000_000), ("fr", 2)], "lang string, quota long"
    )  # en quota exceeds the stratum; other langs absent entirely
    got = quota_plan_sample(docs, ["lang"], spark_q, "doc_id")
    by_lang = {
        r["lang"]: r["n"]
        for r in got.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    n_en = docs.filter(F.col("lang") == "en").count()
    assert by_lang == {"en": n_en, "fr": 2}


def test_ordered_prefix_sum_matches_window_form(spark):
    """The two-pass running sum equals the single-reducer window form under
    the same total order and actually spreads rows across partitions."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from aws_etl_fiap_spark.operators.sampling import ordered_prefix_sum

    n = 5000
    df = spark.range(n).select(
        (F.col("id") * 7919 % n).alias("k"), (F.col("id") % 17 + 1).alias("w")
    )
    out = ordered_prefix_sum(df, ["k"], "w", out="run", num_partitions=16)
    assert out.rdd.getNumPartitions() == 16
    got = {r["k"]: r["run"] for r in out.collect()}
    expect = {
        r["k"]: r["run"]
        for r in df.withColumn(
            "run",
            F.sum("w").over(
                Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
            ),
        ).collect()
    }
    assert got == expect


def test_token_budget_select_greedy_boundary(spark):
    """The doc that would cross the budget is dropped; everything ranked
    above it is kept (inclusive-cumsum semantics)."""
    from pyspark.sql import functions as F

    from aws_etl_fiap_spark.operators.sampling import ordered_prefix_sum

    rows = [(i, 10) for i in range(10)]  # 100 tokens total, budget 50
    df = spark.createDataFrame(rows, "doc_id int, n_tokens int")
    ranked = ordered_prefix_sum(df, ["doc_id"], "n_tokens", out="cum", num_partitions=4)
    kept = ranked.filter(F.col("cum") <= 50).collect()
    assert sorted(r["doc_id"] for r in kept) == [0, 1, 2, 3, 4]


def test_epoch_shuffle_is_fresh_permutation_per_epoch(spark, sf_smoke):
    """Both epochs enumerate the same doc set with contiguous index
    ranges, and epoch 1's within-epoch order is NOT epoch 0's (the
    per-epoch hash seed actually reshuffles)."""
    from aws_etl_fiap_spark.queries.registry import REGISTRY

    rows = REGISTRY["corpus_epoch_shuffle"].spark(spark, sf_smoke).collect()
    by_epoch = {}
    for r in rows:
        by_epoch.setdefault(r["epoch"], []).append((r["global_idx"], r["doc_id"]))
    assert set(by_epoch) == {0, 1}
    n = len(by_epoch[0])
    assert len(by_epoch[1]) == n
    assert {d for _, d in by_epoch[0]} == {d for _, d in by_epoch[1]}
    assert sorted(i for i, _ in by_epoch[0]) == list(range(n))
    assert sorted(i for i, _ in by_epoch[1]) == list(range(n, 2 * n))
    order0 = [d for _, d in sorted(by_epoch[0])]
    order1 = [d for _, d in sorted(by_epoch[1])]
    assert order0 != order1


def test_stratified_quota_is_exact_rational_not_fp_ceil(spark):
    """Late-r9 review: double math has ceil(0.07*100) = 8 (the product is
    7.000000000000001); the quota is now exact integer arithmetic from the
    fraction's decimal string, matching a decimal-typed SQL twin."""
    from aws_etl_fiap_spark.operators.sampling import stratified_quota_sample

    rows = [(i, "en") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = stratified_quota_sample(df, ["lang"], 0.07, "doc_id").count()
    assert got == 7  # not 8


def test_samplers_refuse_null_ids_in_plan(spark):
    """Late-r9 review: null ids share one hash and a NULL tiebreaker, so
    the selected set becomes partition-placement-dependent; the portable
    order key now fails in-plan."""
    import pytest

    from aws_etl_fiap_spark.operators.sampling import (
        bottom_k_sample,
        stratified_quota_sample,
    )

    df = spark.createDataFrame(
        [(1, "en"), (None, "en"), (2, "en")], "doc_id long, lang string"
    )
    with pytest.raises(Exception, match="non-null 'doc_id'"):
        stratified_quota_sample(df, ["lang"], 0.5, "doc_id").collect()
    with pytest.raises(Exception, match="non-null 'doc_id'"):
        bottom_k_sample(df, "doc_id", 2).collect()


def test_quota_plan_sample_rejects_duplicate_strata(spark):
    """Late-r9 review: a duplicated stratum row in the quotas frame fanned
    the bucket counts out and silently duplicated sampled rows."""
    import pytest

    from aws_etl_fiap_spark.operators.sampling import quota_plan_sample

    df = spark.createDataFrame(
        [(i, "en") for i in range(10)], "doc_id long, lang string"
    )
    quotas = spark.createDataFrame(
        [("en", 3), ("en", 5)], "lang string, quota long"
    )
    with pytest.raises(Exception, match="duplicate stratum"):
        quota_plan_sample(df, ["lang"], quotas, "doc_id").collect()


def test_weighted_poisson_refuses_nonpositive_weight_total(spark):
    """Late-r9 review: an all-NULL or net-negative weight column made
    every rate NULL/negative and the sample silently empty."""
    import pytest

    from aws_etl_fiap_spark.operators.sampling import weighted_poisson_sample

    df = spark.createDataFrame(
        [(1, None), (2, None)], "doc_id long, w double"
    )
    with pytest.raises(Exception, match="weight total"):
        weighted_poisson_sample(df, "doc_id", "w", expected_k=1).collect()


def test_ordered_prefix_sum_nulls_and_type_contract(spark):
    """Late-r9 review: a NULL in sum_col crashed the Arrow stamp's astype
    while pass 1 tolerated it; NULL now contributes 0 (F.sum semantics)
    and non-integral columns are refused instead of truncated."""
    import pytest

    from aws_etl_fiap_spark.operators.sampling import ordered_prefix_sum

    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 5)], "doc_id long, n long"
    )
    got = {
        r["doc_id"]: r["cum"]
        for r in ordered_prefix_sum(df, ["doc_id"], "n", out="cum").collect()
    }
    assert got == {1: 10, 2: 10, 3: 15}

    dbl = spark.createDataFrame([(1, 0.5)], "doc_id long, n double")
    with pytest.raises(ValueError, match="integral sum_col"):
        ordered_prefix_sum(dbl, ["doc_id"], "n")


def test_temperature_mix_survives_bigint_overflow_scale(spark):
    """Late-r9 review: 2*budget*score left BIGINT range at ~1e8-row
    strata (quantized scores ~1e13), wrapping to a NEGATIVE quota that
    least(n, quota) silently zeroed.  The product now rides DECIMAL(38,0);
    a huge score_scale forces the same magnitudes at test size."""
    from aws_etl_fiap_spark.operators.sampling import temperature_mix_quotas

    rows = [(i, "en") for i in range(90)] + [(100 + i, "pt") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    # score_scale=1e15: __s ~ 9.5e15 (fits BIGINT, like the 1e8-row/1e9-
    # scale production case) but 2*budget*__s ~ 1.9e19 > int64 max — the
    # old BIGINT product wrapped negative and least(n, quota) zeroed the
    # stratum (ANSI mode: crashed).
    out = {
        r["lang"]: r["quota"]
        for r in temperature_mix_quotas(
            df, "lang", budget=1000, score_scale=10**15
        ).collect()
    }
    assert out == {"en": 90, "pt": 10}  # budget >> corpus: capped at n


def test_stratified_quota_sample_refine_buckets_kwarg(spark, sf_smoke):
    """r9 ADVICE item 2: n_refine_buckets is back-compat-accepted as a
    validated no-op (the bucket count is fixed at 256 by the hash-prefix
    construction); any other value is rejected loudly."""
    import pytest as _pytest

    from aws_etl_fiap_spark.operators.sampling import stratified_quota_sample
    from aws_etl_fiap_spark.sources.readers import load_table

    docs = load_table(spark, sf_smoke, "documents")
    base = {
        r.doc_id
        for r in stratified_quota_sample(docs, ["lang"], 0.1, "doc_id").collect()
    }
    legacy = {
        r.doc_id
        for r in stratified_quota_sample(
            docs, ["lang"], 0.1, "doc_id", n_refine_buckets=256
        ).collect()
    }
    assert base == legacy
    with _pytest.raises(ValueError, match="fixed at 256"):
        stratified_quota_sample(docs, ["lang"], 0.1, "doc_id", n_refine_buckets=128)


def test_stratified_quota_sample_random_fraction_property(spark):
    """Property (r10): for ARBITRARY fractions (including the
    double-poison ones like 0.07 where ceil(0.07*100) = 8 in float math)
    and arbitrary stratum shapes, the two-level refinement equals the
    naive model — per stratum, the ceil(frac * n) smallest ids under the
    portable (md5('strat:'||id), id) order, quota computed in EXACT
    rational arithmetic."""
    import hashlib
    from fractions import Fraction

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from aws_etl_fiap_spark.operators.sampling import stratified_quota_sample

    rows = st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=40),     # doc_id
            st.sampled_from(["en", "pt", "de"]),        # stratum
        ),
        min_size=1,
        max_size=25,
        unique_by=lambda r: r[0],
    )
    fracs = st.sampled_from([0.07, 0.1, 0.25, 0.33, 0.5, 0.55, 0.9, 1.0])

    @settings(max_examples=8, deadline=None)
    @given(rows, fracs)
    def prop(data, frac):
        df = spark.createDataFrame(data, "doc_id long, lang string")
        got = {
            r["doc_id"]
            for r in stratified_quota_sample(df, ["lang"], frac, "doc_id").collect()
        }
        f = Fraction(str(frac))
        want = set()
        by_lang = {}
        for did, lang in data:
            by_lang.setdefault(lang, []).append(did)
        for ids in by_lang.values():
            quota = -((-len(ids) * f.numerator) // f.denominator)  # exact ceil
            key = lambda i: (hashlib.md5(f"strat:{i}".encode()).hexdigest(), i)
            want |= set(sorted(ids, key=key)[:quota])
        assert got == want

    prop()


def test_temperature_mix_quotas_matches_python_model_property(spark):
    """Property (r10): alpha=0.5 temperature quotas equal the exact-integer
    Python model — quantized sqrt scores, round-half-up share of the
    budget, capped at the stratum size — for arbitrary stratum shapes and
    budgets (including budget > corpus and single-stratum corpora)."""
    import math

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from aws_etl_fiap_spark.operators.sampling import temperature_mix_quotas

    SCALE = 10**9

    def model(counts, budget):
        s = {g: math.floor(math.sqrt(n) * SCALE + 0.5) for g, n in counts.items()}
        t = sum(s.values())
        return {
            g: min(counts[g], (2 * budget * s[g] + t) // (2 * t))
            for g in counts
        }

    @settings(max_examples=8, deadline=None)
    @given(
        st.dictionaries(
            st.sampled_from(["a", "b", "c", "d"]),
            st.integers(min_value=1, max_value=200),
            min_size=1,
            max_size=4,
        ),
        st.integers(min_value=0, max_value=500),
    )
    def prop(counts, budget):
        rows = [(g, i) for g, n in counts.items() for i in range(n)]
        df = spark.createDataFrame(rows, "g string, i int")
        got = {
            r["g"]: (r["__n"], r["quota"])
            for r in temperature_mix_quotas(df, "g", budget).collect()
        }
        want = model(counts, budget)
        assert {g: q for g, (_, q) in got.items()} == want
        assert {g: n for g, (n, _) in got.items()} == counts

    prop()


def test_equi_depth_histogram_matches_python_model_property(spark):
    """Property (r10): equi-depth buckets equal the rank-quantile model for
    arbitrary value multisets (heavy duplicates, all-equal columns,
    n < k): boundary i = smallest value whose cumulative count reaches
    ceil(i*n/k), bucket = 1 + #boundaries strictly below v, per-bucket
    count/min/max/sum exact."""
    import math
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from aws_etl_fiap_spark.operators.aggregates import equi_depth_histogram

    val = st.integers(min_value=0, max_value=20).map(lambda c: c / 2.0)

    @settings(max_examples=6, deadline=None)
    @given(st.lists(val, min_size=1, max_size=40), st.sampled_from([2, 3, 4]))
    def prop(values, k):
        df = spark.createDataFrame([(v,) for v in values], "x double")
        got = {
            r["bucket"]: (r["n_rows"], r["lo"], r["hi"], r["sum_v"])
            for r in equi_depth_histogram(df, "x", k).collect()
        }
        n = len(values)
        cnt = Counter(values)
        dv = sorted(cnt)
        bounds = []
        for i in range(1, k):
            thr = math.floor((i * n + k - 1) / float(k))
            cum = 0
            for v in dv:
                cum += cnt[v]
                if cum >= thr:
                    bounds.append(v)
                    break
        want = {}
        for v in values:
            b = 1 + sum(1 for x in bounds if v > x)
            if b not in want:
                want[b] = [0, v, v, 0.0]
            want[b][0] += 1
            want[b][1] = min(want[b][1], v)
            want[b][2] = max(want[b][2], v)
            want[b][3] += v  # exact: values are halves, decimal-sum safe
        assert got == {b: tuple(t) for b, t in want.items()}

    prop()


def test_two_pass_prefix_scheme_matches_models_property(spark):
    """Property (r10): the range-partitioned two-pass global index and
    running sum equal the trivial sorted-order models under ARBITRARY
    partition counts (1, more-than-rows, awkward middles) and duplicate-
    free keys — partition boundaries must never skip or double-count."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from aws_etl_fiap_spark.operators.sampling import (
        ordered_global_index,
        ordered_prefix_sum,
    )

    row = st.tuples(
        st.integers(min_value=0, max_value=100),  # unique key (unique_by)
        st.integers(min_value=0, max_value=9),    # weight
    )

    @settings(max_examples=6, deadline=None)
    @given(
        st.lists(row, min_size=1, max_size=30, unique_by=lambda r: r[0]),
        st.sampled_from([1, 2, 3, 7, 64]),
    )
    def prop(rows, parts):
        df = spark.createDataFrame(rows, "k int, w int")
        got_idx = {
            r["k"]: r["global_idx"]
            for r in ordered_global_index(df, ["k"], num_partitions=parts).collect()
        }
        ordered = sorted(k for k, _ in rows)
        assert got_idx == {k: i for i, k in enumerate(ordered)}

        got_sum = {
            r["k"]: r["running_sum"]
            for r in ordered_prefix_sum(df, ["k"], "w", num_partitions=parts).collect()
        }
        w_of = dict(rows)
        acc, want = 0, {}
        for k in ordered:
            acc += w_of[k]
            want[k] = acc
        assert got_sum == want

    prop()
