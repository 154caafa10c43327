"""Plan-quality regression tests: the physical plans behind the headline
queries must keep the properties the 100 TB design depends on (README "Scale
design"). Asserted on the plan string, not assumed:

- filters and column pruning reach the parquet scan (PushedFilters/ReadSchema);
- dimensions broadcast — star joins have ZERO shuffle joins;
- the fact table shuffles at most once per query (group/window key);
- a pure filter+project query has no shuffle at all.

If an edit regresses one of these (e.g. drops an F.broadcast hint, breaks
pushdown by wrapping a filter column in an expression), these fail before the
bench does.
"""

from __future__ import annotations

import re

from aws_etl_fiap_spark.queries import REGISTRY


def physical_plan(spark, sf_dir: str, name: str) -> str:
    df = REGISTRY[name].spark(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def shuffle_count(plan: str) -> int:
    """Count data shuffles (hash/range/single-partition exchanges).
    BroadcastExchange is not a shuffle — it is the point of broadcasting."""
    return len(re.findall(r"Exchange (?:hash|range)partitioning|Exchange SinglePartition", plan))


def scan_lines(plan: str) -> list[str]:
    return [l for l in plan.splitlines() if "FileScan parquet" in l]


def test_q1_scan_is_pruned_and_filter_pushed(spark, sf_correctness):
    plan = physical_plan(spark, sf_correctness, "tpch_q1_pricing_summary")
    (scan,) = scan_lines(plan)
    # Only the 7 needed columns are read (no l_orderkey/l_partkey/l_suppkey).
    assert "l_orderkey" not in scan and "l_partkey" not in scan
    # The shipdate predicate reaches the reader as a pushed filter.
    assert "PushedFilters" in scan
    pushed = scan.split("PushedFilters")[1]
    assert "l_shipdate" in pushed.split("]")[0]
    # Partial+final agg plus the output sort: exactly 2 shuffles.
    assert shuffle_count(plan) == 2, plan


def test_filter_project_has_no_shuffle(spark, sf_correctness):
    plan = physical_plan(spark, sf_correctness, "null_filter_project")
    assert shuffle_count(plan) == 0, plan
    (scan,) = scan_lines(plan)
    pushed = scan.split("PushedFilters")[1].split("]")[0]
    assert "l_returnflag" in pushed and "l_quantity" in pushed


def test_window_query_shuffles_once(spark, sf_correctness):
    plan = physical_plan(spark, sf_correctness, "refined_detail_lag")
    # One hash exchange on the window partition key and nothing else.
    assert shuffle_count(plan) == 1, plan


def test_q5_star_join_is_all_broadcast(spark, sf_correctness):
    plan = physical_plan(spark, sf_correctness, "tpch_q5_local_supplier_volume")
    # Every join in the 6-table star is a broadcast hash join...
    assert plan.count("BroadcastHashJoin") == 5, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    # ...so the fact table shuffles only for the final agg + output sort.
    assert shuffle_count(plan) == 2, plan


def test_q21_fact_shuffles_are_bounded(spark, sf_correctness):
    """The EXISTS/NOT-EXISTS decorrelation must not reintroduce extra passes:
    lineitem is shuffled for the per-order aggregate and the join-back, the
    supplier/nation side broadcasts."""
    plan = physical_plan(spark, sf_correctness, "tpch_q21_suppliers_kept_waiting")
    assert "BroadcastHashJoin" in plan
    assert shuffle_count(plan) <= 5, plan


def test_sql_broadcast_hint_overrides_threshold(spark, sf_correctness):
    """The /*+ BROADCAST */ hint must force a broadcast join even when the
    auto-broadcast threshold is disabled — that is the point of a hint."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = physical_plan(spark, sf_correctness, "sql_hint_broadcast_join")
        assert "BroadcastHashJoin" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_blocked_allpairs_no_driver_collect_and_bounded_groups(spark, sf_correctness):
    """The distributed exact all-pairs plan must be pure dataflow: block-pair
    replication joins + ONE grouped Arrow stage — collect()-free by
    construction (building the plan performs no job besides the broadcast of
    the B^2-row pairs frame)."""
    from aws_etl_fiap_spark.operators.similarity import allpairs_cosine_pairs_blocked
    from aws_etl_fiap_spark.sources.readers import load_table

    emb = load_table(spark, sf_correctness, "embeddings")
    df = allpairs_cosine_pairs_blocked(emb, threshold=0.45, n_blocks=4)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan  # the numpy scorer, grouped form
    # Replication is by broadcast of the tiny pairs frame, never a shuffle of
    # the corpus per block pair: corpus-side exchanges are the single
    # group-by-block-pair hash exchange.
    assert plan.count("BroadcastExchange") >= 1
    import re

    shuffles = re.findall(r"Exchange (?:hash|range)partitioning", plan)
    assert len(shuffles) <= 2, plan


def test_ngram_df_cap_is_broadcast_anti_over_checkpointed_postings(spark, sf_correctness):
    """The posting-list df cap must be a BROADCAST left_anti against the
    tiny OVER-cap key set, over the ALREADY CHECKPOINTED (doc, hash64)
    postings — never a re-shingling pass, and never a shuffle of the
    near-complete sub-cap key set (round-3 advice: the earlier semi-join
    shape shuffled almost every distinct shingle hash).  Its price is the
    map-side-combined df-count aggregate plus one BroadcastExchange of the
    handful of stop-shingle keys."""
    from aws_etl_fiap_spark.operators.dedup import ngram_jaccard_pairs
    from aws_etl_fiap_spark.sources.readers import load_table

    df = load_table(spark, sf_correctness, "documents")

    def plan(cap):
        out = ngram_jaccard_pairs(df, "doc_id", "text", 0.5, max_shingle_df=cap)
        return out._jdf.queryExecution().executedPlan().toString()

    uncapped, capped = plan(None), plan(1000)
    assert "LeftAnti" in capped and "LeftAnti" not in uncapped
    # The anti-join side arrives by broadcast, not exchange: the capped plan
    # may add the df-aggregate hash exchange but NOT a join-input shuffle.
    assert capped.count("BroadcastExchange") > uncapped.count("BroadcastExchange")
    # No Python stage in either plan tail: shingling happened once, behind
    # the localCheckpoint, and the cap reuses it.
    assert capped.count("MapInPandas") == 0
    assert shuffle_count(capped) <= shuffle_count(uncapped) + 2, capped


def test_minhash_portable_single_doc_shuffle(spark, sf_correctness):
    """The portable minhash signature pipeline must keep the xxhash64
    family's shape: shingle stream -> ONE doc-keyed aggregate (map-side
    combined), band stack, band-bucket self-join — no extra exchanges from
    the md5/word projection."""
    from aws_etl_fiap_spark.operators.dedup import minhash_lsh_pairs
    from aws_etl_fiap_spark.sources.readers import load_table

    df = load_table(spark, sf_correctness, "documents")
    out = minhash_lsh_pairs(df, "doc_id", "text", hash_family="portable")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # partial_min on the map side before the doc-keyed exchange
    assert "partial_min" in plan or "partial_" in plan, plan
    # exactly: doc-agg exchange (pre-localCheckpoint lineage) is cut by the
    # checkpoint; what remains is the band self-join + pair aggregate.
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_stratified_sample_plan_broadcasts_and_prunes_rank_work(spark, sf_correctness):
    """The two-level refinement's scale properties, asserted on the plan:
    the per-(stratum, bucket) quota plan joins back by BROADCAST (it is
    KB-sized), and the only window (ROW_NUMBER) sits over the boundary-
    bucket subset, partitioned by (stratum, bucket) — never by stratum
    alone, which is the single-task bottleneck the operator exists to
    avoid."""
    from aws_etl_fiap_spark.operators.sampling import stratified_quota_sample
    from aws_etl_fiap_spark.sources.readers import load_table

    docs = load_table(spark, sf_correctness, "documents")
    out = stratified_quota_sample(docs, ["lang"], 0.1, "doc_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    # Every Window operator's partition spec must include the bucket column.
    for line in plan.splitlines():
        if "Window" in line and "row_number" in line:
            assert "__b" in line, line


def test_upsert_survivor_scan_is_partition_pruned(spark, tmp_path, sf_correctness):
    """upsert_partitioned's survivor read must prune to the affected
    partitions at the directory level (PartitionFilters on the partition
    column), not scan the whole table and filter rows."""
    from pyspark.sql import functions as F

    from aws_etl_fiap_spark.sources.readers import load_table
    from aws_etl_fiap_spark.sources.writers import upsert_partitioned, write_partitioned

    path = str(tmp_path / "orders_pruned")
    src = (
        load_table(spark, sf_correctness, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .withColumn("o_year", F.year("o_orderdate").cast("int"))
    )
    write_partitioned(src.repartition(4), path, ["o_year"])
    existing = spark.read.parquet(path)
    years = sorted(r.o_year for r in existing.select("o_year").distinct().collect())
    one_year = years[0]
    pred = F.col("o_year") == F.lit(one_year)
    survivors = existing.filter(pred)
    plan = survivors._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters")[1].split("]")[0]
    assert "o_year" in pf, plan
    # And the op itself only rewrites the touched partition.
    batch = (
        src.filter(F.col("o_year").cast("string") == str(one_year))
        .limit(10)
        .withColumn("o_totalprice", F.col("o_totalprice") + F.lit(1.0))
    )
    stats = upsert_partitioned(spark, path, batch, ["o_orderkey"], ["o_year"])
    assert stats["affected_partitions"] == 1
    assert stats["rewritten_partitions"] == 1


def test_redact_and_repetition_are_shuffle_free_pruned_scans(spark, sf_correctness):
    """The round-6 text operators claim pure scan-stage projection: one
    pruned parquet scan (doc_id + text only), zero exchanges."""
    for name in ("text_redact_pii", "text_repetition_stats"):
        plan = physical_plan(spark, sf_correctness, name)
        assert shuffle_count(plan) == 0, (name, plan)
        (scan,) = scan_lines(plan)
        assert "lang" not in scan and "source" not in scan, (name, scan)


def test_quantile_outliers_broadcasts_fences_single_full_shuffle(spark, sf_correctness):
    """events_quantile_outliers claims: the big side never shuffles for the
    fence comparison — the per-type fence rows broadcast back.  The only
    exchanges are the two aggregates' (quartile agg over the full table,
    final tiny group)."""
    plan = physical_plan(spark, sf_correctness, "events_quantile_outliers")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_cohort_retention_reuses_user_partitioning(spark, sf_correctness):
    """The window MIN and the event stream share the user_id shuffle; the
    final (cohort, offset) distinct-agg adds its own.  Anything above 3
    exchanges means the self-join shape crept back in."""
    plan = physical_plan(spark, sf_correctness, "events_cohort_retention")
    assert "Join" not in plan, plan  # window-based, never a self-join
    assert shuffle_count(plan) <= 3, plan


def test_snapshot_diff_is_single_cogrouped_join(spark, sf_correctness):
    """One full-outer join on the key, no nested-loop fallback."""
    plan = physical_plan(spark, sf_correctness, "snapshot_diff_orders")
    assert re.search(r"(SortMergeJoin|ShuffledHashJoin) .*FullOuter", plan), plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_decontaminate_broadcasts_benchmark_side(spark, sf_correctness):
    """corpus_decontaminate claims: the training corpus never shuffles for
    the overlap join — the benchmark shingle set broadcasts.  Exchanges are
    only the tiny bench-distinct agg and the per-doc count agg."""
    plan = physical_plan(spark, sf_correctness, "corpus_decontaminate")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert shuffle_count(plan) <= 2, plan


def test_bm25_broadcasts_stats_and_dfreq(spark, sf_correctness):
    """text_bm25_topk: document frequencies (|terms| rows) and the global
    (N, avgdl) scalar broadcast back; the corpus side only shuffles for
    map-side-combined aggregates, and the top-k is a TakeOrdered, not a
    global sort exchange."""
    plan = physical_plan(spark, sf_correctness, "text_bm25_topk")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert shuffle_count(plan) <= 5, plan


def test_char_entropy_two_combined_aggs_no_join(spark, sf_correctness):
    """text_char_entropy: explode -> (doc, char) counts -> per-doc entropy.
    Two hash aggregates, both map-side combined, no join; the scan reads
    only doc_id + text."""
    plan = physical_plan(spark, sf_correctness, "text_char_entropy")
    assert "Join" not in plan, plan
    assert shuffle_count(plan) == 2, plan
    (scan,) = scan_lines(plan)
    assert "lang" not in scan and "source" not in scan, scan


def test_scd2_single_user_shuffle(spark, sf_correctness):
    """scd2_event_history: the change-flag window, the version window, the
    interval aggregate, and the lead() close-out all reuse ONE hash
    partitioning on user_id — a single shuffle of the event log."""
    plan = physical_plan(spark, sf_correctness, "scd2_event_history")
    assert "Join" not in plan, plan
    assert shuffle_count(plan) == 1, plan


def test_histogram_single_agg_pruned_scan(spark, sf_correctness):
    """profile_histogram_totalprice: one map-side-combined aggregate over
    <= n_buckets keys; the scan reads only the profiled column."""
    plan = physical_plan(spark, sf_correctness, "profile_histogram_totalprice")
    assert "Join" not in plan, plan
    assert shuffle_count(plan) == 1, plan
    (scan,) = scan_lines(plan)
    assert "o_orderkey" not in scan and "o_orderdate" not in scan, scan


def test_quantize_int8_shuffle_free_pruned_scan(spark, sf_correctness):
    """sim_quantize_int8: pure per-row expression transform — zero
    exchanges, scan reads only vec_id + embedding."""
    plan = physical_plan(spark, sf_correctness, "sim_quantize_int8")
    assert shuffle_count(plan) == 0, plan
    (scan,) = scan_lines(plan)
    assert "label" not in scan, scan


def test_funnel_stays_user_partitioned_no_cartesian(spark, sf_correctness):
    """events_funnel_conversion: three stage aggregates + two close-out
    joins, everything keyed on user_id — no nested-loop fallback, bounded
    exchanges (AQE may broadcast the <=1-row-per-user stage frames at small
    SF; at scale they stay co-partitioned shuffle joins)."""
    plan = physical_plan(spark, sf_correctness, "events_funnel_conversion")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert shuffle_count(plan) <= 6, plan


def test_surprisal_broadcasts_vocab(spark, sf_correctness):
    """text_unigram_surprisal: the vocabulary and the total-count scalar
    broadcast back onto the exploded corpus — the corpus side shuffles only
    for its two map-side-combined aggregates."""
    plan = physical_plan(spark, sf_correctness, "text_unigram_surprisal")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert shuffle_count(plan) <= 3, plan


def test_containment_no_cartesian_capped_broadcast(spark, sf_correctness):
    """Directional containment keeps the Jaccard tier's discipline: pair
    generation is an equi-join on the shingle hash (never a cartesian) and
    the df-cap is a BROADCAST anti against the tiny over-cap set."""
    plan = physical_plan(spark, sf_correctness, "dedup_containment_pairs")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert "BroadcastExchange" in plan
    assert shuffle_count(plan) <= 5, plan


def test_winnow_no_cartesian_capped_broadcast(spark, sf_correctness):
    """Winnowing overlap: fingerprint extraction is per-doc (zero-shuffle
    mapInPandas, lineage behind the checkpoint); the pair join must stay an
    equi-join with the broadcast df-cap anti."""
    plan = physical_plan(spark, sf_correctness, "dedup_winnow_overlap")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert "BroadcastExchange" in plan
    assert shuffle_count(plan) <= 6, plan


def test_tfidf_broadcasts_vocab_and_scalar(spark, sf_correctness):
    """TF-IDF: dfreq (vocabulary) and the N scalar broadcast back onto tf —
    corpus-sized data shuffles only for the tf/dfreq aggregates and the
    per-doc top-k window; the N-count scan reads ZERO columns."""
    plan = physical_plan(spark, sf_correctness, "text_tfidf_top_terms")
    assert plan.count("BroadcastExchange") == 2, plan
    assert "CartesianProduct" not in plan
    assert shuffle_count(plan) == 3, plan
    count_scans = [l for l in scan_lines(plan) if "FileScan parquet []" in l]
    assert count_scans, "N-docs count scan should read zero columns"


def test_er_blocking_joins_vocabulary_not_rows(spark, sf_correctness):
    """Record linkage: the levenshtein join runs on the distinct-name
    vocabulary (behind the checkpoint), is an equi-join on the blocking
    key (broadcast at this SF), and never a cartesian."""
    plan = physical_plan(spark, sf_correctness, "er_blocked_part_names")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert "levenshtein" in plan
    assert shuffle_count(plan) == 0, plan


# ---------------------------------------------------------- r6 batches 4-7

def test_vwap_dimension_broadcasts_single_fact_shuffle(spark, sf_correctness):
    plan = physical_plan(spark, sf_correctness, "fin_vwap_brand_month")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert shuffle_count(plan) == 1  # the (brand, month) aggregate only


def test_ohlc_registered_query_single_aggregate(spark, sf_correctness):
    plan = physical_plan(spark, sf_correctness, "fin_ohlc_daily_bars")
    assert "Window" not in plan
    assert shuffle_count(plan) == 1


def test_cms_probe_broadcasts_sketch(spark, sf_correctness):
    plan = physical_plan(spark, sf_correctness, "sketch_cms_heavy_hitters")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # probe + exact join both broadcastable


def test_basket_pairs_no_shuffle_join_in_pair_generation(spark, sf_correctness):
    """The combination-explode rework must keep pair counting join-free:
    any equi-join in the plan is one of the broadcast measure joins, never
    a shuffle join of the item table against itself."""
    plan = physical_plan(spark, sf_correctness, "basket_brand_pairs_lift")
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    assert "Generate explode" in plan  # the expression-generated combinations


def test_pit_join_single_user_shuffle_no_probe_join(spark, sf_correctness):
    """Union + running-last: the label side must NOT probe-join the feature
    table; the only joins would be broadcast (there are none), and the
    union reaches one user_id window sort."""
    plan = physical_plan(spark, sf_correctness, "fs_point_in_time_join")
    assert "SortMergeJoin" not in plan
    assert "Union" in plan and "Window" in plan


def test_bloom_filter_state_is_bounded_and_broadcast(spark, sf_correctness):
    plan = physical_plan(spark, sf_correctness, "sketch_bloom_membership")
    assert "BroadcastHashJoin" in plan  # probe side joins the tiny filter
    # the 12M-row-capable build reduces via partial bit_or before its shuffle
    assert "partial_bit_or" in plan.lower() or "bit_or" in plan.lower()


def test_pareto_window_runs_on_distinct_value_frame(spark, sf_correctness):
    """The skyline window must sort only the per-price best frame (post-
    aggregate), never the raw part table: exactly one aggregate shuffle
    feeds the window's range exchange."""
    plan = physical_plan(spark, sf_correctness, "pareto_parts_price_size")
    assert "Window" in plan
    # aggregate before window: the window's child chain contains the partial
    # aggregate of the per-price best (max over p_size#NN)
    assert re.search(r"partial_max\(p_size#\d+\)", plan)
    # and the raw table rejoins the tiny frontier via broadcast, not shuffle
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_geo_radius_join_is_cell_local_hash_join(spark, sf_correctness):
    """The blocking join must be an equi-join on the cell keys — a
    BroadcastNestedLoop/Cartesian here would mean the grid keys fell out
    of the join condition and the operator degraded to all-pairs."""
    plan = physical_plan(spark, sf_correctness, "geo_radius_pairs_customers")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan) or (
        "ShuffledHashJoin" in plan
    ), plan


def test_kmeans_assignment_broadcasts_centroids(spark, sf_correctness):
    """Both assignment passes fan the vector stream against the BROADCAST
    k-row centroid frame (the crossJoin is the deliberate k-fanout, never
    a shuffled join), and the argmin is the map-side-combinable min-struct
    aggregate — partial_min before the vid exchange."""
    plan = physical_plan(spark, sf_correctness, "sim_kmeans_lloyd")
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    assert re.search(r"partial_min\(s#\d+\)", plan), plan


def test_interval_overlap_broadcasts_calendar(spark, sf_correctness):
    """The session stream joins the day-keyed promo calendar via broadcast
    hash join — no shuffle beyond sessionization and the final day
    rollup."""
    plan = physical_plan(spark, sf_correctness, "join_interval_overlap_promo")
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan and "SortMergeJoin" not in plan, plan


def test_semdedup_no_cartesian_and_anti_join(spark, sf_correctness):
    """dedup_semdedup_embed: candidates come from the (table, bucket)
    equi-join — NEVER a cross product — and the keep step is a left_anti
    join against the (small) dropped set."""
    plan = physical_plan(spark, sf_correctness, "dedup_semdedup_embed")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "LeftAnti" in plan, plan


def test_hard_negatives_broadcasts_queries(spark, sf_correctness):
    """ann_hard_negatives: the query block broadcasts; the corpus never
    shuffles for the join (only the per-query top-k window exchanges)."""
    plan = physical_plan(spark, sf_correctness, "ann_hard_negatives")
    assert "BroadcastExchange" in plan
    assert shuffle_count(plan) == 1, plan  # the rank window only


def test_dsir_broadcasts_logratio_table(spark, sf_correctness):
    """corpus_dsir_weights: the 64-row log-ratio table must broadcast back
    onto the exploded corpus — a shuffle join here would re-shuffle every
    token instance by bucket (the scale killer)."""
    plan = physical_plan(spark, sf_correctness, "corpus_dsir_weights")
    assert "BroadcastHashJoin" in plan, plan


def test_length_bucket_broadcasts_bounds(spark, sf_correctness):
    """corpus_length_bucket_pack: the quartile-boundary row broadcasts; the
    corpus is never shuffled by value for bucketing."""
    plan = physical_plan(spark, sf_correctness, "corpus_length_bucket_pack")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan
    # token scan reads only the text column
    scans = scan_lines(plan)
    assert any("text" in s and "doc_id" not in s for s in scans), scans


def test_web_rollup_no_join_for_blocklist(spark, sf_correctness):
    """web_domain_policy_rollup: the blocklist is a literal predicate — the
    plan must contain NO join at all (one expression scan + the rollup's
    aggregate exchanges)."""
    plan = physical_plan(spark, sf_correctness, "web_domain_policy_rollup")
    assert "Join" not in plan, plan


def test_bigram_lm_all_count_tables_broadcast(spark, sf_correctness):
    """text_bigram_lm_nll: the pruned bigram table, both unigram sides, and
    the scalar total all broadcast back onto the exploded corpus — zero
    shuffle joins (a shuffle join would re-key every corpus bigram
    instance by word pair, the scale killer the KenL-style pruning floor
    exists to avoid)."""
    plan = physical_plan(spark, sf_correctness, "text_bigram_lm_nll")
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan
    assert plan.count("BroadcastExchange") >= 3, plan


def test_kn_bigram_all_count_tables_broadcast(spark, sf_correctness):
    """text_kn_bigram_nll: the pruned bigram table, the three vocab-sized
    KN count tables, and the scalar type total all broadcast back onto the
    exploded corpus — zero shuffle joins, same invariant as the stupid-
    backoff sibling (a shuffle join would re-key every corpus bigram
    instance by word pair)."""
    plan = physical_plan(spark, sf_correctness, "text_kn_bigram_nll")
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan
    assert plan.count("BroadcastExchange") >= 4, plan


def test_psi_drift_single_scan_no_join_on_events(spark, sf_correctness):
    """dq_psi_value_drift: fixed bin edges mean ONE map-side-combined
    aggregate over the events scan; the only join is the bin-cardinality
    totals broadcast."""
    plan = physical_plan(spark, sf_correctness, "dq_psi_value_drift")
    # The bin-count aggregate is lazily checkpointed and shared by both the
    # per-bin branch and the totals branch, so the final plan holds at most
    # one parquet scan (zero once the checkpoint substitutes ExistingRDD).
    assert len(scan_lines(plan)) <= 1, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan
    for scan in scan_lines(plan):
        assert "props" not in scan and "user_id" not in scan, scan


def test_token_budget_no_global_window_and_budget_broadcast(spark, sf_correctness):
    """corpus_token_budget_select: the running token sum must come from the
    range-partitioned prefix-sum (checkpointed upstream of this plan — see
    test_ordered_prefix_sum_matches_window_form for the distribution
    property), NOT a single-reducer global window; the scalar budget
    broadcasts."""
    plan = physical_plan(spark, sf_correctness, "corpus_token_budget_select")
    assert "Window" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan


def test_exact_auc_no_global_window_and_one_scan(spark, sf_correctness):
    """ml_auc_quality_classifier: the global rank must come from the
    range-partitioned prefix sum (no single-reducer Window anywhere in the
    final plan), and the scored corpus collapses to the distinct-score
    frame through ordinary hash aggregates."""
    plan = physical_plan(spark, sf_correctness, "ml_auc_quality_classifier")
    assert "Window" not in plan, plan
    assert "Join" not in plan, plan


def test_kcenter_assignment_broadcasts_centers(spark, sf_correctness):
    """sim_kcenter_coreset: the final census fans the vector stream
    against the BROADCAST k-row center frame (the crossJoin is the
    deliberate k-fanout) and the argmin is the map-side-combinable
    min-struct aggregate — same shape as the kmeans assignment gate."""
    plan = physical_plan(spark, sf_correctness, "sim_kcenter_coreset")
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    assert re.search(r"partial_min\(s#\d+\)", plan), plan


def test_unigram_stats_join_broadcasts_best_table(spark, sf_correctness):
    """text_unigram_lm_segment: the corpus-sized stats join probes the
    BROADCAST best-segmentation table (model-sized); the DP itself runs on
    checkpointed vocab frames upstream of this plan."""
    plan = physical_plan(spark, sf_correctness, "text_unigram_lm_segment")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan


def test_equidepth_boundaries_broadcast_no_row_window(spark, sf_correctness):
    """profile_equidepth_totalprice: boundaries ride back as ONE broadcast
    array row (never a shuffled join), and no Window touches the row
    stream — ranks come from the checkpointed two-pass prefix sum."""
    plan = physical_plan(spark, sf_correctness, "profile_equidepth_totalprice")
    assert "Window" not in plan, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan


def test_t_closeness_gate_tables_broadcast(spark, sf_correctness):
    """privacy_t_closeness_release: the global value table and the
    class-size table broadcast onto the class-value grid; the release is
    computed without any shuffled join or window."""
    plan = physical_plan(spark, sf_correctness, "privacy_t_closeness_release")
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan
    assert "Window" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_wordpiece_stats_join_broadcasts_piece_counts(spark, sf_correctness):
    """text_wordpiece_segment: like the unigram sibling, the corpus-sized
    stats join probes the BROADCAST per-word piece-count table."""
    plan = physical_plan(spark, sf_correctness, "text_wordpiece_segment")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan


def test_gini_window_runs_on_value_grid_not_rows(spark, sf_correctness):
    """stat_gini_priority_revenue: the tie-aware rank Window partitions by
    group over the DISTINCT-VALUE grid (the groupBy collapses rows first),
    and no partition-less Window ever touches the plan — the group key
    keeps the sort per-partition-parallel, the 100x story."""
    plan = physical_plan(spark, sf_correctness, "stat_gini_priority_revenue")
    assert "Window" in plan, plan
    # the value-grid aggregate (grp, x) sits UPSTREAM of the rank window
    assert plan.index("HashAggregate") < plan.index("Window"), plan
    # no empty partition spec: every Window line carries the grp key
    for ln in plan.splitlines():
        if "Window" in ln and "windowspecdefinition" in ln:
            assert "grp" in ln, ln
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_naive_bayes_priors_broadcast_scalar(spark, sf_correctness):
    """ml_naive_bayes_confusion: class priors and token likelihood tables
    are model-sized and must BROADCAST onto the scoring stream — never a
    shuffled join against the corpus."""
    plan = physical_plan(spark, sf_correctness, "ml_naive_bayes_confusion")
    assert "BroadcastExchange" in plan, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_k_anon_suppression_anti_join_stays_broadcast(spark, sf_correctness):
    """privacy_k_anon_suppress / privacy_l_diversity_release: the
    null-safe suppression probe (late-r10 eqNullSafe condition) must STAY
    a broadcast HASH anti-join — EqualNullSafe is a valid hash key, but a
    regression to BroadcastNestedLoopJoin (the fate of genuinely non-equi
    conditions) would scan corpus x violators at 100 TB."""
    for name in ("privacy_k_anon_suppress", "privacy_l_diversity_release"):
        plan = physical_plan(spark, sf_correctness, name)
        assert "BroadcastHashJoin" in plan, (name, plan)
        assert "LeftAnti" in plan, (name, plan)
        assert "BroadcastNestedLoopJoin" not in plan, (name, plan)
        assert "SortMergeJoin" not in plan, (name, plan)
