"""Curation-funnel plan tests: stage wiring and monotone shrinkage."""

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
