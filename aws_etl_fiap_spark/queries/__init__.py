"""Query registry backing ``__spark_entry__.py``.

Each module registers (name -> Spark callable [+ DuckDB oracle SQL]) pairs via
``registry.query``. Importing this package populates the registry.
"""

from aws_etl_fiap_spark.queries import (  # noqa: F401  (import for side effects)
    formats_q,
    quality_q,
    analytics2_q,
    analytics_q,
    core,
    corpus_q,
    dedup_q,
    events_q,
    features_q,
    finance_q,
    geo_q,
    graph_q,
    joins_q,
    linkage_q,
    multimodal_q,
    pyds_q,
    seq_q,
    similarity_q,
    sketch_q,
    stats_q,
    streaming_q,
    text_q,
    tpch,
    tpch2,
    tpch3,
    web_q,
    writepath_q,
)
from aws_etl_fiap_spark.queries.registry import REGISTRY, oracle_sql, queries

__all__ = ["REGISTRY", "queries", "oracle_sql"]
