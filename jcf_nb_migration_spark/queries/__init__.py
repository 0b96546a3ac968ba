"""Side-effect imports that populate the query registry."""

from jcf_nb_migration_spark.queries import (  # noqa: F401
    advanced,
    advanced2,
    corpus_ops,
    curation_ops,
    fuzzy_ops,
    migration_ops,
    ml_ops,
    multimodal_ops,
    packing_ops,
    pandas_udf_ops,
    profiling_ops,
    relational,
    relational2,
    relational3,
    retrieval_ops,
    semistructured_ops,
    similarity_search,
    sources_ops,
    streaming_ops,
    text_analysis,
    timeseries_ops,
)

__all__ = ["migration_ops", "multimodal_ops", "relational",
           "similarity_search", "streaming_ops", "text_analysis"]
