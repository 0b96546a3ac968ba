"""Side-effect imports that populate the query registry."""

from jcf_nb_migration_spark.queries import (  # noqa: F401
    relational,
    similarity_search,
    text_analysis,
)

__all__ = ["relational", "similarity_search", "text_analysis"]
