"""Side-effect imports that populate the query registry."""

from jcf_nb_migration_spark.queries import relational  # noqa: F401

__all__ = ["relational"]
