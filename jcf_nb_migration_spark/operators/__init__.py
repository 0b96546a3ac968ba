from jcf_nb_migration_spark.operators import (
    cleaning,
    lookup,
    merge,
    purge,
    tags,
    validate,
)

__all__ = ["cleaning", "lookup", "merge", "purge", "tags", "validate"]
