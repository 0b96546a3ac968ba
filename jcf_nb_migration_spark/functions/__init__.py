from jcf_nb_migration_spark.functions import dedup, similarity, text

__all__ = ["dedup", "similarity", "text"]
