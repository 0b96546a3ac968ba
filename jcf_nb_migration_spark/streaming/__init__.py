from jcf_nb_migration_spark.streaming import events

__all__ = ["events"]
