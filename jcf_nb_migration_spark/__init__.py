"""jcf_nb_migration_spark — a PySpark-native analytics/ETL engine.

A ground-up rebuild, on Apache Spark, of the query and data-processing
capabilities of the reference migration pipeline
(``brianspurling/jcf-nb-migration``, see SURVEY.md), extended with the
large-scale training-data operators (dedup, similarity search, text
analysis, multimodal columns) a 100 TB pipeline needs.

Design stance (SURVEY.md §7): everything is a lazy DataFrame expression
tree. Control-plane metadata (the reference's "STM" spreadsheet) is
compiled on the driver into column rules; Catalyst does all optimization.
No RDDs, no row-at-a-time Python in the hot path.
"""

from jcf_nb_migration_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
