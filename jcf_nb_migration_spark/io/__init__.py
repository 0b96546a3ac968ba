from jcf_nb_migration_spark.io.readers import (
    load_star_schema,
    normalize_headers,
    read_csv,
    read_parquet,
)
from jcf_nb_migration_spark.io.docstore import (
    docstore_append,
    docstore_attach,
    docstore_build,
    docstore_compact,
    docstore_fetch,
    docstore_maintain,
)
from jcf_nb_migration_spark.io.lexical import (
    bm25_probe,
    lexical_index_append,
    lexical_index_attach,
    lexical_index_build,
    lexical_index_compact,
    lexical_index_maintain,
    phrase_probe,
    positional_index_append,
    positional_index_attach,
    positional_index_build,
    proximity_probe,
)
from jcf_nb_migration_spark.io.writers import (
    write_distinct_value_lists,
    write_single_csv,
)

__all__ = [
    "bm25_probe",
    "docstore_append",
    "docstore_attach",
    "docstore_build",
    "docstore_compact",
    "docstore_fetch",
    "docstore_maintain",
    "lexical_index_append",
    "lexical_index_attach",
    "lexical_index_build",
    "lexical_index_compact",
    "lexical_index_maintain",
    "phrase_probe",
    "positional_index_append",
    "positional_index_attach",
    "positional_index_build",
    "proximity_probe",
    "load_star_schema",
    "normalize_headers",
    "read_csv",
    "read_parquet",
    "write_distinct_value_lists",
    "write_single_csv",
]
