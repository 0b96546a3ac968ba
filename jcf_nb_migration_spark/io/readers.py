"""Sources (SURVEY.md §2.1 S1–S3).

The reference reads one big CSV plus small metadata CSVs
(reference main.py:183-251, main.py:163-180). Here:

- ``read_csv`` is the S1 equivalent: explicit schema (or all-string),
  header normalization (P5: strip embedded newlines, main.py:206-207),
  multiLine-aware. At scale prefer parquet — multiLine CSV cannot be
  split, so each file is one task.
- ``read_parquet`` is the engine's primary scan: splittable, column
  pruning and predicate pushdown reach the row groups.
- ``load_star_schema`` binds the synthetic test tables.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def normalize_headers(df: DataFrame) -> DataFrame:
    """P5: strip embedded newlines/CRs from column names before any
    rule matching (reference main.py:206-207)."""
    cleaned = [c.replace("\n", "").replace("\r", "") for c in df.columns]
    if cleaned == list(df.columns):
        return df
    return df.toDF(*cleaned)


def all_string_schema(columns: list[str]) -> StructType:
    """The reference's untyped model (SURVEY.md §1.2): every column is a
    string; missing is NULL internally and '' only at the sink."""
    return StructType([StructField(c, StringType(), True) for c in columns])


def read_csv(spark: SparkSession, path: str,
             schema: StructType | None = None,
             multi_line: bool = True,
             all_string: bool = False) -> DataFrame:
    """S1 CSV scan. ``multi_line=True`` handles embedded newlines in
    values (the reason reference main.py:376-378 scrubs \\t\\n\\r) at the
    cost of unsplittable files — keep CSV inputs small, convert to
    parquet for the fact path."""
    reader = (spark.read
              .option("header", True)
              .option("multiLine", multi_line)
              .option("escape", '"')
              .option("mode", "PERMISSIVE"))
    if schema is not None:
        reader = reader.schema(schema)
    elif all_string:
        # Read header first (cheap: limit 0 scan), then force strings —
        # the reference's dtype override generalized (main.py:199-202).
        # The sniff read needs the same multiLine/escape options or a
        # quoted header containing a newline would split.
        header_df = (spark.read.option("header", True)
                     .option("multiLine", multi_line)
                     .option("escape", '"')
                     .option("inferSchema", False).csv(path).limit(0))
        reader = reader.schema(all_string_schema(list(header_df.columns)))
    else:
        reader = reader.option("inferSchema", False)
    return normalize_headers(reader.csv(path))


def read_parquet(spark: SparkSession, path: str,
                 merge_schema: bool = False) -> DataFrame:
    """merge_schema=True unions the schemas of every file footer
    (schema evolution: a corpus whose later shards added columns reads
    as one frame, old shards yielding NULL for the new columns).
    Off by default — merging reads every footer up front, and for
    schema-stable tables the single sampled footer is the cheap,
    correct path."""
    return (spark.read.option("mergeSchema", str(merge_schema).lower())
            .parquet(path))


def read_jsonl(spark: SparkSession, path: str,
               schema: StructType | str | None = None) -> DataFrame:
    """JSONL (one JSON object per line) — the de-facto interchange
    format for LLM training corpora. Line-delimited JSON is splittable
    (unlike multiLine JSON arrays), so a 100 TB corpus parallelizes at
    the line level. Always pass a schema in production: without one
    Spark runs a full inference pre-pass over the data (twice the
    I/O), and schema drift across files silently widens types.
    Corrupt lines land in ``_corrupt_record`` instead of failing the
    job (PERMISSIVE), so a bad shard can't kill a corpus-wide run."""
    reader = (spark.read
              .option("mode", "PERMISSIVE")
              .option("columnNameOfCorruptRecord", "_corrupt_record"))
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def load_star_schema(spark: SparkSession, sf_dir: str,
                     tables: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    """Load the synthetic star schema from a scale-factor directory and
    register temp views so both the DataFrame API and spark.sql see them."""
    out: dict[str, DataFrame] = {}
    for t in tables:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            df = spark.read.parquet(p)
            df.createOrReplaceTempView(t)
            out[t] = df
    return out
