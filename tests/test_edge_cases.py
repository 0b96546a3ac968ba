"""Degenerate-input robustness: flagship operators on EMPTY tables
must return empty results (correct schema), not crash — the property
that matters when a filter chain or a partition-pruned read legitimately
yields zero rows mid-pipeline at scale."""

import os

import pytest

from jcf_nb_migration_spark.registry import all_queries

EMPTY_QUERIES = [
    "dedup_exact",
    "minhash_lsh_dedup",
    "duplicate_spans",
    "decontaminate_ngrams",
    "doc_token_stats",
    "curation_funnel",
    "doc_repetition_stats",
    "bm25_top_docs",
    "rrf_fusion",
]


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    """A fixture dir whose documents/embeddings tables have the right
    schemas and ZERO rows."""
    d = str(tmp_path_factory.mktemp("empty_sf"))
    docs = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string,"
            " n_chars long")
    emb = spark.createDataFrame(
        [], "vec_id long, embedding array<float>, label int")
    docs.write.parquet(os.path.join(d, "documents.parquet"))
    emb.write.parquet(os.path.join(d, "embeddings.parquet"))
    return d


@pytest.mark.parametrize("name", EMPTY_QUERIES)
def test_query_on_empty_documents(spark, empty_sf_dir, name):
    q = all_queries()[name]
    out = q.fn(spark, empty_sf_dir)
    rows = out.collect()
    if name == "curation_funnel":
        # the funnel still reports its stages — with zero counts
        assert [r.n_in for r in rows] == [0, 0, 0, 0]
    else:
        assert rows == []
    assert len(out.columns) > 0  # schema survives the empty input


class TestNewDedupEdges:
    def test_containment_single_doc_empty(self, spark):
        from jcf_nb_migration_spark.functions import dedup as D

        df = spark.createDataFrame(
            [(1, "only one document here with several words inside")],
            "doc_id long, text string")
        assert D.containment_pairs(df, "doc_id", "text").count() == 0

    def test_containment_short_docs_no_crash(self, spark):
        """Docs below the shingle width produce no shingles and must
        simply be absent from the pair space."""
        from jcf_nb_migration_spark.functions import dedup as D

        df = spark.createDataFrame(
            [(1, "a b"), (2, "a b"), (3, ""),
             (4, "three tokens exactly here now plus padding words")],
            "doc_id long, text string")
        rows = D.containment_pairs(df, "doc_id", "text").collect()
        ids = {i for r in rows for i in (r.id_a, r.id_b)}
        assert 1 not in ids and 2 not in ids and 3 not in ids

    def test_paragraph_dedup_single_chunk_doc(self, spark):
        """A doc shorter than one chunk width survives verbatim."""
        from pyspark.sql import Window as W
        from pyspark.sql import functions as F
        from jcf_nb_migration_spark.functions import text as T
        from jcf_nb_migration_spark.queries.text_analysis import PARA_W

        df = spark.createDataFrame([(7, "tiny doc")],
                                   "doc_id long, text string")
        d = df.select("doc_id", T.tokens("text").alias("w"))
        ch = d.where(F.size("w") > 0).select(
            "doc_id", F.posexplode(F.expr(
                f"transform(sequence(0, (size(w)-1) div {PARA_W}),"
                f" i -> array_join(slice(w, i*{PARA_W}+1, {PARA_W}),"
                f" ' '))")).alias("chunk_idx", "chunk"))
        rows = ch.collect()
        assert len(rows) == 1 and rows[0].chunk == "tiny doc"


def test_cogroup_asof_handles_one_sided_users(spark, tmp_path):
    """r13 regression (found by the driver's fixture regeneration): in
    cogrouped applyInPandas an EMPTY side arrives as a pandas frame
    WITHOUT columns. An error-only user must emit its errors with NULL
    click_id (the oracle's LAST_VALUE ... IGNORE NULLS with no prior
    click), a click-only user must emit nothing, and a two-sided user
    must as-of match — pinned on a synthetic events table so the fix
    never depends on fixture luck again."""
    import os

    from pyspark.sql import functions as F

    rows = [
        # user 1: error-only (the empty-click-side case)
        (1, 101, "error", "2024-01-01 00:00:05"),
        # user 2: click-only (empty-error-side case)
        (2, 201, "click", "2024-01-01 00:00:01"),
        # user 3: click then error -> error matches the click
        (3, 301, "click", "2024-01-01 00:00:01"),
        (3, 302, "error", "2024-01-01 00:00:09"),
        # user 4: error BEFORE any click -> NULL match
        (4, 401, "error", "2024-01-01 00:00:01"),
        (4, 402, "click", "2024-01-01 00:00:09"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, event_type string, s string"
    ).select("user_id", "event_id", "event_type",
             F.col("s").cast("timestamp").alias("ts"))
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    ev.write.parquet(os.path.join(sf_dir, "events.parquet"))

    from jcf_nb_migration_spark.registry import get

    out = {r["error_id"]: r["click_id"]
           for r in get("cogroup_asof_pandas").fn(spark, sf_dir).collect()}
    assert out == {101: None, 302: 301, 401: None}
    # count-only consumption: Spark 4.1 prunes the cogroup's right
    # side to its grouping key in this plan shape (no output column
    # read) — the UDF must tolerate column-pruned inputs and still
    # emit one row per error.
    assert get("cogroup_asof_pandas").fn(spark, sf_dir).count() == 3
