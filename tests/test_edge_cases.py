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
