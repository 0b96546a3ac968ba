"""Semantics tests for the retrieval/model-scoring suite beyond the
oracle hash checks (tests/test_query_oracles.py covers exact parity)."""

from pyspark.sql import functions as F

from jcf_nb_migration_spark.queries import retrieval_ops as R
from tests.conftest import SF_SMALL


def test_bm25_scores_positive_and_ranked(spark):
    out = R.bm25_top_docs(spark, SF_SMALL).collect()
    assert 0 < len(out) <= 20
    scores = [r.bm25 for r in out]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)  # BM25 idf(1+...) is always > 0
    assert all(1 <= r.n_terms_matched <= len(R.BM25_TERMS) for r in out)


def test_bm25_matching_all_terms_beats_one(spark):
    """A doc matching every query term with decent tf should outrank a
    doc matching a single term once — check the top doc matches more
    terms than the minimum present in the result."""
    out = R.bm25_top_docs(spark, SF_SMALL).collect()
    assert out[0].n_terms_matched == max(r.n_terms_matched for r in out)


def test_inverted_index_postings_capped_and_consistent(spark):
    out = R.inverted_index_postings(spark, SF_SMALL).collect()
    assert len(out) > 0
    for r in out:
        ids = r.top_postings.split(",")
        assert 1 <= len(ids) <= 8
        assert len(ids) == min(r.df, 8)
        assert r.total_tf >= r.df  # each posting has tf >= 1


def test_heavy_hitters_sketch_is_exact_on_fixture(spark):
    out = R.heavy_hitters_topk(spark, SF_SMALL).collect()
    assert len(out) == 10
    assert all(r.in_sketch and r.est_exact for r in out)
    counts = [r.exact_count for r in out]
    assert counts == sorted(counts, reverse=True)


def test_linear_model_prob_bounds_and_null_free(spark):
    out = R.doc_quality_linear_model(spark, SF_SMALL)
    bad = out.where((F.col("quality_prob") <= 0)
                    | (F.col("quality_prob") >= 1)
                    | F.col("quality_prob").isNull()).count()
    assert bad == 0
    # every doc with tokens gets a score
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    assert out.count() == docs.where(F.trim("text") != "").count()


def test_boilerplate_coverage_duplicate_docs_fully_covered(spark):
    """Exact duplicate documents (the fixture plants some) share all
    their n-grams, so with BOIL_MIN_DOCS <= the duplicate-group size
    their coverage should be 1.0; and coverage is always in [0, 1]."""
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    dup_texts = (docs.groupBy("text")
                 .agg(F.countDistinct("doc_id").alias("n"),
                      F.min(F.size(F.split("text", r"\s+"))).alias("len"))
                 .where((F.col("n") >= R.BOIL_MIN_DOCS)
                        & (F.col("len") >= R.BOIL_N)))
    out = R.doc_boilerplate_coverage(spark, SF_SMALL)
    assert out.where((F.col("coverage_frac") < 0)
                     | (F.col("coverage_frac") > 1)).count() == 0
    if dup_texts.count() > 0:
        dup_ids = (docs.join(dup_texts.select("text"), "text", "left_semi")
                   .select("doc_id"))
        cov = (out.join(dup_ids, "doc_id", "left_semi")
               .agg(F.min("coverage_frac").alias("m")).head().m)
        assert cov == 1.0
