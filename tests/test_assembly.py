"""Semantics tests for the corpus-assembly suite (queries/packing_ops).
The cross-engine oracle match is covered for every query by
test_query_oracles; these pin the behavioral invariants the hash
comparison can't express — packing conservation, chunk coverage, split
partitioning, shuffle permutation, and DSIR target separation."""

from pyspark.sql import functions as F

from jcf_nb_migration_spark.queries import packing_ops as PK
from tests.conftest import SF_SMALL


def _run(name, spark, sf_dir=SF_SMALL):
    from jcf_nb_migration_spark.registry import get
    return get(name).fn(spark, sf_dir)


def _doc_tokens(spark, sf_dir=SF_SMALL):
    from jcf_nb_migration_spark.functions import text as T
    from jcf_nb_migration_spark.registry import t
    return (t(spark, sf_dir, "documents")
            .select("doc_id", F.size(T.tokens("text")).alias("n_tok")))


# ---------------------------------------------------------------------------
# sequence_packing
# ---------------------------------------------------------------------------

def test_packing_conserves_tokens(spark):
    out = _run("sequence_packing", spark).cache()
    toks = _doc_tokens(spark)
    total = toks.agg(F.sum("n_tok")).first()[0]
    # every token lands in exactly one sequence
    assert out.agg(F.sum("n_tok_in_chunk")).first()[0] == total
    # per-doc contributions add back to the doc's token count
    per_doc = out.groupBy("doc_id").agg(
        F.sum("n_tok_in_chunk").alias("s")).join(toks, "doc_id")
    assert per_doc.where(F.col("s") != F.col("n_tok")).count() == 0
    out.unpersist()


def test_packing_sequences_are_full(spark):
    out = _run("sequence_packing", spark).cache()
    per_chunk = out.groupBy("chunk_id").agg(
        F.sum("n_tok_in_chunk").alias("s"))
    last = per_chunk.agg(F.max("chunk_id")).first()[0]
    # all but the final sequence are exactly SEQLEN tokens
    bad = per_chunk.where((F.col("chunk_id") != last)
                          & (F.col("s") != PK.SEQLEN)).count()
    assert bad == 0
    tail = per_chunk.where(F.col("chunk_id") == last).first()["s"]
    assert 1 <= tail <= PK.SEQLEN
    # chunk ids are dense 0..last
    assert per_chunk.count() == last + 1
    out.unpersist()


def test_packing_boundary_flags(spark):
    out = _run("sequence_packing", spark).cache()
    # each doc starts exactly once and ends exactly once
    flags = out.groupBy("doc_id").agg(
        F.sum(F.col("starts_here").cast("int")).alias("ns"),
        F.sum(F.col("ends_here").cast("int")).alias("ne"))
    assert flags.where((F.col("ns") != 1) | (F.col("ne") != 1)).count() == 0
    # rows that neither start nor end a doc span a whole sequence
    mid = out.where(~F.col("starts_here") & ~F.col("ends_here"))
    assert mid.where(F.col("n_tok_in_chunk") != PK.SEQLEN).count() == 0
    out.unpersist()


# ---------------------------------------------------------------------------
# doc_chunk_overlap
# ---------------------------------------------------------------------------

def test_chunk_overlap_covers_every_token(spark):
    out = _run("doc_chunk_overlap", spark).cache()
    toks = _doc_tokens(spark).where(F.col("n_tok") > 0)
    # chunk starts advance by STRIDE; last chunk reaches the final token:
    # max(start) + chunk_len(last) >= n_tok, i.e. coverage is complete
    agg = out.groupBy("doc_id").agg(
        F.max("chunk_idx").alias("last_idx"),
        F.count(F.lit(1)).alias("n_chunks"))
    j = agg.join(toks, "doc_id")
    # chunk count matches the closed-form ceil formula
    expected = (F.floor((F.greatest(F.col("n_tok") - PK.CHUNK_LEN,
                                    F.lit(0))
                         + PK.CHUNK_STRIDE - 1) / PK.CHUNK_STRIDE) + 1)
    assert j.where(F.col("n_chunks") != expected).count() == 0
    assert j.where(F.col("n_chunks") != F.col("last_idx") + 1).count() == 0
    # every chunk except possibly the last is exactly CHUNK_LEN long
    last = out.groupBy("doc_id").agg(F.max("chunk_idx").alias("li"))
    nonlast = out.join(last, "doc_id").where(F.col("chunk_idx") < F.col("li"))
    assert nonlast.where(F.col("chunk_len") != PK.CHUNK_LEN).count() == 0
    # final chunk covers through the last token
    lastrow = (out.join(last, "doc_id")
               .where(F.col("chunk_idx") == F.col("li")).join(toks, "doc_id"))
    bad = lastrow.where(F.col("chunk_idx") * PK.CHUNK_STRIDE
                        + F.col("chunk_len") < F.col("n_tok")).count()
    assert bad == 0
    out.unpersist()


# ---------------------------------------------------------------------------
# corpus_split_assign / corpus_global_shuffle
# ---------------------------------------------------------------------------

def test_split_partitions_corpus(spark):
    out = _run("corpus_split_assign", spark)
    toks = _doc_tokens(spark)
    n_docs, n_toks = toks.agg(F.count(F.lit(1)), F.sum("n_tok")).first()
    got = out.agg(F.sum("n_docs"), F.sum("n_tokens")).first()
    assert (got[0], got[1]) == (n_docs, n_toks)
    splits = {r["split"] for r in out.select("split").distinct().collect()}
    assert splits <= {"train", "valid", "test"}
    # train dominates by construction (98% of hash space)
    per = dict(out.groupBy("split").agg(F.sum("n_docs").alias("n"))
               .rdd.map(lambda r: (r["split"], r["n"])).collect())
    assert per.get("train", 0) > 0.9 * n_docs


def test_shuffle_is_permutation(spark):
    out = _run("corpus_global_shuffle", spark).cache()
    n = _doc_tokens(spark).count()
    assert out.count() == n
    assert out.select("doc_id").distinct().count() == n
    # pos is dense 1..count within each shard
    per = out.groupBy("shard").agg(F.count(F.lit(1)).alias("c"),
                                   F.min("pos").alias("lo"),
                                   F.max("pos").alias("hi"))
    assert per.where((F.col("lo") != 1) | (F.col("hi") != F.col("c"))) \
              .count() == 0
    assert per.count() <= PK.NSHARDS
    # deterministic: a second run is identical
    again = _run("corpus_global_shuffle", spark)
    assert out.exceptAll(again).count() == 0
    out.unpersist()


# ---------------------------------------------------------------------------
# dsir_importance
# ---------------------------------------------------------------------------

def test_dsir_separates_target_from_raw(spark):
    out = _run("dsir_importance", spark)
    m = (out.where(F.col("n_tok") > 0).groupBy(F.col("lang") == "en")
         .agg(F.avg("importance").alias("imp")).collect())
    by = {r[0]: r["imp"] for r in m}
    # English docs (the target distribution) must score higher on
    # average than the rest — the separation DSIR exists to produce
    assert by[True] > by[False]
