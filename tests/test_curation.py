"""Targeted semantics tests for the curation suite (queries/curation_ops
+ functions/pii + dedup.semdedup_flags). The cross-engine oracle match
is covered for every query by test_query_oracles; these tests pin the
*behavioral* contracts the hash comparison can't express."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _q(name):
    from jcf_nb_migration_spark.registry import get
    return get(name)


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------

def test_pii_scrub_masks_and_counts(spark):
    from jcf_nb_migration_spark.functions import pii as P

    df = spark.createDataFrame(
        [(1, "mail a.b-c%d@ex-1.co.uk and 10.0.0.1 and 800-555-1234 end"),
         (2, "no pii here"),
         (3, "two ips 1.2.3.4 5.6.7.8 two mails a@b.io c@d.ai")],
        ["id", "txt"])
    counts = P.pii_counts("txt")
    out = df.select(
        "id", P.pii_scrub("txt").alias("masked"),
        counts["email"].alias("ne"), counts["ip"].alias("ni"),
        counts["phone"].alias("np")).orderBy("id").collect()
    assert out[0]["masked"] == "mail <EMAIL> and <IP> and <PHONE> end"
    assert (out[0]["ne"], out[0]["ni"], out[0]["np"]) == (1, 1, 1)
    assert out[1]["masked"] == "no pii here"
    assert (out[1]["ne"], out[1]["ni"], out[1]["np"]) == (0, 0, 0)
    assert out[2]["masked"] == "two ips <IP> <IP> two mails <EMAIL> <EMAIL>"
    assert (out[2]["ne"], out[2]["ni"], out[2]["np"]) == (2, 2, 0)


def test_pii_scrub_duckdb_parity_on_edge_strings(duck_small):
    """Byte-identical masking in DuckDB (RE2) for strings that probe the
    dialect edges: boundary digits, dots adjacent to IPs, ports."""
    from jcf_nb_migration_spark.functions import pii as P

    cases = [
        "v1.2.3.4.5 looks like a version",     # 5 dotted groups
        "ip 10.1.2.3. end of sentence",         # trailing dot
        "x123-456-7890y has no boundary",       # \b must NOT fire
        "call 123-456-7890.",                   # punctuation boundary
        "a@b.co, c@d.museum; end",              # punctuation after email
    ]
    import duckdb
    con = duckdb.connect()
    for s in cases:
        got = con.execute(
            "SELECT " + P.sql_pii_scrub("s") + " AS m FROM (SELECT ?::VARCHAR AS s)",
            [s]).fetchone()[0]
        import re
        expect = s
        for _, pat, repl in P.PII_PATTERNS:
            expect = re.sub(pat, repl, expect)
        assert got == expect, (s, got, expect)


# ---------------------------------------------------------------------------
# Decontamination
# ---------------------------------------------------------------------------

def test_decontaminate_flags_benchmark_overlap(spark):
    out = _q("decontaminate_ngrams").fn(spark, SF_SMALL)
    rows = {r["doc_id"]: r for r in out.collect()}
    from jcf_nb_migration_spark.queries.curation_ops import BENCH_SOURCE
    # benchmark docs never appear in the output
    src = {r["source"] for r in rows.values()}
    assert BENCH_SOURCE not in src and len(src) > 0
    # fraction is consistent with the counts, and bounded
    for r in rows.values():
        assert 0 <= r["n_contaminated"] <= r["n_ngrams"]
        assert 0.0 <= r["contamination_frac"] <= 1.0
        assert r["contaminated"] == (r["n_contaminated"] >= 1)


def test_decontaminate_catches_planted_duplicate(spark):
    """A training doc sharing a 5-gram window with a benchmark doc must
    be flagged; disjoint-vocab docs must not."""
    from jcf_nb_migration_spark.functions import text as T
    from jcf_nb_migration_spark.queries.curation_ops import DECON_N

    bench_text = "alpha beta gamma delta epsilon zeta"
    dirty = "xx " + " ".join(bench_text.split()[:DECON_N]) + " yy"
    clean = "one two three four five six seven"
    docs = spark.createDataFrame(
        [(0, bench_text, "bench"), (1, dirty, "train"), (2, clean, "train")],
        ["doc_id", "text", "source"])
    grams = docs.select(
        "doc_id", "source",
        F.explode(F.array_distinct(
            T.word_shingles(T.tokens("text"), DECON_N))).alias("ngram"))
    bench = (grams.where(F.col("source") == "bench")
             .select("ngram").distinct().withColumn("__hit", F.lit(1)))
    per_doc = (grams.where(F.col("source") != "bench")
               .join(bench, "ngram", "left").groupBy("doc_id")
               .agg(F.count("__hit").alias("n_cont")))
    got = {r["doc_id"]: r["n_cont"] for r in per_doc.collect()}
    assert got[1] >= 1 and got[2] == 0


# ---------------------------------------------------------------------------
# Repetition stats
# ---------------------------------------------------------------------------

def test_repetition_stats_on_crafted_docs(spark):
    out = _q("doc_repetition_stats").fn(spark, SF_SMALL).collect()
    for r in out:
        assert 0.0 <= r["dup_token_frac"] < 1.0
        assert r["top2_char_frac"] >= 0.0
        assert 0.0 <= r["dup5_char_frac"] <= 1.0


def test_repetition_detects_looping_doc(spark):
    """A doc that is one phrase looping must score far above a
    non-repeating doc on every metric."""
    loop = " ".join(["spam ham"] * 20)           # 'spam ham' * 20
    flat = " ".join(f"w{i}" for i in range(40))  # all-distinct tokens
    docs = spark.createDataFrame(
        [(0, loop), (1, flat)], ["doc_id", "text"])

    from jcf_nb_migration_spark.functions import text as T
    toks = T.tokens("text")
    base = docs.select(
        "doc_id",
        (F.size(toks) - F.size(F.array_distinct(toks))).alias("dups"))
    got = {r["doc_id"]: r["dups"] for r in base.collect()}
    assert got[0] == 38 and got[1] == 0  # 40 tokens, 2 distinct vs none


# ---------------------------------------------------------------------------
# SemDeDup
# ---------------------------------------------------------------------------

def test_semdedup_keeps_min_id_per_neardup_group(spark):
    """Within a cluster, every dropped vector must have a kept lower-id
    neighbor above threshold; every kept vector must have none."""
    from jcf_nb_migration_spark.functions.dedup import semdedup_flags

    # Two tight groups + one singleton, in an obvious 2-cluster layout.
    rows = [
        (0, [1.0, 0.0, 0.0]), (1, [0.999, 0.01, 0.0]),   # near-dups
        (2, [0.0, 1.0, 0.0]), (3, [0.01, 0.999, 0.0]),   # near-dups
        (4, [0.7, 0.7, 0.2]),                            # looser
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    centroids = [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])]
    out = {r["vec_id"]: r for r in
           semdedup_flags(emb, centroids, threshold=0.99).collect()}
    assert out[0]["kept"] and not out[1]["kept"]   # 1 dropped for 0
    assert out[2]["kept"] and not out[3]["kept"]   # 3 dropped for 2
    assert out[4]["kept"]                          # below threshold
    assert out[1]["cluster"] == 0 and out[3]["cluster"] == 1


def test_semdedup_prune_query_drops_some(spark):
    out = _q("semdedup_prune").fn(spark, SF_SMALL)
    agg = out.groupBy("kept").count().collect()
    counts = {r["kept"]: r["count"] for r in agg}
    assert counts.get(True, 0) > 0 and counts.get(False, 0) > 0
    assert sum(counts.values()) == 500


# ---------------------------------------------------------------------------
# Mixture sampling
# ---------------------------------------------------------------------------

def test_mixture_sample_is_deterministic_and_budgeted(spark):
    q = _q("corpus_mixture_sample")
    a = {r["doc_id"] for r in q.fn(spark, SF_SMALL).collect()}
    b = {r["doc_id"] for r in q.fn(spark, SF_SMALL).collect()}
    assert a == b and len(a) > 0

    # kept-token mass per source must be ≈ rate * src_tokens: the
    # hash is uniform so allow generous slack, but every source must
    # be down-sampled (rate < 1 here since budget = total/(2*S) and
    # sources are balanced).
    out = q.fn(spark, SF_SMALL)
    rates = {r["source"]: r["sample_rate"]
             for r in out.select("source", "sample_rate").distinct().collect()}
    assert all(0.0 < v < 1.0 for v in rates.values())


# ---------------------------------------------------------------------------
# Bloom-filter incremental dedup
# ---------------------------------------------------------------------------

def test_bloom_incremental_dedup_no_false_negatives(spark):
    from jcf_nb_migration_spark.queries.curation_ops import BLOOM_OLD_MAX

    out = _q("bloom_incremental_dedup").fn(spark, SF_SMALL).cache()
    # a Bloom filter may lie "maybe" but never "no": every known doc
    # must be flagged
    assert out.where(F.col("is_known")
                     & ~F.col("bloom_maybe_dup")).count() == 0
    # false positives are exactly (maybe ∧ ¬known)
    assert out.where(F.col("false_positive")
                     != (F.col("bloom_maybe_dup")
                         & ~F.col("is_known"))).count() == 0
    # and stay a small fraction of the genuinely-new docs
    new = out.where(~F.col("is_known"))
    n_new = new.count()
    n_fp = new.where(F.col("false_positive")).count()
    assert n_new > 0 and n_fp / n_new < 0.15
    # re-delivered half of the corpus is recognized
    assert out.where(F.col("is_known")).count() > 0
    assert out.count() > BLOOM_OLD_MAX
    out.unpersist()


def test_duplicate_spans_planted_run(spark, tmp_path):
    """Property fixture: two docs sharing exactly one planted 12-token
    run (disjoint vocabularies otherwise) yield exactly one maximal
    span with the right positions and length; a third unrelated doc
    contributes nothing."""
    import os

    shared = [f"s{i}" for i in range(12)]
    a = [f"a{i}" for i in range(5)] + shared + [f"a{i}" for i in range(5, 9)]
    b = [f"b{i}" for i in range(2)] + shared + [f"b{i}" for i in range(2, 10)]
    c = [f"c{i}" for i in range(30)]
    df = spark.createDataFrame(
        [(1, " ".join(a), "en", "srcX", len(" ".join(a))),
         (2, " ".join(b), "en", "srcX", len(" ".join(b))),
         (3, " ".join(c), "en", "srcX", len(" ".join(c)))],
        "doc_id long, text string, lang string, source string, n_chars long")
    d = str(tmp_path / "docs")
    os.makedirs(d, exist_ok=True)
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet"))

    from jcf_nb_migration_spark.registry import all_queries
    rows = all_queries()["duplicate_spans"].fn(spark, d).collect()
    assert len(rows) == 1
    r = rows[0]
    # 1-based starts: shared run begins at token 6 of doc 1, token 3 of doc 2
    assert (r.doc_a, r.doc_b, r.start_a, r.start_b, r.run_len) == \
        (1, 2, 6, 3, 12)


def test_source_sampling_weights_zero_token_source_is_null(spark, tmp_path):
    """A source whose documents are all empty/whitespace has zero
    tokens: its weight is 0 and its oversample factor NULL (0/0 would
    be NaN, whose propagation and hash treatment differ across
    engines), while non-empty sources are unaffected."""
    from jcf_nb_migration_spark.registry import get

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma", "en", "web", 16),
         (2, "delta epsilon", "en", "web", 13),
         (3, "", "en", "empty_src", 0),
         (4, "   ", "en", "empty_src", 3)],
        "doc_id long, text string, lang string, source string,"
        " n_chars long")
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = {r["source"]: r for r in
            get("source_sampling_weights").fn(spark, str(tmp_path))
            .collect()}
    assert rows["empty_src"]["n_tokens"] == 0
    assert rows["empty_src"]["weight"] == 0.0
    assert rows["empty_src"]["oversample_factor"] is None
    assert rows["web"]["oversample_factor"] is not None


def test_lsh_incremental_dedup_planted(spark, tmp_path):
    """Planted truth for the incremental-ingest shape: a batch doc
    that is a near-copy of a standing doc must match it (and only
    it); a distinct batch doc must come back clean."""
    from jcf_nb_migration_spark.queries.curation_ops import LSH_OLD_MAX
    from jcf_nb_migration_spark.registry import get

    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep dark forest tonight")
    near = base + " again"          # one extra shingle — high Jaccard
    other = ("completely different content about spark partitions "
             "and shuffle boundaries with no overlap whatsoever here")
    docs = spark.createDataFrame(
        [(1, base, "en", "web", len(base)),
         (2, other, "en", "web", len(other)),
         (LSH_OLD_MAX + 1, near, "en", "web", len(near)),
         (LSH_OLD_MAX + 2, "tiny unrelated note", "en", "web", 19)],
        "doc_id long, text string, lang string, source string,"
        " n_chars long")
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = {r["doc_id"]: r for r in
            get("lsh_incremental_dedup").fn(spark, str(tmp_path)).collect()}
    assert set(rows) == {LSH_OLD_MAX + 1, LSH_OLD_MAX + 2}
    hit = rows[LSH_OLD_MAX + 1]
    assert hit["is_dup"] and hit["match_id"] == 1
    assert hit["match_jaccard"] > 0.5
    clean = rows[LSH_OLD_MAX + 2]
    assert not clean["is_dup"] and clean["match_id"] is None
