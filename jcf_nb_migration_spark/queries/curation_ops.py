"""Training-data curation queries: benchmark decontamination, Gopher-
style repetition filters, semantic dedup (SemDeDup), PII scrubbing, and
token-budget mixture sampling.

These are the corpus-hygiene passes an LLM data pipeline runs between
raw crawl and tokenizer — each one formulated as declarative DataFrame
ops (equi-joins on bounded keys, one-shuffle aggregations, codegen'd
regex/array expressions) so the same plan that verifies here against a
DuckDB oracle at sf0.01 runs at scan bandwidth on a 100 TB corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from jcf_nb_migration_spark.functions import dedup as D
from jcf_nb_migration_spark.functions import pii as P
from jcf_nb_migration_spark.functions import text as T
from jcf_nb_migration_spark.queries.advanced2 import _SQL_IVF_ASSIGNED
from jcf_nb_migration_spark.queries.packing_ops import (
    SPLIT_MOD, TEST_LO, VALID_LO,
)
from jcf_nb_migration_spark.queries.similarity_search import (
    _sql_cos,
    _sql_kmeans_cte,
)
from jcf_nb_migration_spark.queries.text_analysis import (
    _SQL_TOKS, _sql_bands_cte, _sql_minhash_sig_cte,
)
from jcf_nb_migration_spark.registry import query, spread, t

# Which documents play the held-out eval benchmark in the
# decontamination fixture: one source's docs. In production this is the
# actual benchmark suite (MMLU/GSM8K/...) — a tiny table relative to
# the corpus.
BENCH_SOURCE = "src0"
DECON_N = 5  # n-gram order; GPT-3/Llama reports use 8-13 on real text


def _sql_ngrams(n: int, distinct: bool) -> str:
    """DuckDB n-word-gram list over `w` (token list column); mirrors
    functions.text.word_shingles (DuckDB slices are inclusive:
    w[i:i+n-1] is n tokens)."""
    inner = (f"list_transform(generate_series(1, len(w)-{n - 1}),"
             f" i -> array_to_string(w[i:i+{n - 1}], ' '))")
    if distinct:
        inner = f"list_distinct({inner})"
    return f"CASE WHEN len(w) >= {n} THEN {inner} ELSE [] END"


@query(
    "decontaminate_ngrams",
    oracle=f"""
    WITH g AS (
        SELECT doc_id, source,
               unnest({_sql_ngrams(DECON_N, distinct=True)}) AS ngram
        FROM (SELECT doc_id, source, {_SQL_TOKS} AS w FROM documents)
    ),
    bench AS (
        SELECT DISTINCT ngram FROM g WHERE source = '{BENCH_SOURCE}'
    ),
    per_doc AS (
        SELECT g.doc_id, count(*) AS n_ngrams,
               count(b.ngram) AS n_contaminated
        FROM g LEFT JOIN bench b ON g.ngram = b.ngram
        WHERE g.source <> '{BENCH_SOURCE}'
        GROUP BY g.doc_id
    )
    SELECT d.doc_id, d.source,
           COALESCE(p.n_ngrams, 0) AS n_ngrams,
           COALESCE(p.n_contaminated, 0) AS n_contaminated,
           CASE WHEN COALESCE(p.n_ngrams, 0) > 0
                THEN CAST(p.n_contaminated AS DOUBLE) / p.n_ngrams
                ELSE 0.0 END AS contamination_frac,
           COALESCE(p.n_contaminated, 0) >= 1 AS contaminated
    FROM documents d LEFT JOIN per_doc p ON p.doc_id = d.doc_id
    WHERE d.source <> '{BENCH_SOURCE}'
    """,
    headline=True,  # the curation suite's bench representative (r4)
    tags=("curation", "decontamination", "ngram"),
    driver_visible=False,  # rotated out r10 4th wave (green r1-r9,
    #   still bench-measured every round); the shingle-generation +
    #   agg/join shape stays visible via corpus_novelty_curve
)
def decontaminate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (the GPT-3/Llama report recipe): flag
    every training document sharing any {DECON_N}-token n-gram with the
    held-out benchmark set. Candidate generation is an equi-join on the
    n-gram string — linear in corpus size, shuffled on the n-gram key;
    the benchmark side is benchmark-suite-sized (tiny vs the corpus),
    so AQE broadcasts it at runtime — no forced hint, same policy as
    the tfidf document-frequency join. Per-doc output: distinct n-gram
    count, overlapping count, contamination fraction, and the drop
    flag."""
    docs = spread(t(spark, sf_dir, "documents"))
    grams = docs.select(
        "doc_id", "source",
        F.explode(F.array_distinct(
            T.word_shingles(T.tokens("text"), DECON_N))).alias("ngram"))
    bench = (grams.where(F.col("source") == BENCH_SOURCE)
             .select("ngram").distinct()
             .withColumn("__hit", F.lit(1)))
    per_doc = (
        grams.where(F.col("source") != BENCH_SOURCE)
        .join(bench, "ngram", "left")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_ngrams"),
             F.count("__hit").alias("n_contaminated"))
    )
    base = docs.where(F.col("source") != BENCH_SOURCE) \
               .select("doc_id", "source")
    n_ngrams = F.coalesce(F.col("n_ngrams"), F.lit(0)).alias("n_ngrams")
    n_cont = F.coalesce(F.col("n_contaminated"), F.lit(0))
    return base.join(per_doc, "doc_id", "left").select(
        "doc_id", "source", n_ngrams,
        n_cont.alias("n_contaminated"),
        F.when(F.coalesce(F.col("n_ngrams"), F.lit(0)) > 0,
               F.col("n_contaminated").cast("double") / F.col("n_ngrams"))
         .otherwise(F.lit(0.0)).alias("contamination_frac"),
        (n_cont >= 1).alias("contaminated"),
    )


@query(
    "doc_repetition_stats",
    oracle=f"""
    WITH base AS (
        SELECT doc_id, length(text) AS n_chars,
               len(w) AS n_tokens, len(list_distinct(w)) AS n_distinct
        FROM (SELECT doc_id, text, {_SQL_TOKS} AS w FROM documents)
    ),
    g2 AS (
        SELECT doc_id, g, count(*) AS cnt
        FROM (SELECT doc_id,
                     unnest({_sql_ngrams(2, distinct=False)}) AS g
              FROM (SELECT doc_id, {_SQL_TOKS} AS w FROM documents))
        GROUP BY doc_id, g
    ),
    a2 AS (
        SELECT doc_id, CAST(max(cnt * length(g)) AS BIGINT) AS top2_chars
        FROM g2 GROUP BY doc_id
    ),
    g5 AS (
        SELECT doc_id, g, count(*) AS cnt
        FROM (SELECT doc_id,
                     unnest({_sql_ngrams(5, distinct=False)}) AS g
              FROM (SELECT doc_id, {_SQL_TOKS} AS w FROM documents))
        GROUP BY doc_id, g
    ),
    a5 AS (
        SELECT doc_id,
               CAST(COALESCE(SUM(CASE WHEN cnt > 1
                                 THEN cnt * length(g) END), 0) AS BIGINT)
                   AS dup5_chars,
               CAST(SUM(cnt * length(g)) AS BIGINT) AS tot5_chars
        FROM g5 GROUP BY doc_id
    )
    SELECT b.doc_id, b.n_tokens,
           CASE WHEN b.n_tokens > 0
                THEN CAST(b.n_tokens - b.n_distinct AS DOUBLE) / b.n_tokens
                ELSE 0.0 END AS dup_token_frac,
           CASE WHEN b.n_chars > 0
                THEN CAST(COALESCE(a2.top2_chars, 0) AS DOUBLE) / b.n_chars
                ELSE 0.0 END AS top2_char_frac,
           CASE WHEN COALESCE(a5.tot5_chars, 0) > 0
                THEN CAST(a5.dup5_chars AS DOUBLE) / a5.tot5_chars
                ELSE 0.0 END AS dup5_char_frac
    FROM base b
    LEFT JOIN a2 ON a2.doc_id = b.doc_id
    LEFT JOIN a5 ON a5.doc_id = b.doc_id
    """,
    tags=("curation", "quality", "repetition"),
    # rotated out of the driver window r5 (gram-explode agg pattern is
    # witnessed by decontaminate_ngrams) to make room for the
    # fuzzy-join and GD-training marquee ops; oracle-run by every pytest
    driver_visible=False,
)
def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality signals (the Gopher/MassiveText rules):
    duplicate-token fraction, characters covered by the most frequent
    2-gram, and characters inside duplicated 5-grams — the filters that
    catch boilerplate, keyword-stuffed, and looping documents.

    Zero-shuffle: every statistic is per-document, so the gram counts
    never need to leave the row. Each n-gram array is array_sort'ed and
    folded once with F.aggregate (run-length state: equal grams are
    adjacent after the sort, so a run IS an occurrence count) — a
    narrow whole-stage-codegen projection over the scan, where the
    previous shape exploded both gram orders and shuffled the full
    occurrence stream twice on (doc_id, gram). All ratios are exact-
    integer numerators over exact-integer denominators with a single
    final double division, so the oracle comparison is bitwise.
    Character coverage is occurrence-count × gram length (overlap-
    blind, the standard approximation)."""
    docs = spread(t(spark, sf_dir, "documents"))
    tokd = docs.select(
        "doc_id", F.length("text").alias("n_chars"),
        T.tokens("text").alias("w"))

    zero = F.lit(0).cast("bigint")
    one = F.lit(1).cast("bigint")

    # Most-frequent-2-gram chars: one pass over the sorted grams,
    # tracking (prev gram, current run length, best run*len so far).
    init2 = F.struct(F.lit(None).cast("string").alias("prev"),
                     zero.alias("run"), zero.alias("best"))

    def step2(acc, x):
        run = (F.when(x.eqNullSafe(acc["prev"]), acc["run"] + one)
                .otherwise(one))
        best = F.greatest(acc["best"], run * F.length(x).cast("bigint"))
        return F.struct(x.alias("prev"), run.alias("run"),
                        best.alias("best"))

    top2 = F.aggregate(F.array_sort(T.word_shingles(F.col("w"), 2)),
                       init2, step2, lambda acc: acc["best"])

    # Duplicated-5-gram chars + total 5-gram chars, same single pass:
    # when a run reaches 2 the first occurrence's chars are added
    # retroactively (cnt>1 counts ALL occurrences of the gram).
    init5 = F.struct(F.lit(None).cast("string").alias("prev"),
                     zero.alias("run"), zero.alias("dup"),
                     zero.alias("tot"))

    def step5(acc, x):
        ln = F.length(x).cast("bigint")
        run = (F.when(x.eqNullSafe(acc["prev"]), acc["run"] + one)
                .otherwise(one))
        dup = (acc["dup"]
               + F.when(run == one, zero)
                  .when(run == one + one, ln + ln)
                  .otherwise(ln))
        return F.struct(x.alias("prev"), run.alias("run"),
                        dup.alias("dup"), (acc["tot"] + ln).alias("tot"))

    g5 = F.aggregate(
        F.array_sort(T.word_shingles(F.col("w"), 5)), init5, step5,
        lambda acc: F.struct(acc["dup"].alias("dup"),
                             acc["tot"].alias("tot")))

    stats = tokd.select(
        "doc_id", "n_chars",
        F.size("w").alias("n_tokens"),
        F.size(F.array_distinct("w")).alias("n_distinct"),
        top2.alias("top2_chars"), g5.alias("g5"))
    return stats.select(
        "doc_id", "n_tokens",
        F.when(F.col("n_tokens") > 0,
               (F.col("n_tokens") - F.col("n_distinct")).cast("double")
               / F.col("n_tokens"))
         .otherwise(F.lit(0.0)).alias("dup_token_frac"),
        F.when(F.col("n_chars") > 0,
               F.col("top2_chars").cast("double") / F.col("n_chars"))
         .otherwise(F.lit(0.0)).alias("top2_char_frac"),
        F.when(F.col("g5.tot") > 0,
               F.col("g5.dup").cast("double") / F.col("g5.tot"))
         .otherwise(F.lit(0.0)).alias("dup5_char_frac"),
    )


SEMDEDUP_TAU = 0.35  # same near-dup bar as embedding_dedup_pairs


@query(
    "semdedup_prune",
    oracle=f"""
    WITH {_SQL_IVF_ASSIGNED},
    drops AS (
        SELECT DISTINCT b.vec_id AS vid
        FROM assigned a JOIN assigned b
          ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        WHERE {_sql_cos('a.embedding', 'b.embedding')} >= {SEMDEDUP_TAU}
    )
    SELECT s.vec_id, s.cluster, d.vid IS NULL AS kept
    FROM assigned s LEFT JOIN drops d ON d.vid = s.vec_id
    """,
    tags=("curation", "dedup", "semantic", "kmeans"),
    # green r4-r8; rotated OUT in the r9 second wave — the
    # cluster-shortlist dedup family stays visible via
    # lsh_incremental_dedup / bloom_incremental_dedup
    driver_visible=False,
)
def semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup, SemDeDup-style: k-means the embedding space
    (trained centroids, bit-identical oracle replay), then drop every
    vector with a lower-id cluster-mate at cosine ≥ {SEMDEDUP_TAU}.
    Near-dup search never leaves a cluster, so cost is per-cluster
    quadratic but corpus-linear (k scales with corpus size to keep
    clusters bounded). Output keeps every vector with its cluster and a
    kept/dropped flag — the downstream corpus filter is a semi-join on
    kept ids."""
    emb = spread(t(spark, sf_dir, "embeddings"))
    from jcf_nb_migration_spark.queries.advanced2 import cached_kmeans
    centroids = cached_kmeans(emb, sf_dir)
    return D.semdedup_flags(emb, centroids, threshold=SEMDEDUP_TAU)


# Deterministic synthetic contact line: the fixture corpus contains no
# real PII (it is synthetic), so the query composes one from real table
# columns — every masking pattern genuinely fires and the oracle
# replays the identical composition. The *operator* under test is the
# scrub itself, which applies unchanged to any text column.
def _contact_spark():
    # Built lazily (inside the query) — constructing Column literals at
    # import time would require an active SparkContext, breaking
    # DuckDB-only consumers of the registry (e.g. oracle tooling).
    return F.concat_ws(
        "", F.lit("user"), F.col("doc_id").cast("string"),
        F.lit("@"), F.col("source"), F.lit(".example.com ip 10."),
        (F.col("doc_id") % 256).cast("string"), F.lit(".0."),
        ((F.col("doc_id") * 7) % 256).cast("string"), F.lit(" tel 415-"),
        F.lpad(((F.col("doc_id") * 37) % 1000).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad(((F.col("doc_id") * 11) % 10000).cast("string"), 4, "0"),
        F.lit(" :: "), F.substring(F.col("text"), 1, 40),
    )
_CONTACT_SQL = (
    "'user' || CAST(doc_id AS VARCHAR) || '@' || source"
    " || '.example.com ip 10.' || CAST(doc_id % 256 AS VARCHAR)"
    " || '.0.' || CAST((doc_id * 7) % 256 AS VARCHAR)"
    " || ' tel 415-' || lpad(CAST((doc_id * 37) % 1000 AS VARCHAR), 3, '0')"
    " || '-' || lpad(CAST((doc_id * 11) % 10000 AS VARCHAR), 4, '0')"
    " || ' :: ' || substr(text, 1, 40)"
)
_SQL_PII_COUNTS = P.sql_pii_counts("raw")


@query(
    "pii_scrub_stats",
    oracle=f"""
    SELECT doc_id,
           {_SQL_PII_COUNTS['email']} AS n_emails,
           {_SQL_PII_COUNTS['phone']} AS n_phones,
           {_SQL_PII_COUNTS['ip']} AS n_ips,
           {P.sql_pii_scrub('raw')} AS masked
    FROM (SELECT doc_id, {_CONTACT_SQL} AS raw FROM documents)
    """,
    tags=("curation", "pii", "regex"),
    # r7 rotation: OUT after 5-6 green rounds to widen the hard-checked union;
    # pattern twin in coverage_map.py
    driver_visible=False,
)
def pii_scrub_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: mask emails, phone numbers, and IPv4 addresses
    and count what was masked (counts on the raw text, so kinds don't
    steal each other's matches). Pure codegen'd regexp_replace chain —
    zero UDFs, runs at scan bandwidth; patterns restricted to the
    Java≡RE2 subset so the DuckDB oracle masks byte-identically. The
    fixture corpus has no real PII, so the scrubbed column is composed
    deterministically from table columns (see _contact_spark)."""
    docs = spread(t(spark, sf_dir, "documents"))
    raw = docs.select("doc_id", _contact_spark().alias("raw"))
    counts = P.pii_counts("raw")
    return raw.select(
        "doc_id",
        counts["email"].cast("bigint").alias("n_emails"),
        counts["phone"].cast("bigint").alias("n_phones"),
        counts["ip"].cast("bigint").alias("n_ips"),
        P.pii_scrub("raw").alias("masked"),
    )


SAMPLE_MOD = 1_000_000  # hash-uniform resolution for sampling rates


@query(
    "corpus_mixture_sample",
    oracle=f"""
    WITH dt AS (
        SELECT doc_id, source,
               CAST(len({_SQL_TOKS}) AS BIGINT) AS n_tokens,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT
                   % {SAMPLE_MOD} AS h
        FROM documents
    ),
    st AS (
        SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS src_tokens
        FROM dt GROUP BY source
    ),
    tot AS (
        SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               COUNT(DISTINCT source) AS n_sources
        FROM dt
    )
    SELECT dt.doc_id, dt.source, dt.n_tokens,
           least(1.0, CAST(tot.total_tokens AS DOUBLE)
                      / (2 * tot.n_sources * st.src_tokens)) AS sample_rate
    FROM dt
    JOIN st ON st.source = dt.source
    CROSS JOIN tot
    WHERE dt.h * (2 * tot.n_sources * st.src_tokens)
          < tot.total_tokens * {SAMPLE_MOD}
    """,
    tags=("curation", "sampling", "mixture"),
    # rotated OUT of the driver window r10 (green in 6 driver
    # rounds); pattern twin: weighted_corpus_sample
    # (coverage_map.py); still oracle-run at every pytest.
    driver_visible=False,
)
def corpus_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture sampling: give every source an equal share
    of a corpus-wide token budget (here total/2, split across sources)
    and keep each document with probability min(1, budget/src_tokens),
    decided by a content-stable hash — reruns, retries, and
    repartitions select the exact same rows (the property df.sample
    lacks). The keep test is pure int64 arithmetic (h·2·S·src_tokens <
    total·MOD) so both engines decide identically — no float rate is
    ever compared. Two aggregations (per-source, corpus-total — both
    map-side-combining one-shuffle passes over a 3-column projection),
    then a filter joined against the sources table, which is bounded
    (#sources) and broadcast by AQE. At extreme scale the int64 product
    caps out around 2·10^13 corpus tokens × MOD=10^6 — shrink MOD or
    move to DECIMAL(38) arithmetic past that."""
    docs = spread(t(spark, sf_dir, "documents"))
    h = (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12),
                16, 10).cast("bigint") % SAMPLE_MOD)
    dt = docs.select(
        "doc_id", "source",
        F.size(T.tokens("text")).cast("bigint").alias("n_tokens"),
        h.alias("h"))
    st = dt.groupBy("source").agg(F.sum("n_tokens").alias("src_tokens"))
    tot = dt.agg(F.sum("n_tokens").alias("total_tokens"),
                 F.countDistinct("source").alias("n_sources"))
    denom = 2 * F.col("n_sources") * F.col("src_tokens")
    return (
        dt.join(st, "source")
        .crossJoin(F.broadcast(tot))
        .where(F.col("h") * denom < F.col("total_tokens") * SAMPLE_MOD)
        .select("doc_id", "source", "n_tokens",
                F.least(F.lit(1.0),
                        F.col("total_tokens").cast("double") / denom)
                 .alias("sample_rate"))
    )


LM_SCALE = 1_000_000  # fixed-point resolution for P(w2|w1) terms

# Bloom-filter incremental dedup: filter geometry. 2048 bits / k=3 over
# 250 inserted fingerprints gives a ~3% false-positive rate — small
# enough to be a filter, large enough that the fixture deterministically
# exercises the false-positive path.
BLOOM_BITS = 2048
BLOOM_WORDS = BLOOM_BITS // 32  # 32-bit words, positive in a BIGINT
BLOOM_K = 3
BLOOM_OLD_MAX = 250  # doc_id < this = the already-ingested corpus

_SQL_FP = r"md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))"


def _sql_bloom_pos(i: int) -> str:
    """DuckDB mirror of the i-th bloom hash: 48-bit md5 of the salted
    fingerprint, mod the filter size."""
    return (f"('0x' || substr(md5(fp || ':{i}'), 1, 12))::BIGINT"
            f" % {BLOOM_BITS}")


@query(
    "bloom_incremental_dedup",
    oracle=f"""
    WITH fps AS (SELECT doc_id, {_SQL_FP} AS fp FROM documents),
    old_pos AS (
        SELECT unnest([{", ".join(_sql_bloom_pos(i)
                                  for i in range(BLOOM_K))}]) AS pos
        FROM fps WHERE doc_id < {BLOOM_OLD_MAX}
    ),
    bloom AS (
        SELECT pos // 32 AS w,
               CAST(bit_or(1::BIGINT << (pos % 32)) AS BIGINT) AS mask
        FROM old_pos GROUP BY w
    ),
    inc AS (
        SELECT doc_id, fp,
               unnest([{", ".join(_sql_bloom_pos(i)
                                  for i in range(BLOOM_K))}]) AS pos
        FROM fps
    ),
    probe AS (
        SELECT inc.doc_id,
               CAST(COUNT(*) FILTER (
                   WHERE (bloom.mask & (1::BIGINT << (inc.pos % 32))) != 0
               ) AS BIGINT) AS n_hits
        FROM inc LEFT JOIN bloom ON bloom.w = inc.pos // 32
        GROUP BY inc.doc_id
    ),
    known AS (
        SELECT DISTINCT n.doc_id
        FROM fps n JOIN fps o ON o.fp = n.fp
        WHERE o.doc_id < {BLOOM_OLD_MAX}
    )
    SELECT p.doc_id,
           p.n_hits = {BLOOM_K} AS bloom_maybe_dup,
           k.doc_id IS NOT NULL AS is_known,
           p.n_hits = {BLOOM_K} AND k.doc_id IS NULL AS false_positive
    FROM probe p LEFT JOIN known k ON k.doc_id = p.doc_id
    """,
    tags=("curation", "dedup", "bloom", "incremental"),
    # kept local to fit the 50-name driver window; the incremental-
    # ingest pattern's exact half is driver-visible via dedup_exact
    # rotated OUT of the driver window r10 (green in 3 driver
    # rounds); pattern twin: lsh_incremental_dedup
    # (coverage_map.py); still oracle-run at every pytest.
    driver_visible=False,
)
def bloom_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup with a Bloom filter, in pure DataFrame
    bit arithmetic: the standing corpus (doc_id < {BLOOM_OLD_MAX})
    is summarized as a {BLOOM_BITS}-bit / k={BLOOM_K} Bloom filter —
    {BLOOM_WORDS} (word, 32-bit mask) rows built with one bit_or
    groupBy — and every incoming doc probes it. Probing is an equi-join
    on the word index against a table whose size is FIXED BY THE
    FILTER GEOMETRY (≤{BLOOM_WORDS} rows — broadcast-safe by
    construction at any corpus size); only the maybe-dup survivors pay
    the exact fingerprint verification join. This is how a 100 TB
    ingest avoids re-joining every delivery against the whole corpus:
    the filter is megabytes of state for billions of docs, false
    positives are re-checked exactly, false negatives are impossible.
    Everything is md5/integer arithmetic, so the DuckDB oracle replays
    the filter bit-for-bit — including which docs are deterministic
    false positives."""
    docs = spread(t(spark, sf_dir, "documents"))
    fps = docs.select(
        "doc_id",
        F.md5(F.regexp_replace(F.lower(F.trim(F.col("text"))),
                               r"\s+", " ")).alias("fp"))

    def pos(i: int):
        return (F.conv(F.substring(
            F.md5(F.concat(F.col("fp"), F.lit(f":{i}"))), 1, 12), 16, 10)
            .cast("bigint") % BLOOM_BITS)

    kpos = F.array(*[pos(i) for i in range(BLOOM_K)])
    old_pos = (fps.where(F.col("doc_id") < BLOOM_OLD_MAX)
               .select(F.explode(kpos).alias("p")))
    bloom = (old_pos
             .select(F.expr("p div 32").alias("w"),
                     F.expr("shiftleft(CAST(1 AS BIGINT),"
                            " CAST(p % 32 AS INT))").alias("b"))
             .groupBy("w").agg(F.bit_or("b").alias("mask")))
    inc = fps.select("doc_id", "fp", F.explode(kpos).alias("p"))
    hit = F.expr("(mask & shiftleft(CAST(1 AS BIGINT),"
                 " CAST(p % 32 AS INT))) != 0")
    probe = (
        inc.withColumn("w", F.expr("p div 32"))
        .join(F.broadcast(bloom), "w", "left")
        .groupBy("doc_id")
        .agg(F.sum(F.when(hit, 1).otherwise(0)).alias("n_hits"))
    )
    known = (fps.alias("n")
             .join(fps.where(F.col("doc_id") < BLOOM_OLD_MAX)
                   .select("fp").distinct().alias("o"), "fp", "left_semi")
             .select("doc_id").distinct()
             .withColumn("__known", F.lit(1)))
    maybe = F.col("n_hits") == BLOOM_K
    return (probe.join(known, "doc_id", "left")
            .select("doc_id",
                    maybe.alias("bloom_maybe_dup"),
                    F.col("__known").isNotNull().alias("is_known"),
                    (maybe & F.col("__known").isNull())
                    .alias("false_positive")))


LSH_OLD_MAX = 250  # doc_id < this = the standing (already-indexed) corpus


@query(
    "lsh_incremental_dedup",
    oracle=f"""
    WITH {_sql_minhash_sig_cte(16)},
    {_sql_bands_cte(8, 2)},
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    cand AS (
        SELECT DISTINCT nb.doc_id AS new_id, ob.doc_id AS old_id
        FROM bands nb JOIN bands ob
          ON ob.band_idx = nb.band_idx AND ob.band_hash = nb.band_hash
        WHERE nb.doc_id >= {LSH_OLD_MAX} AND ob.doc_id < {LSH_OLD_MAX}
    ),
    cm AS (
        SELECT c.new_id, c.old_id, COUNT(*) AS common
        FROM cand c
        JOIN sh a ON a.doc_id = c.new_id
        JOIN sh b ON b.doc_id = c.old_id AND b.shingle = a.shingle
        GROUP BY 1, 2
    ),
    scored AS (
        SELECT cm.new_id, cm.old_id,
               CAST(cm.common AS DOUBLE)
                   / (sn.n_sh + so.n_sh - cm.common) AS jaccard
        FROM cm
        JOIN sizes sn ON sn.doc_id = cm.new_id
        JOIN sizes so ON so.doc_id = cm.old_id
        WHERE CAST(cm.common AS DOUBLE)
                  / (sn.n_sh + so.n_sh - cm.common) >= 0.5
    ),
    best AS (
        SELECT new_id, old_id, jaccard FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY new_id
                ORDER BY jaccard DESC, old_id) AS rk
            FROM scored
        ) WHERE rk = 1
    )
    SELECT d.doc_id, b.new_id IS NOT NULL AS is_dup,
           b.old_id AS match_id, b.jaccard AS match_jaccard
    FROM documents d LEFT JOIN best b ON b.new_id = d.doc_id
    WHERE d.doc_id >= {LSH_OLD_MAX}
    ORDER BY d.doc_id
    """,
    tags=("curation", "dedup", "lsh", "incremental"),
    # rotated INTO the driver window r9 second wave (first-time name)
)
def lsh_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest NEAR-dup dedup against the standing MinHash
    LSH index (functions.dedup.incremental_lsh_dedup): docs with
    doc_id < {LSH_OLD_MAX} are the already-indexed corpus, the rest
    arrive as a batch; each batch doc probes the standing band table
    by equi-join, colliding pairs are exact-Jaccard verified, and
    every batch doc reports (is_dup, best standing match). The
    production ingest shape next to bloom_incremental_dedup — Bloom
    answers exact membership, this answers near-duplication — and the
    batch-vs-index half of minhash_lsh_dedup's corpus-wide dedup."""
    docs = spread(t(spark, sf_dir, "documents"))
    old = docs.where(F.col("doc_id") < LSH_OLD_MAX)
    new = docs.where(F.col("doc_id") >= LSH_OLD_MAX)
    return (D.incremental_lsh_dedup(old, new, "doc_id", "text",
                                    threshold=0.5, k=16, bands=8,
                                    rows=2, n=3)
            .orderBy("doc_id"))


@query(
    "doc_bigram_lm_score",
    oracle=f"""
    WITH occ AS (
        SELECT doc_id,
               unnest({_sql_ngrams(2, distinct=False)}) AS g
        FROM (SELECT doc_id, {_SQL_TOKS} AS w FROM documents)
    ),
    big AS (SELECT g, count(*) AS c_big FROM occ GROUP BY g),
    uni AS (
        SELECT w1, count(*) AS c_uni FROM (
            SELECT split_part(g, ' ', 1) AS w1 FROM occ
        ) GROUP BY w1
    ),
    scored AS (
        SELECT o.doc_id,
               (b.c_big * {LM_SCALE}) // u.c_uni AS term
        FROM occ o
        JOIN big b ON b.g = o.g
        JOIN uni u ON u.w1 = split_part(o.g, ' ', 1)
    ),
    per_doc AS (
        SELECT doc_id, count(*) AS n_bigrams,
               CAST(SUM(term) AS BIGINT) AS lm_score
        FROM scored GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(p.n_bigrams, 0) AS n_bigrams,
           COALESCE(p.lm_score, 0) AS lm_score,
           CASE WHEN COALESCE(p.n_bigrams, 0) > 0
                THEN CAST(p.lm_score AS DOUBLE)
                     / (p.n_bigrams * {LM_SCALE})
                ELSE 0.0 END AS fluency
    FROM documents d LEFT JOIN per_doc p ON p.doc_id = d.doc_id
    """,
    tags=("curation", "quality", "lm", "ngram"),
    driver_visible=True,  # rotated INTO the driver window r14 (8th wave, first-time name)
)
def doc_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained bigram language-model fluency score — the
    KenLM-style quality signal (how typical is each document of the
    corpus), log-free so it is exactly reproducible: each bigram
    occurrence contributes floor(c(w1 w2)·10^6 / c(w1·)) — a
    fixed-point P(w2|w1) — and the per-doc mean of those integer terms
    is the fluency. Training IS the counting (one explode + two
    groupBys); scoring joins each occurrence to the bigram/prefix
    count tables on the vocabulary key (heavy-tailed and unbounded, so
    no broadcast hint — AQE decides, the same policy as tfidf's
    document-frequency join).

    r13 restructure (found by the four-point probe at 3.99x): the
    occurrence stream was scanned THREE times (bigram counts, prefix
    counts, scoring join) and both vocabulary joins shuffled the full
    occurrence table. Now ONE persisted (doc_id, g) count frame —
    strictly smaller than the occurrences, map-side combined — feeds
    everything: both count tables aggregate from it, the per-bigram
    term is computed once at VOCABULARY granularity (two vocab-sized
    tables joined to each other, never to occurrences), and scoring is
    a single g-keyed join of the (doc, g) counts with
    sum(cnt·term) replacing the per-occurrence sum — exact integer
    arithmetic, identical result."""
    docs = spread(t(spark, sf_dir, "documents"))
    occ = docs.select(
        "doc_id",
        F.explode(T.word_shingles(T.tokens("text"), 2)).alias("g"))
    dg = (occ.groupBy("doc_id", "g")
          .agg(F.count(F.lit(1)).alias("cnt"))
          .persist())
    big = dg.groupBy("g").agg(F.sum("cnt").alias("c_big"))
    uni = (dg.withColumn("w1", F.split_part(F.col("g"), F.lit(" "),
                                            F.lit(1)))
           .groupBy("w1").agg(F.sum("cnt").alias("c_uni")))
    # r14 (VERDICT r13 item 7, guide §3.1): the vocabulary joins are
    # explicitly broadcast — MEASURED bound: the terms frame is one row
    # per distinct bigram, 931 rows at sf0.1 / 2.8k at 3x / 8.4k
    # (~0.3 MB) at the 10x-derived fixture, growing sublinearly in
    # production corpora (Heaps' law), so it sits orders of magnitude
    # under the 64 MB comfort bar and the 8 GB broadcast cap. The
    # planner already picked broadcast here at every fixture, but its
    # estimate comes from TWO stacked aggregates (the kind §3.1 warns
    # goes badly wrong); the hint pins the strategy so a bad estimate
    # at scale can never flip the dg-side (corpus-sized) join to a
    # sort-merge shuffle. Cutover if a corpus ever pushes the
    # vocabulary past the broadcast cap: drop the two hints and let
    # AQE shuffle — documented, not speculative code.
    terms = (big.withColumn("w1", F.split_part(F.col("g"), F.lit(" "),
                                               F.lit(1)))
             .join(F.broadcast(uni), "w1")
             .select("g",
                     F.expr(f"(c_big * {LM_SCALE}) div c_uni")
                     .alias("term")))
    per_doc = (
        dg.join(F.broadcast(terms), "g")
        .groupBy("doc_id")
        .agg(F.sum("cnt").alias("n_bigrams"),
             F.sum(F.col("cnt") * F.col("term")).alias("lm_score"))
    )
    return docs.select("doc_id").join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
        F.coalesce(F.col("lm_score"), F.lit(0)).alias("lm_score"),
        F.when(F.coalesce(F.col("n_bigrams"), F.lit(0)) > 0,
               F.col("lm_score").cast("double")
               / (F.col("n_bigrams") * LM_SCALE))
         .otherwise(F.lit(0.0)).alias("fluency"),
    )


@query(
    "curation_funnel",
    oracle=f"""
    WITH flags AS (
        SELECT doc_id,
               (lang = 'en') AS f_lang,
               (len(w) >= 60) AS f_len,
               ((len(w) - len(list_distinct(w))) * 10 < len(w) * 6)
                   AS f_dup,
               (len(list_filter(w, x -> list_contains(
                    ['the','a','of','and','is','to','in'], x))) * 25
                    >= len(w)) AS f_stop
        FROM (SELECT doc_id, lang, {_SQL_TOKS} AS w FROM documents)
    ), agg AS (
        SELECT COUNT(*) AS n0,
               COUNT(*) FILTER (f_lang) AS n1,
               COUNT(*) FILTER (f_lang AND f_len) AS n2,
               COUNT(*) FILTER (f_lang AND f_len AND f_dup) AS n3,
               COUNT(*) FILTER (f_lang AND f_len AND f_dup AND f_stop)
                   AS n4
        FROM flags
    )
    SELECT * FROM (
        SELECT 1 AS stage_idx, 'lang_en' AS stage,
               n0 AS n_in, n1 AS n_kept, n0 - n1 AS n_dropped FROM agg
        UNION ALL
        SELECT 2, 'min_tokens_60', n1, n2, n1 - n2 FROM agg
        UNION ALL
        SELECT 3, 'dup_token_frac_lt_0.6', n2, n3, n2 - n3 FROM agg
        UNION ALL
        SELECT 4, 'stopword_ratio_ge_0.04', n3, n4, n3 - n4 FROM agg
    ) ORDER BY stage_idx
    """,
    tags=("curation", "funnel", "quality"),
    driver_visible=True,  # rotated INTO the driver window r14 (8th wave, first-time name)
)
def curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed keep/drop report a curation pipeline publishes:
    four staged filters (language, length, repetition, stopword
    density) with per-stage in/kept/dropped counts. One scan, one
    single-row aggregate (each stage is a conditional count over
    per-doc boolean columns — no per-stage jobs, no driver loop), then
    a 4-row unpivot. Thresholds are integer-exact cross-engine
    (len·10 < len·6 style), so the oracle comparison is bitwise; at
    100 TB this is a map-side-combinable aggregate at scan bandwidth."""
    docs = spread(t(spark, sf_dir, "documents"))
    toks = T.tokens("text")
    n_tok = F.size(toks)
    flags = docs.select(
        (F.col("lang") == "en").alias("f_lang"),
        (n_tok >= 60).alias("f_len"),
        ((n_tok - F.size(F.array_distinct(toks))) * 10 < n_tok * 6)
            .alias("f_dup"),
        (T.stopword_hits(toks, "en") * 25 >= n_tok).alias("f_stop"),
    )

    def cnt(cond, alias):
        return F.count(F.when(cond, 1)).alias(alias)

    agg = flags.agg(
        F.count(F.lit(1)).alias("n0"),
        cnt(F.col("f_lang"), "n1"),
        cnt(F.col("f_lang") & F.col("f_len"), "n2"),
        cnt(F.col("f_lang") & F.col("f_len") & F.col("f_dup"), "n3"),
        cnt(F.col("f_lang") & F.col("f_len") & F.col("f_dup")
            & F.col("f_stop"), "n4"),
    )
    stages = [("lang_en", "n0", "n1"), ("min_tokens_60", "n1", "n2"),
              ("dup_token_frac_lt_0.6", "n2", "n3"),
              ("stopword_ratio_ge_0.04", "n3", "n4")]
    # Unpivot the single agg row with inline(array(struct...)) — one
    # scan, one aggregate, 4 output rows. A unionAll of per-stage
    # selects would re-plan (and re-scan for) the aggregate per branch.
    structs = [
        F.struct(F.lit(i + 1).alias("stage_idx"), F.lit(name).alias("stage"),
                 F.col(a).alias("n_in"), F.col(b).alias("n_kept"),
                 (F.col(a) - F.col(b)).alias("n_dropped"))
        for i, (name, a, b) in enumerate(stages)
    ]
    return agg.select(F.inline(F.array(*structs))).orderBy("stage_idx")


SPAN_L = 8         # minimum duplicated run, in tokens
SPAN_FREQ_CAP = 100  # grams in more windows than this are boilerplate


@query(
    "duplicate_spans",
    oracle=f"""
    WITH w AS (SELECT doc_id, {_SQL_TOKS} AS w FROM documents),
    grams AS (
        SELECT doc_id, i AS pos,
               array_to_string(w[i:i+{SPAN_L - 1}], ' ') AS g
        FROM w, LATERAL unnest(generate_series(1, len(w)-{SPAN_L - 1})) t(i)
        WHERE len(w) >= {SPAN_L}
    ),
    kept AS (
        SELECT * FROM grams WHERE g IN (
            SELECT g FROM grams GROUP BY g
            HAVING count(*) <= {SPAN_FREQ_CAP})
    ),
    pairs AS (
        SELECT a.doc_id AS da, b.doc_id AS db, a.pos AS pa, b.pos AS pb
        FROM kept a JOIN kept b USING (g)
        WHERE a.doc_id < b.doc_id
    ),
    runs AS (
        SELECT da, db, pa, pb, pa - pb AS diag,
               pa - row_number() OVER (
                   PARTITION BY da, db, pa - pb ORDER BY pa) AS island
        FROM pairs
    )
    SELECT da AS doc_a, db AS doc_b,
           CAST(min(pa) AS BIGINT) AS start_a,
           CAST(min(pb) AS BIGINT) AS start_b,
           CAST(count(*) + {SPAN_L - 1} AS BIGINT) AS run_len
    FROM runs GROUP BY da, db, diag, island
    ORDER BY doc_a, doc_b, start_a, start_b
    """,
    tags=("curation", "dedup", "substring", "spans"),
    # rotated INTO the driver window r9 (substring-span dedup witness)
    driver_visible=False,  # rotated out r13 7th wave (green r9-r12, 4x)
)
def duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-substring extraction (the Lee et al.
    'Deduplicating Training Data' operator, windowed): every MAXIMAL
    run of ≥ {SPAN_L} tokens shared verbatim between two documents,
    reported as (doc_a, doc_b, start_a, start_b, run_len).

    Spark-first decomposition of what suffix arrays do on one machine:
    (1) slide an L-token window per doc (codegen'd transform+inline,
    1-based slices so both engines index identically); (2) drop grams
    seen in > {SPAN_FREQ_CAP} windows — boilerplate caps the join
    fan-out, the quadratic guard at 100 TB; (3) self-equi-join on the
    gram to get aligned window pairs; (4) stitch overlapping windows
    into maximal runs with the islands trick: along a (doc_a, doc_b)
    diagonal (pos_a − pos_b constant), consecutive positions share
    (pos_a − row_number), so one groupBy emits each maximal span once
    with run_len = windows + L − 1. Every step is an equi-shuffle on
    bounded keys; nothing is all-pairs."""
    docs = spread(t(spark, sf_dir, "documents"))
    w = T.tokens("text")
    gram_structs = F.transform(
        F.sequence(F.lit(1), F.size(w) - (SPAN_L - 1)),
        lambda i: F.struct(
            i.alias("pos"),
            F.array_join(F.slice(w, i, SPAN_L), " ").alias("g")))
    grams = (docs.where(F.size(w) >= SPAN_L)
             .select("doc_id", F.inline(gram_structs)))
    keep = (grams.groupBy("g").count()
            .where(F.col("count") <= SPAN_FREQ_CAP).select("g"))
    kept = grams.join(keep, "g", "left_semi")
    a = kept.select(F.col("doc_id").alias("da"), F.col("pos").alias("pa"),
                    "g")
    b = kept.select(F.col("doc_id").alias("db"), F.col("pos").alias("pb"),
                    "g")
    pairs = a.join(b, "g").where(F.col("da") < F.col("db"))
    win = Window.partitionBy("da", "db", F.col("pa") - F.col("pb")) \
        .orderBy("pa")
    runs = pairs.select(
        "da", "db", "pa", "pb",
        (F.col("pa") - F.col("pb")).alias("diag"),
        (F.col("pa") - F.row_number().over(win)).alias("island"))
    return (
        runs.groupBy("da", "db", "diag", "island")
        .agg(F.min("pa").cast("bigint").alias("start_a"),
             F.min("pb").cast("bigint").alias("start_b"),
             (F.count(F.lit(1)) + (SPAN_L - 1)).cast("bigint")
             .alias("run_len"))
        .select(F.col("da").alias("doc_a"), F.col("db").alias("doc_b"),
                "start_a", "start_b", "run_len")
        .orderBy("doc_a", "doc_b", "start_a", "start_b")
    )


@query(
    "gopher_quality_flags",
    oracle=f"""
    WITH base AS (
        SELECT doc_id, text, {_SQL_TOKS} AS w FROM documents
    ),
    feat AS (
        SELECT doc_id,
               len(w) AS n_words,
               list_sum(list_transform(w, x -> length(x))) AS tot_chars,
               len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]')))
                   AS n_alpha_words,
               length(text) - length(replace(text, '#', '')) AS n_hash,
               (length(text) - length(replace(text, '...', '')))
                   / 3 AS n_ellipsis,
               len(list_filter(w, x -> list_contains(
                   ['the','a','of','and','is','to','in'], x))) AS n_stop
        FROM base
    )
    SELECT doc_id,
           (n_words BETWEEN 50 AND 100000) AS ok_word_count,
           (3 * n_words <= tot_chars AND tot_chars <= 10 * n_words)
               AS ok_mean_word_len,
           (10 * (n_hash + n_ellipsis) <= n_words) AS ok_symbol_ratio,
           (5 * n_alpha_words >= 4 * n_words) AS ok_alpha_words,
           (n_stop >= 2) AS ok_stopwords,
           ((n_words BETWEEN 50 AND 100000)
            AND (3 * n_words <= tot_chars AND tot_chars <= 10 * n_words)
            AND (10 * (n_hash + n_ellipsis) <= n_words)
            AND (5 * n_alpha_words >= 4 * n_words)
            AND (n_stop >= 2)) AS keep
    FROM feat ORDER BY doc_id
    """,
    tags=("curation", "quality", "gopher"),
    # rotated INTO the driver window r9 second wave (first-time name)
)
def gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher/MassiveText document-level quality rules as exact
    boolean flags: word-count bounds, mean-word-length bounds (as the
    integer cross-product 3n ≤ Σlen ≤ 10n — no float division),
    symbol-to-word ratio (#/ellipsis), ≥80 % alphabetic words
    (5·alpha ≥ 4·n), ≥2 stopwords; `keep` is their conjunction.
    Complements doc_repetition_stats (the repetition half of the rule
    set) and curation_funnel (the staged-drop report). One scan, all
    codegen'd array/regex expressions, integer-exact cross-engine."""
    docs = spread(t(spark, sf_dir, "documents"))
    w = T.tokens("text")
    n_words = F.size(w)
    tot_chars = F.aggregate(
        F.transform(w, F.length), F.lit(0), lambda a, x: a + x)
    n_alpha = F.size(F.filter(w, lambda x: x.rlike("[a-zA-Z]")))
    n_hash = F.length("text") - F.length(F.replace(F.col("text"),
                                                  F.lit("#"), F.lit("")))
    n_ellipsis = ((F.length("text")
                   - F.length(F.replace(F.col("text"), F.lit("..."),
                                        F.lit("")))) / 3).cast("bigint")
    n_stop = T.stopword_hits(w, "en")
    feat = docs.select(
        "doc_id", n_words.alias("n_words"), tot_chars.alias("tot_chars"),
        n_alpha.alias("n_alpha_words"), n_hash.alias("n_hash"),
        n_ellipsis.alias("n_ellipsis"), n_stop.alias("n_stop"))
    ok_wc = F.col("n_words").between(50, 100000)
    ok_mwl = ((3 * F.col("n_words") <= F.col("tot_chars"))
              & (F.col("tot_chars") <= 10 * F.col("n_words")))
    ok_sym = (10 * (F.col("n_hash") + F.col("n_ellipsis"))
              <= F.col("n_words"))
    ok_alpha = 5 * F.col("n_alpha_words") >= 4 * F.col("n_words")
    ok_stop = F.col("n_stop") >= 2
    return feat.select(
        "doc_id",
        ok_wc.alias("ok_word_count"),
        ok_mwl.alias("ok_mean_word_len"),
        ok_sym.alias("ok_symbol_ratio"),
        ok_alpha.alias("ok_alpha_words"),
        ok_stop.alias("ok_stopwords"),
        (ok_wc & ok_mwl & ok_sym & ok_alpha & ok_stop).alias("keep"),
    ).orderBy("doc_id")


@query(
    "source_report_card",
    oracle=f"""
    WITH base AS (
        SELECT doc_id, source, text, {_SQL_TOKS} AS w FROM documents
    ),
    flags AS (
        SELECT doc_id, source,
               len(w) AS n_tokens,
               (len(w) BETWEEN 50 AND 100000
                AND 3 * len(w) <= list_sum(list_transform(w,
                                           x -> length(x)))
                AND list_sum(list_transform(w, x -> length(x)))
                    <= 10 * len(w)
                AND len(list_filter(w, x -> list_contains(
                    ['the','a','of','and','is','to','in'], x))) >= 2)
                   AS keeps
        FROM base
    ),
    dup AS (
        SELECT doc_id, source,
               row_number() OVER (
                   PARTITION BY md5(text) ORDER BY doc_id) > 1 AS is_dup
        FROM base
    )
    SELECT f.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(f.n_tokens) AS BIGINT) AS total_tokens,
           CAST(COUNT(*) FILTER (f.keeps) AS BIGINT) AS n_quality_keep,
           CAST(COUNT(*) FILTER (d.is_dup) AS BIGINT) AS n_exact_dups
    FROM flags f JOIN dup d USING (doc_id)
    GROUP BY f.source ORDER BY f.source
    """,
    tags=("curation", "report", "rollup"),
    driver_visible=True,  # rotated INTO the driver window r14 (8th wave, first-time name)
)
def source_report_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-source corpus report a curation pipeline publishes at
    the end of a run: document and token counts, how many docs pass the
    core quality gate, and how many are exact duplicates (non-survivor
    copies under the min-doc_id rule). Two passes composed — a quality
    scan and a fingerprint window — joined on doc_id and rolled up by
    source; every metric is an integer so the oracle comparison is
    bitwise. The table that answers 'which source do we renegotiate or
    drop' at 100 TB, produced without any per-source driver loop."""
    docs = spread(t(spark, sf_dir, "documents"))
    w = T.tokens("text")
    tot_chars = F.aggregate(
        F.transform(w, F.length), F.lit(0), lambda a, x: a + x)
    n_words = F.size(w)
    keeps = (n_words.between(50, 100000)
             & (3 * n_words <= tot_chars) & (tot_chars <= 10 * n_words)
             & (T.stopword_hits(w, "en") >= 2))
    flags = docs.select("doc_id", "source", n_words.alias("n_tokens"),
                        keeps.alias("keeps"))
    dw = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    dup = docs.select(
        "doc_id", (F.row_number().over(dw) > 1).alias("is_dup"))
    return (
        flags.join(dup, "doc_id")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("n_tokens").alias("total_tokens"),
             F.count(F.when(F.col("keeps"), 1)).alias("n_quality_keep"),
             F.count(F.when(F.col("is_dup"), 1)).alias("n_exact_dups"))
        .orderBy("source")
    )


# Per-source document quota: keep at most SRC_CAP docs per source,
# preferring the "best" by a pluggable quality key (here n_chars desc
# — swap in doc_quality_score / the linear model without changing the
# plan shape). The per-domain cap every crawl-derived corpus applies
# so no single domain dominates the mixture.
SRC_CAP = 15


@query(
    "source_quota_cap",
    oracle=f"""
    SELECT doc_id, source, n_chars, CAST(rn AS INT) AS src_rank
    FROM (
        SELECT doc_id, source, n_chars,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY n_chars DESC, doc_id) AS rn
        FROM documents
    ) WHERE rn <= {SRC_CAP}
    ORDER BY source, src_rank
    """,
    tags=("curation", "quota", "per-group-topk"),
)
def source_quota_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document quota (the per-domain cap crawl corpora
    apply so no domain dominates): keep the top {SRC_CAP} documents of
    each source by a quality key. Physical shape (r9, upgraded from a
    documented intent to the shipped plan): sources are FEW and HUGE —
    a single window partitioned by source funnels corpus/n_sources
    rows through one task each — so the rank runs SALTED two-phase,
    the same exact rewrite as inverted_index_postings' top-k: phase 1
    ranks within (source, doc_id%16) salt buckets and keeps ≤ cap per
    bucket; phase 2 re-ranks the ≤ 16·cap survivors per source. Exact
    by the survival argument (every global top-cap row has < cap rows
    above it in its own bucket, and every survivor above it is itself
    top-cap, so the re-rank reproduces the global rank values)."""
    docs = spread(t(spark, sf_dir, "documents"))
    ws = Window.partitionBy("source", "salt") \
        .orderBy(F.desc("n_chars"), "doc_id")
    # bounded-window: const:320 — phase 2 sees ≤ 16 salts × SRC_CAP
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), "doc_id")
    survivors = (docs
                 .withColumn("salt", (F.col("doc_id") % 16).cast("int"))
                 .withColumn("rn", F.row_number().over(ws))
                 .where(F.col("rn") <= SRC_CAP)
                 .drop("rn", "salt"))
    return (survivors.withColumn("src_rank",
                                 F.row_number().over(w).cast("int"))
            .where(F.col("src_rank") <= SRC_CAP)
            .select("doc_id", "source", "n_chars", "src_rank")
            .orderBy("source", "src_rank"))


CLUSTER_CAP = 20  # kept vectors per semantic cluster (topic balancing)


@query(
    "cluster_balanced_sample",
    oracle=f"""
    WITH {{IVF}},
    ranked AS (
        SELECT vec_id, cluster,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY cluster
                   ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
                   AS INT) AS samp_rank
        FROM assigned
    )
    SELECT vec_id, cluster, samp_rank FROM ranked
    WHERE samp_rank <= {CLUSTER_CAP}
    ORDER BY cluster, samp_rank
    """.replace("{IVF}", _SQL_IVF_ASSIGNED),
    tags=("curation", "sampling", "kmeans", "topic-balance"),
    driver_visible=True,  # rotated INTO the driver window r14 (8th wave, first-time name)
    #   semdedup_prune's trained assignment + tfidf's per-group top-k
)
def cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Topic-balanced corpus sampling: cap how much any one SEMANTIC
    cluster contributes (the embedding-space analogue of the
    per-domain quota in source_quota_cap — dominant topics get
    down-weighted instead of dominant domains). Assignment reuses the
    trained k-means (bit-identical oracle replay, memoized across
    queries); within each cluster the keep order is the md5 of the
    vector id — content-stable, so reruns/retries/repartitions select
    the SAME sample (the corpus_mixture_sample rule). K-means yields
    FEW, HUGE clusters (corpus/K rows each), so the rank runs the
    salted two-phase (r9, same exact rewrite as source_quota_cap /
    inverted_index_postings): per-(cluster, vec_id%16) top-cap first,
    then re-rank the ≤ 16·cap survivors per cluster."""
    from jcf_nb_migration_spark.queries.advanced2 import cached_kmeans
    from jcf_nb_migration_spark.functions.similarity import ivf_assign

    emb = spread(t(spark, sf_dir, "embeddings"))
    assigned = ivf_assign(emb, cached_kmeans(emb, sf_dir))
    key = F.md5(F.col("vec_id").cast("string"))
    ws = Window.partitionBy("cluster", "salt").orderBy(key, "vec_id")
    # bounded-window: const:320 — phase 2 sees ≤ 16 salts × CLUSTER_CAP
    w = Window.partitionBy("cluster").orderBy(key, "vec_id")
    survivors = (assigned
                 .withColumn("salt", (F.col("vec_id") % 16).cast("int"))
                 .withColumn("rn", F.row_number().over(ws))
                 .where(F.col("rn") <= CLUSTER_CAP)
                 .drop("rn", "salt"))
    return (survivors
            .withColumn("samp_rank", F.row_number().over(w).cast("int"))
            .where(F.col("samp_rank") <= CLUSTER_CAP)
            .select("vec_id", "cluster", "samp_rank")
            .orderBy("cluster", "samp_rank"))


LM_REF_SOURCES = ("src1", "src2")  # held-out "reference corpus" the
#   trigram LM is trained on; every document (all sources) is scored
#   against it — the CCNet shape (LM trained on Wikipedia, applied to
#   the crawl), which is what makes backoff non-degenerate: scored
#   trigrams genuinely missing from the reference fall back.


@query(
    "trigram_backoff_score",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, source, {_SQL_TOKS} AS w FROM documents
    ),
    occ AS (
        SELECT doc_id,
               unnest({_sql_ngrams(3, distinct=False)}) AS g
        FROM toks
    ),
    split AS (
        SELECT doc_id, g,
               split_part(g, ' ', 1) AS w1,
               split_part(g, ' ', 2) AS w2,
               split_part(g, ' ', 3) AS w3
        FROM occ
    ),
    ref AS (SELECT w FROM toks
            WHERE source IN ('{LM_REF_SOURCES[0]}', '{LM_REF_SOURCES[1]}')),
    ref_tri AS (
        SELECT g, count(*) AS c3 FROM (
            SELECT unnest({_sql_ngrams(3, distinct=False)}) AS g FROM ref
        ) GROUP BY g
    ),
    ref_big AS (
        SELECT g, count(*) AS c2 FROM (
            SELECT unnest({_sql_ngrams(2, distinct=False)}) AS g FROM ref
        ) GROUP BY g
    ),
    ref_uni AS (
        SELECT t, count(*) AS c1 FROM (
            SELECT unnest(w) AS t FROM ref
        ) GROUP BY t
    ),
    tot AS (SELECT CAST(SUM(c1) AS BIGINT) AS n_tok FROM ref_uni),
    scored AS (
        SELECT s.doc_id,
               CASE
                 WHEN tri.c3 IS NOT NULL
                   THEN (tri.c3 * {LM_SCALE}) // ctx.c2
                 WHEN bo.c2 IS NOT NULL
                   THEN (((bo.c2 * {LM_SCALE}) // u2.c1) * 4) // 10
                 WHEN u3.c1 IS NOT NULL
                   THEN (((u3.c1 * {LM_SCALE}) // tot.n_tok) * 16) // 100
                 ELSE 0
               END AS term
        FROM split s
        LEFT JOIN ref_tri tri ON tri.g = s.g
        LEFT JOIN ref_big ctx ON ctx.g = s.w1 || ' ' || s.w2
        LEFT JOIN ref_big bo  ON bo.g  = s.w2 || ' ' || s.w3
        LEFT JOIN ref_uni u2  ON u2.t  = s.w2
        LEFT JOIN ref_uni u3  ON u3.t  = s.w3
        CROSS JOIN tot
    ),
    per_doc AS (
        SELECT doc_id, count(*) AS n_trigrams,
               CAST(SUM(term) AS BIGINT) AS lm_score
        FROM scored GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(p.n_trigrams, 0) AS n_trigrams,
           COALESCE(p.lm_score, 0) AS lm_score,
           CASE WHEN COALESCE(p.n_trigrams, 0) > 0
                THEN CAST(p.lm_score AS DOUBLE)
                     / (p.n_trigrams * {LM_SCALE})
                ELSE 0.0 END AS fluency
    FROM documents d LEFT JOIN per_doc p ON p.doc_id = d.doc_id
    ORDER BY d.doc_id
    """,
    tags=("curation", "quality", "lm", "backoff"),
    # rotated INTO the driver window r9 (vocabulary-keyed join-chain
    # witness)
    # rotated OUT of the driver window r10 (green in 1 driver
    # round); pattern twin: gopher_quality_flags
    # (coverage_map.py); still oracle-run at every pytest.
    driver_visible=False,
)
def trigram_backoff_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigram stupid-backoff language-model score against a HELD-OUT
    reference corpus (sources {LM_REF_SOURCES}) — the CCNet/KenLM
    quality signal: P(w3|w1 w2) from the reference where observed,
    backing off to 0.4·P(w3|w2), then 0.4²·P(w3), else 0. Training on
    a reference (not the scored corpus itself) is what makes backoff
    real — self-trained LMs never back off. All probabilities are
    fixed-point integers (floor((c·10^6)/ctx), backoff ×0.4 as
    ·4//10), so both engines compute bit-identical scores — no
    logs, no float accumulation.

    Scale shape: count tables are one explode + groupBy each over the
    REFERENCE (a bounded quality subset — broadcast-able when small,
    AQE decides); scoring is a chain of equi left-joins on vocabulary
    keys (heavy-tailed, unbounded — never force-broadcast, same policy
    as tfidf/bigram); the reference token total is a 1-row broadcast.
    One corpus explode, per-doc agg — linear end to end."""
    docs = spread(t(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", "source", T.tokens("text").alias("w"))
    S = LM_SCALE
    occ = (toks.select(
        "doc_id", F.explode(T.word_shingles(F.col("w"), 3)).alias("g"))
        .select("doc_id", "g",
                F.split_part(F.col("g"), F.lit(" "), F.lit(1)).alias("w1"),
                F.split_part(F.col("g"), F.lit(" "), F.lit(2)).alias("w2"),
                F.split_part(F.col("g"), F.lit(" "), F.lit(3)).alias("w3")))
    ref = toks.where(F.col("source").isin(*LM_REF_SOURCES))
    ref_tri = (ref.select(F.explode(T.word_shingles(F.col("w"), 3))
                          .alias("g"))
               .groupBy("g").agg(F.count(F.lit(1)).alias("c3")))
    ref_big = (ref.select(F.explode(T.word_shingles(F.col("w"), 2))
                          .alias("g"))
               .groupBy("g").agg(F.count(F.lit(1)).alias("c2")))
    ref_uni = (ref.select(F.explode("w").alias("t"))
               .groupBy("t").agg(F.count(F.lit(1)).alias("c1")))
    tot = ref_uni.agg(F.sum("c1").alias("n_tok"))
    scored = (
        occ
        .join(ref_tri.select(F.col("g").alias("g_tri"), "c3"),
              F.col("g") == F.col("g_tri"), "left")
        .join(ref_big.select(F.col("g").alias("g_ctx"),
                             F.col("c2").alias("c_ctx")),
              F.concat_ws(" ", "w1", "w2") == F.col("g_ctx"), "left")
        .join(ref_big.select(F.col("g").alias("g_bo"),
                             F.col("c2").alias("c_bo")),
              F.concat_ws(" ", "w2", "w3") == F.col("g_bo"), "left")
        .join(ref_uni.select(F.col("t").alias("t2"),
                             F.col("c1").alias("c_w2")),
              F.col("w2") == F.col("t2"), "left")
        .join(ref_uni.select(F.col("t").alias("t3"),
                             F.col("c1").alias("c_w3")),
              F.col("w3") == F.col("t3"), "left")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", F.expr(f"""
            CASE
              WHEN c3 IS NOT NULL THEN (c3 * {S}) div c_ctx
              WHEN c_bo IS NOT NULL
                THEN (((c_bo * {S}) div c_w2) * 4) div 10
              WHEN c_w3 IS NOT NULL
                THEN (((c_w3 * {S}) div n_tok) * 16) div 100
              ELSE 0
            END""").alias("term"))
    )
    per_doc = (scored.groupBy("doc_id")
               .agg(F.count(F.lit(1)).alias("n_trigrams"),
                    F.sum("term").alias("lm_score")))
    return (
        docs.select("doc_id").join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_trigrams", F.lit(0)).alias("n_trigrams"),
            F.coalesce("lm_score", F.lit(0)).alias("lm_score"),
            F.when(F.coalesce("n_trigrams", F.lit(0)) > 0,
                   F.col("lm_score").cast("double")
                   / (F.col("n_trigrams") * S))
             .otherwise(F.lit(0.0)).alias("fluency"))
        .orderBy("doc_id")
    )


PIPE_KEEP_PCT = 80  # content-stable final sampling rate (percent)


@query(
    "curation_pipeline_e2e",
    oracle=f"""
    WITH {_sql_minhash_sig_cte(16)},
    {_sql_bands_cte(8, 2)},
    cands AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b
          ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
         AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    near_dups AS (
        SELECT DISTINCT id_b AS doc_id FROM (
            SELECT c.id_a, c.id_b, count(*) AS common
            FROM cands c
            JOIN sh a ON a.doc_id = c.id_a
            JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
            GROUP BY 1, 2
        ) v
        JOIN sizes sa ON sa.doc_id = v.id_a
        JOIN sizes sb ON sb.doc_id = v.id_b
        WHERE CAST(common AS DOUBLE) / (sa.n_sh + sb.n_sh - common)
              >= 0.5
    ),
    exact_keep AS (
        SELECT doc_id FROM (
            SELECT doc_id, ROW_NUMBER() OVER (
                PARTITION BY md5(regexp_replace(lower(trim(text)),
                                                '\\s+', ' ', 'g'))
                ORDER BY doc_id) AS rn
            FROM documents
        ) WHERE rn = 1
    ),
    g AS (
        SELECT doc_id, source,
               unnest({_sql_ngrams(DECON_N, distinct=True)}) AS ngram
        FROM (SELECT doc_id, source, {_SQL_TOKS} AS w FROM documents)
    ),
    contaminated AS (
        SELECT DISTINCT g.doc_id FROM g
        JOIN (SELECT DISTINCT ngram FROM g
              WHERE source = '{BENCH_SOURCE}') b USING (ngram)
        WHERE g.source <> '{BENCH_SOURCE}'
    ),
    flags AS (
        SELECT d.doc_id,
               (d.source <> '{BENCH_SOURCE}') AS f1,
               (d.lang = 'en') AS f2,
               (e.doc_id IS NOT NULL) AS f3,
               (n.doc_id IS NULL) AS f4,
               (c.doc_id IS NULL) AS f5,
               (('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 12))
                    ::BIGINT % 100 < {PIPE_KEEP_PCT}) AS f6
        FROM documents d
        LEFT JOIN exact_keep e ON e.doc_id = d.doc_id
        LEFT JOIN near_dups n ON n.doc_id = d.doc_id
        LEFT JOIN contaminated c ON c.doc_id = d.doc_id
    ),
    agg AS (
        SELECT COUNT(*) AS n0,
               COUNT(*) FILTER (f1) AS n1,
               COUNT(*) FILTER (f1 AND f2) AS n2,
               COUNT(*) FILTER (f1 AND f2 AND f3) AS n3,
               COUNT(*) FILTER (f1 AND f2 AND f3 AND f4) AS n4,
               COUNT(*) FILTER (f1 AND f2 AND f3 AND f4 AND f5) AS n5,
               COUNT(*) FILTER (f1 AND f2 AND f3 AND f4 AND f5 AND f6)
                   AS n6
        FROM flags
    )
    SELECT * FROM (
        SELECT 0 AS stage, 'total' AS label, n0 AS n_docs FROM agg
        UNION ALL SELECT 1, 'non_bench', n1 FROM agg
        UNION ALL SELECT 2, 'lang_en', n2 FROM agg
        UNION ALL SELECT 3, 'exact_dedup', n3 FROM agg
        UNION ALL SELECT 4, 'near_dedup', n4 FROM agg
        UNION ALL SELECT 5, 'decontaminated', n5 FROM agg
        UNION ALL SELECT 6, 'sampled', n6 FROM agg
    ) ORDER BY stage
    """,
    tags=("curation", "pipeline", "e2e", "funnel"),
    # green r6-r8; rotated OUT in the r9 second wave — its stages
    # (dedup_exact, minhash_lsh_dedup, decontaminate_ngrams) all stay
    # individually driver-visible
    driver_visible=False,
)
def curation_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END training-data curation funnel with the REAL
    heavy stages chained (curation_funnel uses only cheap per-doc
    flags): benchmark holdout removal → language filter → exact dedup
    (md5 min-survivor) → MinHash-LSH near-dedup (drop the larger id of
    every verified ≥0.5-Jaccard pair) → n-gram benchmark
    decontamination → content-stable {PIPE_KEEP_PCT}% sample. Each
    stage's survivor set is defined against the full corpus (the same
    definition the standalone queries use), and the funnel reports
    cumulative survivor counts per stage — the dataset-card numbers a
    curation run publishes.

    Scale shape: the three heavy stages are the same linear plans the
    standalone queries run (one md5 window; banded LSH candidates +
    verify; gram equi-join); their survivor sets come back as doc_id
    frames that LEFT-join the corpus — all equi-joins on doc_id, one
    final single-row aggregate, unpivoted to 7 rows. Nothing here is
    quadratic; at 100 TB the whole funnel is a handful of
    hash-partitioned passes."""
    docs = spread(t(spark, sf_dir, "documents"))
    exact_keep = (D.exact_dedup(docs, "text", "doc_id")
                  .select("doc_id").withColumn("__e", F.lit(1)))
    near_dups = (D.minhash_lsh_dedup(docs, "doc_id", "text",
                                     threshold=0.5, k=16, bands=8,
                                     rows=2, n=3)
                 .select(F.col("id_b").alias("doc_id")).distinct()
                 .withColumn("__n", F.lit(1)))
    grams = docs.select(
        "doc_id", "source",
        F.explode(F.array_distinct(
            T.word_shingles(T.tokens("text"), DECON_N))).alias("ngram"))
    bench = (grams.where(F.col("source") == BENCH_SOURCE)
             .select("ngram").distinct())
    contaminated = (grams.where(F.col("source") != BENCH_SOURCE)
                    .join(bench, "ngram")
                    .select("doc_id").distinct()
                    .withColumn("__c", F.lit(1)))
    h = (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12),
                16, 10).cast("bigint") % 100)
    flags = (
        docs.select("doc_id", "source", "lang")
        .join(exact_keep, "doc_id", "left")
        .join(near_dups, "doc_id", "left")
        .join(contaminated, "doc_id", "left")
        .select(
            (F.col("source") != BENCH_SOURCE).alias("f1"),
            (F.col("lang") == "en").alias("f2"),
            F.col("__e").isNotNull().alias("f3"),
            F.col("__n").isNull().alias("f4"),
            F.col("__c").isNull().alias("f5"),
            (h < PIPE_KEEP_PCT).alias("f6"))
    )
    c = F.count(F.lit(1))

    def upto(*fs):
        cond = F.lit(True)
        for f in fs:
            cond = cond & F.col(f)
        return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")

    agg = flags.agg(
        c.alias("n0"),
        upto("f1").alias("n1"),
        upto("f1", "f2").alias("n2"),
        upto("f1", "f2", "f3").alias("n3"),
        upto("f1", "f2", "f3", "f4").alias("n4"),
        upto("f1", "f2", "f3", "f4", "f5").alias("n5"),
        upto("f1", "f2", "f3", "f4", "f5", "f6").alias("n6"))
    labels = ["total", "non_bench", "lang_en", "exact_dedup",
              "near_dedup", "decontaminated", "sampled"]
    stack_args = ", ".join(
        f"{i}, '{lab}', n{i}" for i, lab in enumerate(labels))
    return (agg.selectExpr(
        f"stack(7, {stack_args}) AS (stage, label, n_docs)")
        .orderBy("stage"))


@query(
    "split_leakage_audit",
    oracle=f"""
    WITH {_sql_minhash_sig_cte(16)},
    {_sql_bands_cte(8, 2)},
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    cands AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b
          ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
         AND a.doc_id < b.doc_id
    ),
    cm AS (
        SELECT c.id_a, c.id_b, COUNT(*) AS common
        FROM cands c
        JOIN sh a ON a.doc_id = c.id_a
        JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT cm.id_a, cm.id_b,
               CAST(cm.common AS DOUBLE)
                   / (sa.n_sh + sb.n_sh - cm.common) AS jaccard
        FROM cm
        JOIN sizes sa ON sa.doc_id = cm.id_a
        JOIN sizes sb ON sb.doc_id = cm.id_b
        WHERE CAST(cm.common AS DOUBLE)
                  / (sa.n_sh + sb.n_sh - cm.common) >= 0.5
    ),
    sp AS (
        SELECT doc_id,
               CASE WHEN h < {VALID_LO} THEN 'train'
                    WHEN h < {TEST_LO} THEN 'valid'
                    ELSE 'test' END AS split
        FROM (SELECT doc_id,
                     ('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                         || ':split'), 1, 12))::BIGINT
                         % {SPLIT_MOD} AS h
              FROM documents)
    )
    SELECT LEAST(a.split, b.split) AS split_a,
           GREATEST(a.split, b.split) AS split_b,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(MAX(p.jaccard), 9) AS max_jaccard,
           LEAST(a.split, b.split) <> GREATEST(a.split, b.split)
               AS is_leak
    FROM pairs p
    JOIN sp a ON a.doc_id = p.id_a
    JOIN sp b ON b.doc_id = p.id_b
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("curation", "split", "leakage", "dedup", "audit"),
    # rotated INTO the driver window r9: composes the minhash_lsh_dedup
    # pair pipeline with the corpus_split_assign hash router into the
    # pre-training leakage audit — never driver-checked before
    # rotated OUT of the driver window r10 second wave (green in
    # 1 driver round); pattern twin: duplicate_spans
    # (coverage_map.py); still oracle-run at every pytest.
    driver_visible=False,
)
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test-split LEAKAGE audit — the check every serious
    pipeline runs before training: near-duplicate pairs (verified
    MinHash-LSH Jaccard ≥ 0.5, the exact minhash_lsh_dedup output)
    whose two members landed in DIFFERENT splits of the deterministic
    hash router (corpus_split_assign's salted 48-bit md5). A verbatim
    copy of a test document sitting in train silently inflates every
    eval; this query reports the full split×split pair matrix with an
    is_leak flag and the worst offending similarity per cell.

    Scale shape: the pair set comes from the banded-LSH pipeline
    (linear; candidates via band equi-joins), the split label is one
    narrow hash projection broadcast-joined twice on doc_id — no new
    shuffle family beyond the dedup pipeline it audits."""
    docs = spread(t(spark, sf_dir, "documents"))
    pairs = D.minhash_lsh_dedup(docs, "doc_id", "text",
                                threshold=0.5, k=16, bands=8, rows=2, n=3)
    h = (F.conv(F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"),
                           F.lit(":split"))), 1, 12), 16, 10)
         .cast("bigint") % SPLIT_MOD)
    split = (F.when(h < VALID_LO, "train")
             .when(h < TEST_LO, "valid")
             .otherwise("test"))
    sp = docs.select("doc_id", split.alias("split"))
    sa = sp.select(F.col("doc_id").alias("id_a"),
                   F.col("split").alias("sp_a"))
    sb = sp.select(F.col("doc_id").alias("id_b"),
                   F.col("split").alias("sp_b"))
    return (pairs.join(sa, "id_a").join(sb, "id_b")
            .select(F.least("sp_a", "sp_b").alias("split_a"),
                    F.greatest("sp_a", "sp_b").alias("split_b"),
                    "jaccard")
            .groupBy("split_a", "split_b")
            .agg(F.count(F.lit(1)).alias("n_pairs"),
                 F.round(F.max("jaccard"), 9).alias("max_jaccard"))
            .withColumn("is_leak", F.col("split_a") != F.col("split_b"))
            .orderBy("split_a", "split_b"))


SEMDECON_TAU = 0.30   # semantic contamination bar
SEMDECON_MOD = 50     # vec_id % this == 0 => held-out benchmark member


@query(
    "semantic_decontamination",
    oracle=f"""
    WITH bench AS (
        SELECT vec_id AS bench_id, embedding::DOUBLE[] AS bvec
        FROM embeddings WHERE vec_id % {SEMDECON_MOD} = 0
    ),
    corpus AS (
        SELECT vec_id, embedding::DOUBLE[] AS cvec
        FROM embeddings WHERE vec_id % {SEMDECON_MOD} <> 0
    ),
    scored AS (
        SELECT c.vec_id, b.bench_id,
               ROUND({_sql_cos('c.cvec', 'b.bvec')}, 9) AS cos_sim
        FROM corpus c CROSS JOIN bench b
        WHERE {_sql_cos('c.cvec', 'b.bvec')} >= {SEMDECON_TAU}
    )
    SELECT vec_id, bench_id, cos_sim FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY vec_id ORDER BY cos_sim DESC, bench_id) AS rk
        FROM scored
    ) WHERE rk = 1 ORDER BY vec_id
    """,
    tags=("curation", "decontamination", "semantic", "embedding"),
    # composes the decontaminate_ngrams shape (broadcast bench side)
    # with embedding_dedup_pairs' cosine verify — both driver-visible
    driver_visible=False,  # rotated out r13 7th wave (green r11-r12, 2x)
)
def semantic_decontamination(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """SEMANTIC benchmark decontamination — the complement of the
    n-gram recipe (decontaminate_ngrams): a paraphrased eval item
    shares no 8-gram with its source, but its embedding stays close.
    Every corpus vector is screened against the held-out benchmark
    set (vec_id % {SEMDECON_MOD} == 0 stands in for the eval suite);
    any cosine ≥ {SEMDECON_TAU} flags the document, reported with its
    best-matching benchmark item (ties to the lower bench id).

    Scale shape: the benchmark side is SMALL BY NATURE (eval suites
    are thousands of items, not billions) — it broadcasts, and the
    corpus makes ONE scan with a per-vector fold per bench item
    (JVM-side cosine, zero Python). The per-vector top-1 window is
    partitioned by vec_id (bounded by the bench count). At larger
    bench suites the same query runs against the IVF shortlist
    instead of the full bench table (the knn_ann_label_propagation
    candidate generator)."""
    bench_raw, corpus = _semdecon_sides(spark, sf_dir)
    return _semdecon_exact_screen(bench_raw, corpus)


def _semdecon_sides(spark, sf_dir: str):
    """One builder for both screens' inputs: the raw bench rows (the
    k-means trainer/assigner consumes the uncast embedding) and the
    pre-cast, pre-normed corpus frame. r14 (guide §1.2): cast and norm
    are paid ONCE per vector, never per pair — and the recall report
    persists THIS frame so its two legs share one materialization
    instead of two embeddings scans."""
    from jcf_nb_migration_spark.functions import similarity as S

    emb = spread(t(spark, sf_dir, "embeddings"))
    bench_raw = (emb.where(F.col("vec_id") % SEMDECON_MOD == 0)
                 .select("vec_id", "embedding"))
    corpus = (emb.where(F.col("vec_id") % SEMDECON_MOD != 0)
              .select("vec_id",
                      S.as_double(F.col("embedding")).alias("cvec"))
              .withColumn("cn", F.sqrt(S.dot_precast("cvec", "cvec"))))
    return bench_raw, corpus


def _semdecon_exact_screen(bench_raw, corpus) -> DataFrame:
    """The exact screen over pre-built sides. r14 (guide §1.2
    per-task work): the cosine fold is a CodegenFallback higher-order
    function, so every node in it is interpreted n×m times across the
    screen. Three cuts, each bit-identical (measured 3.4x on the
    screen kernel, symdiff 0): each side is cast to double ONCE
    (dot() re-cast per pair), each side's norm is computed ONCE
    (cosine() re-folded both norms per pair), and the tau screen
    rides the JOIN CONDITION so the remaining dot fold runs once per
    pair instead of twice (the filter+project shape re-evaluated it —
    Catalyst pushes the predicate through the projection by
    substitution)."""
    from jcf_nb_migration_spark.functions import similarity as S

    bench = F.broadcast(
        bench_raw
        .select(F.col("vec_id").alias("bench_id"),
                S.as_double(F.col("embedding")).alias("bvec"))
        .withColumn("bn", F.sqrt(S.dot_precast("bvec", "bvec"))))
    cos_raw = (S.dot_precast("cvec", "bvec")
               / (F.col("cn") * F.col("bn")))
    scored = (corpus.join(bench, cos_raw >= SEMDECON_TAU)
              .withColumn("cos_sim", F.round(cos_raw, 9)))
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos_sim"), "bench_id")
    return (scored.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") == 1)
            .select("vec_id", "bench_id", "cos_sim")
            .orderBy("vec_id"))


SEMDECON_NPROBE = 2   # bench clusters probed per corpus vector


@query(
    "semantic_decontamination_ann",
    oracle=f"""
    WITH bench_src AS (
        SELECT vec_id, embedding FROM embeddings
        WHERE vec_id % {SEMDECON_MOD} = 0
    ),
    {_sql_kmeans_cte(8, 2, src="bench_src")},
    bench_assigned AS (
        SELECT vec_id AS bench_id, embedding::DOUBLE[] AS bvec,
               c_id AS cluster
        FROM (
            SELECT b.vec_id, b.embedding, c.c_id,
                   ROW_NUMBER() OVER (PARTITION BY b.vec_id
                       ORDER BY {_sql_cos('b.embedding', 'c.c_vec')}
                           DESC, c.c_id) AS rn
            FROM bench_src b, c2 c
        ) WHERE rn = 1
    ),
    corpus AS (
        SELECT vec_id, embedding::DOUBLE[] AS cvec
        FROM embeddings WHERE vec_id % {SEMDECON_MOD} <> 0
    ),
    probed AS (
        SELECT vec_id, c_id AS cluster FROM (
            SELECT co.vec_id, c.c_id,
                   ROW_NUMBER() OVER (PARTITION BY co.vec_id
                       ORDER BY {_sql_cos('co.cvec', 'c.c_vec')}
                           DESC, c.c_id) AS rn
            FROM corpus co, c2 c
        ) WHERE rn <= {SEMDECON_NPROBE}
    ),
    scored AS (
        SELECT co.vec_id, ba.bench_id,
               ROUND({_sql_cos('co.cvec', 'ba.bvec')}, 9) AS cos_sim
        FROM corpus co
        JOIN probed p ON p.vec_id = co.vec_id
        JOIN bench_assigned ba ON ba.cluster = p.cluster
        WHERE {_sql_cos('co.cvec', 'ba.bvec')} >= {SEMDECON_TAU}
    )
    SELECT vec_id, bench_id, cos_sim FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY vec_id ORDER BY cos_sim DESC, bench_id) AS rk
        FROM scored
    ) WHERE rk = 1 ORDER BY vec_id
    """,
    tags=("curation", "decontamination", "semantic", "ann", "ivf"),
    driver_visible=False,  # rotated out r13 7th wave (green r11-r12, 2x)
)
def semantic_decontamination_ann(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """ANN-GATED semantic decontamination — the scale path
    semantic_decontamination's docstring promises: when the
    "benchmark" is itself large (a held-out SHARD, not a
    thousands-item eval suite), the broadcast-every-bench-vector fold
    stops being bounded; instead the bench side is IVF-indexed
    (deterministic k-means, k=8/2 rounds, trained ON THE BENCH — the
    cached_kmeans machinery over a subset) and each corpus vector is
    scored only against the bench members of its {SEMDECON_NPROBE}
    nearest clusters. Per-vector work drops from |bench| to the
    probed-cluster mass (~{SEMDECON_NPROBE}/8 of bench here;
    nprobe/K in general), the exact ivf_ann_probe recall trade —
    a contaminated document whose best bench match lands outside the
    probed clusters is missed, which is why the exact variant remains
    the audit tool at eval-suite scale. Output schema matches the
    exact variant (vec_id, best bench_id, cosine), so the two can be
    diffed directly as a recall report.

    Scale shape: ONE bench scan to assign (bench-bounded), one corpus
    scan exploded ×{SEMDECON_NPROBE} (ivf_probe_clusters' narrow
    codegen pass — no crossJoin), one equi-join on cluster against
    the broadcast assigned bench, per-vector top-1 window. The oracle
    replays the identical k-means + shortlist in SQL, so the
    DETERMINISTIC shortlist is hash-checked, not just the scoring."""
    bench_raw, corpus = _semdecon_sides(spark, sf_dir)
    return _semdecon_ann_screen(bench_raw, corpus)


def _semdecon_ann_screen(bench_raw, corpus) -> DataFrame:
    """The IVF-shortlisted screen over pre-built sides. r14: same
    three bit-identical cuts as the exact variant (pre-cast per side,
    pre-norm per side, tau in the join condition — see
    _semdecon_exact_screen). The probe shortlist runs over the
    pre-cast cvec: _centroid_sims casts elements itself, so a
    double→double cast is an element-wise identity. cn is computed
    BEFORE the ×nprobe explode (once per vector, not per probe row)."""
    from jcf_nb_migration_spark.functions import similarity as S

    cents = S.kmeans_train(bench_raw, k=8, iters=2)
    bench_assigned = F.broadcast(
        S.ivf_assign(bench_raw, cents)
        .select(F.col("vec_id").alias("bench_id"),
                S.as_double(F.col("embedding")).alias("bvec"),
                F.col("cluster").alias("bcluster"))
        .withColumn("bn", F.sqrt(S.dot_precast("bvec", "bvec"))))
    probed = S.ivf_probe_clusters(corpus, cents, vec_col="cvec",
                                  nprobe=SEMDECON_NPROBE)
    cos_raw = (S.dot_precast("cvec", "bvec")
               / (F.col("cn") * F.col("bn")))
    scored = (probed.join(bench_assigned,
                          (F.col("cluster") == F.col("bcluster"))
                          & (cos_raw >= SEMDECON_TAU))
              .withColumn("cos_sim", F.round(cos_raw, 9)))
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos_sim"),
                                             "bench_id")
    return (scored.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") == 1)
            .select("vec_id", "bench_id", "cos_sim")
            .orderBy("vec_id"))


@query(
    "semantic_decon_ann_recall",
    oracle=None,  # set below — composes the two variants' oracles
    tags=("curation", "decontamination", "semantic", "ann", "recall",
          "composed"),
)
def semantic_decon_ann_recall(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """RECALL REPORT for the ANN-gated decontamination — the diff the
    two variants' docstrings promise: run the exact screen and the
    IVF-shortlisted screen, compare their flagged (vec_id) sets, and
    report flag counts, hits, misses, and recall. nprobe trades recall
    for per-vector work; this query makes that trade a measured,
    oracle-checked number instead of a docstring claim (at the shipped
    nprobe={SEMDECON_NPROBE}/8 the fixture recall is 100% at sf0.01 —
    the probed-cluster mass covers every >=tau match — and the report
    is where a tighter budget would show its cost). Both inputs are
    flag-set-bounded, so the comparison is a join of two small frames;
    the corpus-scale work is the two screens themselves, whose plans
    are pinned by their own queries. A false positive is structurally
    impossible (the ANN screen scores a SUBSET of exact's candidate
    pairs with the same threshold), so the report has no fp column —
    n_ann <= n_exact always; the pytest oracle checks equality
    anyway via the full-outer join shape."""
    # r14 (VERDICT r13 item 4): both legs run the IDENTICAL screen
    # helpers over ONE pair of shared side frames. A persisted shared
    # corpus was A/B-measured and REJECTED: materializing the
    # pre-cast/pre-normed corpus cost more than the two fused
    # scan+cast+norm passes it replaced (7.31 s vs 6.20 s at the
    # 10x-derived point; the per-pair folds dominate and caching does
    # not touch them), so the legs deliberately re-derive the frame
    # from the shared builder (guide §1.1: empirical loop beats the
    # "ideal" one-materialization plan here).
    bench_raw, corpus = _semdecon_sides(spark, sf_dir)
    exact = _semdecon_exact_screen(bench_raw, corpus).select(
        "vec_id", F.lit(1).alias("_e"))
    ann = _semdecon_ann_screen(bench_raw, corpus).select(
        "vec_id", F.lit(1).alias("_a"))
    # Flag sets have unique vec_ids by construction (top-1 per vec_id),
    # so full_outer == union + one max-per-side groupBy: one tiny
    # exchange instead of a two-sort SortMergeJoin FullOuter (§2.4 —
    # the same rewrite as retrieval_pipeline_e2e's RRF merge). max over
    # {1, NULL} is 1; a side's absence stays NULL, exactly the outer
    # join's padding.
    j = (exact.withColumn("_a", F.lit(None).cast("int"))
         .unionByName(ann.select(
             "vec_id", F.lit(None).cast("int").alias("_e"), "_a"))
         .groupBy("vec_id")
         .agg(F.max("_e").alias("_e"), F.max("_a").alias("_a")))
    return j.agg(
        F.sum("_e").cast("bigint").alias("n_exact"),
        F.sum("_a").cast("bigint").alias("n_ann"),
        F.sum(F.when(F.col("_e").isNotNull()
                     & F.col("_a").isNotNull(), 1).otherwise(0))
        .cast("bigint").alias("n_common"),
        F.sum(F.when(F.col("_a").isNull(), 1).otherwise(0))
        .cast("bigint").alias("n_missed"),
        F.round(
            F.sum(F.when(F.col("_e").isNotNull()
                         & F.col("_a").isNotNull(), 1).otherwise(0))
            / F.sum("_e"), 9).alias("recall"))


def _recall_oracle() -> str:
    """Compose the two variants' oracle texts as parenthesized
    subqueries (each carries its own WITH chain; wrapping avoids CTE
    name collisions between the two k-means replays)."""
    from jcf_nb_migration_spark.registry import get

    exact_sql = get("semantic_decontamination").oracle
    ann_sql = get("semantic_decontamination_ann").oracle
    return f"""
    SELECT
        (SELECT CAST(COUNT(*) AS BIGINT) FROM ({exact_sql}) e)
            AS n_exact,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM ({ann_sql}) a)
            AS n_ann,
        (SELECT CAST(COUNT(*) AS BIGINT)
         FROM ({exact_sql}) e JOIN ({ann_sql}) a USING (vec_id))
            AS n_common,
        (SELECT CAST(COUNT(*) AS BIGINT)
         FROM ({exact_sql}) e
         WHERE e.vec_id NOT IN (SELECT vec_id FROM ({ann_sql}) a))
            AS n_missed,
        (SELECT ROUND(
            CAST((SELECT COUNT(*) FROM ({exact_sql}) e
                  JOIN ({ann_sql}) a USING (vec_id)) AS DOUBLE)
            / (SELECT COUNT(*) FROM ({exact_sql}) e), 9))
            AS recall
    """


# late-bind the composed oracle (the registry entry was created with
# oracle=None above; both component oracles exist by now)
def _bind_recall_oracle() -> None:
    from dataclasses import replace

    from jcf_nb_migration_spark import registry as _reg

    q = _reg._REGISTRY["semantic_decon_ann_recall"]
    _reg._REGISTRY["semantic_decon_ann_recall"] = replace(
        q, oracle=_recall_oracle())


_bind_recall_oracle()


TOPIC_TOPK = 5        # distinctive terms reported per cluster
TOPIC_MIN_TF = 5      # corpus support floor (kills hapax noise)


@query(
    "cluster_topic_terms",
    oracle=f"""
    WITH {_SQL_IVF_ASSIGNED},
    dtok AS (
        SELECT a.cluster, t.term
        FROM (SELECT doc_id, unnest({_SQL_TOKS}) AS term
              FROM documents) t
        JOIN assigned a ON a.vec_id = t.doc_id
    ),
    ct AS (
        SELECT cluster, term, COUNT(*) AS tf
        FROM dtok GROUP BY 1, 2
    ),
    tot AS (
        SELECT term, SUM(tf) AS corpus_tf,
               (SELECT SUM(tf) FROM ct) AS corpus_n
        FROM ct GROUP BY term
    ),
    csz AS (SELECT cluster, SUM(tf) AS cluster_n FROM ct GROUP BY 1),
    lifted AS (
        SELECT ct.cluster, ct.term, ct.tf,
               ROUND(CAST(ct.tf AS DOUBLE) * tot.corpus_n
                     / (csz.cluster_n * tot.corpus_tf), 9) AS lift
        FROM ct
        JOIN tot ON tot.term = ct.term
        JOIN csz ON csz.cluster = ct.cluster
        WHERE tot.corpus_tf >= {TOPIC_MIN_TF}
    )
    SELECT cluster, term, CAST(tf AS BIGINT) AS tf, lift FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY cluster
            ORDER BY lift DESC, term) AS rk
        FROM lifted
    ) WHERE rk <= {TOPIC_TOPK}
    ORDER BY cluster, lift DESC, term
    """,
    tags=("curation", "kmeans", "topic-labeling", "tfidf", "composed"),
    driver_visible=True,  # rotated INTO the driver window r14 (8th wave, first-time name)
)
def cluster_topic_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Topic labels for embedding clusters — the human-readable half
    of SemDeDup-style curation reports: per trained k-means cluster,
    the {TOPIC_TOPK} terms with the highest LIFT (cluster term share
    ÷ corpus term share, support ≥ {TOPIC_MIN_TF}). Lift is the
    ratio form of pointwise mutual information (the token_pmi_pairs
    idiom) so it stays a single double division of exact integer
    counts — no logs, bit-stable cross-engine.

    Plan: one embeddings scan through the replayed k-means
    assignment, one documents explode joined on the id, two bounded
    aggregates (per-(cluster, term), per-term), and a per-cluster
    top-{TOPIC_TOPK} window — parallel across clusters, the
    source_quota_cap posture. Nothing touches raw vectors after
    assignment."""
    from jcf_nb_migration_spark.functions import similarity as S
    from jcf_nb_migration_spark.queries.advanced2 import cached_kmeans

    emb = spread(t(spark, sf_dir, "embeddings"))
    assigned = S.ivf_assign(emb, cached_kmeans(emb, sf_dir)) \
        .select(F.col("vec_id").alias("doc_id"), "cluster")
    docs = spread(t(spark, sf_dir, "documents"))
    dtok = (docs.select("doc_id", F.explode(T.tokens("text")).alias("term"))
            .join(assigned, "doc_id"))
    ct = dtok.groupBy("cluster", "term").agg(F.count(F.lit(1)).alias("tf"))
    ctp = ct.persist()
    tot = ctp.groupBy("term").agg(F.sum("tf").alias("corpus_tf"))
    corpus_n = ctp.agg(F.sum("tf").cast("bigint").alias("corpus_n"))
    csz = ctp.groupBy("cluster").agg(F.sum("tf").alias("cluster_n"))
    # r14 (guide §3.1, the doc_bigram_lm_score precedent): tot is
    # VOCABULARY-bounded (one row per distinct term — ~1k at sf0.1,
    # Heaps-law sublinear in production), but its size estimate stacks
    # an aggregate on a cached relation and came out big enough that
    # the planner sort-merged this join, shuffling the K×vocab counts
    # frame. The explicit broadcast pins the bounded side; cutover for
    # a vocabulary past the cap: drop the hint, AQE shuffles.
    scored = (ctp.join(F.broadcast(tot), "term")
              .where(F.col("corpus_tf") >= TOPIC_MIN_TF)
              .join(F.broadcast(csz), "cluster")
              .crossJoin(F.broadcast(corpus_n))
              .select("cluster", "term", "tf",
                      F.round(F.col("tf").cast("double")
                              * F.col("corpus_n")
                              / (F.col("cluster_n") * F.col("corpus_tf")),
                              9).alias("lift")))
    # per-cluster rows ≈ the filtered vocabulary — big enough at
    # corpus scale to deserve the same salted two-phase top-k (r9);
    # salt on the term hash (terms are strings, vec-id salts don't
    # apply), exact by the usual survival argument
    ws = Window.partitionBy("cluster", "salt") \
        .orderBy(F.desc("lift"), "term")
    # bounded-window: const:160 — phase 2 sees ≤ 16 salts × TOPIC_TOPK
    w = Window.partitionBy("cluster").orderBy(F.desc("lift"), "term")
    survivors = (scored
                 .withColumn("salt",
                             F.pmod(F.hash("term"), F.lit(16)))
                 .withColumn("rn", F.row_number().over(ws))
                 .where(F.col("rn") <= TOPIC_TOPK)
                 .drop("rn", "salt"))
    return (survivors.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= TOPIC_TOPK)
            .select("cluster", "term", F.col("tf").cast("bigint").alias("tf"),
                    "lift")
            .orderBy("cluster", F.desc("lift"), "term"))


@query(
    "corpus_release_report",
    oracle=f"""
    WITH base AS (
        SELECT doc_id, source, lang, {_SQL_TOKS} AS w,
               md5(text) AS fp
        FROM documents
    ),
    tok AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(len(w)) AS BIGINT) AS n_tokens,
               CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
               CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
        FROM base
    ),
    dup AS (
        SELECT CAST(SUM(cnt - 1) AS BIGINT) AS n_exact_dup_docs
        FROM (SELECT fp, COUNT(*) AS cnt FROM base GROUP BY fp)
    ),
    g AS (
        SELECT doc_id, source,
               unnest({_sql_ngrams(DECON_N, distinct=True)}) AS ngram
        FROM (SELECT doc_id, source, w FROM base)
    ),
    bench AS (
        SELECT DISTINCT ngram FROM g WHERE source = '{BENCH_SOURCE}'
    ),
    cont AS (
        SELECT CAST(COUNT(DISTINCT g.doc_id) AS BIGINT)
                   AS n_contaminated_docs
        FROM g JOIN bench b ON b.ngram = g.ngram
        WHERE g.source <> '{BENCH_SOURCE}'
    ),
    sp AS (
        SELECT CAST(SUM(CASE WHEN h < {VALID_LO} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_train,
               CAST(SUM(CASE WHEN h >= {VALID_LO} AND h < {TEST_LO}
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
               CAST(SUM(CASE WHEN h >= {TEST_LO} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_test
        FROM (SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                         || ':split'), 1, 12))::BIGINT
                         % {SPLIT_MOD} AS h
              FROM base)
    )
    SELECT tok.n_docs, tok.n_tokens, tok.n_sources, tok.n_langs,
           dup.n_exact_dup_docs,
           ROUND(CAST(dup.n_exact_dup_docs AS DOUBLE) / tok.n_docs, 9)
               AS exact_dup_rate,
           cont.n_contaminated_docs,
           sp.n_train, sp.n_valid, sp.n_test
    FROM tok, dup, cont, sp
    """,
    tags=("curation", "dataset-card", "report", "composed"),
    driver_visible=True,  # rotated INTO the driver window r14 (8th wave, first-time name)
)
def corpus_release_report(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """The DATASET CARD numbers — the one-row release report a corpus
    publisher ships beside the data: document/token/source/language
    census, exact-duplicate count and rate (md5 fingerprints, the
    dedup_exact rule), benchmark-contaminated document count
    ({DECON_N}-gram overlap with the held-out source), and the
    hash-split sizes. Four independent 1-row scalar aggregates over
    ONE shared base projection, composed by broadcast crossJoins into
    a single lazy plan — each component is exactly the machinery its
    standalone query runs, so the card can never drift from the
    pipeline it summarizes.

    Scale: the base frame is persisted (four branches read it); the
    heaviest branch is the n-gram contamination equi-join, identical
    to decontaminate_ngrams' plan; everything else is one aggregate
    pass."""
    docs = spread(t(spark, sf_dir, "documents"))
    base = (docs.select("doc_id", "source", "lang",
                        T.tokens("text").alias("w"),
                        F.md5("text").alias("fp"))
            .persist())
    tok = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("w")).cast("bigint").alias("n_tokens"),
        F.countDistinct("source").alias("n_sources"),
        F.countDistinct("lang").alias("n_langs"))
    dup = (base.groupBy("fp").agg(F.count(F.lit(1)).alias("cnt"))
           .agg(F.sum(F.col("cnt") - 1).cast("bigint")
                .alias("n_exact_dup_docs")))
    g = base.select(
        "doc_id", "source",
        F.explode(F.array_distinct(
            T.word_shingles(F.col("w"), DECON_N))).alias("ngram"))
    bench = (g.where(F.col("source") == BENCH_SOURCE)
             .select("ngram").distinct())
    cont = (g.where(F.col("source") != BENCH_SOURCE)
            .join(bench, "ngram")
            .agg(F.countDistinct("doc_id").alias("n_contaminated_docs")))
    h = (F.conv(F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"),
                           F.lit(":split"))), 1, 12), 16, 10)
         .cast("bigint") % SPLIT_MOD)
    sp = base.select(h.alias("h")).agg(
        F.sum(F.when(F.col("h") < VALID_LO, 1).otherwise(0))
         .cast("bigint").alias("n_train"),
        F.sum(F.when((F.col("h") >= VALID_LO)
                     & (F.col("h") < TEST_LO), 1).otherwise(0))
         .cast("bigint").alias("n_valid"),
        F.sum(F.when(F.col("h") >= TEST_LO, 1).otherwise(0))
         .cast("bigint").alias("n_test"))
    return (tok.crossJoin(F.broadcast(dup))
            .crossJoin(F.broadcast(cont))
            .crossJoin(F.broadcast(sp))
            .select("n_docs", "n_tokens", "n_sources", "n_langs",
                    "n_exact_dup_docs",
                    F.round(F.col("n_exact_dup_docs").cast("double")
                            / F.col("n_docs"), 9).alias("exact_dup_rate"),
                    "n_contaminated_docs",
                    "n_train", "n_valid", "n_test"))


@query(
    "doc_pareto_frontier",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS w FROM documents),
    pts AS (
        SELECT doc_id, CAST(len(w) AS BIGINT) AS n_toks,
               CAST(len(list_distinct(w)) AS BIGINT) * 1000000
                   // CAST(len(w) AS BIGINT) AS ttr_fp
        FROM toks WHERE len(w) > 0
    ),
    px AS (SELECT n_toks, MAX(ttr_fp) AS my FROM pts GROUP BY n_toks),
    rm AS (
        SELECT n_toks, my, MAX(my) OVER (
            ORDER BY n_toks DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS better
        FROM px
    )
    SELECT p.doc_id, p.n_toks, p.ttr_fp
    FROM pts p JOIN rm USING (n_toks)
    WHERE p.ttr_fp = rm.my
      AND (rm.better IS NULL OR rm.better < p.ttr_fp)
    ORDER BY doc_id
    """,
    tags=("curation", "skyline", "pareto", "multi-objective",
          "pandas-udf"),
    # rotated OUT of the driver window r14 (8th wave);
    # pattern witnessed by scalar_iter_doc_stats (coverage_map.py)
    driver_visible=False,
)
def doc_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier of the corpus on (token count, type-token
    ratio) — the documents no other document beats on BOTH length and
    lexical density at once, via the generic distributed skyline
    operator (functions/skyline.skyline: per-batch
    sort-filter-skyline local pass with NO shuffle, then one global
    pass over the candidate union; exact, partitioning-invariant).
    The two axes are naturally anti-correlated (longer documents
    repeat more), so the frontier is a real curve, and it is the
    shortlist every monotone quality weighting's argmax lives in —
    the right curation cut while the final mixture weights are still
    undecided. The ratio is fixed-point
    ``distinct_tokens * 1e6 div tokens`` (BIGINT floor division,
    identical in Spark ``div`` and DuckDB ``//`` for these positive
    operands) so cross-engine equality is exact — no float tolerance.

    The oracle states the same set positionally for the 2-D case:
    a document survives iff it carries the max density at its exact
    length AND no strictly longer document matches that density
    (running max over lengths descending) — O(n log n), so the sweep
    stays cheap at every SF while the Spark side exercises the general
    d-dimensional operator (d>2 pinned against brute force in
    tests/test_skyline.py)."""
    from jcf_nb_migration_spark.functions.skyline import skyline

    docs = spread(t(spark, sf_dir, "documents"))
    w = T.tokens("text")
    pts = (docs.select(
        "doc_id",
        F.size(w).cast("long").alias("n_toks"),
        F.size(F.array_distinct(w)).cast("long").alias("n_dtoks"))
        .where(F.col("n_toks") > 0)
        .select("doc_id", "n_toks",
                F.expr("n_dtoks * 1000000 div n_toks").alias("ttr_fp")))
    return skyline(pts, ["n_toks", "ttr_fp"]).orderBy("doc_id")
