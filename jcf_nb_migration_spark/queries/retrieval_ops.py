"""Retrieval and model-scoring queries over the documents table:
BM25 ranking, inverted-index postings, sketch-gated heavy hitters,
hashed-feature linear-model inference, and cross-document boilerplate
n-gram coverage (the candidate-generation half of substring-level
dedup, Lee et al. 2022 "Deduplicating Training Data Makes Language
Models Better").

Scale notes are per-query; the common theme is that every unbounded
join key (token, n-gram) is shuffled, never broadcast, while every
bounded-by-construction table (query terms, weight buckets, scalar
stats) is broadcast explicitly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from jcf_nb_migration_spark.functions import text as T
from jcf_nb_migration_spark.localrel import local_df
from jcf_nb_migration_spark.queries.curation_ops import _sql_ngrams
from jcf_nb_migration_spark.queries.text_analysis import (_sql_hash48,
                                                          _SQL_TOKS)
from jcf_nb_migration_spark.registry import query, spread, t

# BM25 parameters (the Robertson/Sparck-Jones defaults) and a fixed
# probe query over the synthetic vocabulary. In production the terms
# come in per-request; the plan shape is identical.
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TERMS = ("spark", "window", "merge")
_SQL_TERMS = ", ".join(f"'{w}'" for w in BM25_TERMS)

# Linear-model geometry: hashed-unigram buckets and a deterministic
# pseudo-weight per bucket (Knuth multiplicative constant), in integer
# milli-units so the per-document sum is exact in both engines. A real
# pipeline loads learned weights; the plan — explode, hash, join a
# bucket-count-bounded weight table, one exact groupBy — is the same.
W_BUCKETS = 512
W_MULT = 2654435761  # 2^32 * golden ratio, Knuth's multiplicative hash

# Boilerplate detection: n-gram order and the document-frequency
# threshold above which an n-gram counts as corpus boilerplate.
BOIL_N = 3
BOIL_MIN_DOCS = 4


def _sql_bm25_ctes() -> str:
    """BM25 CTE chain shared by bm25_top_docs / rrf_fusion /
    retrieval_pipeline_e2e oracles. Expects a prior CTE
    ``d(doc_id, w)`` holding the (possibly quality-gated) corpus and
    yields ``bm(doc_id, n_terms_matched, bm25)`` — the SQL twin of
    ``_bm25_frames`` below, kept textually single-sourced so the two
    scorers can never drift apart."""
    return f"""dl AS (SELECT doc_id, len(w) AS dl FROM d),
    stats AS (
        SELECT COUNT(*) AS n_docs,
               CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
        FROM dl
    ),
    occ AS (SELECT doc_id, unnest(w) AS tok FROM d),
    tf AS (
        SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
        FROM occ WHERE tok IN ({_SQL_TERMS}) GROUP BY doc_id, tok
    ),
    dfreq AS (
        SELECT tok, COUNT(DISTINCT doc_id) AS df
        FROM occ WHERE tok IN ({_SQL_TERMS}) GROUP BY tok
    ),
    bm AS (
        SELECT tf.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_terms_matched,
               ROUND(SUM(ln(1.0 + (s.n_docs - dfreq.df + 0.5)
                                  / (dfreq.df + 0.5))
                         * tf.tf * ({BM25_K1} + 1.0)
                         / (tf.tf + {BM25_K1} * (1.0 - {BM25_B}
                            + {BM25_B} * dl.dl / s.avgdl))), 9) AS bm25
        FROM tf JOIN dfreq USING (tok)
        JOIN dl ON dl.doc_id = tf.doc_id
        CROSS JOIN stats s
        GROUP BY tf.doc_id
    )"""


def _bm25_perdoc(toks: DataFrame,
                 carry: tuple[str, ...] = (),
                 persist: bool = True) -> DataFrame:
    """One corpus pass → PERSISTED narrow per-doc proxy
    ``(doc_id, *carry, dl, tf_0..tf_{k-1})``: dl is the token count,
    tf_i the in-row frequency of query term i
    (``size(filter(w, x -> x = term))`` — no explode, no shuffle).

    The guide-§8 move applied to lexical scoring: every BM25 decision
    (stats, document frequency, the score itself) depends only on
    these few bytes per document, never on the text again — so the
    heavy text column is scanned and tokenized exactly ONCE and every
    downstream consumer reads the cached proxy. The proxy is
    |docs| × ~40 bytes (MEMORY_AND_DISK-persistable at any corpus
    scale by construction); the corpus itself is never cached. The
    r13 before-plan for retrieval_pipeline_e2e showed SIX scans of
    documents.parquet — six tokenizations plus the explode and its
    (doc_id, tok) shuffle — for information this one projection
    carries."""
    def _is(term):
        # a dedicated factory: a two-parameter lambda would be read
        # by F.filter as the (element, index) form
        return lambda x: x == term

    cols: list = [F.col(c) for c in ("doc_id", *carry)]
    cols.append(F.size("w").alias("dl"))
    for i, term in enumerate(BM25_TERMS):
        cols.append(F.size(F.filter(F.col("w"), _is(term)))
                    .cast("bigint").alias(f"tf_{i}"))
    out = toks.select(*cols)
    # persist=False exists for measurement tooling (serving_bench's
    # data-touched walker needs the storage-backed plan, which an
    # InMemoryRelation would hide); query paths keep the default.
    return out.persist() if persist else out


def _bm25_frames(toks: DataFrame,
                 perdoc: DataFrame | None = None
                 ) -> tuple[DataFrame, DataFrame]:
    """Shared lexical scorer: ``toks(doc_id, w)`` → ``(tf, bm)`` where
    ``tf`` is the per-(doc, query-term) frequency table and ``bm`` the
    per-doc ``(doc_id, n_terms_matched, bm25)`` frame.

    r13 shape (guide §2.3/§2.4/§8): term frequencies are computed
    IN-ROW on the persisted ``_bm25_perdoc`` proxy, so the corpus
    explode and its (doc_id, tok) shuffle are gone entirely — the
    scalar (N, avgdl) stats and the per-term document frequencies
    collapse into ONE map-side-combined aggregate over the proxy (a
    1-row broadcast), and scoring is a whole-stage-codegen projection.
    Zero corpus-sized shuffles remain. The per-term score expression
    is textually the joined formulation's arithmetic; contributions
    sum in fixed term order, and the score stays rounded to 9
    decimals (the same rounding that already absorbed sum order
    across engines — hash-verified against the unchanged oracle at
    sf0.01/sf0.1/derived)."""
    if perdoc is None:
        perdoc = _bm25_perdoc(toks)
    k = len(BM25_TERMS)
    tfs = [F.col(f"tf_{i}") for i in range(k)]
    stats = perdoc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        *[F.sum(F.when(tfs[i] > 0, 1).otherwise(0)).cast("bigint")
          .alias(f"df_{i}") for i in range(k)])
    contribs = []
    for i in range(k):
        dfc = F.col(f"df_{i}")
        idf = F.log(1.0 + (F.col("n_docs") - dfc + 0.5) / (dfc + 0.5))
        denom = (tfs[i] + BM25_K1 * (1.0 - BM25_B
                 + BM25_B * F.col("dl") / F.col("avgdl")))
        # absent terms contribute literal 0.0 — x + 0.0 == x exactly,
        # so the fixed-order fold equals the matched-only sum
        contribs.append(
            F.when(tfs[i] > 0, idf * tfs[i] * (BM25_K1 + 1.0) / denom)
            .otherwise(F.lit(0.0)))
    nmatch = F.when(tfs[0] > 0, 1).otherwise(0)
    for i in range(1, k):
        nmatch = nmatch + F.when(tfs[i] > 0, 1).otherwise(0)
    score = contribs[0]
    for c in contribs[1:]:
        score = score + c
    bm = (perdoc.crossJoin(F.broadcast(stats))
          .where(nmatch > 0)
          .select("doc_id",
                  nmatch.cast("bigint").alias("n_terms_matched"),
                  F.round(score, 9).alias("bm25")))
    # tf keeps the old explode-path contract — (doc_id, tok, tf) rows
    # only where tf > 0 — but expands in-row from the proxy's k
    # columns (k = |query terms|), never from the corpus token stream
    pairs = F.array(*[
        F.struct(F.lit(term).alias("tok"), tfs[i].alias("tf"))
        for i, term in enumerate(BM25_TERMS)])
    tf = (perdoc.select(
            "doc_id",
            F.explode(F.filter(pairs, lambda s: s["tf"] > 0)).alias("p"))
          .select("doc_id", F.col("p.tok").alias("tok"),
                  F.col("p.tf").alias("tf")))
    return tf, bm


@query(
    "bm25_top_docs",
    oracle=f"""
    WITH d AS (SELECT doc_id, {_SQL_TOKS} AS w FROM documents),
    {_sql_bm25_ctes()}
    SELECT doc_id, n_terms_matched, bm25
    FROM bm ORDER BY bm25 DESC, doc_id LIMIT 20
    """,
    tags=("retrieval", "bm25", "ranking"),
    # kept local to fit the 50-name driver window; the unbounded-key
    # tf join pattern is driver-visible via tfidf_top_terms
    # rotated OUT of the driver window r10 (green in 3 driver
    # rounds); pattern twin: bm25_top_docs_served
    # (coverage_map.py); still oracle-run at every pytest.
    driver_visible=False,
)
def bm25_top_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 documents for a fixed term query — the lexical
    retrieval scorer every RAG/data-curation stack runs beside its
    embedding ANN. One token explode feeds both the per-(doc, term)
    tf table and the per-term document frequency; df and the scalar
    (N, avgdl) stats are bounded by the QUERY size, not the corpus,
    so both broadcast by construction, and the only corpus-sized
    shuffle is the tf groupBy on (doc_id, tok). Final score rounded
    to 9 decimals (sum order across engines), ties broken by doc_id
    so the top-20 cut is deterministic."""
    docs = spread(t(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", T.tokens("text").alias("w"))
    _, bm = _bm25_frames(toks)
    return (bm.select("doc_id", "n_terms_matched", "bm25")
            .orderBy(F.desc("bm25"), "doc_id")
            .limit(20))


@query(
    "inverted_index_postings",
    oracle=f"""
    WITH occ AS (
        SELECT doc_id, unnest({_SQL_TOKS}) AS tok FROM documents
    ),
    tf AS (
        SELECT tok, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
        FROM occ GROUP BY tok, doc_id
    )
    SELECT tok,
           CAST(COUNT(*) AS BIGINT) AS df,
           CAST(SUM(tf) AS BIGINT) AS total_tf,
           array_to_string(
               (list(doc_id ORDER BY tf DESC, doc_id))[1:8], ',')
               AS top_postings
    FROM tf GROUP BY tok ORDER BY tok
    """,
    tags=("retrieval", "inverted-index", "posting-list"),
    # rotated INTO the driver window r9 (term-keyed rollup witness
    # after tfidf_top_terms rotated out)
    # rotated OUT r11 5th wave (multi-green in driver
    # artifacts); same-pattern visible twin: term_source_dispersion
    driver_visible=False,
)
def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build: per term, document frequency, total term
    frequency, and the tf-ranked top-8 posting list (comma-joined for
    a stable cross-engine rendering). The collect is CAPPED BEFORE
    AGGREGATION — a row_number window keeps ≤8 rows per term — so a
    stopword appearing in every document of a 100 TB corpus
    contributes 8 rows to the collect_list, not a billion; the full
    df/total_tf stats come from a separate unbounded-safe groupBy.
    Both shuffles key on the term; at scale this is also the natural
    bucketing column for the index files.

    The top-k window itself is the one per-token shape partial
    aggregation can't fix (tools/skew_probe.py): a naive
    Window.partitionBy(tok) sorts EVERY posting of a stopword in one
    task — fine at fixture scale (225k-row hot key sorts in <1s),
    fatal on a 100 TB corpus where a stopword holds ~10^10 postings.
    So the rank runs SALTED two-phase: per-(tok, doc_id%16) top-8
    first, then top-8 over the ≤128 survivors per token. Exact for
    per-key top-k — a global top-8 member has <8 rows above it in its
    own salt bucket, so it always survives phase one — and the
    re-rank's rn is recomputed over survivors, so ranks are identical
    to the naive window's (oracle-pinned)."""
    docs = spread(t(spark, sf_dir, "documents"))
    occ = docs.select("doc_id", F.explode(T.tokens("text")).alias("tok"))
    tf = (occ.groupBy("tok", "doc_id")
          .agg(F.count(F.lit(1)).alias("tf")))
    stats = tf.groupBy("tok").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("total_tf"))
    ws = Window.partitionBy("tok", "salt").orderBy(F.desc("tf"), "doc_id")
    # bounded-window: post-salt:128 — phase 2 sees ≤ 16 salts × 8 rows
    w = Window.partitionBy("tok").orderBy(F.desc("tf"), "doc_id")
    survivors = (tf.withColumn("salt", (F.col("doc_id") % 16).cast("int"))
                 .withColumn("rn", F.row_number().over(ws))
                 .where(F.col("rn") <= 8)
                 .drop("rn", "salt"))
    top = (survivors.withColumn("rn", F.row_number().over(w))
           .where(F.col("rn") <= 8))
    postings = (
        top.groupBy("tok")
        .agg(F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct(
                    F.col("rn").alias("rn"),
                    F.col("doc_id").alias("doc_id")))),
                lambda s: s["doc_id"].cast("string")),
            ",").alias("top_postings"))
    )
    return (stats.join(postings, "tok")
            .select("tok", "df", "total_tf", "top_postings")
            .orderBy("tok"))


@query(
    "heavy_hitters_topk",
    oracle=f"""
    WITH occ AS (
        SELECT unnest({_SQL_TOKS}) AS tok FROM documents
    )
    SELECT tok, CAST(COUNT(*) AS BIGINT) AS exact_count,
           TRUE AS in_sketch, TRUE AS est_exact
    FROM occ GROUP BY tok
    ORDER BY exact_count DESC, tok LIMIT 10
    """,
    tags=("approx", "sketch", "heavy-hitters"),
    # rotated INTO the driver window r9 (sketch-family witness after
    # approx_distinct_stats rotated out)
    # rotated OUT of the driver window r10 (green in 1 driver
    # round); pattern twin: cms_token_counts
    # (coverage_map.py); still oracle-run at every pytest.
    driver_visible=False,
)
def heavy_hitters_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary heavy hitters, sketch-gated like
    approx_distinct_stats: the exact top-10 tokens (count desc, token
    asc — deterministic under ties) are checked against an
    approx_top_k(30, 65536) sketch of the same stream. With more slots
    than distinct tokens the sketch's estimates are provably exact, so
    the oracle expects in_sketch and est_exact TRUE for every row —
    the driver row proves sketch accuracy, not just execution. At
    100 TB the same one-pass sketch replaces the exact groupBy (whose
    output IS the vocabulary) when only the top of the distribution is
    needed; asking the sketch for 30 ≫ 10 items keeps boundary ties
    away from the comparison."""
    docs = spread(t(spark, sf_dir, "documents"))
    occ = docs.select(F.explode(T.tokens("text")).alias("tok"))
    exact = (occ.groupBy("tok")
             .agg(F.count(F.lit(1)).alias("exact_count"))
             .orderBy(F.desc("exact_count"), "tok")
             .limit(10))
    sketch = (occ.agg(F.expr("approx_top_k(tok, 30, 65536)").alias("sk"))
              .select(F.explode("sk").alias("e"))
              .select(F.col("e.item").alias("tok"),
                      F.col("e.count").alias("est")))
    return (exact.join(F.broadcast(sketch), "tok", "left")
            .select("tok", "exact_count",
                    F.col("est").isNotNull().alias("in_sketch"),
                    (F.col("est") == F.col("exact_count"))
                    .alias("est_exact"))
            .orderBy(F.desc("exact_count"), "tok"))


@query(
    "doc_quality_linear_model",
    oracle=f"""
    WITH weights AS (
        SELECT i AS bucket,
               (i * {W_MULT}) % 2001 - 1000 AS w_milli
        FROM generate_series(0, {W_BUCKETS - 1}) AS g(i)
    ),
    occ AS (
        SELECT doc_id, unnest({_SQL_TOKS}) AS tok FROM documents
    ),
    feat AS (
        SELECT doc_id, {_sql_hash48('tok')} % {W_BUCKETS} AS bucket
        FROM occ
    ),
    per_doc AS (
        SELECT f.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(w.w_milli) AS BIGINT) AS sum_milli
        FROM feat f JOIN weights w ON w.bucket = f.bucket
        GROUP BY f.doc_id
    )
    SELECT doc_id, n_tokens, sum_milli,
           ROUND(1.0 / (1.0 + exp(-(CAST(sum_milli AS DOUBLE)
                 / (1000.0 * n_tokens)))), 9) AS quality_prob
    FROM per_doc
    """,
    tags=("curation", "quality", "linear-model", "hashed-features"),
    # rotated INTO the driver window r9
    # rotated OUT r11 5th wave (multi-green in driver
    # artifacts); same-pattern visible twin: gopher_quality_flags
    driver_visible=False,
)
def doc_quality_linear_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style quality-classifier INFERENCE as a relational
    plan: tokens hash into {W_BUCKETS} feature buckets, each bucket
    joins its weight from a model table whose size is fixed by the
    bucket count — broadcast-safe by construction at any corpus size,
    the same geometry argument as the Bloom filter's word table — and
    the mean weight goes through a sigmoid. Weights are integer
    milli-units so the per-document sum is exact cross-engine (the
    bigram-LM fixed-point trick); only the final sigmoid is a rounded
    double. Here the weights are a deterministic hash of the bucket id
    (this sandbox trains nothing); swapping in learned weights changes
    one table, not the plan."""
    docs = spread(t(spark, sf_dir, "documents"))
    weights = (spark.range(W_BUCKETS)
               .select(F.col("id").alias("bucket"),
                       ((F.col("id") * W_MULT) % 2001 - 1000)
                       .alias("w_milli")))
    feat = (docs.select("doc_id", F.explode(T.tokens("text")).alias("tok"))
            .select("doc_id",
                    (T.token_hash48(F.col("tok")) % W_BUCKETS)
                    .alias("bucket")))
    per_doc = (feat.join(F.broadcast(weights), "bucket")
               .groupBy("doc_id")
               .agg(F.count(F.lit(1)).alias("n_tokens"),
                    F.sum("w_milli").alias("sum_milli")))
    raw = F.col("sum_milli").cast("double") / (1000.0 * F.col("n_tokens"))
    return per_doc.select(
        "doc_id", "n_tokens", "sum_milli",
        F.round(1.0 / (1.0 + F.exp(-raw)), 9).alias("quality_prob"))


@query(
    "doc_boilerplate_coverage",
    oracle=f"""
    WITH d AS (SELECT doc_id, {_SQL_TOKS} AS w FROM documents),
    grams AS (
        SELECT doc_id, {_sql_ngrams(BOIL_N, distinct=False)} AS gs
        FROM d
    ),
    occ AS (
        SELECT doc_id,
               unnest(gs) AS g,
               unnest(generate_series(1, len(gs))) AS p
        FROM grams
    ),
    freq AS (
        SELECT g FROM occ GROUP BY g
        HAVING COUNT(DISTINCT doc_id) >= {BOIL_MIN_DOCS}
    ),
    covered AS (
        SELECT DISTINCT o.doc_id, cp.cp
        FROM occ o
        JOIN freq USING (g)
        CROSS JOIN unnest(generate_series(o.p, o.p + {BOIL_N - 1}))
            AS cp(cp)
    ),
    per_doc AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_covered
        FROM covered GROUP BY doc_id
    )
    SELECT d.doc_id, CAST(len(d.w) AS BIGINT) AS n_tokens,
           COALESCE(p.n_covered, 0) AS n_covered,
           CASE WHEN len(d.w) > 0
                THEN CAST(COALESCE(p.n_covered, 0) AS DOUBLE) / len(d.w)
                ELSE 0.0 END AS coverage_frac
    FROM d LEFT JOIN per_doc p ON p.doc_id = d.doc_id
    """,
    tags=("curation", "dedup", "boilerplate", "ngram"),
    # rotated INTO the driver window r9
    # rotated OUT of the driver window r10 second wave (green in
    # 1 driver round); pattern twin: duplicate_spans
    # (coverage_map.py); still oracle-run at every pytest.
    driver_visible=False,
)
def doc_boilerplate_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate detection — the candidate half of
    substring-level dedup (Lee et al. 2022): an n-gram occurring in
    ≥{BOIL_MIN_DOCS} distinct documents is corpus boilerplate, and
    each document reports how many of its token positions fall inside
    any boilerplate occurrence (scrubbing = dropping exactly those
    positions). Shape: positional n-gram explode → document-frequency
    groupBy on the gram key → semi-join back → per-doc interval union.
    Every join keys on the gram (shuffled, never broadcast — the gram
    table is corpus-sized). Covered-position counting gathers each
    doc's surviving start positions once (collect_list, one shuffle
    carrying ONE row per boilerplate occurrence) and takes the union
    length of the fixed-width intervals [p, p+{BOIL_N}-1] in a single
    sorted in-row fold — replacing the previous ×{BOIL_N} position
    fan-out plus a corpus-wide distinct (two extra shuffles of an
    N×-inflated stream)."""
    docs = spread(t(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", T.tokens("text").alias("w"))
    occ = (toks.select(
               "doc_id",
               F.posexplode(T.word_shingles(F.col("w"), BOIL_N))
               .alias("p0", "g"))
           .select("doc_id", (F.col("p0") + 1).alias("p"), "g"))
    freq = (occ.groupBy("g")
            .agg(F.countDistinct("doc_id").alias("df"))
            .where(F.col("df") >= BOIL_MIN_DOCS)
            .select("g"))
    zero = F.lit(0).cast("bigint")
    init = F.struct(zero.alias("end"), zero.alias("tot"))

    def _merge(acc, p):
        lo = p.cast("bigint")
        hi = lo + (BOIL_N - 1)
        add = F.greatest(zero, hi - F.greatest(acc["end"], lo - 1))
        return F.struct(F.greatest(acc["end"], hi).alias("end"),
                        (acc["tot"] + add).alias("tot"))

    per_doc = (occ.join(freq, "g", "left_semi")
               .groupBy("doc_id")
               .agg(F.sort_array(F.collect_list("p")).alias("ps"))
               .select("doc_id",
                       F.aggregate("ps", init, _merge,
                                   lambda acc: acc["tot"])
                        .alias("n_covered")))
    base = toks.select("doc_id", F.size("w").cast("bigint")
                       .alias("n_tokens"))
    return base.join(per_doc, "doc_id", "left").select(
        "doc_id", "n_tokens",
        F.coalesce(F.col("n_covered"), F.lit(0)).alias("n_covered"),
        F.when(F.col("n_tokens") > 0,
               F.coalesce(F.col("n_covered"), F.lit(0)).cast("double")
               / F.col("n_tokens"))
         .otherwise(F.lit(0.0)).alias("coverage_frac"))


RRF_K = 60  # the standard reciprocal-rank-fusion damping constant


@query(
    "rrf_fusion",
    oracle=f"""
    WITH d AS (SELECT doc_id, {_SQL_TOKS} AS w FROM documents),
    {_sql_bm25_ctes()},
    list_a AS (
        SELECT doc_id, rank_a FROM (
            SELECT doc_id, CAST(row_number() OVER (
                       ORDER BY bm25 DESC, doc_id) AS BIGINT) AS rank_a
            FROM bm) WHERE rank_a <= 20
    ),
    ts AS (
        SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS tf_sum
        FROM tf GROUP BY doc_id
    ),
    list_b AS (
        SELECT doc_id, rank_b FROM (
            SELECT doc_id, CAST(row_number() OVER (
                       ORDER BY tf_sum DESC, doc_id) AS BIGINT) AS rank_b
            FROM ts) WHERE rank_b <= 20
    )
    SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id, rank_a, rank_b,
           ROUND(COALESCE(1.0 / ({RRF_K} + rank_a), 0.0)
                 + COALESCE(1.0 / ({RRF_K} + rank_b), 0.0), 9) AS rrf
    FROM list_a a FULL OUTER JOIN list_b b USING (doc_id)
    ORDER BY rrf DESC, doc_id LIMIT 10
    """,
    tags=("retrieval", "rrf", "rank-fusion"),
    # rotated OUT of the driver window r10 (green in 3 driver
    # rounds); pattern twin: retrieval_pipeline_e2e
    # (coverage_map.py); still oracle-run at every pytest.
    driver_visible=False,
)
def rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al.) of two retrieval lists
    for the same query: BM25 top-20 and raw term-frequency top-20,
    fused as Σ 1/({RRF_K}+rank) — the standard way a hybrid retrieval
    stack merges heterogeneous scorers without score calibration.
    Ranks are integers from deterministic (score, doc_id) orderings,
    so the fusion arithmetic is a fixed IEEE sequence cross-engine.
    Scale: both lists are top-k (bounded), so ranking is a
    TakeOrdered and the fusion join is k-vs-k — negligible beside the
    corpus-sized tf pass it shares with bm25_top_docs."""
    docs = spread(t(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", T.tokens("text").alias("w"))
    tf, bm = _bm25_frames(toks)
    # top-k cut FIRST (orderBy+limit = distributed TakeOrdered), so
    # the unpartitioned ranking window only ever sees 20 rows — never
    # the full matched set (the global-window funnel this avoids is
    # the same one sequence_packing's two-phase design removes)
    # bounded-window: post-limit:20 — applied after .limit(20)
    wa = Window.orderBy(F.desc("bm25"), "doc_id")
    list_a = (bm.orderBy(F.desc("bm25"), "doc_id").limit(20)
              .select("doc_id",
                      F.row_number().over(wa).cast("bigint")
                      .alias("rank_a")))
    ts = tf.groupBy("doc_id").agg(F.sum("tf").alias("tf_sum"))
    # bounded-window: post-limit:20 — applied after .limit(20)
    wb = Window.orderBy(F.desc("tf_sum"), "doc_id")
    list_b = (ts.orderBy(F.desc("tf_sum"), "doc_id").limit(20)
              .select("doc_id",
                      F.row_number().over(wb).cast("bigint")
                      .alias("rank_b")))
    fused = (
        list_a.join(list_b, "doc_id", "full_outer")
        .select("doc_id", "rank_a", "rank_b",
                F.round(
                    F.coalesce(F.lit(1.0) / (RRF_K + F.col("rank_a")),
                               F.lit(0.0))
                    + F.coalesce(F.lit(1.0) / (RRF_K + F.col("rank_b")),
                                 F.lit(0.0)), 9).alias("rrf"))
    )
    return fused.orderBy(F.desc("rrf"), "doc_id").limit(10)


# --- hybrid retrieval end-to-end ------------------------------------
# Quality gate → (BM25 lexical ∥ LSH-shortlisted semantic) → RRF.
# Composes the suite's existing pieces into the one query a RAG stack
# actually runs; the semantic shortlist is the multiprobe bucket
# equi-join (never a corpus scan), plan-guarded in tests/test_plans.py.
RPE_MIN_TOKS = 10   # quality gate: at least this many tokens
RPE_LANG = "en"     # quality gate: language
RPE_LIST_K = 20     # per-retriever shortlist size
RPE_TOP = 10        # fused results returned
RPE_PROBE_ID = 0    # query vector (vec_id = doc_id in the fixtures)


def _sql_rpe_oracle() -> str:
    from jcf_nb_migration_spark.queries.similarity_search import (
        _sql_cos, _sql_lsh_bucket,
    )
    return f"""
    WITH g AS (
        SELECT doc_id, source, {_SQL_TOKS} AS w FROM documents
        WHERE lang = '{RPE_LANG}' AND len({_SQL_TOKS}) >= {RPE_MIN_TOKS}
    ),
    d AS (SELECT doc_id, w FROM g),
    {_sql_bm25_ctes()},
    list_lex AS (
        SELECT doc_id, rank_lex FROM (
            SELECT doc_id, CAST(row_number() OVER (
                       ORDER BY bm25 DESC, doc_id) AS BIGINT) AS rank_lex
            FROM bm) WHERE rank_lex <= {RPE_LIST_K}
    ),
    bucketed AS (
        SELECT vec_id, embedding, {_sql_lsh_bucket('embedding')} AS bucket
        FROM embeddings
    ),
    probe AS (SELECT embedding AS pvec, bucket AS pbucket
              FROM bucketed WHERE vec_id = {RPE_PROBE_ID}),
    cand_buckets AS (
        SELECT xor(probe.pbucket, f.flip) AS bucket, probe.pvec
        FROM probe, (SELECT unnest([0, 1, 2, 4, 8, 16, 32]) AS flip) f
    ),
    sem AS (
        SELECT b.vec_id AS doc_id,
               {_sql_cos('b.embedding', 'cb.pvec')} AS cos_sim
        FROM bucketed b JOIN cand_buckets cb ON b.bucket = cb.bucket
        WHERE b.vec_id <> {RPE_PROBE_ID}
          AND b.vec_id IN (SELECT doc_id FROM g)
    ),
    list_sem AS (
        SELECT doc_id, rank_sem FROM (
            SELECT doc_id, CAST(row_number() OVER (
                       ORDER BY cos_sim DESC, doc_id) AS BIGINT) AS rank_sem
            FROM sem) WHERE rank_sem <= {RPE_LIST_K}
    ),
    fused AS (
        SELECT doc_id, rank_lex, rank_sem,
               ROUND(COALESCE(1.0 / ({RRF_K} + rank_lex), 0.0)
                     + COALESCE(1.0 / ({RRF_K} + rank_sem), 0.0), 9)
                   AS rrf
        FROM list_lex FULL OUTER JOIN list_sem USING (doc_id)
    )
    SELECT f.doc_id, rank_lex, rank_sem, rrf, g.source
    FROM fused f JOIN g ON g.doc_id = f.doc_id
    ORDER BY rrf DESC, f.doc_id LIMIT {RPE_TOP}
    """


@query(
    "retrieval_pipeline_e2e",
    oracle=_sql_rpe_oracle(),
    headline=True,  # r7: the retrieval marquee joins the bench set —
    #   cross-round totals stay comparable via the like-for-like
    #   subset (the r6 decontaminate precedent)
    tags=("retrieval", "e2e", "hybrid", "bm25", "lsh", "rrf",
          "quality-gate"),
    # rotated OUT of the driver window r10 wave 5 (green r7/r8/r9);
    # pattern twins currently driver-visible: bm25_top_docs_served
    # (BM25 corpus pass + top-k) and hard_negative_mining_ann
    # (bucketed LSH shortlist + rank window). Still a bench headline
    # and oracle-run at every pytest.
    driver_visible=False,
)
def retrieval_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval END-TO-END — the retrieval twin of
    curation_pipeline_e2e, chaining the suite's real stages for one
    query: (1) QUALITY GATE: only lang='{RPE_LANG}' documents with ≥
    {RPE_MIN_TOKS} tokens are indexed (the curation rule a production
    corpus applies before anything is searchable); (2) LEXICAL: BM25
    top-{RPE_LIST_K} over the gated corpus (shared _bm25_frames
    scorer); (3) SEMANTIC: multiprobe hyperplane-LSH shortlist around
    probe vec {RPE_PROBE_ID} — the probe explodes into its 7 candidate
    bucket ids and EQUI-JOINS on bucket, so candidates come from 7
    buckets, never a corpus scan; exact cosine ranks the gated
    candidates top-{RPE_LIST_K}; (4) FUSION: reciprocal-rank fusion
    Σ 1/({RRF_K}+rank) over the two lists, top-{RPE_TOP} returned with
    source metadata.

    At 100 TB: the gate is a narrow pushed-down filter; BM25's only
    corpus shuffle is the (doc_id, tok) tf groupBy; the ANN side reads
    7 LSH buckets (the bucket column is what the table is bucketBy'd
    on at scale); both shortlists are TakeOrdered (bounded), so fusion
    and the metadata join-back are k-vs-k. Ranks come from
    deterministic (score, id) orderings, so the fusion arithmetic is a
    fixed IEEE sequence cross-engine."""
    from jcf_nb_migration_spark.functions import similarity as S

    docs = spread(t(spark, sf_dir, "documents"))
    gated = (docs
             .select("doc_id", "source", "lang",
                     T.tokens("text").alias("w"))
             .where((F.col("lang") == RPE_LANG)
                    & (F.size("w") >= RPE_MIN_TOKS))
             .select("doc_id", "source", "w"))
    # ONE corpus scan for the whole lexical+gate side: the persisted
    # per-doc proxy carries source alongside dl/tf, so the BM25
    # scorer, the ANN gate id-list, and the final metadata join-back
    # all read the proxy (the before-plan paid six scans+tokenizes)
    perdoc = _bm25_perdoc(gated, carry=("source",))
    _, bm = _bm25_frames(gated, perdoc=perdoc)
    # r14 (guide §2.4, second pass): each top-20 list is cut by a
    # TakeOrderedAndProject whose output is ALREADY one partition, but
    # ranking each list with its own Window and merging with a groupBy
    # paid three more single-partition exchanges — three extra AQE
    # stage boundaries on ≤40 rows. Both lists now union as
    # (doc_id, score, side) rows, coalesce(1) (narrow, no shuffle over
    # two single-partition inputs), and EVERYTHING downstream — the
    # per-side rank windows, the per-doc merge, the RRF arithmetic —
    # runs in that one stage: SinglePartition satisfies every
    # clustering requirement, so Catalyst inserts no exchange at all.
    list_lex = (bm.orderBy(F.desc("bm25"), "doc_id").limit(RPE_LIST_K)
                .select("doc_id", F.col("bm25").alias("score"),
                        F.lit(0).alias("side")))
    # semantic list: candidates gated (probe row exempt so the lookup
    # never depends on the probe doc's own quality). r14 (guide §2.4,
    # §6): the candidate side is ONE semi-join of embeddings against
    # the gated id set (read from the persisted proxy), and the probe
    # VECTOR is read straight off the base scan as a pushed-down point
    # filter (probe_src) — the earlier union/semi shapes either
    # scanned embeddings through two branches or re-evaluated the
    # semi-join on the probe side just to find one row. Candidate set
    # unchanged: the multiprobe join excludes the probe id itself, so
    # gated-only candidates == (gated ∪ {probe}) ∖ {probe}.
    emb = t(spark, sf_dir, "embeddings")
    gid = perdoc.select(F.col("doc_id").alias("vec_id"))
    emb_in = emb.join(gid, "vec_id", "left_semi")
    cand = S.lsh_ann_multiprobe(emb_in, probe_id=RPE_PROBE_ID,
                                n_planes=6, dim=64, k=RPE_LIST_K,
                                probe_src=emb)
    list_sem = cand.select(F.col("neighbor_id").alias("doc_id"),
                           F.col("cos_sim").alias("score"),
                           F.lit(1).alias("side"))
    # Per-side ranks in the fused single partition: row_number over
    # (side; score desc, doc_id) reproduces each list's original
    # (desc score, id) ranking exactly — every list's doc_ids are
    # unique by construction (BM25 is per-doc; a multiprobe candidate
    # matches exactly one probe bucket), so the per-doc merge is the
    # same max-per-side fold as the full-outer join's padding
    # (bounded-window: const:40 — two ≤20-row lists).
    wr = Window.partitionBy("side").orderBy(F.desc("score"), "doc_id")
    ranked = (list_lex.unionByName(list_sem).coalesce(1)
              .withColumn("rank", F.row_number().over(wr).cast("bigint")))
    fused = (
        ranked.groupBy("doc_id")
        .agg(F.max(F.when(F.col("side") == 0, F.col("rank")))
             .alias("rank_lex"),
             F.max(F.when(F.col("side") == 1, F.col("rank")))
             .alias("rank_sem"))
        .select("doc_id", "rank_lex", "rank_sem",
                F.round(
                    F.coalesce(F.lit(1.0) / (RRF_K + F.col("rank_lex")),
                               F.lit(0.0))
                    + F.coalesce(F.lit(1.0) / (RRF_K + F.col("rank_sem")),
                                 F.lit(0.0)), 9).alias("rrf")))
    # fused is k-bounded (≤40 rows) — broadcast it explicitly (§3.1) so
    # the SF-proportional per-doc proxy streams with no exchange
    return (F.broadcast(fused)
            .join(perdoc.select("doc_id", "source"), "doc_id")
            .select("doc_id", "rank_lex", "rank_sem", "rrf", "source")
            .orderBy(F.desc("rrf"), "doc_id").limit(RPE_TOP))


@query(
    "bm25_top_docs_served",
    oracle=f"""
    WITH d AS (SELECT doc_id, {_SQL_TOKS} AS w FROM documents),
    {_sql_bm25_ctes()}
    SELECT doc_id, n_terms_matched, bm25
    FROM bm ORDER BY bm25 DESC, doc_id LIMIT 20
    """,
    tags=("retrieval", "bm25", "ranking", "bucketed", "serving"),
    # rotated OUT r11 5th wave (multi-green in driver
    # artifacts); same-pattern visible twin: bm25_batch_served
    driver_visible=False,
)
def bm25_top_docs_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 answered from the PERSISTED serving index — the
    build/serve split a 100 TB RAG stack runs (io/lexical.py): the
    corpus pass happens once at build time (inverted postings bucketed
    on ``tok`` + additive corpus scalars), and the serve plan is a
    bucket-pruned postings scan whose tok-keyed df groupBy needs ZERO
    Exchange (the bucketed scan already satisfies the distribution —
    guarded in tests/test_lexical_index.py). Same scorer expression
    tree as the ad-hoc ``bm25_top_docs``, so the two paths — and this
    oracle, which is bm25_top_docs' oracle verbatim — hash-match.

    The query rebuilds the index on every call so repeated runs stay
    deterministic and self-contained (the index lands under the
    system temp dir, keyed by sf_dir); a deployment builds once and
    serves many — the serve half is exactly ``bm25_probe``."""
    import hashlib
    import tempfile

    from jcf_nb_migration_spark.io.lexical import (bm25_probe,
                                                   lexical_index_build)

    docs = spread(t(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", T.tokens("text").alias("w"))
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    prefix = f"lexidx_{tag}"
    # path is keyed by the Spark APPLICATION id as well as the fixture:
    # two concurrent processes (suite + sweep) must not rmtree/rebuild
    # each other's live index mid-probe; within one session repeated
    # calls reuse (and idempotently rebuild) the same path.
    path = os.path.join(tempfile.gettempdir(), "jcf_lexical_index",
                        spark.sparkContext.applicationId, tag)
    lexical_index_build(toks, prefix, path, num_buckets=8)
    return bm25_probe(spark, prefix, path, BM25_TERMS,
                      BM25_K1, BM25_B, k=20)


# Positional retrieval: the phrase/proximity surface a bag-of-words
# BM25 can't express. Fixed two-term queries over the synthetic vocab;
# per-request terms change nothing about the plan shape.
PHRASE = ("spark", "window")   # exact adjacency
PROX_TERMS = ("spark", "merge")
PROX_WINDOW = 5                # max token distance (unordered)


def _positions(docs: DataFrame, terms: tuple[str, ...]) -> DataFrame:
    """(doc_id, tok, pos) for the QUERY TERMS only — the filter lands
    before the positional self-join, so the join input is bounded by
    the terms' postings, never the corpus token stream. pos is
    1-based (generate_subscripts parity)."""
    return (docs
            .select("doc_id",
                    F.posexplode(T.tokens("text")).alias("pos0", "tok"))
            .where(F.col("tok").isin(list(terms)))
            .select("doc_id", "tok",
                    (F.col("pos0") + 1).cast("bigint").alias("pos")))


# Single-sourced phrase oracle: the ad-hoc scan and the served-index
# query MUST stay row-identical, so they share one SQL text (the
# module's _sql_bm25_ctes precedent).
_SQL_PHRASE_ORACLE = f"""
    WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS w FROM documents),
    occ AS (
        SELECT doc_id, unnest(w) AS tok,
               CAST(generate_subscripts(w, 1) AS BIGINT) AS pos
        FROM toks
    ),
    hits AS (
        SELECT a.doc_id, a.pos
        FROM occ a JOIN occ b
          ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        WHERE a.tok = '{PHRASE[0]}' AND b.tok = '{PHRASE[1]}'
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           MIN(pos) AS first_pos
    FROM hits GROUP BY doc_id
    ORDER BY n_occurrences DESC, doc_id LIMIT 20
    """


@query(
    "phrase_match_docs",
    oracle=_SQL_PHRASE_ORACLE,
    tags=("retrieval", "phrase", "positional"),
    # positional twin of the bag-of-words scorers; term-keyed postings
    # pattern driver-visible via bm25_top_docs_served (shared
    # 'retrieval' tag)
    driver_visible=False,
)
def phrase_match_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-phrase retrieval ("spark window", adjacent tokens): the
    positional-index surface BM25's bag-of-words scoring cannot
    express. Tokens get 1-based positions via posexplode; the stream
    is filtered to the TWO query terms before anything joins, so the
    adjacency self-join's input is the phrase terms' postings
    (query-bounded), equi-keyed on (doc_id, pos+1=pos) — never a
    corpus-sized join side. Per doc: occurrence count and first hit
    position, top-20 by count. At 100 TB this is exactly the plan a
    positional index serves: the term filter becomes the posting
    lookup and the adjacency join stays within matched documents."""
    docs = spread(t(spark, sf_dir, "documents"))
    occ = _positions(docs, PHRASE)
    a = occ.where(F.col("tok") == PHRASE[0]).alias("a")
    b = occ.where(F.col("tok") == PHRASE[1]).alias("b")
    hits = (a.join(b, (F.col("a.doc_id") == F.col("b.doc_id"))
                   & (F.col("b.pos") == F.col("a.pos") + 1))
            .select(F.col("a.doc_id").alias("doc_id"),
                    F.col("a.pos").alias("pos")))
    return (hits.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_occurrences"),
                 F.min("pos").alias("first_pos"))
            .orderBy(F.desc("n_occurrences"), "doc_id")
            .limit(20))


_SQL_PROX_ORACLE = f"""
    WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS w FROM documents),
    occ AS (
        SELECT doc_id, unnest(w) AS tok,
               CAST(generate_subscripts(w, 1) AS BIGINT) AS pos
        FROM toks
    ),
    pairs AS (
        SELECT a.doc_id, abs(a.pos - b.pos) AS span
        FROM occ a JOIN occ b
          ON a.doc_id = b.doc_id
         AND abs(a.pos - b.pos) <= {PROX_WINDOW}
        WHERE a.tok = '{PROX_TERMS[0]}' AND b.tok = '{PROX_TERMS[1]}'
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           MIN(span) AS min_span
    FROM pairs GROUP BY doc_id
    ORDER BY min_span, n_pairs DESC, doc_id LIMIT 20
    """


@query(
    "proximity_ranked_docs",
    oracle=_SQL_PROX_ORACLE,
    tags=("retrieval", "proximity", "positional"),
    driver_visible=False,  # rotated OUT r12 6th wave (visible
    #   same-pattern twin recorded in coverage_map.py)
)
def proximity_ranked_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proximity retrieval: documents where "spark" and "merge" occur
    within {PROX_WINDOW} tokens of each other (unordered), ranked by
    tightest span then pair count — the positional ranking signal
    search engines layer over BM25. Same bounded shape as
    phrase_match_docs: both sides of the positional join are the
    query terms' postings; the band predicate (|pos_a − pos_b| ≤ w)
    rides the doc_id equi-join as a post-join filter, so the join
    never widens beyond matched documents' term positions."""
    docs = spread(t(spark, sf_dir, "documents"))
    occ = _positions(docs, PROX_TERMS)
    a = occ.where(F.col("tok") == PROX_TERMS[0]).alias("a")
    b = occ.where(F.col("tok") == PROX_TERMS[1]).alias("b")
    pairs = (a.join(b, (F.col("a.doc_id") == F.col("b.doc_id"))
                    & (F.abs(F.col("a.pos") - F.col("b.pos"))
                       <= PROX_WINDOW))
             .select(F.col("a.doc_id").alias("doc_id"),
                     F.abs(F.col("a.pos") - F.col("b.pos"))
                     .alias("span")))
    return (pairs.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_pairs"),
                 F.min("span").alias("min_span"))
            .orderBy("min_span", F.desc("n_pairs"), "doc_id")
            .limit(20))


@query(
    "phrase_match_served",
    oracle=_SQL_PHRASE_ORACLE,
    tags=("retrieval", "phrase", "positional", "serving", "bucketed"),
    # rotated INTO the driver window r9 second wave (first-time name)
    # rotated OUT r11 5th wave (multi-green in driver
    # artifacts); same-pattern visible twin: proximity_ranked_served
    driver_visible=False,
)
def phrase_match_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-phrase retrieval SERVED from the persisted positional
    index (io/lexical.positional_index_build): the build pays the one
    posexplode corpus pass into a tok-bucketed (tok, doc_id, pos)
    table; the probe is a bucket-pruned scan of the phrase's two terms
    + the positional adjacency equi-join — at 100 TB every phrase
    query reads two buckets' worth of positions, never the corpus.
    Oracle is phrase_match_docs' verbatim (integer adjacency counts —
    the served path must be row-identical to the ad-hoc scan).
    Rebuilds per call for determinism, like bm25_top_docs_served;
    the serve half alone is ``phrase_probe``."""
    import hashlib
    import tempfile

    from jcf_nb_migration_spark.io.lexical import (phrase_probe,
                                                   positional_index_build)

    docs = spread(t(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", T.tokens("text").alias("w"))
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    prefix = f"positx_{tag}"
    path = os.path.join(tempfile.gettempdir(), "jcf_positional_index",
                        spark.sparkContext.applicationId, tag)
    positional_index_build(toks, prefix, path, num_buckets=8)
    return phrase_probe(spark, prefix, path, PHRASE, k=20)


@query(
    "proximity_ranked_served",
    oracle=_SQL_PROX_ORACLE,
    tags=("retrieval", "proximity", "positional", "serving",
          "bucketed"),
    # served twin of proximity_ranked_docs; same bucket-probe family
    # as phrase_match_served / bm25_top_docs_served
    driver_visible=False,  # rotated out r13 7th wave (green r11-r12, 2x)
)
def proximity_ranked_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proximity retrieval SERVED from the persisted positional index
    (io/lexical.proximity_probe): same build-once/probe-bucket-pruned
    contract as phrase_match_served, same oracle text as the ad-hoc
    proximity_ranked_docs — the served path must be row-identical."""
    import hashlib
    import tempfile

    from jcf_nb_migration_spark.io.lexical import (
        positional_index_build, proximity_probe)

    docs = spread(t(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", T.tokens("text").alias("w"))
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    prefix = f"positx_{tag}"
    path = os.path.join(tempfile.gettempdir(), "jcf_positional_index",
                        spark.sparkContext.applicationId, tag)
    positional_index_build(toks, prefix, path, num_buckets=8)
    return proximity_probe(spark, prefix, path, PROX_TERMS,
                           window=PROX_WINDOW, k=20)


@query(
    "bm25_filtered_served",
    oracle=f"""
    WITH d AS (SELECT doc_id, {_SQL_TOKS} AS w FROM documents),
    {_sql_bm25_ctes()}
    SELECT bm.doc_id, bm.n_terms_matched, bm.bm25
    FROM bm
    WHERE bm.doc_id IN (SELECT doc_id FROM documents
                        WHERE lang = '{RPE_LANG}')
    ORDER BY bm.bm25 DESC, bm.doc_id LIMIT 20
    """,
    tags=("retrieval", "bm25", "serving", "bucketed", "filtered"),
    # rotated INTO the driver window r9 second wave (first-time name)
    # rotated OUT r11 5th wave (multi-green in driver
    # artifacts); same-pattern visible twin: bm25_batch_served
    driver_visible=False,
)
def bm25_filtered_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    """METADATA-FILTERED BM25 serving — the other half of every RAG
    query ("top documents about X, but only lang='en'"): scores come
    from the GLOBAL index statistics (df/N/avgdl are corpus facts —
    filter-relative scoring would change ranks whenever the filter
    changes), the metadata predicate gates the result set via a
    semi-join on the scored frame BEFORE the top-k cut. The filter
    side is a narrow metadata projection (pushed-predicate scan); at
    100 TB it broadcasts or semi-joins on doc_id without touching the
    postings read."""
    import hashlib
    import tempfile

    from jcf_nb_migration_spark.io.lexical import (bm25_probe,
                                                   lexical_index_build)

    docs = spread(t(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", T.tokens("text").alias("w"))
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    prefix = f"lexidx_{tag}"
    path = os.path.join(tempfile.gettempdir(), "jcf_lexical_index",
                        spark.sparkContext.applicationId, tag)
    lexical_index_build(toks, prefix, path, num_buckets=8)
    allowed = docs.where(F.col("lang") == RPE_LANG).select("doc_id")
    return bm25_probe(spark, prefix, path, BM25_TERMS,
                      BM25_K1, BM25_B, k=20, allowed=allowed)


@query(
    "doc_fetch_served",
    oracle=f"""
    WITH d AS (SELECT doc_id, {_SQL_TOKS} AS w FROM documents),
    {_sql_bm25_ctes()},
    topk AS (
        SELECT doc_id, bm25 FROM bm
        ORDER BY bm25 DESC, doc_id LIMIT 10
    )
    SELECT k.doc_id, k.bm25, doc.source, doc.lang, doc.n_chars,
           substr(doc.text, 1, 40) AS preview
    FROM topk k JOIN documents doc ON doc.doc_id = k.doc_id
    ORDER BY k.bm25 DESC, k.doc_id
    """,
    tags=("retrieval", "serving", "bucketed", "docstore"),
    # rotated INTO the driver window r9 second wave (first-time name)
    # rotated OUT r11 5th wave (multi-green in driver
    # artifacts); same-pattern visible twin: docstore_as_of_fetch
    driver_visible=False,
)
def doc_fetch_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE serving loop — rank, then fetch content: BM25
    top-10 from the persisted lexical index (io/lexical.bm25_probe),
    then the documents themselves from the persisted doc_id-bucketed
    DOCSTORE (io/docstore.docstore_fetch). The ranked ids are
    request-bounded (k=10), so collecting them driver-side is the
    serving pattern itself — the id list lands as a literal IN
    predicate on the docstore's bucket column, making the content
    fetch a bucket-pruned point lookup (bytes read scale with k, not
    the corpus) instead of a join against a corpus-sized scan. At
    100 TB: one postings read (≤|terms| buckets) + one content read
    (≤k buckets); the corpus passes happened once at build time.
    Rebuilds both layouts per call for determinism, like the other
    *_served queries; a deployment builds once and serves many."""
    import hashlib
    import tempfile

    from jcf_nb_migration_spark.io.docstore import (docstore_build,
                                                    docstore_fetch)
    from jcf_nb_migration_spark.io.lexical import (bm25_probe,
                                                   lexical_index_build)

    docs = spread(t(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", T.tokens("text").alias("w"))
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    lex_prefix = f"lexidx_{tag}"
    lex_path = os.path.join(tempfile.gettempdir(), "jcf_lexical_index",
                            spark.sparkContext.applicationId, tag)
    lexical_index_build(toks, lex_prefix, lex_path, num_buckets=8)
    ds_prefix = f"docst_{tag}"
    ds_path = os.path.join(tempfile.gettempdir(), "jcf_docstore",
                           spark.sparkContext.applicationId, tag)
    docstore_build(docs, ds_prefix, ds_path, num_buckets=8)

    hits = bm25_probe(spark, lex_prefix, lex_path, BM25_TERMS,
                      BM25_K1, BM25_B, k=10).select("doc_id", "bm25")
    # k=10 rows — the request-bounded id list every serving fetch
    # starts from (NOT a corpus collect)
    ranked = [(r["doc_id"], r["bm25"]) for r in hits.collect()]
    scores = local_df(spark, ranked, "doc_id bigint, bm25 double")
    fetched = docstore_fetch(spark, ds_prefix, ds_path,
                             [i for i, _ in ranked])
    return (fetched.join(F.broadcast(scores), "doc_id")
            .select("doc_id", "bm25", "source", "lang", "n_chars",
                    F.substring("text", 1, 40).alias("preview"))
            .orderBy(F.desc("bm25"), "doc_id"))


# Late-interaction (ColBERT-style) MaxSim reranking: token-level
# pseudo-embeddings (hash-derived — deterministic stand-ins for a
# learned projection; the PLAN is what a real deployment runs), BM25
# candidate shortlist, per-query-term max-dot-product summed per doc.
LI_DIM = 8          # pseudo-embedding dimensions
LI_SHORTLIST = 50   # BM25 candidates reranked
LI_TOP = 10


def _li_sql_dims(tok_expr: str, prefix: str) -> str:
    """SQL projections e{prefix}0..e{prefix}{LI_DIM-1}: per-dimension
    hash-derived components in [-1, 1], textually mirroring the Spark
    builder below (same salt scheme, same integer arithmetic, CAST to
    DOUBLE before the division — DuckDB's bare 1000.0 is DECIMAL)."""
    parts = []
    for d in range(LI_DIM):
        salted = f"concat('li{d}:', {tok_expr})"
        parts.append(f"(({_sql_hash48(salted)} % 2001) - 1000)"
                     f" / CAST(1000 AS DOUBLE) AS {prefix}{d}")
    return ",\n               ".join(parts)


def _li_dims(col, prefix: str):
    """Spark twin of _li_sql_dims: LI_DIM hash-derived components."""
    from jcf_nb_migration_spark.functions.text import token_hash48
    return [(((token_hash48(col, f"li{d}") % 2001) - 1000)
             / F.lit(1000.0)).alias(f"{prefix}{d}")
            for d in range(LI_DIM)]


_LI_DOT = " + ".join(f"q.q{d} * t.e{d}" for d in range(LI_DIM))


@query(
    "late_interaction_rerank",
    oracle=f"""
    WITH d AS (SELECT doc_id, {_SQL_TOKS} AS w FROM documents),
    {_sql_bm25_ctes()},
    short AS (
        SELECT doc_id, bm25 FROM bm
        ORDER BY bm25 DESC, doc_id LIMIT {LI_SHORTLIST}
    ),
    dtoks AS (
        SELECT DISTINCT d.doc_id, tok FROM
        (SELECT doc_id, unnest(w) AS tok FROM d) d
        JOIN short USING (doc_id)
    ),
    temb AS (
        SELECT doc_id, tok,
               {_li_sql_dims('tok', 'e')}
        FROM dtoks
    ),
    qemb AS (
        SELECT qtok,
               {_li_sql_dims('qtok', 'q')}
        FROM (SELECT unnest([{_SQL_TERMS}]) AS qtok)
    ),
    dots AS (
        SELECT t.doc_id, q.qtok, {_LI_DOT} AS dot
        FROM temb t CROSS JOIN qemb q
    ),
    per_q AS (
        SELECT doc_id, qtok, MAX(dot) AS maxsim
        FROM dots GROUP BY doc_id, qtok
    )
    SELECT s.doc_id, s.bm25,
           ROUND(SUM(p.maxsim), 9) AS li_score
    FROM per_q p JOIN short s USING (doc_id)
    GROUP BY s.doc_id, s.bm25
    ORDER BY li_score DESC, s.doc_id LIMIT {LI_TOP}
    """,
    tags=("retrieval", "rerank", "late-interaction", "maxsim",
          "composed"),
    # BM25-shortlist + bounded rerank — the compressed-first/rerank
    # family quantized_rerank_topk keeps driver-visible (shared tags)
)
def late_interaction_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-interaction reranking (the ColBERT/MaxSim retrieval stage
    modern RAG stacks run between the cheap shortlist and the LLM):
    BM25 produces a {LI_SHORTLIST}-doc candidate shortlist, then each
    candidate is rescored by sum over query tokens of the MAX dot
    product against the document's token embeddings. Token embeddings
    here are hash-derived pseudo-vectors (deterministic, so DuckDB
    replays them exactly); a deployment swaps in a learned projection
    without touching the plan.

    Plan: the ONLY corpus-sized work is the shared BM25 scorer (one tf
    groupBy). Everything after the shortlist cut is request-bounded:
    the doc-token frame is a semi-join against {LI_SHORTLIST} ids, the
    query-embedding side is a {LI_DIM}-column LITERAL frame
    (broadcast), the MaxSim join is shortlist-tokens × |query terms|,
    and both groupBys key on shortlist doc_ids. At 100 TB the rerank
    cost is a function of k and document length — never the corpus."""
    docs = spread(t(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", T.tokens("text").alias("w"))
    _, bm = _bm25_frames(toks)
    short = (bm.select("doc_id", "bm25")
             .orderBy(F.desc("bm25"), "doc_id").limit(LI_SHORTLIST))
    dtoks = (toks.join(short.select("doc_id"), "doc_id", "left_semi")
             .select("doc_id", F.explode("w").alias("tok"))
             .distinct())
    return _maxsim_rescore(spark, dtoks, short)


def _maxsim_rescore(spark: SparkSession, dtoks: DataFrame,
                    short: DataFrame) -> DataFrame:
    """Shared MaxSim second stage: ``dtoks(doc_id, tok)`` (distinct
    shortlist-doc tokens) × the literal query-embedding frame →
    per-(doc, query-term) max dot → per-doc sum, joined back to
    ``short(doc_id, bm25)``. Single-sourced so the ad-hoc and served
    late-interaction queries can never drift apart."""
    temb = dtoks.select("doc_id", *_li_dims(F.col("tok"), "e")).alias("t")
    qemb = (local_df(spark, [(w,) for w in BM25_TERMS], "qtok string")
            .select("qtok", *_li_dims(F.col("qtok"), "q")).alias("q"))
    dot = sum((F.col(f"q.q{d}") * F.col(f"t.e{d}") for d in range(1, LI_DIM)),
              F.col("q.q0") * F.col("t.e0"))
    dots = (temb.crossJoin(F.broadcast(qemb))
            .select(F.col("t.doc_id").alias("doc_id"), "qtok",
                    dot.alias("dot")))
    per_q = dots.groupBy("doc_id", "qtok").agg(F.max("dot").alias("maxsim"))
    return (per_q.join(short, "doc_id")
            .groupBy("doc_id", "bm25")
            .agg(F.round(F.sum("maxsim"), 9).alias("li_score"))
            .orderBy(F.desc("li_score"), "doc_id").limit(LI_TOP))


@query(
    "late_interaction_served",
    oracle=f"""
    WITH d AS (SELECT doc_id, {_SQL_TOKS} AS w FROM documents),
    {_sql_bm25_ctes()},
    short AS (
        SELECT doc_id, bm25 FROM bm
        ORDER BY bm25 DESC, doc_id LIMIT {LI_SHORTLIST}
    ),
    dtoks AS (
        SELECT DISTINCT d.doc_id, tok FROM
        (SELECT doc_id, unnest(w) AS tok FROM d) d
        JOIN short USING (doc_id)
    ),
    temb AS (
        SELECT doc_id, tok,
               {_li_sql_dims('tok', 'e')}
        FROM dtoks
    ),
    qemb AS (
        SELECT qtok,
               {_li_sql_dims('qtok', 'q')}
        FROM (SELECT unnest([{_SQL_TERMS}]) AS qtok)
    ),
    dots AS (
        SELECT t.doc_id, q.qtok, {_LI_DOT} AS dot
        FROM temb t CROSS JOIN qemb q
    ),
    per_q AS (
        SELECT doc_id, qtok, MAX(dot) AS maxsim
        FROM dots GROUP BY doc_id, qtok
    )
    SELECT s.doc_id, s.bm25,
           ROUND(SUM(p.maxsim), 9) AS li_score
    FROM per_q p JOIN short s USING (doc_id)
    GROUP BY s.doc_id, s.bm25
    ORDER BY li_score DESC, s.doc_id LIMIT {LI_TOP}
    """,
    tags=("retrieval", "rerank", "late-interaction", "maxsim",
          "serving", "bucketed", "docstore", "composed"),
    driver_visible=False,  # rotated out r13 7th wave (green r10-r12, 3x)
)
def late_interaction_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-interaction reranking answered ENTIRELY from persisted
    layouts — no corpus pass at serve time: the BM25 shortlist comes
    from the lexical index probe (bucket-pruned, io/lexical.py), and
    the shortlist docs' TOKENS come from the docstore used as a
    FORWARD index (doc_id-bucketed table whose stored column is the
    token array) via a bucket-pruned point fetch — this is why a
    search stack keeps both an inverted and a forward index. The
    MaxSim rescore is the shared ``_maxsim_rescore`` (single-sourced
    with the ad-hoc query), so the oracle is the ad-hoc oracle
    verbatim. At 100 TB a rerank request reads |terms| postings
    buckets + |shortlist| docstore buckets — never the corpus.
    Rebuilds per call for determinism like the other *_served
    queries."""
    import hashlib
    import tempfile

    from jcf_nb_migration_spark.io.docstore import (docstore_build,
                                                    docstore_fetch)
    from jcf_nb_migration_spark.io.lexical import (bm25_probe,
                                                   lexical_index_build)

    docs = spread(t(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", T.tokens("text").alias("w"))
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    lex_path = os.path.join(tempfile.gettempdir(), "jcf_lexical_index",
                            spark.sparkContext.applicationId, tag)
    lexical_index_build(toks, f"lexidx_{tag}", lex_path, num_buckets=8)
    fwd_path = os.path.join(tempfile.gettempdir(), "jcf_fwd_index",
                            spark.sparkContext.applicationId, tag)
    docstore_build(toks, f"fwdidx_{tag}", fwd_path, num_buckets=8)

    ranked = [(r["doc_id"], r["bm25"]) for r in
              bm25_probe(spark, f"lexidx_{tag}", lex_path, BM25_TERMS,
                         BM25_K1, BM25_B, k=LI_SHORTLIST)
              .select("doc_id", "bm25").collect()]
    short = local_df(spark, ranked, "doc_id bigint, bm25 double")
    fetched = docstore_fetch(spark, f"fwdidx_{tag}", fwd_path,
                             [i for i, _ in ranked])
    dtoks = (fetched.select("doc_id", F.explode("w").alias("tok"))
             .distinct())
    return _maxsim_rescore(spark, dtoks, F.broadcast(short))


# Serving-index MUTATION queries (r10): the delete/upsert lifecycle a
# long-lived 100 TB serving deployment runs between rebuilds. Each
# rebuilds its scratch layout per call (determinism, like the other
# *_served queries), applies the mutation, and serves from the mutated
# index — so the driver's oracle hash checks the MUTATED state.


@query(
    "bm25_tombstone_served",
    oracle=f"""
    WITH d AS (SELECT doc_id, {_SQL_TOKS} AS w FROM documents),
    {_sql_bm25_ctes()}
    SELECT doc_id, n_terms_matched, bm25
    FROM bm WHERE doc_id % 5 <> 0
    ORDER BY bm25 DESC, doc_id LIMIT 20
    """,
    tags=("retrieval", "bm25", "serving", "bucketed", "delete",
          "tombstone"),
    driver_visible=False,  # rotated OUT r12 6th wave (visible
    #   same-pattern twin recorded in coverage_map.py)
)
def bm25_tombstone_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 serving under LAZY DELETION (io/lexical.
    lexical_index_delete): every doc_id ≡ 0 (mod 5) is deleted from
    the persisted index, and the probe excludes them from results
    while df/N/avgdl still count them — Lucene's delete-then-merge
    scoring, the semantics a real engine serves between a delete and a
    segment merge (``lexical_index_vacuum`` is the merge). The oracle
    states exactly that: full-corpus BM25 statistics, deleted docs
    filtered from the result before the top-k cut.

    Deletion must be lazy HERE because postings are bucketed by
    ``tok`` — one document's postings spread across every bucket, so
    eager physical deletion would rewrite the whole index per batch
    (contrast docstore_delete, where the doc_id-bucketed layout makes
    eager COW bounded). The collected delete-id list is the simulated
    delete REQUEST (request-bounded by nature), not an operator data
    path."""
    import hashlib
    import tempfile

    from jcf_nb_migration_spark.io.lexical import (bm25_probe,
                                                   lexical_index_build,
                                                   lexical_index_delete)

    docs = spread(t(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", T.tokens("text").alias("w"))
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    prefix = f"lexdel_{tag}"
    path = os.path.join(tempfile.gettempdir(), "jcf_lexical_tomb",
                        spark.sparkContext.applicationId, tag)
    lexical_index_build(toks, prefix, path, num_buckets=8)
    del_ids = [r["doc_id"] for r in
               docs.where(F.col("doc_id") % 5 == 0)
               .select("doc_id").collect()]
    lexical_index_delete(spark, prefix, path, del_ids, num_buckets=8)
    return bm25_probe(spark, prefix, path, BM25_TERMS,
                      BM25_K1, BM25_B, k=20)


UPSERT_MOD = 17        # doc_id % 17 == 5 rows get a v2 payload
UPSERT_NEW = (1, 2, 3)  # new doc_ids appended past max(doc_id)
UPSERT_FETCH = (1, 2, 3, 5, 22, 39)  # untouched + updated spread


@query(
    "docstore_upsert_fetch",
    oracle=f"""
    WITH mx AS (SELECT MAX(doc_id) AS m FROM documents),
    upd AS (
        SELECT doc_id, 'v2:' || text AS text, 'v2' AS lang,
               source, n_chars
        FROM documents WHERE doc_id % {UPSERT_MOD} = 5
    ),
    newd AS (
        SELECT m + k AS doc_id, 'new doc ' || k AS text,
               'new' AS lang, 'upsert' AS source,
               CAST(length('new doc ' || k) AS BIGINT) AS n_chars
        FROM mx, (SELECT unnest([{", ".join(map(str, UPSERT_NEW))}]) AS k)
    ),
    merged AS (
        SELECT * FROM upd
        UNION ALL SELECT * FROM newd
        UNION ALL SELECT doc_id, text, lang, source, n_chars
                  FROM documents WHERE doc_id % {UPSERT_MOD} <> 5
    ),
    ids AS (
        SELECT unnest([{", ".join(map(str, UPSERT_FETCH))}]) AS doc_id
        UNION ALL SELECT m + k
        FROM mx, (SELECT unnest([{", ".join(map(str, UPSERT_NEW))}]) AS k)
    )
    SELECT m.doc_id, m.text, m.lang, m.source, m.n_chars
    FROM merged m JOIN ids USING (doc_id)
    ORDER BY m.doc_id
    """,
    tags=("serving", "docstore", "upsert", "cow", "bucketed"),
    driver_visible=False,  # rotated OUT r12 6th wave (visible
    #   same-pattern twin recorded in coverage_map.py)
)
def docstore_upsert_fetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO on the persisted docstore (io/docstore.
    docstore_upsert): documents with doc_id ≡ 5 (mod 17) are replaced
    by a v2 payload and three brand-new doc_ids insert, via
    copy-on-write of ONLY the touched buckets — untouched bucket files
    stay byte-identical (pinned in tests/test_docstore.py). The fetch
    then reads a fixed id spread crossing updated, untouched, and
    inserted documents, so the oracle hash certifies all three merge
    outcomes at once. The max(doc_id) collect is a one-scalar
    control-plane agg (new ids must not collide with existing ones)."""
    import hashlib
    import tempfile

    from jcf_nb_migration_spark.io.docstore import (docstore_build,
                                                    docstore_fetch,
                                                    docstore_upsert)

    docs = (spread(t(spark, sf_dir, "documents"))
            .select("doc_id", "text", "lang", "source", "n_chars"))
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    prefix = f"docstu_{tag}"
    path = os.path.join(tempfile.gettempdir(), "jcf_docstore_cow",
                        spark.sparkContext.applicationId, tag)
    docstore_build(docs, prefix, path, num_buckets=8)
    max_id = docs.agg(F.max("doc_id")).head()[0]
    updated = (docs.where(F.col("doc_id") % UPSERT_MOD == 5)
               .select("doc_id",
                       F.concat(F.lit("v2:"), F.col("text"))
                        .alias("text"),
                       F.lit("v2").alias("lang"), "source", "n_chars"))
    new_rows = local_df(
        spark, [(max_id + k, f"new doc {k}", "new", "upsert",
          len(f"new doc {k}")) for k in UPSERT_NEW],
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint")
    docstore_upsert(updated.unionByName(new_rows), prefix, path,
                    num_buckets=8)
    fetch_ids = list(UPSERT_FETCH) + [max_id + k for k in UPSERT_NEW]
    return (docstore_fetch(spark, prefix, path, fetch_ids)
            .select("doc_id", "text", "lang", "source", "n_chars")
            .orderBy("doc_id"))


BATCH_Q2 = ("join", "hash", "filter")  # second query of the batch
_SQL_BATCH_Q = ", ".join(
    [f"(0, '{w}')" for w in BM25_TERMS] + [f"(1, '{w}')" for w in BATCH_Q2])


@query(
    "bm25_batch_served",
    oracle=f"""
    WITH d AS (SELECT doc_id, {_SQL_TOKS} AS w FROM documents),
    dl AS (SELECT doc_id, len(w) AS dl FROM d),
    stats AS (
        SELECT COUNT(*) AS n_docs,
               CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
        FROM dl
    ),
    occ AS (SELECT doc_id, unnest(w) AS tok FROM d),
    q AS (SELECT * FROM (VALUES {_SQL_BATCH_Q}) v(query_id, tok)),
    tf AS (
        SELECT q.query_id, occ.doc_id, occ.tok,
               CAST(COUNT(*) AS BIGINT) AS tf
        FROM occ JOIN q USING (tok) GROUP BY 1, 2, 3
    ),
    dfreq AS (
        SELECT tok, COUNT(DISTINCT doc_id) AS df
        FROM occ WHERE tok IN (SELECT tok FROM q) GROUP BY tok
    ),
    bm AS (
        SELECT tf.query_id, tf.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_terms_matched,
               ROUND(SUM(ln(1.0 + (s.n_docs - dfreq.df + 0.5)
                                  / (dfreq.df + 0.5))
                         * tf.tf * ({BM25_K1} + 1.0)
                         / (tf.tf + {BM25_K1} * (1.0 - {BM25_B}
                            + {BM25_B} * dl.dl / s.avgdl))), 9) AS bm25
        FROM tf JOIN dfreq USING (tok)
        JOIN dl ON dl.doc_id = tf.doc_id
        CROSS JOIN stats s
        GROUP BY tf.query_id, tf.doc_id
    ),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY bm25 DESC, doc_id) AS rn
        FROM bm
    )
    SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
           n_terms_matched, bm25
    FROM ranked WHERE rn <= 10
    ORDER BY query_id, bm25 DESC, doc_id
    """,
    tags=("retrieval", "bm25", "serving", "bucketed", "batch"),
    # new in r10; serving-probe pattern driver-visible via
    # bm25_top_docs_served (shared retrieval/bm25/serving tags)
    driver_visible=True,  # rotated INTO the driver window r11 (first-time name)
)
def bm25_batch_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BATCHED BM25 serving (io/lexical.bm25_batch_probe): two queries
    answered from ONE bucket-pruned pass over the persisted index —
    the offline-eval / high-QPS shape. df is computed once per term
    and shared across queries (document frequency is a corpus fact);
    the per-query top-10 is a query_id-partitioned rank window, never
    a global sort. Single-query parity with bm25_probe is pinned in
    tests/test_lexical_index.py."""
    import hashlib
    import tempfile

    from jcf_nb_migration_spark.io.lexical import (bm25_batch_probe,
                                                   lexical_index_build)

    docs = spread(t(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", T.tokens("text").alias("w"))
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    prefix = f"lexbat_{tag}"
    path = os.path.join(tempfile.gettempdir(), "jcf_lexical_batch",
                        spark.sparkContext.applicationId, tag)
    lexical_index_build(toks, prefix, path, num_buckets=8)
    qrows = ([(0, w) for w in BM25_TERMS]
             + [(1, w) for w in BATCH_Q2])
    queries = local_df(spark, qrows, "query_id bigint, tok string")
    return bm25_batch_probe(spark, prefix, path, queries,
                            BM25_K1, BM25_B, k=10)


# Time-travel serving queries (r10): the docstore's version-manifest
# layer (io/docstore.py time-travel block) exposed as oracle-checked
# queries. Mutations are the deterministic sets below so DuckDB can
# restate every snapshot from the base table.

TT_UP_MOD, TT_UP_REM = 17, 5   # doc_id % 17 == 5 rows get a v2 payload
TT_DEL_MOD, TT_DEL_REM = 13, 2  # doc_id % 13 == 2 rows are deleted
TT_FETCH = (2, 5, 15, 22, 28, 39)  # updated + deleted + untouched mix


def _tt_store(spark: SparkSession, sf_dir: str, subdir: str):
    """Build the versioned fixture store: v0 = the documents corpus,
    v1 = upsert (v2 payload for doc_id≡{TT_UP_REM} (mod {TT_UP_MOD}),
    plus max+1 / max+2 inserted), v2 = delete (doc_id≡{TT_DEL_REM}
    (mod {TT_DEL_MOD}), plus max+2 — an insert-then-delete row the
    change feed must NOT emit). Returns (prefix, path, max_id)."""
    import hashlib
    import tempfile

    from jcf_nb_migration_spark.io.docstore import (docstore_build,
                                                    docstore_delete,
                                                    docstore_upsert)

    docs = (spread(t(spark, sf_dir, "documents"))
            .select("doc_id", "text", "lang"))
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    prefix = f"docstt_{tag}"
    path = os.path.join(tempfile.gettempdir(), subdir,
                        spark.sparkContext.applicationId, tag)
    docstore_build(docs, prefix, path, num_buckets=8)
    max_id = docs.agg(F.max("doc_id")).head()[0]
    updated = (docs.where(F.col("doc_id") % TT_UP_MOD == TT_UP_REM)
               .select("doc_id",
                       F.concat(F.lit("v2:"), F.col("text"))
                        .alias("text"),
                       F.lit("v2").alias("lang")))
    new_rows = local_df(
        spark, [(max_id + k, f"new doc {k}", "new") for k in (1, 2)],
        "doc_id bigint, text string, lang string")
    docstore_upsert(updated.unionByName(new_rows), prefix, path,
                    num_buckets=8)
    del_ids = [r["doc_id"] for r in
               docs.where(F.col("doc_id") % TT_DEL_MOD == TT_DEL_REM)
               .select("doc_id").collect()] + [max_id + 2]
    docstore_delete(spark, prefix, path, del_ids, num_buckets=8)
    return prefix, path, max_id


_SQL_TT_STATES = f"""mx AS (SELECT MAX(doc_id) AS m FROM documents),
    base AS (SELECT doc_id, text, lang FROM documents),
    upd AS (
        SELECT doc_id, 'v2:' || text AS text, 'v2' AS lang
        FROM documents WHERE doc_id % {TT_UP_MOD} = {TT_UP_REM}
    ),
    newd AS (
        SELECT m + k AS doc_id, 'new doc ' || k AS text, 'new' AS lang
        FROM mx, (SELECT unnest([1, 2]) AS k)
    ),
    v1 AS (
        SELECT * FROM upd
        UNION ALL SELECT * FROM newd
        UNION ALL SELECT doc_id, text, lang FROM base
                  WHERE doc_id % {TT_UP_MOD} <> {TT_UP_REM}
    ),
    v2 AS (
        -- the delete request draws its ids from the BASE docs (the
        -- Spark side collects them from `documents`), so the modular
        -- predicate must not reach the inserted max+1 row — at the
        -- derived sf0.3 fixture (max+1) % {TT_DEL_MOD} happens to hit
        -- the residue and the old v1-wide predicate wrongly dropped
        -- it (caught by the r11 derived-fixture sweep)
        SELECT * FROM v1
        WHERE doc_id NOT IN (SELECT doc_id FROM documents
                             WHERE doc_id % {TT_DEL_MOD} = {TT_DEL_REM})
          AND doc_id <> (SELECT m + 2 FROM mx)
    )"""


@query(
    "docstore_as_of_fetch",
    oracle=f"""
    WITH {_SQL_TT_STATES},
    ids AS (
        SELECT unnest([{", ".join(map(str, TT_FETCH))}]) AS doc_id
        UNION ALL SELECT m + k
        FROM mx, (SELECT unnest([1, 2]) AS k)
    ),
    snaps AS (
        SELECT 0 AS snap, b.doc_id, b.text, b.lang
        FROM base b JOIN ids USING (doc_id)
        UNION ALL
        SELECT 1, v.doc_id, v.text, v.lang
        FROM v1 v JOIN ids USING (doc_id)
        UNION ALL
        SELECT 2, v.doc_id, v.text, v.lang
        FROM v2 v JOIN ids USING (doc_id)
    )
    SELECT CAST(snap AS BIGINT) AS snap, doc_id, text, lang
    FROM snaps ORDER BY snap, doc_id
    """,
    tags=("serving", "docstore", "time-travel", "snapshot", "cow"),
    # the docstore build/COW/fetch machinery is driver-visible via
    # docstore_upsert_fetch; AS-OF adds the manifest read path, pinned
    # additionally by tests/test_timetravel.py
    driver_visible=True,  # rotated INTO the driver window r11 (first-time name)
)
def docstore_as_of_fetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME TRAVEL on the persisted docstore (io/docstore.
    docstore_as_of): build (v0) → COW upsert (v1) → COW delete (v2),
    then read a fixed id spread AS OF every version — superseded
    bucket files are retired to the history dir, not deleted, so each
    version manifest still resolves its exact file set. The oracle
    restates all three snapshots from the base table, so one hash
    certifies the whole snapshot lattice: pre-mutation rows at v0, the
    merged payload and inserts at v1, the post-purge state at v2
    (including the insert-then-delete row max+2 visible ONLY at v1).
    AS-OF reads are manifest-scoped parquet scans — an audit/replay
    path; hot lookups stay on the current bucketed table
    (docstore_fetch, plan-pinned in tests/test_docstore.py)."""
    from jcf_nb_migration_spark.io.docstore import docstore_as_of

    prefix, path, max_id = _tt_store(spark, sf_dir, "jcf_docstore_tt")
    ids = list(TT_FETCH) + [max_id + 1, max_id + 2]
    out = None
    for v in (0, 1, 2):
        snap = (docstore_as_of(spark, prefix, path, v)
                .where(F.col("doc_id").isin(ids))
                .select(F.lit(v).cast("long").alias("snap"),
                        "doc_id", "text", "lang"))
        out = snap if out is None else out.unionByName(snap)
    return out.orderBy("snap", "doc_id")


@query(
    "docstore_change_feed",
    oracle=f"""
    WITH mx AS (SELECT MAX(doc_id) AS m FROM documents)
    SELECT doc_id, 'update' AS change FROM documents
    WHERE doc_id % {TT_UP_MOD} = {TT_UP_REM}
      AND doc_id % {TT_DEL_MOD} <> {TT_DEL_REM}
    UNION ALL
    SELECT doc_id, 'delete' FROM documents
    WHERE doc_id % {TT_DEL_MOD} = {TT_DEL_REM}
    UNION ALL
    SELECT m + 1, 'insert' FROM mx
    ORDER BY doc_id
    """,
    tags=("serving", "docstore", "time-travel", "cdc", "snapshot-diff",
          "full-outer"),
    # same machinery as docstore_as_of_fetch; the diff's full-outer
    # join pattern is driver-visible via orders_snapshot_diff's twin
    driver_visible=False,  # rotated out r13 7th wave (green r11-r12, 2x)
)
def docstore_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC between docstore versions (io/docstore.
    docstore_version_diff): the row-level change feed v0 → v2 over the
    same mutation fixture — updates for rows that got the v2 payload
    and survived the purge, deletes for purged rows (INCLUDING rows
    both updated and deleted — net effect is delete), one insert for
    max+1, and NOTHING for max+2 (inserted v1, deleted v2: a change
    feed between endpoints must not emit transients). Computed as ONE
    full-outer join of the two manifest-scoped snapshots with
    null-safe column comparison — the incremental read a downstream
    index maintainer consumes instead of re-scanning the corpus. The
    oracle restates the expected feed from the base table directly."""
    from jcf_nb_migration_spark.io.docstore import docstore_version_diff

    prefix, path, _ = _tt_store(spark, sf_dir, "jcf_docstore_cdc")
    return (docstore_version_diff(spark, prefix, path, 0, 2)
            .orderBy("doc_id"))


@query(
    "bm25_snapshot_served",
    oracle=f"""
    SELECT * FROM (
        SELECT 'post_vacuum' AS state, doc_id, n_terms_matched, bm25
        FROM (
            WITH d AS (SELECT doc_id, {_SQL_TOKS} AS w FROM documents
                       WHERE doc_id % 5 <> 0),
            {_sql_bm25_ctes()}
            SELECT doc_id, n_terms_matched, bm25 FROM bm
            ORDER BY bm25 DESC, doc_id LIMIT 20
        )
        UNION ALL
        SELECT 'restored' AS state, doc_id, n_terms_matched, bm25
        FROM (
            WITH d AS (SELECT doc_id, {_SQL_TOKS} AS w FROM documents),
            {_sql_bm25_ctes()}
            SELECT doc_id, n_terms_matched, bm25 FROM bm
            ORDER BY bm25 DESC, doc_id LIMIT 20
        )
    )
    ORDER BY state, bm25 DESC, doc_id
    """,
    tags=("retrieval", "bm25", "serving", "bucketed", "tombstone",
          "snapshot", "time-travel"),
    # rotated OUT of the driver window r14 (8th wave);
    # pattern witnessed by bm25_batch_served (coverage_map.py)
    driver_visible=False,
)
def bm25_snapshot_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Commit points on the serving index (io/lexical.py snapshot
    section — Lucene's SnapshotDeletionPolicy): snapshot the
    freshly-built index, then run the DESTRUCTIVE maintenance pair
    (delete every doc_id ≡ 0 mod 5, vacuum — which physically rewrites
    postings, consolidates stats, and clears tombstones), probe the
    post-vacuum state, RESTORE the commit point, and probe again. The
    restored probe must score exactly as the full corpus did at the
    commit point — the superseded postings/stats files COW-retired to
    ``_history`` instead of dying with the vacuum. The oracle states
    both states from the base table: post-vacuum = BM25 over the
    surviving corpus (vacuum's fresh-build-equivalence contract),
    restored = BM25 over the full corpus. The collected top-k rows of
    the first probe are k-bounded by construction (the second probe
    must not lazily read files the restore displaces)."""
    import hashlib
    import tempfile

    from jcf_nb_migration_spark.io.lexical import (
        bm25_probe, lexical_index_build, lexical_index_delete,
        lexical_index_restore, lexical_index_snapshot,
        lexical_index_vacuum)

    docs = spread(t(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", T.tokens("text").alias("w"))
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    prefix = f"lexsnap_{tag}"
    path = os.path.join(tempfile.gettempdir(), "jcf_lexical_snap",
                        spark.sparkContext.applicationId, tag)
    lexical_index_build(toks, prefix, path, num_buckets=8)
    sid = lexical_index_snapshot(spark, prefix, path, num_buckets=8,
                                 note="pre-maintenance")
    del_ids = [r["doc_id"] for r in
               docs.where(F.col("doc_id") % 5 == 0)
               .select("doc_id").collect()]
    lexical_index_delete(spark, prefix, path, del_ids, num_buckets=8)
    lexical_index_vacuum(spark, prefix, path, num_buckets=8)
    live_rows = [(r["doc_id"], r["n_terms_matched"], r["bm25"])
                 for r in bm25_probe(spark, prefix, path, BM25_TERMS,
                                     BM25_K1, BM25_B, k=20).collect()]
    live = (local_df(
        spark, live_rows,
        "doc_id bigint, n_terms_matched bigint, bm25 double")
        .select(F.lit("post_vacuum").alias("state"), "*"))
    lexical_index_restore(spark, prefix, path, sid, num_buckets=8)
    restored = (bm25_probe(spark, prefix, path, BM25_TERMS,
                           BM25_K1, BM25_B, k=20)
                .select(F.lit("restored").alias("state"), "doc_id",
                        "n_terms_matched", "bm25"))
    return (live.unionByName(restored)
            .orderBy("state", F.desc("bm25"), "doc_id"))


def _sql_phrase_state(where: str) -> str:
    """_SQL_PHRASE_ORACLE parameterized by a corpus predicate — the
    snapshot query states the post-vacuum and restored corpora as two
    instances of the same phrase-adjacency text."""
    return f"""WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS w
                       FROM documents{where}),
            occ AS (
                SELECT doc_id, unnest(w) AS tok,
                       CAST(generate_subscripts(w, 1) AS BIGINT) AS pos
                FROM toks
            ),
            hits AS (
                SELECT a.doc_id, a.pos
                FROM occ a JOIN occ b
                  ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
                WHERE a.tok = '{PHRASE[0]}' AND b.tok = '{PHRASE[1]}'
            )
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_occurrences,
                   MIN(pos) AS first_pos
            FROM hits GROUP BY doc_id
            ORDER BY n_occurrences DESC, doc_id LIMIT 20"""


@query(
    "phrase_snapshot_served",
    oracle=f"""
    SELECT * FROM (
        SELECT 'post_vacuum' AS state, doc_id, n_occurrences, first_pos
        FROM ({_sql_phrase_state(" WHERE doc_id % 5 <> 0")})
        UNION ALL
        SELECT 'restored' AS state, doc_id, n_occurrences, first_pos
        FROM ({_sql_phrase_state("")})
    )
    ORDER BY state, n_occurrences DESC, doc_id
    """,
    tags=("retrieval", "phrase", "positional", "serving", "snapshot",
          "time-travel", "tombstone"),
    # rotated OUT of the driver window r14 (8th wave);
    # pattern witnessed by bm25_batch_served (coverage_map.py)
    driver_visible=False,
)
def phrase_snapshot_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Commit points on the POSITIONAL layout (io/lexical.py —
    completing the snapshot trilogy: BM25 `bm25_snapshot_served`, IVF
    `ann_snapshot_probe`, phrase here): snapshot the freshly-built
    positional index, delete every doc_id ≡ 0 mod 5 and vacuum (the
    staged rewrite physically drops their position rows; under the
    held snapshot the superseded files COW-retire to ``_history``),
    probe the exact-phrase query, RESTORE the commit point, probe
    again. Positional vacuum has unconditional rebuild parity (no
    corpus stats to reconcile), so the oracle states both corpora with
    the same phrase-adjacency text. First probe's rows are collected
    k-bounded before the restore displaces the files it read."""
    import hashlib
    import tempfile

    from jcf_nb_migration_spark.io.lexical import (
        phrase_probe, positional_index_build, positional_index_delete,
        positional_index_restore, positional_index_snapshot,
        positional_index_vacuum)

    docs = spread(t(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", T.tokens("text").alias("w"))
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    prefix = f"possnap_{tag}"
    path = os.path.join(tempfile.gettempdir(), "jcf_positional_snap",
                        spark.sparkContext.applicationId, tag)
    positional_index_build(toks, prefix, path, num_buckets=8)
    sid = positional_index_snapshot(spark, prefix, path, num_buckets=8,
                                    note="pre-maintenance")
    del_ids = [r["doc_id"] for r in
               docs.where(F.col("doc_id") % 5 == 0)
               .select("doc_id").collect()]
    positional_index_delete(spark, prefix, path, del_ids,
                            num_buckets=8)
    positional_index_vacuum(spark, prefix, path, num_buckets=8)
    live_rows = [(r["doc_id"], r["n_occurrences"], r["first_pos"])
                 for r in phrase_probe(spark, prefix, path, PHRASE,
                                       k=20).collect()]
    live = (local_df(
        spark, live_rows,
        "doc_id bigint, n_occurrences bigint, first_pos bigint")
        .select(F.lit("post_vacuum").alias("state"), "*"))
    positional_index_restore(spark, prefix, path, sid, num_buckets=8)
    restored = (phrase_probe(spark, prefix, path, PHRASE, k=20)
                .select(F.lit("restored").alias("state"), "doc_id",
                        "n_occurrences", "first_pos"))
    return (live.unionByName(restored)
            .orderBy("state", F.desc("n_occurrences"), "doc_id"))
