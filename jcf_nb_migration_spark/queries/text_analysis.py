"""Text-analysis + deduplication queries over the documents table
(training-data pipeline operators: token stats, language ID, quality
scoring, fingerprinting, exact/Jaccard/MinHash-LSH/SimHash dedup).

The DuckDB oracles for the hash-based operators are *generated* from
the same parameters (salt scheme, band layout, bit width) as the Spark
implementation, so both engines compute the identical md5-derived
integers — the comparison is exact, not approximate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jcf_nb_migration_spark.functions import dedup as D
from jcf_nb_migration_spark.functions import text as T
from jcf_nb_migration_spark.localrel import local_df
from jcf_nb_migration_spark.registry import query, spread, t

# DuckDB-side token/shingle expressions matching text.tokens /
# text.word_shingles over a `text` column.
_SQL_TOKS = r"list_filter(string_split_regex(text, '\s+'), x -> x != '')"
_SQL_SHINGLES = (
    "CASE WHEN len(w) >= 3 THEN list_distinct(list_transform("
    "generate_series(1, len(w)-2), i -> array_to_string(w[i:i+2], ' ')))"
    " ELSE [] END"
)
_SQL_SH_CTE = f"""
    sh AS (
        SELECT doc_id, unnest({_SQL_SHINGLES}) AS shingle
        FROM (SELECT doc_id, {_SQL_TOKS} AS w FROM documents)
    )"""


def _sql_hash48(expr: str) -> str:
    return f"('0x' || substr(md5({expr}), 1, 12))::BIGINT"


def _sql_minhash_sig_cte(k: int = 16) -> str:
    from jcf_nb_migration_spark.functions.dedup import MINHASH_P, minhash_coef

    h32 = "('0x' || substr(md5(shingle), 1, 8))::BIGINT"
    mins = ",\n               ".join(
        f"min(({minhash_coef(i, 'a')} * {h32} + {minhash_coef(i, 'b')})"
        f" % {MINHASH_P}) AS h{i}"
        for i in range(k)
    )
    return f"""{_SQL_SH_CTE},
    hashed AS (SELECT doc_id, shingle FROM sh),
    sig AS (
        SELECT doc_id, {mins}
        FROM hashed GROUP BY doc_id
    )"""


def _sql_bands_cte(bands: int = 8, rows: int = 2) -> str:
    selects = []
    for bi in range(bands):
        hs = ", ".join(f"h{bi * rows + ri}" for ri in range(rows))
        selects.append(
            f"SELECT doc_id, {bi} AS band_idx, "
            f"md5(concat_ws(',', {hs})) AS band_hash FROM sig"
        )
    return "bands AS (\n        " + "\n        UNION ALL ".join(selects) + "\n    )"


# --------------------------------------------------------------------------
# Token stats / language ID / quality / fingerprint
# --------------------------------------------------------------------------

@query(
    "doc_token_stats",
    oracle=f"""
    SELECT doc_id,
           len(toks) AS n_tokens,
           len(list_distinct(toks)) AS n_distinct,
           CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
               / len(toks) AS avg_token_len,
           length(text) AS n_chars
    FROM (SELECT doc_id, text, {_SQL_TOKS} AS toks FROM documents)
    """,
    headline=True,
    tags=("text", "tokenize"),
    driver_visible=False,  # rotated out r10 4th wave (green r1-r9,
    #   still bench-measured); token-explode + per-doc agg stays
    #   visible via doc_subword_stats
)
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace tokenizer): counts, distinct counts,
    mean token length — all codegen'd array expressions, zero UDFs."""
    docs = t(spark, sf_dir, "documents")
    toks = T.tokens("text")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        (F.aggregate(F.transform(toks, F.length), F.lit(0),
                     lambda a, v: a + v).cast("double")
         / F.size(toks)).alias("avg_token_len"),
        F.length("text").alias("n_chars"),
    )


_SQL_BPE_PAT = T.BPE_ISH_PATTERN.replace("'", "''")


@query(
    "doc_subword_stats",
    oracle=f"""
    SELECT doc_id,
           len(sw) AS n_subwords,
           len(list_distinct(sw)) AS n_distinct_subwords,
           len({_SQL_TOKS}) AS n_words,
           CAST(len(sw) AS DOUBLE) / len({_SQL_TOKS})
               AS subwords_per_word
    FROM (SELECT doc_id, text,
                 regexp_extract_all(text, '{_SQL_BPE_PAT}') AS sw
          FROM documents)
    """,
    tags=("text", "tokenize", "bpe"),
    # rotated IN r10 4th wave: the token-explode + per-doc agg
    # family's driver witness (doc_token_stats rotated out)
)
def doc_subword_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish subword counting (the token-budget estimate an LLM data
    pipeline runs corpus-wide): lookahead-free GPT-2-style
    pre-tokenizer, counts + fertility (subwords per whitespace word).
    Both engines run the identical pattern (Java regex ≡ RE2 on this
    subset), so the oracle comparison is exact."""
    docs = t(spark, sf_dir, "documents")
    sw = T.subword_tokens("text")
    w = T.tokens("text")
    return docs.select(
        "doc_id",
        F.size(sw).alias("n_subwords"),
        F.size(F.array_distinct(sw)).alias("n_distinct_subwords"),
        F.size(w).alias("n_words"),
        (F.size(sw).cast("double") / F.size(w)).alias("subwords_per_word"),
    )


# --------------------------------------------------------------------------
# BPE with learned merges (training replayed in SQL)
# --------------------------------------------------------------------------

def _sql_bpe_ctes(num_merges: int = T.BPE_NUM_MERGES) -> str:
    """Recursive-CTE replay of bpe_train + bpe_doc_encode /
    bpe_apply_merges (functions/text.py): `tr` iterates the training
    state (one row per vocab word, encoded with chr(1) symbol prefixes),
    picking each round's argmax pair with a window SUM + first_value
    (count DESC, lhs ASC, rhs ASC — binary string order, identical to
    the Python trainer's tie-break), and applying it with the same END-delimited plain
    `replace` the Spark side uses (chr(4) terminators — see
    functions/text.py::BPE_END for the prefix-match bug they prevent); `ap` folds the merge table over the
    chr(2)-boundary document encoding in rank order. Bit-identical to
    the Spark implementation on both phases."""
    m = num_merges
    return f"""
    clean AS (
      SELECT doc_id, regexp_replace(text, '[\\x00-\\x08\\x0B]', '', 'g')
             AS text
      FROM documents
    ),
    wc AS (
      SELECT sw AS word, count(*)::BIGINT AS cnt
      FROM (SELECT unnest(regexp_extract_all(text, '{_SQL_BPE_PAT}')) AS sw
            FROM clean)
      GROUP BY 1
    ),
    benc0 AS (
      SELECT regexp_replace(word, '(.)', chr(1) || '\\1' || chr(4), 'g')
             AS enc, cnt
      FROM wc
    ),
    tr AS (
      SELECT 0 AS it, enc, cnt, '' AS lhs, '' AS rhs FROM benc0
      UNION ALL
      SELECT DISTINCT it + 1,
             replace(enc, chr(1) || bl || chr(4) || chr(1) || br || chr(4),
                     chr(1) || bl || br || chr(4)),
             cnt, bl, br
      FROM (
        SELECT it, enc, cnt,
               first_value(pl) OVER w AS bl,
               first_value(pr) OVER w AS br
        FROM (
          SELECT it, enc, cnt, p.l AS pl, p.r AS pr,
                 CASE WHEN p.l IS NULL THEN 0
                      ELSE sum(cnt) OVER (PARTITION BY p.l, p.r) END AS pc
          FROM (
            SELECT it, enc, cnt,
                   unnest(list_concat(
                     list_transform(range(1, len(syms)),
                                    i -> {{'l': syms[i], 'r': syms[i+1]}}),
                     [{{'l': NULL::VARCHAR, 'r': NULL::VARCHAR}}]
                   )) AS p
            FROM (SELECT it, enc, cnt,
                         list_transform(string_split(enc, chr(1))[2:],
                                        s -> rtrim(s, chr(4))) AS syms
                  FROM tr WHERE it < {m})
          )
        )
        WINDOW w AS (ORDER BY pc DESC, pl ASC NULLS LAST, pr ASC NULLS LAST)
      )
      WHERE bl IS NOT NULL
    ),
    bpe_merges AS (
      SELECT DISTINCT it AS merge_rank, lhs, rhs FROM tr WHERE it >= 1
    ),
    doc_enc0 AS (
      SELECT doc_id,
             regexp_replace(
               replace(
                 regexp_replace(
                   replace(
                     regexp_replace(text, '({_SQL_BPE_PAT})',
                                    chr(2) || '\\1', 'g'),
                     chr(2) || ' ', chr(3)),
                   '\\s', '', 'g'),
                 chr(3), chr(2) || ' '),
               '([^\\x02])', chr(1) || '\\1' || chr(4), 'g') AS enc
      FROM clean
    ),
    ap AS (
      SELECT doc_id, enc, 0 AS step FROM doc_enc0
      UNION ALL
      SELECT a.doc_id,
             replace(a.enc, chr(1) || m.lhs || chr(4)
                            || chr(1) || m.rhs || chr(4),
                     chr(1) || m.lhs || m.rhs || chr(4)),
             a.step + 1
      FROM ap a JOIN bpe_merges m ON m.merge_rank = a.step + 1
    )"""


@query(
    "bpe_merge_table",
    oracle=f"""
    WITH RECURSIVE {_sql_bpe_ctes()}
    SELECT merge_rank, lhs, rhs FROM bpe_merges
    """,
    tags=("text", "bpe", "train"),
    # green r3-r8; rotated OUT in the r9 second wave — the
    # vocabulary-join text family stays visible via doc_token_stats /
    # token_pmi_pairs; the BPE loop itself is pinned by test_text_bpe
    driver_visible=False,
)
def bpe_merge_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned BPE merge table itself (rank, lhs, rhs): one corpus
    pass for pretoken frequencies, deterministic iterative pair-merge
    learning over the vocabulary table (functions/text.py::bpe_train).
    The oracle re-trains from scratch inside DuckDB via a recursive CTE
    — the comparison covers the full training dynamics, not just the
    artifact's shape."""
    docs = t(spark, sf_dir, "documents")
    merges = T.bpe_train(docs, "text", T.BPE_NUM_MERGES)
    return local_df(
        spark, [(i + 1, l, r) for i, (l, r) in enumerate(merges)],
        "merge_rank int, lhs string, rhs string")


@query(
    "doc_bpe_stats",
    oracle=f"""
    WITH RECURSIVE {_sql_bpe_ctes()},
    bfinal AS (
      SELECT doc_id, enc FROM ap
      WHERE step = (SELECT max(merge_rank) FROM bpe_merges)
    )
    SELECT e.doc_id,
           (length(e.enc) - length(replace(e.enc, chr(2), '')))
               AS n_pretokens,
           (length(e.enc) - length(replace(e.enc, chr(1), '')))
               AS n_init_symbols,
           (length(f.enc) - length(replace(f.enc, chr(1), '')))
               AS n_subwords,
           CAST(length(f.enc) - length(replace(f.enc, chr(1), ''))
                AS DOUBLE)
               / NULLIF(length(e.enc) - length(replace(e.enc, chr(2), '')),
                        0) AS subwords_per_pretoken
    FROM doc_enc0 e JOIN bfinal f USING (doc_id)
    """,
    tags=("text", "bpe", "tokenize"),
    # green r3-r8; rotated OUT in the r9 second wave (same family
    # witnesses as bpe_merge_table)
    driver_visible=False,
)
def doc_bpe_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real BPE token counts per document (the corpus-wide token-budget
    number an LLM data pipeline runs constantly): train the merge table
    (one corpus pass + driver-side vocab loop), then apply it as a chain
    of codegen'd string replaces on the boundary-encoded text — no
    Python, no shuffle in the application pass. n_subwords is the true
    post-merge BPE count, unlike doc_subword_stats' pre-tokenizer
    approximation."""
    docs = spread(t(spark, sf_dir, "documents"))
    merges = T.bpe_train(docs, "text", T.BPE_NUM_MERGES)
    e0 = T.bpe_doc_encode("text")
    enc = docs.select("doc_id", e0.alias("e0"))
    enc = enc.withColumn("ef", T.bpe_apply_merges(F.col("e0"), merges))
    n_pre = T.count_char(F.col("e0"), T.BPE_TOK)
    n_sub = T.count_char(F.col("ef"), T.BPE_SYM)
    return enc.select(
        "doc_id",
        n_pre.alias("n_pretokens"),
        T.count_char(F.col("e0"), T.BPE_SYM).alias("n_init_symbols"),
        n_sub.alias("n_subwords"),
        (n_sub.cast("double") / F.when(n_pre != 0, n_pre))
            .alias("subwords_per_pretoken"),
    )


@query(
    "doc_lang_id",
    oracle=f"""
    SELECT doc_id, lang AS lang_declared,
           {T.lang_id_oracle_sql('toks')} AS lang_pred,
           len(list_filter(toks,
               x -> list_contains(['the','a','of','and','is','to','in'], x)))
               AS n_stop_en
    FROM (SELECT doc_id, lang, {_SQL_TOKS} AS toks FROM documents)
    """,
    tags=("text", "lang-id"),
    # rotated out of the driver window r5 (narrow text-stat scan is
    # witnessed by doc_quality_score) to make room for the fuzzy-join
    # and GD-training marquee ops; still oracle-run by every pytest
    driver_visible=False,
)
def doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID (stopword-profile argmax). The synthetic
    corpus shares one vocabulary across langs, so the declared label is
    returned alongside for comparison."""
    docs = t(spark, sf_dir, "documents")
    toks = T.tokens("text")
    return docs.select(
        "doc_id",
        F.col("lang").alias("lang_declared"),
        T.lang_id(toks).alias("lang_pred"),
        T.stopword_hits(toks, "en").alias("n_stop_en"),
    )


@query(
    "doc_quality_score",
    oracle=f"""
    SELECT doc_id,
           length(text) AS n_chars,
           len(toks) AS n_tokens,
           (length(text) - length(regexp_replace(text,
               '[.,;:!?''"()-]', '', 'g'))) AS n_punct,
           CAST(len(list_filter(toks,
               x -> list_contains(['the','a','of','and','is','to','in'], x)))
               AS DOUBLE) / len(toks) AS stopword_ratio,
           CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
               AS distinct_ratio
    FROM (SELECT doc_id, text, {_SQL_TOKS} AS toks FROM documents)
    """,
    tags=("text", "quality"),
    # rotated OUT r9 (8x green); narrow per-doc stats twin:
    # doc_token_stats
    driver_visible=False,
)
def doc_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality features for corpus filtering: length, punctuation count,
    stopword ratio, lexical diversity. Downstream policy (keep/drop
    thresholds) composes as plain filters on these columns."""
    docs = t(spark, sf_dir, "documents")
    toks = T.tokens("text")
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        T.punct_count("text").alias("n_punct"),
        (T.stopword_hits(toks, "en").cast("double") / F.size(toks))
            .alias("stopword_ratio"),
        (F.size(F.array_distinct(toks)).cast("double") / F.size(toks))
            .alias("distinct_ratio"),
    )


@query(
    "doc_fingerprint",
    oracle=r"""
    SELECT doc_id,
           md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
           ('0x' || substr(md5(regexp_replace(lower(trim(text)),
               '\s+', ' ', 'g')), 1, 12))::BIGINT % 1024 AS fp_bucket
    FROM documents
    """,
    tags=("text", "fingerprint"),
    driver_visible=False,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-document fingerprint (normalized md5) + a 1024-way shard
    bucket — the key you'd hash-partition a 100 TB corpus on for
    exact dedup without skew."""
    docs = t(spark, sf_dir, "documents")
    fp = T.doc_fingerprint("text")
    return docs.select(
        "doc_id",
        fp.alias("fp"),
        (F.conv(F.substring(fp, 1, 12), 16, 10).cast("bigint") % 1024)
            .alias("fp_bucket"),
    )


# --------------------------------------------------------------------------
# Dedup: exact, brute Jaccard, MinHash+LSH, SimHash
# --------------------------------------------------------------------------

@query(
    "doc_winnow_fingerprints",
    oracle=r"""
    WITH base AS (
        SELECT doc_id,
               regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
        FROM documents
    ), grams AS (
        SELECT doc_id,
               list_transform(
                   range(1, greatest(length(norm) - 7, 0) + 1),
                   i -> ('0x' || substr(md5(norm[i:i+7]), 1, 12))::BIGINT
               ) AS hs
        FROM base
    ), wins AS (
        SELECT doc_id,
               CASE WHEN len(hs) - 3 >= 1 THEN
                   list_distinct(list_transform(
                       range(1, len(hs) - 3 + 1),
                       j -> list_min(hs[j:j+3])))
               WHEN len(hs) >= 1 THEN [list_min(hs)]
               ELSE [] END AS fps
        FROM grams
    )
    SELECT doc_id, unnest(fps) AS fp FROM wins
    """,
    tags=("text", "fingerprint", "winnowing"),
)
def doc_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (rolling k-gram hash + min-per-window) fingerprints,
    exploded to (doc_id, fp) — join two corpora on fp to find partial
    overlaps (shared substrings ≥ k+window-1 chars), which a whole-doc
    hash can't see. k=8, window=4."""
    docs = spread(t(spark, sf_dir, "documents"))
    return T.winnowing_fingerprints(docs, "doc_id", "text", k=8, window=4)


@query(
    "dedup_exact",
    oracle=r"""
    SELECT doc_id, lang, source FROM (
        SELECT doc_id, lang, source,
               ROW_NUMBER() OVER (
                   PARTITION BY md5(regexp_replace(lower(trim(text)),
                                                   '\s+', ' ', 'g'))
                   ORDER BY doc_id) AS rn
        FROM documents
    ) WHERE rn = 1
    """,
    headline=True,
    tags=("dedup", "exact"),
    # rotated OUT r9 (8x green; still benched as a headline); exact-
    # fingerprint twin: bloom_incremental_dedup
    driver_visible=False,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup with deterministic survivor (min doc_id per
    normalized-text fingerprint) — one shuffle on the fingerprint."""
    docs = t(spark, sf_dir, "documents")
    return D.exact_dedup(docs, "text", "doc_id").select(
        "doc_id", "lang", "source")


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH {_SQL_SH_CTE},
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
        FROM sh a JOIN sh b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           CAST(common AS DOUBLE) / (sa.n_sh + sb.n_sh - common) AS jaccard
    FROM pairs
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(common AS DOUBLE) / (sa.n_sh + sb.n_sh - common) >= 0.5
    """,
    tags=("dedup", "jaccard"),
    # the quadratic all-pairs BASELINE of minhash_lsh_dedup — stays
    # local by curation rule 2 (and was driver-checked green in the
    # early rounds); split_leakage_audit took the r9 window slot
    driver_visible=False,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs 3-gram-shingle Jaccard ≥ 0.5 via inverted-index
    self-join — the exact baseline the LSH pipeline is verified
    against. Finds the corpus's planted near-duplicate pairs."""
    docs = t(spark, sf_dir, "documents")
    return D.jaccard_pairs(docs, "doc_id", "text", threshold=0.5, n=3)


@query(
    "minhash_signatures",
    oracle=f"""
    WITH {_sql_minhash_sig_cte(16)}
    SELECT * FROM sig
    """,
    tags=("dedup", "minhash"),
    driver_visible=False,
)
def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16 md5-derived minhash values per document over its 3-gram
    shingle set (one explode + one groupBy with 16 min aggregates)."""
    docs = t(spark, sf_dir, "documents")
    return D.minhash_signatures(docs, "doc_id", "text", k=16, n=3)


@query(
    "minhash_lsh_dedup",
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
    verified AS (
        SELECT c.id_a, c.id_b, count(*) AS common
        FROM cands c
        JOIN sh a ON a.doc_id = c.id_a
        JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
        GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           CAST(common AS DOUBLE) / (sa.n_sh + sb.n_sh - common) AS jaccard
    FROM verified
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(common AS DOUBLE) / (sa.n_sh + sb.n_sh - common) >= 0.5
    """,
    headline=True,
    tags=("dedup", "minhash", "lsh"),
    # rotated OUT of the driver window r10 wave 5 (green in all NINE
    # driver rounds r1-r9 — the window's most-checked name); pattern
    # twin: lsh_incremental_dedup (same banded (band_idx, band_hash)
    # equi-join candidate generation, currently driver-visible).
    # Still a bench headline and oracle-run at every pytest.
    driver_visible=False,
)
def minhash_lsh_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale-path near-dup pipeline: banded MinHash LSH candidate
    generation (equi-join on band hashes — linear, not all-pairs)
    followed by exact-Jaccard verification of candidates only."""
    docs = t(spark, sf_dir, "documents")
    return D.minhash_lsh_dedup(docs, "doc_id", "text",
                               threshold=0.5, k=16, bands=8, rows=2, n=3)


def _sql_simhash_cte(bits: int = D.SIMHASH_BITS) -> str:
    votes = ",\n               ".join(
        f"CAST(SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS BIGINT)"
        f" AS v{b}"
        for b in range(bits)
    )
    terms = " + ".join(
        f"CASE WHEN v{b} >= 0 THEN CAST({1 << b} AS BIGINT)"
        f" ELSE CAST(0 AS BIGINT) END"
        for b in range(bits)
    )
    return f"""toks AS (
        SELECT doc_id, unnest(list_distinct({_SQL_TOKS})) AS tok
        FROM documents
    ),
    hashed AS (
        SELECT doc_id, {_sql_hash48('tok')} AS h FROM toks
    ),
    votes AS (
        SELECT doc_id, {votes}
        FROM hashed GROUP BY doc_id
    ),
    fps AS (
        SELECT doc_id, {terms} AS simhash FROM votes
    )"""


@query(
    "simhash_fingerprints",
    oracle=f"""
    WITH {_sql_simhash_cte()}
    SELECT * FROM fps
    """,
    tags=("dedup", "simhash"),
    driver_visible=False,  # rotated out r13 7th wave (green r10-r12, 3x)
)
def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """48-bit SimHash per document (±1 votes per hash bit over the
    distinct token set)."""
    docs = t(spark, sf_dir, "documents")
    return D.simhash(docs, "doc_id", "text")


@query(
    "simhash_near_pairs",
    oracle=f"""
    WITH {_sql_simhash_cte()}
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM fps a JOIN fps b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
    tags=("dedup", "simhash"),
    # rotated OUT r9 (7x green); banded candidate equi-join twin:
    # minhash_lsh_dedup
    driver_visible=False,
)
def simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs within Hamming distance 3 of their 64-bit SimHash — the
    Manku/Jain/Sarma (WWW 2007) production parameterization —
    pigeonhole-banded candidate generation (4 disjoint 16-bit bands,
    equi-join on exact band matches — lossless for this radius) +
    exact-Hamming verification; the oracle is the naive all-pairs
    formulation the banding provably equals. (r5: radius tightened
    from 10 — 11 bands of ≤6 bits collide constantly, and on this
    fixture's dense fingerprint space radius 10 admits 6 M pairs at
    sf0.1, an output-bound query; radius 3 is both the published
    choice and selective: 16-bit bands, ~410 k true pairs.)"""
    docs = t(spark, sf_dir, "documents")
    fps = D.simhash(docs, "doc_id", "text")
    return D.simhash_near_pairs(fps, "doc_id", max_hamming=3)


PARA_W = 10  # words per pseudo-paragraph (the fixture text has no
#              newlines, so "paragraphs" are fixed 10-word chunks)


@query(
    "paragraph_dedup",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, {_SQL_TOKS} AS w FROM documents
    ),
    idx AS (
        SELECT doc_id, w,
               unnest(generate_series(0,
                   CAST((len(w) - 1) // {PARA_W} AS INT))) AS chunk_idx
        FROM d WHERE len(w) > 0
    ),
    ch AS (
        SELECT doc_id, chunk_idx,
               array_to_string(
                   w[chunk_idx*{PARA_W}+1 : chunk_idx*{PARA_W}+{PARA_W}],
                   ' ') AS chunk
        FROM idx
    ),
    marked AS (
        SELECT doc_id, chunk_idx, chunk,
               ({{'d': doc_id, 'i': chunk_idx}} =
                MIN({{'d': doc_id, 'i': chunk_idx}})
                    OVER (PARTITION BY md5(chunk))) AS is_first
        FROM ch
    )
    SELECT doc_id,
           COUNT(*) AS n_chunks,
           CAST(SUM(CASE WHEN NOT is_first THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dup_chunks,
           COALESCE(string_agg(chunk, ' ' ORDER BY chunk_idx)
                        FILTER (WHERE is_first),
                    '') AS kept_text
    FROM marked GROUP BY doc_id ORDER BY doc_id
    """,
    tags=("dedup", "paragraph", "c4"),
    # explode → hash-partitioned window → per-doc agg: the same
    # shuffle graph as dedup_exact (md5-window survivor pick) plus
    # decontaminate_ngrams' explode; both driver-visible
    # rotated OUT of the driver window r10 (green in 3 driver
    # rounds); pattern twin: duplicate_spans
    # (coverage_map.py); still oracle-run at every pytest.
    driver_visible=False,
)
def paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style paragraph-level exact dedup: every document is split
    into fixed {PARA_W}-word chunks (the fixture has no newlines, so
    chunks stand in for paragraphs/lines), each chunk's md5 keeps only
    its GLOBALLY FIRST occurrence (min (doc_id, chunk_idx)), and each
    document is re-assembled from its surviving chunks in original
    order. This removes boilerplate repeated across documents AND
    repeated chunks within one document — the corpus-level line dedup
    C4/RefinedWeb apply before training.

    Scale shape: one explode (linear), one window partitioned by the
    chunk hash (hash-partitioned shuffle — never a global sort), one
    per-doc aggregation (second shuffle). Survivor choice is the
    deterministic lexicographic MIN of the (doc_id, chunk_idx) STRUCT
    — not an arithmetic packing, which would collide keyspaces for
    documents with ≥1M chunks (~10M words) — so reruns and
    repartitions keep the same chunks at any document size."""
    docs = t(spark, sf_dir, "documents")
    d = (spread(docs)
         .select("doc_id", T.tokens("text").alias("w"))
         .where(F.size("w") > 0))
    ch = d.select(
        "doc_id",
        F.posexplode(F.expr(
            f"transform(sequence(0, (size(w)-1) div {PARA_W}),"
            f" i -> array_join(slice(w, i*{PARA_W}+1, {PARA_W}), ' '))"
        )).alias("chunk_idx", "chunk"))
    from pyspark.sql import Window as W
    key = F.struct(F.col("doc_id").alias("d"),
                   F.col("chunk_idx").alias("i"))
    marked = ch.select(
        "doc_id", "chunk_idx", "chunk",
        (key == F.min(key).over(W.partitionBy(F.md5("chunk"))))
        .alias("is_first"))
    kept = F.when(F.col("is_first"),
                  F.struct("chunk_idx", "chunk"))
    return (
        marked.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_chunks"),
             F.sum(F.when(~F.col("is_first"), 1)
                   .otherwise(0)).alias("n_dup_chunks"),
             F.array_join(
                 F.transform(F.array_sort(F.collect_list(kept)),
                             lambda x: x.chunk),
                 " ").alias("kept_text"))
        .orderBy("doc_id")
    )


@query(
    "doc_containment_pairs",
    oracle=f"""
    WITH {_SQL_SH_CTE},
    freq AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    prefix AS (
        SELECT doc_id, shingle FROM (
            SELECT s.doc_id, s.shingle, z.n_sh,
                   ROW_NUMBER() OVER (
                       PARTITION BY s.doc_id
                       ORDER BY f.df, s.shingle) AS rn
            FROM sh s
            JOIN freq f ON f.shingle = s.shingle
            JOIN sizes z ON z.doc_id = s.doc_id
        ) WHERE rn <= n_sh - (4 * n_sh + 4) // 5 + 1
    ),
    cands AS (
        SELECT DISTINCT LEAST(p.doc_id, s.doc_id) AS id_a,
                        GREATEST(p.doc_id, s.doc_id) AS id_b
        FROM prefix p JOIN sh s
          ON s.shingle = p.shingle AND s.doc_id <> p.doc_id
    ),
    verified AS (
        SELECT c.id_a, c.id_b, count(*) AS common
        FROM cands c
        JOIN sh a ON a.doc_id = c.id_a
        JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
        GROUP BY 1, 2
    )
    SELECT id_a, id_b, common,
           ROUND(CAST(common AS DOUBLE) / sa.n_sh, 9) AS contain_a,
           ROUND(CAST(common AS DOUBLE) / sb.n_sh, 9) AS contain_b
    FROM verified
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE GREATEST(ROUND(CAST(common AS DOUBLE) / sa.n_sh, 9),
                   ROUND(CAST(common AS DOUBLE) / sb.n_sh, 9)) >= 0.8
    ORDER BY id_a, id_b
    """,
    tags=("dedup", "containment", "asymmetric", "prefix-filter"),
    driver_visible=True,  # rotated INTO the driver window r14 (8th wave, first-time name)
)
def doc_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-dup pairs by shingle-set CONTAINMENT ≥ 0.8 —
    catches a short document embedded in a longer one, which Jaccard
    (and MinHash LSH, its approximation) misses at large size ratios.
    Candidates by PREFIX FILTERING: each doc indexes only its
    ``n − ceil(0.8·n) + 1`` rarest shingles, provably sufficient by
    pigeonhole for either containment direction (the PPJoin-family
    technique); verification counts common shingles over the full
    sets, exactly, for candidates only. See
    functions/dedup.py:containment_pairs for the losslessness proof,
    the measured 100× candidate reduction over a global-df-cap
    blocker on this fixture, and the 100 TB scaling argument."""
    docs = t(spark, sf_dir, "documents")
    return (D.containment_pairs(docs, "doc_id", "text",
                                threshold=0.8, n=3)
            .orderBy("id_a", "id_b"))


@query(
    "corpus_novelty_curve",
    oracle=f"""
    WITH {_SQL_SH_CTE},
    firsts AS (
        SELECT shingle, MIN(doc_id) AS first_doc
        FROM sh GROUP BY shingle
    ),
    per_doc AS (
        SELECT s.doc_id, count(*) AS n_grams,
               CAST(SUM(CASE WHEN f.first_doc = s.doc_id
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
        FROM sh s JOIN firsts f ON f.shingle = s.shingle
        GROUP BY s.doc_id
    )
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(p.n_grams) AS BIGINT) AS n_grams,
           CAST(SUM(p.n_novel) AS BIGINT) AS n_novel,
           ROUND(CAST(SUM(p.n_novel) AS DOUBLE) / SUM(p.n_grams), 9)
               AS novelty
    FROM per_doc p JOIN documents d ON d.doc_id = p.doc_id
    GROUP BY d.source ORDER BY d.source
    """,
    tags=("curation", "novelty", "dedup-diagnostic"),
    # rotated IN r10 4th wave: the shingle-explode + agg/join family's
    # driver witness (decontaminate_ngrams rotated out)
    # rotated OUT of the driver window r14 (8th wave);
    # pattern witnessed by doc_bigram_lm_score (coverage_map.py)
    driver_visible=False,
)
def corpus_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source novelty: what fraction of a source's 3-gram shingle
    occurrences are the corpus-wide FIRST occurrence of that shingle
    (first = min doc_id, the same deterministic survivor rule the
    dedup family uses). This is the marginal-value diagnostic a
    curation pipeline runs before paying to ingest more of a source —
    a source whose novelty has collapsed is re-crawling what the
    corpus already holds. Shape: one explode, ONE exchange of the
    occurrence set (hash on shingle) carrying a keyed min-window that
    tags each occurrence with its shingle's first doc — r12 restructure
    from groupBy(shingle)+join-back, which exchanged the same
    occurrence set TWICE; measured 2x faster at the 100x-derived point
    (6.6 s → 3.2 s, hash-identical) — then one per-doc agg and a
    bounded per-source rollup; linear, no corpus-wide funnel. The
    novelty ratio is one BIGINT/BIGINT double division, deterministic
    cross-engine."""
    from pyspark.sql import Window

    docs = t(spark, sf_dir, "documents")
    sh = D.shingle_index(docs, "doc_id", "text", 3)
    first_doc = F.min("doc_id").over(Window.partitionBy("shingle"))
    per_doc = (sh.withColumn("first_doc", first_doc)
               .groupBy("doc_id")
               .agg(F.count(F.lit(1)).alias("n_grams"),
                    F.sum(F.when(F.col("first_doc") == F.col("doc_id"), 1)
                          .otherwise(0)).alias("n_novel")))
    return (
        per_doc.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("n_grams").alias("n_grams"),
             F.sum("n_novel").alias("n_novel"))
        .select("source", "n_docs", "n_grams", "n_novel",
                F.round(F.col("n_novel").cast("double")
                        / F.col("n_grams"), 9).alias("novelty"))
        .orderBy("source")
    )


PMI_MIN_COUNT = 5  # bigram support floor (PMI is noise below this)


@query(
    "token_pmi_pairs",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS w FROM documents),
    uni AS (
        SELECT t, count(*) AS c1 FROM (
            SELECT unnest(w) AS t FROM toks) GROUP BY t
    ),
    tot AS (SELECT CAST(SUM(c1) AS BIGINT) AS n FROM uni),
    big AS (
        SELECT g, count(*) AS c2 FROM (
            SELECT unnest(CASE WHEN len(w) >= 2 THEN list_transform(
                       generate_series(1, len(w)-1),
                       i -> array_to_string(w[i:i+1], ' '))
                   ELSE [] END) AS g
            FROM toks) GROUP BY g
        HAVING count(*) >= {PMI_MIN_COUNT}
    )
    SELECT g AS pair, c2 AS pair_count,
           ROUND(CAST(c2 * tot.n AS DOUBLE)
                 / (u1.c1 * u2.c1), 9) AS pmi_ratio
    FROM big
    JOIN uni u1 ON u1.t = split_part(g, ' ', 1)
    JOIN uni u2 ON u2.t = split_part(g, ' ', 2)
    CROSS JOIN tot
    ORDER BY pmi_ratio DESC, pair
    LIMIT 50
    """,
    tags=("text", "collocation", "pmi"),
    # rotated INTO the driver window r9 second wave (first-time name)
    # rotated OUT r11 5th wave (multi-green in driver
    # artifacts); same-pattern visible twin: association_rules_pairs
    driver_visible=False,
)
def token_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: the 50 adjacent token pairs most associated
    by pointwise mutual information. PMI's log is monotone, so ranking
    by the RAW ratio c(xy)·N / (c(x)·c(y)) is the identical order with
    zero transcendental math — the log-free discipline every scoring
    query here follows (cross-engine log rounding differs; integer
    products and one double division don't). Support floor of
    {PMI_MIN_COUNT} kills the hapax noise PMI is famous for. One
    explode + two count tables + a vocabulary-keyed join chain (AQE
    decides broadcasts — same policy as the LM/tfidf joins); the
    integer product c2·N stays under 2⁶³ until ~10¹² bigram
    occurrences × corpus size — far past 100 TB of text."""
    docs = spread(t(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", T.tokens("text").alias("w"))
    uni = (toks.select(F.explode("w").alias("t"))
           .groupBy("t").agg(F.count(F.lit(1)).alias("c1")))
    tot = uni.agg(F.sum("c1").alias("n"))
    big = (toks.select(F.explode(T.word_shingles(F.col("w"), 2))
                       .alias("g"))
           .groupBy("g").agg(F.count(F.lit(1)).alias("c2"))
           .where(F.col("c2") >= PMI_MIN_COUNT))
    u1 = uni.select(F.col("t").alias("t1"), F.col("c1").alias("c_1"))
    u2 = uni.select(F.col("t").alias("t2"), F.col("c1").alias("c_2"))
    return (big
            .withColumn("t1", F.split_part(F.col("g"), F.lit(" "),
                                           F.lit(1)))
            .withColumn("t2", F.split_part(F.col("g"), F.lit(" "),
                                           F.lit(2)))
            .join(u1, "t1").join(u2, "t2")
            .crossJoin(F.broadcast(tot))
            .select(F.col("g").alias("pair"),
                    F.col("c2").alias("pair_count"),
                    F.round((F.col("c2") * F.col("n")).cast("double")
                            / (F.col("c_1") * F.col("c_2")), 9)
                     .alias("pmi_ratio"))
            .orderBy(F.desc("pmi_ratio"), "pair")
            .limit(50))


@query(
    "term_source_dispersion",
    oracle=f"""
    WITH toks AS (
        SELECT source, unnest({_SQL_TOKS}) AS term FROM documents
    ),
    per_src AS (
        SELECT term, source, count(*) AS c FROM toks GROUP BY 1, 2
    ),
    agg AS (
        SELECT term,
               CAST(SUM(c) AS BIGINT) AS total,
               CAST(COUNT(*) AS BIGINT) AS n_sources,
               CAST(MAX(c) AS BIGINT) AS max_src_count
        FROM per_src GROUP BY term
        HAVING SUM(c) >= 50
    )
    SELECT term, total, n_sources,
           ROUND(CAST(max_src_count AS DOUBLE) / total, 9)
               AS max_source_share
    FROM agg
    ORDER BY max_source_share DESC, term
    LIMIT 30
    """,
    tags=("text", "dispersion", "boilerplate", "curation"),
    # two-level count rollup on the term key — tfidf/vocabulary family
    driver_visible=False,  # rotated out r13 7th wave (green r11-r12, 2x)
)
def term_source_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-dispersion profile of frequent terms — the boilerplate
    detector that runs BEFORE dedup: a term with high corpus count
    concentrated in one source (max_source_share → 1) is
    source-specific template text (nav bars, license footers), while
    evenly dispersed terms are real language. Feeds the per-source
    cleaning rules a curation pipeline applies ahead of the expensive
    near-dup stages. Two stacked counting aggregates on the term key
    (both map-side combining), a support floor, and a top-30 ordered
    take — integer counts and one ratio, exact cross-engine."""
    docs = spread(t(spark, sf_dir, "documents"))
    toks = docs.select("source",
                       F.explode(T.tokens("text")).alias("term"))
    per_src = (toks.groupBy("term", "source")
               .agg(F.count(F.lit(1)).alias("c")))
    return (per_src.groupBy("term")
            .agg(F.sum("c").alias("total"),
                 F.count(F.lit(1)).alias("n_sources"),
                 F.max("c").alias("max_src_count"))
            .where(F.col("total") >= 50)
            .select("term", "total", "n_sources",
                    F.round(F.col("max_src_count").cast("double")
                            / F.col("total"), 9)
                     .alias("max_source_share"))
            .orderBy(F.desc("max_source_share"), "term")
            .limit(30))


@query(
    "code_switch_profile",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, {_SQL_TOKS} AS w FROM documents
    ),
    idx AS (
        SELECT doc_id, w,
               unnest(generate_series(0,
                   CAST((len(w) - 1) // {PARA_W} AS INT))) AS chunk_idx
        FROM d WHERE len(w) > 0
    ),
    ch AS (
        SELECT doc_id, chunk_idx,
               {T.lang_id_oracle_sql(
                   f"w[chunk_idx*{PARA_W}+1 : chunk_idx*{PARA_W}+{PARA_W}]")}
                   AS clang
        FROM idx
    ),
    lc AS (
        SELECT doc_id, clang, COUNT(*) AS cnt FROM ch GROUP BY 1, 2
    ),
    main AS (
        SELECT doc_id, clang AS main_lang, cnt AS main_cnt FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY doc_id ORDER BY cnt DESC, clang) AS rk
            FROM lc
        ) WHERE rk = 1
    ),
    tot AS (
        SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_chunks,
               CAST(COUNT(*) AS BIGINT) AS n_langs
        FROM lc GROUP BY doc_id
    )
    SELECT t.doc_id, t.n_chunks, t.n_langs, m.main_lang,
           ROUND(CAST(m.main_cnt AS DOUBLE) / t.n_chunks, 9)
               AS main_share,
           t.n_langs > 1 AS is_code_switched
    FROM tot t JOIN main m ON m.doc_id = t.doc_id
    ORDER BY t.doc_id
    """,
    tags=("text", "lang-id", "code-switch", "curation"),
    # chunk explode + per-doc windows — the paragraph_dedup shuffle
    # graph with doc_lang_id's scoring; pattern driver-visible via
    # doc_quality_score + dedup_exact
    driver_visible=False,
)
def code_switch_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-language (code-switching) detection — the curation signal
    monolingual filters miss: documents whose PARAGRAPHS disagree on
    language (boilerplate headers in English wrapping native text,
    scraped forums, machine-concatenated pages). Each {PARA_W}-word
    chunk (the paragraph_dedup chunking) gets the stopword-argmax
    language ID; per document the profile reports chunk count,
    distinct chunk languages, the majority language and its share, and
    an is_code_switched flag for the >1-language docs a curation rule
    would route to per-paragraph filtering instead of doc-level drop.

    Scale shape: one explode (linear), per-(doc, lang) counts and a
    doc-partitioned top-1 window (bounded by the language-list size),
    one per-doc rollup — the paragraph_dedup shuffle graph with
    lang_id's vectorized CASE chain instead of md5."""
    docs = t(spark, sf_dir, "documents")
    d = (spread(docs)
         .select("doc_id", T.tokens("text").alias("w"))
         .where(F.size("w") > 0))
    ch = d.select(
        "doc_id",
        F.posexplode(F.expr(
            f"transform(sequence(0, (size(w)-1) div {PARA_W}),"
            f" i -> slice(w, i*{PARA_W}+1, {PARA_W}))"
        )).alias("chunk_idx", "cw")
    ).select("doc_id", T.lang_id(F.col("cw")).alias("clang"))
    lc = ch.groupBy("doc_id", "clang").agg(F.count(F.lit(1)).alias("cnt"))
    from pyspark.sql import Window as W
    rk = F.row_number().over(
        W.partitionBy("doc_id").orderBy(F.desc("cnt"), "clang"))
    main = (lc.withColumn("rk", rk).where(F.col("rk") == 1)
            .select("doc_id", F.col("clang").alias("main_lang"),
                    F.col("cnt").alias("main_cnt")))
    tot = lc.groupBy("doc_id").agg(
        F.sum("cnt").cast("bigint").alias("n_chunks"),
        F.count(F.lit(1)).cast("bigint").alias("n_langs"))
    return (tot.join(main, "doc_id")
            .select("doc_id", "n_chunks", "n_langs", "main_lang",
                    F.round(F.col("main_cnt").cast("double")
                            / F.col("n_chunks"), 9).alias("main_share"),
                    (F.col("n_langs") > 1).alias("is_code_switched"))
            .orderBy("doc_id"))


@query(
    "source_dedup_matrix",
    oracle="""
    WITH fp AS (
        SELECT md5(text) AS f, source, COUNT(*) AS cnt
        FROM documents GROUP BY 1, 2
    )
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(SUM(CASE WHEN a.source = b.source
                         THEN a.cnt * (a.cnt - 1) / 2
                         ELSE a.cnt * b.cnt END) AS BIGINT)
               AS n_dup_pairs,
           CAST(COUNT(*) AS BIGINT) AS n_shared_fingerprints
    FROM fp a JOIN fp b
      ON b.f = a.f AND a.source <= b.source
     AND (a.source < b.source OR a.cnt > 1)
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("dedup", "provenance", "matrix", "cross-source"),
    driver_visible=True,  # rotated INTO the driver window r14 (8th wave, first-time name)
)
def source_dedup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHERE duplication comes from — the provenance matrix a crawl
    curation team reads before dropping a source: for every source
    pair, how many exact-duplicate document PAIRS span them (same
    md5), and how many distinct fingerprints they share.
    Within-source cells count C(cnt,2) pairs; cross-source cells
    cnt_a·cnt_b. Mirror sites light up as off-diagonal hot cells and
    boilerplate-heavy sources as diagonal ones.

    Scale shape: fingerprints aggregate per (fp, source) FIRST — the
    join operates on group COUNTS, not documents, so a fingerprint
    duplicated a million times joins as one row per source, never
    10¹² document pairs. The self-join key is the fingerprint
    (hash-uniform); output is |sources|² bounded."""
    docs = t(spark, sf_dir, "documents")
    fp = (docs.groupBy(F.md5("text").alias("f"), F.col("source"))
          .agg(F.count(F.lit(1)).alias("cnt"))
          .persist())
    a, b = fp.alias("a"), fp.alias("b")
    pairs = F.when(F.col("a.source") == F.col("b.source"),
                   F.col("a.cnt") * (F.col("a.cnt") - 1) / 2) \
             .otherwise(F.col("a.cnt") * F.col("b.cnt"))
    return (a.join(b, (F.col("b.f") == F.col("a.f"))
                   & (F.col("a.source") <= F.col("b.source"))
                   & ((F.col("a.source") < F.col("b.source"))
                      | (F.col("a.cnt") > 1)))
            .groupBy(F.col("a.source").alias("source_a"),
                     F.col("b.source").alias("source_b"))
            .agg(F.sum(pairs).cast("bigint").alias("n_dup_pairs"),
                 F.count(F.lit(1)).cast("bigint")
                  .alias("n_shared_fingerprints"))
            .orderBy("source_a", "source_b"))
