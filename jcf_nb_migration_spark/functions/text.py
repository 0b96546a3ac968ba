"""Text-analysis column expressions for large-scale corpus pipelines.

Everything here is a pure ``pyspark.sql.functions`` expression tree —
JVM-side, whole-stage-codegen'd, no Python in the hot path — so these
operators run at scan bandwidth on a 100 TB documents table.

Determinism note: all hashing is md5-based (not Spark's murmur3
``F.hash``) so results are engine-independent and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword seed lists (public knowledge). The lang-id
# heuristic scores a document by stopword hits per language and takes
# the argmax with a fixed priority order for ties.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is", "to", "in"),
    "de": ("der", "die", "das", "und", "ist", "zu", "ein"),
    "fr": ("le", "la", "et", "est", "les", "un", "une"),
    "es": ("el", "la", "y", "es", "los", "un", "una"),
    "zh": ("de", "shi", "le", "zai", "wo", "you", "he"),
}
LANG_PRIORITY = ("en", "de", "fr", "es", "zh")


def tokens(c: Column | str) -> Column:
    """Whitespace tokenization, empty tokens dropped (so leading/double
    spaces don't produce phantom tokens)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.filter(F.split(col, r"\s+"), lambda x: x != "")


def token_count(c: Column | str) -> Column:
    return F.size(tokens(c))


def word_shingles(toks: Column, n: int = 3) -> Column:
    """n-word shingles: ['a','b','c','d'] → ['a b c','b c d'] (n=3).
    Built with sequence+slice — no explode, no UDF. Documents shorter
    than n tokens yield an empty array (sequence would otherwise count
    *down* and fabricate shingles)."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


# BPE-ish pre-tokenization pattern (GPT-2 style, simplified to the
# lookahead-free subset so Java regex (Spark) and RE2 (DuckDB)
# tokenize identically): contraction suffixes, space-prefixed letter
# runs, digit runs, and punctuation runs. This is the *pre-tokenizer*
# a BPE vocabulary trains over; subword counts from it track BPE token
# counts closely enough for corpus budgeting.
BPE_ISH_PATTERN = (r"'s|'t|'re|'ve|'m|'ll|'d"
                   r"| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+")


def subword_tokens(c: Column | str) -> Column:
    """BPE-ish subword pre-tokens (see BPE_ISH_PATTERN). JVM-side
    regexp_extract_all — no Python in the path."""
    col = F.col(c) if isinstance(c, str) else c
    return F.regexp_extract_all(col, F.lit(BPE_ISH_PATTERN), 0)


def token_hash48(tok: Column, salt: str = "") -> Column:
    """Deterministic 48-bit integer hash of a token: first 12 hex chars
    of md5. 48 bits keeps values positive in a signed 64-bit int and is
    plenty for minhash/simhash distinctness."""
    salted = F.concat(F.lit(f"{salt}:"), tok) if salt else tok
    return F.conv(F.substring(F.md5(salted), 1, 12), 16, 10).cast("bigint")


def stopword_hits(toks: Column, lang: str) -> Column:
    """Number of tokens that are stopwords of ``lang``."""
    words = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda x: F.array_contains(words, x)))


def lang_id(toks: Column) -> Column:
    """Heuristic language ID: argmax stopword-hit count over the seed
    lists, ties broken by LANG_PRIORITY order. A real pipeline would use
    char-n-gram profiles; the operator shape (score per language →
    argmax) is identical and stays fully vectorized."""
    scores = {lang: stopword_hits(toks, lang) for lang in LANG_PRIORITY}
    expr = F.lit(LANG_PRIORITY[-1])
    # Build the CASE chain in reverse so earlier languages win ties.
    for lang in reversed(LANG_PRIORITY[:-1]):
        others = [scores[o] for o in LANG_PRIORITY if o != lang]
        cond = scores[lang] >= F.greatest(*others) if len(others) > 1 \
            else scores[lang] >= others[0]
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def lang_id_oracle_sql(toks_expr: str) -> str:
    """DuckDB equivalent of lang_id over a token-list expression."""
    def hits(lang: str) -> str:
        lst = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
        return (f"len(list_filter({toks_expr}, "
                f"x -> list_contains([{lst}], x)))")

    expr = f"'{LANG_PRIORITY[-1]}'"
    for lang in reversed(LANG_PRIORITY[:-1]):
        others = [hits(o) for o in LANG_PRIORITY if o != lang]
        expr = (f"CASE WHEN {hits(lang)} >= greatest({', '.join(others)}) "
                f"THEN '{lang}' ELSE {expr} END")
    return expr


def punct_count(c: Column | str) -> Column:
    """Count of punctuation chars (explicit class, portable regex)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.length(col) - F.length(F.regexp_replace(col, r"[.,;:!?'\"()-]", ""))


def winnowing_fingerprints(df, id_col: str, text_col: str, k: int = 8,
                           window: int = 4):
    """Winnowing document fingerprints (the MOSS scheme): hash every
    k-char gram of the normalized text (rolling-hash family — here
    md5-derived per gram for engine-independence), then slide a
    ``window`` over the gram-hash sequence keeping each window's
    minimum. The selected set is a position-robust fingerprint:
    documents sharing any substring of length ≥ k + window - 1 share
    at least one fingerprint, so partial overlaps (quotations,
    boilerplate, plagiarism) are detectable by joining on fingerprint
    values — unlike a whole-document hash, which only catches exact
    duplicates.

    Formulated relationally — posexplode the gram positions to rows
    (whole-stage-codegen'd hashing) and take the window minimum with a
    sliding frame — instead of nested array lambdas: higher-order-
    function lambda bodies evaluate INTERPRETED and re-evaluate
    captured expressions per element (measured ~1 s/doc for the array
    formulation vs milliseconds for this one). One shuffle on the doc
    id. Documents shorter than k+window-1 chars keep their single
    minimum gram hash; documents under k chars yield no rows.

    Returns a DataFrame (id_col, fp) — distinct fingerprints per doc.
    """
    from pyspark.sql import Window

    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    n_grams = (F.length(norm) - (k - 1)).alias("__n_grams")
    base = df.select(F.col(id_col), norm.alias("__norm"), n_grams)
    positions = base.select(
        id_col, "__norm", "__n_grams",
        F.explode(F.when(F.col("__n_grams") >= 1,
                         F.sequence(F.lit(1), F.col("__n_grams")))
                  .otherwise(F.array().cast("array<int>"))).alias("__i"),
    )
    hashed = positions.select(
        id_col, "__n_grams", F.col("__i"),
        F.conv(F.substring(
            F.md5(F.substr(F.col("__norm"), F.col("__i"), F.lit(k))),
            1, 12), 16, 10).cast("bigint").alias("__h"),
    )
    w = (Window.partitionBy(id_col).orderBy("__i")
         .rowsBetween(0, window - 1))
    # windows starting past n_grams-window+1 are partial; they only
    # stand in when the doc has fewer than `window` grams (then the
    # single window at position 1 covers all grams)
    return (
        hashed.withColumn("__wmin", F.min("__h").over(w))
        .where((F.col("__i") <= F.col("__n_grams") - (window - 1))
               | ((F.col("__n_grams") < window) & (F.col("__i") == 1)))
        .select(F.col(id_col), F.col("__wmin").alias("fp"))
        .distinct()
    )


def doc_fingerprint(c: Column | str) -> Column:
    """Whole-document fingerprint: md5 of the whitespace-normalized,
    lowercased text. Exact-dedup key that survives formatting noise."""
    col = F.col(c) if isinstance(c, str) else c
    return F.md5(F.regexp_replace(F.lower(F.trim(col)), r"\s+", " "))
