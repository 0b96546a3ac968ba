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


# ---- BPE with learned merges ----------------------------------------------
#
# Classic byte-pair encoding on top of the BPE-ish pre-tokenizer above:
# train a deterministic merge table from corpus-wide pretoken
# frequencies, then apply the merges in rank order. Engine-portable by
# construction — training argmax ties break on (count DESC, lhs ASC,
# rhs ASC) over binary string order, and application is a chain of
# plain (non-regex) string replaces on a delimiter-encoded document,
# so a DuckDB recursive CTE replays both phases bit-identically (see
# queries/text_analysis.py::_sql_bpe_ctes).
#
# Scale shape: the corpus is touched ONCE (explode pretokens → groupBy
# count — one shuffle); training then runs over the *pretoken-frequency
# table*, which is vocabulary-sized (Heaps-law sublinear, and
# min_count-thresholded), collected driver-side exactly like k-means
# centroids (functions/similarity.py) — the structure SentencePiece/HF
# tokenizers use. Application is O(num_merges) codegen'd string
# replaces per document: embarrassingly parallel, zero shuffles.

BPE_NUM_MERGES = 32   # fixture-sized default; real vocabs use ~30k
BPE_SYM = "\x01"      # prefix marking the start of every symbol
BPE_TOK = "\x02"      # pretoken boundary (merges never cross it)
_BPE_PROT = "\x03"    # scratch char protecting token-leading spaces
BPE_END = "\x04"      # suffix terminating every symbol: without it a
#   merge's rhs can match a strict PREFIX of a longer symbol (pattern
#   SYM+lhs+SYM+rhs says nothing about what FOLLOWS rhs — e.g. merge
#   (' ','a') corrupting the symbol 'ab'), silently deviating from
#   greedy BPE. Found by hypothesis
#   (tests/test_properties2.py::test_bpe_apply_matches_python_reference,
#   r11); both engines' encodings carry the terminator now.


def strip_ctrl(c: Column | str) -> Column:
    """Drop control chars the BPE encoding reserves as delimiters
    (\\x00-\\x08) plus \\x0B (vertical tab — inside Java's \\s but not
    RE2's, so it must not survive to the whitespace-normalize step)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.regexp_replace(col, r"[\x00-\x08\x0B]", "")


def bpe_train(docs, text_col: str, num_merges: int = BPE_NUM_MERGES,
              min_count: int = 1) -> list[tuple[str, str]]:
    """Learn a BPE merge table from a corpus. Returns the ranked merge
    list [(lhs, rhs), ...], deterministic for a given corpus: pair
    counts are exact integers weighted by pretoken frequency, and ties
    break on (count DESC, lhs ASC, rhs ASC).

    One distributed pass computes pretoken frequencies; the iterative
    merge learning runs driver-side over that vocabulary table (see
    module comment for why that is the scale-correct split)."""
    wc = (
        docs.select(F.explode(subword_tokens(strip_ctrl(F.col(text_col))))
                    .alias("w"))
        .groupBy("w").count()
        .where(F.col("count") >= min_count)
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {
        tuple(r["w"]): r["count"] for r in wc}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for p in zip(syms, syms[1:]):
                counts[p] = counts.get(p, 0) + c
        if not counts:
            break
        lhs, rhs = min(counts, key=lambda p: (-counts[p], p[0], p[1]))
        merges.append((lhs, rhs))
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, c in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):     # greedy left-to-right, non-overlap
                if (i + 1 < len(syms) and syms[i] == lhs
                        and syms[i + 1] == rhs):
                    out.append(lhs + rhs)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def bpe_doc_encode(c: Column | str) -> Column:
    """Encode a document for merge application: every symbol prefixed
    with BPE_SYM, every pretoken prefixed with BPE_TOK, inter-token
    whitespace dropped (a pretoken's single leading space is itself a
    symbol, GPT-2 style), and every symbol SUFFIXED with BPE_END.
    Merges then apply as plain string replaces of
    SYM+lhs+END+SYM+rhs+END → SYM+lhs+rhs+END; BPE_TOK interrupts any
    cross-token match and BPE_END pins where a symbol ENDS (a bare
    prefix match cannot fire — see the BPE_END comment), so no
    lookaround is needed and Java regex / RE2 / plain replace all
    agree. All five steps are codegen'd string ops."""
    col = F.col(c) if isinstance(c, str) else c
    col = strip_ctrl(col)
    marked = F.regexp_replace(col, "(" + BPE_ISH_PATTERN + ")",
                              BPE_TOK + "$1")
    # Protect token-leading spaces, drop the rest of the whitespace
    # (chars the pre-tokenizer never captures), restore.
    protected = F.replace(marked, F.lit(BPE_TOK + " "), F.lit(_BPE_PROT))
    nospace = F.regexp_replace(protected, r"\s", "")
    restored = F.replace(nospace, F.lit(_BPE_PROT), F.lit(BPE_TOK + " "))
    return F.regexp_replace(restored, "([^" + BPE_TOK + "])",
                            BPE_SYM + "$1" + BPE_END)


def bpe_apply_merges(enc: Column, merges: list[tuple[str, str]]) -> Column:
    """Apply a learned merge table (in rank order) to a bpe_doc_encode'd
    document: one plain string replace per merge — left-to-right
    non-overlapping over END-delimited symbols, which IS the BPE merge
    semantics (the END terminator is what makes the plain replace
    exact; see BPE_END)."""
    out = enc
    for lhs, rhs in merges:
        out = F.replace(out,
                        F.lit(BPE_SYM + lhs + BPE_END
                              + BPE_SYM + rhs + BPE_END),
                        F.lit(BPE_SYM + lhs + rhs + BPE_END))
    return out


def count_char(col: Column, ch: str) -> Column:
    """Occurrences of a single char (symbol/token counting on encoded
    docs: symbols = count of BPE_SYM, pretokens = count of BPE_TOK)."""
    return F.length(col) - F.length(F.replace(col, F.lit(ch), F.lit("")))


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
