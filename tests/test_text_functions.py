"""Edge-case unit tests for the text expression library (empty/short
documents, whitespace runs) and the user-extensibility (UDF) surface."""

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from jcf_nb_migration_spark.functions import text as T


def _texts(spark, *texts):
    return spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                                 "id int, text string")


class TestTokens:
    def test_whitespace_runs_and_blank(self, spark):
        df = _texts(spark, "a  b\tc", "", "   ", "single")
        out = df.select("id", T.tokens("text").alias("t"),
                        T.token_count("text").alias("n")).collect()
        got = {r["id"]: (r["t"], r["n"]) for r in out}
        assert got[0] == (["a", "b", "c"], 3)
        assert got[1] == ([], 0)
        assert got[2] == ([], 0)
        assert got[3] == (["single"], 1)

    def test_shingles_short_docs(self, spark):
        df = _texts(spark, "a b c d", "a b c", "a b", "a", "")
        out = df.select(
            "id", T.word_shingles(T.tokens("text"), 3).alias("s")).collect()
        got = {r["id"]: r["s"] for r in out}
        assert got[0] == ["a b c", "b c d"]
        assert got[1] == ["a b c"]
        assert got[2] == []          # shorter than n → empty, not garbage
        assert got[3] == []
        assert got[4] == []


class TestLangId:
    def test_stopword_argmax_and_tie(self, spark):
        df = _texts(spark,
                    "the cat and the dog",    # en stopwords
                    "der hund und die katze", # de stopwords
                    "xyz qrs")                # no hits → tie → 'en' priority
        out = df.select("id", T.lang_id(T.tokens("text")).alias("l")).collect()
        got = {r["id"]: r["l"] for r in out}
        assert got == {0: "en", 1: "de", 2: "en"}


class TestFingerprint:
    def test_normalization_equivalence(self, spark):
        df = _texts(spark, "Hello   World", "  hello world ", "hello world")
        fps = [r["fp"] for r in
               df.select(T.doc_fingerprint("text").alias("fp")).collect()]
        assert fps[0] == fps[1] == fps[2]


class TestUdfSurface:
    def test_pandas_udf_registration(self, spark):
        """The engine exposes Spark's native extensibility: an
        Arrow-vectorized pandas UDF registered and used from SQL."""
        @F.pandas_udf(DoubleType())
        def discounted(price: pd.Series, disc: pd.Series) -> pd.Series:
            return price * (1.0 - disc)

        spark.udf.register("discounted", discounted)
        df = spark.createDataFrame([(100.0, 0.1), (50.0, 0.0)],
                                   "price double, disc double")
        df.createOrReplaceTempView("udf_in")
        got = [r["v"] for r in spark.sql(
            "SELECT discounted(price, disc) AS v FROM udf_in").collect()]
        assert got == [90.0, 50.0]


class TestSubwordTokens:
    def test_bpe_ish_pretokenization(self, spark):
        df = spark.createDataFrame(
            [("Hello world, it's 2026! café #42",)], "t string")
        toks = df.select(T.subword_tokens("t").alias("x")).head()[0]
        assert toks == ["Hello", " world", ",", " it", "'s", " 2026",
                        "!", " café", " #", "42"]

    def test_lossless_concat(self, spark):
        # on single-spaced text the pre-tokenizer partitions the input:
        # concatenating subwords round-trips it (runs of extra
        # whitespace are not captured — same as GPT-2's pre-tokenizer,
        # which handles them with lookahead branches we deliberately
        # omit for RE2 parity)
        df = spark.createDataFrame(
            [("a b c-d's 12x",), ("nospace",)], "t string")
        out = df.select(
            "t",
            F.concat_ws("", T.subword_tokens("t")).alias("joined"))
        for r in out.collect():
            assert r["joined"] == r["t"]


class TestBpe:
    def _apply_py(self, word, merges):
        """Reference greedy left-to-right merge application."""
        syms = list(word)
        for l, r in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    def test_train_known_corpus(self, spark):
        # Single pretoken per doc, no leading spaces: 'aab' x3, 'cd' x1.
        df = _texts(spark, "aab", "aab", "aab", "cd")
        merges = T.bpe_train(df, "text", num_merges=3)
        assert merges == [("a", "a"), ("aa", "b"), ("c", "d")]

    def test_apply_greedy_left_nonoverlap(self, spark):
        # 'aaaa' with merge (a,a): greedy left-to-right -> [aa, aa];
        # 'aaa' -> [aa, a]
        df = _texts(spark, "aaaa", "aaa")
        enc = df.select(
            "id", T.bpe_apply_merges(
                T.bpe_doc_encode("text"), [("a", "a")]).alias("e"))
        out = {r["id"]: r["n"] for r in enc.select(
            "id", T.count_char(F.col("e"), T.BPE_SYM).alias("n")).collect()}
        assert out == {0: 2, 1: 2}

    def test_apply_matches_python_reference(self, spark):
        texts = ["the cat sat on the mat", "a cataract, the theme!",
                 "it's the cat's hat  -- truly", "zzz", ""]
        df = _texts(spark, *texts)
        merges = T.bpe_train(df, "text", num_merges=12)
        got = {r["id"]: r["n"] for r in df.select(
            "id", T.count_char(
                T.bpe_apply_merges(T.bpe_doc_encode("text"), merges),
                T.BPE_SYM).alias("n")).collect()}
        import re
        pat = re.compile(r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+"
                         r"| ?[^\sA-Za-z0-9]+")
        for i, txt in enumerate(texts):
            expect = sum(len(self._apply_py(w, merges))
                         for w in pat.findall(txt))
            assert got[i] == expect, (i, txt)

    def test_merges_never_cross_pretoken_boundary(self, spark):
        # 'ab' then token boundary then 'ba': pair (b,a) exists only
        # inside 'aba', never across 'ab|ba' boundaries
        df = _texts(spark, "ab ba", "aba")
        merges = [("b", "a")]
        got = {r["id"]: r["n"] for r in df.select(
            "id", T.count_char(
                T.bpe_apply_merges(T.bpe_doc_encode("text"), merges),
                T.BPE_SYM).alias("n")).collect()}
        # 'ab ba' -> tokens 'ab', ' ba': [a,b] + [' ',b,a]->[' ',ba]
        assert got[0] == 4
        # 'aba' -> [a, ba]
        assert got[1] == 2

    def test_fertility_vs_pretokenizer(self, spark):
        """Learned merges must strictly improve on the pre-tokenizer
        approximation: real BPE counts sit between the pretoken count
        (lower bound) and the initial symbol count, and the merge table
        actually compresses the fixture corpus."""
        from jcf_nb_migration_spark.queries.text_analysis import \
            doc_bpe_stats
        from tests.conftest import SF_SMALL

        out = doc_bpe_stats(spark, SF_SMALL).collect()
        assert len(out) > 0
        assert all(r["n_pretokens"] <= r["n_subwords"]
                   <= r["n_init_symbols"] for r in out if r["n_pretokens"])
        # merges fired corpus-wide (strict compression in aggregate)
        assert (sum(r["n_subwords"] for r in out)
                < sum(r["n_init_symbols"] for r in out))

    def test_train_deterministic_across_partitionings(self, spark):
        df = _texts(spark, "the cat sat", "on the mat", "the end")
        m1 = T.bpe_train(df.repartition(7), "text", num_merges=6)
        m2 = T.bpe_train(df.coalesce(1), "text", num_merges=6)
        assert m1 == m2

    def test_train_exhausts_pairs_early(self, spark):
        # pretokens 'a' x1, ' a' x2: the only pair is (' ','a'); after
        # merging it every word is a single symbol, so training stops at
        # 1 merge even though 5 were requested
        df = _texts(spark, "a a a")
        assert T.bpe_train(df, "text", num_merges=5) == [(" ", "a")]


class TestPandasCosine:
    def test_pandas_topk_matches_fold_ranking(self, spark):
        from jcf_nb_migration_spark.functions import similarity as S
        from jcf_nb_migration_spark.registry import t
        from tests.conftest import SF_SMALL

        emb = t(spark, SF_SMALL, "embeddings")
        probe = emb.where(F.col("vec_id") == 0)
        jvm = S.brute_force_topk(emb, probe, k=10).collect()
        pnd = S.brute_force_topk_pandas(emb, probe, k=10).collect()
        assert [r["neighbor_id"] for r in jvm] == \
            [r["neighbor_id"] for r in pnd]
        for a, b in zip(jvm, pnd):
            assert abs(a["cos_sim"] - b["cos_sim"]) < 1e-9


class TestWinnowing:
    def test_shared_substring_shares_fingerprint(self, spark):
        shared = "the quick brown fox jumps over the lazy dog"
        df = spark.createDataFrame(
            [(1, f"AAAA {shared} BBBB"),
             (2, f"XXXXXX {shared} YYYY"),
             (3, "completely different content here entirely")],
            "doc_id long, text string")
        fps = T.winnowing_fingerprints(df, "doc_id", "text",
                                       k=8, window=4)
        by_doc = {}
        for r in fps.collect():
            by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
        # winnowing guarantee: any shared substring of length >=
        # k + window - 1 yields at least one common fingerprint
        assert by_doc[1] & by_doc[2]
        assert not (by_doc[1] & by_doc[3])

    def test_short_docs(self, spark):
        df = spark.createDataFrame(
            [(1, "tiny"),        # < k chars -> no fingerprints
             (2, "exactlyeig"),  # k <= len < k+window-1 -> 1 fp
             (3, "")],
            "doc_id long, text string")
        fps = T.winnowing_fingerprints(df, "doc_id", "text",
                                       k=8, window=4)
        by_doc = {}
        for r in fps.collect():
            by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
        assert 1 not in by_doc and 3 not in by_doc
        assert len(by_doc[2]) == 1


class TestContainmentPairs:
    def test_planted_containment_found_with_direction(self, spark):
        """A short doc fully embedded in a long one must surface with
        contain_small = 1.0 even though Jaccard is far below any LSH
        threshold (the asymmetric case MinHash misses)."""
        from jcf_nb_migration_spark.functions import dedup as D

        small = "quick brown foxes jump over the lazy sleeping dog"
        filler = " ".join(f"w{i} w{i} pad{i}" for i in range(30))
        big = filler + " " + small + " " + filler
        other = "completely different content about spark shuffles here"
        df = spark.createDataFrame(
            [(1, small), (2, big), (3, other)], "doc_id long, text string")
        rows = D.containment_pairs(df, "doc_id", "text",
                                   threshold=0.8, n=3).collect()
        got = {(r.id_a, r.id_b): (r.contain_a, r.contain_b) for r in rows}
        assert (1, 2) in got
        assert got[(1, 2)][0] == 1.0          # small fully contained
        assert got[(1, 2)][1] < 0.5           # big is NOT contained
        assert all(k == (1, 2) for k in got)  # no false pairs

    def test_prefix_filtering_is_lossless_on_fixture(self, spark):
        """Prefix filtering (index each doc's n − ceil(0.8n) + 1
        rarest shingles) must recover EXACTLY the brute-force
        containment pairs — the pigeonhole guarantee, checked against
        the all-shared-shingle-pairs baseline on the fixture."""
        from jcf_nb_migration_spark.functions import dedup as D
        from jcf_nb_migration_spark.registry import t
        from tests.conftest import SF_SMALL

        docs = t(spark, SF_SMALL, "documents")
        blocked = {(r.id_a, r.id_b)
                   for r in D.containment_pairs(
                       docs, "doc_id", "text", 0.8, 3).collect()}
        brute = {(r.id_a, r.id_b)
                 for r in D.containment_pairs(
                     docs, "doc_id", "text", 0.8, 3,
                     prefix_filter=False).collect()}
        assert blocked == brute and brute


class TestParagraphDedup:
    def test_reassembly_lossless_for_unique_docs(self, spark):
        """A document none of whose chunks duplicate anything must come
        back VERBATIM (token-normalized): chunk split + survivor pick
        + ordered reassembly is lossless when nothing is dropped."""
        from jcf_nb_migration_spark.queries.text_analysis import (
            paragraph_dedup)
        from jcf_nb_migration_spark.registry import t
        from tests.conftest import SF_SMALL

        out = paragraph_dedup(spark, SF_SMALL).collect()
        docs = {r["doc_id"]: r["text"]
                for r in t(spark, SF_SMALL, "documents").collect()}
        import re
        checked = 0
        for r in out:
            if r.n_dup_chunks == 0:
                norm = " ".join(re.split(r"\s+", docs[r.doc_id].strip()))
                assert r.kept_text == norm, r.doc_id
                checked += 1
        assert checked > 0  # the fixture has non-duplicated docs

    def test_planted_cross_doc_chunk_removed(self, spark):
        """A doc repeating another doc's chunk keeps its own unique
        chunks but loses the repeated one (C4 semantics)."""
        from jcf_nb_migration_spark.queries.text_analysis import PARA_W
        # build two docs sharing one exact 10-word chunk
        chunk = " ".join(f"w{i}" for i in range(PARA_W))
        d1 = chunk + " " + " ".join(f"a{i}" for i in range(PARA_W))
        d2 = chunk + " " + " ".join(f"b{i}" for i in range(PARA_W))
        df = spark.createDataFrame([(1, d1), (2, d2)],
                                   "doc_id long, text string")
        df.createOrReplaceTempView("___pd_tmp")
        # run the same logic inline via the engine function path
        from pyspark.sql import Window as W
        from pyspark.sql import functions as F
        from jcf_nb_migration_spark.functions import text as T
        d = df.select("doc_id", T.tokens("text").alias("w"))
        ch = d.select("doc_id", F.posexplode(F.expr(
            f"transform(sequence(0, (size(w)-1) div {PARA_W}),"
            f" i -> array_join(slice(w, i*{PARA_W}+1, {PARA_W}), ' '))"
        )).alias("chunk_idx", "chunk"))
        packed = F.col("doc_id") * 1000000 + F.col("chunk_idx")
        marked = ch.select(
            "doc_id", "chunk_idx", "chunk", packed.alias("p"),
            F.min(packed).over(W.partitionBy(F.md5("chunk"))).alias("fp"))
        kept = (marked.where(F.col("p") == F.col("fp"))
                .groupBy("doc_id").count().collect())
        got = {r["doc_id"]: r["count"] for r in kept}
        assert got[1] == 2      # keeps the shared chunk + its own
        assert got[2] == 1      # loses the shared chunk
