"""Persisted lexical serving index (io/lexical.py — VERDICT r7 item 2).

Pins the three claims the module makes:

1. Serve-path correctness: ``bm25_probe`` over the materialized index
   is row-identical to the ad-hoc scorer (``_bm25_frames``) on the same
   corpus, and appends keep that parity (probe(base ∪ batch) ≡
   probe(rebuild(base ∪ batch))).
2. Serve-path plan shape: the postings scan is BUCKET-PRUNED
   (SelectedBucketsCount in the FileScan) and the tok-keyed df groupBy
   introduces ZERO shuffle Exchange — the bucketed layout already
   satisfies the distribution; the only shuffle in the whole probe is
   the per-doc score groupBy.
3. Safety rails: replay-ledger idempotence, catalog/bucket-count
   validation on append and attach, identifier validation, and
   quote-safe LOCATION paths.
"""

import pytest
from pyspark.sql import functions as F

from jcf_nb_migration_spark.io.lexical import (
    bm25_probe,
    lexical_index_append,
    lexical_index_attach,
    lexical_index_build,
)
from jcf_nb_migration_spark.queries.retrieval_ops import (
    BM25_B,
    BM25_K1,
    BM25_TERMS,
    _bm25_frames,
)

TERMS = BM25_TERMS  # ("spark", "window", "merge")


def _toks(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, w array<string>")


def _corpus(spark, ids):
    """Deterministic mini-corpus: every doc mixes query terms and
    filler with id-dependent frequencies (so scores differ per doc);
    one doc in three is filler-only, one in seven is EMPTY (dl=0 —
    must still count toward N/avgdl)."""
    rows = []
    for i in ids:
        if i % 7 == 0:
            rows.append((i, []))
            continue
        w = ["filler%d" % i] * (1 + i % 5)
        if i % 3 != 0:
            w += ["spark"] * (1 + i % 3) + ["window"] * (i % 2)
            if i % 5 == 0:
                w += ["merge"]
        rows.append((i, w))
    return _toks(spark, rows)


def _probe_rows(spark, prefix, path, k=50):
    return [(r["doc_id"], r["n_terms_matched"], r["bm25"]) for r in
            bm25_probe(spark, prefix, path, TERMS,
                       BM25_K1, BM25_B, k=k).collect()]


def _adhoc_rows(toks, k=50):
    _, bm = _bm25_frames(toks)
    return [(r["doc_id"], r["n_terms_matched"], r["bm25"]) for r in
            bm.orderBy(F.desc("bm25"), "doc_id").limit(k).collect()]


def test_build_probe_matches_adhoc_scorer(spark, tmp_path):
    toks = _corpus(spark, range(30))
    path = str(tmp_path / "lex")
    lexical_index_build(toks, "lexti_base", path, num_buckets=8)
    assert _probe_rows(spark, "lexti_base", path) == _adhoc_rows(toks)


def test_append_probe_matches_rebuild(spark, tmp_path):
    base = _corpus(spark, range(20))
    batch = _corpus(spark, range(20, 32))
    path = str(tmp_path / "lex_app")
    lexical_index_build(base, "lexti_app", path, num_buckets=8)
    assert lexical_index_append(batch, "lexti_app", path,
                                num_buckets=8, batch_id=0) is True

    rb_path = str(tmp_path / "lex_rebuild")
    lexical_index_build(base.unionByName(batch), "lexti_rb", rb_path,
                        num_buckets=8)
    got = _probe_rows(spark, "lexti_app", path)
    assert got == _probe_rows(spark, "lexti_rb", rb_path)
    # and both equal the ad-hoc scorer over the union
    assert got == _adhoc_rows(base.unionByName(batch))


def test_append_replay_ledger_idempotent(spark, tmp_path):
    base = _corpus(spark, range(12))
    batch = _corpus(spark, range(12, 18))
    path = str(tmp_path / "lex_replay")
    lexical_index_build(base, "lexti_rp", path, num_buckets=8)
    assert lexical_index_append(batch, "lexti_rp", path,
                                num_buckets=8, batch_id=42) is True
    before = _probe_rows(spark, "lexti_rp", path)
    n_postings = spark.table("lexti_rp_postings").count()
    # replayed delivery: ledger skips, index bit-for-bit unchanged
    assert lexical_index_append(batch, "lexti_rp", path,
                                num_buckets=8, batch_id=42) is False
    assert spark.table("lexti_rp_postings").count() == n_postings
    assert _probe_rows(spark, "lexti_rp", path) == before


def test_probe_plan_bucket_pruned_no_tok_exchange(spark, tmp_path):
    lexical_index_build(_corpus(spark, range(40)), "lexti_plan",
                        str(tmp_path / "lex_plan"), num_buckets=8)
    post = (spark.table("lexti_plan_postings")
            .where(F.col("tok").isin(list(TERMS))))
    # the tok-keyed side alone: df groupBy on the bucket key — the
    # bucketed scan satisfies the distribution, NO shuffle anywhere
    dfreq = post.groupBy("tok").agg(
        F.countDistinct("doc_id").alias("df"))
    tok_plan = dfreq._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in tok_plan, tok_plan
    assert "SelectedBucketsCount" in tok_plan, tok_plan
    # ≤ |terms| of the 8 buckets are even listed
    import re
    m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", tok_plan)
    assert m and int(m.group(1)) <= len(TERMS) and m.group(2) == "8"

    # full probe: the ONLY shuffle is the per-doc score groupBy
    probe = bm25_probe(spark, "lexti_plan", str(tmp_path / "lex_plan"),
                       TERMS, BM25_K1, BM25_B, k=20)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "SelectedBucketsCount" in plan
    assert "CartesianProduct" not in plan


def test_attach_reregisters_on_disk_index(spark, tmp_path):
    toks = _corpus(spark, range(25))
    path = str(tmp_path / "lex_att")
    lexical_index_build(toks, "lexti_att", path, num_buckets=8)
    expect = _probe_rows(spark, "lexti_att", path)
    # simulate a fresh session: the in-memory catalog forgets the table
    spark.sql("DROP TABLE lexti_att_postings")
    lexical_index_attach(spark, "lexti_att", path, num_buckets=8)
    assert _probe_rows(spark, "lexti_att", path) == expect
    # and appends work after an attach (the fresh-session ingest path)
    assert lexical_index_append(_corpus(spark, range(25, 30)),
                                "lexti_att", path, num_buckets=8) is True


def test_attach_quote_in_path_is_escaped(spark, tmp_path):
    toks = _corpus(spark, range(10))
    path = str(tmp_path / "it's here")
    lexical_index_build(toks, "lexti_qt", path, num_buckets=4)
    expect = _probe_rows(spark, "lexti_qt", path)
    spark.sql("DROP TABLE lexti_qt_postings")
    lexical_index_attach(spark, "lexti_qt", path, num_buckets=4)
    assert _probe_rows(spark, "lexti_qt", path) == expect


def test_append_requires_catalog_table(spark, tmp_path):
    with pytest.raises(ValueError, match="not registered"):
        lexical_index_append(_corpus(spark, range(5)),
                             "lexti_ghost", str(tmp_path / "ghost"))


def test_append_bucket_count_mismatch_raises(spark, tmp_path):
    path = str(tmp_path / "lex_bkt")
    lexical_index_build(_corpus(spark, range(10)), "lexti_bkt", path,
                        num_buckets=8)
    with pytest.raises(ValueError, match="8 buckets"):
        lexical_index_append(_corpus(spark, range(10, 12)),
                             "lexti_bkt", path, num_buckets=4)


def test_attach_bucket_count_mismatch_raises(spark, tmp_path):
    path = str(tmp_path / "lex_bkt2")
    lexical_index_build(_corpus(spark, range(10)), "lexti_bkt2", path,
                        num_buckets=8)
    # table still registered: attach with the wrong count must refuse
    with pytest.raises(ValueError, match="buckets"):
        lexical_index_attach(spark, "lexti_bkt2", path, num_buckets=4)


def test_prefix_must_be_identifier(spark, tmp_path):
    bad = "x; DROP TABLE t"
    with pytest.raises(ValueError, match="identifier"):
        lexical_index_build(_corpus(spark, range(3)), bad,
                            str(tmp_path / "bad"))
    with pytest.raises(ValueError, match="identifier"):
        lexical_index_attach(spark, bad, str(tmp_path / "bad"))


def test_empty_docs_count_toward_stats(spark, tmp_path):
    """A dl=0 document has no postings but belongs in N and avgdl —
    dropping it would inflate every idf. The corpus helper plants one
    empty doc in seven; verify N via the stats sidecar."""
    import os
    toks = _corpus(spark, range(21))
    path = str(tmp_path / "lex_empty")
    lexical_index_build(toks, "lexti_emp", path, num_buckets=4)
    stats = spark.read.parquet(os.path.join(path, "stats"))
    assert stats.agg(F.sum("n_docs")).head()[0] == 21
    assert _probe_rows(spark, "lexti_emp", path) == _adhoc_rows(toks)


def test_compact_merges_files_and_preserves_probe(spark, tmp_path):
    """Streamed appends accrete one file per touched bucket per batch;
    lexical_index_compact must merge them back to ~one file per bucket
    WITHOUT changing any probe result (BM25 inputs are additive over
    postings/stats rows, so file layout is invisible) and without
    opening a new ledger epoch (a replayed old batch_id still skips)."""
    import os

    from jcf_nb_migration_spark.io.lexical import (
        POSTINGS_SUBDIR, lexical_index_compact)

    path = str(tmp_path / "lex_cmp")
    lexical_index_build(_corpus(spark, range(15)), "lexti_cmp", path,
                        num_buckets=4)
    for b in range(3):
        lexical_index_append(_corpus(spark, range(15 + 5 * b,
                                                  20 + 5 * b)),
                             "lexti_cmp", path, num_buckets=4,
                             batch_id=b)
    post_dir = os.path.join(path, POSTINGS_SUBDIR)
    n_before = sum(1 for f in os.listdir(post_dir)
                   if f.endswith(".parquet"))
    before = _probe_rows(spark, "lexti_cmp", path)

    n_after = lexical_index_compact(spark, "lexti_cmp", path,
                                    num_buckets=4)
    assert n_after <= 4 < n_before
    assert _probe_rows(spark, "lexti_cmp", path) == before
    # ledger epoch unchanged: replaying a committed batch still skips
    assert lexical_index_append(_corpus(spark, range(15, 20)),
                                "lexti_cmp", path, num_buckets=4,
                                batch_id=0) is False
    # and fresh appends keep working post-compact
    assert lexical_index_append(_corpus(spark, range(30, 34)),
                                "lexti_cmp", path, num_buckets=4,
                                batch_id=9) is True
    assert _probe_rows(spark, "lexti_cmp", path) == _adhoc_rows(
        _corpus(spark, range(15)).unionByName(
            _corpus(spark, range(15, 20))).unionByName(
            _corpus(spark, range(20, 25))).unionByName(
            _corpus(spark, range(25, 30))).unionByName(
            _corpus(spark, range(30, 34))))


def test_maintain_compacts_only_past_fragmentation_threshold(spark,
                                                             tmp_path):
    """The maintain gate is the scheduler hook: below the
    files-per-bucket threshold it is a metadata-only no-op; past it,
    one compaction runs and the gate goes quiet again."""
    from jcf_nb_migration_spark.io.lexical import lexical_index_maintain

    path = str(tmp_path / "lex_mnt")
    lexical_index_build(_corpus(spark, range(10)), "lexti_mnt", path,
                        num_buckets=4)
    # fresh build: 4 files, threshold 1/bucket -> no-op
    assert lexical_index_maintain(spark, "lexti_mnt", path,
                                  num_buckets=4,
                                  max_files_per_bucket=1) is False
    for b in range(4):  # fragment past 1 file/bucket
        lexical_index_append(_corpus(spark, range(10 + 3 * b,
                                                  13 + 3 * b)),
                             "lexti_mnt", path, num_buckets=4,
                             batch_id=b)
    before = _probe_rows(spark, "lexti_mnt", path)
    assert lexical_index_maintain(spark, "lexti_mnt", path,
                                  num_buckets=4,
                                  max_files_per_bucket=1) is True
    assert _probe_rows(spark, "lexti_mnt", path) == before
    # post-compact: quiet again
    assert lexical_index_maintain(spark, "lexti_mnt", path,
                                  num_buckets=4,
                                  max_files_per_bucket=1) is False


def test_probe_is_term_agnostic(spark, tmp_path):
    """Every other parity check uses the registry's fixed BM25_TERMS;
    this pins bm25_probe for an ARBITRARY term set against a pure-
    Python BM25 computed from first principles on the same corpus —
    the serving layer must not be accidentally specialized to the
    shipped query."""
    import math

    docs = {i: ["filler%d" % (i % 4)] * (1 + i % 3)
            + ["alpha"] * (i % 2) + (["beta"] if i % 3 == 0 else [])
            for i in range(12)}
    toks = _toks(spark, [(i, w) for i, w in docs.items()])
    path = str(tmp_path / "lex_terms")
    lexical_index_build(toks, "lexti_terms", path, num_buckets=4)
    terms = ("alpha", "beta")
    got = [(r["doc_id"], r["n_terms_matched"], r["bm25"]) for r in
           bm25_probe(spark, "lexti_terms", path, terms,
                      BM25_K1, BM25_B, k=20).collect()]

    n = len(docs)
    avgdl = sum(len(w) for w in docs.values()) / n
    df = {t: sum(1 for w in docs.values() if t in w) for t in terms}
    expect = []
    for i, w in docs.items():
        score, matched = 0.0, 0
        for t in terms:
            tf = w.count(t)
            if not tf:
                continue
            matched += 1
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            score += (idf * tf * (BM25_K1 + 1.0)
                      / (tf + BM25_K1 * (1.0 - BM25_B
                                         + BM25_B * len(w) / avgdl)))
        if matched:
            expect.append((i, matched, round(score, 9)))
    expect.sort(key=lambda r: (-r[2], r[0]))
    assert got == expect and len(got) > 0


def test_positional_index_phrase_probe_parity_and_plan(spark, tmp_path):
    """The positional layout's probe must be row-identical to the
    ad-hoc positional scan on the same corpus, and its scan must be
    BUCKET-PRUNED to the phrase's terms (≤2 of the buckets listed)."""
    import re

    from jcf_nb_migration_spark.io.lexical import (
        phrase_probe, positional_index_build)

    # corpus with controllable adjacencies: "alpha beta" appears
    # i%3 times in doc i, with filler between other occurrences
    rows = []
    for i in range(24):
        w = []
        for _ in range(i % 3):
            w += ["alpha", "beta"]
        w += ["alpha", "fill%d" % i, "beta"]  # non-adjacent pair
        rows.append((i, w))
    toks = _toks(spark, rows)
    path = str(tmp_path / "pos_idx")
    positional_index_build(toks, "positi_t", path, num_buckets=8)

    probe = phrase_probe(spark, "positi_t", path, ("alpha", "beta"),
                         k=50)
    got = [(r["doc_id"], r["n_occurrences"], r["first_pos"])
           for r in probe.collect()]
    # expected from first principles: i%3 adjacent occurrences, the
    # first at position 1 whenever any exist
    expect = sorted(((i, i % 3, 1) for i in range(24) if i % 3),
                    key=lambda r: (-r[1], r[0]))
    assert got == expect

    plan = probe._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"SelectedBucketsCount: (\d+) out of 8", plan)
    assert m and int(m.group(1)) <= 2, plan
    assert "CartesianProduct" not in plan


def test_positional_proximity_probe_matches_adhoc(spark, tmp_path):
    """proximity_probe over the positional index must equal the
    ad-hoc positional scan (proximity_ranked_docs' plan) on the same
    corpus — pinned against the registry query's own machinery by
    running both on identical token frames."""
    from jcf_nb_migration_spark.io.lexical import (
        positional_index_build, proximity_probe)

    rows = []
    for i in range(18):
        w = ["alpha"] + ["pad%d" % i] * (i % 7) + ["gamma"]
        if i % 2:
            w += ["alpha", "x", "gamma"]  # span-2 pair
        rows.append((i, w))
    toks = _toks(spark, rows)
    path = str(tmp_path / "pos_prox")
    positional_index_build(toks, "positi_px", path, num_buckets=4)
    got = [(r["doc_id"], r["n_pairs"], r["min_span"]) for r in
           proximity_probe(spark, "positi_px", path,
                           ("alpha", "gamma"), window=3, k=50)
           .collect()]

    # first principles: pairs with |pos diff| <= 3
    import itertools
    expect = []
    for i, w in rows:
        pa = [p + 1 for p, tk in enumerate(w) if tk == "alpha"]
        pg = [p + 1 for p, tk in enumerate(w) if tk == "gamma"]
        spans = [abs(x - y) for x, y in itertools.product(pa, pg)
                 if abs(x - y) <= 3]
        if spans:
            expect.append((i, len(spans), min(spans)))
    expect.sort(key=lambda r: (r[2], -r[1], r[0]))
    assert got == expect and len(got) > 0


def test_positional_attach_and_stale_location_guard(spark, tmp_path):
    """Fresh-session serving of the positional layout: attach
    re-registers the on-disk index (probes work), and a probe against
    a DIFFERENT path than the registered one refuses instead of
    silently serving the wrong index."""
    from jcf_nb_migration_spark.io.lexical import (
        phrase_probe, positional_index_append, positional_index_attach,
        positional_index_build)

    rows = [(i, ["alpha", "beta", "w%d" % i]) for i in range(10)]
    path = str(tmp_path / "pos_att")
    positional_index_build(_toks(spark, rows), "positi_att", path,
                           num_buckets=4)
    expect = [(r["doc_id"], r["n_occurrences"]) for r in
              phrase_probe(spark, "positi_att", path,
                           ("alpha", "beta"), k=20).collect()]
    spark.sql("DROP TABLE positi_att_positions")
    positional_index_attach(spark, "positi_att", path, num_buckets=4)
    got = [(r["doc_id"], r["n_occurrences"]) for r in
           phrase_probe(spark, "positi_att", path,
                        ("alpha", "beta"), k=20).collect()]
    assert got == expect and len(got) == 10
    # appends work post-attach (fresh-session ingest)
    assert positional_index_append(
        _toks(spark, [(10, ["alpha", "beta"])]), "positi_att", path,
        num_buckets=4) is True
    # probing the registered prefix against a DIFFERENT path refuses
    with pytest.raises(ValueError, match="registered at"):
        phrase_probe(spark, "positi_att", str(tmp_path / "elsewhere"),
                     ("alpha", "beta"))
    # attach with the wrong bucket count refuses via the on-disk meta
    spark.sql("DROP TABLE positi_att_positions")
    with pytest.raises(ValueError, match="built with 4 buckets"):
        positional_index_attach(spark, "positi_att", path,
                                num_buckets=8)


def test_positional_rebuild_clears_ledger(spark, tmp_path):
    """A rebuild must clear the append ledger: stale batch markers
    would otherwise skip replayed batches after the rebuild, silently
    losing documents from the index."""
    from jcf_nb_migration_spark.io.lexical import (
        phrase_probe, positional_index_append, positional_index_build)

    path = str(tmp_path / "pos_rb")
    batch = _toks(spark, [(50, ["alpha", "beta"])])
    positional_index_build(
        _toks(spark, [(i, ["alpha", "x"]) for i in range(5)]),
        "positi_rb", path, num_buckets=4)
    assert positional_index_append(batch, "positi_rb", path,
                                   num_buckets=4, batch_id=0) is True
    # rebuild, then replay the SAME batch_id — it must land again
    positional_index_build(
        _toks(spark, [(i, ["alpha", "x"]) for i in range(5)]),
        "positi_rb", path, num_buckets=4)
    assert positional_index_append(batch, "positi_rb", path,
                                   num_buckets=4, batch_id=0) is True
    hits = phrase_probe(spark, "positi_rb", path,
                        ("alpha", "beta"), k=5).collect()
    assert [r["doc_id"] for r in hits] == [50]


def test_maintain_validates_meta_and_path(spark, tmp_path):
    from jcf_nb_migration_spark.io.lexical import lexical_index_maintain

    path = str(tmp_path / "lex_mv")
    lexical_index_build(_corpus(spark, range(8)), "lexti_mv", path,
                        num_buckets=4)
    with pytest.raises(ValueError, match="built with 4 buckets"):
        lexical_index_maintain(spark, "lexti_mv", path, num_buckets=8)
    with pytest.raises(ValueError, match="no postings directory|built"):
        lexical_index_maintain(spark, "lexti_mv",
                               str(tmp_path / "nope"), num_buckets=4)


def test_filtered_probe_gates_before_topk(spark, tmp_path):
    """Metadata-filtered serving semantics: global stats, filter gates
    the result BEFORE the top-k cut (k allowed docs come back, not
    k-minus-filtered), and scores equal the unfiltered probe's for
    the surviving docs."""
    toks = _corpus(spark, range(30))
    path = str(tmp_path / "lex_filt")
    lexical_index_build(toks, "lexti_flt", path, num_buckets=8)
    unfiltered = {r[0]: r for r in _probe_rows(spark, "lexti_flt", path)}
    allowed = spark.createDataFrame(
        [(i,) for i in range(30) if i % 2 == 0], "doc_id bigint")
    got = [(r["doc_id"], r["n_terms_matched"], r["bm25"]) for r in
           bm25_probe(spark, "lexti_flt", path, TERMS,
                      BM25_K1, BM25_B, k=5, allowed=allowed).collect()]
    assert len(got) == 5
    assert all(d % 2 == 0 for d, _, _ in got)
    # scores are the GLOBAL ones, order preserved within allowed
    assert got == sorted(
        (unfiltered[d] for d in unfiltered if d % 2 == 0),
        key=lambda r: (-r[2], r[0]))[:5]


def test_write_paths_refuse_stale_registration(spark, tmp_path):
    """Write-side location guard (r9 review fix): with lexti_stale
    registered at path A, appending to or compacting a DIFFERENT path
    under the same prefix must refuse instead of mixing indexes (the
    compact case would destructively overwrite the target path)."""
    from jcf_nb_migration_spark.io.lexical import lexical_index_compact

    a = str(tmp_path / "lex_a")
    b = str(tmp_path / "lex_b")
    lexical_index_build(_corpus(spark, range(8)), "lexti_stale", a,
                        num_buckets=4)
    with pytest.raises(ValueError, match="registered at"):
        lexical_index_append(_corpus(spark, range(8, 10)),
                             "lexti_stale", b, num_buckets=4)
    with pytest.raises(ValueError, match="registered at"):
        lexical_index_compact(spark, "lexti_stale", b, num_buckets=4)


def test_phrase_probe_n_term(spark, tmp_path):
    """The generalized N-term phrase probe (r9): a three-term phrase
    served from the positional index, pinned against first-principles
    occurrence counts; single-term phrases refuse."""
    from jcf_nb_migration_spark.io.lexical import (
        phrase_probe, positional_index_build)

    rows = []
    for i in range(20):
        w = []
        for _ in range(i % 4):
            w += ["alpha", "beta", "gamma"]       # full-phrase hits
        w += ["alpha", "beta", "x", "gamma"]       # 2-term prefix only
        w += ["alpha", "gamma", "beta"]            # scrambled
        rows.append((i, w))
    toks = _toks(spark, rows)
    path = str(tmp_path / "pos_n")
    positional_index_build(toks, "positi_n", path, num_buckets=8)

    got = [(r["doc_id"], r["n_occurrences"], r["first_pos"]) for r in
           phrase_probe(spark, "positi_n", path,
                        ("alpha", "beta", "gamma"), k=50).collect()]
    expect = sorted(((i, i % 4, 1) for i in range(20) if i % 4),
                    key=lambda r: (-r[1], r[0]))
    assert got == expect and len(got) > 0

    # the 2-term prefix still matches every doc (the i%4==0 ones too)
    got2 = phrase_probe(spark, "positi_n", path,
                        ("alpha", "beta"), k=50).collect()
    assert len(got2) == 20

    import pytest as _pytest
    with _pytest.raises(ValueError, match="at least two"):
        phrase_probe(spark, "positi_n", path, ("alpha",))


def test_positional_probes_filtered_gate_before_topk(spark, tmp_path):
    """Metadata-filtered positional serving (r9): the allowed gate
    semi-joins BEFORE the top-k cut for both probes, counts stay the
    GLOBAL document facts for the surviving docs."""
    from jcf_nb_migration_spark.io.lexical import (
        phrase_probe, positional_index_build, proximity_probe)

    rows = [(i, ["alpha", "beta"] * (1 + i % 3) + ["pad"])
            for i in range(20)]
    toks = _toks(spark, rows)
    path = str(tmp_path / "pos_filt")
    positional_index_build(toks, "positi_flt", path, num_buckets=4)
    allowed = spark.createDataFrame(
        [(i,) for i in range(20) if i % 2 == 0], "doc_id bigint")

    unf = {r["doc_id"]: (r["n_occurrences"], r["first_pos"]) for r in
           phrase_probe(spark, "positi_flt", path, ("alpha", "beta"),
                        k=50).collect()}
    got = [(r["doc_id"], r["n_occurrences"], r["first_pos"]) for r in
           phrase_probe(spark, "positi_flt", path, ("alpha", "beta"),
                        k=5, allowed=allowed).collect()]
    assert len(got) == 5 and all(d % 2 == 0 for d, _, _ in got)
    assert all((n, p) == unf[d] for d, n, p in got)

    prox = proximity_probe(spark, "positi_flt", path,
                           ("alpha", "beta"), window=2, k=5,
                           allowed=allowed).collect()
    assert len(prox) == 5
    assert all(r["doc_id"] % 2 == 0 for r in prox)


def test_positional_compact_and_maintain(spark, tmp_path):
    """positional_index_compact merges streamed bucket files without
    changing any probe result; the maintain gate fires only past the
    fragmentation threshold (the positional twin of the lexical
    pins)."""
    import os

    from jcf_nb_migration_spark.io.lexical import (
        POSITIONS_SUBDIR, phrase_probe, positional_index_append,
        positional_index_build, positional_index_compact,
        positional_index_maintain)

    rows = [(i, ["alpha", "beta"] * (1 + i % 2)) for i in range(10)]
    path = str(tmp_path / "pos_cmp")
    positional_index_build(_toks(spark, rows), "positi_cmp", path,
                           num_buckets=4)
    for b in range(3):
        positional_index_append(
            _toks(spark, [(20 + b, ["alpha", "beta"])]),
            "positi_cmp", path, num_buckets=4, batch_id=b)
    pos_dir = os.path.join(path, POSITIONS_SUBDIR)
    n_before = sum(1 for f in os.listdir(pos_dir)
                   if f.endswith(".parquet"))
    before = [(r["doc_id"], r["n_occurrences"]) for r in
              phrase_probe(spark, "positi_cmp", path,
                           ("alpha", "beta"), k=50).collect()]
    n_after = positional_index_compact(spark, "positi_cmp", path,
                                       num_buckets=4)
    assert n_after <= 4 < n_before
    got = [(r["doc_id"], r["n_occurrences"]) for r in
           phrase_probe(spark, "positi_cmp", path,
                        ("alpha", "beta"), k=50).collect()]
    assert got == before
    # ledger epoch unchanged; maintain quiet post-compact
    assert positional_index_append(
        _toks(spark, [(20, ["alpha", "beta"])]), "positi_cmp", path,
        num_buckets=4, batch_id=0) is False
    assert positional_index_maintain(spark, "positi_cmp", path,
                                     num_buckets=4,
                                     max_files_per_bucket=1) is False


def test_bm25_probe_refuses_stale_registration(spark, tmp_path):
    """ADVICE r9 (medium): bm25_probe mixes catalog postings with
    path-side stats (N/avgdl) — with lexti_bmstale registered at path
    A, probing path B must refuse instead of scoring A's postings
    with B's statistics (the split-brain the attach error documents).
    Regression guard: the other three probes already had this check;
    bm25_probe was the one serving entry point without it."""
    a = str(tmp_path / "lex_bm_a")
    b = str(tmp_path / "lex_bm_b")
    lexical_index_build(_corpus(spark, range(8)), "lexti_bmstale", a,
                        num_buckets=4)
    # sanity: probing the registered path works
    assert bm25_probe(spark, "lexti_bmstale", a, TERMS,
                      BM25_K1, BM25_B, k=5).count() > 0
    with pytest.raises(ValueError, match="registered at"):
        bm25_probe(spark, "lexti_bmstale", b, TERMS, BM25_K1, BM25_B)


# --- r10: lazy deletion (tombstones) + vacuum -------------------------


def test_delete_excludes_results_keeps_stats(spark, tmp_path):
    """Lucene's delete-then-merge scoring: tombstoned docs vanish from
    results IMMEDIATELY, while surviving docs keep the exact scores
    they had before the delete (df/N/avgdl still count the deleted
    docs until vacuum). Postings files are untouched — deletion is a
    sidecar write, not a rewrite."""
    import os as _os

    from jcf_nb_migration_spark.io.lexical import (POSTINGS_SUBDIR,
                                                   lexical_index_delete)

    path = str(tmp_path / "lex_tomb")
    lexical_index_build(_corpus(spark, range(30)), "lexti_tomb", path,
                        num_buckets=4)
    before = _probe_rows(spark, "lexti_tomb", path, k=30)
    assert len(before) > 4
    victims = [before[0][0], before[2][0]]
    files_before = sorted(_os.listdir(_os.path.join(path,
                                                    POSTINGS_SUBDIR)))
    assert lexical_index_delete(spark, "lexti_tomb", path, victims,
                                num_buckets=4) is True
    after = _probe_rows(spark, "lexti_tomb", path, k=30)
    assert sorted(_os.listdir(_os.path.join(path, POSTINGS_SUBDIR))) \
        == files_before  # lazy: no postings rewrite
    assert [r[0] for r in after] == \
        [r[0] for r in before if r[0] not in victims]
    kept = {r[0]: r for r in before}
    for row in after:
        assert row == kept[row[0]]  # scores bit-identical pre-vacuum
    # idempotent replay under a ledgered batch id
    assert lexical_index_delete(spark, "lexti_tomb", path, victims,
                                num_buckets=4, batch_id=1) is True
    assert lexical_index_delete(spark, "lexti_tomb", path, victims,
                                num_buckets=4, batch_id=1) is False
    # validation: non-int ids, empty list, stale registration
    with pytest.raises(TypeError, match="integers"):
        lexical_index_delete(spark, "lexti_tomb", path, [1.5],
                             num_buckets=4)
    assert lexical_index_delete(spark, "lexti_tomb", path, [],
                                num_buckets=4) is False
    with pytest.raises(ValueError, match="registered at"):
        lexical_index_delete(spark, "lexti_tomb",
                             str(tmp_path / "elsewhere"), [3],
                             num_buckets=4)


def test_vacuum_matches_rebuild_without_deleted(spark, tmp_path):
    """Physical reclaim: after vacuum the probe scores EXACTLY as a
    fresh build over the surviving corpus (stats reconciled from the
    dropped postings), tombstones are cleared, and the reclaimed
    counts are reported. Victims are postings-bearing docs (the
    reconcilable case; the empty-doc caveat is pinned below)."""
    import os as _os

    from jcf_nb_migration_spark.io.lexical import (TOMBSTONES_SUBDIR,
                                                   lexical_index_delete,
                                                   lexical_index_vacuum)

    ids = range(30)
    victims = [1, 2, 9]  # none ≡ 0 (mod 7): all have postings
    path = str(tmp_path / "lex_vac")
    lexical_index_build(_corpus(spark, ids), "lexti_vac", path,
                        num_buckets=4)
    lexical_index_delete(spark, "lexti_vac", path, victims,
                         num_buckets=4)
    expect_postings = (spark.table("lexti_vac_postings")
                       .where(F.col("doc_id").isin(victims)).count())
    out = lexical_index_vacuum(spark, "lexti_vac", path, num_buckets=4)
    assert out["reclaimed_docs"] == len(victims)
    assert out["reclaimed_postings"] == expect_postings > 0
    assert not _os.path.isdir(_os.path.join(path, TOMBSTONES_SUBDIR))
    rb_path = str(tmp_path / "lex_vac_rb")
    lexical_index_build(
        _corpus(spark, [i for i in ids if i not in victims]),
        "lexti_vac_rb", rb_path, num_buckets=4)
    got = _probe_rows(spark, "lexti_vac", path, k=30)
    expect = _probe_rows(spark, "lexti_vac_rb", rb_path, k=30)
    assert got == expect and len(got) > 0
    # vacuum with no tombstones is a no-op
    assert lexical_index_vacuum(spark, "lexti_vac", path,
                                num_buckets=4) == {
        "reclaimed_docs": 0, "reclaimed_postings": 0}


def test_vacuum_empty_doc_caveat(spark, tmp_path):
    """A zero-token document has no postings to reconcile from: the
    vacuum reports 0 reclaimed docs and n_docs keeps its +1 (the
    documented caveat — only the avgdl denominator is off, and the doc
    can never match a query)."""
    import os as _os

    from jcf_nb_migration_spark.io.lexical import (STATS_SUBDIR,
                                                   lexical_index_delete,
                                                   lexical_index_vacuum)

    path = str(tmp_path / "lex_vace")
    lexical_index_build(_corpus(spark, range(15)), "lexti_vace", path,
                        num_buckets=4)
    stats0 = spark.read.parquet(
        _os.path.join(path, STATS_SUBDIR)).agg(
        F.sum("n_docs")).head()[0]
    lexical_index_delete(spark, "lexti_vace", path, [0, 7],
                         num_buckets=4)  # both ≡ 0 (mod 7): empty
    out = lexical_index_vacuum(spark, "lexti_vace", path,
                               num_buckets=4)
    assert out == {"reclaimed_docs": 0, "reclaimed_postings": 0}
    stats1 = spark.read.parquet(
        _os.path.join(path, STATS_SUBDIR)).agg(
        F.sum("n_docs")).head()[0]
    assert stats1 == stats0  # +1s survive until rebuild, loudly docd


def test_positional_delete_excludes_phrase_and_proximity(spark,
                                                         tmp_path):
    """The positional layout shares the tombstone semantics: deleted
    docs vanish from phrase and proximity results immediately."""
    from jcf_nb_migration_spark.io.lexical import (
        phrase_probe, positional_index_build, positional_index_delete,
        proximity_probe)

    rows = [(i, ["alpha", "beta", "gap", "alpha", "beta"])
            for i in range(8)]
    path = str(tmp_path / "pos_tomb")
    positional_index_build(_toks(spark, rows), "positi_tomb", path,
                           num_buckets=4)
    assert positional_index_delete(spark, "positi_tomb", path, [2, 5],
                                   num_buckets=4) is True
    ph = [r["doc_id"] for r in
          phrase_probe(spark, "positi_tomb", path, ("alpha", "beta"),
                       k=20).collect()]
    px = [r["doc_id"] for r in
          proximity_probe(spark, "positi_tomb", path,
                          ("alpha", "beta"), window=3, k=20).collect()]
    assert sorted(ph) == [0, 1, 3, 4, 6, 7]
    assert sorted(px) == [0, 1, 3, 4, 6, 7]


def test_maintain_vacuums_past_deletion_debt(spark, tmp_path):
    """lexical_index_maintain's second trigger (r10): tombstones past
    max_deleted_fraction of the corpus fire a vacuum (Lucene's
    merge-on-deletes policy); below the threshold, no reorganization
    runs and lazy scoring stays in force."""
    import os as _os

    from jcf_nb_migration_spark.io.lexical import (
        TOMBSTONES_SUBDIR, lexical_index_delete, lexical_index_maintain)

    path = str(tmp_path / "lex_mvac")
    lexical_index_build(_corpus(spark, range(20)), "lexti_mvac", path,
                        num_buckets=4)
    lexical_index_delete(spark, "lexti_mvac", path, [1, 2],
                         num_buckets=4)  # 10% < 20% threshold
    assert lexical_index_maintain(spark, "lexti_mvac", path,
                                  num_buckets=4) is False
    assert _os.path.isdir(_os.path.join(path, TOMBSTONES_SUBDIR))
    lexical_index_delete(spark, "lexti_mvac", path, [3, 4, 5],
                         num_buckets=4)  # 25% > threshold
    assert lexical_index_maintain(spark, "lexti_mvac", path,
                                  num_buckets=4) is True
    assert not _os.path.isdir(_os.path.join(path, TOMBSTONES_SUBDIR))
    # post-vacuum scores == fresh build over survivors
    rb = str(tmp_path / "lex_mvac_rb")
    lexical_index_build(
        _corpus(spark, [i for i in range(20) if i not in (1, 2, 3,
                                                          4, 5)]),
        "lexti_mvac_rb", rb, num_buckets=4)
    assert _probe_rows(spark, "lexti_mvac", path) == \
        _probe_rows(spark, "lexti_mvac_rb", rb)


def test_positional_vacuum_matches_rebuild(spark, tmp_path):
    """positional_index_vacuum: after reclaim, phrase hits equal a
    fresh build without the deleted docs, tombstones are cleared, and
    reclaimed counts are exact (positions carry no stats — parity is
    unconditional, including for empty docs)."""
    import os as _os

    from jcf_nb_migration_spark.io.lexical import (
        TOMBSTONES_SUBDIR, phrase_probe, positional_index_build,
        positional_index_delete, positional_index_vacuum)

    rows = [(i, ["alpha", "beta", "w%d" % i, "alpha", "beta"])
            for i in range(10)]
    path = str(tmp_path / "pos_vac")
    positional_index_build(_toks(spark, rows), "positi_vac", path,
                           num_buckets=4)
    positional_index_delete(spark, "positi_vac", path, [3, 8],
                            num_buckets=4)
    out = positional_index_vacuum(spark, "positi_vac", path,
                                  num_buckets=4)
    assert out["reclaimed_docs"] == 2
    assert out["reclaimed_positions"] == 10  # 5 tokens x 2 docs
    assert not _os.path.isdir(_os.path.join(path, TOMBSTONES_SUBDIR))
    rb = str(tmp_path / "pos_vac_rb")
    positional_index_build(
        _toks(spark, [r for r in rows if r[0] not in (3, 8)]),
        "positi_vac_rb", rb, num_buckets=4)
    got = [(r["doc_id"], r["n_occurrences"]) for r in
           phrase_probe(spark, "positi_vac", path, ("alpha", "beta"),
                        k=20).collect()]
    expect = [(r["doc_id"], r["n_occurrences"]) for r in
              phrase_probe(spark, "positi_vac_rb", rb,
                           ("alpha", "beta"), k=20).collect()]
    assert got == expect and len(got) == 8
    assert positional_index_vacuum(spark, "positi_vac", path,
                                   num_buckets=4) == {
        "reclaimed_docs": 0, "reclaimed_positions": 0}


def test_batch_probe_single_query_parity_and_plan(spark, tmp_path):
    """bm25_batch_probe (r10): a batch containing one query returns
    exactly bm25_probe's rows for that query; a two-query batch keeps
    per-query results independent (df shared, scores per query) and
    respects tombstones. Plan: the postings scan is bucket-pruned once
    for the whole batch and the tok-keyed df groupBy has ZERO
    Exchange, as in the single probe."""
    from jcf_nb_migration_spark.io.lexical import (bm25_batch_probe,
                                                   lexical_index_delete)

    path = str(tmp_path / "lex_batch")
    lexical_index_build(_corpus(spark, range(30)), "lexti_bat", path,
                        num_buckets=8)
    queries = spark.createDataFrame(
        [(7, w) for w in TERMS], "query_id bigint, tok string")
    got = [(r["doc_id"], r["n_terms_matched"], r["bm25"]) for r in
           bm25_batch_probe(spark, "lexti_bat", path, queries,
                            BM25_K1, BM25_B, k=50).collect()]
    assert got == _probe_rows(spark, "lexti_bat", path) and got
    # two queries: each query's block equals its own single probe
    q2 = spark.createDataFrame(
        [(0, w) for w in TERMS] + [(1, "filler4"), (1, "filler8")],
        "query_id bigint, tok string")
    out = bm25_batch_probe(spark, "lexti_bat", path, q2,
                           BM25_K1, BM25_B, k=50)
    rows = out.collect()
    blk0 = [(r["doc_id"], r["n_terms_matched"], r["bm25"])
            for r in rows if r["query_id"] == 0]
    blk1 = [r["doc_id"] for r in rows if r["query_id"] == 1]
    assert blk0 == got and len(blk1) > 0
    # plan: ≤ |batch terms| buckets listed once; df side shuffle-free
    post = (spark.table("lexti_bat_postings")
            .where(F.col("tok").isin(
                [r["tok"] for r in q2.select("tok").distinct()
                 .collect()])))
    dfreq = post.groupBy("tok").agg(
        F.countDistinct("doc_id").alias("df"))
    plan = dfreq._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan
    assert "SelectedBucketsCount" in plan, plan
    # tombstones apply to every query in the batch
    victim = blk1[0]
    lexical_index_delete(spark, "lexti_bat", path, [victim],
                         num_buckets=8)
    after = bm25_batch_probe(spark, "lexti_bat", path, q2,
                             BM25_K1, BM25_B, k=50).collect()
    assert victim not in {r["doc_id"] for r in after}
    # empty batch refuses
    empty = spark.createDataFrame([], "query_id bigint, tok string")
    with pytest.raises(ValueError, match="at least one term"):
        bm25_batch_probe(spark, "lexti_bat", path, empty,
                         BM25_K1, BM25_B)


def test_filtered_probe_composes_with_tombstones(spark, tmp_path):
    """The two serve-time gates stack: metadata-filtered search
    (allowed semi-join) AND lazy deletion (tombstone anti-join) both
    apply before the top-k cut — a tombstoned doc never surfaces even
    when the metadata filter allows it, and scores stay global-stat
    exact."""
    from jcf_nb_migration_spark.io.lexical import lexical_index_delete

    path = str(tmp_path / "lex_fltomb")
    lexical_index_build(_corpus(spark, range(30)), "lexti_ft", path,
                        num_buckets=4)
    evens = spark.createDataFrame([(i,) for i in range(0, 30, 2)],
                                  "doc_id bigint")
    base = [(r["doc_id"], r["bm25"]) for r in
            bm25_probe(spark, "lexti_ft", path, TERMS, BM25_K1,
                       BM25_B, k=30, allowed=evens).collect()]
    assert base and all(d % 2 == 0 for d, _ in base)
    victim = base[0][0]
    lexical_index_delete(spark, "lexti_ft", path, [victim],
                         num_buckets=4)
    after = [(r["doc_id"], r["bm25"]) for r in
             bm25_probe(spark, "lexti_ft", path, TERMS, BM25_K1,
                        BM25_B, k=30, allowed=evens).collect()]
    assert after == [r for r in base if r[0] != victim]
