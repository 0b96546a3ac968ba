"""Commit points (snapshots) on the lexical serving index — Lucene's
SnapshotDeletionPolicy analog (io/lexical.py snapshot section): a
snapshot survives appends, deletes, compactions, and vacuums, restores
bit-identical probe results, and retention reclaims exactly the
history no kept snapshot references."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from jcf_nb_migration_spark.functions import text as T
from jcf_nb_migration_spark.io.lexical import (
    HISTORY_SUBDIR,
    bm25_probe,
    lexical_index_append,
    lexical_index_build,
    lexical_index_delete,
    lexical_index_restore,
    lexical_index_snapshot,
    lexical_index_snapshots,
    lexical_index_vacuum,
    lexical_snapshot_vacuum,
)

TERMS = ("spark", "window", "merge")
K1, B = 1.2, 0.75

BASE_DOCS = [
    (1, "spark window merge alpha"),
    (2, "spark spark window beta"),
    (3, "merge merge merge gamma"),
    (4, "window window spark"),
    (5, "alpha beta gamma"),
    (6, "spark merge"),
]
NEW_DOCS = [
    (7, "window merge spark spark"),
    (8, "spark beta"),
]


def _toks(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return df.select("doc_id", T.tokens("text").alias("w"))


def _probe(spark, prefix, path):
    return sorted(
        (r["doc_id"], r["n_terms_matched"], r["bm25"])
        for r in bm25_probe(spark, prefix, path, TERMS, K1, B,
                            k=20).collect())


def _mk(tag):
    return os.path.join(tempfile.mkdtemp(prefix=f"lexsnap_{tag}_"),
                        "idx")


def test_snapshot_restore_across_append_delete_vacuum(spark):
    path = _mk("life")
    prefix = "snaplife"
    lexical_index_build(_toks(spark, BASE_DOCS), prefix, path,
                        num_buckets=4)
    s0 = lexical_index_snapshot(spark, prefix, path, num_buckets=4,
                                note="post-build")
    probe_s0 = _probe(spark, prefix, path)

    assert lexical_index_append(_toks(spark, NEW_DOCS), prefix, path,
                                num_buckets=4, batch_id="b1")
    s1 = lexical_index_snapshot(spark, prefix, path, num_buckets=4,
                                note="post-append")
    probe_s1 = _probe(spark, prefix, path)
    assert probe_s1 != probe_s0  # the append changed scoring state

    # destructive maintenance: delete two docs, physically reclaim
    lexical_index_delete(spark, prefix, path, [2, 7], num_buckets=4,
                         batch_id="d1")
    stats = lexical_index_vacuum(spark, prefix, path, num_buckets=4)
    assert stats["reclaimed_docs"] == 2
    probe_live = _probe(spark, prefix, path)

    # post-vacuum state == fresh build over the surviving corpus
    ref_path = _mk("ref")
    survivors = [d for d in BASE_DOCS + NEW_DOCS if d[0] not in (2, 7)]
    lexical_index_build(_toks(spark, survivors), "snapref", ref_path,
                        num_buckets=4)
    assert probe_live == _probe(spark, "snapref", ref_path)

    # vacuum rewrote postings + stats + tombstones, yet both commit
    # points restore bit-identical probes from _history
    assert os.path.isdir(os.path.join(path, HISTORY_SUBDIR))
    moves = lexical_index_restore(spark, prefix, path, s0,
                                  num_buckets=4)
    assert moves["postings"]["restored"] > 0
    assert _probe(spark, prefix, path) == probe_s0
    lexical_index_restore(spark, prefix, path, s1, num_buckets=4)
    assert _probe(spark, prefix, path) == probe_s1
    # and back to nothing-up-my-sleeve: restore is itself reversible
    lexical_index_restore(spark, prefix, path, s0, num_buckets=4)
    assert _probe(spark, prefix, path) == probe_s0

    log = {r["snapshot"]: r["note"] for r in
           lexical_index_snapshots(spark, path).collect()}
    assert log == {s0: "post-build", s1: "post-append"}


def test_snapshot_vacuum_reclaims_unreferenced_history(spark):
    path = _mk("ret")
    prefix = "snapret"
    lexical_index_build(_toks(spark, BASE_DOCS), prefix, path,
                        num_buckets=4)
    s0 = lexical_index_snapshot(spark, prefix, path, num_buckets=4)
    lexical_index_append(_toks(spark, NEW_DOCS), prefix, path,
                         num_buckets=4, batch_id="b1")
    s1 = lexical_index_snapshot(spark, prefix, path, num_buckets=4)
    probe_s1 = _probe(spark, prefix, path)
    lexical_index_delete(spark, prefix, path, [1], num_buckets=4)
    lexical_index_vacuum(spark, prefix, path, num_buckets=4)

    out = lexical_snapshot_vacuum(spark, path, keep=[s1])
    assert out["dropped_snapshots"] == 1
    assert out["reclaimed_files"] >= 0
    # dropped commit point is gone for good…
    with pytest.raises(ValueError, match="no snapshot"):
        lexical_index_restore(spark, prefix, path, s0, num_buckets=4)
    # …while the kept one still restores exactly
    lexical_index_restore(spark, prefix, path, s1, num_buckets=4)
    assert _probe(spark, prefix, path) == probe_s1
    # keeping a nonexistent snapshot is loud
    with pytest.raises(ValueError, match="nonexistent"):
        lexical_snapshot_vacuum(spark, path, keep=[99])


def test_snapshotless_index_accretes_no_history(spark):
    """Without a commit point the pre-snapshot disk behavior is
    unchanged: vacuum deletes superseded files outright."""
    path = _mk("nohist")
    prefix = "snapnone"
    lexical_index_build(_toks(spark, BASE_DOCS), prefix, path,
                        num_buckets=4)
    lexical_index_delete(spark, prefix, path, [1], num_buckets=4)
    lexical_index_vacuum(spark, prefix, path, num_buckets=4)
    assert not os.path.isdir(os.path.join(path, HISTORY_SUBDIR))


def test_restore_validates_bucket_count(spark):
    path = _mk("bk")
    prefix = "snapbk"
    lexical_index_build(_toks(spark, BASE_DOCS), prefix, path,
                        num_buckets=4)
    sid = lexical_index_snapshot(spark, prefix, path, num_buckets=4)
    with pytest.raises(ValueError):
        lexical_index_restore(spark, prefix, path, sid, num_buckets=8)


def test_positional_snapshot_restore_across_delete_vacuum(spark):
    """The positional layout shares the commit-point contract: a
    snapshot taken before delete+vacuum restores bit-identical phrase
    probes, and the shared retention (lexical_snapshot_vacuum iterates
    the surfaces each manifest recorded) serves this layout too."""
    from jcf_nb_migration_spark.io.lexical import (
        phrase_probe,
        positional_index_build,
        positional_index_delete,
        positional_index_restore,
        positional_index_snapshot,
        positional_index_vacuum,
    )

    docs = [
        (1, "spark window merge alpha spark window"),
        (2, "spark window beta"),
        (3, "merge spark window gamma"),
        (4, "window spark"),
        (5, "spark window spark window"),
    ]
    path = _mk("pos")
    prefix = "snappos"
    positional_index_build(_toks(spark, docs), prefix, path,
                           num_buckets=4)

    def probe():
        return sorted(
            (r["doc_id"], r["n_occurrences"], r["first_pos"])
            for r in phrase_probe(spark, prefix, path,
                                  ("spark", "window")).collect())

    at_commit = probe()
    assert at_commit  # the phrase matches something
    sid = positional_index_snapshot(spark, prefix, path, num_buckets=4,
                                    note="pre-maintenance")
    positional_index_delete(spark, prefix, path, [1, 5], num_buckets=4)
    out = positional_index_vacuum(spark, prefix, path, num_buckets=4)
    assert out["reclaimed_docs"] == 2
    after = probe()
    assert after != at_commit
    assert not {1, 5} & {d for d, _, _ in after}

    moves = positional_index_restore(spark, prefix, path, sid,
                                     num_buckets=4)
    assert moves["positions"]["restored"] > 0
    assert probe() == at_commit

    # shared retention: dropping the only snapshot reclaims history
    from jcf_nb_migration_spark.io.lexical import (
        lexical_snapshot_vacuum, positional_index_compact)
    s2 = positional_index_snapshot(spark, prefix, path, num_buckets=4)
    positional_index_compact(spark, prefix, path, num_buckets=4)
    got = lexical_snapshot_vacuum(spark, path, keep=[s2])
    assert got["dropped_snapshots"] == 1
    assert probe() == at_commit  # live state untouched by retention


def test_crashed_compact_swap_is_recovered(spark, monkeypatch):
    """The staged-rewrite swap's two crash states recover at the next
    entry point (io/lexical._recover_swap_residue): (1) a crash
    BETWEEN the renames (live dir missing, completed staging beside
    it) — the swap completes; (2) a stranded .old with the live dir
    intact — disposed per the snapshot retire policy. Probe results
    and the held commit point survive both."""
    import jcf_nb_migration_spark.io.lexical as L
    from jcf_nb_migration_spark.io.lexical import (
        lexical_index_compact,
        lexical_index_restore,
        lexical_index_snapshot,
    )

    path = _mk("crash")
    prefix = "snapcrash"
    lexical_index_build(_toks(spark, BASE_DOCS), prefix, path,
                        num_buckets=4)
    # fragment the postings so compaction has real work
    lexical_index_append(_toks(spark, NEW_DOCS), prefix, path,
                         num_buckets=4, batch_id="b1")
    sid = lexical_index_snapshot(spark, prefix, path, num_buckets=4,
                                 note="pre-crash")
    at_commit = _probe(spark, prefix, path)

    real_rename = os.rename

    def crash_after_first_rename(a, b):
        real_rename(a, b)
        if str(b).endswith("postings.old"):
            raise RuntimeError("simulated crash between the renames")

    monkeypatch.setattr(L.os, "rename", crash_after_first_rename)
    with pytest.raises(RuntimeError, match="simulated crash"):
        lexical_index_compact(spark, prefix, path, num_buckets=4)
    monkeypatch.undo()
    # crash state: live postings gone, .old + completed staging present
    assert not os.path.isdir(os.path.join(path, "postings"))
    assert os.path.isdir(os.path.join(path, "postings.old"))
    assert os.path.isdir(os.path.join(path, "postings.compact"))

    # the next compact recovers (completes the swap), then compacts
    lexical_index_compact(spark, prefix, path, num_buckets=4)
    assert _probe(spark, prefix, path) == at_commit
    assert not os.path.isdir(os.path.join(path, "postings.old"))
    # the commit point survived: its files retired to history, not void
    lexical_index_restore(spark, prefix, path, sid, num_buckets=4)
    assert _probe(spark, prefix, path) == at_commit


def test_failed_restore_leaves_live_state_untouched(spark):
    """An unresolvable restore (snapshot file reclaimed from history)
    must abort BEFORE any file moves: the live index keeps serving its
    current state. The prior mid-loop validation stranded a
    half-restored index — displaced live files already retired, some
    surfaces swapped — that re-running could not repair."""
    path = _mk("abort")
    prefix = "snapabort"
    lexical_index_build(_toks(spark, BASE_DOCS), prefix, path,
                        num_buckets=4)
    s0 = lexical_index_snapshot(spark, prefix, path, num_buckets=4)
    # mutate so s0's postings retire to history, then break s0 by
    # deleting one retired file behind the vacuum's back
    lexical_index_delete(spark, prefix, path, [2], num_buckets=4,
                         batch_id="d1")
    lexical_index_vacuum(spark, prefix, path, num_buckets=4)
    probe_live = _probe(spark, prefix, path)
    hist = os.path.join(path, HISTORY_SUBDIR, "postings")
    victim = next(f for f in sorted(os.listdir(hist))
                  if f.endswith(".parquet"))
    os.remove(os.path.join(hist, victim))

    import glob

    before = sorted(glob.glob(os.path.join(path, "*", "*.parquet")))
    with pytest.raises(ValueError, match="neither the live dir"):
        lexical_index_restore(spark, prefix, path, s0, num_buckets=4)
    after = sorted(glob.glob(os.path.join(path, "*", "*.parquet")))
    assert before == after  # no half-restore: zero files moved
    assert _probe(spark, prefix, path) == probe_live


# ---- vacuum intent plan (r13): stats reconciliation survives crashes


def _vacuum_crash(spark, prefix, path, when):
    """Run lexical_index_vacuum but crash `when` ∈ {'before_swap',
    'after_swap'} relative to the postings compact-swap."""
    import jcf_nb_migration_spark.io.lexical as L

    real = L._compact_bucketed_table

    def exploding(*a, **k):
        if when == "before_swap":
            raise RuntimeError("injected crash before the swap")
        out = real(*a, **k)
        raise RuntimeError("injected crash after the swap")

    L._compact_bucketed_table = exploding
    try:
        with pytest.raises(RuntimeError, match="injected crash"):
            lexical_index_vacuum(spark, prefix, path, num_buckets=4)
    finally:
        L._compact_bucketed_table = real


@pytest.mark.parametrize("when", ["before_swap", "after_swap"])
def test_vacuum_crash_then_rerun_matches_fresh_build(spark, when):
    """The regression: a crash AFTER the postings swap but before the
    stats rewrite left the corpus totals counting the reclaimed
    documents forever — the rerun found no dead postings, subtracted
    nothing, and cleared the tombstones. The intent plan (absolute
    consolidated totals, published before the first destructive step)
    makes the rerun finish the reconciliation; a crash BEFORE the
    swap must instead void the plan and recompute."""
    from jcf_nb_migration_spark.io.lexical import VACUUM_PLAN_FILE

    path = _mk(f"plan_{when}")
    prefix = f"vplan{when.replace('_', '')}"
    lexical_index_build(_toks(spark, BASE_DOCS), prefix, path,
                        num_buckets=4)
    lexical_index_delete(spark, prefix, path, [2, 3], num_buckets=4,
                         batch_id="d1")
    _vacuum_crash(spark, prefix, path, when)
    assert os.path.isfile(os.path.join(path, VACUUM_PLAN_FILE))

    stats = lexical_index_vacuum(spark, prefix, path, num_buckets=4)
    assert not os.path.isfile(os.path.join(path, VACUUM_PLAN_FILE))
    if when == "before_swap":
        assert stats["reclaimed_docs"] == 2  # nothing was lost: rerun
        #   recomputed the reconciliation from intact postings

    # post-recovery scoring must equal a fresh build over survivors
    ref_path = _mk(f"planref_{when}")
    survivors = [d for d in BASE_DOCS if d[0] not in (2, 3)]
    lexical_index_build(_toks(spark, survivors), f"vref{when[:3]}",
                        ref_path, num_buckets=4)
    assert _probe(spark, prefix, path) == _probe(
        spark, f"vref{when[:3]}", ref_path)
