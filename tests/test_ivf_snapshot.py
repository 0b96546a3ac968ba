"""Commit points on the IVF vector index (io/layout.py snapshot
section): a snapshot survives deletes, vacuums, and even a
centroid-retraining maintain (the epoch swap retires the old epoch's
files and hands back the captured centroids on restore), and retention
reclaims exactly the unreferenced history."""

import os

import pytest
from pyspark.sql import functions as F

from jcf_nb_migration_spark.functions import similarity as S
from jcf_nb_migration_spark.io.layout import (
    VEC_HISTORY_SUBDIR,
    ivf_centroid_drift,
    ivf_index_append,
    ivf_index_delete,
    ivf_index_maintain,
    ivf_index_probe,
    ivf_index_restore,
    ivf_index_snapshot,
    ivf_index_snapshots,
    ivf_index_vacuum,
    ivf_index_write,
    ivf_snapshot_vacuum,
)
from jcf_nb_migration_spark.registry import t
from tests.conftest import SF_SMALL


def _fixture(spark, tmp_path, name):
    emb = t(spark, SF_SMALL, "embeddings")
    centroids = S.kmeans_train(emb, k=8, iters=2)
    path = str(tmp_path / name)
    ivf_index_write(emb, centroids, path)
    pvec = list(emb.where(F.col("vec_id") == 0).head()["embedding"])
    return emb, centroids, path, pvec


def _probe(spark, path, centroids, pvec):
    return [(r["neighbor_id"], r["cos_sim"]) for r in
            ivf_index_probe(spark, path, centroids, pvec,
                            k=8, nprobe=2, exclude_id=0).collect()]


def test_snapshot_restore_across_delete_vacuum(spark, tmp_path):
    emb, centroids, path, pvec = _fixture(spark, tmp_path, "ivf_snap")
    before = _probe(spark, path, centroids, pvec)
    s0 = ivf_index_snapshot(spark, path, centroids=centroids,
                            note="post-build")

    victims = [before[0][0], before[2][0]]
    ivf_index_delete(spark, path, victims, batch_id=1)
    out = ivf_index_vacuum(spark, path)
    assert out["reclaimed_ids"] == 2
    after = _probe(spark, path, centroids, pvec)
    assert not set(victims) & {r[0] for r in after}
    # the vacuumed cluster rewrites retired to history, not deleted
    assert os.path.isdir(os.path.join(path, VEC_HISTORY_SUBDIR))

    got_cents = ivf_index_restore(spark, path, s0)
    assert got_cents == [(int(c), [float(x) for x in v])
                         for c, v in centroids]
    assert _probe(spark, path, centroids, pvec) == before

    log = {r["snapshot"]: (r["note"], r["has_centroids"]) for r in
           ivf_index_snapshots(spark, path).collect()}
    assert log == {s0: ("post-build", True)}


def test_snapshot_survives_maintain_retrain_epoch(spark, tmp_path):
    """The hard case: ivf_index_maintain retrains centroids and swaps
    the WHOLE layout dir. With a commit point held, the swap must
    carry snapshots+history across, retire the old epoch's files, and
    a restore must hand back the old geometry."""
    import numpy as np

    emb, centroids, path, pvec = _fixture(spark, tmp_path, "ivf_epoch")
    before = _probe(spark, path, centroids, pvec)
    s0 = ivf_index_snapshot(spark, path, centroids=centroids,
                            note="epoch-0")
    floor = min(r["mean_cos"] for r in
                ivf_centroid_drift(spark, path, centroids,
                                   min_mean_cos=-1.0).collect()) - 0.05

    # flood with a centroid-orthogonal direction to force the retrain
    rows = S._centroid_rows(centroids)
    C = np.array([c for _cid, c in rows])
    v0 = np.array([1.0 if i % 7 == 0 else 0.1 for i in range(64)])
    coef, *_ = np.linalg.lstsq(C.T, v0, rcond=None)
    v = v0 - C.T @ coef
    bad = spark.createDataFrame(
        [(10_000 + i, [float(x) for x in v]) for i in range(200)],
        "vec_id bigint, embedding array<float>")
    ivf_index_append(bad, centroids, path, batch_id=1)

    rebuilt, new_cents = ivf_index_maintain(spark, path, centroids,
                                            min_mean_cos=floor)
    assert rebuilt is True and new_cents is not centroids
    assert not os.path.isdir(path.rstrip("/") + ".old")
    # new epoch probes fine with the new geometry
    assert len(_probe(spark, path, new_cents, pvec)) == 8

    restored_cents = ivf_index_restore(spark, path, s0)
    assert restored_cents == [(int(c), [float(x) for x in vv])
                              for c, vv in centroids]
    assert _probe(spark, path, restored_cents, pvec) == before


def test_snapshot_vacuum_retention(spark, tmp_path):
    emb, centroids, path, pvec = _fixture(spark, tmp_path, "ivf_ret")
    s0 = ivf_index_snapshot(spark, path, centroids=centroids)
    before = _probe(spark, path, centroids, pvec)
    ivf_index_delete(spark, path, [before[0][0]], batch_id=1)
    ivf_index_vacuum(spark, path)
    s1 = ivf_index_snapshot(spark, path, centroids=centroids)
    probe_s1 = _probe(spark, path, centroids, pvec)

    out = ivf_snapshot_vacuum(spark, path, keep=[s1])
    assert out["dropped_snapshots"] == 1
    with pytest.raises(ValueError, match="no snapshot"):
        ivf_index_restore(spark, path, s0)
    ivf_index_restore(spark, path, s1)
    assert _probe(spark, path, centroids, pvec) == probe_s1
    with pytest.raises(ValueError, match="nonexistent"):
        ivf_snapshot_vacuum(spark, path, keep=[99])


def test_snapshotless_index_accretes_no_history(spark, tmp_path):
    emb, centroids, path, pvec = _fixture(spark, tmp_path, "ivf_nohist")
    before = _probe(spark, path, centroids, pvec)
    ivf_index_delete(spark, path, [before[0][0]], batch_id=1)
    ivf_index_vacuum(spark, path)
    assert not os.path.isdir(os.path.join(path, VEC_HISTORY_SUBDIR))


def test_crashed_epoch_swap_residue_is_recovered(spark, tmp_path):
    """The epoch swap's crash window: a maintain that died after the
    renames but before the absorb leaves the ENTIRE previous epoch —
    including the only copy of `_snapshots` — stranded in
    ``<path>.old``. Every snapshot-aware entry point recovers the
    residue first, so the commit point taken before the crash still
    restores (the zorder r11 lesson: residue is state, not garbage)."""
    import shutil

    emb, centroids, path, pvec = _fixture(spark, tmp_path, "ivf_crash")
    before = _probe(spark, path, centroids, pvec)
    s0 = ivf_index_snapshot(spark, path, centroids=centroids,
                            note="pre-crash")

    # simulate the crash window: previous epoch (with _snapshots) at
    # .old, a freshly rebuilt epoch at path WITHOUT control dirs
    old = path.rstrip("/") + ".old"
    os.rename(path, old)
    survivors = emb.where(F.col("vec_id") % 3 != 0)
    ivf_index_write(survivors, centroids, path)
    assert not os.path.isdir(os.path.join(path, "_snapshots"))

    # restore must first absorb the residue, then resolve s0 exactly
    got_cents = ivf_index_restore(spark, path, s0)
    assert got_cents is not None
    assert _probe(spark, path, centroids, pvec) == before
    assert not os.path.isdir(old)

    # and the recovered snapshot log is visible to the listing
    log = [r["snapshot"] for r in
           ivf_index_snapshots(spark, path).collect()]
    assert log == [s0]

def test_crash_between_swap_renames_completes_swap(spark, tmp_path):
    """ADVICE r11 (medium): a crash BETWEEN _epoch_swap's two renames
    leaves the live dir MISSING, the old epoch (with the only copy of
    `_snapshots`) at ``.old``, and the fully-written staged rebuild at
    ``.rebuild``. Recovery must COMPLETE the swap — install the staged
    epoch, then absorb the old one — never rmtree the only installed
    copy or absorb into a data-less tree."""
    emb, centroids, path, pvec = _fixture(spark, tmp_path, "ivf_midswap")
    before = _probe(spark, path, centroids, pvec)
    s0 = ivf_index_snapshot(spark, path, centroids=centroids,
                            note="pre-crash")

    # stage a completed rebuild (ivf_index_maintain writes it BEFORE
    # any rename), then die between rename #1 and rename #2
    staging = path.rstrip("/") + ".rebuild"
    survivors = emb.where(F.col("vec_id") % 3 != 0)
    ivf_index_write(survivors, centroids, staging)
    old = path.rstrip("/") + ".old"
    os.rename(path, old)
    assert not os.path.isdir(path)

    # any snapshot-aware entry point recovers: swap completed, old
    # epoch absorbed, pre-crash commit point restorable
    log = [r["snapshot"] for r in
           ivf_index_snapshots(spark, path).collect()]
    assert log == [s0]
    assert not os.path.isdir(old) and not os.path.isdir(staging)
    assert len(_probe(spark, path, centroids, pvec)) == 8  # new epoch live
    ivf_index_restore(spark, path, s0)
    assert _probe(spark, path, centroids, pvec) == before


def test_crash_with_no_staging_rolls_back(spark, tmp_path):
    """``.old`` present, live dir missing, NO staged rebuild: the old
    epoch is the only complete copy — recovery rolls it back into
    place untouched."""
    emb, centroids, path, pvec = _fixture(spark, tmp_path, "ivf_rollback")
    before = _probe(spark, path, centroids, pvec)
    s0 = ivf_index_snapshot(spark, path, centroids=centroids)
    old = path.rstrip("/") + ".old"
    os.rename(path, old)

    log = [r["snapshot"] for r in
           ivf_index_snapshots(spark, path).collect()]
    assert log == [s0]
    assert os.path.isdir(path) and not os.path.isdir(old)
    assert _probe(spark, path, centroids, pvec) == before


def test_snapshot_vacuum_sees_stranded_commit_points(spark, tmp_path):
    """ADVICE r11 (low): ivf_snapshot_vacuum must recover epoch
    residue first — a commit point stranded in ``.old`` by a crashed
    maintain is valid for the keep list, not 'nonexistent'."""
    emb, centroids, path, pvec = _fixture(spark, tmp_path, "ivf_vacres")
    s0 = ivf_index_snapshot(spark, path, centroids=centroids)
    old = path.rstrip("/") + ".old"
    os.rename(path, old)
    survivors = emb.where(F.col("vec_id") % 3 != 0)
    ivf_index_write(survivors, centroids, path)

    out = ivf_snapshot_vacuum(spark, path, keep=[s0])
    assert out["dropped_snapshots"] == 0
    ivf_index_restore(spark, path, s0)
    assert len(_probe(spark, path, centroids, pvec)) == 8


# ---- vacuum per-cluster swap residue (r13) --------------------------
#
# ivf_index_vacuum swaps each touched cluster dir through a parking
# lot. That lot must be _swap_old/ (underscore-prefixed, invisible to
# partition discovery) — a `cluster=K.old` SIBLING is parsed as a
# partition VALUE, flips the cluster column to string for every
# reader, and fails probes' bigint isin casts. And a crash between
# the per-cluster renames must be recoverable: complete the swap when
# the staged rewrite finished (_SUCCESS), roll back when it didn't.


def _vacuum_crash_between_renames(spark, path, keep_staging_success):
    """Manufacture ivf_index_vacuum's crash state between
    rename(live -> parked) and rename(staged -> live) for one cluster,
    by replaying exactly the vacuum's steps up to the crash point."""
    import shutil

    from jcf_nb_migration_spark.io.layout import (
        VEC_SWAP_OLD_SUBDIR, vec_tombstone_ids)

    tomb = vec_tombstone_ids(spark, path).withColumnRenamed(
        "vec_id", "vec_id")
    idx = spark.read.parquet(path)
    dead = idx.join(F.broadcast(tomb), "vec_id", "left_semi")
    touched = [r["cluster"] for r in
               dead.select("cluster").distinct().collect()]
    assert touched
    staging = path.rstrip("/") + ".vacuum"
    shutil.rmtree(staging, ignore_errors=True)
    (idx.where(F.col("cluster").isin(touched))
     .join(F.broadcast(tomb), "vec_id", "left_anti")
     .write.mode("overwrite").partitionBy("cluster").parquet(staging))
    if not keep_staging_success:
        os.remove(os.path.join(staging, "_SUCCESS"))
    cid = touched[0]
    parked = os.path.join(path, VEC_SWAP_OLD_SUBDIR, f"cluster={cid}")
    os.makedirs(os.path.dirname(parked), exist_ok=True)
    os.rename(os.path.join(path, f"cluster={cid}"), parked)
    return cid, touched


def test_vacuum_residue_is_invisible_to_readers(spark, tmp_path):
    """The parked dir must not leak into partition discovery: with a
    cluster parked mid-vacuum, reads keep the bigint cluster column
    and probes still execute (the legacy cluster=K.old sibling made
    every read infer string and every probe raise)."""
    emb, centroids, path, pvec = _fixture(spark, tmp_path, "ivf_res1")
    victims = [r[0] for r in _probe(spark, path, centroids, pvec)[:2]]
    ivf_index_delete(spark, path, victims, batch_id=1)
    _vacuum_crash_between_renames(spark, path, keep_staging_success=True)
    fresh = spark.read.parquet(path)
    assert dict(fresh.dtypes)["cluster"] in ("int", "bigint")
    # probes run (no cast error) and never surface tombstoned ids
    got = {r[0] for r in _probe(spark, path, centroids, pvec)}
    assert not set(victims) & got


def test_vacuum_crash_with_complete_staging_completes(spark, tmp_path):
    """Crash between the renames with _SUCCESS in staging: the next
    snapshot-aware entry completes the swap — the index ends exactly
    where an uncrashed vacuum would have left that cluster."""
    from jcf_nb_migration_spark.io.layout import VEC_SWAP_OLD_SUBDIR

    emb, centroids, path, pvec = _fixture(spark, tmp_path, "ivf_res2")
    victims = [r[0] for r in _probe(spark, path, centroids, pvec)[:2]]
    ivf_index_delete(spark, path, victims, batch_id=1)
    cid, _ = _vacuum_crash_between_renames(
        spark, path, keep_staging_success=True)
    out = ivf_index_vacuum(spark, path)  # entry recovery runs first
    assert not os.path.isdir(
        os.path.join(path, VEC_SWAP_OLD_SUBDIR, f"cluster={cid}"))
    live = spark.read.parquet(path)
    assert live.where(F.col("vec_id").isin(victims)).count() == 0
    # every non-victim row of the crashed cluster survived
    expected = emb.join(
        spark.createDataFrame([(v,) for v in victims], "vec_id bigint"),
        "vec_id", "left_anti").count()
    assert live.count() == expected
    got = {r[0] for r in _probe(spark, path, centroids, pvec)}
    assert not set(victims) & got


def test_vacuum_crash_without_staging_rolls_back(spark, tmp_path):
    """Crash before the staged rewrite committed (_SUCCESS absent):
    the parked dir is the only copy — recovery must restore it, and
    tombstones still mask the dead ids until a later vacuum lands."""
    emb, centroids, path, pvec = _fixture(spark, tmp_path, "ivf_res3")
    victims = [r[0] for r in _probe(spark, path, centroids, pvec)[:2]]
    ivf_index_delete(spark, path, victims, batch_id=1)
    cid, _ = _vacuum_crash_between_renames(
        spark, path, keep_staging_success=False)
    out = ivf_index_vacuum(spark, path)  # recovery rolls back, then vacuums
    assert out["reclaimed_ids"] == len(victims)
    live = spark.read.parquet(path)
    assert live.where(F.col("vec_id").isin(victims)).count() == 0
    assert live.count() == emb.count() - len(victims)
    assert os.path.isdir(os.path.join(path, f"cluster={cid}"))


def test_legacy_dot_old_residue_is_recovered(spark, tmp_path):
    """A pre-fix crash may have left the reader-breaking
    `cluster=K.old` sibling; recovery must fold it back (roll-back
    form: no staging) so reads regain the bigint partition column."""
    emb, centroids, path, pvec = _fixture(spark, tmp_path, "ivf_res4")
    n = emb.count()
    # take one cluster's dir and park it the legacy (broken) way
    cid = spark.read.parquet(path).select("cluster").head()["cluster"]
    os.rename(os.path.join(path, f"cluster={cid}"),
              os.path.join(path, f"cluster={cid}.old"))
    assert dict(spark.read.parquet(path).dtypes)["cluster"] == "string"
    sid = ivf_index_snapshot(spark, path, centroids=centroids)
    assert dict(spark.read.parquet(path).dtypes)["cluster"] in (
        "int", "bigint")
    assert spark.read.parquet(path).count() == n
    # and the snapshot listed the recovered cluster's files
    from jcf_nb_migration_spark.io.layout import _vec_read_snapshot
    assert any(f.startswith(f"cluster={cid}/")
               for f in _vec_read_snapshot(path, sid)["files"])


def test_failed_restore_leaves_live_state_untouched(spark, tmp_path):
    """Same contract as the lexical twin: an unresolvable vector-index
    restore must abort before ANY retire/move — the prior ordering
    retired every displaced live file first and then raised, leaving
    the index with files missing and nothing restored."""
    emb, centroids, path, pvec = _fixture(spark, tmp_path, "ivf_abort")
    s0 = ivf_index_snapshot(spark, path, centroids=centroids)
    victims = [r[0] for r in _probe(spark, path, centroids, pvec)[:2]]
    ivf_index_delete(spark, path, victims, batch_id=1)
    ivf_index_vacuum(spark, path)  # retires s0's touched clusters
    probe_live = _probe(spark, path, centroids, pvec)
    from jcf_nb_migration_spark.io.layout import (_vec_read_snapshot,
                                                  _vec_rel_parquet)

    # break s0: delete a history file the snapshot references and the
    # live tree no longer holds
    want = set(_vec_read_snapshot(path, s0)["files"])
    gone = sorted(want - set(_vec_rel_parquet(path)))
    assert gone  # the vacuum retired at least one referenced file
    os.remove(os.path.join(path, VEC_HISTORY_SUBDIR, gone[0]))
    before = _vec_rel_parquet(path)
    with pytest.raises(ValueError, match="neither the live tree"):
        ivf_index_restore(spark, path, s0)
    assert _vec_rel_parquet(path) == before  # zero files moved
    assert _probe(spark, path, centroids, pvec) == probe_live


def test_maintain_recovers_parked_cluster_before_rebuild(spark, tmp_path):
    """A cluster parked by a crashed vacuum is invisible to scans; if
    maintain read its rebuild input before recovery, the new epoch
    would be staged WITHOUT that cluster and the swap would discard
    the only copy. Recovery must run at maintain entry."""
    emb, centroids, path, pvec = _fixture(spark, tmp_path, "ivf_mnt")
    n = emb.count()
    victims = [r[0] for r in _probe(spark, path, centroids, pvec)[:1]]
    ivf_index_delete(spark, path, victims, batch_id=1)
    _vacuum_crash_between_renames(spark, path, keep_staging_success=True)
    # no drift -> maintain returns False, but entry recovery must have
    # healed the parked cluster first
    rebuilt, _ = ivf_index_maintain(spark, path, centroids,
                                    min_mean_cos=-1.0)
    assert rebuilt is False
    live = spark.read.parquet(path)
    assert live.count() == n - len(victims)
    assert live.where(F.col("vec_id").isin(victims)).count() == 0


def test_append_recovers_parked_cluster_first(spark, tmp_path):
    """An append that lands in a parked cluster would recreate the
    live dir and make later recovery dispose the parked (only) copy —
    append must recover at entry, before any file lands."""
    from jcf_nb_migration_spark.io.layout import VEC_SWAP_OLD_SUBDIR

    emb, centroids, path, pvec = _fixture(spark, tmp_path, "ivf_app")
    n = emb.count()
    victims = [r[0] for r in _probe(spark, path, centroids, pvec)[:1]]
    ivf_index_delete(spark, path, victims, batch_id=1)
    cid, _ = _vacuum_crash_between_renames(
        spark, path, keep_staging_success=True)
    batch = spark.createDataFrame(
        [(10_000_000 + i, [float(i)] * 8) for i in range(4)],
        "vec_id bigint, embedding array<double>")
    assert ivf_index_append(batch, centroids, path, batch_id=2)
    assert not os.path.isdir(
        os.path.join(path, VEC_SWAP_OLD_SUBDIR, f"cluster={cid}"))
    live = spark.read.parquet(path)
    # survivors + appended batch; nothing from the parked copy lost
    assert live.count() == n - len(victims) + 4
    assert live.where(F.col("vec_id").isin(victims)).count() == 0


def test_snapshots_lister_skips_recovery_under_live_writer(spark,
                                                           tmp_path):
    """ivf_index_snapshots is an unlocked reader: when a live writer
    holds the layout (e.g. a vacuum mid-swap), it must NOT run
    recovery (which moves files and rmtrees the writer's staging) —
    and must not raise either."""
    from jcf_nb_migration_spark.io.layout import VEC_SWAP_OLD_SUBDIR
    from jcf_nb_migration_spark.io.locking import writer_lock

    emb, centroids, path, pvec = _fixture(spark, tmp_path, "ivf_list")
    ivf_index_snapshot(spark, path, centroids=centroids)
    victims = [r[0] for r in _probe(spark, path, centroids, pvec)[:1]]
    ivf_index_delete(spark, path, victims, batch_id=1)
    cid, _ = _vacuum_crash_between_renames(
        spark, path, keep_staging_success=True)
    parked = os.path.join(path, VEC_SWAP_OLD_SUBDIR, f"cluster={cid}")
    import threading

    held = threading.Event()
    release = threading.Event()

    def writer():
        with writer_lock(path, "simulated-vacuum"):
            held.set()
            release.wait(20)

    t = threading.Thread(target=writer)
    t.start()
    assert held.wait(10)
    try:
        rows = ivf_index_snapshots(spark, path).collect()  # no raise
        assert len(rows) == 1
        assert os.path.isdir(parked)  # residue untouched under writer
    finally:
        release.set()
        t.join(20)
    # lock free: the lister may now recover
    ivf_index_snapshots(spark, path).collect()
    assert not os.path.isdir(parked)
