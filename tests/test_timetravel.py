"""Docstore time travel (io/docstore.py versioning block).

Pins the four claims of the snapshot layer:

1. AS-OF correctness: every committed version reads back exactly the
   rows it had, across append / COW upsert / COW delete / compaction /
   schema evolution — and the live table always equals the latest
   version.
2. Change feed: docstore_version_diff yields exactly the
   insert/delete/update rows between any two versions (unchanged rows
   never appear; a row inserted and deleted between the endpoints
   never appears).
3. Retention: docstore_snapshot_vacuum keeps the newest K versions
   readable, makes older versions raise loudly, and deletes only
   history files no retained manifest references.
4. Crash residue from an interrupted COW swap is RETIRED to history,
   never destroyed.
"""

import os

import pytest

from jcf_nb_migration_spark.io.docstore import (
    DOCS_SUBDIR,
    HISTORY_SUBDIR,
    docstore_add_columns,
    docstore_append,
    docstore_as_of,
    docstore_build,
    docstore_compact,
    docstore_delete,
    docstore_fetch,
    docstore_history,
    docstore_incremental_view,
    docstore_snapshot_vacuum,
    docstore_upsert,
    docstore_version,
    docstore_version_diff,
)

SCHEMA = "doc_id bigint, text string, lang string"


def _docs(spark, ids, tag="v1"):
    return spark.createDataFrame(
        [(i, f"{tag} body {i}", "en") for i in ids], SCHEMA)


def _rows(df):
    return sorted((r["doc_id"], r["text"]) for r in
                  df.select("doc_id", "text").collect())


def _mutated_store(spark, path):
    """build(1..8)=v0 → append(9..11)=v1 → upsert(mod 1,9; ins 20)=v2
    → delete(2,9)=v3. Returns the expected (doc_id, text) sets per
    version."""
    docstore_build(_docs(spark, range(1, 9)), "tt", path)
    docstore_append(_docs(spark, [9, 10, 11]), "tt", path, batch_id=1)
    docstore_upsert(_docs(spark, [1, 9, 20], tag="v2"), "tt", path,
                    batch_id=2)
    docstore_delete(spark, "tt", path, [2, 9], batch_id=3)
    v0 = {(i, f"v1 body {i}") for i in range(1, 9)}
    v1 = v0 | {(i, f"v1 body {i}") for i in (9, 10, 11)}
    v2 = ({(i, f"v1 body {i}") for i in (2, 3, 4, 5, 6, 7, 8, 10, 11)}
          | {(i, f"v2 body {i}") for i in (1, 9, 20)})
    v3 = {t for t in v2 if t[0] not in (2, 9)}
    return [sorted(v0), sorted(v1), sorted(v2), sorted(v3)]


def test_as_of_reads_every_version(spark, tmp_path):
    path = str(tmp_path / "tt")
    expected = _mutated_store(spark, path)
    assert docstore_version(path) == 3
    for v, exp in enumerate(expected):
        assert _rows(docstore_as_of(spark, "tt", path, v)) == exp, v
    # live table == latest snapshot
    live = _rows(docstore_fetch(
        spark, "tt", path, [t[0] for t in expected[3]]))
    assert live == expected[3]


def test_history_commit_log(spark, tmp_path):
    path = str(tmp_path / "tt")
    _mutated_store(spark, path)
    hist = sorted((r["version"], r["op"], r["batch_id"]) for r in
                  docstore_history(spark, path).collect())
    assert hist == [(0, "build", None), (1, "append", "1"),
                    (2, "upsert", "2"), (3, "delete", "3")]


def test_version_diff_change_feed(spark, tmp_path):
    path = str(tmp_path / "tt")
    _mutated_store(spark, path)

    def diff(a, b):
        return sorted((r["doc_id"], r["change"]) for r in
                      docstore_version_diff(spark, "tt", path, a, b)
                      .collect())

    # v0 → v3: doc 9 (inserted v1, deleted v3) must NOT appear
    assert diff(0, 3) == [(1, "update"), (2, "delete"), (10, "insert"),
                          (11, "insert"), (20, "insert")]
    assert diff(1, 2) == [(1, "update"), (9, "update"), (20, "insert")]
    assert diff(2, 2) == []


def test_compact_preserves_snapshots(spark, tmp_path):
    path = str(tmp_path / "tt")
    expected = _mutated_store(spark, path)
    docstore_compact(spark, "tt", path)
    assert docstore_version(path) == 4  # compaction is a version too
    for v, exp in enumerate(expected):
        assert _rows(docstore_as_of(spark, "tt", path, v)) == exp, v
    assert _rows(docstore_as_of(spark, "tt", path, 4)) == expected[3]


def test_schema_evolution_versioned(spark, tmp_path):
    path = str(tmp_path / "tt")
    docstore_build(_docs(spark, [1, 2]), "tt", path)
    docstore_add_columns(spark, "tt", path, {"quality": "double"})
    narrow = docstore_as_of(spark, "tt", path, 0)
    wide = docstore_as_of(spark, "tt", path, 1)
    assert "quality" not in narrow.columns
    assert "quality" in wide.columns
    assert wide.where("quality IS NULL").count() == 2  # backfillled NULL


def test_version_diff_sees_evolved_column_updates(spark, tmp_path):
    """ADVICE r10: an upsert changing ONLY a post-evolution column must
    surface as an update (diff compares the UNION of columns, absent =
    NULL), and the incremental view rolled across the evolution equals
    re-projection at the target version."""
    path = str(tmp_path / "tt")
    docstore_build(_docs(spark, [1, 2, 3]), "tt", path)           # v0
    docstore_add_columns(spark, "tt", path, {"quality": "double"})  # v1
    # doc 2 keeps text/lang identical, only the NEW column changes
    docstore_upsert(spark.createDataFrame(
        [(2, "v1 body 2", "en", 0.9)],
        SCHEMA + ", quality double"), "tt", path, batch_id=9)     # v2
    diff = sorted((r["doc_id"], r["change"]) for r in
                  docstore_version_diff(spark, "tt", path, 0, 2)
                  .collect())
    assert diff == [(2, "update")]
    # incremental view across the evolution: projection incl. quality
    cols = ["doc_id", "quality"]
    view1 = docstore_as_of(spark, "tt", path, 1).select(*cols)
    rolled = docstore_incremental_view(
        spark, "tt", path, view1, 1, 2, cols)
    want = sorted((r["doc_id"], r["quality"]) for r in
                  docstore_as_of(spark, "tt", path, 2)
                  .select(*cols).collect())
    got = sorted((r["doc_id"], r["quality"]) for r in rolled.collect())
    assert got == want == [(1, None), (2, 0.9), (3, None)]


def test_snapshot_vacuum_retention(spark, tmp_path):
    path = str(tmp_path / "tt")
    expected = _mutated_store(spark, path)
    hist_dir = os.path.join(path, HISTORY_SUBDIR)
    assert os.listdir(hist_dir)  # COW retired superseded files
    n = docstore_snapshot_vacuum(path, keep_last=2)
    # versions 2 and 3 survive, 0 and 1 are gone
    assert _rows(docstore_as_of(spark, "tt", path, 2)) == expected[2]
    assert _rows(docstore_as_of(spark, "tt", path, 3)) == expected[3]
    with pytest.raises(ValueError, match="no version 0"):
        docstore_as_of(spark, "tt", path, 0)
    # only unreferenced history files were deleted; retained snapshots
    # still read (checked above), and a second vacuum finds nothing
    assert n >= 0
    assert docstore_snapshot_vacuum(path, keep_last=2) == 0
    with pytest.raises(ValueError, match=">= 1"):
        docstore_snapshot_vacuum(path, keep_last=0)


def test_as_of_missing_file_raises(spark, tmp_path):
    path = str(tmp_path / "tt")
    _mutated_store(spark, path)
    hist_dir = os.path.join(path, HISTORY_SUBDIR)
    victim = next(f for f in os.listdir(hist_dir)
                  if f.endswith(".parquet"))
    os.remove(os.path.join(hist_dir, victim))
    with pytest.raises(ValueError, match="neither the live table"):
        for v in range(docstore_version(path) + 1):
            docstore_as_of(spark, "tt", path, v).collect()


def test_crash_residue_retired_to_history(spark, tmp_path):
    """A stranded .cowold dir (crash between the COW swap's two move
    phases) holds manifest-referenced data: the next COW call must
    MOVE it to history, not delete it."""
    path = str(tmp_path / "tt")
    docstore_build(_docs(spark, range(1, 9)), "tt", path)
    residue_dir = os.path.join(path, DOCS_SUBDIR).rstrip("/") + ".cowold"
    os.makedirs(residue_dir)
    with open(os.path.join(residue_dir, "stranded_00003.parquet"),
              "wb") as fh:
        fh.write(b"not really parquet")
    docstore_upsert(_docs(spark, [1], tag="v2"), "tt", path)
    assert not os.path.isdir(residue_dir)
    assert os.path.isfile(os.path.join(
        path, HISTORY_SUBDIR, "stranded_00003.parquet"))


def test_rebuild_resets_version_epoch(spark, tmp_path):
    path = str(tmp_path / "tt")
    _mutated_store(spark, path)
    docstore_build(_docs(spark, [50, 51], tag="fresh"), "tt", path)
    assert docstore_version(path) == 0
    assert _rows(docstore_as_of(spark, "tt", path, 0)) == [
        (50, "fresh body 50"), (51, "fresh body 51")]
    with pytest.raises(ValueError, match="no version 3"):
        docstore_as_of(spark, "tt", path, 3)


def test_incremental_view_matches_reprojection(spark, tmp_path):
    """The change-feed consumer: a projection rolled forward with
    docstore_incremental_view must equal re-projecting the target
    snapshot — across updates, inserts, deletes, and the
    insert-then-delete transient."""
    from jcf_nb_migration_spark.io.docstore import (
        docstore_incremental_view,
    )

    path = str(tmp_path / "tt")
    _mutated_store(spark, path)
    cols = ["doc_id", "text"]
    view0 = docstore_as_of(spark, "tt", path, 0).select(*cols)
    rolled = docstore_incremental_view(
        spark, "tt", path, view0, 0, 3, cols)
    assert _rows(rolled) == _rows(
        docstore_as_of(spark, "tt", path, 3).select(*cols))
    # and stepwise 0→2 then 2→3 composes to the same state
    mid = docstore_incremental_view(spark, "tt", path, view0, 0, 2, cols)
    end = docstore_incremental_view(spark, "tt", path, mid, 2, 3, cols)
    assert _rows(end) == _rows(rolled)
    with pytest.raises(ValueError, match="must include doc_id"):
        docstore_incremental_view(spark, "tt", path, view0, 0, 3,
                                  ["text"])


def test_stream_cdc_maintains_derived_view(spark, tmp_path):
    """Streaming tie-in: a foreachBatch mutation stream (upserts +
    deletes, ledger-keyed per micro-batch) drives the versioned store,
    and a DERIVED VIEW is maintained purely from the change feed —
    docstore_incremental_view rolled forward v_before → v_now each
    batch, never a re-projection. Final view must equal projecting the
    latest snapshot."""
    import os as _os

    from pyspark.sql import functions as F

    from jcf_nb_migration_spark.io.docstore import (
        docstore_delete,
        docstore_incremental_view,
        docstore_upsert,
        docstore_version,
    )

    path = str(tmp_path / "store")
    view_dir = str(tmp_path / "view")
    src = str(tmp_path / "incoming")
    _os.makedirs(src, exist_ok=True)
    docstore_build(_docs(spark, range(1, 9)), "tt", path)
    (docstore_as_of(spark, "tt", path, 0).select("doc_id", "text")
     .write.parquet(view_dir))

    def ingest(batch_df, batch_id):
        v_before = docstore_version(path)
        ups = (batch_df.where("op = 'upsert'")
               .select("doc_id", "text", F.lit("en").alias("lang")))
        docstore_upsert(ups, "tt", path, batch_id=f"s{batch_id}u")
        dels = [r["doc_id"] for r in
                batch_df.where("op = 'delete'")
                .select("doc_id").collect()]
        if dels:
            docstore_delete(spark, "tt", path, dels,
                            batch_id=f"s{batch_id}d")
        v_now = docstore_version(path)
        if v_now > v_before:
            rolled = docstore_incremental_view(
                spark, "tt", path, spark.read.parquet(view_dir),
                v_before, v_now, ["doc_id", "text"])
            staging = view_dir + ".stage"
            rolled.write.mode("overwrite").parquet(staging)
            import shutil
            shutil.rmtree(view_dir)
            _os.rename(staging, view_dir)

    stream = (spark.readStream
              .schema("doc_id bigint, text string, op string")
              .parquet(src))
    q = stream.writeStream.foreachBatch(ingest).start()
    try:
        spark.createDataFrame(
            [(1, "v2 body 1", "upsert"), (9, "v2 body 9", "upsert")],
            "doc_id bigint, text string, op string"
        ).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        spark.createDataFrame(
            [(2, None, "delete"), (10, "v2 body 10", "upsert")],
            "doc_id bigint, text string, op string"
        ).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    latest = docstore_version(path)
    assert latest >= 3
    got = _rows(spark.read.parquet(view_dir))
    exp = _rows(docstore_as_of(spark, "tt", path, latest)
                .select("doc_id", "text"))
    assert got == exp
    assert (1, "v2 body 1") in got and (9, "v2 body 9") in got
    assert all(d != 2 for d, _ in got)


def test_restore_rolls_live_table_back(spark, tmp_path):
    """RESTORE: the live bucketed table returns to an old version's
    exact content; every snapshot (including the rolled-back ones)
    stays readable; the restore is itself a new audited version; COW
    keeps working afterwards."""
    from jcf_nb_migration_spark.io.docstore import docstore_restore

    path = str(tmp_path / "tt")
    expected = _mutated_store(spark, path)   # v0..v3
    new_v = docstore_restore(spark, "tt", path, 0)
    assert new_v == 4
    # live table == v0 content (fetch through the bucketed table)
    ids = [t[0] for t in expected[0]]
    assert _rows(docstore_fetch(spark, "tt", path, ids)) == expected[0]
    assert docstore_fetch(spark, "tt", path, [20]).count() == 0
    # all five versions readable AS OF their numbers
    for v, exp in enumerate(expected):
        assert _rows(docstore_as_of(spark, "tt", path, v)) == exp, v
    assert _rows(docstore_as_of(spark, "tt", path, 4)) == expected[0]
    hist = sorted((r["version"], r["op"]) for r in
                  docstore_history(spark, path).collect())
    assert hist[-1] == (4, "restore")
    # mutations continue from the restored state
    docstore_upsert(_docs(spark, [3], tag="v3"), "tt", path,
                    batch_id=99)
    assert (3, "v3 body 3") in _rows(
        docstore_fetch(spark, "tt", path, [3]))
    # restoring past the retention horizon refuses loudly
    from jcf_nb_migration_spark.io.docstore import (
        docstore_snapshot_vacuum,
    )
    docstore_snapshot_vacuum(path, keep_last=1)
    with pytest.raises(ValueError, match="no version 0"):
        docstore_restore(spark, "tt", path, 0)


# ---- COW swap crash recovery via the intent log (r13) ---------------
#
# The file-level COW swap publishes docs.cowswap.json before its first
# rename. A crash at ANY point inside the swap must be completed
# deterministically by the next writer, after which replaying the
# never-committed batch is an idempotent re-merge. The regression these
# pin: the old plan-less recovery retired the displaced bucket files
# and DELETED the staging dir, so a between-the-moves crash + replay
# read EMPTY touched buckets and silently erased every co-bucketed
# document from the live table.


@pytest.mark.parametrize("fail_at_rename", [1, 2])
def test_cow_crash_mid_swap_recovers_and_replays(spark, tmp_path,
                                                 fail_at_rename):
    """Kill the swap at the Nth file rename (1 = before anything
    moved, 2 = old out / staged not in — the data-loss window), then
    replay: the store must end exactly where an uncrashed upsert
    would."""
    import os as _os

    path = str(tmp_path / "cowcrash")
    # 2 buckets ensure the upserted doc shares its bucket with others
    docstore_build(_docs(spark, range(1, 9)), "cc", path, num_buckets=2)
    batch = _docs(spark, [1], tag="v2")

    real_rename = _os.rename
    calls = {"n": 0}

    def exploding_rename(src, dst):
        calls["n"] += 1
        if calls["n"] == fail_at_rename:
            raise RuntimeError("injected crash inside the COW swap")
        return real_rename(src, dst)

    _os.rename = exploding_rename
    try:
        with pytest.raises(RuntimeError, match="injected crash"):
            docstore_upsert(batch, "cc", path, num_buckets=2,
                            batch_id=7)
    finally:
        _os.rename = real_rename

    plan = os.path.join(path, DOCS_SUBDIR).rstrip("/") + ".cowswap.json"
    assert os.path.isfile(plan)  # the intent log survived the crash
    # replay the batch: entry recovery completes the swap, then the
    # merge re-applies idempotently
    assert docstore_upsert(_docs(spark, [1], tag="v2"), "cc", path,
                           num_buckets=2, batch_id=7)
    assert not os.path.isfile(plan)
    data_dir = os.path.join(path, DOCS_SUBDIR)
    assert not os.path.isdir(data_dir + ".cowstage")
    assert not os.path.isdir(data_dir + ".cowold")
    expected = sorted([(1, "v2 body 1")]
                      + [(i, f"v1 body {i}") for i in range(2, 9)])
    assert _rows(docstore_fetch(spark, "cc", path,
                                list(range(1, 9)))) == expected


def test_cow_crash_at_retire_recovers(spark, tmp_path):
    """Crash AFTER both move phases (during disposal): recovery must
    retire the displaced files, drop the plan, and leave the live
    table already carrying the mutation."""
    import jcf_nb_migration_spark.io.docstore as ds

    path = str(tmp_path / "cowretire")
    docstore_build(_docs(spark, range(1, 9)), "cr", path, num_buckets=2)

    real_retire = ds._retire_files
    state = {"armed": True}

    def exploding_retire(p, src_dir):
        if state["armed"]:
            state["armed"] = False
            raise RuntimeError("injected crash at retire")
        return real_retire(p, src_dir)

    ds._retire_files = exploding_retire
    try:
        with pytest.raises(RuntimeError, match="injected crash"):
            docstore_upsert(_docs(spark, [1], tag="v2"), "cr", path,
                            num_buckets=2, batch_id=9)
    finally:
        ds._retire_files = real_retire

    # replay: recovery retires the residue and the merge re-applies
    assert docstore_upsert(_docs(spark, [1], tag="v2"), "cr", path,
                           num_buckets=2, batch_id=9)
    data_dir = os.path.join(path, DOCS_SUBDIR)
    assert not os.path.isfile(data_dir + ".cowswap.json")
    assert not os.path.isdir(data_dir + ".cowold")
    expected = sorted([(1, "v2 body 1")]
                      + [(i, f"v1 body {i}") for i in range(2, 9)])
    assert _rows(docstore_fetch(spark, "cr", path,
                                list(range(1, 9)))) == expected
    # displaced bucket files landed in history, not the void
    assert any(f.endswith(".parquet") for f in
               os.listdir(os.path.join(path, HISTORY_SUBDIR)))
