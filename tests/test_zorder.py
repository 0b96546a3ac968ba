"""Z-ordered layout + file-stats pruning (io/zorder.py).

Pins the module's three claims:

1. Correctness is pruning-independent: a zordered_scan under any range
   predicate equals the unpruned filter (including the zero-survivor
   case, which must return an EMPTY frame with the layout's schema).
2. Pruning actually happens, and on BOTH dimensions: a conjunctive box
   predicate keeps a small fraction of files, and a predicate on the
   SECOND column alone still prunes (the thing a single-column sort
   cannot do).
3. Safety rails: predicates on stats-less columns and scans of
   non-z-ordered paths fail loudly; manifest bounds are stored in the
   column's native parquet type, so exotic numeric bounds stay exact.
4. Time travel (r11): every mutation commits a version manifest —
   AS-OF reads, restore, retention vacuum, and crash residue that is
   invisible until committed (mirrors tests/test_timetravel.py).
"""

import random

import pytest

from jcf_nb_migration_spark.io.zorder import (
    write_zordered,
    zordered_file_count,
    zordered_scan,
)


def _frame(spark, n=20000, seed=5):
    rng = random.Random(seed)
    rows = [(i, rng.randint(0, 9999), rng.randint(0, 9999),
             rng.random()) for i in range(n)]
    return spark.createDataFrame(
        rows, "id bigint, a bigint, b bigint, payload double")


def _rows(df):
    return sorted((r["id"], r["a"], r["b"]) for r in df.collect())


def test_scan_equals_unpruned_filter(spark, tmp_path):
    df = _frame(spark)
    path = str(tmp_path / "z")
    n = write_zordered(df, path, ["a", "b"], n_files=32)
    assert n >= 16  # range partitioner may merge tiny ranges
    for ranges in (
        {"a": (100, 1200), "b": (4000, 5500)},
        {"a": (0, 9999)},                      # full range on one dim
        {"b": (9990, None)},                   # open upper bound
        {"a": (None, 50), "b": (None, 50)},    # open lower bounds
    ):
        got = _rows(zordered_scan(spark, path, ranges))
        exp = df
        for c, (lo, hi) in ranges.items():
            if lo is not None:
                exp = exp.where(f"{c} >= {lo}")
            if hi is not None:
                exp = exp.where(f"{c} <= {hi}")
        assert got == _rows(exp), ranges


def test_zero_survivors_empty_frame_with_schema(spark, tmp_path):
    df = _frame(spark, n=2000)
    path = str(tmp_path / "z")
    write_zordered(df, path, ["a", "b"], n_files=8)
    out = zordered_scan(spark, path, {"a": (20000, 30000)})
    assert out.count() == 0
    assert out.columns == ["id", "a", "b", "payload"]
    surv, total = zordered_file_count(spark, path, {"a": (20000, 30000)})
    assert surv == 0 and total >= 4


def test_pruning_on_both_dimensions(spark, tmp_path):
    """Uniform 2-D data, ~32 files: a 10%x10% box must exclude most
    files, and a 10% slice on the SECOND dimension alone must still
    exclude a majority — the property a linear sort by the first
    column cannot deliver (its every file spans b's full range)."""
    df = _frame(spark)
    path = str(tmp_path / "z")
    write_zordered(df, path, ["a", "b"], n_files=32)
    box_surv, total = zordered_file_count(
        spark, path, {"a": (0, 999), "b": (0, 999)})
    assert box_surv <= total // 3, (box_surv, total)
    b_surv, _ = zordered_file_count(spark, path, {"b": (0, 999)})
    assert b_surv <= total // 2 + 1, (b_surv, total)

    # the contrast layout: same writer, but z-ordered on (a, id) — b
    # is unsorted, so every file spans b's range and a b-slice prunes
    # (almost) nothing
    lin = str(tmp_path / "lin")
    write_zordered(df.select("id", "a", "b"), lin, ["a", "id"],
                   n_files=32)
    # manually check b-spread via the a-stats: not recorded for b, so
    # demonstrate with a fresh z-layout over (a, b) vs slice on b
    with pytest.raises(ValueError, match="no file stats"):
        zordered_scan(spark, lin, {"b": (0, 999)})


def test_validation_and_missing_sidecar(spark, tmp_path):
    df = _frame(spark, n=500)
    path = str(tmp_path / "z")
    write_zordered(df, path, ["a", "b"], n_files=4)
    with pytest.raises(ValueError, match="no file stats"):
        zordered_scan(spark, path, {"payload": (0.0, 0.5)})
    with pytest.raises(ValueError, match="needs >= 2"):
        write_zordered(df, str(tmp_path / "z1"), ["a"])
    with pytest.raises(ValueError, match="> 63"):
        write_zordered(df, str(tmp_path / "z2"), ["a", "b"], bits=32)
    plain = str(tmp_path / "plain")
    df.write.parquet(plain)
    with pytest.raises(ValueError, match="not a z-ordered layout"):
        zordered_scan(spark, plain, {"a": (0, 10)})


def test_double_dims_roundtrip(spark, tmp_path):
    """Float dimensions: sidecar JSON round-trip must not lose the
    exact bounds used for pruning decisions (repr round-trip), and
    the scan stays correct."""
    df = _frame(spark, n=3000)
    d2 = df.selectExpr("id", "a", "b",
                       "payload * 1e-7 + 0.1 as x",
                       "payload as y")
    path = str(tmp_path / "zf")
    write_zordered(d2, path, ["x", "y"], n_files=8)
    got = _rows(zordered_scan(spark, path, {"x": (0.1, 0.100000049),
                                            "y": (0.2, 0.9)})
                .select("id", "a", "b"))
    exp = _rows(d2.where("x >= 0.1 and x <= 0.100000049 and "
                         "y >= 0.2 and y <= 0.9").select("id", "a", "b"))
    assert got == exp


def test_append_then_scan_exact_and_ledger(spark, tmp_path):
    """Appended batches join the sidecar with their own stats: scans
    stay exact (pruning is per-file, not order), and the shared
    replay ledger makes redelivered batches no-ops."""
    from jcf_nb_migration_spark.io.zorder import append_zordered

    df = _frame(spark, n=5000)
    path = str(tmp_path / "z")
    write_zordered(df, path, ["a", "b"], n_files=8)
    batch = _frame(spark, n=400, seed=99).selectExpr(
        "id + 100000 as id", "a", "b", "payload")
    assert append_zordered(batch, path, batch_id=7) is True
    assert append_zordered(batch, path, batch_id=7) is False  # replay
    ranges = {"a": (1000, 3000), "b": (1000, 3000)}
    got = _rows(zordered_scan(spark, path, ranges))
    exp = _rows(df.unionByName(batch)
                .where("a between 1000 and 3000 and "
                       "b between 1000 and 3000"))
    assert got == exp
    # drifted schema refuses before touching files
    import pytest as _pytest

    bad = batch.selectExpr("cast(id as double) as id", "a", "b",
                           "payload")
    with _pytest.raises(ValueError, match="drifted"):
        append_zordered(bad, path, batch_id=8)


def test_maintain_relayouts_when_fragmented(spark, tmp_path):
    """Below the threshold maintain is a no-op; past it the layout is
    rebuilt along the curve (appended-file list resets, pruning power
    restored), results invariant, ledger preserved across the swap."""
    from jcf_nb_migration_spark.io.zorder import (_read_version,
                                                  append_zordered,
                                                  zorder_maintain)

    df = _frame(spark, n=8000)
    path = str(tmp_path / "z")
    write_zordered(df, path, ["a", "b"], n_files=16)
    batch = _frame(spark, n=500, seed=42).selectExpr(
        "id + 500000 as id", "a", "b", "payload")
    assert append_zordered(batch, path, batch_id=1) is True
    assert zorder_maintain(spark, path, max_appended_frac=0.9) is False
    # drive fragmentation past the gate
    for i in range(2, 8):
        b = _frame(spark, n=200, seed=i).selectExpr(
            f"id + {i} * 1000000 as id", "a", "b", "payload")
        assert append_zordered(b, path, batch_id=i) is True
    assert zorder_maintain(spark, path, max_appended_frac=0.25) is True
    man = _read_version(path, None)
    assert all(s["kind"] == "base" for s in man["segments"])  # fresh
    # the full content survived the swap, scans exact
    ranges = {"a": (0, 999), "b": (0, 999)}
    everything = df.unionByName(batch)
    for i in range(2, 8):
        everything = everything.unionByName(
            _frame(spark, n=200, seed=i).selectExpr(
                f"id + {i} * 1000000 as id", "a", "b", "payload"))
    got = _rows(zordered_scan(spark, path, ranges))
    exp = _rows(everything.where("a <= 999 and b <= 999"))
    assert got == exp
    # ledger survived: replaying an already-committed batch stays a
    # no-op after the re-layout
    assert append_zordered(batch, path, batch_id=1) is False
    # and the rebuilt layout prunes the box again
    surv, total = zordered_file_count(spark, path, ranges)
    assert surv < total


def test_null_zcolumn_stats_never_prune(spark, tmp_path):
    """ADVICE r10: a file whose z-column is entirely NULL has NULL
    manifest min/max — it must be KEPT by every predicate (unknown ⇒
    unprunable), and the exact re-filter then drops its rows."""
    rows = ([(i, i % 100, i % 77) for i in range(2000)]
            + [(10000 + i, None, i % 77) for i in range(50)])
    df = spark.createDataFrame(rows, "id bigint, a bigint, b bigint")
    path = str(tmp_path / "zn")
    write_zordered(df, path, ["a", "b"], n_files=4)
    got = _rows2(zordered_scan(spark, path, {"a": (10, 20),
                                             "b": (0, 76)}))
    exp = _rows2(df.where("a between 10 and 20 and b between 0 and 76"))
    assert got == exp
    # and an appended all-NULL batch keeps scans exact too
    from jcf_nb_migration_spark.io.zorder import append_zordered

    batch = spark.createDataFrame(
        [(20000 + i, None, 5) for i in range(30)],
        "id bigint, a bigint, b bigint")
    append_zordered(batch, path, batch_id=1)
    got = _rows2(zordered_scan(spark, path, {"a": (10, 20),
                                             "b": (5, 5)}))
    exp = _rows2(df.unionByName(batch)
                 .where("a between 10 and 20 and b = 5"))
    assert got == exp


def _rows2(df):
    return sorted((r["id"], r["a"], r["b"]) for r in df.collect())


def test_zorder_time_travel_and_restore(spark, tmp_path):
    """Every mutation commits a version; AS-OF reads reproduce each
    snapshot exactly; restore rolls the live layout back (as a NEW
    audited version); the commit log records it all — mirroring
    tests/test_timetravel.py for the docstore."""
    from jcf_nb_migration_spark.io.zorder import (
        append_zordered,
        zorder_history,
        zorder_maintain,
        zorder_restore,
        zordered_as_of,
    )

    df = _frame(spark, n=3000)
    path = str(tmp_path / "zt")
    write_zordered(df, path, ["a", "b"], n_files=8)            # v0
    b1 = _frame(spark, n=300, seed=11).selectExpr(
        "id + 100000 as id", "a", "b", "payload")
    append_zordered(b1, path, batch_id=1)                       # v1
    b2 = _frame(spark, n=2500, seed=12).selectExpr(
        "id + 200000 as id", "a", "b", "payload")
    append_zordered(b2, path, batch_id=2)                       # v2
    assert zorder_maintain(spark, path, max_appended_frac=0.25)  # v3
    snap = [sorted(r["id"] for r in df.collect()), None, None, None]
    snap[1] = sorted(snap[0] + [r["id"] for r in b1.collect()])
    snap[2] = sorted(snap[1] + [r["id"] for r in b2.collect()])
    snap[3] = snap[2]  # maintain reorganizes, never changes rows
    for v in range(4):
        got = sorted(r["id"] for r in
                     zordered_as_of(spark, path, v).collect())
        assert got == snap[v], f"version {v} drifted"
    # restore to v1: live scan now sees only v1's rows (v4 committed)
    v_new = zorder_restore(spark, path, 1)
    assert v_new == 4
    live = sorted(r["id"] for r in
                  zordered_scan(spark, path,
                                {"a": (0, 9999)}).collect())
    assert live == snap[1]
    # pruned historical read: scan AS OF v2 equals unpruned filter
    got = sorted(r["id"] for r in
                 zordered_scan(spark, path, {"a": (0, 999),
                                             "b": (0, 999)},
                               version=2).collect())
    exp = sorted(r["id"] for r in
                 df.unionByName(b1).unionByName(b2)
                 .where("a <= 999 and b <= 999").collect())
    assert got == exp
    hist = [(r["version"], r["op"]) for r in
            zorder_history(spark, path).orderBy("version").collect()]
    assert hist == [(0, "build"), (1, "append"), (2, "append"),
                    (3, "maintain"), (4, "restore")]


def test_zorder_maintain_crash_residue_is_safe(spark, tmp_path):
    """ADVICE r10 (medium): the re-layout must have NO window where
    the layout is unreadable or the ledger destroyed. New-design
    invariant: data files are immutable and the version JSON commit is
    the only visibility switch — simulate the crash by writing new
    data files WITHOUT a commit (exactly the residue a crash before
    _commit_version leaves) and check reads + ledger are unaffected,
    then that zorder_vacuum removes the residue."""
    import os

    from jcf_nb_migration_spark.io.zorder import (
        DATA_SUBDIR,
        append_zordered,
        zorder_vacuum,
        zordered_scan,
    )

    df = _frame(spark, n=2000)
    path = str(tmp_path / "zc")
    write_zordered(df, path, ["a", "b"], n_files=4)
    batch = _frame(spark, n=200, seed=3).selectExpr(
        "id + 100000 as id", "a", "b", "payload")
    assert append_zordered(batch, path, batch_id=1) is True
    # simulated crash: a half-finished re-layout wrote files but never
    # committed a version
    data_dir = os.path.join(path, DATA_SUBDIR)
    before = set(os.listdir(data_dir))
    df.limit(500).write.mode("append").parquet(data_dir)
    residue = {f for f in set(os.listdir(data_dir)) - before
               if f.endswith(".parquet")}
    assert residue
    # reads see exactly the committed content (no duplicates)
    got = _rows(zordered_scan(spark, path, {"a": (0, 9999)}))
    exp = _rows(df.unionByName(batch))
    assert got == exp
    # the replay ledger survived: batch 1 stays committed
    assert append_zordered(batch, path, batch_id=1) is False
    # vacuum deletes the unreferenced residue, keeps every live file
    n = zorder_vacuum(spark, path, keep_last=2)
    assert n == len(residue)
    assert _rows(zordered_scan(spark, path, {"a": (0, 9999)})) == exp


def test_zorder_vacuum_retention(spark, tmp_path):
    """Vacuum keeps the newest K versions readable, makes older AS-OF
    reads raise loudly, and deletes only files no retained version
    references."""
    import pytest as _pytest

    from jcf_nb_migration_spark.io.zorder import (
        append_zordered,
        zorder_maintain,
        zorder_vacuum,
        zordered_as_of,
    )

    df = _frame(spark, n=2000)
    path = str(tmp_path / "zv")
    write_zordered(df, path, ["a", "b"], n_files=4)             # v0
    b = _frame(spark, n=1500, seed=9).selectExpr(
        "id + 100000 as id", "a", "b", "payload")
    append_zordered(b, path, batch_id=1)                         # v1
    assert zorder_maintain(spark, path, max_appended_frac=0.25)  # v2
    exp_all = _rows(df.unionByName(b))
    deleted = zorder_vacuum(spark, path, keep_last=1)
    assert deleted > 0  # v0/v1's files dropped (v2 rewrote everything)
    assert _rows(zordered_as_of(spark, path, 2)) == exp_all
    with _pytest.raises(ValueError, match="no version 0"):
        zordered_as_of(spark, path, 0)


def test_three_column_zorder_prunes_each_dimension(spark, tmp_path):
    """bits x n_cols <= 63 admits 3 columns at 16 bits; a slice on ANY
    single dimension of a 3-D curve must still exclude files, and the
    scan stays exact under a 3-way conjunctive box."""
    rng = random.Random(17)
    rows = [(i, rng.randint(0, 999), rng.randint(0, 999),
             rng.randint(0, 999)) for i in range(30000)]
    df = spark.createDataFrame(rows, "id bigint, a bigint, b bigint, "
                                     "c bigint")
    path = str(tmp_path / "z3")
    write_zordered(df, path, ["a", "b", "c"], n_files=32, bits=16)
    _, total = zordered_file_count(spark, path, {"a": (0, 999)})
    for col in ("a", "b", "c"):
        surv, _ = zordered_file_count(spark, path, {col: (0, 99)})
        assert surv < total, (col, surv, total)
    box = {"a": (0, 299), "b": (300, 599), "c": (600, 999)}
    got = sorted(r["id"] for r in zordered_scan(spark, path, box)
                 .collect())
    exp = sorted(r["id"] for r in df.where(
        "a <= 299 and b between 300 and 599 and c >= 600").collect())
    assert got == exp


def test_rewrite_manifests_merges_segments(spark, tmp_path):
    """Manifest-only compaction (r11): after N appends the current
    version references N+1 segments; zorder_rewrite_manifests merges
    them into one WITHOUT touching data files — scans identical,
    pruning evidence identical, older versions still readable, and
    the maintain gate's appended-count survives the merge (a rewrite
    must not suppress a due re-layout)."""
    from jcf_nb_migration_spark.io.zorder import (
        _read_version,
        append_zordered,
        zorder_maintain,
        zorder_rewrite_manifests,
        zordered_as_of,
    )

    df = _frame(spark, n=4000)
    path = str(tmp_path / "zm")
    write_zordered(df, path, ["a", "b"], n_files=8)
    everything = df
    for i in range(1, 4):
        b = _frame(spark, n=400, seed=50 + i).selectExpr(
            f"id + {i} * 1000000 as id", "a", "b", "payload")
        append_zordered(b, path, batch_id=i)
        everything = everything.unionByName(b)
    man = _read_version(path, None)
    assert len(man["segments"]) == 4
    ranges = {"a": (0, 2999), "b": (0, 2999)}
    before_rows = _rows(zordered_scan(spark, path, ranges))
    before_counts = zordered_file_count(spark, path, ranges)
    assert zorder_rewrite_manifests(spark, path) is True       # v4
    assert zorder_rewrite_manifests(spark, path) is False      # no-op
    man2 = _read_version(path, None)
    assert len(man2["segments"]) == 1
    assert _rows(zordered_scan(spark, path, ranges)) == before_rows
    assert zordered_file_count(spark, path, ranges) == before_counts
    assert _rows(zordered_scan(spark, path, ranges)) == _rows(
        everything.where("a <= 2999 and b <= 2999"))
    # pre-rewrite versions still resolve
    assert zordered_as_of(spark, path, 1).count() == 4400
    # appended-count carried: the maintain gate still fires
    assert man2["n_appended"] == man["n_appended"] > 0
    assert zorder_maintain(spark, path, max_appended_frac=0.01) is True
