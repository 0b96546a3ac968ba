"""Single-writer contract on the persisted layouts (VERDICT r11 item
4): every state-changing entry point of the docstore, z-order layout,
lexical index, and vector index takes the sibling ``<path>.writer.lock``
and raises ConcurrentWriterError instead of interleaving with another
live writer; stale locks from dead writers are broken automatically;
composite ops (maintain → compact) re-enter their own lock freely."""

import json
import os
import random

import pytest
from pyspark.sql import functions as F

from jcf_nb_migration_spark.io.locking import (
    ConcurrentWriterError,
    break_writer_lock,
    read_writer_lock,
    writer_lock,
)

SCHEMA = "doc_id bigint, text string, lang string, n_chars bigint"


def _docs(spark, ids):
    return spark.createDataFrame(
        [(i, f"body of doc {i}", "en" if i % 2 else "de", 100 + i)
         for i in ids], SCHEMA)


def _plant_foreign_lock(path, pid=1, host=None, op="other-writer"):
    """Simulate a second live writer: pid 1 is always alive and never
    ours."""
    import socket

    lp = path.rstrip("/") + ".writer.lock"
    with open(lp, "w") as fh:
        json.dump({"pid": pid, "host": host or socket.gethostname(),
                   "op": op, "ts": 0.0}, fh)
    return lp


# ---------------------------------------------------------------- unit

def test_conflict_with_live_writer_raises(tmp_path):
    d = str(tmp_path / "layout")
    os.makedirs(d)
    _plant_foreign_lock(d)
    with pytest.raises(ConcurrentWriterError, match="live writer"):
        with writer_lock(d, "op"):
            pass
    # the foreign lock is left in place for its owner
    assert read_writer_lock(d)["op"] == "other-writer"


def test_stale_dead_pid_lock_is_broken(tmp_path):
    import subprocess

    d = str(tmp_path / "layout")
    os.makedirs(d)
    child = subprocess.Popen(["sleep", "0"])
    child.wait()  # now certainly dead
    _plant_foreign_lock(d, pid=child.pid)
    ran = []
    with writer_lock(d, "op"):
        ran.append(read_writer_lock(d))
    assert ran[0]["pid"] == os.getpid()  # we re-acquired it
    assert read_writer_lock(d) is None   # and released it


def test_foreign_host_lock_never_auto_broken(tmp_path):
    d = str(tmp_path / "layout")
    os.makedirs(d)
    # dead pid but a host we can't check liveness on: must raise
    _plant_foreign_lock(d, pid=99999999, host="some-other-host")
    with pytest.raises(ConcurrentWriterError):
        with writer_lock(d, "op"):
            pass


def test_reentrant_within_process_and_released_on_error(tmp_path):
    d = str(tmp_path / "layout")
    os.makedirs(d)
    with writer_lock(d, "outer"):
        with writer_lock(d, "inner"):  # maintain → compact shape
            assert read_writer_lock(d)["op"] == "outer"
    assert read_writer_lock(d) is None
    with pytest.raises(RuntimeError, match="boom"):
        with writer_lock(d, "op"):
            raise RuntimeError("boom")
    assert read_writer_lock(d) is None  # released on the error path


def test_break_writer_lock_is_the_operator_override(tmp_path):
    d = str(tmp_path / "layout")
    os.makedirs(d)
    _plant_foreign_lock(d)
    assert break_writer_lock(d) is True
    assert read_writer_lock(d) is None
    assert break_writer_lock(d) is False  # idempotent
    with writer_lock(d, "op"):
        pass  # now acquirable


# ------------------------------------------------------ entry points

def test_docstore_mutations_guarded(spark, tmp_path):
    from jcf_nb_migration_spark.io.docstore import (
        docstore_build, docstore_fetch, docstore_upsert,
    )

    path = str(tmp_path / "ds")
    docstore_build(_docs(spark, range(20)), "wl_ds", path, num_buckets=4)
    before = sorted(r["text"] for r in
                    docstore_fetch(spark, "wl_ds", path, [3, 7]).collect())
    _plant_foreign_lock(path)
    with pytest.raises(ConcurrentWriterError):
        docstore_upsert(_docs(spark, [3]).withColumn(
            "text", F.lit("clobbered")), "wl_ds", path,
            num_buckets=4, batch_id=1)
    # blocked writer changed nothing
    after = sorted(r["text"] for r in
                   docstore_fetch(spark, "wl_ds", path, [3, 7]).collect())
    assert after == before
    break_writer_lock(path)
    docstore_upsert(_docs(spark, [3]).withColumn(
        "text", F.lit("v2")), "wl_ds", path, num_buckets=4, batch_id=1)
    assert sorted(r["text"] for r in docstore_fetch(
        spark, "wl_ds", path, [3]).collect()) == ["v2"]
    assert read_writer_lock(path) is None


def test_zorder_and_vector_mutations_guarded(spark, tmp_path):
    from jcf_nb_migration_spark.functions.similarity import kmeans_train
    from jcf_nb_migration_spark.io.layout import (
        ivf_index_delete, ivf_index_write,
    )
    from jcf_nb_migration_spark.io.zorder import (
        append_zordered, write_zordered,
    )
    from jcf_nb_migration_spark.registry import t
    from tests.conftest import SF_SMALL

    zp = str(tmp_path / "z")
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 31).alias("a"),
        (F.col("id") % 17).alias("b"))
    write_zordered(df, zp, ["a", "b"], n_files=4)
    _plant_foreign_lock(zp)
    with pytest.raises(ConcurrentWriterError):
        append_zordered(df.limit(10), zp, batch_id=1)
    break_writer_lock(zp)

    emb = t(spark, SF_SMALL, "embeddings")
    cents = kmeans_train(emb, k=4, iters=1)
    vp = str(tmp_path / "ivf")
    ivf_index_write(emb, cents, vp)
    _plant_foreign_lock(vp)
    with pytest.raises(ConcurrentWriterError):
        ivf_index_delete(spark, vp, [0], batch_id=1)
    break_writer_lock(vp)
    ivf_index_delete(spark, vp, [0], batch_id=1)  # and now it works


def test_lexical_maintain_reenters_its_own_lock(spark, tmp_path):
    """lexical_index_maintain internally calls lexical_index_compact —
    both are @single_writer'd on the same path; the composite must not
    self-deadlock or self-conflict."""
    from jcf_nb_migration_spark.io.lexical import (
        lexical_index_append, lexical_index_build, lexical_index_maintain,
    )

    def toks(ids):
        # one distinct token per doc so every bucket gets postings
        # files from both the build and the append (fragmentation gate)
        return spark.createDataFrame(
            [(i, ["spark", f"t{i}"] * (1 + i % 3)) for i in ids],
            "doc_id bigint, w array<string>")

    path = str(tmp_path / "lex")
    lexical_index_build(toks(range(40)), "wl_lex", path, num_buckets=4)
    lexical_index_append(toks(range(1_000_000_000_000,
                                    1_000_000_000_010)),
                         "wl_lex", path, num_buckets=4, batch_id=1)
    compacted = lexical_index_maintain(spark, "wl_lex", path,
                                       num_buckets=4,
                                       max_files_per_bucket=1)
    assert compacted is True
    assert read_writer_lock(path) is None


def test_interleaved_two_writer_fuzz(spark, tmp_path):
    """Random op interleavings against a docstore with a second writer
    appearing and disappearing between steps: every op attempted while
    the foreign writer holds the lock raises and leaves the store
    byte-identical; every op in a free window succeeds; the lock is
    always clean afterwards."""
    from jcf_nb_migration_spark.io.docstore import (
        docstore_append, docstore_build, docstore_compact,
        docstore_delete, docstore_fetch, docstore_upsert,
    )

    path = str(tmp_path / "fuzz")
    docstore_build(_docs(spark, range(30)), "wl_fuzz", path,
                   num_buckets=4)
    rng = random.Random(12012)
    next_id = 1000
    probe_ids = list(range(30)) + [1000, 1001, 1002]

    def state():
        return sorted(
            (r["doc_id"], r["text"]) for r in
            docstore_fetch(spark, "wl_fuzz", path, probe_ids).collect())

    def op_append(bid):
        nonlocal next_id
        docstore_append(_docs(spark, [next_id]), "wl_fuzz", path,
                        num_buckets=4, batch_id=bid)
        next_id += 1

    def op_upsert(bid):
        docstore_upsert(_docs(spark, [rng.randrange(30)]).withColumn(
            "text", F.lit(f"rev-{bid}")), "wl_fuzz", path,
            num_buckets=4, batch_id=bid)

    def op_delete(bid):
        docstore_delete(spark, "wl_fuzz", path, [rng.randrange(30)],
                        num_buckets=4, batch_id=bid)

    def op_compact(bid):
        docstore_compact(spark, "wl_fuzz", path, num_buckets=4)

    ops = [op_append, op_upsert, op_delete, op_compact]
    for step in range(12):
        op = rng.choice(ops)
        locked = rng.random() < 0.5
        if locked:
            before = state()
            _plant_foreign_lock(path)
            with pytest.raises(ConcurrentWriterError):
                op(100 + step)
            break_writer_lock(path)
            assert state() == before, f"step {step}: blocked op mutated"
        else:
            op(100 + step)
        assert read_writer_lock(path) is None, f"step {step}: lock leak"


# ------------------------------------------ ADVICE r12: thread safety

def test_second_thread_conflicts_not_reentrant(tmp_path):
    """A second THREAD mutating the same layout is a conflict, not a
    reentrant nesting (ADVICE r12): it must raise while the first
    thread holds the lock, and the first thread's release must leave
    the on-disk lock gone exactly once — never mid-mutation."""
    import threading

    d = str(tmp_path / "layout")
    os.makedirs(d)
    entered = threading.Event()
    release = threading.Event()
    errs = []

    def holder():
        with writer_lock(d, "thread-a"):
            entered.set()
            release.wait(10)

    def contender():
        entered.wait(10)
        try:
            with writer_lock(d, "thread-b"):
                errs.append("thread-b entered while thread-a held")
        except ConcurrentWriterError:
            pass
        else:
            if not errs:
                errs.append("no ConcurrentWriterError raised")

    ta = threading.Thread(target=holder)
    tb = threading.Thread(target=contender)
    ta.start(); tb.start()
    tb.join(20)
    # the on-disk lock must still be thread-a's, untouched by b's try
    assert read_writer_lock(d)["op"] == "thread-a"
    release.set()
    ta.join(20)
    assert errs == []
    assert read_writer_lock(d) is None
    with writer_lock(d, "after"):  # acquirable again once a released
        pass


def test_stale_break_is_toctou_safe(tmp_path):
    """ADVICE r12: breaking a stale lock must not unlink a FRESH lock
    acquired by a concurrent recoverer in the judge→break window. The
    break renames the lock aside, verifies it is still byte-identical
    to the one judged stale, and restores it no-clobber otherwise."""
    from jcf_nb_migration_spark.io.locking import _break_if_still

    d = str(tmp_path / "layout")
    os.makedirs(d)
    lp = d + ".writer.lock"

    # case 1: the lock is still the stale one -> broken, gone
    stale = {"pid": 12345, "host": "this-host", "op": "x", "ts": 1.0}
    with open(lp, "w") as fh:
        json.dump(stale, fh)
    assert _break_if_still(d, stale) is True
    assert not os.path.exists(lp)

    # case 2: a fresh LIVE lock replaced it in the window -> restored
    # untouched, break reported failed
    fresh = {"pid": os.getpid(), "host": "this-host", "op": "y",
             "ts": 2.0}
    with open(lp, "w") as fh:
        json.dump(fresh, fh)
    assert _break_if_still(d, stale) is False
    assert read_writer_lock(d) == fresh

    # case 3: already broken by a concurrent recoverer -> fine
    os.unlink(lp)
    assert _break_if_still(d, stale) is True


# ------------------------- VERDICT r12 item 5: real-process contention

_RACER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from jcf_nb_migration_spark.io.locking import (
    ConcurrentWriterError, writer_lock)
path, tag, hold = sys.argv[1], sys.argv[2], float(sys.argv[3])
wins = 0
conflicts = 0
for i in range(int(sys.argv[4])):
    try:
        with writer_lock(path, f"{{tag}}-{{i}}"):
            # mutate a shared counter file non-atomically: torn if two
            # writers ever overlap
            p = os.path.join(path, "counter")
            n = int(open(p).read()) if os.path.exists(p) else 0
            time.sleep(hold)
            with open(p, "w") as fh:
                fh.write(str(n + 1))
            wins += 1
    except ConcurrentWriterError:
        conflicts += 1
        time.sleep(hold / 2)
print(json.dumps({{"wins": wins, "conflicts": conflicts}}))
"""


def test_cross_process_contention_and_sigkill_recovery(tmp_path):
    """Two REAL processes race the same layout (the lock's whole
    design is separate-process exclusion): every round exactly one
    side mutates — the non-atomic read/sleep/write counter equals the
    total wins, which a torn overlap would break — and a SIGKILLed
    holder's leftover lock is broken by the stale-pid path, not
    leaked."""
    import subprocess
    import sys as _sys
    import textwrap
    import time

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    d = str(tmp_path / "layout")
    os.makedirs(d)
    script = textwrap.dedent(_RACER.format(repo=repo))
    rounds = 8
    procs = [
        subprocess.Popen(
            [_sys.executable, "-c", script, d, tag, "0.05", str(rounds)],
            stdout=subprocess.PIPE, text=True)
        for tag in ("a", "b")
    ]
    results = [json.loads(p.communicate(timeout=60)[0]) for p in procs]
    assert all(p.returncode == 0 for p in procs)
    total_wins = sum(r["wins"] for r in results)
    counter = int(open(os.path.join(d, "counter")).read())
    assert counter == total_wins, (results, counter)
    assert total_wins >= rounds  # liveness: contention never deadlocked
    assert read_writer_lock(d) is None  # no lock leaked

    # SIGKILL the holder mid-mutation: the lock survives the kill, a
    # fresh writer judges it stale (same host, dead pid) and proceeds
    holder = subprocess.Popen(
        [_sys.executable, "-c", script, d, "k", "30", "1"],
        stdout=subprocess.PIPE, text=True)
    for _ in range(200):
        lk = read_writer_lock(d)
        if lk and lk.get("pid") == holder.pid:
            break
        time.sleep(0.05)
    else:
        holder.kill()
        raise AssertionError("holder never acquired the lock")
    holder.kill()
    holder.wait()
    assert read_writer_lock(d)["pid"] == holder.pid  # leftover lock
    with writer_lock(d, "recoverer"):  # stale-pid path breaks it
        assert read_writer_lock(d)["pid"] == os.getpid()
    assert read_writer_lock(d) is None


def test_release_window_cannot_unlink_successor_lock(tmp_path, monkeypatch):
    """The release path must unlink its on-disk lock ATOMICALLY with
    the removal of its _held entry (both under _held_guard). If the
    unlink trailed outside the guard, a sibling thread acquiring in
    the gap — which legitimately breaks the releasing thread's
    same-pid on-disk lock as stale — would then have its FRESH lock
    deleted by the releaser's deferred unlink, leaving the successor
    mutating with no lock on disk (the two-writer hole, one level
    deeper than the ADVICE r12 TOCTOU).

    The unlink is forced slow via monkeypatch; thread B acquires while
    A's release is parked inside it. With the fix, B blocks on the
    guard until A's unlink completes and then holds a lock that stays
    on disk; unfixed, B's fresh lock is the one A unlinks."""
    import threading

    import jcf_nb_migration_spark.io.locking as lk

    d = str(tmp_path / "layout")
    os.makedirs(d)
    in_break = threading.Event()
    finish_break = threading.Event()
    real_break = lk.break_writer_lock

    def slow_break(path):
        in_break.set()
        finish_break.wait(10)
        return real_break(path)

    monkeypatch.setattr(lk, "break_writer_lock", slow_break)

    b_inside = threading.Event()
    b_release = threading.Event()
    b_err: list[BaseException] = []

    def thread_a():
        with lk.writer_lock(d, "a"):
            pass  # release path calls slow_break

    def thread_b():
        in_break.wait(10)
        try:
            with lk.writer_lock(d, "b"):
                b_inside.set()
                b_release.wait(10)
        except BaseException as exc:  # noqa: BLE001 - surfaced below
            b_err.append(exc)
            b_inside.set()

    ta = threading.Thread(target=thread_a)
    tb = threading.Thread(target=thread_b)
    ta.start(); tb.start()
    assert in_break.wait(10)
    # Give B the chance to (wrongly) slip past the guard while A's
    # unlink is parked; then let A's unlink run to completion.
    assert not b_inside.wait(0.3), (
        "thread B acquired while thread A's release was mid-unlink")
    finish_break.set()
    ta.join(20)
    assert b_inside.wait(10)
    assert b_err == []
    # B is inside its critical section: its lock must be on disk and
    # must be B's — A's deferred unlink must not have eaten it.
    cur = read_writer_lock(d)
    assert cur is not None and cur["op"] == "b", cur
    b_release.set()
    tb.join(20)
    assert read_writer_lock(d) is None
