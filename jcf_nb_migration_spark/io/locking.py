"""Single-writer guard for the persisted layouts (VERDICT r11 item 4).

The four on-disk layouts (docstore, z-order, lexical/positional
serving indexes, vector index) share one commit-point protocol whose
crash-window recovery assumes ONE writer at a time: two concurrent
maintains racing the same ``<path>.old`` epoch swap, or a vacuum
interleaving with an upsert's bucket COW, can each interpret the
other's in-flight renames as crash residue. Filesystem layouts
without a catalog CAS (Delta on S3 has the same caveat; Iceberg
solves it with a catalog swap) cannot make concurrent writers safe —
so the contract here is explicit: every state-changing entry point
takes an exclusive on-disk writer lock and RAISES
``ConcurrentWriterError`` on conflict rather than corrupting state.

Mechanics:

- The lock is the SIBLING file ``<path>.writer.lock`` (beside the
  layout dir, not inside it — the maintains swap the whole dir, and a
  lock inside would travel into ``<path>.old`` mid-op, leaving the new
  live dir unguarded), created with ``O_CREAT | O_EXCL`` (atomic on
  POSIX local/NFSv3+ filesystems) and holding JSON
  ``{pid, host, op, ts}`` for diagnosis.
- Reentrant per THREAD: composite ops (maintain → compact, restore →
  residue recovery) nest freely within the thread that took the lock;
  a different thread of the same process conflicts exactly like a
  different process would (ADVICE r12 — a per-process set let a second
  thread run unguarded and lose the lock mid-mutation).
- Stale-lock recovery: a crashed writer leaves its lock behind. If the
  lock's host matches and its pid is no longer alive, the lock is
  broken automatically and the op proceeds (the layout's own crash
  recovery then handles any residue). The break is TOCTOU-safe: the
  lock is renamed aside atomically and unlinked only if it is still
  byte-for-byte the lock that was judged stale; a fresh lock acquired
  by a concurrent recoverer in the window is restored no-clobber and
  the break reported failed (ADVICE r12). A live pid — or a foreign
  host, where liveness can't be checked — raises with the holder's
  identity; ``break_writer_lock`` is the operator's explicit override.
- Readers never lock: probes/fetches/scans are versioned by manifests
  and snapshot file lists, so they see a consistent commit point
  regardless of concurrent writers.

At 100 TB the lock cost is one metadata create+unlink per mutation —
nothing against a data pass — and the guard converts the worst
distributed-storage failure mode (two schedulers launching the same
maintenance job) from silent corruption into an immediate, attributed
error.
"""

from __future__ import annotations

import json
import os
import socket
import threading
from contextlib import contextmanager

LOCK_SUFFIX = ".writer.lock"

# (thread_ident, realpath) -> nesting depth for locks THIS process
# holds. Keyed by thread so only genuine same-thread nesting is
# reentrant: a SECOND thread mutating the same layout concurrently is
# a conflict exactly like a second process would be (a plain realpath
# set once let it run unguarded, and the first thread's release then
# unlinked the on-disk lock mid-mutation — ADVICE r12).
_held: dict[tuple[int, str], int] = {}
_held_guard = threading.Lock()


class ConcurrentWriterError(RuntimeError):
    """A second writer attempted a state-changing op on a layout whose
    writer lock is held by a live process."""


def _lock_path(path: str) -> str:
    return path.rstrip("/") + LOCK_SUFFIX


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True  # exists, owned by someone else
    return True


def break_writer_lock(path: str) -> bool:
    """Operator override: remove a layout's writer lock uncondition-
    ally. Only safe after verifying the recorded holder is dead."""
    try:
        os.unlink(_lock_path(path))
        return True
    except FileNotFoundError:
        return False


def read_writer_lock(path: str) -> dict | None:
    """The current lock's ``{pid, host, op, ts}``, or None."""
    try:
        with open(_lock_path(path)) as fh:
            return json.load(fh)
    except FileNotFoundError:
        return None
    except (OSError, ValueError):
        return {}  # unreadable/corrupt lock: present but anonymous


def _try_acquire(path: str, op: str) -> bool:
    lp = _lock_path(path)
    try:
        fd = os.open(lp, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        return False
    import time

    with os.fdopen(fd, "w") as fh:
        json.dump({"pid": os.getpid(), "host": socket.gethostname(),
                   "op": op, "ts": time.time()}, fh)
    return True


def _break_if_still(path: str, stale: dict) -> bool:
    """Atomically break the lock at ``path`` ONLY if it is still the
    exact lock we judged stale (same pid/host/ts). Plain read-then-
    unlink is a TOCTOU (ADVICE r12): between judging the holder dead
    and unlinking, another recovering writer may have broken the stale
    lock and acquired a fresh LIVE one — unlinking that would let two
    writers mutate concurrently. Instead the lock is renamed to a
    process-unique name (atomic: exactly one renamer wins; losers get
    FileNotFoundError), inspected off to the side, and either
    discarded (still the stale one) or restored no-clobber via
    ``os.link`` (someone's fresh lock — put it back and report the
    break as failed)."""
    lp = _lock_path(path)
    tmp = f"{lp}.breaking.{os.getpid()}.{threading.get_ident()}"
    try:
        os.rename(lp, tmp)
    except FileNotFoundError:
        return True  # already broken by a concurrent recoverer
    try:
        with open(tmp) as fh:
            cur = json.load(fh)
    except (OSError, ValueError):
        cur = {}
    if (cur.get("pid") == stale.get("pid")
            and cur.get("host") == stale.get("host")
            and cur.get("ts") == stale.get("ts")):
        os.unlink(tmp)
        return True
    # We stole a LIVE lock created in the race window. Restore it
    # without clobbering any even-newer lock (link is atomic EEXIST).
    try:
        os.link(tmp, lp)
    except FileExistsError:
        # A third writer acquired meanwhile; tmp's owner and the new
        # holder now conflict — surface it loudly rather than pick.
        os.unlink(tmp)
        raise ConcurrentWriterError(
            f"layout at {path}: lost a three-way race while breaking "
            "a stale writer lock; manual break_writer_lock(path) "
            "required after verifying no writer is live")
    os.unlink(tmp)
    return False


@contextmanager
def writer_lock(path: str, op: str):
    """Exclusive writer lock over a layout dir for the duration of one
    state-changing op. Reentrant within the holding THREAD (composite
    ops nest); a different thread or process raises
    ``ConcurrentWriterError``."""
    if path is None or not os.path.isdir(path):
        # creation path / error path: the wrapped op either builds the
        # dir (naturally single-writer: O_EXCL-like dir semantics) or
        # raises its own no-such-layout error.
        yield
        return
    real = os.path.realpath(path)
    key = (threading.get_ident(), real)
    with _held_guard:
        reentrant = key in _held
        if reentrant:
            _held[key] += 1
        else:
            if any(k[1] == real for k in _held):
                # Another THREAD of this process holds the layout. The
                # on-disk lock records our pid, so the stale-pid path
                # would wrongly break it — conflict explicitly instead.
                raise ConcurrentWriterError(
                    f"layout at {path} has a live writer in another "
                    "thread of this process; concurrent mutation is "
                    "unsupported — serialize the ops")
            if not _try_acquire(real, op):
                holder = read_writer_lock(real) or {}
                same_host = holder.get("host") == socket.gethostname()
                stale = (same_host and isinstance(holder.get("pid"), int)
                         and (holder["pid"] == os.getpid()
                              or not _pid_alive(holder["pid"])))
                # holder["pid"] == os.getpid() without _held membership
                # means a crashed-and-recovered lock from OUR pid
                # (process restart reusing the pid is indistinguishable
                # from it and equally safe to break on one host).
                if not stale:
                    raise ConcurrentWriterError(
                        f"layout at {path} has a live writer "
                        f"(pid={holder.get('pid')} host="
                        f"{holder.get('host')} op={holder.get('op')}); "
                        "concurrent mutation is unsupported — wait for "
                        "it, or break_writer_lock(path) after verifying "
                        "the holder is dead")
                if not _break_if_still(real, holder):
                    raise ConcurrentWriterError(
                        f"layout at {path}: another writer recovered "
                        "the stale lock first and is live")
                if not _try_acquire(real, op):  # lost the re-race
                    raise ConcurrentWriterError(
                        f"layout at {path}: another writer re-acquired "
                        "the lock while breaking a stale one")
            _held[key] = 1
    try:
        yield
    finally:
        with _held_guard:
            _held[key] -= 1
            done = _held[key] == 0
            if done:
                del _held[key]
                # Unlink INSIDE the guard: once the _held entry is
                # gone, a sibling thread's acquisition (which also
                # runs under the guard) would find the on-disk lock
                # with OUR pid, judge it stale, break it, and acquire
                # a fresh one — and an unguarded deferred unlink here
                # would then delete that successor's LIVE lock,
                # reopening the two-writer hole. Under the guard the
                # delete-entry + unlink pair is atomic w.r.t. every
                # same-process acquisition; cross-process writers
                # never break a lock whose pid is alive, so they
                # cannot race this window at all.
                break_writer_lock(real)


def single_writer(fn):
    """Decorator: run ``fn`` under the layout writer lock. The layout
    dir is ``fn``'s ``path`` parameter (every mutating entry point in
    io/docstore.py, io/zorder.py, io/lexical.py, io/layout.py has
    one)."""
    import functools
    import inspect

    idx = list(inspect.signature(fn).parameters).index("path")

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        path = kwargs.get("path")
        if path is None and idx < len(args):
            path = args[idx]
        with writer_lock(path, fn.__name__):
            return fn(*args, **kwargs)

    return wrapper
