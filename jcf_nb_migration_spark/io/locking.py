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
- Reentrant per process: composite ops (maintain → compact, restore →
  residue recovery) nest freely; only a DIFFERENT process (or a
  different layout handle in the same process after release) conflicts.
- Stale-lock recovery: a crashed writer leaves its lock behind. If the
  lock's host matches and its pid is no longer alive, the lock is
  broken automatically and the op proceeds (the layout's own crash
  recovery then handles any residue). A live pid — or a foreign host,
  where liveness can't be checked — raises with the holder's identity;
  ``break_writer_lock`` is the operator's explicit override.
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

# realpaths whose lock THIS process already holds (reentrancy);
# thread-safe via _held_guard since tests drive racing threads.
_held: set[str] = set()
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


@contextmanager
def writer_lock(path: str, op: str):
    """Exclusive writer lock over a layout dir for the duration of one
    state-changing op. Reentrant within the process; raises
    ``ConcurrentWriterError`` if another live process holds it."""
    if path is None or not os.path.isdir(path):
        # creation path / error path: the wrapped op either builds the
        # dir (naturally single-writer: O_EXCL-like dir semantics) or
        # raises its own no-such-layout error.
        yield
        return
    real = os.path.realpath(path)
    with _held_guard:
        reentrant = real in _held
        if not reentrant:
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
                break_writer_lock(real)
                if not _try_acquire(real, op):  # lost the re-race
                    raise ConcurrentWriterError(
                        f"layout at {path}: another writer re-acquired "
                        "the lock while breaking a stale one")
            _held.add(real)
    try:
        yield
    finally:
        if not reentrant:
            with _held_guard:
                _held.discard(real)
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
