"""fslock — advisory lock-file for multi-writer sinks.

Extracted from ``streaming/sink.py``'s ``_SinkLock`` (round 6) so the
NetCDF record appender (``sources/netcdf.append_records_once``) can
reuse the exact same serialization discipline the upsert sink already
has: O_CREAT|O_EXCL acquisition (atomic on POSIX local filesystems),
RENAME-based stale-lock breaking, and token-checked release. Writers
that hold this lock must STILL fence their commit (a CAS on whatever
version/ledger they read at entry), because a lock broken as stale can
leave two holders alive — the lock gives mutual exclusion in the
common case, the fence gives correctness in the crashed-holder case.
"""

from __future__ import annotations

import os
import time


class PathLock:
    """Advisory lock-file serializing a read-merge-commit critical
    section across concurrent writer PROCESSES (two streaming queries
    pointed at one sink, or a restart racing its own zombie).

    Stale-lock breaking is RENAME-based: the breaker atomically renames
    the stale lock to a unique sidecar name before deleting it, so of N
    concurrent waiters exactly one rename succeeds (the others get
    ENOENT and go back to waiting) — an unlink-based break would let a
    slow second breaker delete the fast breaker's freshly-acquired NEW
    lock. Release is token-checked: __exit__ deletes the lock only if
    it still carries this holder's token, so a holder whose lock was
    broken cannot cascade the race by removing the next holder's lock."""

    def __init__(self, lock_path: str, timeout: float = 120.0, stale_after: float = 600.0):
        self.path = lock_path
        self.timeout = timeout
        self.stale_after = stale_after
        import uuid

        self.token = f"{os.getpid()}:{uuid.uuid4().hex}"

    def __enter__(self) -> "PathLock":
        deadline = time.monotonic() + self.timeout
        while True:
            try:
                fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, self.token.encode())
                os.close(fd)
                return self
            except FileExistsError:
                pass
            # every iteration below is deadline-bounded: a persistent
            # non-ENOENT stat failure (e.g. EACCES on the lock dir) must
            # time out, not busy-spin (ADVICE r6)
            retry_now = False
            try:
                stale = time.time() - os.path.getmtime(self.path) > self.stale_after
            except FileNotFoundError:
                stale = False
                retry_now = True  # holder released between exists and stat
            except OSError:
                stale = False  # unstat-able lock: treat as held, wait it out
            if stale:
                # atomic rename: exactly one waiter wins the break
                side = f"{self.path}.stale.{self.token.split(':')[0]}"
                try:
                    os.rename(self.path, side)
                    os.unlink(side)
                except OSError:
                    pass  # someone else broke it first
                retry_now = True
            if time.monotonic() > deadline:
                raise TimeoutError(
                    f"fslock: could not acquire {self.path} "
                    f"within {self.timeout}s"
                )
            if not retry_now:
                time.sleep(0.05)

    def still_held(self) -> bool:
        """True iff the lock file still carries THIS holder's token —
        lets a critical section re-verify ownership right before an
        irreversible write (a lock broken as stale leaves two holders
        alive; the fence, not the lock, guarantees correctness)."""
        try:
            with open(self.path) as fh:
                return fh.read() == self.token
        except OSError:
            return False

    def __exit__(self, *exc) -> None:
        try:
            with open(self.path) as fh:
                if fh.read() != self.token:
                    return  # our lock was broken; the file is someone else's
            os.unlink(self.path)
        except OSError:
            pass
