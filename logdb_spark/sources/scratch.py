"""Process-scoped scratch directories for sink/roundtrip operators.

ADVICE r4: every sink-style operator used to `tempfile.mkdtemp()` per
invocation and never clean up, so repeated bench/diffcheck runs
accumulated unbounded /tmp usage (each run writes a full copy of the
table it round-trips). All scratch now lives under ONE per-process
root that an atexit hook removes — a crashed run leaves at most one
root behind, and the next run never re-reads a stale one (fresh
mkdtemp per process).

At 100 TB the same call sites would point at a job-scoped object-store
staging prefix with a TTL lifecycle rule; the local tempdir stands in
for that, and the cleanup discipline is the same contract.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_ROOT: str | None = None


def scratch_dir(prefix: str) -> str:
    """A fresh empty directory under the process scratch root.

    Callers treat it exactly like `tempfile.mkdtemp(prefix=...)` —
    unique per call, safe to write immediately — but the whole root is
    removed at interpreter exit instead of leaking."""
    global _ROOT
    if _ROOT is None:
        _ROOT = tempfile.mkdtemp(prefix="logdb_scratch_")
        atexit.register(shutil.rmtree, _ROOT, ignore_errors=True)
    return tempfile.mkdtemp(prefix=prefix, dir=_ROOT)
