"""Process-scoped scratch directories for queries that materialize state.

Catalog queries that exercise the ZoneStore / streaming sinks need a
writable directory per invocation.  ``tempfile.mkdtemp`` alone leaks one
parquet tree per call (bench runs each headline query 3x; the correctness
gate runs the whole catalog) — so every scratch dir is allocated under ONE
per-process root that is removed at interpreter exit.  Each call still
gets a fresh, never-reused subdirectory, which keeps APPEND-commit counts
deterministic and makes concurrent pytest/bench processes collision-free
(each process has its own root).
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_ROOT: str | None = None


def scratch_dir(prefix: str) -> str:
    """Return a fresh empty directory deleted at process exit."""
    global _ROOT
    if _ROOT is None:
        _ROOT = tempfile.mkdtemp(prefix="hdls_scratch_")
        atexit.register(shutil.rmtree, _ROOT, ignore_errors=True)
    return tempfile.mkdtemp(prefix=prefix, dir=_ROOT)
