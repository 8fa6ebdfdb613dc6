"""Shared guards for the scale smokes (VERDICT r13 #4): a smoke that
writes tens of GB into a nearly-full /tmp silently measures disk
pressure instead of the operator — 38 GB of stale smoke parquet once
tripled measured times.  Every smoke that writes bulk parquet calls
``ensure_tmp_capacity`` up front and fails LOUDLY if the target
filesystem cannot hold the run's write volume (with headroom)."""

from __future__ import annotations

import shutil
import tempfile


def ensure_tmp_capacity(
    need_bytes: int, path: str | None = None, headroom: float = 1.5
) -> str:
    """Assert the filesystem holding ``path`` (default: the system
    temp dir) has at least ``need_bytes * headroom`` free.  Returns
    the checked directory.  Raises RuntimeError with the numbers —
    never let a smoke start a run it cannot finish cleanly."""
    target = path or tempfile.gettempdir()
    usage = shutil.disk_usage(target)
    need = int(need_bytes * headroom)
    if usage.free < need:
        raise RuntimeError(
            f"smoke aborted: {target} has {usage.free / 1e9:.1f} GB free "
            f"but the run needs ~{need / 1e9:.1f} GB "
            f"({need_bytes / 1e9:.1f} GB writes x{headroom} headroom). "
            "Clean stale smoke output (ls -lt on the temp dir) and rerun."
        )
    return target
