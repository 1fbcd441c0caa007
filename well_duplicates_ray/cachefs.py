"""Race-proof /tmp artifact caches (VERDICT r3 "what's wrong" #1).

The driver's correctness/bench harness may run several processes
concurrently, each calling ``queries()`` entries whose FIRST call
materializes a fixture table or an index store under /tmp. Any crash or
mid-write read there kills the whole check before its first recorded
entry, so every cache build follows one protocol:

  * the finished artifact appears ATOMICALLY — builders write to a
    per-pid staging path and ``os.replace``/``os.rename`` it into place,
    so a concurrent reader never observes a half-written file;
  * an existing artifact is VALIDATED before reuse (parquet footer
    readable, directories non-empty) and rebuilt when corrupt — a
    killed earlier process cannot poison every later run;
  * losing a build race is benign: builds are deterministic, so the
    winner's artifact is byte-identical and the loser's staging copy is
    discarded.

POSIX rename semantics make this safe without locks: replacing a FILE
is atomic (readers holding the old fd keep the old inode); renaming a
staging DIRECTORY over an existing one fails loudly (ENOTEMPTY), which
is exactly the lost-the-race signal.
"""

from __future__ import annotations

import os
import shutil
from typing import Callable, Optional


def staging_path(path: str) -> str:
    """Per-pid staging sibling for an atomic build of ``path``."""
    return f"{path.rstrip('/')}.staging.{os.getpid()}"


def valid_parquet_file(path: str) -> bool:
    """True iff the file has a readable parquet footer (a half-written
    file fails here: the magic trailer is the last thing written)."""
    import pyarrow.parquet as pq

    try:
        pq.ParquetFile(path)
        return True
    except Exception:
        return False


def valid_artifact(path: str) -> bool:
    """Default validator: a parquet file, or a directory containing at
    least one valid parquet part file (staging leftovers excluded)."""
    if os.path.isdir(path):
        parts = [n for n in os.listdir(path) if n.endswith(".parquet")]
        return bool(parts) and all(
            valid_parquet_file(os.path.join(path, n)) for n in parts
        )
    return valid_parquet_file(path)


def _remove(path: str) -> None:
    if os.path.isdir(path):
        shutil.rmtree(path, ignore_errors=True)
    else:
        try:
            os.unlink(path)
        except OSError:
            pass


def commit_staging(staging: str, path: str) -> None:
    """Atomically move a finished staging artifact into place; losing a
    rename race (another process finished first) discards staging.

    Only the lost-the-race errnos are swallowed (ADVICE r4: a rename
    failing for any other reason — cross-device staging, permissions —
    must not silently discard the freshly built artifact), and even then
    the target must actually exist (the winner's copy)."""
    import errno

    try:
        if os.path.isdir(staging):
            os.rename(staging, path)  # fails if path exists non-empty
        else:
            os.replace(staging, path)
    except OSError as e:
        if e.errno not in (errno.ENOTEMPTY, errno.EEXIST):
            raise
        if not os.path.exists(path):
            raise
        _remove(staging)


def ensure_cached(
    path: str,
    build: Callable[[], None],
    validate: Optional[Callable[[str], bool]] = None,
) -> str:
    """Return ``path`` holding a valid cached artifact.

    ``build()`` must create ``path`` atomically (e.g. via
    ``staging_path``/``commit_staging`` or an internally-atomic writer
    like ``fixtures.write_images_parquet``). An existing artifact is
    validated and rebuilt when corrupt.
    """
    check = validate or valid_artifact
    if os.path.exists(path) and check(path):
        return path
    if os.path.exists(path):
        # Destroy-after-validate race guard (ADVICE r4): between the
        # failed validation above and this removal, a concurrent process
        # may have COMMITTED a valid artifact at ``path`` — re-check
        # immediately before removing so a good artifact is never yanked
        # out from under readers. A suspect directory is renamed aside
        # (atomic) rather than rmtree'd in place, so even the residual
        # window cannot expose readers to a half-deleted tree.
        if check(path):
            return path
        if os.path.isdir(path):
            trash = f"{path.rstrip('/')}.trash.{os.getpid()}"
            try:
                os.rename(path, trash)
            except OSError:
                pass  # someone else moved/replaced it first
            else:
                shutil.rmtree(trash, ignore_errors=True)
        else:
            _remove(path)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    build()
    if not os.path.exists(path) or not check(path):
        raise RuntimeError(f"cache build for {path} produced no valid artifact")
    return path
