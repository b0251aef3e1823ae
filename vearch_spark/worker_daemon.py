"""Python-worker daemon entrypoint: stock pyspark daemon + a zipimport fix.

Spark's worker protocol calls ``importlib.invalidate_caches()`` once per
task (``setup_spark_files``) so newly shipped pyfiles become importable.
On Python 3.11, ``zipimporter.invalidate_caches()`` unconditionally
re-reads the archive's central directory, and a warm worker's
``sys.path_importer_cache`` holds one zipimporter per probed package
subpath of ``pyspark.zip`` — measured 13 entries x ~14 ms = ~190 ms of
fixed latency added to EVERY Python-runner task, dwarfing the work of
small Arrow kernels (a no-op 16-task mapInPandas stage measured ~390 ms
wall with ~3 ms of actual compute per task).

CPython 3.12+ guards the re-read with an archive ``(mtime, size)``
check (python/cpython commit for gh-84443 follow-up work); this module
backports that guard, then hands off to the unmodified pyspark daemon
loop. Workers fork from the daemon after import, so the patch applies
to every worker. Semantics are preserved: a genuinely changed archive
(different mtime or size) still triggers the full directory re-read, so
runtime-added zip/egg pyfiles keep working.

Activated by ``spark.python.daemon.module=vearch_spark.worker_daemon``
(set in :mod:`vearch_spark.session`). The package directory must be on
the worker interpreter's ``PYTHONPATH``; the session factory exports it
before the JVM launches.
"""

from __future__ import annotations

import os
import zipimport

_orig_invalidate = zipimport.zipimporter.invalidate_caches
_archive_stamps: dict[str, tuple[float, int]] = {}


def _guarded_invalidate(self) -> None:  # noqa: ANN001 - stdlib method sig
    """Re-read the zip directory only when the archive actually changed."""
    try:
        st = os.stat(self.archive)
        stamp = (st.st_mtime, st.st_size)
    except OSError:
        stamp = None
    if stamp is not None and _archive_stamps.get(self.archive) == stamp:
        return
    _orig_invalidate(self)
    if stamp is not None:
        _archive_stamps[self.archive] = stamp


def install() -> None:
    """Apply the guard (idempotent)."""
    if zipimport.zipimporter.invalidate_caches is not _guarded_invalidate:
        zipimport.zipimporter.invalidate_caches = _guarded_invalidate


install()


if __name__ == "__main__":
    from pyspark.daemon import manager

    manager()
