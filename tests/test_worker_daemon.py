"""The worker-daemon zipimport guard: unchanged archives skip the
central-directory re-read; changed archives still invalidate."""

import os
import zipfile

import pytest


@pytest.fixture()
def tiny_zip(tmp_path):
    p = tmp_path / "mod.zip"
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("pkg/__init__.py", "X = 1\n")
    return str(p)


def test_guard_skips_unchanged_archive(tiny_zip, monkeypatch):
    import zipimport

    from vearch_spark import worker_daemon as wd

    calls = []
    monkeypatch.setattr(
        wd, "_orig_invalidate", lambda self: calls.append(self.archive)
    )
    zi = zipimport.zipimporter(tiny_zip)
    wd._archive_stamps.pop(tiny_zip, None)

    wd._guarded_invalidate(zi)
    wd._guarded_invalidate(zi)
    wd._guarded_invalidate(zi)
    assert calls == [tiny_zip], "unchanged archive must re-read exactly once"

    # a real change (size/mtime) re-triggers the original invalidate
    with zipfile.ZipFile(tiny_zip, "a") as zf:
        zf.writestr("pkg/extra.py", "Y = 2\n")
    os.utime(tiny_zip, (0, 0))
    wd._guarded_invalidate(zi)
    assert calls == [tiny_zip, tiny_zip]


def test_guard_reads_fresh_zip_contents(tmp_path):
    """End-to-end through the real zipimport machinery: after a change
    plus invalidate, new modules in the zip are importable."""
    import importlib
    import sys
    import zipimport

    import vearch_spark.worker_daemon  # installs the guard

    assert zipimport.zipimporter.invalidate_caches.__name__ == (
        "_guarded_invalidate"
    )

    p = str(tmp_path / "live.zip")
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("live_mod_a.py", "A = 1\n")
    sys.path.insert(0, p)
    try:
        import live_mod_a

        assert live_mod_a.A == 1
        with zipfile.ZipFile(p, "a") as zf:
            zf.writestr("live_mod_b.py", "B = 2\n")
        importlib.invalidate_caches()
        import live_mod_b

        assert live_mod_b.B == 2
    finally:
        sys.path.remove(p)
        sys.modules.pop("live_mod_a", None)
        sys.modules.pop("live_mod_b", None)


def test_install_idempotent():
    import zipimport

    from vearch_spark import worker_daemon as wd

    before = zipimport.zipimporter.invalidate_caches
    wd.install()
    wd.install()
    assert zipimport.zipimporter.invalidate_caches is before
