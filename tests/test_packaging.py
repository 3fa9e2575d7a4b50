"""spark-submit packaging stays in lockstep with the source tree (ADVICE r01:
a stale committed zip shipped code that diverged from HEAD — the zip is now
built at deploy time and this gate proves the builder captures everything)."""

import os
import zipfile

from scripts.package import main as build_zip


def test_zip_matches_source_tree(tmp_path, monkeypatch):
    out = build_zip()
    with zipfile.ZipFile(out) as zf:
        zipped = {n for n in zf.namelist() if n.endswith(".py")}
        # content parity, not just file-name parity
        for name in sorted(zipped):
            src = os.path.join(os.path.dirname(os.path.dirname(__file__)), name)
            with open(src, "rb") as fh:
                assert zf.read(name) == fh.read(), f"{name} differs from source"
    root = os.path.join(os.path.dirname(os.path.dirname(__file__)), "crawler_spark")
    on_disk = set()
    for dirpath, _dirs, files in os.walk(root):
        if "__pycache__" in dirpath:
            continue
        for fn in files:
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                on_disk.add(os.path.relpath(full, os.path.dirname(root)))
    assert zipped == on_disk, (
        f"zip out of sync: missing={sorted(on_disk - zipped)}, "
        f"extra={sorted(zipped - on_disk)}"
    )
