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


def test_spark_submit_py_files_end_to_end(tmp_path):
    """The north rule's deployment shape, actually executed: build the zip,
    launch a FRESH JVM via spark-submit --py-files from a cwd outside the
    repo (so every crawler_spark import must resolve from the zip), run a
    2-round fixture crawl, and assert the store committed pages + metrics.
    This is the gate that the engine runs under cluster submission, not just
    under the test session's interpreter."""
    import json
    import shutil
    import subprocess
    import sys

    import pyspark

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zip_path = build_zip()
    submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(pyspark.__file__), "bin", "spark-submit"
    )
    assert os.path.exists(submit), "spark-submit not found"
    store = str(tmp_path / "store")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            submit, "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", zip_path,
            os.path.join(repo, "scripts", "run_crawl.py"),
            "--store", store, "--rounds", "2", "--hosts", "2", "--budget", "4",
            # audited mode rides the same submission: every round commits
            # write-audit-publish behind the standard gates, so the zip must
            # also ship engine/audits.py and the WAP store methods
            "--audited",
        ],
        cwd=str(tmp_path),  # NOT the repo: imports must come from the zip
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert len(out["rounds"]) >= 1  # one metrics dict per executed round
    assert all(m.get("published") for m in out["rounds"])  # gates all passed
    from crawler_spark.engine.snapshots import SnapshotStore

    st = SnapshotStore(store)
    assert st.latest_round() >= 0
    assert st.table_rows("pages") > 0, "submitted crawl fetched no pages"
    assert any(
        m.get("n_fetched", 0) > 0 for m in st.round_metrics()
    ), "metrics missing from submitted crawl"
