"""End-to-end `spark-submit --py-files` deployment check (north rule:
"ships as spark-submit --py-files wheels", BASELINE.json:6).

The job file is COPIED to a temp dir before launch so its
`sys.path.insert(repo_root)` line points at an empty parent — every
`docling_spark` import must resolve from the shipped zip, exactly as
on a cluster node that has never seen the repo checkout.  The zip is
rebuilt from the working tree first so the test exercises current
code, not a stale artifact.
"""

import json
import os
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent
SF_DIR = "/root/testdata/sf0.001"

SPARK_SUBMIT = shutil.which("spark-submit") or str(
    Path(sys.executable).parent.parent
    / "lib" / "python%d.%d" % sys.version_info[:2]
    / "site-packages" / "pyspark" / "bin" / "spark-submit")


@pytest.mark.skipif(not os.path.exists(SF_DIR), reason="testdata absent")
@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="spark-submit binary absent")
def test_spark_submit_pyfiles_end_to_end(tmp_path):
    # rebuild the bundle from the working tree
    subprocess.run([sys.executable, str(ROOT / "tools" / "make_pyfiles.py")],
                   check=True, capture_output=True)
    zip_path = ROOT / "dist" / "docling_spark.zip"
    assert zip_path.exists()

    # stage the job file OUTSIDE the repo: imports must come from the zip
    staged = tmp_path / "jobs" / "extract.py"
    staged.parent.mkdir()
    shutil.copy(ROOT / "jobs" / "extract.py", staged)

    out_dir = tmp_path / "lake"
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # nothing may leak the repo onto the path
    proc = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--conf", "spark.ui.enabled=false",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--py-files", str(zip_path),
         str(staged),
         "--input", f"synth:{SF_DIR}",
         "--output", str(out_dir),
         "--partitions", "8"],
        cwd=str(tmp_path), env=env,
        capture_output=True, text=True, timeout=420)
    assert proc.returncode == 0, proc.stderr[-4000:]

    summary = json.loads(
        [ln for ln in proc.stdout.strip().splitlines()
         if ln.startswith("{")][-1])
    assert summary["status"] == "committed"
    assert summary["docs"] and summary["docs"] > 0
    assert summary["spans"] and summary["spans"] > 0
    assert (summary["errors"] or 0) == 0

    # the committed snapshot is a readable table with lineage metrics
    manifest = out_dir / "_snapshots.json"
    assert manifest.exists()
    entries = json.loads(manifest.read_text())
    assert len(entries["snapshots"]) == 1

    # resume semantics survive the deployment boundary: a second
    # identical submit is a no-op (everything already committed)
    proc2 = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--conf", "spark.ui.enabled=false",
         "--py-files", str(zip_path),
         str(staged),
         "--input", f"synth:{SF_DIR}",
         "--output", str(out_dir),
         "--partitions", "8"],
        cwd=str(tmp_path), env=env,
        capture_output=True, text=True, timeout=420)
    assert proc2.returncode == 0, proc2.stderr[-4000:]
    summary2 = json.loads(
        [ln for ln in proc2.stdout.strip().splitlines()
         if ln.startswith("{")][-1])
    assert summary2["status"] == "noop"
