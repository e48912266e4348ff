"""End-to-end test of jobs/curate.py — the composed curation pipeline
with snapshot commit and resume."""

import json
import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def test_curate_job_end_to_end_and_resume(spark, tmp_path, capsys):
    from jobs.curate import main

    out_root = str(tmp_path / "lake")
    argv = ["--input", "/root/testdata/sf0.001/documents.parquet",
            "--output", out_root,
            "--partitions", "4",
            "--lang", "en",
            "--source-gate",
            "--lm-gate-nll-e6", "4000000",
            "--strip-boilerplate",
            "--strip-substrings", "8",
            "--split",
            "--pack", "64"]
    assert main(argv, _spark=spark) == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["status"] == "committed"
    assert "source_reputation" in summary["side_outputs"]
    st = summary["stages"]
    assert st["input"] == 500
    assert (0 < st["after_curate"] <= st["after_lm_gate"]
            <= st["after_source_gate"] <= st["input"])
    assert st["output"] == st["after_curate"]
    assert "packing" in summary["side_outputs"]

    from docling_spark.lake import SnapshotTable
    table = SnapshotTable(out_root)
    snap = table.read(spark)
    assert snap.count() == st["output"]
    assert set(snap.columns) >= {"doc_id", "text", "n_tokens", "split"}
    assert {r["split"] for r in snap.select("split").distinct().collect()} \
        <= {"train", "val", "test"}
    packing = spark.read.parquet(summary["side_outputs"]["packing"])
    assert packing.count() == st["output"]

    # second run: everything already committed -> noop, snapshot count
    # unchanged
    assert main(argv, _spark=spark) == 0
    summary2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary2["status"] == "noop"
    assert table.read(spark).count() == st["output"]
