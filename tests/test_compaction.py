"""Compaction bin planning (operators/compaction.py) — offset-binning
semantics vs a pure-Python reference, and the plan invariants."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from docling_spark.operators.compaction import compaction_bins  # noqa: E402


def _reference(rows, target, skip_at_least):
    # rows: (part, file_id, bytes) — offset binning per part
    out = {}
    by_part = {}
    for p, fid, b in sorted(rows):
        by_part.setdefault(p, []).append((fid, b))
    for p, fs in by_part.items():
        off = 0
        for fid, b in fs:
            bin_id = off // target
            st = out.setdefault((p, bin_id), [0, 0, fid, fid])
            st[0] += 1
            st[1] += b
            st[2] = min(st[2], fid)
            st[3] = max(st[3], fid)
            off += b
    return {k: (v[0], v[1], v[2], v[3], v[0] >= skip_at_least)
            for k, v in out.items()}


def test_bins_match_python_reference(spark):
    rows = [("p%d" % (i % 3), i, 10 + (i * 7) % 90) for i in range(200)]
    df = spark.createDataFrame(rows, "part string, file_id long, bytes long")
    got = {(r["part"], r["bin_id"]):
           (r["n_files"], r["bytes"], r["first_file"], r["last_file"],
            r["eligible"])
           for r in compaction_bins(df, part_col="part",
                                    target_bytes=200).collect()}
    assert got == _reference(rows, 200, 2)


def test_small_files_consolidate_large_stay(spark):
    # 100 tiny files + 1 already-large file: the tiny ones pack into
    # few eligible bins; the large one lands alone in ineligible bins
    rows = [("t", i, 1000) for i in range(100)] + [("big", 0, 10_000_000)]
    df = spark.createDataFrame(rows, "part string, file_id long, bytes long")
    plan = compaction_bins(df, part_col="part",
                           target_bytes=50_000).collect()
    tiny = [r for r in plan if r["part"] == "t"]
    assert len(tiny) == 2 and all(r["eligible"] for r in tiny)
    assert sum(r["n_files"] for r in tiny) == 100
    big = [r for r in plan if r["part"] == "big"]
    assert len(big) == 1 and not big[0]["eligible"]


def test_bin_never_splits_below_target_when_files_small(spark):
    # Offset binning's real guarantee: every bin except the last per
    # partition holds >= target - max_file + 1 bytes — a file
    # straddling the bin boundary is counted in the EARLIER bin, so a
    # bin can undershoot the target by at most one file minus one
    # byte.  Sizes are deliberately non-aligned (31 + (i*13) % 57
    # never sums to a multiple of 500) so the bound is actually
    # exercised, not masked by boundary alignment.
    sizes = [31 + (i * 13) % 57 for i in range(300)]
    rows = [("p", i, s) for i, s in enumerate(sizes)]
    df = spark.createDataFrame(rows, "part string, file_id long, bytes long")
    plan = sorted(compaction_bins(df, part_col="part",
                                  target_bytes=500).collect(),
                  key=lambda r: r["bin_id"])
    floor = 500 - max(sizes) + 1
    assert any(r["bytes"] < 500 for r in plan[:-1]), \
        "sizes aligned — bound not exercised"
    for r in plan[:-1]:
        assert r["bytes"] >= floor, r
