"""Diff the DocTags renderer against the reference's own
``*.doctags.txt`` goldens (whole-string, the reference's verify_export
gate). Usage: python tools/check_doctags_dialect.py [fixture_substring]"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from docling_spark.doctags_dialect import render_doctags_docling  # noqa: E402

GT = Path("/root/reference/tests/data/groundtruth/docling_v2")


def main() -> None:
    only = sys.argv[1] if len(sys.argv) > 1 else None
    n_ok = n_bad = 0
    for gt_path in sorted(GT.glob("*.doctags.txt")):
        name = gt_path.name[: -len(".doctags.txt")]
        if only and only not in name:
            continue
        doc = json.loads((GT / f"{name}.json").read_text())
        want = gt_path.read_text()
        got = render_doctags_docling(doc)
        if got == want:
            n_ok += 1
            print(f"OK   {name}")
            continue
        n_bad += 1
        print(f"DIFF {name}")
        wl, gl = want.splitlines(), got.splitlines()
        for i, (a, b) in enumerate(zip(wl, gl)):
            if a != b:
                # align the first differing character for fast triage
                j = next((k for k, (x, y) in enumerate(zip(a, b))
                          if x != y), min(len(a), len(b)))
                print(f"  line {i + 1} col {j + 1}")
                print(f"  want: …{a[max(0, j - 40):j + 60]}…")
                print(f"  got:  …{b[max(0, j - 40):j + 60]}…")
                break
        else:
            print(f"  line-count: want {len(wl)} got {len(gl)}")
            k = min(len(wl), len(gl))
            print(f"  next want: {wl[k][:100] if k < len(wl) else '<eof>'}")
            print(f"  next got:  {gl[k][:100] if k < len(gl) else '<eof>'}")
    print(f"{n_ok} ok, {n_bad} diff")


if __name__ == "__main__":
    main()
