"""Engine-owned golden fixtures with a regeneration flag — the
adopt-for-engine analogue of the reference's DOCLING_GEN_TEST_DATA
pattern (/root/reference/tests/test_data_gen_flag.py:1-9,
tests/verify_utils.py:412-427): goldens live as span-sequence JSON
under tests/goldens/; setting DOCLING_SPARK_GEN_TEST_DATA=1 flips
every assertion into a writer that refreshes the stored golden.

Used for fixtures the reference ships no DoclingDocument groundtruth
for (asciidoc, synthetic typed pages); everything else asserts against
the reference's own goldens via docling_spark.golden."""

from __future__ import annotations

import json
import os
from pathlib import Path

GOLDEN_DIR = Path(__file__).parent / "goldens"
GEN_FLAG = "DOCLING_SPARK_GEN_TEST_DATA"


def gen_mode() -> bool:
    return os.environ.get(GEN_FLAG, "") == "1"


def assert_matches_golden(name: str, spans: list) -> None:
    """Compare spans against tests/goldens/<name>.json — or rewrite the
    golden when the regeneration flag is set (then always pass)."""
    path = GOLDEN_DIR / f"{name}.json"
    if gen_mode():
        GOLDEN_DIR.mkdir(exist_ok=True)
        with open(path, "w", encoding="utf-8") as f:
            json.dump(spans, f, indent=1, ensure_ascii=False)
            f.write("\n")
        return
    assert path.exists(), (
        f"missing golden {path} — regenerate with {GEN_FLAG}=1")
    with open(path, "r", encoding="utf-8") as f:
        want = json.load(f)
    # JSON round-trip normalizes tuples to lists
    got = json.loads(json.dumps(spans))
    assert got == want, f"span sequence differs from golden {name}"
