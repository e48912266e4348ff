"""Mojibake detection and repair — the ftfy "fix_encoding" core
re-expressed as a zero-shuffle Arrow-batched Spark stage.

Web-scale crawl text is full of UTF-8 byte streams that some upstream
system decoded as windows-1252/latin-1 ("é" shipped as "Ã©",
"'" as "â€™"), sometimes twice ("é" as "ÃƒÂ©"). Left unrepaired,
these corrupt every downstream signal: exact-hash dedup misses the
clean twin, language ID misfires on the garbage codepoints, and the
tokens leak into training data verbatim. The reference pipeline never
sees this (it parses original bytes); a 10^12-doc crawl corpus does,
so the engine carries the repair pass as a first-class curation
operator, run right after `operators/normalize.py`.

Algorithm (deterministic, no language model — the subset of ftfy's
fixer that is provably safe):

1. Pure-ASCII rows short-circuit untouched (the overwhelming common
   case — one vectorized `isascii` check, no codec work).
2. One repair pass = re-encode the text as "sloppy windows-1252"
   (cp1252 with the five unmapped holes 0x81 0x8D 0x8F 0x90 0x9D
   filled latin-1-style, ftfy's `sloppy-windows-1252`), then strictly
   decode the bytes as UTF-8. The pass is ACCEPTED only when both
   codec steps succeed AND the result is strictly shorter than the
   input — a genuine multi-byte sequence collapsed. Real accented
   text ("café") fails the UTF-8 decode (0xE9 alone is invalid), so
   it can never be "repaired" into something else: the acceptance
   rule makes false positives structurally impossible, not just
   unlikely.
3. Passes repeat (bounded by ``max_passes``) so double-encoded
   mojibake unwinds fully; the pass counter is emitted so curation
   can quantify corpus encoding health per source.

Scale shape: a single pandas UDF projection fused into the scan stage
— no shuffle, no driver state; at 10^12 rows it pipelines exactly like
`canonicalized`. Python-side because no JVM builtin can roundtrip
codecs; Arrow-batched so the per-row cost is a C-speed encode/decode
on the rare non-ASCII rows only.

Reference counterpart: none in-tree (docling assumes correctly-decoded
input, docling/backend/html_backend.py trusts the upstream charset) —
this operator is part of the crawl-curation surface the engine adds
on top of the reference (SURVEY.md §2.6 extension family).
"""

from __future__ import annotations

import codecs

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# cp1252's five unmapped bytes, filled with their latin-1 meaning so a
# re-encode can reproduce ANY byte 0x80-0x9F an upstream decoder may
# have emitted (ftfy's "sloppy-windows-1252" trick).
def _sloppy_holes(exc):
    if isinstance(exc, UnicodeEncodeError):
        chunk = exc.object[exc.start:exc.end]
        if all(ord(c) <= 0xFF for c in chunk):
            return bytes(ord(c) for c in chunk), exc.end
    raise exc


codecs.register_error("docling_sloppy1252", _sloppy_holes)


def repair_once(s: str) -> str | None:
    """One mojibake-unwind pass; None = not mojibake (leave as is)."""
    try:
        b = s.encode("cp1252", "docling_sloppy1252")
    except UnicodeEncodeError:
        return None          # codepoints >0xFF: not a 1252 misdecode
    try:
        fixed = b.decode("utf-8")
    except UnicodeDecodeError:
        return None          # bytes aren't UTF-8: genuine legacy text
    if len(fixed) >= len(s):
        return None          # nothing collapsed: no repair evidence
    return fixed


def repair_text(s: str, max_passes: int = 3) -> tuple[str, int]:
    """Fully unwind nested mojibake; returns (fixed, n_passes)."""
    passes = 0
    while passes < max_passes and not s.isascii():
        fixed = repair_once(s)
        if fixed is None:
            break
        s, passes = fixed, passes + 1
    return s, passes


def repair_mojibake(docs: DataFrame, *, text_col: str = "text",
                    max_passes: int = 3) -> DataFrame:
    """Adds ``text_fixed`` (mojibake-unwound text), ``mojibake_passes``
    (0 = already clean), and ``n_chars_fixed``. Doc-local projection,
    zero shuffle."""

    @pandas_udf("text_fixed string, mojibake_passes int")
    def fix(texts: pd.Series) -> pd.DataFrame:
        out_t, out_p = [], []
        for s in texts:
            if s is None:
                out_t.append(None)
                out_p.append(None)
            else:
                t, p = repair_text(s, max_passes)
                out_t.append(t)
                out_p.append(p)
        return pd.DataFrame(
            {"text_fixed": out_t, "mojibake_passes": out_p})

    out = docs.withColumn("_fix", fix(F.col(text_col)))
    return (out
            .withColumn("text_fixed", F.col("_fix.text_fixed"))
            .withColumn("mojibake_passes", F.col("_fix.mojibake_passes"))
            .withColumn("n_chars_fixed",
                        F.length("text_fixed").cast("long"))
            .drop("_fix"))
