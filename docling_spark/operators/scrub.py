"""PII detection and redaction for training-data curation.

Pure ``pyspark.sql.functions`` — every pattern is a class-based ASCII
regex chosen so the Java (Spark) and RE2 (DuckDB oracle) engines agree
character-for-character: no backreferences, no lookaround, no unicode
classes. Counting runs on the ORIGINAL text per type (so counts are
independent of redaction order); redaction is a fixed left-to-right
chain (email → ssn → card → phone → ipv4) so nested matches resolve
deterministically in both engines.

At 100 TB this is a zero-shuffle projection: all five counters and the
five-deep ``regexp_replace`` chain stay inside whole-stage codegen, so
the operator rides along with whatever scan/filter stage precedes it.

This is an engine-side curation operator (no reference analogue —
docling extracts documents; a pretraining pipeline must scrub them).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, regex, replacement) — order IS the redaction chain order.
# Patterns are mutually non-nesting by construction: ssn (3-2-4) vs
# phone (3-3-4) differ in group shape; card (4x4) and ipv4 (dotted
# 1-3 digit quads) cannot overlap the dash/space shapes.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email",
     r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
     "<EMAIL>"),
    ("ssn",
     r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
     "<SSN>"),
    ("card",
     r"\b[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}\b",
     "<CARD>"),
    ("phone",
     r"\([0-9]{3}\) [0-9]{3}-[0-9]{4}|\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b",
     "<PHONE>"),
    ("ipv4",
     r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
     "<IPV4>"),
]


def scrubbed_col(text: Column) -> Column:
    """The redaction chain as a single nested-regexp_replace column."""
    out = text
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def with_pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, text, …) → per-type PII counts + total + redacted text.

    Counts are per-type over the raw text; ``n_pii`` is their sum;
    ``scrubbed`` is the chained redaction. Rows with ``n_pii = 0``
    pass through with ``scrubbed = text`` byte-identically.
    """
    text = F.col(text_col)
    counts = {
        name: F.size(F.regexp_extract_all(text, F.lit(pat), 0))
        for name, pat, _ in PII_PATTERNS
    }
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    return docs.select(
        "doc_id",
        *[counts[name].cast("int").alias(f"n_{name}")
          for name, _, _ in PII_PATTERNS],
        total.cast("int").alias("n_pii"),
        scrubbed_col(text).alias("scrubbed"),
    )
