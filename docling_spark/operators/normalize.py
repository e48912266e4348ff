"""Unicode canonicalization: NFC + control-char strip + whitespace
collapse, as one Arrow-batched pass.

This is the ftfy-lite stage that runs BEFORE any hash-based dedup:
composed ("é") and decomposed ("e" + U+0301) spellings of the same
text hash differently, so un-normalized corpora leak near-duplicates
straight through exact dedup. Running it as a single mapInArrow-shaped
pandas UDF keeps it zero-shuffle and embarrassingly parallel — at
10^12 docs it pipelines into the same stage as the parquet scan.

Spark has no built-in NFC function (as of 4.x), so this is a
legitimate pandas-UDF use: per-row logic the JVM can't express, still
Arrow-batched (no per-row Python calls at the boundary). The DuckDB
oracle replays the identical pipeline with its native nfc_normalize.
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# C0 controls (minus \t \n \r, which are content) + DEL. C1 is left
# alone: RE2 byte-classes vs code-point classes diverge on >0x7f, and
# the oracle must replay this exactly.
_CTRL = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]")
_HWS = re.compile(r"[ \t]+")


def _canonicalize(s: str) -> str:
    s = unicodedata.normalize("NFC", s)
    s = _CTRL.sub("", s)
    s = _HWS.sub(" ", s)
    # explicit char set (not str.strip()): Python's default also strips
    # unicode spaces (NBSP…) that SQL trim() keeps — the oracle must
    # replay this trim exactly
    return s.strip(" \t\n\r")


def _canon_udf():
    # built lazily: pandas_udf return-type parsing needs a live session
    @pandas_udf("string")
    def canon(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda s: _canonicalize(s) if s is not None else None)
    return canon


def canonicalized(docs: DataFrame, *, text_col: str = "text") -> DataFrame:
    """Adds `text_norm` (canonical form), `n_chars_norm`, and
    `norm_sha256` columns. Doc-local, zero shuffle."""
    out = docs.withColumn("text_norm", _canon_udf()(F.col(text_col)))
    return (out
            .withColumn("n_chars_norm", F.length("text_norm").cast("long"))
            .withColumn("norm_sha256", F.sha2(F.col("text_norm"), 256)))
