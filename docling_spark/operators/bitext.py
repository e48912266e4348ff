"""Bitext candidate mining — cross-language document alignment.

Parallel-corpus pipelines (ParaCrawl, Bañón et al. 2020; CCAligned,
El-Kishky et al. 2020) pair translation candidates BEFORE any
MT/embedding scoring with cheap structural signals: documents that are
translations of each other share their NUMBERS (dates, figures,
section numbers) and have comparable lengths, whatever the language.
The digit SKELETON (the ordered sequence of digit runs) is therefore a
high-precision join key: equijoin on it, then gate on a Gale-&-Church
style length ratio, and only the surviving candidate pairs ever reach
the expensive scoring stage.

No counterpart in the reference (single-document extraction); this is
a §2.7 training-data addition like url_dedup. Scale shape: ONE
equijoin on the skeleton hash — skeleton cardinality is near-document
cardinality for real text (dates/figures are document-specific), so
the join is well-distributed; documents with EMPTY skeletons (no
digits at all) are dropped before the join rather than colliding into
one catastrophic skew bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def digit_skeleton_col(text: Column) -> Column:
    """Ordered digit runs of a document joined with '|' — the
    language-independent structural fingerprint ('v2 of 2026' and
    'la v2 de 2026' → '2|2026'). Pure Catalyst."""
    return F.array_join(
        F.regexp_extract_all(text, F.lit(r"([0-9]+)"), 1), "|")


def bitext_candidates(docs: DataFrame, *, text_col: str = "text",
                      lang_col: str = "lang",
                      pivot_lang: str = "en",
                      max_len_ratio_e2: int = 200) -> DataFrame:
    """Candidate translation pairs between the pivot language and
    every other language: equijoin on the digit skeleton, then keep
    pairs whose char-length ratio (longer/shorter, ×100) is at most
    ``max_len_ratio_e2`` — the Gale-Church prior that translations
    have comparable lengths.

    Output: (doc_a, doc_b, lang_b, skeleton, len_ratio_e2) with doc_a
    from the pivot side. One shuffle on the skeleton key; empty
    skeletons are filtered out on BOTH sides before the join (they
    would otherwise all meet in one skew bucket)."""
    skel = digit_skeleton_col(F.col(text_col))
    base = docs.select(F.col("doc_id"), F.col(lang_col).alias("_lang"),
                       skel.alias("skeleton"),
                       F.length(text_col).alias("_len"))
    base = base.filter(F.col("skeleton") != "")
    a = base.filter(F.col("_lang") == pivot_lang).alias("a")
    b = base.filter(F.col("_lang") != pivot_lang).alias("b")
    ratio = (F.greatest(F.col("a._len"), F.col("b._len")) * 100
             / F.least(F.col("a._len"), F.col("b._len")))
    return (a.join(b, F.col("a.skeleton") == F.col("b.skeleton"))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"),
                    F.col("b._lang").alias("lang_b"),
                    F.col("a.skeleton").alias("skeleton"),
                    F.floor(ratio).cast("int").alias("len_ratio_e2"))
            .filter(F.col("len_ratio_e2") <= max_len_ratio_e2))
