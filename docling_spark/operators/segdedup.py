"""Segment-level exact deduplication (Dolma / RefinedWeb paragraph
dedup, spelled over fixed token windows).

Dolma (Soldaini et al. 2024) and RefinedWeb (Penedo et al. 2023)
remove EXACT duplicate paragraphs across the whole corpus, keeping
only the first occurrence — the middle granularity between
whole-document exact dedup (``dedup.dedup_exact``) and suffix-array
substring dedup (``substring.dedup_substrings``). On corpora without
newline structure the unit is a fixed window of W tokens
(non-overlapping; trailing remainder kept), which is also how Dolma's
paragraph splitter degrades on minified web text.

Semantics: a segment occurrence survives iff it is the globally FIRST
occurrence of that exact segment text, "first" = smallest
``(doc_id, seg_idx)`` — deterministic and replayable by an oracle.
Every input document yields exactly one output row (possibly with
empty text when all its segments were seen earlier).

Scale shape: ONE shuffle — segments are exploded narrow (no
re-tokenization per use; the token array is materialized once), then
a single window-min over ``partition by seg`` marks keepers (the
min needs no ordered frame; WindowExec's local sort is on the
partition key only), and the per-doc reassembly groupBy reuses the
doc_id-keyed input partitioning when the source is bucketed by
doc_id. No joins, no global sorts. Hot boilerplate segments (the
only skew source: partition size = duplicate multiplicity) are the
df-threshold case handled upstream by
``dedup.boilerplate_line_removal``; run it first on web corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import norm_text


def doc_segments(docs: DataFrame, *, window_tokens: int = 16) -> DataFrame:
    """(doc_id, text) → (doc_id, seg_idx, seg): non-overlapping
    W-token windows of the normalized text, in order. The token array
    is materialized as a column once (array HOFs are interpreted —
    embedding the tokenizer at every use site re-tokenizes per use)."""
    w = window_tokens
    staged = docs.select("doc_id", F.split(norm_text(), " ").alias("_t"))
    segs = F.transform(
        F.sequence(F.lit(0),
                   F.ceil(F.size("_t") / F.lit(w)).cast("int") - 1),
        lambda i: F.array_join(F.slice("_t", i * w + 1, w), " "))
    return (staged
            .select("doc_id", F.posexplode(segs)
                    .alias("seg_idx", "seg")))


def dedup_segments(docs: DataFrame, *,
                   window_tokens: int = 16) -> DataFrame:
    """(doc_id, text) → (doc_id, n_segs, n_kept, text) — corpus-wide
    exact segment dedup keeping first occurrences; ``text`` is the
    document re-assembled from its surviving segments in order."""
    segs = doc_segments(docs, window_tokens=window_tokens)
    keeper = F.min(F.struct("doc_id", "seg_idx")) \
        .over(Window.partitionBy("seg"))
    marked = segs.select(
        "doc_id", "seg_idx", "seg",
        (F.struct("doc_id", "seg_idx") == keeper).alias("kept"))
    return (marked.groupBy("doc_id")
            .agg(F.count("*").cast("int").alias("n_segs"),
                 F.sum(F.col("kept").cast("int")).cast("int")
                 .alias("n_kept"),
                 F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(
                             F.when(F.col("kept"),
                                    F.struct("seg_idx", "seg")))),
                         lambda s: s["seg"]),
                     " ").alias("text")))
