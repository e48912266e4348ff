"""Document outline — the heading hierarchy as a relation.

The reference's body tree keeps headings as parents
(docs/concepts/docling_document.md:43-44; the HTML backend's level
stack html_backend.py:204-248); its users read the outline off the
tree. The Spark-native spelling derives the same structure RELATIONALLY
from the flattened span sequence: for every heading span, its level
(kind→level map) and the full heading trail (path) of the closest
preceding heading at each shallower level — no tree materialization,
no UDF.

Scale shape: one narrow explode, then ONE window pass per heading
LEVEL (a small constant: docling has title + section_header; deep
format profiles go to ~6) partitioned by doc_id — each is a single
shuffle on doc_id at worst, and consecutive windows share the same
partitioning so Catalyst plans ONE exchange and chains the sorts.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_LEVELS: Dict[str, int] = {"title": 0, "section_header": 1}


def heading_outline(extracted: DataFrame, *,
                    levels: Optional[Dict[str, int]] = None,
                    spans_col: str = "spans",
                    sep: str = " > ") -> DataFrame:
    """Extraction output (doc_id, spans) → one row per heading span:
    (doc_id, span_offset, level, title, path) where ``path`` joins the
    trail of nearest enclosing headings (shallower levels) with
    ``sep``, ending at the heading itself — 'Doc 7 > Stats' for the
    h2 under the h1. A deeper heading appearing before any shallower
    one has the missing ancestors simply absent from its path
    (html_backend's synthetic-group behavior flattens the same way).
    """
    lv = levels or DEFAULT_LEVELS
    lvl = None
    for kind, level in lv.items():
        cond = F.col("s.kind") == kind
        lvl = (F.when(cond, F.lit(level)) if lvl is None
               else lvl.when(cond, F.lit(level)))
    heads = (extracted.select(
        "doc_id",
        F.explode(spans_col).alias("s"))
        .select("doc_id",
                F.col("s.offset").alias("span_offset"),
                F.col("s.text").alias("title"),
                lvl.alias("level"))
        .where(F.col("level").isNotNull()))
    w = (Window.partitionBy("doc_id").orderBy("span_offset")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    trail = []
    for level in sorted(set(lv.values())):
        # nearest preceding heading AT this level; cleared when a
        # shallower heading resets the stack (a later shallower
        # heading has a larger offset, so max_by picks it and the
        # level-guard below drops stale deeper entries)
        anc = F.max_by(
            F.when(F.col("level") == level,
                   F.struct(F.col("span_offset").alias("o"),
                            F.col("title").alias("t"))),
            F.when(F.col("level") == level, F.col("span_offset"))
        ).over(w)
        trail.append((level, anc))
    # keep an ancestor only if no shallower heading appeared after it
    path_parts = []
    for level, anc in trail:
        shallower_after = None
        for l2, anc2 in trail:
            if l2 < level:
                c = (anc2.isNotNull() & (anc2["o"] > anc["o"]))
                shallower_after = c if shallower_after is None \
                    else (shallower_after | c)
        keep = anc.isNotNull() & (F.col("level") >= level)
        if shallower_after is not None:
            keep = keep & ~shallower_after
        path_parts.append(F.when(keep, anc["t"]))
    path = F.array_join(
        F.filter(F.array(*path_parts), lambda x: x.isNotNull()), sep)
    return heads.select("doc_id", "span_offset", "level", "title",
                        path.alias("path"))
