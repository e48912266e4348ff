"""Chunking — the engine's analogue of the reference's chunker
re-exports (/root/reference/docling/chunking/__init__.py: docling-core
HybridChunker / HierarchicalChunker) re-expressed as a RELATIONAL
operator: token-budgeted span packing with heading context.

Docling's HybridChunker walks the document tree object-by-object; at
10^12 documents the same semantics decompose into window functions —
per-document cumulative token sums assign spans to chunks, a running
last_value(heading) carries the section context — so the whole
operator is doc-local shuffles + whole-stage codegen, zero Python.

Chunk rule (deterministic, replayable in ANSI SQL): a span with
cumulative-token-count-before C belongs to chunk floor(C / max_tokens).
Furniture-ish kinds (picture) contribute no tokens but travel with
their chunk.

For the full docling-core HybridChunker parity contract — leveled
heading trails, list-item merge, caption binding, split-then-merge
sizing — see operators/hierchunk.py (chunk_documents_hier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def chunk_documents(extracted: DataFrame, *, max_tokens: int = 64,
                    spans_col: str = "spans") -> DataFrame:
    """(doc_id, spans) → (doc_id, chunk_id, heading, text, n_tokens).

    heading = the nearest preceding title/section_header at the chunk's
    first span (the HybridChunker's context metadata)."""
    s = (extracted
         .select("doc_id", F.explode(spans_col).alias("s"))
         .select("doc_id",
                 F.col("s.offset").alias("offset"),
                 F.col("s.kind").alias("kind"),
                 F.col("s.text").alias("text")))
    n_tokens = F.when(F.col("kind") == "picture", F.lit(0)) \
                .otherwise(F.size(F.split("text", " ")))
    s = s.withColumn("n_tok", n_tokens)

    w = Window.partitionBy("doc_id").orderBy("offset")
    cum_before = (F.sum("n_tok").over(
        w.rowsBetween(Window.unboundedPreceding, -1)))
    heading = F.last(
        F.when(F.col("kind").isin("title", "section_header"),
               F.col("text")), ignorenulls=True).over(w)
    s = (s.withColumn("chunk_id",
                      F.floor(F.coalesce(cum_before, F.lit(0))
                              / F.lit(max_tokens)).cast("int"))
          .withColumn("heading", heading))

    return (s.groupBy("doc_id", "chunk_id")
            .agg(F.min_by("heading", "offset").alias("heading"),
                 F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(
                             F.struct("offset", "text"))),
                         lambda x: x["text"]), "\n").alias("text"),
                 F.sum("n_tok").alias("n_tokens")))
