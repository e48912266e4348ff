"""docling_spark — a brand-new PySpark-native document-extraction engine.

Re-builds the capabilities of DS4SD/docling (reference at
/root/reference, studied for semantics only — no code copied) as an
idiomatic Spark pipeline: an Iceberg/Parquet table of interleaved
text+media documents `(doc_id, spans)` goes through Arrow-batched
`mapInPandas` extraction UDFs and comes out as ordered span arrays
`(kind, text, media_ref, offset)` per document, with per-doc error
containment, per-partition lineage metrics, skew salting and
snapshot-checkpoint resume.

Layout:
  doctree   — the in-UDF document tree (analogue of DoclingDocument)
  golden    — groundtruth-fixture → golden-span derivation (test contract)
  parsers/  — stdlib-only format parsers (html, md, csv, asciidoc, pdf_page)
  operators/— Spark operators: extract, dedup, similarity, textstats, media
  sources/  — lake (snapshot/manifest checkpointing), corpus synthesis
  plans/    — end-to-end job plans (extract pipeline)
"""

__version__ = "0.1.0"
