"""Export sinks — span table → rendered document strings
(SURVEY.md §2.5: the reference's export_to_markdown / export_to_text
docling-core serializers, invoked at cli/main.py:126-164).

Both renderers are PURE CATALYST (transform + concat/array_join over
the spans array): rendering 10^12 documents is a scan-speed projection
with zero Python. The markdown dialect is this engine's canonical
serialization (documented below), not a byte-clone of docling-core's
serializer — docling-core is an external dependency the reference
delegates to; the rule set here is fixed so the DuckDB oracle can
replay it:

    title          →  "# " + text
    section_header →  "## " + text
    list_item      →  "- " + text
    code           →  "```\\n" + text + "\\n```"
    picture        →  "<!-- image -->"
    table          →  canonical grid text (doctree.serialize_table)
    formula        →  "$$" + text + "$$"
    caption/other  →  text
    blocks joined with "\\n\\n"
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _render_span_md(s: Column) -> Column:
    kind = s["kind"]
    text = s["text"]
    return (
        F.when(kind == "title", F.concat(F.lit("# "), text))
        .when(kind == "section_header", F.concat(F.lit("## "), text))
        .when(kind == "list_item", F.concat(F.lit("- "), text))
        .when(kind == "code",
              F.concat(F.lit("```\n"), text, F.lit("\n```")))
        .when(kind == "picture", F.lit("<!-- image -->"))
        .when(kind == "formula", F.concat(F.lit("$$"), text, F.lit("$$")))
        .otherwise(text))


def markdown_col(spans: Column) -> Column:
    """Ordered spans array → one markdown string."""
    return F.array_join(F.transform(spans, _render_span_md), "\n\n")


def text_col(spans: Column) -> Column:
    """Plain-text export: body texts joined by newlines, media and
    tables skipped (the reference's export_to_text semantics)."""
    texts = F.filter(
        spans, lambda s: ~s["kind"].isin("picture", "table"))
    return F.array_join(
        F.transform(texts, lambda s: s["text"]), "\n")


def export_markdown(extracted: DataFrame,
                    spans_col: str = "spans") -> DataFrame:
    return extracted.select(
        "doc_id", markdown_col(F.col(spans_col)).alias("markdown"))


def export_text(extracted: DataFrame,
                spans_col: str = "spans") -> DataFrame:
    return extracted.select(
        "doc_id", text_col(F.col(spans_col)).alias("text"))
