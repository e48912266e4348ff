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


_DOCTAG_BY_KIND = {
    "title": "title",
    "section_header": "section_header_level_1",
    "list_item": "list_item",
    "code": "code",
    "formula": "formula",
    "caption": "caption",
    "footnote": "footnote",
    "page_header": "page_header",
    "page_footer": "page_footer",
    "picture": "picture",
    "table": "otsl",
}


def _render_span_doctags(s: Column) -> Column:
    kind = s["kind"]
    expr = None
    for k, tag in _DOCTAG_BY_KIND.items():
        branch = F.concat(F.lit(f"<{tag}>"), s["text"], F.lit(f"</{tag}>"))
        expr = (F.when(kind == k, branch) if expr is None
                else expr.when(kind == k, branch))
    return expr.otherwise(
        F.concat(F.lit("<text>"), s["text"], F.lit("</text>")))


def doctags_col(spans: Column) -> Column:
    """Ordered spans array → one DocTags string.

    The tag vocabulary mirrors the reference's DocTags export
    (groundtruth ``*.doctags.txt``; docling-core serializer invoked at
    cli/main.py:126-164): ``<doctag>`` wrapper, one ``<tag>text</tag>``
    line per item, ``section_header`` → ``section_header_level_1``,
    tables as ``<otsl>`` islands. Differences (documented dialect): no
    ``<loc_*>`` tokens — our spans carry no page geometry — and table
    bodies are the engine's canonical grid text, not OTSL cell tokens."""
    body = F.array_join(F.transform(spans, _render_span_doctags), "\n")
    return F.concat(F.lit("<doctag>"), body, F.lit("</doctag>"))


def html_escape_col(text: Column) -> Column:
    """Minimal deterministic HTML escaping (&, <, >) — replayable in
    ANSI SQL with the same replace chain."""
    return F.replace(
        F.replace(
            F.replace(text, F.lit("&"), F.lit("&amp;")),
            F.lit("<"), F.lit("&lt;")),
        F.lit(">"), F.lit("&gt;"))


def _render_span_html(s: Column) -> Column:
    kind = s["kind"]
    text = html_escape_col(s["text"])
    return (
        F.when(kind == "title", F.concat(F.lit("<h1>"), text, F.lit("</h1>")))
        .when(kind == "section_header",
              F.concat(F.lit("<h2>"), text, F.lit("</h2>")))
        .when(kind == "list_item",
              F.concat(F.lit("<li>"), text, F.lit("</li>")))
        .when(kind == "code",
              F.concat(F.lit("<pre><code>"), text, F.lit("</code></pre>")))
        .when(kind == "caption",
              F.concat(F.lit("<figcaption>"), text, F.lit("</figcaption>")))
        .when(kind == "picture", F.lit("<figure></figure>"))
        .when(kind == "formula",
              F.concat(F.lit('<div class="formula">'), text,
                       F.lit("</div>")))
        .when(kind == "table",
              F.concat(F.lit('<pre class="table">'), text, F.lit("</pre>")))
        .otherwise(F.concat(F.lit("<p>"), text, F.lit("</p>"))))


def html_col(spans: Column) -> Column:
    """Ordered spans array → one standalone HTML document string (the
    reference's export_to_html sink, cli/main.py:126-164). Fixed
    dialect: h1/h2 headings, li items, pre/code blocks, figure
    placeholders, canonical grid text in a pre block."""
    body = F.array_join(F.transform(spans, _render_span_html), "\n")
    return F.concat(F.lit("<!DOCTYPE html>\n<html><body>\n"), body,
                    F.lit("\n</body></html>"))


def export_markdown(extracted: DataFrame,
                    spans_col: str = "spans") -> DataFrame:
    return extracted.select(
        "doc_id", markdown_col(F.col(spans_col)).alias("markdown"))


def export_doctags(extracted: DataFrame,
                   spans_col: str = "spans") -> DataFrame:
    return extracted.select(
        "doc_id", doctags_col(F.col(spans_col)).alias("doctags"))


def export_html(extracted: DataFrame,
                spans_col: str = "spans") -> DataFrame:
    return extracted.select(
        "doc_id", html_col(F.col(spans_col)).alias("html"))


def export_text(extracted: DataFrame,
                spans_col: str = "spans") -> DataFrame:
    return extracted.select(
        "doc_id", text_col(F.col(spans_col)).alias("text"))


def export_doctags_docling(corpus: DataFrame) -> DataFrame:
    """(doc_id, spans) with a serialized-DoclingDocument JSON payload →
    (doc_id, doctags) in the reference's FULL DocTags dialect —
    loc tokens (0-500 page grid, one quad per prov entry), OTSL table
    cell streams, nested captions, page breaks (doctags_dialect.py,
    byte-parity with all 11 reference ``*.doctags.txt`` goldens).

    One Arrow-batched stage, doc-local — at 100 TB this is a rendering
    map with zero shuffle. The pure-Catalyst ``export_doctags`` above
    stays the cheap path for span tables without provenance."""
    import json as _json

    import pandas as _pd

    def _render(batches):
        from docling_spark.doctags_dialect import render_doctags_docling
        for pdf in batches:
            out_ids, out_tags = [], []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                payload = spans[0]["text"] if len(spans) else "{}"
                try:
                    tags = render_doctags_docling(_json.loads(payload))
                except Exception as exc:  # malformed json → error tag
                    tags = f"<doctag><error>{exc}</error></doctag>"
                out_ids.append(doc_id)
                out_tags.append(tags)
            yield _pd.DataFrame({"doc_id": out_ids, "doctags": out_tags})

    return corpus.mapInPandas(_render, schema="doc_id string, doctags string")
