"""HTML head-metadata extraction — title, canonical URL, description,
OpenGraph properties and JSON-LD entity types.

Crawl pipelines read a page's <head> before (and often instead of) its
body: the canonical link collapses URL-level duplicates that byte
hashing cannot (`?utm_source` mirrors declaring one canonical), the
OpenGraph block is the highest-precision title/image/description
source on the modern web, and JSON-LD ``@type`` values (Article,
Product, Recipe, ...) drive page-type routing long before any layout
model runs. The reference's HTML backend walks only <body> content
(`/root/reference/docling/backend/html_backend.py:101-127` resolves
the content root to <body> and never visits <head>), so at crawl
scale the head block would be silently discarded — this operator
makes it a first-class relational output instead.

Plan shape: ONE Arrow-batched pandas UDF projection per document
(reusing ``parsers/dom.py::parse_html``, the same tokenizer the
extraction backend uses) emitting a flat struct — no explode, no
shuffle. At 10^12 rows it composes with the extraction pass itself:
one more struct column on the same scan, never a second parse of the
corpus (callers that need both spans and metadata should project both
UDFs over one cached parse batch; see jobs/extract.py).

JSON-LD handling is deliberately shallow and deterministic: the UDF
collects every ``@type`` string reachable from the top-level value of
each ``application/ld+json`` script block (dict, list-of-dict, and
``@graph`` forms), sorted + de-duplicated, joined with ``|``. Schema
validation / vocabulary expansion is out of scope (needs the live
schema.org context).
"""

from __future__ import annotations

import json
from typing import List, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from docling_spark.parsers.dom import Element, parse_html

_META_DDL = ("struct<title:string,canonical:string,description:string,"
             "og_title:string,og_image:string,og_type:string,"
             "jsonld_types:string,robots_meta:string,n_meta:int>")


def _script_payload(node: Element) -> str:
    """Raw (preformatted) text of a <script> element."""
    parts: List[str] = []
    for child in node.children:
        data = getattr(child, "data", None)
        if data is not None:
            parts.append(data)
    return "".join(parts)


def _jsonld_types(payload: str) -> List[str]:
    """Every @type string reachable from the block's top-level value:
    a bare dict, a list of dicts, and the @graph envelope."""
    try:
        value = json.loads(payload)
    except (ValueError, TypeError):
        return []
    nodes = value if isinstance(value, list) else [value]
    out: List[str] = []
    for node in nodes:
        if not isinstance(node, dict):
            continue
        graph = node.get("@graph")
        inner = graph if isinstance(graph, list) else [node]
        for item in inner:
            if not isinstance(item, dict):
                continue
            t = item.get("@type")
            if isinstance(t, str):
                out.append(t)
            elif isinstance(t, list):
                out.extend(x for x in t if isinstance(x, str))
    return out


def extract_metadata(html: str) -> dict:
    """Head metadata of one document as a flat dict (first-wins for
    singular fields, matching browser behavior for duplicate tags)."""
    title: Optional[str] = None
    canonical: Optional[str] = None
    description: Optional[str] = None
    robots: Optional[str] = None
    og = {}
    jsonld: List[str] = []
    n_meta = 0
    for node in parse_html(html).descendants():
        if node.__class__ is not Element:
            continue
        name = node.name
        if name == "title" and title is None:
            title = " ".join(node.text.split())
        elif name == "link":
            rel = (node.attrs.get("rel") or "").lower()
            if canonical is None and "canonical" in rel.split():
                canonical = node.attrs.get("href")
        elif name == "meta":
            n_meta += 1
            mname = (node.attrs.get("name") or "").lower()
            prop = (node.attrs.get("property") or "").lower()
            content = node.attrs.get("content")
            if content is None:
                continue
            if description is None and mname == "description":
                description = content
            elif robots is None and mname == "robots":
                robots = content
            elif prop.startswith("og:"):
                og.setdefault(prop[3:], content)
        elif name == "script":
            stype = (node.attrs.get("type") or "").lower()
            if stype == "application/ld+json":
                jsonld.extend(_jsonld_types(_script_payload(node)))
    return {
        "title": title,
        "canonical": canonical,
        "description": description,
        "og_title": og.get("title"),
        "og_image": og.get("image"),
        "og_type": og.get("type"),
        "jsonld_types": "|".join(sorted(set(jsonld))) if jsonld else "",
        "robots_meta": robots,
        "n_meta": n_meta,
    }


def metadata_udf(col) -> "F.Column":
    """The head-metadata struct as a reusable Arrow projection (NULL
    html → all-NULL struct, the row survives)."""

    @pandas_udf(_META_DDL)
    def meta(htmls: pd.Series) -> pd.DataFrame:
        rows = [extract_metadata(h) if h is not None else
                dict.fromkeys(("title", "canonical", "description",
                               "og_title", "og_image", "og_type",
                               "jsonld_types", "robots_meta"), None)
                | {"n_meta": None}
                for h in htmls]
        return pd.DataFrame(rows)

    return meta(col)


def html_metadata(df: DataFrame, *, html_col: str = "html") -> DataFrame:
    """(doc_id, html, ...) → input columns minus ``html_col`` plus
    (title, canonical, description, og_title, og_image, og_type,
    jsonld_types, robots_meta, n_meta). Zero shuffle: one Arrow UDF
    projection."""
    keep = [c for c in df.columns if c != html_col]
    return (df.withColumn("_m", metadata_udf(F.col(html_col)))
            .select(*keep, "_m.*"))


def noindex_gate(df: DataFrame, *, html_col: str = "html") -> DataFrame:
    """Drop documents whose <meta name=robots> carries a ``noindex``
    token (comma/space-separated, case-insensitive) — the page-level
    opt-out a crawl corpus must honor alongside robots.txt (RFC 9309
    gates the FETCH; the robots meta gates the USE of a fetched page).
    ALL input columns pass through (a gate must not eat the payload);
    zero shuffle — the filter rides the same Arrow metadata
    projection, so it composes into the extraction scan. Docs with no
    robots meta (or NULL html) default to indexable."""
    tokens = F.split(
        F.lower(F.coalesce(metadata_udf(F.col(html_col))["robots_meta"],
                           F.lit(""))), r"[,\s]+", -1)
    return df.filter(~F.array_contains(tokens, "noindex"))


_HREFLANG_DDL = ("array<struct<hreflang:string,href:string>>")


def hreflang_links(df: DataFrame, *, html_col: str = "html",
                   id_col: str = "doc_id") -> DataFrame:
    """<link rel="alternate" hreflang=...> extraction: the
    author-declared translation graph — the highest-precision bitext
    pairing signal on the web (it beats any alignment heuristic when
    present, and feeds ``bitext_candidates`` as a labeled prior).
    Output one row per declaration in document order: (doc_id,
    alt_idx, hreflang, href). Zero shuffle: Arrow projection + narrow
    posexplode (the links.py evaluate-once pattern)."""

    @pandas_udf(_HREFLANG_DDL)
    def alts(htmls: pd.Series) -> pd.Series:
        out = []
        for h in htmls:
            if h is None:
                out.append(None)
                continue
            rows = []
            for node in parse_html(h).descendants():
                if node.__class__ is not Element or node.name != "link":
                    continue
                rel = (node.attrs.get("rel") or "").lower()
                lang = node.attrs.get("hreflang")
                href = node.attrs.get("href")
                if "alternate" in rel.split() and lang and href:
                    rows.append({"hreflang": lang, "href": href})
            out.append(rows)
        return pd.Series(out)

    return (df.select(F.col(id_col), alts(F.col(html_col)).alias("_a"))
            .select(id_col, F.posexplode_outer("_a").alias("alt_idx", "a"))
            .filter(F.col("a").isNotNull())
            .select(id_col, F.col("alt_idx").cast("int").alias("alt_idx"),
                    "a.hreflang", "a.href"))
