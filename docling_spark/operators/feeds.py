"""RSS 2.0 / Atom feed parsing — the third crawl-discovery channel.

A frontier discovers URLs three ways: links on fetched pages
(operators/links.py), the sitemap protocol (operators/weburl.py::
sitemap_urls), and syndication feeds — the channel that carries
*freshness*: a feed says which URLs are NEW since the last visit,
with timestamps, so the revisit scheduler can prioritize them without
re-crawling the whole host. The reference has no feed surface (it is
a document converter, not a crawler); at 10^12 documents feed-driven
discovery is how the crawl stays current, so the engine treats it as
a first-class relational output alongside sitemap and anchor edges.

Dialect detection: root ``<feed>`` → Atom (RFC 4287: entry/link@href/
title/updated), root ``<rss>``/``<rdf>`` → RSS (2.0 and 1.0 share the
item/link/title/pubDate shape this reads). Anything else parses to
zero entries with kind='unknown' rather than erroring — malformed
feeds are routine at crawl scale and must not kill a batch.

Plan shape: ONE Arrow-batched pandas UDF projection per feed document
(reusing ``parsers/dom.py::parse_html`` — HTMLParser tokenizes these
XML dialects fine: tags are lowercased, which the matchers expect)
emitting an entry-struct array, then a narrow ``posexplode``. No
shuffle; per-host recency rollups downstream are one groupBy on
host (host-cardinality output, broadcastable into the frontier).

Not modeled (documented, deterministic subset): CDATA sections,
xml:base resolution, and podcast/media-RSS extension namespaces.
"""

from __future__ import annotations

from typing import List

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from docling_spark.parsers.dom import Element, parse_html

_ENTRY_DDL = ("array<struct<kind:string,entry_idx:int,url:string,"
              "title:string,published:string>>")


def _first_child_text(node: Element, name: str) -> str:
    """Text of the first child element called ``name``. RSS quirk:
    ``<link>`` is an HTML void element, so the tokenizer closes it
    immediately and the URL becomes the SIBLING text node right after
    the empty element — read that when the element itself is empty."""
    for i, child in enumerate(node.children):
        if isinstance(child, Element) and child.name == name:
            text = " ".join(child.text.split())
            if not text and not child.children:
                nxt = node.children[i + 1] if i + 1 < len(node.children) else None
                data = nxt if nxt.__class__ is str \
                    else getattr(nxt, "data", None)
                if data is not None:
                    text = " ".join(data.split())
            return text
    return ""


def _atom_link(node: Element) -> str:
    """Atom entry link: prefer rel='alternate' (or no rel), per RFC
    4287 §4.2.7.2's default-rel rule."""
    fallback = ""
    for child in node.children:
        if isinstance(child, Element) and child.name == "link":
            href = child.attrs.get("href") or ""
            rel = (child.attrs.get("rel") or "alternate").lower()
            if rel == "alternate":
                return href
            if not fallback:
                fallback = href
    return fallback


def parse_feed(xml: str) -> List[dict]:
    """Entries of one feed document, in document order."""
    root = parse_html(xml)
    kind = "unknown"
    for node in root.children:
        if not isinstance(node, Element):
            continue
        if node.name == "feed":
            kind = "atom"
        elif node.name in ("rss", "rdf", "rdf:rdf"):
            kind = "rss"
        if kind != "unknown":
            break
    if kind == "unknown":
        return []
    entry_tag = "entry" if kind == "atom" else "item"
    out: List[dict] = []
    for node in root.descendants():
        if node.__class__ is not Element or node.name != entry_tag:
            continue
        if kind == "atom":
            url = _atom_link(node)
            published = (_first_child_text(node, "updated")
                         or _first_child_text(node, "published"))
        else:
            url = _first_child_text(node, "link")
            published = _first_child_text(node, "pubdate")
        out.append({
            "kind": kind,
            "entry_idx": len(out),
            "url": url,
            "title": _first_child_text(node, "title"),
            "published": published,
        })
    return out


def feed_urls(df: DataFrame, *, xml_col: str = "xml",
              id_col: str = "feed_id") -> DataFrame:
    """(feed_id, xml) → one row per feed entry: (feed_id, kind,
    entry_idx, url, title, published). Zero shuffle: Arrow UDF
    projection + narrow posexplode."""

    @pandas_udf(_ENTRY_DDL)
    def entries(xmls: pd.Series) -> pd.Series:
        return pd.Series([
            None if x is None else parse_feed(x) for x in xmls])

    # posexplode_outer + post-filter keeps the UDF evaluated once (the
    # inner generate's pruning predicate would push below the project
    # and re-run the parse; see operators/links.py for the write-up).
    return (df.select(F.col(id_col), entries(F.col(xml_col)).alias("_e"))
            .select(id_col, F.posexplode_outer("_e").alias("_i", "e"))
            .filter(F.col("e").isNotNull())
            .select(id_col, "e.kind", "e.entry_idx", "e.url",
                    "e.title", "e.published"))
