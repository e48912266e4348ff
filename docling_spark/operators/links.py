"""Hyperlink extraction and the outlink host graph — the web-scale
link-analysis surface over the engine's own HTML parser.

A crawl-curation pipeline needs links for three things: host-authority
ranking (PageRank over the host graph feeds quality gates), frontier
discovery (which URLs to crawl next), and anchor text (the classic
relevance signal — the text OTHER pages use to describe a URL).
The reference parses <a> tags for document structure but discards the
link targets (docling/backend/html_backend.py handles anchors only as
inline text); at 10^12 documents the link graph IS a first-class
output, so the engine extracts it as one.

Plan shape: ONE Arrow-batched pandas UDF projection per document
(reusing ``parsers/dom.py::parse_html`` — the same fast-path tokenizer
the extraction backend uses) emitting an array of link structs, then a
narrow ``posexplode``. No shuffle until the caller aggregates; the
host-graph rollup is a single groupBy on (src_host, dst_host) whose
output is host-cardinality (millions), i.e. broadcastable back into
doc-level gates.

Relative hrefs are resolved against the document's base URL with
stdlib ``urljoin`` (RFC 3986) inside the same UDF pass.
"""

from __future__ import annotations

from typing import List, Optional
from urllib.parse import urljoin

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from docling_spark.operators.weburl import host_col
from docling_spark.parsers.dom import Element, parse_html

_LINK_DDL = ("array<struct<href:string,url:string,anchor:string,"
             "rel:string,nofollow:int>>")


def extract_links(html: str, base: Optional[str]) -> List[dict]:
    """All <a href> anchors of one document, in document order."""
    out: List[dict] = []
    root = parse_html(html)
    for node in root.descendants():
        if node.__class__ is not Element or node.name != "a":
            continue
        href = node.attrs.get("href")
        if href is None:
            continue
        rel = (node.attrs.get("rel") or "").lower()
        out.append({
            "href": href,
            "url": urljoin(base, href) if base else href,
            "anchor": " ".join(node.text.split()),
            "rel": rel,
            "nofollow": int("nofollow" in rel.split()),
        })
    return out


def html_links(df: DataFrame, *, html_col: str = "html",
               base_col: Optional[str] = None) -> DataFrame:
    """(doc_id, html[, base]) → one row per anchor: (doc_id, link_idx,
    href, url, anchor, rel, nofollow). ``link_idx`` is the anchor's
    document-order position. Zero shuffle: UDF projection + narrow
    posexplode."""

    @pandas_udf(_LINK_DDL)
    def links(htmls: pd.Series, bases: pd.Series) -> pd.Series:
        return pd.Series([
            None if h is None else extract_links(h, b)
            for h, b in zip(htmls, bases)])

    base = F.col(base_col) if base_col else F.lit(None).cast("string")
    # posexplode_OUTER + post-filter, NOT plain posexplode: the inner
    # generate's implicit array-pruning predicate (size>0 AND NOT NULL)
    # gets pushed below any exchange between the UDF and the explode,
    # which re-evaluates the Arrow UDF — i.e. parses every document's
    # DOM twice (observed in the physical plan). The outer variant has
    # no pruning predicate; the null rows it emits for link-less docs
    # are dropped by a filter on the generate OUTPUT, which cannot be
    # pushed below it.
    rows = (df.withColumn("_links", links(F.col(html_col), base))
            .select("doc_id",
                    *( [F.col(base_col)] if base_col else [] ),
                    F.posexplode_outer("_links").alias("link_idx", "l"))
            .filter(F.col("l").isNotNull()))
    return rows.select(
        "doc_id",
        *( [F.col(base_col)] if base_col else [] ),
        F.col("link_idx").cast("int").alias("link_idx"),
        F.col("l.href").alias("href"), F.col("l.url").alias("url"),
        F.col("l.anchor").alias("anchor"), F.col("l.rel").alias("rel"),
        F.col("l.nofollow").alias("nofollow"))


def outlink_host_graph(links_df: DataFrame, *,
                       base_col: str = "base_url") -> DataFrame:
    """Link rows → weighted host-to-host edges: (src_host, dst_host,
    n_links, n_nofollow). The standard input to host PageRank
    (operators/graph.py) and per-host outlink-quality gates. One
    groupBy; host parsing is pure Catalyst (weburl.host_col)."""
    return (links_df.select(
                host_col(F.col(base_col)).alias("src_host"),
                host_col(F.col("url")).alias("dst_host"),
                "nofollow")
            .groupBy("src_host", "dst_host")
            .agg(F.count("*").cast("long").alias("n_links"),
                 F.sum("nofollow").cast("long").alias("n_nofollow")))


def anchor_text_index(links_df: DataFrame) -> DataFrame:
    """Link rows → anchor-term index per destination HOST: (dst_host,
    term, n_links, n_docs). Anchor text is the classic off-page
    relevance signal (the linking page describes the target better
    than the target describes itself — TREC web tracks, BM25F anchor
    field); aggregated at host level it also feeds seed selection and
    link-spam gates. The reference parses anchors but keeps only their
    text content (docling/backend/html_backend.py); the index is the
    corpus-level use of the same parse.

    Scale shape: narrow split+explode of the anchor string, then ONE
    shuffle on (dst_host, term). n_docs is an exact COUNT(DISTINCT
    doc_id) — Spark plans it as a two-phase partial-distinct
    aggregation on the same key, no extra shuffle of the input; swap
    in approx_count_distinct at 10^12 links if the per-key distinct
    sets outgrow executor memory."""
    terms = (links_df.select(
                host_col(F.col("url")).alias("dst_host"), "doc_id",
                F.explode(F.split(F.lower(F.col("anchor")), r"\s+"))
                 .alias("term"))
             .filter(F.col("term") != ""))
    return (terms.groupBy("dst_host", "term")
            .agg(F.count("*").cast("long").alias("n_links"),
                 F.countDistinct("doc_id").cast("long")
                  .alias("n_docs")))
