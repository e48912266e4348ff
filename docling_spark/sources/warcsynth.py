"""Deterministic WARC-container corpus — pure Catalyst synthesis.

Wraps every row of the driver-provided ``documents`` parquet into a
spec-valid ISO 28500 container of three records (warcinfo, request,
response), mirroring how a real crawler emits one request/response
pair per fetch. Because every byte is a SQL expression over
(doc_id, source, text), the *expected parse output* is also
expressible in ANSI SQL — the DuckDB oracle for the ``warc_*``
queries replays the exact same framing arithmetic
(Content-Length = octet_length of the payload expression).

Zero Python in synthesis; the blob column is ``binary`` like a real
crawl shard, so the parse operator exercises the bytes path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

WARC_DATE = "2026-01-01T00:00:00Z"
INFO_PAYLOAD = "software: docling-spark\r\n"


def _record(warc_type: str, rec_no: int, payload: Column,
            content_type: str, uri: Column = None,
            extra: Column = None) -> Column:
    parts = [
        F.lit("WARC/1.0\r\nWARC-Type: " + warc_type
              + "\r\nWARC-Record-ID: <urn:docling:"),
        F.col("doc_id").cast("string"),
        F.lit(f":{rec_no}>\r\nWARC-Date: {WARC_DATE}\r\n"),
    ]
    if uri is not None:
        parts += [F.lit("WARC-Target-URI: "), uri, F.lit("\r\n")]
    if extra is not None:           # preformatted CRLF-joined lines
        parts += [extra]
    parts += [
        F.lit(f"Content-Type: {content_type}\r\nContent-Length: "),
        F.octet_length(payload).cast("string"),
        F.lit("\r\n\r\n"), payload, F.lit("\r\n\r\n"),
    ]
    return F.concat(*parts)


def html_body_col() -> Column:
    return F.concat(F.lit("<html><body><p>"), F.col("text"),
                    F.lit("</p></body></html>"))


def target_uri_col() -> Column:
    return F.concat(F.lit("http://"), F.col("source"),
                    F.lit(".example/doc/"),
                    F.col("doc_id").cast("string"))


def corpus_warc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet -> (doc_id, warc binary): one 3-record
    container per document (warcinfo / request / response with an
    HTTP 200 text/html body built from ``text``)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    uri = target_uri_col()
    req_payload = F.concat(
        F.lit("GET /doc/"), F.col("doc_id").cast("string"),
        F.lit(" HTTP/1.1\r\nHost: "), F.col("source"),
        F.lit(".example\r\n\r\n"))
    resp_payload = F.concat(
        F.lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"),
        html_body_col())
    blob = F.concat(
        _record("warcinfo", 0, F.lit(INFO_PAYLOAD),
                "application/warc-fields"),
        _record("request", 1, req_payload,
                "application/http; msgtype=request", uri),
        _record("response", 2, resp_payload,
                "application/http; msgtype=response", uri))
    return docs.select(F.col("doc_id").cast("string").alias("doc_id"),
                       F.encode(blob, "UTF-8").alias("warc"))


def corpus_wet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet -> (doc_id, warc binary) in WET shape: one
    warcinfo + one ``conversion`` record per document whose payload is
    the extracted PLAIN TEXT — the Common Crawl *.warc.wet.gz sidecar
    convention (text-only re-serialization of the crawl)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    blob = F.concat(
        _record("warcinfo", 0, F.lit(INFO_PAYLOAD),
                "application/warc-fields"),
        _record("conversion", 1, F.col("text"), "text/plain",
                target_uri_col()))
    return docs.select(F.col("doc_id").cast("string").alias("doc_id"),
                       F.encode(blob, "UTF-8").alias("warc"))


def wat_payload_col() -> Column:
    """The WAT ``metadata`` record payload: the Common Crawl JSON
    envelope subset consumers actually read (target URI, HTML title,
    outgoing links). Built with to_json so the expected parse is the
    same expression the oracle replays."""
    link = F.struct(
        F.concat(F.lit("http://h"), (F.col("doc_id") % 7)
                 .cast("string"), F.lit(".example/p/"),
                 F.col("doc_id").cast("string")).alias("url"),
        F.lit("A@/href").alias("path"))
    return F.to_json(F.struct(F.struct(
        F.struct(target_uri_col().alias("WARC-Target-URI"))
         .alias("WARC-Header-Metadata"),
        F.struct(F.struct(F.struct(
            F.struct(F.concat(F.lit("Doc "),
                              F.col("doc_id").cast("string"))
                     .alias("Title")).alias("Head"),
            F.array(link).alias("Links"))
            .alias("HTML-Metadata"))
            .alias("HTTP-Response-Metadata"))
         .alias("Payload-Metadata")).alias("Envelope")))


def corpus_wat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet -> (doc_id, warc binary) in WAT shape: one
    warcinfo + one ``metadata`` record per document carrying the JSON
    envelope — the Common Crawl *.warc.wat.gz sidecar convention."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    blob = F.concat(
        _record("warcinfo", 0, F.lit(INFO_PAYLOAD),
                "application/warc-fields"),
        _record("metadata", 1, wat_payload_col(),
                "application/json", target_uri_col()))
    return docs.select(F.col("doc_id").cast("string").alias("doc_id"),
                       F.encode(blob, "UTF-8").alias("warc"))


def corpus_warc_revisit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet -> (doc_id, warc binary): warcinfo + HTTP 200
    response, plus — for odd doc_ids — an ISO 28500 §6.7 ``revisit``
    record declaring the identical-payload-digest profile, whose
    WARC-Refers-To points at the response record and whose
    WARC-Payload-Digest is the sha256 of the response ENTITY BODY
    (the CDXJ convention cdx_index also uses). Revisit records carry
    no payload (Content-Length 0), per the profile."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    uri = target_uri_col()
    body = html_body_col()
    resp_payload = F.concat(
        F.lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"),
        body)
    revisit_headers = F.concat(
        F.lit("WARC-Refers-To: <urn:docling:"),
        F.col("doc_id").cast("string"),
        F.lit(":1>\r\nWARC-Profile: http://netpreserve.org/warc/1.0/"
              "revisit/identical-payload-digest\r\n"
              "WARC-Payload-Digest: sha256:"),
        F.sha2(body, 256), F.lit("\r\n"))
    blob = F.concat(
        _record("warcinfo", 0, F.lit(INFO_PAYLOAD),
                "application/warc-fields"),
        _record("response", 1, resp_payload,
                "application/http; msgtype=response", uri),
        F.when(F.col("doc_id") % 2 == 1,
               _record("revisit", 2, F.lit(""),
                       "application/http", uri,
                       extra=revisit_headers))
        .otherwise(F.lit("")))
    return docs.select(F.col("doc_id").cast("string").alias("doc_id"),
                       F.encode(blob, "UTF-8").alias("warc"))
