"""WARC container ingestion + CDX indexing, Spark-first.

``warc_records`` turns a table of raw WARC blobs (``binary`` column —
one crawl container per row, any number of records inside) into a flat
record relation; ``cdx_index`` derives the standard CDX(J)-style URL
index from that relation with pure Catalyst expressions.

Scale shape: a Common Crawl monthly snapshot is ~100 TB of WARC split
into ~1 GB containers — exactly one input row each here. Parsing is a
single Arrow-batched ``mapInPandas`` (container-local, zero shuffle,
embarrassingly parallel across 100k containers); the CDX projection is
shuffle-free Catalyst (``parse_url`` / ``sha2`` / array ops run inside
whole-stage codegen), so building the index of a full crawl costs one
scan. Neither step ever materializes a container on the driver.

Framing parity: :mod:`docling_spark.parsers.warc_parser` (ISO 28500 +
RFC 9112 from the public specs). The reference engine has no container
layer — this extends it the way its users consume web crawls.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WARC_RECORDS_DDL = (
    "doc_id string, rec_no int, warc_type string, record_id string, "
    "target_uri string, warc_date string, content_length bigint, "
    "http_status int, http_content_type string, body_text string, "
    "refers_to string, profile string, payload_digest string, "
    "error string")


def _warc_records_batches(batches):
    import pandas as pd

    from ..parsers.warc_parser import parse_warc

    cols = ("doc_id", "rec_no", "warc_type", "record_id", "target_uri",
            "warc_date", "content_length", "http_status",
            "http_content_type", "body_text", "refers_to", "profile",
            "payload_digest", "error")
    for pdf in batches:
        out = {k: [] for k in cols}
        for doc_id, blob in zip(pdf["doc_id"], pdf["warc"]):
            recs = parse_warc(bytes(blob) if blob is not None else b"")
            for i, r in enumerate(recs):
                out["doc_id"].append(doc_id)
                out["rec_no"].append(i)
                out["warc_type"].append(r["warc_type"])
                out["record_id"].append(r["record_id"])
                out["target_uri"].append(r["target_uri"])
                out["warc_date"].append(r["date"])
                out["content_length"].append(r["content_length"])
                out["http_status"].append(
                    -1 if r["http_status"] is None else r["http_status"])
                out["http_content_type"].append(r["http_content_type"])
                out["body_text"].append(
                    r["body"].decode("utf-8", "replace"))
                out["refers_to"].append(r["refers_to"])
                out["profile"].append(r["profile"])
                out["payload_digest"].append(r["payload_digest"])
                out["error"].append(r["error"] or "")
        yield pd.DataFrame(out)


def warc_records(df: DataFrame, *, blob_col: str = "warc") -> DataFrame:
    """(doc_id, warc binary) -> one row per WARC record.

    ``http_status`` is -1 for records that are not HTTP responses
    (warcinfo/request/metadata) so the relation stays NULL-free for
    canonical comparison; ``error`` is '' for clean records and a
    message on the single synthetic terminal record emitted for a
    corrupt container (the scan survives bad bytes by contract)."""
    src = df.select("doc_id", F.col(blob_col).alias("warc"))
    return src.mapInPandas(_warc_records_batches, schema=WARC_RECORDS_DDL)


def cdx_index(records: DataFrame) -> DataFrame:
    """WARC record relation -> CDX-style URL index, Catalyst-only.

    One row per HTTP response record: ``urlkey`` (comma-reversed host
    ``)`` path — the public SURT convention crawl indexes sort by),
    ``ts`` (WARC-Date compacted to yyyyMMddHHmmss), ``status``,
    ``mime``, ``digest`` (sha256 hex of the entity body — CDXJ uses a
    body digest for revisit detection), ``length``. Zero shuffle: at
    crawl scale the index is written partitioned by urlkey prefix and
    sorted within partitions at sink time, not globally."""
    resp = records.filter((F.col("warc_type") == "response")
                          & (F.col("http_status") >= 0))
    host = F.lower(F.parse_url("target_uri", F.lit("HOST")))
    path = F.coalesce(F.parse_url("target_uri", F.lit("PATH")),
                      F.lit("/"))
    urlkey = F.concat(
        F.array_join(F.reverse(F.split(host, r"\.")), ","),
        F.lit(")"), F.lower(path))
    return resp.select(
        urlkey.alias("urlkey"),
        F.regexp_replace("warc_date", r"[^0-9]", "").alias("ts"),
        F.col("target_uri").alias("url"),
        F.col("http_status").alias("status"),
        F.col("http_content_type").alias("mime"),
        F.sha2(F.col("body_text"), 256).alias("digest"),
        F.col("content_length").alias("length"))


def wet_text_records(records: DataFrame) -> DataFrame:
    """Parsed WARC relation → WET text rows: the ``conversion``
    records of a Common Crawl *.wet sidecar, i.e. (doc_id, target_uri,
    text, n_chars) per document — the entry format most open-web
    pretraining corpora (C4, OSCAR, RefinedWeb) actually start from.
    Pure Catalyst on top of warc_records: one filter + projection,
    zero extra Python, zero shuffle."""
    return (records.filter(F.col("warc_type") == "conversion")
            .select("doc_id", "target_uri",
                    F.col("body_text").alias("text"),
                    F.length("body_text").cast("long")
                     .alias("n_chars")))


_WAT_ENVELOPE_DDL = (
    "Envelope struct<"
    "`WARC-Header-Metadata` struct<`WARC-Target-URI` string>, "
    "`Payload-Metadata` struct<`HTTP-Response-Metadata` struct<"
    "`HTML-Metadata` struct<Head struct<Title string>, "
    "Links array<struct<url string, path string>>>>>>")


def wat_metadata(records: DataFrame) -> DataFrame:
    """Parsed WARC relation → WAT metadata rows: parse the JSON
    envelope of ``metadata`` records (the Common Crawl *.wat sidecar)
    with Catalyst's from_json — (doc_id, target_uri, title, n_links).
    This is the cheap path to link graphs and titles when the full
    page bytes aren't needed: WAT shards are ~1/5 the size of WARC,
    and the parse is JVM-side JSON, no Python at all."""
    env = F.from_json(F.col("body_text"), _WAT_ENVELOPE_DDL)
    meta = env["Envelope"]
    html = meta["Payload-Metadata"]["HTTP-Response-Metadata"][
        "HTML-Metadata"]
    return (records.filter(F.col("warc_type") == "metadata")
            .select(
                "doc_id",
                meta["WARC-Header-Metadata"]["WARC-Target-URI"]
                .alias("target_uri"),
                html["Head"]["Title"].alias("title"),
                F.coalesce(F.size(html["Links"]), F.lit(0))
                 .cast("int").alias("n_links")))


def warc_revisit_dedup(records: DataFrame) -> DataFrame:
    """Resolve ISO 28500 §6.7 ``revisit`` records against the captures
    they duplicate: one row per revisit — (doc_id, target_uri,
    refers_to, profile, digest_match) — where ``digest_match`` is 1
    when the revisit's WARC-Payload-Digest equals the sha256 of the
    referenced response's entity body (the identical-payload-digest
    profile's contract, same digest convention as ``cdx_index``).

    This is how a crawl archive expresses deduplication: the body is
    stored ONCE and later captures ship a pointer, so corpus
    extraction must follow the pointer instead of treating revisits
    as empty documents. Plan shape: ONE equi-join of the (small)
    revisit slice against responses on the record-id key — uniform
    md5-like keys, cross-container capable; no Python in the join."""
    revisits = (records.filter(F.col("warc_type") == "revisit")
                .select("doc_id", "target_uri", "refers_to", "profile",
                        F.col("payload_digest").alias("_claimed")))
    responses = (records.filter((F.col("warc_type") == "response")
                                & (F.col("http_status") >= 0))
                 .select(F.col("record_id").alias("refers_to"),
                         F.concat(F.lit("sha256:"),
                                  F.sha2(F.col("body_text"), 256))
                         .alias("_actual")))
    return (revisits.join(responses, "refers_to", "left")
            .select("doc_id", "target_uri", "refers_to", "profile",
                    F.when(F.col("_claimed") == F.col("_actual"),
                           1).otherwise(0).cast("int")
                    .alias("digest_match")))
