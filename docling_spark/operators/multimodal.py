"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by Arrow-batched pandas UDFs.

The container has no image/audio codecs (no PIL/ffmpeg), so the DECODE
step is stubbed exactly as the harness prescribes: real Spark-side
plumbing (schema, partitioning, UDF signatures, Arrow batch shapes)
with (a) a REAL stdlib header parser for PNG/JPEG dimensions, (b) a
deterministic fake pixel decoder for feature extraction, and (c) a
clearly-marked NotImplementedError for full raster decode. Swapping in
a real codec changes one function body, none of the plumbing.

The reference counterpart: pictures flow as PIL images + ImageRef
(docling/backend/msword_backend.py:616-647, models/picture
classifier/description stubs SURVEY.md §2.4 enrichment slots).
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator, List

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

META_DDL = ("width int, height int, mime string, n_bytes int, "
            "sha256 string")


# ---------------------------------------------------------------------------
# real: header-only dimension parsing (stdlib, no codec needed)


def parse_image_header(data: bytes):
    """(width, height, mime) from PNG / JPEG / GIF / custom IMG1
    headers; (None, None, 'application/octet-stream') when unknown."""
    if data[:8] == b"\x89PNG\r\n\x1a\n" and data[12:16] == b"IHDR":
        w, h = struct.unpack(">II", data[16:24])
        return w, h, "image/png"
    if data[:3] == b"\xff\xd8\xff":  # JPEG: scan for SOFn marker
        i = 2
        while i + 9 < len(data):
            if data[i] != 0xFF:
                i += 1
                continue
            marker = data[i + 1]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", data[i + 5:i + 9])
                return w, h, "image/jpeg"
            seg_len = struct.unpack(">H", data[i + 2:i + 4])[0]
            i += 2 + seg_len
        return None, None, "image/jpeg"
    if data[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", data[6:10])
        return w, h, "image/gif"
    if data[:4] == b"IMG1":  # the test corpus's synthetic format
        w, h = struct.unpack(">HH", data[4:8])
        return w, h, "image/x-img1"
    if data[:2] in (b"P5", b"P6"):  # binary PGM / PPM (netpbm)
        try:
            w, h, _maxval, _off = _parse_pnm_header(data)
            return w, h, ("image/x-portable-graymap"
                          if data[:2] == b"P5"
                          else "image/x-portable-pixmap")
        except ValueError:
            return None, None, "application/octet-stream"
    return None, None, "application/octet-stream"


def _parse_pnm_header(data: bytes):
    """Parse a binary netpbm (P5/P6) header: magic, then three ASCII
    integers (width, height, maxval) separated by whitespace, with
    ``#`` comments allowed, then ONE whitespace byte before the raster.
    Returns (width, height, maxval, raster_offset)."""
    if data[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary netpbm payload")
    i, vals = 2, []
    while len(vals) < 3:
        while i < len(data) and data[i:i + 1].isspace():
            i += 1
        if data[i:i + 1] == b"#":  # comment to end of line
            while i < len(data) and data[i] not in (0x0A, 0x0D):
                i += 1
            continue
        j = i
        while j < len(data) and data[j:j + 1].isdigit():
            j += 1
        if j == i:
            raise ValueError("malformed netpbm header")
        vals.append(int(data[i:j]))
        i = j
    if i >= len(data) or not data[i:i + 1].isspace():
        raise ValueError("missing raster separator")
    return vals[0], vals[1], vals[2], i + 1


def decode_pnm(data: bytes) -> np.ndarray:
    """REAL raster decode for binary PGM (P5) / PPM (P6) — the one
    raw image format that needs no external codec, so unlike
    :func:`decode_image` this path is genuinely implemented. Returns
    an (h, w) uint8 grayscale array (PPM is luma-averaged); maxval
    must be ≤ 255 (one byte per sample)."""
    w, h, maxval, off = _parse_pnm_header(data)
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    if not (1 <= w <= 1 << 16) or not (1 <= h <= 1 << 16):
        raise ValueError("degenerate or absurd netpbm dimensions")
    ch = 1 if data[:2] == b"P5" else 3
    need = w * h * ch
    raster = np.frombuffer(data, dtype=np.uint8, count=need, offset=off)
    if ch == 3:
        raster = raster.reshape(h, w, 3).mean(axis=2).astype(np.uint8)
    else:
        raster = raster.reshape(h, w)
    if maxval != 255:  # rescale to full range, floor semantics
        raster = (raster.astype(np.uint32) * 255 // maxval).astype(
            np.uint8)
    return raster


def image_meta_udf(col: Column) -> Column:
    @pandas_udf(META_DDL)
    def meta(blobs: pd.Series) -> pd.DataFrame:
        out = {"width": [], "height": [], "mime": [], "n_bytes": [],
               "sha256": []}
        for b in blobs:
            data = bytes(b) if b is not None else b""
            w, h, mime = parse_image_header(data)
            out["width"].append(w)
            out["height"].append(h)
            out["mime"].append(mime)
            out["n_bytes"].append(len(data))
            out["sha256"].append(hashlib.sha256(data).hexdigest())
        return pd.DataFrame(out)

    return meta(col)


# ---------------------------------------------------------------------------
# stubbed: decode / features / resize


def _fake_pixels(data: bytes, w: int, h: int) -> np.ndarray:
    """Deterministic fake decode: gray pixels derived from the sha256
    stream of the payload. REPLACE with a real codec in production —
    the signature (bytes → (h, w) uint8 array) is the contract."""
    need = w * h
    out = bytearray()
    counter = 0
    while len(out) < need:
        out += hashlib.sha256(data + counter.to_bytes(4, "big")).digest()
        counter += 1
    return np.frombuffer(bytes(out[:need]), dtype=np.uint8).reshape(h, w)


def decode_image(data: bytes) -> np.ndarray:
    """Full raster decode — NOT available in this container.

    Raises NotImplementedError by design; image_features_udf uses the
    deterministic fake instead so pipelines are testable end-to-end."""
    raise NotImplementedError(
        "no image codec in this environment; plug PIL/turbojpeg here")


FEATURES_DDL = ("width int, height int, mean_e4 long, std_e4 long, "
                "p_dark_e4 long")


def image_features_udf(col: Column) -> Column:
    """Arrow-batched feature extraction over the (fake-)decoded raster:
    mean/std luminance + dark-pixel ratio, as scaled ints."""
    @pandas_udf(FEATURES_DDL)
    def feats(blobs: pd.Series) -> pd.DataFrame:
        out = {"width": [], "height": [], "mean_e4": [], "std_e4": [],
               "p_dark_e4": []}
        for b in blobs:
            data = bytes(b) if b is not None else b""
            w, h, _ = parse_image_header(data)
            if not w or not h:
                for k in out:
                    out[k].append(None)
                continue
            px = _fake_pixels(data, min(w, 64), min(h, 64)).astype(
                np.float64)
            out["width"].append(w)
            out["height"].append(h)
            out["mean_e4"].append(int(px.mean() * 10000))
            out["std_e4"].append(int(px.std() * 10000))
            out["p_dark_e4"].append(int((px < 64).mean() * 10000))
        return pd.DataFrame(out)

    return feats(col)


# ---------------------------------------------------------------------------
# real: perceptual hashing + hamming-LSH near-dup (PGM/PPM decode is
# real; compressed formats fall back to the deterministic fake decode)


def _block_downsample(px: np.ndarray, n: int) -> np.ndarray:
    """(h, w) → (n, n) by block mean when the raster is at least n×n
    (cropping the ragged remainder), nearest-index sampling below."""
    h, w = px.shape
    if h >= n and w >= n:
        px = px[: (h // n) * n, : (w // n) * n].astype(np.float64)
        return px.reshape(n, h // n, n, w // n).mean(axis=(1, 3))
    ys = (np.arange(n) * h) // n
    xs = (np.arange(n) * w) // n
    return px[np.ix_(ys, xs)].astype(np.float64)


def average_hash(data: bytes, hash_size: int = 8):
    """64-bit average hash (aHash) of one image payload: decode →
    block-mean downsample to hash_size² → set bit r·n+c when the cell
    is STRICTLY brighter than the grid mean. Returns a SIGNED 64-bit
    int (two's complement, so it round-trips through a Spark ``long``)
    or None when the payload is undecodable.

    Two REAL decode paths, both stdlib-only: PGM/PPM via
    :func:`decode_pnm`, and 8-bit grayscale PNG via
    parsers/raster.png_decode (zlib inflate + filter reversal — covers
    every page the engine's own rasterizer emits, so render→hash is
    real pixels end-to-end). JPEG/GIF/IMG1 and non-grayscale PNGs use
    the deterministic fake decode stand-in (same contract as
    image_features_udf) until a codec is plugged in. The reference
    keeps only exact-bytes image identity (PIL images hashed whole);
    perceptual near-identity is a corpus-curation addition."""
    if not (1 <= hash_size * hash_size <= 64):
        raise ValueError("hash must fit a 64-bit long: hash_size <= 8")
    # corrupt web payloads raise more than ValueError (zlib.error on a
    # bad IDAT, struct.error on a truncated header, OverflowError on
    # absurd dims) — ANY decode failure degrades to the documented
    # None / stand-in instead of killing the Arrow batch.
    if data[:2] in (b"P5", b"P6"):
        try:
            px = decode_pnm(data)
        except Exception:
            return None
    elif data[:8] == b"\x89PNG\r\n\x1a\n":
        from ..parsers.raster import png_decode
        try:
            px = png_decode(data)
            if px.size == 0:
                raise ValueError("empty raster")
        except Exception:  # non-grayscale / corrupt → stand-in
            w, h, _mime = parse_image_header(data)
            if not w or not h or min(w, h) < 1:
                return None
            px = _fake_pixels(data, min(w, 64), min(h, 64))
    else:
        w, h, _mime = parse_image_header(data)
        if not w or not h or min(w, h) < 1:
            return None
        px = _fake_pixels(data, min(w, 64), min(h, 64))
    grid = _block_downsample(px, hash_size)
    bits = (grid > grid.mean()).ravel()
    val = 0
    for j in np.nonzero(bits)[0]:
        val |= 1 << int(j)
    if val >= 1 << 63:
        val -= 1 << 64
    return val


def ahash_udf(col: Column, hash_size: int = 8) -> Column:
    """Arrow-batched :func:`average_hash` over a binary column."""
    if not (1 <= hash_size * hash_size <= 64):  # fits the long column
        raise ValueError("hash must fit a 64-bit long: hash_size <= 8")

    @pandas_udf("long")
    def ah(blobs: pd.Series) -> pd.Series:
        return pd.Series([
            None if b is None else average_hash(bytes(b), hash_size)
            for b in blobs], dtype="object")

    return ah(col)


def phash_near_dup(hashed: DataFrame, *, id_col: str = "media_ref",
                   hash_col: str = "ahash", bands: int = 4,
                   max_hamming: int = 3,
                   storage: str = "memory_and_disk") -> DataFrame:
    """Perceptual near-duplicate pairs by banded hamming LSH over a
    64-bit hash column: split the hash into ``bands`` equal bit-bands,
    bucket-join on (band, band_key), then verify candidates with
    bit_count(xor) ≤ max_hamming — all Catalyst bit ops, no Python.

    Recall: two hashes within hamming ≤ bands−1 share at least one
    exact band (pigeonhole), so with the defaults every pair at
    distance ≤ 3 is guaranteed found; raise ``bands`` (8×8-bit) to
    guarantee wider radii at the cost of bigger buckets. Scale shape:
    one shuffle on the band key (buckets are popular-hash-sized, not
    corpus-sized), one distinct on the pair key, zero re-decode —
    the hash table is ~16 B/asset, so 10^12 assets stream through
    the same plan.

    The band join consumes the hash table TWICE (self-join), and
    exchange/subplan reuse never fires across branches containing a
    Python/Arrow UDF (PythonUDF expr-ids break plan canonicalization),
    so when the caller's ``hashed`` embeds the decode UDF it would
    re-decode every asset — the hash table is persisted at the branch
    point (16 B/asset; ``storage="none"`` opts out). The cache lives
    until the session drops it: a caller looping many invocations in
    one session (bench reps) should unpersist between rounds via
    ``spark.catalog.clearCache()`` or pass storage="none"."""
    from pyspark import StorageLevel
    levels = {"memory_and_disk": StorageLevel.MEMORY_AND_DISK,
              "memory_only": StorageLevel.MEMORY_ONLY,
              "disk_only": StorageLevel.DISK_ONLY, "none": None}
    if storage not in levels:
        raise ValueError(f"storage must be one of {sorted(levels)}")
    level = levels[storage]
    if level is not None and hashed.storageLevel == StorageLevel.NONE:
        hashed = hashed.persist(level)
    band_w = 64 // bands
    mask = (1 << band_w) - 1
    h = F.col(hash_col)
    keys = F.array(*[
        F.struct(F.lit(b).alias("band"),
                 F.shiftrightunsigned(h, b * band_w)
                  .bitwiseAND(F.lit(mask)).alias("key"))
        for b in range(bands)])
    sig = (hashed.select(F.col(id_col).alias("_id"), h.alias("_h"),
                         F.explode(keys).alias("bk"))
           .select("_id", "_h", F.col("bk.band").alias("band"),
                   F.col("bk.key").alias("key")))
    a, b = sig.alias("a"), sig.alias("b")
    cand = (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.key") == F.col("b.key"))
                   & (F.col("a._id") < F.col("b._id")))
            .select(F.col("a._id").alias("id_a"),
                    F.col("a._h").alias("h_a"),
                    F.col("b._id").alias("id_b"),
                    F.col("b._h").alias("h_b"))
            .distinct())
    return (cand.withColumn(
                "hamming",
                F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
                 .cast("int"))
            .filter(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))


# ---------------------------------------------------------------------------
# real: caption ↔ media binding over interleaved span rows


def bind_captions(span_rows: DataFrame, *,
                  media_kinds=("picture", "table")) -> DataFrame:
    """Bind every ``caption`` span to its nearest media span within the
    document — the distributed analogue of the reference's assembly
    caption binding (docling/models/readingorder + docling-core items'
    ``captions`` list; PDF assembly attaches caption clusters to the
    nearest figure/table). Over an interleaved span table the
    proximity metric is span order: each caption binds to the closer
    of the last media span before it and the first after it, ties to
    the PRECEDING one (captions usually sit under their figure).

    Output: one row per caption span — (doc_id, caption_offset,
    caption_text, media_offset, media_ref, rel_pos) with rel_pos
    'prev'/'next' (media relative position) or NULL when the document
    has no media span.

    Scale shape: two windows over the same (doc_id, offset) ordering —
    ONE shuffle on doc_id, no join, no UDF; a 10^12-row span table
    partitions by doc hash and each document's spans sort locally."""
    from pyspark.sql.window import Window

    is_media = F.col("kind").isin(*media_kinds)
    w = Window.partitionBy("doc_id").orderBy("offset")
    before = w.rowsBetween(Window.unboundedPreceding, -1)
    after = w.rowsBetween(1, Window.unboundedFollowing)
    m_off = F.when(is_media, F.col("offset"))
    m_ref = F.when(is_media, F.col("media_ref"))
    ann = (span_rows
           .withColumn("_p_off", F.last(m_off, True).over(before))
           .withColumn("_p_ref", F.last(m_ref, True).over(before))
           .withColumn("_n_off", F.first(m_off, True).over(after))
           .withColumn("_n_ref", F.first(m_ref, True).over(after)))
    d_prev = F.col("offset") - F.col("_p_off")
    d_next = F.col("_n_off") - F.col("offset")
    use_prev = F.col("_p_off").isNotNull() & (
        F.col("_n_off").isNull() | (d_prev <= d_next))
    use_next = F.col("_n_off").isNotNull() & ~use_prev
    return (ann.filter(F.col("kind") == "caption")
            .select(
                "doc_id",
                F.col("offset").alias("caption_offset"),
                F.col("text").alias("caption_text"),
                F.when(use_prev, F.col("_p_off"))
                 .when(use_next, F.col("_n_off"))
                 .cast("int").alias("media_offset"),
                F.when(use_prev, F.col("_p_ref"))
                 .when(use_next, F.col("_n_ref")).alias("media_ref"),
                F.when(use_prev, F.lit("prev"))
                 .when(use_next, F.lit("next")).alias("rel_pos")))


# ---------------------------------------------------------------------------
# real: frame sampling plan (pure math over metadata — no codec)


def frame_sample_plan(duration_ms: Column, fps: float = 1.0,
                      max_frames: int = 32) -> Column:
    """Deterministic frame-sample timestamps (ms) for a video column:
    evenly spaced at `fps`, capped at max_frames — the planning half of
    frame extraction; the decode half is the pluggable stub."""
    n = F.least(F.floor(duration_ms / F.lit(1000.0 / fps)).cast("int") + 1,
                F.lit(max_frames))
    return F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: (i * (duration_ms / n)).cast("long"))


# ---------------------------------------------------------------------------
# real: audio header parsing (WAV/RIFF chunk walk, stdlib) + window plan


AUDIO_DDL = ("mime string, channels int, sample_rate int, bits int, "
             "n_samples long, duration_ms long, n_bytes int")


def parse_audio_header(data: bytes):
    """(mime, channels, sample_rate, bits, n_samples, duration_ms) from
    a WAV/RIFF container — a chunk walk honoring the spec's odd-size
    pad byte, robust to truncated payloads (header fields win; the data
    chunk need not be materialized to plan over it). Returns
    (``application/octet-stream``, None…) for non-RIFF bytes.

    This is the audio analogue of ``parse_image_header``: the METADATA
    step is real; PCM decode (the codec step) is the pluggable stub
    ``decode_audio`` below, same contract as ``decode_image``."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return ("application/octet-stream", None, None, None, None, None)
    channels = sample_rate = bits = block_align = None
    data_size = None
    i = 12
    while i + 8 <= len(data):
        cid = data[i:i + 4]
        size = struct.unpack("<I", data[i + 4:i + 8])[0]
        if cid == b"fmt " and i + 24 <= len(data):
            _, channels, sample_rate, _, block_align, bits = struct.unpack(
                "<HHIIHH", data[i + 8:i + 24])
        elif cid == b"data":
            data_size = size
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if channels is None or not block_align or not sample_rate:
        return ("audio/wav", channels, sample_rate, bits, None, None)
    n_samples = None if data_size is None else data_size // block_align
    duration_ms = (None if n_samples is None
                   else n_samples * 1000 // sample_rate)
    return ("audio/wav", channels, sample_rate, bits, n_samples,
            duration_ms)


def audio_meta_udf(col: Column) -> Column:
    @pandas_udf(AUDIO_DDL)
    def meta(blobs: pd.Series) -> pd.DataFrame:
        out = {"mime": [], "channels": [], "sample_rate": [], "bits": [],
               "n_samples": [], "duration_ms": [], "n_bytes": []}
        for b in blobs:
            data = bytes(b) if b is not None else b""
            mime, ch, sr, bits, n, dur = parse_audio_header(data)
            out["mime"].append(mime)
            out["channels"].append(ch)
            out["sample_rate"].append(sr)
            out["bits"].append(bits)
            out["n_samples"].append(n)
            out["duration_ms"].append(dur)
            out["n_bytes"].append(len(data))
        return pd.DataFrame(out)

    return meta(col)


def decode_audio(data: bytes) -> np.ndarray:
    """PCM sample decode — NOT available in this container.

    Raises NotImplementedError by design, same contract as
    ``decode_image``: plug soundfile/ffmpeg here; signature is
    bytes → (n_samples, channels) int16 array."""
    raise NotImplementedError(
        "no audio codec in this environment; plug soundfile/ffmpeg here")


def audio_window_plan(duration_ms: Column, window_ms: int = 25,
                      hop_ms: int = 10,
                      max_windows: int = 4096) -> Column:
    """Deterministic STFT-style analysis-window start offsets (ms) for
    an audio column: [0, hop, 2·hop, …] while a full window fits,
    capped at ``max_windows`` — pure Catalyst metadata math, the
    planning half of feature extraction (the decode half is the
    pluggable stub). Empty array when the clip is shorter than one
    window."""
    n_raw = F.floor((duration_ms - F.lit(window_ms))
                    / F.lit(hop_ms)).cast("int") + 1
    n = F.least(n_raw, F.lit(max_windows))
    # two guards: least() SKIPS nulls (null duration must give a null
    # plan, not max_windows), and sequence(1, 0) is the DESCENDING
    # [1, 0], not [] (sub-window clips must give an empty plan)
    return (F.when(n_raw.isNull(), F.lit(None).cast("array<bigint>"))
             .when(n >= 1,
                   F.transform(F.sequence(F.lit(1), n),
                               lambda i: ((i - 1) * F.lit(hop_ms))
                               .cast("long")))
             .otherwise(F.array().cast("array<bigint>")))


def with_image_meta(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    return df.withColumn("meta", image_meta_udf(F.col(bytes_col)))


def with_audio_meta(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    return df.withColumn("meta", audio_meta_udf(F.col(bytes_col)))


def with_image_features(df: DataFrame,
                        bytes_col: str = "bytes") -> DataFrame:
    return df.withColumn("features", image_features_udf(F.col(bytes_col)))


def media_asset_table(spans_df: DataFrame) -> DataFrame:
    """Asset-level dedup over interleaved documents: explode media
    spans and collapse by ``media_ref`` → (media_ref, n_refs, n_docs,
    first_doc_id). The 100 TB point: popular assets (logos, shared
    figures, re-hosted images) appear in thousands of documents — the
    decode / feature-extract / embedding UDFs should run ONCE per
    asset against this table and broadcast-join results back to span
    level, not run per occurrence. One explode (narrow) + one groupBy
    on media_ref; count_distinct is the standard two-phase expand."""
    m = (spans_df.select("doc_id", F.explode("spans").alias("s"))
         .filter(F.col("s.media_ref") != ""))
    return (m.groupBy(F.col("s.media_ref").alias("media_ref"))
            .agg(F.count("*").cast("long").alias("n_refs"),
                 F.count_distinct("doc_id").alias("n_docs"),
                 F.min("doc_id").alias("first_doc_id")))


def interleave_stats(span_rows: DataFrame, *,
                     media_kinds: tuple = ("picture", "image", "audio",
                                           "video")) -> DataFrame:
    """Per-document modality-interleaving profile over exploded span
    rows (doc_id, kind, offset): how much media a document carries and
    how tightly it is woven into the text. Emits per doc_id:

    - ``n_spans`` / ``n_text_spans`` / ``n_media_spans``
    - ``n_switches`` — modality transitions walking the spans in
      offset order (0 = single-modality or fully segregated layout;
      high = caption-dense interleaving). THE signal an interleaved
      text+media training mix is curated on: a vision-language batch
      builder wants documents where images sit next to the prose that
      references them, not an image dump with a text appendix.
    - ``first_media_offset`` (-1 when the doc has no media)
    - ``media_ratio_e6`` — floor(n_media × 1e6 / n_spans)

    Plan shape: ONE groupBy(doc_id) — the modality flag is computed in
    the scan projection, the offset-ordered walk is the repo's
    standard ``sort_array(collect_list(struct(...)))`` reassembly
    idiom, and the switch count folds over that (tiny, doc-local)
    array JVM-side. No window function, no second shuffle, no Python.
    """
    is_media = F.col("kind").isin(*media_kinds).cast("int")
    rows = span_rows.select(
        "doc_id", F.col("offset").cast("int").alias("offset"),
        is_media.alias("m"))
    g = rows.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_spans"),
        F.sum(1 - F.col("m")).cast("long").alias("n_text_spans"),
        F.sum("m").cast("long").alias("n_media_spans"),
        F.min(F.when(F.col("m") == 1, F.col("offset")))
        .alias("_first_media"),
        F.sort_array(F.collect_list(F.struct("offset", "m")))
        .alias("_walk"))
    flags = F.transform(F.col("_walk"), lambda s: s["m"])
    n = F.size(flags)
    switches = F.when(n <= 1, F.lit(0)).otherwise(F.size(F.filter(
        F.zip_with(F.slice(flags, 1, n - 1), F.slice(flags, 2, n - 1),
                   lambda a, b: a != b),
        lambda x: x)))
    return g.select(
        "doc_id", "n_spans", "n_text_spans", "n_media_spans",
        switches.cast("int").alias("n_switches"),
        F.coalesce(F.col("_first_media"), F.lit(-1)).cast("int")
        .alias("first_media_offset"),
        F.floor(F.col("n_media_spans") * F.lit(1000000)
                / F.col("n_spans")).cast("long")
        .alias("media_ratio_e6"))


# -- EXIF / TIFF IFD metadata ------------------------------------------------

EXIF_DDL = ("byte_order string, width int, height int, orientation int, "
            "make string, model string, datetime string, n_tags int")

_EXIF_ASCII = {271: "make", 272: "model", 306: "datetime"}
_EXIF_SHORT = {256: "width", 257: "height", 274: "orientation"}


def parse_exif(data: bytes):
    """Baseline TIFF IFD0 parse (the container EXIF lives in): byte
    order (II/MM), ImageWidth/Length (256/257), Orientation (274),
    Make/Model/DateTime (271/272/306 ASCII). Accepts bare TIFF bytes
    or a JPEG whose APP1 segment carries the standard ``Exif\\0\\0``
    header (the walk skips segments exactly like a camera-file
    reader). Returns None for anything else — at crawl scale media
    metadata must degrade to NULL, never to an exception.

    Implements ISO 12234-2/TIFF 6.0 structure from the public spec;
    no imaging library (the reference's image handling is all
    PIL-delegated — /root/reference/docling/utils/export.py and the
    page-image path — so this parser is net-new surface, like the
    PGM/PNG decoders above)."""
    tiff = None
    if data[:4] in (b"II*\x00", b"MM\x00*"):
        tiff = data
    elif data[:2] == b"\xff\xd8":           # JPEG: walk to APP1/Exif
        p = 2
        while p + 4 <= len(data) and data[p] == 0xFF:
            marker, ln = data[p + 1], int.from_bytes(
                data[p + 2:p + 4], "big")
            if marker == 0xE1 and data[p + 4:p + 10] == b"Exif\x00\x00":
                tiff = data[p + 10:p + 2 + ln]
                break
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD9:
                p += 2
                continue
            p += 2 + ln
    if tiff is None or len(tiff) < 8:
        return None
    le = tiff[:2] == b"II"
    end = "<" if le else ">"
    try:
        ifd = struct.unpack(end + "I", tiff[4:8])[0]
        n = struct.unpack(end + "H", tiff[ifd:ifd + 2])[0]
    except struct.error:
        return None
    out = {"byte_order": "II" if le else "MM", "width": None,
           "height": None, "orientation": None, "make": None,
           "model": None, "datetime": None, "n_tags": n}
    for i in range(min(n, 256)):
        e = ifd + 2 + 12 * i
        if e + 12 > len(tiff):
            break
        tag, typ, cnt = struct.unpack(end + "HHI", tiff[e:e + 8])
        val = tiff[e + 8:e + 12]
        if tag in _EXIF_SHORT and typ in (3, 4):
            v = struct.unpack(end + ("H2x" if typ == 3 else "I"),
                              val)[0]
            out[_EXIF_SHORT[tag]] = int(v)
        elif tag in _EXIF_ASCII and typ == 2:
            if cnt <= 4:
                raw = val[:cnt]
            else:
                off = struct.unpack(end + "I", val)[0]
                raw = tiff[off:off + cnt]
            out[_EXIF_ASCII[tag]] = (raw.split(b"\x00", 1)[0]
                                     .decode("latin-1", "replace"))
    return out


def exif_meta_udf(col: Column) -> Column:
    @pandas_udf(EXIF_DDL)
    def meta(blobs: pd.Series) -> pd.DataFrame:
        rows = []
        for b in blobs:
            m = None if b is None else parse_exif(bytes(b))
            rows.append(m or dict.fromkeys(
                ("byte_order", "width", "height", "orientation",
                 "make", "model", "datetime", "n_tags")))
        return pd.DataFrame(rows)

    return meta(col)


def with_exif_meta(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Zero-shuffle Arrow projection: input columns minus the blob
    plus the parsed EXIF struct fields (NULLs for non-TIFF/JPEG)."""
    keep = [c for c in df.columns if c != bytes_col]
    return (df.withColumn("_x", exif_meta_udf(F.col(bytes_col)))
            .select(*keep, "_x.*"))


def synth_tiff(width: int, height: int, orientation: int,
               make: str, model: str, datetime_s: str,
               little_endian: bool = True) -> bytes:
    """Minimal structurally-honest baseline TIFF: header + one IFD
    with the six tags parse_exif reads, ASCII values stored past the
    IFD with real offsets (exercising the offset-indirection path
    whenever a string exceeds the 4 inline bytes)."""
    end = "<" if little_endian else ">"
    entries = []       # (tag, type, count, packed-value-or-None, data)
    for tag, v in ((256, width), (257, height), (274, orientation)):
        entries.append((tag, 3, 1,
                        struct.pack(end + "HH", int(v), 0), None))
    for tag, s in ((271, make), (272, model), (306, datetime_s)):
        raw = s.encode("latin-1", "replace") + b"\x00"
        if len(raw) <= 4:
            entries.append((tag, 2, len(raw), raw.ljust(4, b"\x00"),
                            None))
        else:
            entries.append((tag, 2, len(raw), None, raw))
    entries.sort(key=lambda e: e[0])        # TIFF mandates tag order
    ifd_at = 8
    data_at = ifd_at + 2 + 12 * len(entries) + 4
    body = bytearray()
    fixed = []
    for tag, typ, cnt, inline, blob in entries:
        if inline is None:
            inline = struct.pack(end + "I", data_at + len(body))
            body += blob
        fixed.append((tag, typ, cnt, inline))
    buf = bytearray((b"II" if little_endian else b"MM"))
    buf += struct.pack(end + "HI", 42, ifd_at)
    buf += struct.pack(end + "H", len(fixed))
    for tag, typ, cnt, inline in fixed:
        buf += struct.pack(end + "HHI", tag, typ, cnt) + inline
    buf += struct.pack(end + "I", 0)        # no next IFD
    buf += body
    return bytes(buf)
