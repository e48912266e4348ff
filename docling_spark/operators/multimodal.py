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
    return None, None, "application/octet-stream"


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


def with_image_meta(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    return df.withColumn("meta", image_meta_udf(F.col(bytes_col)))


def with_image_features(df: DataFrame,
                        bytes_col: str = "bytes") -> DataFrame:
    return df.withColumn("features", image_features_udf(F.col(bytes_col)))
