"""Text vectorization: feature-hash embeddings (the hashing trick,
Weinberger et al. 2009 — the deterministic, vocabulary-free text
vectorizer that connects the document stack to the vector stack:
docs → embed_hash → kNN / k-means / PQ / embedding-dedup all apply).

Each token hashes to one of ``dim`` buckets with a ±1 sign hash (the
sign hash keeps collisions unbiased); the bucket accumulates the
token's count, and the final vector is L2-normalized. Both hashes are
md5 prefixes — the exact formula every other oracle-replayable hash in
this engine uses — so the DuckDB oracle rebuilds the embedding bit-for
-bit at e4 precision.

Scale shape: doc-local — ONE Arrow-batched pass, no explode, no
shuffle; at 100 TB it fuses with the scan like the winnowing
fingerprinter.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

EMBED_DIM = 64


def _token_bucket_sign(token: str, dim: int) -> tuple:
    h = hashlib.md5(token.encode("utf-8")).hexdigest()
    bucket = int(h[:8], 16) % dim
    sign = 1.0 if int(h[8], 16) >= 8 else -1.0
    return bucket, sign


def _embed_udf(dim: int):
    cache: dict = {}

    @pandas_udf("array<double>")
    def embed(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = (t or "").split(" ")
            v = np.zeros(dim, dtype=np.float64)
            for tok in toks:
                if not tok:
                    continue
                bs = cache.get(tok)
                if bs is None:
                    bs = cache[tok] = _token_bucket_sign(tok, dim)
                v[bs[0]] += bs[1]
            n = np.linalg.norm(v)
            if n > 0:
                v /= n
            out.append(v.tolist())
        return pd.Series(out)

    return embed


def embed_hash(docs: DataFrame, *, dim: int = EMBED_DIM) -> DataFrame:
    """(doc_id, text) → (vec_id, embedding array<double>): signed
    feature-hash embedding of the normalized token stream, L2-unit.
    Column named ``vec_id`` so the output drops straight into the
    similarity/clustering operators."""
    nt = F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")))
    return docs.select(
        F.col("doc_id").alias("vec_id"),
        _embed_udf(dim)(nt).alias("embedding"))
