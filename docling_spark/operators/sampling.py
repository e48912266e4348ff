"""Deterministic corpus sampling & splitting — the release-engineering
tail of a training-data pipeline: draw a weighted per-source sample for
eval/audit, and carve reproducible train/val/test splits.

No reference counterpart (docling has no sampling code); algorithms
from the public literature:

* weighted reservoir sampling per group = Efraimidis & Spirakis 2006
  ("Weighted random sampling with a reservoir", IPL 97(5)): the top-k
  documents by key u_i^(1/w_i) are an exact weighted-without-
  replacement sample. Spelled as the equivalent ranking by
  ln(u_i)/w_i (monotone for u∈(0,1), w>0), integer-quantized to e6
  like every other score in this repo (dsir.py conventions) so
  cross-engine ordering is exact;
* hash-based stratified splits = the standard mod-bucket assignment
  (e.g. Kohavi-style holdouts as done in every production feature
  store): split membership is a pure function of (doc_id, salt), so
  re-running the pipeline — or running it on a different cluster —
  yields byte-identical splits.

Randomness is the repo's replayable unit hash (48-bit md5 prefix /
2^48, sketch.py:_unit_hash) — deterministic, seedless, and replayable
in ANSI SQL by the DuckDB oracles.

Scale shape: reservoir sampling is scoring (zero-shuffle, pure
Catalyst) + the salted two-phase top-k (retrieval.distributed_topk) —
no global sort, no per-group collect; splits are a zero-shuffle
projection that composes into the scan stage.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HASH_DENOM = float(1 << 48)


def _unit(col) -> F.Column:
    """Replayable unit-interval hash: (0,1] from the md5 48-bit
    prefix (+1 so ln never sees 0)."""
    return ((F.conv(F.substring(F.md5(col.cast("string")), 1, 12),
                    16, 10).cast("double") + 1.0)
            / F.lit(_HASH_DENOM))


def reservoir_sample_per_source(docs: DataFrame, *, k: int,
                                group_col: str = "source",
                                weight_col: Optional[str] = None,
                                salt: str = "") -> DataFrame:
    """Exact weighted (or uniform) without-replacement sample of ``k``
    docs per group: rank by key_e6 = floor(1e6 · ln(u)/w) descending
    (E-S 2006; w=1 when ``weight_col`` is None makes it the classic
    uniform reservoir), doc_id ascending as the tiebreak. Returns the
    sampled rows + (key_e6, rank 1..k).

    ``salt`` re-draws the whole sample deterministically — audits use
    a different salt per round without touching the corpus."""
    from .retrieval import distributed_topk

    u = _unit(F.concat(F.col("doc_id").cast("string"), F.lit(salt)))
    w = (F.col(weight_col).cast("double") if weight_col
         else F.lit(1.0))
    # ln(u) < 0; larger w → key closer to 0 → more likely sampled
    key = F.floor(F.log(u) / F.greatest(w, F.lit(1e-12))
                  * F.lit(1_000_000.0)).cast("long")
    scored = docs.withColumn("key_e6", key)
    return distributed_topk(scored, key=group_col, order="key_e6",
                            tie="doc_id", k=k)


def stratified_split(docs: DataFrame, *,
                     fractions: Sequence[Tuple[str, float]] = (
                         ("train", 0.98), ("val", 0.01), ("test", 0.01)),
                     salt: str = "v1") -> DataFrame:
    """Reproducible split assignment, stratified by construction: the
    bucket b = floor(u(doc_id‖salt) · 10000) is uniform WITHIN every
    subpopulation (source, language, …) because it is independent of
    all attributes, so each stratum receives each split at the
    requested rate. Emits (…, split) with cumulative bucket ranges in
    ``fractions`` order; fractions must sum to ≤ 1 (the remainder
    falls into the last split).

    Zero-shuffle, zero-Python: one md5 per row inside whole-stage
    codegen; the assignment is stable under corpus growth (a doc's
    split never changes when other docs are added — the property that
    keeps eval sets frozen across releases)."""
    u = _unit(F.concat(F.col("doc_id").cast("string"), F.lit(salt)))
    bucket = F.floor(u * 10000).cast("int")
    expr = None
    acc = 0.0
    for name, frac in fractions[:-1]:
        acc += frac
        cond = bucket < int(round(acc * 10000))
        expr = (F.when(cond, F.lit(name)) if expr is None
                else expr.when(cond, F.lit(name)))
    last = fractions[-1][0]
    split = (F.lit(last) if expr is None
             else expr.otherwise(F.lit(last)))
    return docs.withColumn("split", split)
