"""Training-stream assembly: concat-and-chunk sequence packing and
deterministic weighted corpus sampling (mixing).

Both operators are pure ``pyspark.sql.functions`` and SQL-replayable:
the only randomness is an md5-derived uniform, so a re-run (or the
DuckDB oracle) reproduces the exact same sample and the exact same
packing layout — the property a resumable 100 TB job needs.

Scale shape:
- ``pack_sequences`` shards by an md5 hash of doc_id (shard count is a
  knob — set it ≫ executor count so each shard's window sort is one
  modest task; hashing balances shard token mass), then runs ONE
  window cumsum per shard. That is the standard distributed spelling
  of GPT-style "concatenate shard, slice into fixed-length sequences":
  a doc may straddle two sequences, exactly like the single-machine
  packer.
- ``sample_weighted`` is a zero-shuffle filter: the keep decision is a
  per-row hash comparison against the group's rate, fused into the
  scan stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _hash_u(col: Column, mod: int, *, salt: str = "", digits: int = 8
            ) -> Column:
    """Deterministic uniform in [0, mod): leading md5 hex digits of
    ``salt || col`` as an integer, modulo ``mod``. Exactly replayable
    in ANSI SQL (('0x' || substr(md5(..),1,8))::BIGINT % mod)."""
    return (F.conv(F.substring(
        F.md5(F.concat(F.lit(salt), col.cast("string"))), 1, digits),
        16, 10).cast("long") % mod)


def pack_sequences(docs: DataFrame, *, seq_len: int = 2048,
                   n_shards: int = 64,
                   tokens_col: str = "n_tokens") -> DataFrame:
    """(doc_id, n_tokens) → packing layout per document.

    Documents are hash-assigned to shards; within a shard they are
    concatenated in doc_id order and the token stream is sliced into
    fixed ``seq_len`` windows. Output: the shard, the document's start
    offset in the shard's token stream, the first/last sequence index
    it lands in, and how many sequences it spans.
    """
    w = (Window.partitionBy("shard_id").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    toks = F.col(tokens_col).cast("long")
    base = docs.select(
        "doc_id", toks.alias("n_tokens"),
        _hash_u(F.col("doc_id"), n_shards, salt="shard:")
        .cast("int").alias("shard_id"))
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    out = base.select(
        "doc_id", "shard_id", "n_tokens", start.alias("start_tok"))
    first_seq = F.floor(F.col("start_tok") / seq_len)
    last_seq = F.floor(
        (F.col("start_tok") + F.greatest(F.col("n_tokens"), F.lit(1)) - 1)
        / seq_len)
    return out.select(
        "doc_id", "shard_id", "n_tokens", "start_tok",
        first_seq.cast("long").alias("first_seq"),
        last_seq.cast("long").alias("last_seq"),
        (last_seq - first_seq + 1).cast("int").alias("n_seqs"))


def pack_interleaved(docs: DataFrame, *, seq_len: int = 2048,
                     n_shards: int = 64,
                     tokens_col: str = "n_tokens",
                     images_col: str = "n_images",
                     image_tokens: int = 576) -> DataFrame:
    """Interleaved text+media packing layout: like ``pack_sequences``
    but each document's cost is its text tokens PLUS a fixed
    per-image token budget (``image_tokens`` — e.g. a 24×24-patch
    vision encoder emits 576 tokens per image), the accounting every
    multimodal training stream needs. Emits the combined ``cost``,
    the shard-stream offsets/sequence span under that cost, and the
    document's media token share (×1e6) so mixture monitoring can
    track text/vision balance per shard.

    Same scale shape as ``pack_sequences``: hash-shard assignment is a
    zero-shuffle projection; ONE window cumsum per shard (shard count
    ≫ executor count keeps each sort a modest task). SQL-replayable:
    cost and offsets are pure closed-form expressions of
    (n_tokens, n_images)."""
    toks = F.col(tokens_col).cast("long")
    imgs = F.col(images_col).cast("long")
    base = docs.select(
        "doc_id", toks.alias("n_tokens"), imgs.alias("n_images"),
        (toks + imgs * image_tokens).alias("cost"),
        _hash_u(F.col("doc_id"), n_shards, salt="shard:")
        .cast("int").alias("shard_id"))
    w = (Window.partitionBy("shard_id").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    start = F.coalesce(F.sum("cost").over(w), F.lit(0))
    out = base.select("doc_id", "shard_id", "n_tokens", "n_images",
                      "cost", start.alias("start_tok"))
    first_seq = F.floor(F.col("start_tok") / seq_len)
    last_seq = F.floor(
        (F.col("start_tok") + F.greatest(F.col("cost"), F.lit(1)) - 1)
        / seq_len)
    media_share = F.floor(
        F.col("n_images") * image_tokens * F.lit(1000000)
        / F.greatest(F.col("cost"), F.lit(1)))
    return out.select(
        "doc_id", "shard_id", "n_tokens", "n_images", "cost",
        "start_tok",
        first_seq.cast("long").alias("first_seq"),
        last_seq.cast("long").alias("last_seq"),
        (last_seq - first_seq + 1).cast("int").alias("n_seqs"),
        media_share.cast("long").alias("media_share_e6"))


def sample_weighted(docs: DataFrame, rates_e4: dict[str, int], *,
                    group_col: str = "lang",
                    default_rate_e4: int = 0,
                    salt: str = "sample:") -> DataFrame:
    """Deterministic per-group Bernoulli sampling: keep a row iff its
    md5-uniform draw (in [0, 10000)) is below the group's rate.
    ``rates_e4`` maps group value → keep-rate × 1e4 (e.g. 2500 =
    25%). The draw depends only on (salt, doc_id), so adding groups or
    re-running never reshuffles which documents survive.
    """
    u = _hash_u(F.col("doc_id"), 10000, salt=salt)
    rate = F.lit(default_rate_e4)
    for g, r in sorted(rates_e4.items()):
        rate = F.when(F.col(group_col) == g, F.lit(int(r))).otherwise(rate)
    return (docs.withColumn("u_e4", u)
            .filter(F.col("u_e4") < rate)
            .select("doc_id", group_col, "u_e4"))


def split_docs(docs: DataFrame, *, weights_e4: dict[str, int] = None,
               salt: str = "split:") -> DataFrame:
    """Deterministic train/val/test assignment: each doc draws an
    md5-uniform value in [0, 10000) from (salt, doc_id) and falls into
    the first split whose cumulative weight covers it. ``weights_e4``
    maps split name → weight × 1e4 and must sum to 10000 (default
    9000/500/500). The draw depends only on (salt, doc_id): re-runs,
    new documents, and re-partitioning never move an existing doc
    across splits — the property random() splits lack and the reason
    eval contamination survives naive re-splits. Zero shuffle: one
    projection."""
    if weights_e4 is None:
        weights_e4 = {"train": 9000, "val": 500, "test": 500}
    if sum(weights_e4.values()) != 10000:
        raise ValueError("weights_e4 must sum to 10000")
    u = _hash_u(F.col("doc_id"), 10000, salt=salt)
    expr = None
    edge = 0
    for name, w in weights_e4.items():  # insertion order = layout
        edge += w
        cond = u < edge
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return docs.withColumn("split", expr)


def cap_per_group(docs: DataFrame, *, group_col: str, n: int,
                  salt: str = "cap:") -> DataFrame:
    """Deterministic per-group cap — "at most N docs per domain", the
    RefinedWeb-style anti-monoculture rule. Ranks each group's docs by
    an md5-uniform draw on (salt, doc_id) (so the kept subset is a
    uniform sample, stable across runs and unaffected by other
    groups) and keeps the N lowest.

    Ranking uses the salted two-phase distributed top-k
    (retrieval.distributed_topk, ascending) — a mega-domain's rows
    never concentrate in one task the way a plain
    ``Window.partitionBy(domain)`` would."""
    from .retrieval import distributed_topk

    u = _hash_u(F.col("doc_id"), 1_000_000_000, salt=salt)
    ranked = distributed_topk(
        docs.withColumn("_u", u), key=group_col, order="_u",
        tie="doc_id", k=n, ascending=True)
    return ranked.drop("_u", "rank")


def mixture_weights(docs: DataFrame, *, group_col: str = "lang",
                    alpha: float = 0.3) -> DataFrame:
    """Temperature-based corpus mixing weights (XLM-R / mT5 recipe,
    Conneau et al. 2020 §3.1): per-group sampling probability
    q_g ∝ p_g^α where p_g is the group's token share. α<1 upsamples
    the tail (low-resource languages / rare sources), α=1 is
    proportional, α→0 is uniform. Since N^α cancels in the
    normalization, q is computed from raw token counts — and the
    per-group pow() is quantized to an integer (floor(n^α · 1e6))
    BEFORE the cross-group normalization sum, so the normalizer is an
    exact integer sum (order-independent) and every output is
    engine-exact.

    Output per group: doc/token counts, token share (×1e6), sampling
    weight q (×1e6), and rate = q/p (×1e6) — the per-document epoch
    multiplier a sampler applies within the group.

    Scale shape: ONE groupBy over the corpus (map-side partial; token
    counting reuses the staged token array) + one broadcast of the
    1-row totals onto the group rows (bounded by group cardinality).
    """
    from .textstats import tokens_col

    g = (docs.groupBy(group_col)
         .agg(F.count("*").alias("n_docs"),
              F.sum(F.size(tokens_col())).alias("n_tokens")))
    g = g.withColumn(
        "_pw", F.floor(F.pow(F.col("n_tokens").cast("double"),
                             F.lit(float(alpha))) * 1_000_000)
        .cast("long"))
    tot = g.agg(F.sum("n_tokens").alias("_nt"),
                F.sum("_pw").alias("_spw"))
    out = g.crossJoin(F.broadcast(tot))
    return out.select(
        group_col,
        F.col("n_docs").cast("int").alias("n_docs"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.floor(F.lit(1e6) * F.col("n_tokens") / F.col("_nt"))
        .cast("long").alias("share_e6"),
        F.floor(F.lit(1e6) * F.col("_pw") / F.col("_spw"))
        .cast("long").alias("weight_e6"),
        F.floor(F.lit(1e6) * F.col("_pw") * F.col("_nt")
                / (F.col("_spw") * F.col("n_tokens")))
        .cast("long").alias("rate_e6"))


def pack_manifest(docs: DataFrame, *, seq_len: int = 2048,
                  n_shards: int = 64,
                  tokens_col: str = "n_tokens") -> DataFrame:
    """The trainer-facing half of packing: one row per
    (shard, sequence, document) slice — where each document's tokens
    sit inside each fixed-length training sequence. This is the
    manifest a dataloader needs to build per-sequence attention masks
    (no cross-document attention) and loss boundaries when documents
    straddle sequence edges.

    Output: (shard_id, seq_idx, doc_id, pos_in_seq, doc_off, slice_len)
    — ``pos_in_seq`` is the slice's offset inside the sequence,
    ``doc_off`` the offset inside the document, both 0-based; a
    sequence's slices tile it exactly (except the shard's ragged tail).

    Derived from ``pack_sequences``'s layout by a bounded explode
    (n_seqs rows per doc — narrow, no extra shuffle beyond the one
    per-shard cumsum window). Empty docs are clamped to a 1-token
    slot by pack_sequences and emit their placeholder slice."""
    layout = pack_sequences(docs, seq_len=seq_len, n_shards=n_shards,
                            tokens_col=tokens_col)
    seq = F.explode(
        F.sequence(F.col("first_seq"), F.col("last_seq"))).alias(
        "seq_idx")
    ex = layout.select("doc_id", "shard_id", "n_tokens", "start_tok",
                       seq)
    gs = F.greatest(F.col("seq_idx") * seq_len, F.col("start_tok"))
    ge = F.least((F.col("seq_idx") + 1) * seq_len,
                 F.col("start_tok") + F.greatest(F.col("n_tokens"),
                                                 F.lit(1)))
    return ex.select(
        "shard_id", F.col("seq_idx").cast("long").alias("seq_idx"),
        "doc_id",
        (gs - F.col("seq_idx") * seq_len).cast("int")
        .alias("pos_in_seq"),
        (gs - F.col("start_tok")).cast("long").alias("doc_off"),
        (ge - gs).cast("int").alias("slice_len"))


def epoch_plan(docs: DataFrame, *, target_tokens: int,
               group_col: str = "lang", alpha: float = 0.3,
               max_epochs_e3: int = 4000) -> DataFrame:
    """Data-constrained training plan (Muennighoff et al. 2023,
    "Scaling Data-Constrained Language Models"): given a total token
    budget and temperature-mixed group weights, how many EPOCHS of
    each group the sampler must draw — and whether that exceeds the
    repetition budget where extra epochs stop adding value (the paper
    bounds useful repetition at ~4 epochs).

    requested_g = weight_g × target_tokens; epochs_g = requested_g /
    available_g (×1e3, floored — integer-exact given the already
    integer-quantized weight_e6). ``over_budget`` marks groups whose
    epochs exceed ``max_epochs_e3``; the trainer either caps them
    (redistributing budget) or accepts decayed-value repetition.

    Scale shape: pure derivation on ``mixture_weights``'s per-group
    rows — the ONE corpus aggregation there is the only corpus-scale
    work; this adds zero shuffles of corpus data.

    Output per group: available tokens, sampling weight (×1e6),
    requested tokens, epochs (×1e3), over_budget flag.
    """
    w = mixture_weights(docs, group_col=group_col, alpha=alpha)
    requested = F.floor(F.col("weight_e6") * F.lit(int(target_tokens))
                        / F.lit(1_000_000)).cast("long")
    epochs = F.floor(requested * F.lit(1000) / F.col("n_tokens"))\
        .cast("long")
    return w.select(
        group_col,
        F.col("n_tokens").alias("available_tokens"),
        "weight_e6",
        requested.alias("requested_tokens"),
        epochs.alias("epochs_e3"),
        (epochs > int(max_epochs_e3)).cast("int").alias("over_budget"))
