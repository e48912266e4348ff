"""CCNet-style language-model quality filtering.

CCNet (Wenzek et al. 2020) filters web text by the perplexity of a
KenLM 5-gram model trained on Wikipedia. The engine spelling keeps the
pipeline shape (train a reference LM → score every document by mean
negative log-likelihood → gate on a threshold) with a unigram
add-alpha model, which is deterministic, needs no external model file,
and — critically for the oracle — can be made ORDER-INDEPENDENT:

* the log-probability of each DISTINCT vocabulary token is computed
  once and quantized to an integer (floor(ln p · 1e6)) in the
  vocabulary table itself;
* each document then SUMS INTEGERS — immune to the float-summation-
  order differences that make naive distributed log-prob sums
  non-replayable across engines (and across Spark runs with different
  partitioning!);
* the mean NLL is one final double division of two exact integers.

Plug a real KenLM in by swapping the vocabulary table for an
Arrow-batched UDF over the model file — the gate and plan shape stay
identical.

Scale shape: the reference slice aggregates to a vocabulary table
(bounded by vocabulary, not corpus — broadcast); scoring is one token
explode + broadcast join + ONE groupBy(doc_id) with algebraic
aggregates (map-side partial). No windows, no sorts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import tokens_col

LM_ALPHA = 0.5
LM_SCALE = 1_000_000


def unigram_lm_table(ref: DataFrame, *, alpha: float = LM_ALPHA):
    """Train the reference model: (token, lp_e6) for every vocabulary
    token, plus the unseen-token log-prob as a 1-row DataFrame.
    Add-alpha smoothing over vocabulary V (+1 unseen class):
    p(tok) = (c + α) / (N + α·(V+1))."""
    toks = ref.select(F.explode(tokens_col()).alias("token"))
    counts = toks.groupBy("token").agg(F.count("*").alias("c"))
    stats = counts.agg(F.sum("c").alias("n"),
                       F.count("*").alias("v"))
    denom = F.col("n") + alpha * (F.col("v") + 1)
    vocab = (counts.crossJoin(F.broadcast(stats))
             .select("token",
                     F.floor(F.log((F.col("c") + alpha) / denom)
                             * LM_SCALE).cast("long").alias("lp_e6")))
    unseen = stats.select(
        F.floor(F.log(alpha / denom) * LM_SCALE)
        .cast("long").alias("lp_e6"))
    return vocab, unseen


def lm_score(docs: DataFrame, ref: DataFrame, *,
             alpha: float = LM_ALPHA,
             max_mean_nll_e6: int = None,
             broadcast_vocab: bool = True) -> DataFrame:
    """(doc_id, text) → (doc_id, n_tokens, mean_nll_e6[, keep]) —
    mean negative log-likelihood (×1e6, floored) of each document
    under the unigram model trained on ``ref``. Lower = more like the
    reference corpus. With ``max_mean_nll_e6`` set, adds the CCNet
    keep/drop gate column.

    ``broadcast_vocab`` pins the vocab join broadcast — right for the
    CCNet setup (reference = curated corpus, vocabulary in the
    millions). Disable it when the reference slice is itself web-scale
    (typo-heavy vocabularies grow with corpus size per Heaps' law and
    can exceed executor memory): the join falls back to a hash
    shuffle on token, still one pass."""
    vocab, unseen = unigram_lm_table(ref, alpha=alpha)
    if broadcast_vocab:
        vocab = F.broadcast(vocab)
    toks = docs.select("doc_id", F.explode(tokens_col()).alias("token"))
    scored = (toks
              .join(vocab, "token", "left")
              .crossJoin(F.broadcast(
                  unseen.select(F.col("lp_e6").alias("_u"))))
              .select("doc_id", F.coalesce("lp_e6", "_u").alias("lp")))
    agg = (scored.groupBy("doc_id")
           .agg(F.count("*").alias("_n"), F.sum("lp").alias("_slp")))
    out = agg.select(
        "doc_id", F.col("_n").cast("int").alias("n_tokens"),
        F.floor(-1.0 * F.col("_slp") / F.col("_n"))
        .cast("long").alias("mean_nll_e6"))
    if max_mean_nll_e6 is not None:
        out = out.withColumn(
            "keep", (F.col("mean_nll_e6") <= max_mean_nll_e6)
            .cast("int"))
    return out
