"""Text-analysis operators for training-data pipelines.

Everything here except winnowing is pure ``pyspark.sql.functions`` —
JVM-side, whole-stage-codegen friendly — so at 100 TB the hot path
never crosses the Arrow boundary; the one exception
(``winnow_fingerprints``) needs a true sliding-window minimum and runs
it as a single Arrow-batched NumPy pass. Each operator has an exact
ANSI SQL equivalent (the DuckDB oracles in ``__spark_entry__``): the
Spark expression and the SQL are two spellings of the same formula.

Operators: token counting (whitespace + BPE-style regex), quality
scoring (incl. Gopher-style signals), language-ID (stop-word marker
heuristic), document fingerprinting (exact md5 + MOSS winnowing).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# marker stop-words per language for the n-gram/stop-word heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of", "is"],
    "es": ["el", "la", "de", "que"],
    "de": ["der", "und", "die", "ist"],
    "fr": ["le", "la", "et", "est"],
}
LANG_ORDER = ["en", "es", "de", "fr"]  # deterministic argmax precedence

EN_STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is",
                "it", "that", "for", "on", "with", "as"]


def norm_text() -> Column:
    """Whitespace-collapsed, lower-cased text (the engine's canonical
    normalization — analogue of the reference's sanitize step,
    models/page_assemble_model.py:32-63, minus glyph fixes)."""
    return F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")))


def tokens_col() -> Column:
    return F.split(norm_text(), " ")


# BPE-style pre-tokenizer (ASCII subset of the GPT-2 pattern: letter
# runs, digit runs, single punctuation marks) — class-based so the
# Java and RE2 regex engines agree character-for-character
BPE_TOKEN_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def with_token_stats(docs: DataFrame) -> DataFrame:
    toks = tokens_col()
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.length(norm_text()).alias("n_chars_norm"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
        F.size(F.regexp_extract_all(norm_text(), F.lit(BPE_TOKEN_RE), 0))
         .alias("n_bpe_tokens"),
    )


def with_quality(docs: DataFrame) -> DataFrame:
    """Length / punctuation / stop-word quality signals + Gopher-style
    repetition/shape signals (symbol ratio, alphabetic-token ratio,
    max token length) + a keep flag (the boilerplate-quality gate of a
    pretraining pipeline)."""
    toks = tokens_col()
    n_tokens = F.size(toks)
    n_chars = F.length(norm_text())
    punct = F.length(F.regexp_replace(norm_text(), r"[^.,;:!?]", ""))
    symbol = F.length(F.regexp_replace(norm_text(), r"[^#…]", ""))
    stop_hits = F.size(F.filter(
        toks, lambda t: t.isin(EN_STOPWORDS)))
    alpha_hits = F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
    max_tok = F.array_max(F.transform(toks, lambda t: F.length(t)))
    # ratios ship as floor(x*1e4) bigints: exact integer comparison
    # across engines (no float-rounding divergence vs the SQL oracle)
    def e4(x):
        return F.floor(x * 10000).cast("long")

    mean_tok_len = (n_chars - (n_tokens - 1)) / F.greatest(n_tokens, F.lit(1))
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        e4(punct / F.greatest(n_chars, F.lit(1))).alias("punct_ratio_e4"),
        e4(symbol / F.greatest(n_chars, F.lit(1))).alias("symbol_ratio_e4"),
        e4(stop_hits / F.greatest(n_tokens, F.lit(1)))
         .alias("stopword_ratio_e4"),
        e4(alpha_hits / F.greatest(n_tokens, F.lit(1)))
         .alias("alpha_token_ratio_e4"),
        e4(mean_tok_len).alias("mean_token_len_e4"),
        max_tok.cast("int").alias("max_token_len"),
        ((n_tokens >= 10) & (n_tokens <= 100000)).cast("int")
         .alias("quality_keep"),
    )


def lang_score(lang: str) -> Column:
    toks = tokens_col()
    return F.size(F.filter(toks, lambda t: t.isin(LANG_MARKERS[lang])))


def lang_pred_col() -> Column:
    """The language-ID decision as a standalone column (fixed-precedence
    CASE argmax: en > es > de > fr on ties, so Spark and the SQL
    oracle agree)."""
    s = {lang: lang_score(lang) for lang in LANG_ORDER}
    return (
        F.when((s["en"] > 0) & (s["en"] >= s["es"]) & (s["en"] >= s["de"])
               & (s["en"] >= s["fr"]), F.lit("en"))
        .when((s["es"] > 0) & (s["es"] >= s["de"]) & (s["es"] >= s["fr"]),
              F.lit("es"))
        .when((s["de"] > 0) & (s["de"] >= s["fr"]), F.lit("de"))
        .when(s["fr"] > 0, F.lit("fr"))
        .otherwise(F.lit("und")))


def with_language_id(docs: DataFrame) -> DataFrame:
    """Stop-word-marker language ID; see lang_pred_col."""
    s = {lang: lang_score(lang) for lang in LANG_ORDER}
    pred = lang_pred_col()
    return docs.select(
        "doc_id", F.col("lang").alias("lang_true"),
        *[s[lang].alias(f"score_{lang}") for lang in LANG_ORDER],
        pred.alias("lang_pred"))


def _winnow_udf(k: int, w: int):
    import hashlib

    import numpy as np
    from pyspark.sql.functions import pandas_udf

    def gram_hashes(t: str):
        return [int(hashlib.md5(t[i:i + k].encode("utf-8"))
                    .hexdigest()[:8], 16)
                for i in range(len(t) - k + 1)]

    @pandas_udf("array<long>")
    def fps(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            t = t or ""
            n = len(t)
            if n < k:
                out.append([int(hashlib.md5(t.encode("utf-8"))
                                .hexdigest()[:8], 16)])
            elif n < k + w - 1:
                out.append([min(gram_hashes(t))])
            else:
                hs = np.asarray(gram_hashes(t), dtype=np.int64)
                mins = np.lib.stride_tricks.sliding_window_view(
                    hs, w).min(axis=1)
                out.append(np.unique(mins).tolist())
        return pd.Series(out)

    return fps


def winnow_fingerprints(docs: DataFrame, *, k: int = 8,
                        w: int = 4) -> DataFrame:
    """Winnowing document fingerprints (the MOSS scheme: rolling
    k-gram hashes over normalized text, minimum per w-window, distinct
    mins): one (doc_id, fp) row per selected fingerprint. Guarantees
    any shared substring of length ≥ k + w - 1 yields at least one
    shared fingerprint — the content-overlap primitive exact hashing
    misses; shared-fp counts feed plagiarism/near-dup candidate joins.

    Normalization stays in Catalyst; the sliding-window minimum runs
    as one Arrow-batched NumPy pass (a nested Catalyst
    ``transform(slice(...))`` would re-evaluate the gram array per
    window — O(n²) in the interpreted HOF path). Hashes are md5's
    leading 8 hex digits, so the DuckDB oracle replays them exactly
    with materialized list expressions. Short docs (< k chars)
    contribute their whole-text hash."""
    fps = _winnow_udf(k, w)
    return (docs.select("doc_id", norm_text().alias("_nt"))
            .select("doc_id", F.explode(fps(F.col("_nt"))).alias("fp")))


def _top_bigram_udf():
    from collections import Counter

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def top_bigram_count(tok_arrays: pd.Series) -> pd.Series:
        out = []
        for toks in tok_arrays:
            toks = list(toks) if toks is not None else []
            if len(toks) < 2:
                out.append(0)
                continue
            c = Counter(zip(toks, toks[1:]))
            out.append(max(c.values()))
        return pd.Series(out, dtype="int32")

    return top_bigram_count


def with_repetition(docs: DataFrame) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1) — the
    boilerplate/spam markers a pretraining gate needs beyond
    ``with_quality``:

    - ``dup_line_frac_e4``: fraction of lines that repeat an earlier
      line (lines split on ``\\n``, trimmed, empties dropped)
    - ``dup_line_char_frac_e4``: fraction of line characters living in
      repeated line instances
    - ``dup_bigram_frac_e4``: fraction of token-bigram instances that
      are repeats
    - ``top_bigram_frac_e4``: share of bigram instances taken by the
      single most frequent bigram (the one signal that needs a mode,
      computed in one Arrow-batched Counter pass — a Catalyst spelling
      would be an O(n²) interpreted HOF)

    Everything else is linear ``array_distinct`` math inside
    whole-stage codegen; the operator is zero-shuffle (all signals are
    doc-local), so at 100 TB it fuses into the scan stage.
    """
    lines_raw = F.transform(F.split(F.col("text"), "\n"),
                            lambda x: F.trim(x))
    lines = F.filter(lines_raw, lambda x: x != "")
    n_lines = F.size(lines)
    n_uniq_lines = F.size(F.array_distinct(lines))
    chars_all = F.aggregate(lines, F.lit(0),
                            lambda acc, x: acc + F.length(x))
    chars_uniq = F.aggregate(F.array_distinct(lines), F.lit(0),
                             lambda acc, x: acc + F.length(x))
    toks = tokens_col()
    n_tok = F.size(toks)
    bigrams = F.when(n_tok >= 2, F.transform(
        F.slice(toks, 1, n_tok - 1),
        lambda x, i: F.concat(x, F.lit("\x1f"),
                              F.element_at(toks, i + 2)))
    ).otherwise(F.array().cast("array<string>"))
    n_bi = F.size(bigrams)
    n_uniq_bi = F.size(F.array_distinct(bigrams))
    top_bi = _top_bigram_udf()

    def e4(x):
        return F.floor(x * 10000).cast("long")

    return docs.select(
        "doc_id",
        n_lines.cast("int").alias("n_lines"),
        e4((n_lines - n_uniq_lines) / F.greatest(n_lines, F.lit(1)))
         .alias("dup_line_frac_e4"),
        e4((chars_all - chars_uniq) / F.greatest(chars_all, F.lit(1)))
         .alias("dup_line_char_frac_e4"),
        e4((n_bi - n_uniq_bi) / F.greatest(n_bi, F.lit(1)))
         .alias("dup_bigram_frac_e4"),
        e4(top_bi(toks) / F.greatest(n_bi, F.lit(1)))
         .alias("top_bigram_frac_e4"),
    )


def with_fingerprint(docs: DataFrame) -> DataFrame:
    """Deterministic content fingerprint: md5 of normalized text (the
    Spark-native analogue of the reference's sha256 document identity,
    utils/utils.py:19-37 — md5 here because the dedup layers reuse it)."""
    return docs.select(
        "doc_id", F.md5(norm_text()).alias("fingerprint"))
