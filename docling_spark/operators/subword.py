"""Subword ENCODE operators — the apply half of the three standard
tokenizer families over a trained vocabulary:

* BPE (ordered merge list) lives in :mod:`.bpe` (pure-Catalyst folds);
* WordPiece greedy longest-match-first (Wu et al. 2016,
  arXiv:1609.08144 §4.1; the BERT tokenizer) — here;
* Unigram-LM Viterbi segmentation (Kudo 2018, arXiv:1804.10959 §3) —
  here.

No counterpart in the reference (docling tokenizes only inside its NN
models); these are the training-data-pipeline operators a 100 TB
corpus job needs between extraction and sequence packing (token
counting, fertility stats, pack-length budgeting under the REAL
production vocabulary instead of a whitespace proxy).

Engine spelling: the vocabulary is a plain Python structure broadcast
into ONE Arrow-batched ``pandas_udf`` — a production vocab (30k-250k
pieces, single-digit MB) rides task broadcast exactly like a model
file would. Per-word work is a bounded loop (longest-match: O(|w|·L);
Viterbi: O(|w|·L) with L = longest piece), data-independent of corpus
size. Zero shuffle: both encoders are per-row projections; every
downstream aggregate keeps whatever partitioning the input had.

Determinism (the oracle contract): WordPiece greedy matching has no
ties by construction. Unigram scores are INTEGER quantized log-probs
(lp_e6 = floor(ln p × 1e6), the :mod:`.lmscore` house pattern) so the
DP compares exact integers — no float-summation drift between engines
— and ties prefer the LONGER piece at each boundary (documented in
:func:`unigram_encode`).
"""

from __future__ import annotations

from typing import Dict, Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

UNK = "[UNK]"


def wordpiece_encode(df: DataFrame, vocab: Iterable[str], *,
                     tokens_col: str = "tokens",
                     out_col: str = "wp_tokens",
                     cont: str = "##",
                     unk: str = UNK) -> DataFrame:
    """WordPiece encode a token-array column: per word, repeatedly take
    the LONGEST vocabulary prefix (continuation pieces carry the
    ``##`` marker); a word with no match at any position encodes to a
    single ``[UNK]`` (whole-word fallback, per the BERT reference
    implementation). NULL/empty words are skipped.

    ``vocab`` is the piece inventory WITHOUT probabilities (matching
    is purely positional); pass continuation pieces already marked
    (``##ab``). Adds ``out_col: array<string>``; keeps input columns.
    """
    pieces = frozenset(vocab)
    max_len = max((len(p) for p in pieces), default=1)

    def encode_word(w: str) -> list:
        out, i, n = [], 0, len(w)
        while i < n:
            hi = min(n, i + max_len + (len(cont) if i else 0))
            j, hit = hi, None
            while j > i:
                sub = w[i:j] if i == 0 else cont + w[i:j]
                if sub in pieces:
                    hit = sub
                    break
                j -= 1
            if hit is None:
                return [unk]
            out.append(hit)
            i = j
        return out

    @pandas_udf("array<string>")
    def wp(col: pd.Series) -> pd.Series:
        def enc(words):
            if words is None:
                return []
            res = []
            for w in words:
                if w:
                    res.extend(encode_word(w))
            return res
        return col.map(enc)

    return df.withColumn(out_col, wp(F.col(tokens_col)))


def unigram_encode(df: DataFrame, vocab: Dict[str, int], *,
                   tokens_col: str = "tokens",
                   out_col: str = "ug_tokens",
                   unk: str = UNK) -> DataFrame:
    """Unigram-LM encode a token-array column: per word, the Viterbi
    segmentation maximizing the sum of piece log-probs (Kudo 2018 §3,
    decode-time half — training the vocab via EM + pruning is the
    model slot; any SentencePiece-compatible ``(piece, lp)`` table
    drops in).

    ``vocab`` maps piece → integer lp_e6 (floor(ln p × 1e6)); integer
    scores make the DP exactly replayable across engines. Ties prefer
    the LONGER piece ending at each position (``>=`` on the candidate
    score with candidates scanned longest-first), so the segmentation
    is unique. A word no vocab path covers encodes to ``[UNK]``.
    Adds ``out_col: array<string>``; keeps input columns."""
    pieces = dict(vocab)
    max_len = max((len(p) for p in pieces), default=1)
    NEG = float("-inf")

    def encode_word(w: str) -> list:
        n = len(w)
        best = [NEG] * (n + 1)
        back = [0] * (n + 1)
        best[0] = 0
        for i in range(1, n + 1):
            # longest candidate first + strict '>' ⇒ longer piece wins ties
            for j in range(max(0, i - max_len), i):
                sub = w[j:i]
                lp = pieces.get(sub)
                if lp is None or best[j] == NEG:
                    continue
                s = best[j] + lp
                if s > best[i]:
                    best[i] = s
                    back[i] = j
        if best[n] == NEG:
            return [unk]
        out, i = [], n
        while i > 0:
            j = back[i]
            out.append(w[j:i])
            i = j
        out.reverse()
        return out

    @pandas_udf("array<string>")
    def ug(col: pd.Series) -> pd.Series:
        def enc(words):
            if words is None:
                return []
            res = []
            for w in words:
                if w:
                    res.extend(encode_word(w))
            return res
        return col.map(enc)

    return df.withColumn(out_col, ug(F.col(tokens_col)))
