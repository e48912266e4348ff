"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (the part that matters at 100 TB):

* exact dedup — one shuffle on a 32-byte fingerprint; the window picks
  the canonical doc per group (min doc_id). At skew (one viral page
  duplicated 10^6×) AQE skew-join handles the fat group because the
  window partitions by fingerprint, not doc.
* MinHash+LSH — shingle → k minhashes → b bands; candidate pairs come
  ONLY from band-bucket equijoins (never an all-pairs product), then
  the exact Jaccard verify runs on candidates alone. Band buckets are
  md5 strings → uniform shuffle keys.
* All hashing is md5 (lexicographic min over hex strings), which is
  portable to ANSI SQL — the DuckDB oracle runs the identical formula.

No Python UDFs anywhere in this module.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .textstats import norm_text, tokens_col


def dedup_exact(docs: DataFrame) -> DataFrame:
    """(doc_id, text, …) → (doc_id, canonical_id, is_dup)."""
    fp = docs.select("doc_id", F.md5(norm_text()).alias("fingerprint"))
    w = Window.partitionBy("fingerprint")
    return (fp
            .withColumn("canonical_id", F.min("doc_id").over(w))
            .withColumn("is_dup",
                        (F.col("doc_id") != F.col("canonical_id"))
                        .cast("int"))
            .select("doc_id", "fingerprint", "canonical_id", "is_dup"))


def shingles_col(n: int = 3) -> Column:
    """Word n-gram shingles of the normalized text (pure-Catalyst
    spelling — kept as the SQL-shaped reference of the semantics; the
    hot path uses the Arrow shingler below). Documents shorter than n
    tokens contribute their whole normalized text as the single
    shingle (so tiny docs still dedup)."""
    toks = tokens_col()
    k = F.size(toks) - (n - 1)
    return F.when(
        k >= 1,
        F.transform(F.sequence(F.lit(1), k),
                    lambda i: F.array_join(F.slice(toks, i, n), " ")),
    ).otherwise(F.array(norm_text()))


# Java \s (non-unicode): the exact class regexp_replace(\s+) matches,
# so the Arrow shingler normalizes byte-for-byte like the Catalyst/SQL
# spelling (norm_text) and the DuckDB oracle.
_JAVA_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def _shingle_udf(n: int):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def shingle(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            norm = _JAVA_WS.sub(" ", t or "").strip(" ").lower()
            toks = norm.split(" ")
            if len(toks) >= n:
                sh = list(dict.fromkeys(
                    " ".join(toks[i:i + n])
                    for i in range(len(toks) - n + 1)))
            else:
                sh = [norm]
            out.append(sh)
        return pd.Series(out)

    return shingle


def exploded_shingles(docs: DataFrame, *, n: int = 3) -> DataFrame:
    """(doc_id, shingle) — one row per distinct word n-gram per doc.

    This is THE scale-bearing representation: every downstream MinHash /
    Jaccard step is a codegen-friendly hash aggregate or equi-join over
    it. Shingle construction runs as an Arrow-batched pandas UDF: the
    Catalyst higher-order spelling (transform+slice+array_join) builds
    an interpreted expression tree per element and measured 8× slower
    AND GC-bound (it stopped scaling past ~8 local cores); the Python
    loop is byte-identical in output (same Java-\\s normalization) and
    the DuckDB oracle replays the Catalyst/SQL spelling to prove it."""
    # explode_OUTER + null-guard, not plain explode: the inner
    # generate's inferred pruning predicate (size>0 AND isnotnull)
    # embeds the UDF expression and gets pushed below the generate —
    # Catalyst then evaluates the Arrow shingler TWICE per document
    # (observed as two ArrowEvalPython nodes in every shingle-based
    # plan). The shingler never returns null/empty arrays (short docs
    # yield [norm]), so the outer variant is semantically identical;
    # the guard on the generate OUTPUT can't be pushed below it.
    return (docs.select(
        "doc_id",
        F.explode_outer(_shingle_udf(n)(F.col("text"))).alias("shingle"))
        .filter(F.col("shingle").isNotNull()))


def minhash_signatures(sh: DataFrame, *, num_hashes: int = 16) -> DataFrame:
    """Exploded shingles → one row per doc with columns h0..h{k-1}.

    ONE md5 per shingle: the digest's two 48-bit halves (a, b) generate
    all k hash functions as h_s = a + s·b (Carter-Wegman style pairwise
    mixing — the standard k-from-2 minhash construction). k independent
    salted digests would cost k× the hashing; at 10^12 docs the md5 is
    the dominant CPU term of the whole dedup (measured 16 salted md5s ≈
    2× the remaining agg cost at sf0.1). 48-bit halves keep
    a + 15·b < 2^52, far from BIGINT overflow.

    A single shuffle with map-side partial min-aggregation — and the
    min is over *longs*: min(string) forces sort-based aggregation
    (UnsafeRow buffers can't update var-length values, measured 3-4×
    slower), while min(long) stays in primitive whole-stage-codegen
    hash aggregation."""
    digest = F.md5("shingle")
    a = F.conv(F.substring(digest, 1, 12), 16, 10).cast("long")
    b = F.conv(F.substring(digest, 13, 12), 16, 10).cast("long")
    mixed = sh.select("doc_id", a.alias("ha"), b.alias("hb"))
    aggs = [F.min(F.col("ha") + F.lit(s) * F.col("hb")).alias(f"h{s}")
            for s in range(num_hashes)]
    return mixed.groupBy("doc_id").agg(*aggs)


def banded_hashes(sigs: DataFrame, *, num_hashes: int = 16,
                  bands: int = 4) -> DataFrame:
    """Signatures → (doc_id, band_id, band_hash): md5 of the '|'-joined
    signature slice per band. Band hashes are uniform shuffle keys."""
    rows_per_band = num_hashes // bands
    band_structs = F.array(*[
        F.struct(
            F.lit(b).alias("band_id"),
            F.md5(F.concat_ws(
                "|", *[F.col(f"h{b * rows_per_band + i}").cast("string")
                       for i in range(rows_per_band)])).alias("band_hash"))
        for b in range(bands)
    ])
    return (sigs.select("doc_id", F.explode(band_structs).alias("b"))
            .select("doc_id", F.col("b.band_id").alias("band_id"),
                    F.col("b.band_hash").alias("band_hash")))


def lsh_candidate_pairs(sh: DataFrame, *, num_hashes: int = 16,
                        bands: int = 4,
                        signatures=None) -> DataFrame:
    """Candidate near-dup pairs (doc_a < doc_b) from LSH band buckets.
    Takes the exploded-shingle table (reuse it for the verify step).
    ``signatures`` selects the minhash construction (default: the
    cheap a + s·b family; pass minhash_signatures_indep for the
    independent family with the textbook P(band) = J^r recall curve —
    see that function's docstring for why they differ)."""
    sig_fn = signatures or minhash_signatures
    banded = banded_hashes(sig_fn(sh, num_hashes=num_hashes),
                           num_hashes=num_hashes, bands=bands)
    left = banded.alias("l")
    right = banded.alias("r")
    return (left.join(right,
                      (F.col("l.band_id") == F.col("r.band_id"))
                      & (F.col("l.band_hash") == F.col("r.band_hash"))
                      & (F.col("l.doc_id") < F.col("r.doc_id")))
            .select(F.col("l.doc_id").alias("doc_a"),
                    F.col("r.doc_id").alias("doc_b"))
            .distinct())


def ngram_jaccard(sh: DataFrame, pairs: DataFrame) -> DataFrame:
    """Exact Jaccard over word n-gram shingle sets, computed only for
    the given candidate pairs: equijoin on shingle within pairs →
    |A∩B| / (|A| + |B| − |A∩B|). Candidate pairs are broadcast when
    small (Catalyst/AQE decides); the shingle table never self-products."""
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))

    a = sh.alias("a")
    b = sh.alias("b")
    inter = (pairs.alias("p")
             .join(a, F.col("p.doc_a") == F.col("a.doc_id"))
             .join(b, (F.col("p.doc_b") == F.col("b.doc_id"))
                   & (F.col("a.shingle") == F.col("b.shingle")))
             .groupBy("p.doc_a", "p.doc_b")
             .agg(F.count("*").alias("n_inter")))
    return (inter
            .join(sizes.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
            .join(sizes.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
            .select(
                "doc_a", "doc_b",
                (F.col("n_inter")
                 / (F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_inter")))
                .alias("jaccard")))


def ngram_containment(sh: DataFrame, pairs: DataFrame) -> DataFrame:
    """Exact shingle containment C(A→B) = |A∩B| / |A| for the given
    candidate pairs — the asymmetric near-dup signal (a short doc fully
    embedded in a long one) that Jaccard under-scores when set sizes
    differ (the Dolma-style "mostly contained" rule). Same plan shape
    as ngram_jaccard: equijoin on shingle restricted to candidates,
    never a shingle self-product; pairs broadcast when small."""
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (pairs.alias("p")
             .join(a, F.col("p.doc_a") == F.col("a.doc_id"))
             .join(b, (F.col("p.doc_b") == F.col("b.doc_id"))
                   & (F.col("a.shingle") == F.col("b.shingle")))
             .groupBy("p.doc_a", "p.doc_b")
             .agg(F.count("*").alias("n_inter")))
    return (inter
            .join(sizes.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
            .select("doc_a", "doc_b",
                    (F.col("n_inter") / F.col("sa.n_sh"))
                    .alias("containment")))


_MERSENNE31 = (1 << 31) - 1


def minhash_signatures_indep(sh: DataFrame, *,
                             num_hashes: int = 16) -> DataFrame:
    """Signatures from an INDEPENDENT hash family: h_s(x) = (c_s·v +
    d_s) mod (2³¹−1) over one 48-bit md5-derived value v per shingle.
    The mod-wraparound makes each s an effectively independent
    permutation — unlike minhash_signatures' a + s·b family, whose
    orderings are correlated across s (one outlier element can hijack
    every component; fine for LSH candidate generation, which only
    needs collision-on-equality and is exactness-verified downstream,
    but USELESS as an estimator). Constants are closed-form in s, so
    the SQL oracle replays them literally. Same plan shape: one md5
    per shingle, one shuffle with 16 primitive min-aggregates."""
    v = (F.conv(F.substring(F.md5("shingle"), 1, 12), 16, 10)
         .cast("long") % F.lit(_MERSENNE31))
    aggs = []
    for s in range(num_hashes):
        c = ((2 * s + 1) * 2654435761) % _MERSENNE31
        d = (s * 1013904223 + 12345) % _MERSENNE31
        aggs.append(F.min((v * F.lit(c) + F.lit(d)) % F.lit(_MERSENNE31))
                    .alias(f"h{s}"))
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_jaccard_est(sigs: DataFrame, pairs: DataFrame, *,
                        num_hashes: int = 16) -> DataFrame:
    """MinHash Jaccard ESTIMATE for candidate pairs: the fraction of
    equal signature components (the textbook unbiased estimator) — the
    sketch-accuracy eval primitive, and the production scoring path
    when shingle sets are too big to re-join: at 10^12 docs a
    16-component signature is ~128 B/doc vs KBs of shingles, so the
    estimate join moves 10-100× less data than the exact verify.
    Plan shape: two equijoins of the pair list against the signature
    table (broadcast when the pair list is small), zero recompute.

    Dropped-pair semantics (deliberate): the joins are INNER, so a
    candidate pair where either doc has no signature row (empty or
    whitespace-only text produces no shingles, hence no signature) is
    ABSENT from the output rather than scored 0 — absence means "not
    evaluable", est_jaccard_e4=0 means "evaluated, no component
    agreement". Callers needing one row per input pair should
    left-join this result back to their pair list and treat NULL as
    unsigned."""
    a = sigs.alias("a")
    b = sigs.alias("b")
    matches = None
    for i in range(num_hashes):
        t = (F.col(f"a.h{i}") == F.col(f"b.h{i}")).cast("int")
        matches = t if matches is None else matches + t
    return (pairs.alias("p")
            .join(a, F.col("p.doc_a") == F.col("a.doc_id"))
            .join(b, F.col("p.doc_b") == F.col("b.doc_id"))
            .select("p.doc_a", "p.doc_b",
                    F.floor(matches * 10000 / num_hashes).cast("long")
                     .alias("est_jaccard_e4")))


def winnow_overlap_pairs(fps: DataFrame, *, min_shared: int = 2,
                         max_df: int = 20,
                         storage: str = "memory_and_disk") -> DataFrame:
    """MOSS-style content-overlap candidates from winnowing
    fingerprints (textstats.winnow_fingerprints): docs sharing ≥
    min_shared selected fingerprints. Guaranteed to catch any shared
    run of ≥ k+w−1 chars — the copy-detection primitive.

    Scale shape: fingerprints occurring in more than max_df docs are
    dropped FIRST (boilerplate headers would otherwise both flood the
    candidate set and make the self-join key skewed — the same df-cap
    every plagiarism detector applies); the remaining self-equijoin on
    fp emits only co-bucketed pairs, never a doc×doc product.

    The fingerprint table is persisted (memory_and_disk): its four
    consumers (df cap, per-doc sizes, both self-join sides) would
    otherwise each re-run the Arrow winnower — exchange reuse never
    fires across Python-UDF subtrees (PythonUDF expr-ids break plan
    canonicalization), so without the persist the most expensive step
    executes 4×. Pass storage="none" to trade recompute for zero
    cache pressure."""
    from pyspark import StorageLevel

    if storage != "none" and fps.storageLevel == StorageLevel.NONE:
        fps = fps.persist(StorageLevel.MEMORY_AND_DISK)
    df_tbl = fps.groupBy("fp").agg(F.count("*").alias("df"))
    rare = fps.join(df_tbl.filter(F.col("df") <= max_df), "fp")
    sizes = fps.groupBy("doc_id").agg(F.count("*").alias("n_fp"))
    a = rare.alias("a")
    b = rare.alias("b")
    pairs = (a.join(b, (F.col("a.fp") == F.col("b.fp"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
             .groupBy(F.col("a.doc_id").alias("doc_a"),
                      F.col("b.doc_id").alias("doc_b"))
             .agg(F.count("*").alias("n_shared"))
             .filter(F.col("n_shared") >= min_shared))
    return (pairs
            .join(sizes.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
            .join(sizes.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
            .select("doc_a", "doc_b", "n_shared",
                    F.floor(F.col("n_shared") * 10000
                            / F.least(F.col("sa.n_fp"), F.col("sb.n_fp")))
                    .cast("long").alias("overlap_e4")))


def ngram_novelty(sh: DataFrame, *,
                  storage: str = "memory_and_disk") -> DataFrame:
    """Per-doc n-gram novelty (memorization/repetition analysis à la
    Carlini et al.): the fraction of a doc's distinct shingles whose
    FIRST occurrence (min doc_id) is this doc. Near-0 novelty = the doc
    is assembled from already-seen text; the corpus-level novelty curve
    is the dedup-effectiveness report.

    Plan shape: the novel count per doc is derived from the min-agg
    OUTPUT (first-occurrence table → groupBy(first_doc)), NOT by
    joining the first-occurrence table back onto the full shingle
    table — the rejoin spelling re-shuffles the whole shingle table on
    the string key a second time AND (because exchange reuse never
    fires across Python-UDF subtrees: PythonUDF expr-ids break plan
    canonicalization) re-runs the Arrow shingler per branch. Here: one
    shuffle of sh on shingle, one map-side-combined count of sh on
    doc_id, then a doc-cardinality join. The shingle table is
    persisted (memory_and_disk, like minhash_dedup) so the two
    consumers share ONE shingler pass; pass storage="none" at corpus
    scales where recompute beats cache pressure."""
    from pyspark import StorageLevel

    if storage != "none":
        sh = sh.persist(StorageLevel.MEMORY_AND_DISK)
    first = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    novel = (first.groupBy("first_doc")
             .agg(F.count("*").alias("n_novel")))
    totals = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    return (totals.join(novel,
                        totals["doc_id"] == novel["first_doc"], "left")
            .select(
                "doc_id", "n_shingles",
                F.coalesce(F.col("n_novel"), F.lit(0)).cast("long")
                 .alias("n_novel"),
                F.floor(F.coalesce(F.col("n_novel"), F.lit(0)) * 10000
                        / F.col("n_shingles"))
                 .cast("long").alias("novelty_e4")))


def pair_eval(pred: DataFrame, truth: DataFrame) -> DataFrame:
    """Candidate-set quality eval: precision/recall of predicted
    (doc_a, doc_b) pairs against labeled pairs — the harness for tuning
    LSH bands/hamming thresholds before a 100-TB run. One row out; the
    hit count is a broadcast semi-join on the pair key, the three
    1-row counts cross-join (the accepted scalar-stats pattern)."""
    hit = (pred.join(F.broadcast(truth), ["doc_a", "doc_b"], "left_semi")
           .agg(F.count("*").alias("n_hit")))
    np_ = pred.agg(F.count("*").alias("n_pred"))
    nt = truth.agg(F.count("*").alias("n_truth"))
    return (np_.crossJoin(nt).crossJoin(hit)
            .select("n_pred", "n_truth", "n_hit",
                    F.floor(F.col("n_hit") * 10000 / F.col("n_pred"))
                     .cast("long").alias("precision_e4"),
                    F.floor(F.col("n_hit") * 10000 / F.col("n_truth"))
                     .cast("long").alias("recall_e4")))


def dedup_report(docs: DataFrame, *, group_col: str = "source",
                 text_col: str = "text") -> DataFrame:
    """Per-source dedup report: doc count, distinct normalized texts,
    duplicate ratio, largest duplicate cluster — the before/after
    accounting every corpus release publishes. ONE shuffle on
    (group, fingerprint), then a rollup on the tiny group key."""
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col),
                                           r"\s+", " ")))
    per_fp = (docs.select(F.col(group_col), F.md5(norm).alias("fp"))
              .groupBy(group_col, "fp").agg(F.count("*").alias("cnt")))
    rep = per_fp.groupBy(group_col).agg(
        F.sum("cnt").alias("n_docs"),
        F.count("*").alias("n_unique"),
        F.max("cnt").alias("max_cluster"))
    return rep.select(
        group_col, "n_docs", "n_unique", "max_cluster",
        F.floor((F.col("n_docs") - F.col("n_unique")) * 10000
                / F.col("n_docs")).cast("long").alias("dup_ratio_e4"))


def _bloom_positions(col: Column, *, m: int, k: int) -> Column:
    """k bit positions from ONE md5 per value: consecutive 7-hex-digit
    (28-bit) digest slices mod m. Portable to ANSI SQL — the oracle
    replays the identical formula, so even the false positives match."""
    digest = F.md5(col)
    return F.array_distinct(F.array(*[
        (F.conv(F.substring(digest, 1 + 7 * i, 7), 16, 10).cast("long")
         % F.lit(m)).cast("long")
        for i in range(k)]))


def bloom_membership(seen: DataFrame, probes: DataFrame, *,
                     m: int = 1 << 18, k: int = 4,
                     text_col: str = "text") -> DataFrame:
    """Bloom-filter incremental dedup, expressed relationally: the
    filter's set bits are a one-column DISTINCT table (≤ m rows) built
    from the already-ingested corpus; a probe doc is flagged dup iff
    ALL of its k positions are present — exact Bloom semantics,
    including the deterministic false-positive rate.

    Scale shape: building the bit table is one hash-distinct bounded at
    m rows (m = 2^18 default ≈ 2 MB, broadcast to the probe side — no
    shuffle of the probe corpus at all). For a 10^12-doc seen-set raise
    m (the table stays ≤ m rows regardless of corpus size); the classic
    byte-array filter is the same information — the relational form
    keeps it oracle-checkable and incrementally updatable by UNION."""
    pos = _bloom_positions(
        F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " "))),
        m=m, k=k)
    set_bits = (seen.select(F.explode(pos).alias("pos"))
                .distinct())
    probe_pos = probes.select(
        "doc_id", F.explode(pos).alias("pos"),
        F.size(pos).alias("n_pos"))
    hits = (probe_pos.alias("q")
            .join(F.broadcast(set_bits.alias("s")),
                  F.col("q.pos") == F.col("s.pos"), "left")
            .groupBy("doc_id")
            .agg(F.count(F.col("s.pos")).alias("n_hit"),
                 F.first("n_pos").alias("n_pos")))
    # Every probe appears exactly once: a NULL-text probe produces a
    # NULL position array, explode() emits no rows for it, and the doc
    # would silently vanish — ambiguous to anti-join consumers. Join
    # the hit aggregate back to the probe id set and report those rows
    # as bloom_dup=0 (a NULL text was by construction never inserted).
    return (probes.select("doc_id")
            .join(hits, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce(
                    (F.col("n_hit") == F.col("n_pos")).cast("int"),
                    F.lit(0)).alias("bloom_dup")))


def minhash_dedup(docs: DataFrame, *, n: int = 3, num_hashes: int = 16,
                  bands: int = 4, threshold: float = 0.7,
                  num_partitions: int = 0,
                  shingle_storage: str = "memory_and_disk",
                  deterministic_output: bool = False,
                  hash_family: str = "cw") -> DataFrame:
    """Full near-dup pipeline, one-shuffle construction: per-shingle
    48-bit md5 hashes → ONE groupBy(doc_id) producing both the k
    minhash components AND the doc's sorted distinct shingle-hash set
    → band self-join candidates → exact Jaccard by array_intersect
    over the per-doc hash sets.

    Scale shape (round-4 rewrite): the previous spelling verified
    candidates by re-joining the exploded shingle table twice on
    (doc_id, shingle) — measured at 320k docs / 808k candidates that
    is a ~56M-row string-key shuffle that dominated the job (29 s of a
    50 s wall at 8 cores) and stopped scaling past ~8 local cores; it
    also persisted the 17M-row shingle table. The set-array verify
    joins |pairs| rows against a doc-keyed array table (AQE broadcasts
    it when it fits) and computes |A∩B| in whole-stage codegen, and
    the only wide shingle-level operation left is the single
    groupBy(doc_id). Exactness is unchanged: intersecting 48-bit md5
    prefixes instead of shingle strings differs only on md5-prefix
    collisions inside one document (P ≈ s²·2⁻⁴⁹ for s shingles —
    immaterial), and the SQL oracle replays the SAME hashed-set rule,
    so both engines agree bit-for-bit by construction.

    ``shingle_storage`` now controls the per-doc signature+set table
    (num_hashes longs + the hash set per doc — far smaller than the
    exploded shingle table it replaced); it feeds three consumers
    (band explode, both verify sides). Pass "none" to recompute.

    Output order is NOT deterministic by default: a global sort of the
    pair table is a range-shuffle that buys nothing for downstream
    consumers (joins/writes are order-insensitive). Pass
    ``deterministic_output=True`` only when a stable listing is needed.
    """
    from pyspark import StorageLevel

    if num_partitions:
        docs = docs.repartition(num_partitions, "doc_id")
    sh = exploded_shingles(docs, n=n)
    digest = F.md5("shingle")
    mixed = sh.select(
        "doc_id",
        F.conv(F.substring(digest, 1, 12), 16, 10).cast("long")
        .alias("ha"),
        F.conv(F.substring(digest, 13, 12), 16, 10).cast("long")
        .alias("hb"))
    if hash_family == "indep":
        v = F.col("ha") % F.lit(_MERSENNE31)
        sig_aggs = []
        for s in range(num_hashes):
            c = ((2 * s + 1) * 2654435761) % _MERSENNE31
            d = (s * 1013904223 + 12345) % _MERSENNE31
            sig_aggs.append(
                F.min((v * F.lit(c) + F.lit(d)) % F.lit(_MERSENNE31))
                .alias(f"h{s}"))
    else:
        sig_aggs = [F.min(F.col("ha") + F.lit(s) * F.col("hb"))
                    .alias(f"h{s}") for s in range(num_hashes)]
    per_doc = mixed.groupBy("doc_id").agg(
        *sig_aggs, F.sort_array(F.collect_set("ha")).alias("_hs"))
    if shingle_storage != "none":
        per_doc = per_doc.persist(
            getattr(StorageLevel, shingle_storage.upper()))

    banded = banded_hashes(per_doc.drop("_hs"),
                           num_hashes=num_hashes, bands=bands)
    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (left.join(right,
                       (F.col("l.band_id") == F.col("r.band_id"))
                       & (F.col("l.band_hash") == F.col("r.band_hash"))
                       & (F.col("l.doc_id") < F.col("r.doc_id")))
             .select(F.col("l.doc_id").alias("doc_a"),
                     F.col("r.doc_id").alias("doc_b"))
             .distinct())

    sets = per_doc.select("doc_id", "_hs")
    inter = F.size(F.array_intersect(F.col("sa._hs"), F.col("sb._hs")))
    union = (F.size(F.col("sa._hs")) + F.size(F.col("sb._hs")) - inter)
    scored = (pairs
              .join(sets.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
              .join(sets.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
              .select("doc_a", "doc_b", (inter / union).alias("jaccard")))
    out = scored.filter(F.col("jaccard") >= threshold)
    return out.orderBy("doc_a", "doc_b") if deterministic_output else out


def dedup_components(pairs: DataFrame, *,
                     max_iterations: int = 20,
                     checkpoint_interval: int = 4) -> DataFrame:
    """Connected components over a near-duplicate pair list:
    (doc_a, doc_b) edges → (doc_id, component) with component = the
    minimum doc_id in each duplicate cluster. This is the clique
    collapse the greedy per-edge drop (operators/curate.py)
    approximates.

    Algorithm: iterated min-label propagation — each round is ONE
    shuffle join (labels onto the symmetric edge list) + ONE min
    aggregation; rounds needed = graph diameter, which for near-dup
    clusters is tiny (duplicate groups are dense). The driver loop
    early-exits when a round changes nothing. For adversarial
    long-chain graphs at 10^12 edges, swap the body for the
    large-star/small-star rounds of Kiveris et al. (CC in MapReduce) —
    same per-round plan shape, O(log^2 n) rounds.

    Labels persist per round and the previous round unpersists, so
    EXECUTION stays one round deep (no exponential recompute); every
    ``checkpoint_interval`` rounds the labels additionally
    ``localCheckpoint`` so the LOGICAL plan is truncated too —
    without it the analyzer/optimizer walk an O(rounds) join tower
    each round and the serialized task binaries grow with it, which
    on a deep-diameter graph dominates the actual shuffle work."""
    # materialize the symmetric edge list ONCE: every propagation round
    # joins against it, and without the persist each round would re-run
    # the whole upstream candidate-generation pipeline. Symmetrize with
    # one explode pass — a union of (a,b) ∪ (b,a) branches would run
    # the upstream pair pipeline TWICE to fill the cache (measured ~2×
    # the materialization cost at sf0.1).
    sym = (pairs.select(F.explode(F.array(
               F.struct(F.col("doc_a"), F.col("doc_b")),
               F.struct(F.col("doc_b").alias("doc_a"),
                        F.col("doc_a").alias("doc_b")))).alias("e"))
           .select(F.col("e.doc_a").alias("doc_a"),
                   F.col("e.doc_b").alias("doc_b"))
           .persist())
    # fused init: the identity labeling's FIRST propagation round only
    # ever needs each node's own id and its direct neighbors' ids, so
    # fold it into initialization — component₀ = min(id, min(nbr)).
    # One groupBy replaces the distinct (same shuffle count) AND
    # round 1 of the loop (join + min-agg + left join + collect), so a
    # diameter-d graph converges in d rounds instead of d+1; on the
    # dense near-dup clusters this operator targets (d = 1-2) that is
    # a third of the driver-loop jobs.
    labels = (sym.groupBy(F.col("doc_a").alias("doc_id"))
              .agg(F.min(F.least(F.col("doc_a"), F.col("doc_b")))
                   .alias("component"))
              .persist())
    for rnd in range(max_iterations):
        # one round = one join + one min-agg + one left join; the
        # convergence signal rides the same action that materializes
        # the new labels (no separate changed-count pass)
        nbr_min = (sym.join(labels, sym["doc_b"] == labels["doc_id"])
                   .groupBy("doc_a")
                   .agg(F.min("component").alias("nbr_min")))
        new = (labels.join(nbr_min,
                           labels["doc_id"] == nbr_min["doc_a"], "left")
               .select(
                   "doc_id",
                   F.least(F.col("component"),
                           F.coalesce(F.col("nbr_min"), F.col("component")))
                   .alias("component"),
                   (F.coalesce(F.col("nbr_min"), F.col("component"))
                    < F.col("component")).cast("int").alias("chg")))
        if checkpoint_interval and (rnd + 1) % checkpoint_interval == 0:
            # truncate lineage: the checkpointed frame's plan is a
            # flat ExistingRDD scan, not a rnd-deep join tower
            new = new.localCheckpoint(eager=True)
        else:
            new = new.persist()
        changed = new.agg(F.sum("chg")).collect()[0][0] or 0
        labels.unpersist()
        labels = new.select("doc_id", "component")
        if not changed:
            break
    sym.unpersist()
    return labels


def embedding_dedup(embeddings: DataFrame, *, threshold: float = 0.98,
                    n_planes: int = 8) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: random-hyperplane LSH
    buckets the corpus once (one shuffle on an 8-bit key), candidate
    pairs come only from the bucket equijoin (never an all-pairs
    product), and the exact cosine (Arrow-batched NumPy) verifies
    candidates. At 10^12 rows the bucket join is the only quadratic
    risk and its blow-up is bounded per bucket, not per corpus."""
    from .similarity import cosine_udf, lsh_buckets

    b = lsh_buckets(embeddings, n_planes)
    left = b.alias("a")
    right = b.alias("c")
    pairs = (left.join(right,
                       (F.col("a.bucket") == F.col("c.bucket"))
                       & (F.col("a.vec_id") < F.col("c.vec_id")))
             .select(F.col("a.vec_id").alias("doc_a"),
                     F.col("c.vec_id").alias("doc_b"),
                     cosine_udf(F.col("a.embedding"),
                                F.col("c.embedding")).alias("score")))
    # +1e-6 before floor: identical vectors give cosine 1.0-ε under
    # float summation-order differences; the epsilon makes the scaled
    # integer stable across engines (same term in the SQL oracle).
    # No output sort: pair order is meaningless downstream and a global
    # sort is a pure range-shuffle tax at scale.
    return (pairs.filter(F.col("score") >= threshold)
            .select("doc_a", "doc_b",
                    F.floor(F.col("score") * 10000 + F.lit(1e-6))
                     .cast("long").alias("score_e4")))


def simhash_bits(docs: DataFrame, *, n: int = 3, bits: int = 16,
                 num_partitions: int = 0) -> DataFrame:
    """``bits``-wide SimHash (16 or 32) over word n-gram shingles with
    portable md5 bits: bit i of the shingle's md5 votes +1/−1; the sign
    of the vote-sum forms the document hash. Bits are drawn from md5's
    leading hex digits in 16-bit chunks, so DuckDB replays the exact
    hash with ``('0x' || substr(md5(s), 1+4*c, 4))::BIGINT``.

    One shuffle: ``bits`` conditional-sum aggregates over the
    exploded-shingle table (map-side partial agg), no per-bit row
    multiplication. 64-bit variants need unsigned handling Spark's
    ANSI long arithmetic doesn't give for bit 63 — at that width use
    two 32-bit signature columns instead."""
    assert bits in (16, 32)
    if num_partitions:
        docs = docs.repartition(num_partitions, "doc_id")
    sh = exploded_shingles(docs, n=n)
    chunks = [
        F.conv(F.substring(F.md5("shingle"), 1 + 4 * c, 4), 16, 10)
        .cast("long").alias(f"c{c}")
        for c in range(bits // 16)
    ]
    withval = sh.select("doc_id", *chunks)
    votes = [
        F.sum(F.when(
            F.shiftright(F.col(f"c{b // 16}"), b % 16).bitwiseAND(1) == 1,
            1).otherwise(-1)).alias(f"v{b}")
        for b in range(bits)
    ]
    agg = withval.groupBy("doc_id").agg(*votes)
    hash_expr = None
    for b in range(bits):
        term = F.when(F.col(f"v{b}") > 0,
                      F.lit(1 << b).cast("long")).otherwise(F.lit(0))
        hash_expr = term if hash_expr is None else hash_expr + term
    return agg.select("doc_id", hash_expr.cast("long").alias("simhash"))


def simhash16(docs: DataFrame, *, n: int = 3,
              num_partitions: int = 0) -> DataFrame:
    """16-bit SimHash (kept as the dedup_simhash oracle surface)."""
    return simhash_bits(docs, n=n, bits=16, num_partitions=num_partitions)


def simhash_pairs(docs: DataFrame, *, n: int = 3, bits: int = 32,
                  bands: int = 4, max_hamming: int = 3,
                  num_partitions: int = 0) -> DataFrame:
    """Hamming-ball near-dup pairs from SimHash signatures: band the
    hash into ``bands`` equal slices — by pigeonhole, any pair with
    Hamming distance ≤ ``bands - 1`` agrees on at least one band — and
    generate candidates ONLY from the band-value equijoin (never an
    all-pairs product), then verify with ``bit_count(xor)``. The same
    banded-equijoin shape as MinHash LSH; everything is JVM-side
    Catalyst (one agg + one self-equijoin).

    Scale note: bucket size is corpus/2^(bits/bands) per band value, so
    at 10^12 docs use the widest signature the engine offers (two
    32-bit columns) and more bands; the plan shape is unchanged."""
    from pyspark import StorageLevel

    # persist the per-doc signature (2 longs/doc): the banded
    # self-join's two branches would otherwise each re-run the whole
    # signature lineage — shingle UDF + vote aggregation — because
    # exchange reuse never fires across Python-UDF subtrees.
    sig = (simhash_bits(docs, n=n, bits=bits,
                        num_partitions=num_partitions)
           .persist(StorageLevel.MEMORY_AND_DISK))
    width = bits // bands
    mask = (1 << width) - 1
    banded = sig.select(
        "doc_id", "simhash",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright("simhash", b * width).bitwiseAND(mask)
                .alias("val"))
            for b in range(bands)])).alias("bv")).select(
        "doc_id", "simhash",
        F.col("bv.band").alias("band"), F.col("bv.val").alias("val"))
    a, c = banded.alias("a"), banded.alias("c")
    cand = (a.join(c, [
                F.col("a.band") == F.col("c.band"),
                F.col("a.val") == F.col("c.val"),
                F.col("a.doc_id") < F.col("c.doc_id")])
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("c.doc_id").alias("doc_b"),
                    F.col("a.simhash").alias("ha"),
                    F.col("c.simhash").alias("hb"))
            .distinct())
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (cand.withColumn("hamming", ham.cast("int"))
            .filter(F.col("hamming") <= max_hamming)
            .select("doc_a", "doc_b", "hamming"))


def canonical_representatives(components: DataFrame, scores: DataFrame,
                              *, score_col: str,
                              id_col: str = "doc_id") -> DataFrame:
    """Quality-aware representative per duplicate cluster — the
    refinement of lowest-id-wins: given the component labels
    (:func:`dedup_components`) and a per-doc quality score (token
    count, LM score, …), keep the HIGHEST-scoring member of each
    cluster (ties break to the lowest id). The production rule behind
    "keep the longest/cleanest copy" instead of an arbitrary one.

    Returns (component, canonical_id, n_members, best_<score_col>).

    Scale shape: one equijoin on id + ONE ``max_by`` aggregation keyed
    on component — algebraic (map-side partial), no per-component
    window, no sort. The (score, lowest-id) ordering is packed into a
    single long (score·2³³ − id) so the aggregate stays on the
    HashAggregate path — a struct ordering key forces the
    SortAggregate fallback (caught by tools/plan_report.py). Requires
    score < 2³⁰ and id < 2³³; unique per row, so the argmax is
    deterministic."""
    j = components.join(scores.select(id_col, score_col), id_col)
    ordering = (F.shiftleft(F.col(score_col).cast("long"), 33)
                - F.col(id_col))
    return (j.groupBy("component")
            .agg(F.max_by(F.col(id_col), ordering).alias("canonical_id"),
                 F.count("*").cast("int").alias("n_members"),
                 F.max(score_col).alias(f"best_{score_col}")))


def dup_ngram_fraction(sh: DataFrame, *, min_df: int = 2,
                       storage: str = "memory_and_disk") -> DataFrame:
    """Per-doc duplicated-n-gram fraction (the corpus-overlap /
    memorization-risk profile of Lee et al. 2021 §5): for each doc,
    the share of its distinct shingles that also occur in ≥ ``min_df``
    documents corpus-wide. Where ``ngram_novelty`` asks "did this doc
    see the gram FIRST" (an ownership question biased by doc_id
    order), this asks the order-free question "how much of this doc is
    corpus-common text" — the signal that separates quotation-heavy
    but original pages from templated mirrors, and the per-doc view of
    how much substring-level dedup would remove.

    Plan shape: ONE shuffle of the shingle table on the gram key for
    the df hash-aggregate; the common-gram set (df ≥ min_df — far
    smaller than the gram vocabulary for any real min_df) is
    semi-joined back onto the persisted shingle table (second gram-key
    shuffle; exchange reuse can't fire across Arrow-UDF subtrees, so
    the persist is what keeps the shingler at one pass), then one
    doc-key count. Output: (doc_id, n_grams, n_dup, dup_frac_e4)."""
    from pyspark import StorageLevel

    if storage != "none":
        sh = sh.persist(StorageLevel.MEMORY_AND_DISK)
    common = (sh.groupBy("shingle")
              .agg(F.count(F.lit(1)).alias("_df"))
              .filter(F.col("_df") >= min_df)
              .select("shingle"))
    dup = (sh.join(common, "shingle", "left_semi")
           .groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_dup")))
    totals = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    return (totals.join(dup, "doc_id", "left")
            .select(
                "doc_id", "n_grams",
                F.coalesce(F.col("n_dup"), F.lit(0)).cast("long")
                 .alias("n_dup"),
                F.floor(F.coalesce(F.col("n_dup"), F.lit(0)) * 10000
                        / F.col("n_grams"))
                 .cast("long").alias("dup_frac_e4")))
