"""Round-3 curation additions: unicode canonicalization
(operators/normalize.py), bloom-filter incremental dedup + shingle
containment (operators/dedup.py), per-group percentile quality gate
(operators/curate.py)."""

import unicodedata


def test_canonicalized_nfc_controls_whitespace(spark):
    from docling_spark.operators.normalize import canonicalized
    docs = spark.createDataFrame(
        [(1, "café latte"),        # decomposed accent
         (2, "café latte"),          # composed — must hash equal
         (3, "a\x07b\x00c"),              # C0 controls stripped
         (4, "  x \t\t y  "),             # hws collapse + trim
         (5, None)],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in canonicalized(docs).collect()}
    assert out[1]["norm_sha256"] == out[2]["norm_sha256"]
    assert out[1]["text_norm"] == "café latte"
    assert unicodedata.is_normalized("NFC", out[1]["text_norm"])
    assert out[3]["text_norm"] == "abc"
    assert out[4]["text_norm"] == "x y"
    assert out[5]["text_norm"] is None


def test_canonicalized_zero_shuffle(spark):
    from docling_spark.operators.normalize import canonicalized
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet") \
        .select("doc_id", "text")
    plan = canonicalized(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_bloom_membership_members_and_novel(spark):
    from docling_spark.operators.dedup import bloom_membership
    seen = spark.createDataFrame(
        [(i, f"shared document body number {i}") for i in range(20)],
        "doc_id long, text string")
    probes = spark.createDataFrame(
        # 0-9: exact members (whitespace-normalized); 100+: novel
        [(i + 1000, f"shared  document body number {i}")
         for i in range(10)]
        + [(i + 2000, f"completely novel probe text {i} zzz")
           for i in range(10)],
        "doc_id long, text string")
    out = {r["doc_id"]: r["bloom_dup"]
           for r in bloom_membership(seen, probes).collect()}
    assert all(out[i + 1000] == 1 for i in range(10))
    # 4 hashes into 2^18 bits from 80 set positions: P(fp) ~ (80/2^18)^4
    assert all(out[i + 2000] == 0 for i in range(10))


def test_bloom_set_bits_broadcast(spark):
    from docling_spark.operators.dedup import bloom_membership
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet") \
        .select("doc_id", "text")
    plan = bloom_membership(docs, docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_ngram_containment_full_embedding(spark):
    from docling_spark.operators.dedup import (exploded_shingles,
                                               ngram_containment)
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"),
         (2, "alpha beta gamma delta epsilon zeta eta theta iota")],
        "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    sh = exploded_shingles(docs, n=3)
    rows = ngram_containment(sh, pairs).collect()
    assert len(rows) == 1
    assert rows[0]["containment"] == 1.0  # doc 1 fully inside doc 2


def test_adaptive_quality_gate_per_group(spark):
    from docling_spark.operators.curate import adaptive_quality_gate
    rows = ([(i, "a", i) for i in range(1, 11)]          # scores 1..10
            + [(i + 100, "b", i * 100) for i in range(1, 11)])
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, score long")
    out = adaptive_quality_gate(docs, score_col="score",
                                group_col="source", q=0.3)
    got = {(r["source"], r["score"]) for r in out.collect()}
    # q=0.3 over 1..10 → threshold 3.7 → keep 4..10 in both groups
    assert {s for g, s in got if g == "a"} == set(range(4, 11))
    assert {s for g, s in got if g == "b"} == {i * 100
                                               for i in range(4, 11)}
