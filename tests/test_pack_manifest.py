"""Packed-sequence dataloader manifest
(operators/packing.py:pack_manifest)."""

from collections import defaultdict


def test_slices_tile_sequences(spark):
    """Within every shard, sequence slices are contiguous, start at
    the right in-doc offsets, and tile each sequence exactly (except
    the ragged tail)."""
    from docling_spark.operators.packing import pack_manifest
    docs = spark.createDataFrame(
        [(i, 10 + (i * 7) % 23) for i in range(60)],
        "doc_id long, n_tokens long")
    rows = pack_manifest(docs, seq_len=16, n_shards=4).collect()
    seqs = defaultdict(list)
    total = defaultdict(int)
    for r in rows:
        seqs[(r["shard_id"], r["seq_idx"])].append(r)
        total[r["doc_id"]] += r["slice_len"]
    # per-doc slices cover the whole document exactly once
    toks = {r["doc_id"]: r["n_tokens"] for r in docs.collect()}
    assert total == toks
    for (shard, seq), slices in seqs.items():
        slices.sort(key=lambda r: r["pos_in_seq"])
        pos = 0
        for s in slices:
            assert s["pos_in_seq"] == pos
            assert 1 <= s["slice_len"] <= 16
            pos += s["slice_len"]
        assert pos <= 16
    # doc_off of a doc's consecutive slices advances by slice_len
    per_doc = defaultdict(list)
    for r in rows:
        per_doc[r["doc_id"]].append(r)
    for d, slices in per_doc.items():
        slices.sort(key=lambda r: r["doc_off"])
        off = 0
        for s in slices:
            assert s["doc_off"] == off
            off += s["slice_len"]


def test_straddling_doc_splits(spark):
    from docling_spark.operators.packing import pack_manifest
    docs = spark.createDataFrame([(5, 40)], "doc_id long, n_tokens long")
    rows = sorted(pack_manifest(docs, seq_len=16, n_shards=1).collect(),
                  key=lambda r: r["seq_idx"])
    assert [r["slice_len"] for r in rows] == [16, 16, 8]
    assert [r["pos_in_seq"] for r in rows] == [0, 0, 0]
    assert [r["doc_off"] for r in rows] == [0, 16, 32]
