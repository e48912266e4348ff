"""Mojibake repair (operators/encoding.py), interleaved packing
(operators/packing.py::pack_interleaved) and modality interleaving
stats (operators/multimodal.py::interleave_stats)."""

import pytest

from docling_spark.operators.encoding import repair_once, repair_text


# ---------------------------------------------------------------- pure logic

@pytest.mark.parametrize("raw,fixed,passes", [
    ("hello world", "hello world", 0),          # ASCII short-circuit
    ("hello Ã©", "hello é", 1),  # Ã© -> é
    ("itâ€™s", "it’s", 1),  # â€™ -> ’
    ("x ÃƒÂ©", "x é", 2),  # ÃƒÂ© -> é (double)
    ("café", "café", 0),              # genuine é untouched
    ("naïve résumé", "naïve résumé", 0),
    ("日本語", "日本語", 0),  # >0xFF: no-op
    ("", "", 0),
])
def test_repair_text(raw, fixed, passes):
    assert repair_text(raw) == (fixed, passes)


def test_sloppy_holes_roundtrip():
    # 0x81/0x8D/0x8F/0x90/0x9D are cp1252 holes; an upstream latin-1
    # misdecode of UTF-8 can emit them (e.g. é's C2 90 pair when the
    # original codepoint was U+0450-ish). The sloppy encoder must
    # reproduce the raw byte so the UTF-8 unwind still works.
    # U+0450 (ѐ) in UTF-8 = D1 90; latin-1-misdecoded = "Ñ\x90".
    assert repair_once("\u00d1\u0090") == "ѐ"


def test_repair_never_lengthens():
    # acceptance requires strict shrink — a legacy-encoded string that
    # happens to roundtrip must not be "repaired" into equal length
    s = "abcä"  # ä alone: cp1252 E4 is invalid UTF-8 -> no-op
    assert repair_text(s) == (s, 0)


def test_max_passes_bounds():
    # triple-encoded é unwinds only as far as the pass budget allows
    s = "é"
    for _ in range(3):
        s = s.encode("utf-8").decode("cp1252")
    fixed, n = repair_text(s, max_passes=2)
    assert n == 2 and fixed == "Ã©"
    fixed3, n3 = repair_text(s, max_passes=5)
    assert (fixed3, n3) == ("é", 3)


# ---------------------------------------------------------------- spark ops

def test_repair_mojibake_df(spark):
    from docling_spark.operators.encoding import repair_mojibake
    df = spark.createDataFrame(
        [("a", "plain"), ("b", "x Ã©"), ("c", None)],
        "doc_id string, text string")
    rows = {r["doc_id"]: r for r in repair_mojibake(df).collect()}
    assert rows["a"]["text_fixed"] == "plain"
    assert rows["a"]["mojibake_passes"] == 0
    assert rows["b"]["text_fixed"] == "x é"
    assert rows["b"]["mojibake_passes"] == 1
    assert rows["b"]["n_chars_fixed"] == 3
    assert rows["c"]["text_fixed"] is None
    assert rows["c"]["mojibake_passes"] is None


def test_pack_interleaved(spark):
    from docling_spark.operators.packing import pack_interleaved
    df = spark.createDataFrame(
        [("d1", 10, 2), ("d2", 100, 0), ("d3", 0, 1)],
        "doc_id string, n_tokens long, n_images long")
    out = {r["doc_id"]: r for r in
           pack_interleaved(df, seq_len=64, n_shards=1,
                            image_tokens=16).collect()}
    # single shard → doc_id order d1,d2,d3; costs 42, 100, 16
    assert out["d1"]["cost"] == 42 and out["d1"]["start_tok"] == 0
    assert out["d1"]["first_seq"] == 0 and out["d1"]["last_seq"] == 0
    assert out["d2"]["start_tok"] == 42
    assert out["d2"]["first_seq"] == 0 and out["d2"]["last_seq"] == 2
    assert out["d2"]["n_seqs"] == 3
    assert out["d3"]["start_tok"] == 142
    assert out["d3"]["media_share_e6"] == 1_000_000  # all-image doc
    assert out["d1"]["media_share_e6"] == 32 * 1_000_000 // 42
    assert out["d2"]["media_share_e6"] == 0


def test_interleave_stats(spark):
    from docling_spark.operators.multimodal import interleave_stats
    rows = [
        # d1: text, picture, text — 2 switches
        ("d1", "text", 0), ("d1", "picture", 1), ("d1", "text", 2),
        # d2: text only — 0 switches, no media
        ("d2", "text", 0), ("d2", "text", 1),
        # d3: single media span — 0 switches
        ("d3", "picture", 0),
        # d4: offsets arrive shuffled; walk must re-order by offset
        ("d4", "picture", 3), ("d4", "text", 0), ("d4", "picture", 2),
        ("d4", "text", 1),
    ]
    df = spark.createDataFrame(rows, "doc_id string, kind string, offset int")
    out = {r["doc_id"]: r for r in interleave_stats(df).collect()}
    assert out["d1"]["n_switches"] == 2
    assert out["d1"]["first_media_offset"] == 1
    assert out["d1"]["media_ratio_e6"] == 333_333
    assert out["d2"]["n_switches"] == 0
    assert out["d2"]["first_media_offset"] == -1
    assert out["d2"]["media_ratio_e6"] == 0
    assert out["d3"]["n_switches"] == 0
    assert out["d3"]["n_media_spans"] == 1
    assert out["d3"]["media_ratio_e6"] == 1_000_000
    # d4 sorted by offset = text,text,picture,picture → 1 switch
    assert out["d4"]["n_switches"] == 1
    assert out["d4"]["first_media_offset"] == 2
