"""JSONL/CSV corpus IO: enforced schemas, corrupt-line surfacing,
round-trip through the JSONL sink."""

import json
import os


def test_jsonl_roundtrip_and_corrupt_lines(spark, tmp_path):
    from docling_spark.sources.textio import read_jsonl_corpus, write_jsonl

    src = tmp_path / "in.jsonl"
    lines = [json.dumps({"doc_id": i, "text": f"doc {i} body",
                         "lang": "en", "source": "s.org"})
             for i in range(5)]
    lines.append('{"doc_id": 99, "text": "ok"}')     # missing cols -> null
    lines.append('this is not json at all')          # corrupt
    src.write_text("\n".join(lines) + "\n")

    # Spark disallows queries touching ONLY the corrupt column on a
    # lazy raw-JSON scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — a
    # count() after a _corrupt filter is exactly that; materialize
    df = read_jsonl_corpus(spark, str(src)).cache()
    good = df.filter(df["_corrupt"].isNull())
    assert good.count() == 6
    bad = df.filter(df["_corrupt"].isNotNull()).collect()
    assert len(bad) == 1 and "not json" in bad[0]["_corrupt"]

    out = str(tmp_path / "out")
    write_jsonl(good.drop("_corrupt"), out)
    back = spark.read.json(out)
    assert back.count() == 6
    assert {r["doc_id"] for r in back.select("doc_id").collect()} \
        == {0, 1, 2, 3, 4, 99}


def test_csv_corpus_multiline(spark, tmp_path):
    from docling_spark.sources.textio import read_csv_corpus

    src = tmp_path / "docs.csv"
    src.write_text('doc_id,text,lang,source\n'
                   '1,"line one\nline two",en,a.org\n'
                   '2,"plain",de,b.org\n')
    df = read_csv_corpus(spark, str(src))
    rows = {r["doc_id"]: r for r in df.collect()}
    assert rows[1]["text"] == "line one\nline two"
    assert rows[2]["lang"] == "de"
