"""Text-corpus IO beyond parquet: JSONL and CSV sources, JSONL sink.

LLM data pipelines overwhelmingly move corpora as JSON-lines (one
document object per line — the HuggingFace datasets / RedPajama /
Dolma interchange shape) and occasionally as CSV exports. These
readers normalize either into the engine's (doc_id, text, …) document
table with an ENFORCED schema — ``spark.read.json`` without a schema
runs a full inference scan first (twice the IO at 100 TB) and
silently unions drifting shapes; passing the schema makes the read
one pass and makes drift an error, with Spark's standard
``columnNameOfCorruptRecord`` escape hatch for bad lines.

The JSONL sink exists because tokenizer/training jobs downstream of
curation usually want JSONL back; it is a plain distributed
``df.write.json`` (one file per partition, gzip-able via
``compression``), not a driver-side collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOC_DDL = ("doc_id long, text string, lang string, source string, "
           "_corrupt string")


def read_jsonl_corpus(spark: SparkSession, path: str, *,
                      id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """JSONL → (doc_id, text[, lang, source]) with enforced schema.
    Lines that don't parse land in ``_corrupt`` and are surfaced as
    (doc_id NULL, _corrupt set) rows — filter or fail on them
    explicitly; they are never silently dropped. (Spark refuses a
    query that reads ONLY the corrupt column from the raw scan —
    cache/write the frame first when auditing bad lines alone.)"""
    df = (spark.read
          .schema(DOC_DDL.replace("doc_id", id_col, 1)
                  .replace("text string", f"{text_col} string", 1))
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt")
          .json(path))
    return df.select(F.col(id_col).alias("doc_id"),
                     F.col(text_col).alias("text"),
                     "lang", "source", "_corrupt")


def read_csv_corpus(spark: SparkSession, path: str, *,
                    header: bool = True,
                    sep: str = ",") -> DataFrame:
    """CSV → (doc_id, text[, lang, source]) with enforced schema (no
    inference scan); multiline quoted fields supported — documents
    contain newlines."""
    return (spark.read
            .schema("doc_id long, text string, lang string, source string")
            .option("header", str(header).lower())
            .option("sep", sep)
            .option("multiLine", "true")
            .option("escape", '"')
            .csv(path))


def write_jsonl(df: DataFrame, path: str, *,
                compression: str = None) -> None:
    """(any schema) → JSONL directory, one shard per partition.
    Repartition upstream to control shard count/size."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
