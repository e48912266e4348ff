#!/usr/bin/env python
"""Decompose the extraction job's wall into scan / input-marshal /
parse / output-marshal, using the per-doc wall_us column the extract
UDF already emits.

Stages measured on the SAME materialized corpus (the scaling-bench
corpus — heavy-tailed, many-file parquet):

  scan        plain count() of the input (parquet scan + span arrays
              never touched by Python)
  passthru    a mapInPandas stage that receives (doc_id, spans) like
              the real UDF, touches every span struct once, emits one
              int per doc — isolates Arrow→pandas→Python input
              marshaling with zero parse work
  extract     the real extract_spans; sum(wall_us) gives in-UDF
              parse core-seconds, so
              overhead ≈ cores × wall − scan − in_udf
  flat        extract over Catalyst-pre-assembled flat payloads
              (payload_kind, pages, media_refs computed JVM-side)
              when docling_spark.operators.extract exposes it

Usage: python tools/profile_extract.py [corpus_dir] [cpus]
"""

from __future__ import annotations

import json
import sys
import time
from typing import Iterator

import pandas as pd

ROOT = __file__.rsplit("/", 2)[0]
sys.path.insert(0, ROOT)


def _passthru(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        n = []
        for raw in pdf["spans"].tolist():
            lst = list(raw) if raw is not None else []
            # touch each struct the way _extract_one does
            n.append(sum(1 for s in lst
                         if (s["kind"] if isinstance(s, dict)
                             else getattr(s, "kind", "")) is not None))
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "n": n})


def main() -> None:
    corpus_dir = (sys.argv[1] if len(sys.argv) > 1
                  else "/tmp/scaling_corpus_sf0.1_40")
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    from docling_spark.operators.extract import extract_spans

    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
             .config("spark.sql.execution.arrow.maxRecordsPerBatch", "512")
             .config("spark.driver.memory", "24g")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    corpus = spark.read.parquet(corpus_dir)
    n_docs = corpus.count()
    rep = {"corpus": corpus_dir, "cpus": cpus, "docs": n_docs}

    def timed(name, fn, warm=True):
        if warm:
            fn()
        t0 = time.monotonic()
        r = fn()
        rep[name] = round(time.monotonic() - t0, 3)
        return r

    timed("scan_sec", lambda: corpus.select(F.sum(F.size("spans")))
          .collect())
    timed("passthru_sec",
          lambda: corpus.mapInPandas(_passthru, "doc_id string, n int")
          .select(F.sum("n")).collect())
    row = timed("extract_sec",
                lambda: extract_spans(corpus, assembly="python")
                .select(F.sum("n_spans").alias("s"),
                        F.sum("wall_us").alias("w")).collect()[0])
    rep["spans"] = int(row["s"])
    rep["in_udf_core_sec"] = round(row["w"] / 1e6, 3)
    rep["extract_core_sec"] = round(rep["extract_sec"] * cpus, 3)
    rep["overhead_core_sec"] = round(
        rep["extract_core_sec"] - rep["in_udf_core_sec"], 3)
    rep["docs_per_sec"] = round(n_docs / rep["extract_sec"], 1)

    try:
        from docling_spark.operators.extract import extract_spans_flat
        row = timed("flat_sec",
                    lambda: extract_spans_flat(corpus)
                    .select(F.sum("n_spans").alias("s"),
                            F.sum("wall_us").alias("w")).collect()[0])
        rep["flat_in_udf_core_sec"] = round(row["w"] / 1e6, 3)
        rep["flat_spans"] = int(row["s"])
        rep["flat_docs_per_sec"] = round(n_docs / rep["flat_sec"], 1)
    except ImportError:
        pass

    # the production default (mapInArrow output marshal)
    row = timed("arrow_sec",
                lambda: extract_spans(corpus, assembly="arrow")
                .select(F.sum("n_spans").alias("s"),
                        F.sum("wall_us").alias("w")).collect()[0])
    rep["arrow_in_udf_core_sec"] = round(row["w"] / 1e6, 3)
    rep["arrow_spans"] = int(row["s"])
    rep["arrow_docs_per_sec"] = round(n_docs / rep["arrow_sec"], 1)

    print(json.dumps(rep))
    spark.stop()


if __name__ == "__main__":
    main()
