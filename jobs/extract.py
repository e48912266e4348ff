#!/usr/bin/env python
"""Batch extraction job — the spark-submit entry point (north rule:
"ships as spark-submit --py-files wheels").

    spark-submit --py-files dist/docling_spark.zip jobs/extract.py \
        --input <parquet dir | synth:<sf_dir>> \
        --output <snapshot-table root> \
        [--partitions N] [--max-payload-chars N] [--allowed-kinds html,csv,...]

Flow (SURVEY.md §7.1):
    read corpus → resume anti-join vs committed snapshot → routed
    extraction (doc path + page-parallel path) → write snapshot
    (atomic manifest commit) + per-partition lineage/metrics table →
    print one JSON summary line.

Re-running after a kill resumes from the last committed snapshot:
uncommitted data directories are invisible to readers (the manifest is
the only commit point) and their doc_ids are re-processed.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Observation, SparkSession
from pyspark.sql import functions as F


def build_spark(partitions: int) -> SparkSession:
    return (
        SparkSession.builder
        .appName("docling-spark-extract")
        .config("spark.sql.shuffle.partitions", str(partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.icu.caseMappings.enabled", "false")
        .getOrCreate()
    )


def load_input(spark: SparkSession, spec: str):
    from docling_spark.sources.corpus import corpus_from_documents
    if spec.startswith("synth:"):
        return corpus_from_documents(spark, spec[len("synth:"):])
    return spark.read.parquet(spec)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="parquet dir of (doc_id, spans), or synth:<sf_dir>")
    ap.add_argument("--output", required=True,
                    help="snapshot-table root (checkpoint location)")
    ap.add_argument("--partitions", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--max-payload-chars", type=int, default=None)
    ap.add_argument("--oversize", default="drop", choices=["drop", "fail"],
                    help="oversize docs: drop before the UDF, or report "
                         "as status=failure rows (reference contract)")
    ap.add_argument("--allowed-kinds", type=str, default=None,
                    help="comma-separated input kinds filter")
    ap.add_argument("--export", default=None,
                    choices=["markdown", "text", "doctags", "html"],
                    help="also render spans to this sink format")
    ap.add_argument("--enrich", action="store_true",
                    help="also write the enrichment side-table")
    ap.add_argument("--main-content", action="store_true",
                    help="also write the DOM-boilerplate-stripped "
                         "main-content side-table for html docs")
    args = ap.parse_args(argv)

    from docling_spark.lake import (
        SnapshotTable,
        partition_metrics,
        resume_filter,
    )
    from docling_spark.operators.extract import extract_routed

    spark = build_spark(args.partitions)
    spark.sparkContext.setLogLevel("WARN")
    t0 = time.monotonic()

    table = SnapshotTable(args.output)
    corpus = load_input(spark, args.input)
    todo = resume_filter(corpus, table)

    allowed = args.allowed_kinds.split(",") if args.allowed_kinds else None
    out = extract_routed(todo, num_partitions=args.partitions,
                         allowed_kinds=allowed,
                         max_payload_chars=args.max_payload_chars,
                         oversize=args.oversize)

    obs = Observation("extract")
    out = out.observe(
        obs,
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_spans").alias("spans"),
        F.sum((F.col("status") != "success").cast("long")).alias("errors"))

    # one pass: persist output, derive metrics from the persisted data
    out = out.persist()
    n_out = out.count()
    if n_out == 0:
        out.unpersist()
        print(json.dumps({"status": "noop", "docs": 0,
                          "resume": "all input already committed"}))
        spark.stop()
        return 0

    metrics = partition_metrics(out)
    entry = table.write_snapshot(out, metrics=metrics)
    counters = obs.get

    side_outputs = {}
    if args.export:
        from docling_spark.operators import export as ex
        render = {"markdown": ex.export_markdown, "text": ex.export_text,
                  "doctags": ex.export_doctags, "html": ex.export_html}
        path = f"{args.output}/exports/{args.export}"
        render[args.export](out).write.mode("overwrite").parquet(path)
        side_outputs["export"] = path
    if args.enrich:
        from docling_spark.operators.enrich import enrich_spans
        path = f"{args.output}/enrichment"
        enrich_spans(out).write.mode("overwrite").parquet(path)
        side_outputs["enrichment"] = path
    if args.main_content:
        from docling_spark.operators.maincontent import extract_main_content
        path = f"{args.output}/main_content"
        (extract_main_content(todo, num_partitions=args.partitions)
         .write.mode("overwrite").parquet(path))
        side_outputs["main_content"] = path
    out.unpersist()

    print(json.dumps({
        "status": "committed",
        "snapshot": entry["id"],
        "docs": counters.get("docs"),
        "spans": counters.get("spans"),
        "errors": counters.get("errors"),
        "wall_sec": round(time.monotonic() - t0, 2),
        "docs_per_sec": round(
            (counters.get("docs") or 0)
            / max(time.monotonic() - t0, 1e-9), 1),
        **({"side_outputs": side_outputs} if side_outputs else {}),
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
