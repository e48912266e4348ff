"""Spark-side drive of the stored-prediction layout operator
(operators/extract.py::page_clusters) through ``mapInPandas`` — the
reference pipeline is utils/layout_postprocessor.py:159-670; the
page-local semantics are unit-tested in test_layout_post.py, so these
cases target the Spark surface plus the two paths the registry
query's oracle template cannot reach statically: overlap dedup between
competing regular clusters and wrapper-swallows-regular containment."""

import json

from pyspark.sql import functions as F


def _src(spark, pages):
    rows = [(f"d{i}", [{"kind": "pdf_page", "text": json.dumps(p),
                        "media_ref": "", "offset": 0}])
            for i, p in enumerate(pages)]
    return spark.createDataFrame(
        rows, "doc_id string, spans array<struct<kind string, "
              "text string, media_ref string, offset int>>")


def test_page_clusters_gate_remap_orphan_order(spark):
    from docling_spark.operators.extract import page_clusters
    page = {
        "width": 612.0, "height": 792.0,
        "cells": [
            {"index": 0, "text": "Heading", "l": 10, "t": 10,
             "r": 80, "b": 20},
            {"index": 1, "text": "body", "l": 10, "t": 30,
             "r": 50, "b": 40},
            {"index": 2, "text": "stray", "l": 10, "t": 400,
             "r": 60, "b": 410},
        ],
        "clusters": [
            {"id": 1, "label": "title", "confidence": 0.9,
             "l": 5, "t": 5, "r": 90, "b": 25},
            {"id": 2, "label": "text", "confidence": 0.8,
             "l": 5, "t": 28, "r": 90, "b": 45},
            {"id": 3, "label": "text", "confidence": 0.3,   # gated
             "l": 0, "t": 0, "r": 612, "b": 792},
            {"id": 4, "label": "picture", "confidence": 0.95,  # full page
             "l": 0, "t": 0, "r": 612, "b": 792},
        ],
    }
    out = page_clusters(_src(spark, [page])).orderBy("cluster_rank")
    rows = [(r["cluster_rank"], r["label"], r["l"], r["t"], r["r"],
             r["b"], r["n_cells"], r["text"]) for r in out.collect()]
    assert rows == [
        (0, "section_header", 10, 10, 80, 20, 1, "Heading"),
        (1, "text", 10, 30, 50, 40, 1, "body"),
        (2, "text", 10, 400, 60, 410, 1, "stray"),  # orphan promoted
    ]


def test_page_clusters_overlap_dedup_keeps_better(spark):
    # two same-label clusters over the same cell: dedup keeps one and
    # the survivor owns the cell
    from docling_spark.operators.extract import page_clusters
    page = {
        "width": 612.0, "height": 792.0,
        "cells": [{"index": 0, "text": "only", "l": 10, "t": 10,
                   "r": 60, "b": 20}],
        "clusters": [
            {"id": 1, "label": "text", "confidence": 0.95,
             "l": 8, "t": 8, "r": 62, "b": 22},
            {"id": 2, "label": "text", "confidence": 0.6,
             "l": 9, "t": 9, "r": 61, "b": 21},
        ],
    }
    out = page_clusters(_src(spark, [page]))
    rows = out.collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["label"], r["n_cells"], r["text"]) == ("text", 1, "only")
    # bbox shrunk to the cell either way
    assert (r["l"], r["t"], r["r"], r["b"]) == (10, 10, 60, 20)


def test_page_clusters_wrapper_swallows_contained_text(spark):
    # a FORM wrapper containing a text cluster: the text cluster
    # becomes its child and leaves the top level; the wrapper carries
    # the child's cells and the union bbox
    from docling_spark.operators.extract import page_clusters
    page = {
        "width": 612.0, "height": 792.0,
        "cells": [{"index": 0, "text": "field", "l": 100, "t": 100,
                   "r": 160, "b": 112}],
        "clusters": [
            {"id": 1, "label": "form", "confidence": 0.9,
             "l": 90, "t": 90, "r": 200, "b": 130},
            {"id": 2, "label": "text", "confidence": 0.9,
             "l": 95, "t": 95, "r": 170, "b": 120},
        ],
    }
    out = page_clusters(_src(spark, [page]))
    rows = out.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["label"] == "form" and r["n_cells"] == 1
    assert r["text"] == "field"
    # FORM bbox = union of children (here: the shrunk text cluster)
    assert (r["l"], r["t"], r["r"], r["b"]) == (100, 100, 160, 112)


def test_page_clusters_is_shuffle_free(spark):
    from docling_spark.operators.extract import page_clusters
    page = {"width": 612.0, "height": 792.0, "cells": [], "clusters": []}
    plan = page_clusters(_src(spark, [page]))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan.replace("BroadcastExchange", "")


def test_page_clusters_malformed_payload_yields_no_rows(spark):
    from docling_spark.operators.extract import page_clusters
    src = _src(spark, [{}]).withColumn(
        "spans", F.expr(
            "array(named_struct('kind','pdf_page','text','{bad json',"
            "'media_ref','','offset',0))"))
    assert page_clusters(src).count() == 0
