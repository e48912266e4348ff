"""Docling-JSON parser — reads a serialized DoclingDocument and emits
its spans (the reference's passthrough backend,
/root/reference/docling/backend/json/docling_json_backend.py:13-58:
validate stored JSON → document).

The flattening rule is the SAME depth-first body-tree walk as the
golden derivation (docling_spark.golden.golden_spans) — by
construction, round-tripping a groundtruth fixture through this parser
reproduces its golden spans exactly.
"""

from __future__ import annotations

import json

from ..doctree import DocTree
from ..golden import golden_spans


def parse_docling_json(payload: str) -> DocTree:
    gt = json.loads(payload)
    if gt.get("schema_name") not in (None, "DoclingDocument"):
        raise ValueError(f"not a DoclingDocument: {gt.get('schema_name')}")
    tree = DocTree()
    for span in golden_spans(gt):
        if span["kind"] == "table":
            # table text is already in canonical serialized form
            tree.add_text("table", span["text"])
        else:
            tree.add_text(span["kind"], span["text"],
                          media_ref=span["media_ref"])
    return tree
