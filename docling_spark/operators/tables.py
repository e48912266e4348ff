"""Tables → queryable cell relation (docling-core
``TableItem.export_to_dataframe`` parity, distributed).

A docling user's last step for extracted tables is
``table.export_to_dataframe()`` — one pandas frame per table, on the
driver. The Spark-native spelling keeps every parsed table IN the
cluster as one long relation ``(doc_id, table_idx, row_idx,
col_idx, is_header, text)``: downstream joins/filters/pivots stay distributed,
and a single table never has to fit on the driver.

Input is the extraction output's span rows; table spans carry the
engine's canonical grid text (``doctree.serialize_table``: an "RxC"
dims line, tab-separated rows, a trailing ``H:``-flags line — the
same form ``export.export_docling_json`` parses back into docling-core
TableData structs). Parsing here is pure Catalyst (split/transform/
posexplode) — zero Python in the hot path, and the explode is narrow:
no shuffle at all unless the caller aggregates.

Same known limitation as ``export._table_data_col``: cell text
containing a literal tab/newline splits at the embedded delimiter
(the canonical form reuses those as delimiters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_cells(extracted: DataFrame, *,
                spans_col: str = "spans") -> DataFrame:
    """Extraction output (doc_id, spans) → one row per table cell:
    (doc_id, table_idx, num_rows, num_cols, row_idx, col_idx,
    is_header, text). ``table_idx`` numbers the table spans within each document
    in span order; header flags come from the grid's ``H:`` line
    (column headers live in row 0, docling-core's dense-table
    convention for declarative backends)."""
    tables = (extracted.select(
        "doc_id",
        F.posexplode(F.filter(F.col(spans_col),
                              lambda s: s["kind"] == F.lit("table")))
        .alias("_i", "_s"))
        .select("doc_id", F.col("_s.text").alias("_grid"),
                F.col("_i").alias("table_idx")))
    # table_idx from posexplode of the FILTERED array is already the
    # per-doc table ordinal (0-based, span order preserved).
    lines = F.split(F.col("_grid"), "\n")
    dims = F.split(F.element_at(lines, 1), "x")
    rows = F.slice(lines, 2, F.greatest(F.size(lines) - 2, F.lit(0)))
    flags = F.split(F.substring(F.element_at(lines, -1), 3, 1_000_000),
                    "\t")
    cells = F.flatten(F.transform(rows, lambda row, r: F.transform(
        F.split(row, "\t"), lambda c, j: F.struct(
            r.alias("row_idx"), j.alias("col_idx"),
            ((r == 0) & (F.element_at(flags, j + 1) == "1"))
            .alias("is_header"),
            c.alias("text")))))
    return (tables
            .select("doc_id", "table_idx",
                    F.element_at(dims, 1).cast("int").alias("num_rows"),
                    F.element_at(dims, 2).cast("int").alias("num_cols"),
                    F.explode(cells).alias("_c"))
            .select("doc_id", "table_idx", "num_rows", "num_cols",
                    F.col("_c.row_idx").alias("row_idx"),
                    F.col("_c.col_idx").alias("col_idx"),
                    F.col("_c.is_header").cast("int").alias("is_header"),
                    F.col("_c.text").alias("text")))


HTML_TABLE_CELLS_DDL = (
    "doc_id string, table_idx int, num_rows int, num_cols int, "
    "start_row int, start_col int, row_span int, col_span int, "
    "column_header int, row_header int, text string")


def _html_table_cells_batches(batches):
    import pandas as pd

    from ..parsers.dom import parse_html
    from ..parsers.html_parser import parse_table_data
    cols = ("doc_id", "table_idx", "num_rows", "num_cols", "start_row",
            "start_col", "row_span", "col_span", "column_header",
            "row_header", "text")
    for pdf in batches:
        out = {k: [] for k in cols}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            try:
                root = parse_html(payload or "")
                tables = root.find_all("table")
            except Exception:
                tables = []
            ti = 0
            for el in tables:
                try:
                    data = parse_table_data(el)
                except Exception:
                    data = None
                if data is None:    # nested table → skipped, like the
                    continue        # reference (html_backend.py:376-379)
                for c in data.cells:
                    out["doc_id"].append(doc_id)
                    out["table_idx"].append(ti)
                    out["num_rows"].append(data.num_rows)
                    out["num_cols"].append(data.num_cols)
                    out["start_row"].append(c.start_row)
                    out["start_col"].append(c.start_col)
                    out["row_span"].append(c.row_span)
                    out["col_span"].append(c.col_span)
                    out["column_header"].append(int(c.column_header))
                    out["row_header"].append(int(c.row_header))
                    out["text"].append(c.text)
                ti += 1
        yield pd.DataFrame(out)


def html_table_cells(df: DataFrame, *,
                     spans_col: str = "spans") -> DataFrame:
    """RAW-HTML table grids → the full docling-core ``TableCell``
    relation (html_backend.py:374-465 semantics): per cell its
    anchor (start_row, start_col), row/col spans, and the
    column-header (all-``th`` row) / row-header (``th`` in a body
    row) flags — structure :func:`table_cells` cannot recover from
    the serialized grid because span expansion has already flattened
    it there.

    Scale shape: one narrow explode of html spans to (doc_id,
    payload) rows, then a single Arrow-batched ``mapInPandas`` doing
    page-local DOM work — zero shuffles; embarrassingly parallel at
    10^12 documents like the extraction UDF it mirrors."""
    pages = (df.select(
        "doc_id",
        F.explode(F.filter(F.col(spans_col),
                           lambda s: s["kind"] == F.lit("html")))
        .alias("_s"))
        .select("doc_id", F.col("_s.text").alias("payload")))
    return pages.mapInPandas(_html_table_cells_batches,
                             schema=HTML_TABLE_CELLS_DDL)


PDF_TABLE_STRUCTURE_DDL = (
    "doc_id string, table_idx int, num_rows int, num_cols int, "
    "start_row int, start_col int, row_span int, col_span int, "
    "column_header int, text string")


def pdf_table_structure(df: DataFrame, *,
                        cells_col: str = "cells") -> DataFrame:
    """(doc_id, cells: array<struct l,t,r,b,text>) → the span-aware
    table-structure relation (parsers/pdf_page.table_grid_with_spans;
    the geometric stand-in for TableFormer's OTSL output,
    models/table_structure_model.py:171-297): each input row is one
    table's text cells with page-coordinate bboxes; each output row is
    one LOGICAL cell with its grid anchor, row/col span inferred from
    which anchor bands the bbox covers, and the row-0 column-header
    flag. ``table_idx`` is carried through when present, else 0.
    An input row with an empty cell array emits NO output rows (there
    is no table to structure) — callers that must distinguish
    "tableless" from "dropped" should left-join the result back on
    doc_id, same contract as the extraction span relation.

    Scale shape: zero-shuffle Arrow stage — tables are independent and
    small (a page fits thousands of cells at most), so the stage
    scales with input splits; no geometry ever leaves its partition."""
    import pandas as pd

    from ..parsers.pdf_page import Cell, table_grid_with_spans

    has_idx = "table_idx" in df.columns
    cols = ("doc_id", "table_idx", "num_rows", "num_cols", "start_row",
            "start_col", "row_span", "col_span", "column_header",
            "text")

    def batches(it):
        for pdf in it:
            out = {k: [] for k in cols}
            idxs = pdf["table_idx"] if has_idx else [0] * len(pdf)
            for doc_id, ti, arr in zip(pdf["doc_id"], idxs,
                                       pdf[cells_col]):
                cells = [Cell(index=i, text=str(c["text"]),
                              l=float(c["l"]), t=float(c["t"]),
                              r=float(c["r"]), b=float(c["b"]))
                         for i, c in enumerate(arr)]
                data = table_grid_with_spans(cells)
                for c in data.cells:
                    out["doc_id"].append(doc_id)
                    out["table_idx"].append(int(ti))
                    out["num_rows"].append(data.num_rows)
                    out["num_cols"].append(data.num_cols)
                    out["start_row"].append(c.start_row)
                    out["start_col"].append(c.start_col)
                    out["row_span"].append(c.row_span)
                    out["col_span"].append(c.col_span)
                    out["column_header"].append(int(c.column_header))
                    out["text"].append(c.text)
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, schema=PDF_TABLE_STRUCTURE_DDL)
