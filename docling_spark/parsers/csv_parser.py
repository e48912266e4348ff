"""CSV → DocTree: whole file becomes one table.

Re-implements the semantics of the reference CSV backend
(/root/reference/docling/backend/csv_backend.py:52-125): sniff the
dialect over the first line restricted to delimiters ``,;\\t|:``,
strict-parse, num_cols = max row length, first row = column headers.
"""

from __future__ import annotations

import csv
from io import StringIO

from ..doctree import DocTree, TableCell, TableData


def parse_csv_document(payload: str) -> DocTree:
    content = StringIO(payload)
    head = content.readline()
    dialect = csv.Sniffer().sniff(head, ",;\t|:")
    if dialect.delimiter not in {",", ";", "\t", "|", ":"}:
        raise RuntimeError(
            f"Cannot convert csv with unknown delimiter {dialect.delimiter}.")

    content.seek(0)
    rows = list(csv.reader(content, dialect=dialect, strict=True))

    tree = DocTree()
    if rows:
        num_rows = len(rows)
        num_cols = max(len(r) for r in rows)
        data = TableData(num_rows=num_rows, num_cols=num_cols, cells=[])
        for row_idx, row in enumerate(rows):
            for col_idx, value in enumerate(row):
                data.cells.append(TableCell(
                    text=str(value), row_span=1, col_span=1,
                    start_row=row_idx, start_col=col_idx,
                    column_header=(row_idx == 0), row_header=False))
        tree.add_table(data)
    return tree
