"""Hierarchical + tokenizer-aware chunking — the engine's parity
analogue of the reference's chunker surface
(/root/reference/docling/chunking/__init__.py:7-13, which re-exports
docling-core's HierarchicalChunker / HybridChunker; docling-core source
is NOT in the reference tree — the contract here is reconstructed from
its public documentation and the reference's own usage).

Contract (two stages, applied per document):

Stage 1 — hierarchical chunks (HierarchicalChunker analogue). Walk the
ordered span stream keeping a ``heading_by_level`` map:

* ``title`` spans set heading level 0; ``section_header`` spans set
  their own level (default 1 — flat spans carry no level, so callers
  that know structure pass the optional aligned ``hints`` array:
  heading level for title/section_header spans, owner-table offset
  for caption spans, −1 elsewhere; e.g. the docling-JSON path reads
  ``SectionHeaderItem.level`` and ``TableItem.captions``).
  Setting level L drops all deeper entries (> L): the sections they
  headed just went out of scope. Heading spans produce no chunk.
* consecutive ``list_item`` spans merge into ONE chunk
  (``merge_list_items`` semantics), text joined with newlines;
* a ``table`` span is its own chunk; ``caption`` spans attach to it
  as caption metadata instead of standalone chunks (docling-core
  binds ``TableItem.captions`` by explicit ref). With the ``hints``
  sidecar a caption's hint is its owner table's span OFFSET — exact
  ref parity, position-independent. Without hints, a caption run
  immediately following a table attaches by adjacency (exact for
  engine-produced spans, which always serialize owner-then-caption;
  an approximation for foreign span streams);
* ``picture`` spans yield no chunk (no text; media travels in the
  span table itself) and detach any caption run — a picture's caption
  becomes an ordinary text chunk, as docling-core's non-chunked items
  leave their caption TextItems to be walked normally;
* every other non-empty text span is one chunk.

Each chunk carries ``headings`` — the live heading trail, shallowest
first — and ``doc_items`` — the source span offsets (the prov
analogue).

Stage 2 — tokenizer-aware sizing (HybridChunker analogue). Token
counts use the deterministic whitespace tokenizer ``len(re.findall
(r"\\S+", text))`` (the oracle replays it with DuckDB
``regexp_extract_all``). With ``ctx`` = tokens of headings + captions
(the serialized context that ships with every chunk):

* a chunk whose ``ctx + text`` exceeds ``max_tokens`` is SPLIT: a
  merged list chunk splits on item boundaries (greedy left-to-right
  packing into ``max_tokens - ctx``), and any single item/text still
  over budget splits into fixed token windows of ``max_tokens - ctx``
  (window floor 1: a context wider than the budget still yields
  progress, mirroring HybridChunker's plain-text fallback split);
* adjacent chunks with IDENTICAL (headings, captions) metadata are
  then MERGED greedily left-to-right while the combined ``ctx +
  text`` stays within ``max_tokens`` (``merge_peers=True``).

Scale shape: the input row already holds one whole document, so the
operator is a single zero-shuffle ``mapInPandas`` pass — chunking is
embarrassingly parallel at 10^12 documents; no explode, no window, no
co-location requirement.
"""

from __future__ import annotations

import re
from typing import Iterator, List, Optional, Sequence

import pandas as pd
from pyspark.sql import DataFrame

_TOKEN_RE = re.compile(r"\S+")

HEADING_DEFAULT_LEVELS = {"title": 0, "section_header": 1}

CHUNK_DDL = (
    "doc_id string, chunk_id int, headings array<string>, "
    "captions array<string>, text string, doc_items array<int>, "
    "n_tokens int"
)


def _ntok(text: str) -> int:
    return len(_TOKEN_RE.findall(text or ""))


class _Chunk:
    __slots__ = ("headings", "captions", "texts", "doc_items")

    def __init__(self, headings: List[str]) -> None:
        self.headings = headings
        self.captions: List[str] = []
        self.texts: List[str] = []
        self.doc_items: List[int] = []

    @property
    def text(self) -> str:
        return "\n".join(self.texts)

    def ctx_tokens(self) -> int:
        return sum(_ntok(h) for h in self.headings) + \
            sum(_ntok(c) for c in self.captions)

    def total_tokens(self) -> int:
        return self.ctx_tokens() + sum(_ntok(t) for t in self.texts)


def hier_chunks(spans: Sequence[dict],
                hints: Optional[Sequence[Optional[int]]] = None,
                *, max_tokens: int = 64,
                merge_peers: bool = True) -> List[dict]:
    """Chunk one document's ordered spans. ``hints`` — optional array
    aligned with ``spans``: heading level for title/section_header
    spans, owner-table span offset for caption spans, −1/None
    elsewhere. Absent → default levels + adjacency caption binding."""
    ordered = sorted(range(len(spans)), key=lambda i: spans[i]["offset"])

    def hint(i: int) -> Optional[int]:
        if hints is not None and i < len(hints):
            h = hints[i]
            return None if h is None or h < 0 else int(h)
        return None

    # pre-pass: explicit caption ownership (position-independent, the
    # tree-ref semantics); consumed captions never chunk standalone
    cap_by_owner: dict = {}
    owned_caps = set()
    if hints is not None:
        for i in ordered:
            if (spans[i].get("kind") == "caption"
                    and hint(i) is not None):
                cap_by_owner.setdefault(hint(i), []).append(
                    spans[i].get("text") or "")
                owned_caps.add(i)

    # ---- stage 1: hierarchical chunks -------------------------------
    heading_by_level: dict = {}
    chunks: List[_Chunk] = []
    list_run: Optional[_Chunk] = None
    attach: Optional[_Chunk] = None  # table chunk open for captions

    def trail() -> List[str]:
        return [heading_by_level[k] for k in sorted(heading_by_level)]

    def flush_list() -> None:
        nonlocal list_run
        if list_run is not None:
            chunks.append(list_run)
            list_run = None

    for i in ordered:
        s = spans[i]
        kind = s.get("kind") or "text"
        text = s.get("text") or ""
        off = s.get("offset", i)
        if kind in HEADING_DEFAULT_LEVELS:
            flush_list()
            attach = None
            level = hint(i)
            if level is None:
                level = HEADING_DEFAULT_LEVELS[kind]
            for k in [k for k in heading_by_level if k > level]:
                del heading_by_level[k]
            heading_by_level[level] = text
            continue
        if kind == "list_item":
            attach = None
            if not text:
                continue
            if list_run is None:
                list_run = _Chunk(trail())
            list_run.texts.append(text)
            list_run.doc_items.append(off)
            continue
        if kind == "caption" and i in owned_caps:
            continue  # attached to its owner table below
        flush_list()
        if kind == "table":
            c = _Chunk(trail())
            c.texts.append(text)
            c.doc_items.append(off)
            c.captions.extend(cap_by_owner.get(off, []))
            chunks.append(c)
            attach = None if hints is not None else c
            continue
        if kind == "caption" and attach is not None:
            attach.captions.append(text)
            continue
        attach = None
        if kind == "picture" or not text:
            continue
        c = _Chunk(trail())
        c.texts.append(text)
        c.doc_items.append(off)
        chunks.append(c)
    flush_list()

    # ---- stage 2: tokenizer-aware split ------------------------------
    sized: List[_Chunk] = []
    for c in chunks:
        if c.total_tokens() <= max_tokens:
            sized.append(c)
            continue
        budget = max(1, max_tokens - c.ctx_tokens())
        # greedy pack whole items first (list chunks have many items)
        pending: List[_Chunk] = []
        run: Optional[_Chunk] = None
        run_tok = 0
        for text, off in zip(c.texts, c.doc_items):
            t = _ntok(text)
            if t > budget:           # single item over budget: window it
                if run is not None:
                    pending.append(run)
                    run, run_tok = None, 0
                toks = _TOKEN_RE.findall(text)
                for w0 in range(0, len(toks), budget):
                    piece = _Chunk(list(c.headings))
                    piece.captions = list(c.captions)
                    piece.texts.append(" ".join(toks[w0:w0 + budget]))
                    piece.doc_items.append(off)
                    pending.append(piece)
                continue
            if run is not None and run_tok + t <= budget:
                run.texts.append(text)
                run.doc_items.append(off)
                run_tok += t
            else:
                if run is not None:
                    pending.append(run)
                run = _Chunk(list(c.headings))
                run.captions = list(c.captions)
                run.texts.append(text)
                run.doc_items.append(off)
                run_tok = t
        if run is not None:
            pending.append(run)
        sized.extend(pending)

    # ---- stage 2b: merge peers --------------------------------------
    if merge_peers:
        merged: List[_Chunk] = []
        for c in sized:
            if (merged
                    and merged[-1].headings == c.headings
                    and merged[-1].captions == c.captions
                    and merged[-1].total_tokens() + sum(
                        _ntok(t) for t in c.texts) <= max_tokens):
                merged[-1].texts.extend(c.texts)
                merged[-1].doc_items.extend(c.doc_items)
            else:
                merged.append(c)
        sized = merged

    return [{"chunk_id": j, "headings": c.headings,
             "captions": c.captions, "text": c.text,
             "doc_items": c.doc_items, "n_tokens": c.total_tokens()}
            for j, c in enumerate(sized)]


def chunk_documents_hier(extracted: DataFrame, *, max_tokens: int = 64,
                         merge_peers: bool = True,
                         spans_col: str = "spans",
                         hints_col: Optional[str] = None) -> DataFrame:
    """(doc_id, spans[, hints]) → one row per chunk.

    ``hints_col`` — optional array<int> column aligned with the span
    array (heading level / caption-owner offset, −1 = none).
    Zero-shuffle: one Arrow-batched pass, one output row set per
    input row."""
    cols = ["doc_id", spans_col] + ([hints_col] if hints_col else [])
    src = extracted.select(*cols)
    has_hints = hints_col is not None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: List[dict] = []
            for row in pdf.itertuples(index=False):
                doc_id = row[0]
                raw = row[1] if row[1] is not None else []
                spans = [s if isinstance(s, dict) else s.asDict()
                         for s in raw]
                hints = None
                if has_hints and row[2] is not None:
                    hints = [None if h is None else int(h)
                             for h in row[2]]
                for ch in hier_chunks(spans, hints,
                                      max_tokens=max_tokens,
                                      merge_peers=merge_peers):
                    ch["doc_id"] = doc_id
                    out.append(ch)
            yield pd.DataFrame(
                out, columns=["doc_id", "chunk_id", "headings",
                              "captions", "text", "doc_items",
                              "n_tokens"])

    return src.mapInPandas(run, schema=CHUNK_DDL)
