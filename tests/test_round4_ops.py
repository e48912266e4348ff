"""Round-4 operator surface: spatial text query, HTML table-cell
relation, outline, sampling/splits, robots gate, bigram entropy —
edge cases the registry templates don't reach."""

import math

from pyspark.sql import functions as F


def _cells(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id string, page_no int, cell_index int, "
              "text string, l double, t double, r double, b double")


def test_text_in_rect_half_overlap_threshold(spark):
    from docling_spark.operators.extract import text_in_rect
    cells = _cells(spark, [
        ("d", 0, 0, "in", 0.0, 0.0, 10.0, 10.0),       # fully inside
        ("d", 0, 1, "edge", 5.0, 0.0, 15.0, 10.0),     # exactly half
        ("d", 0, 2, "mostly", 4.0, 0.0, 14.0, 10.0),   # 60% inside
        ("d", 0, 3, "out", 20.0, 0.0, 30.0, 10.0),
    ])
    rects = spark.createDataFrame(
        [(0, "d", 0, 0.0, 0.0, 10.0, 10.0)],
        "rect_id int, doc_id string, page_no int, "
        "l double, t double, r double, b double")
    out = text_in_rect(cells, rects).collect()
    # reference rule is STRICTLY more than half the cell's area:
    # the exactly-half cell is excluded, cell order is preserved
    assert [(r["rect_id"], r["text"]) for r in out] == [(0, "in mostly")]


def test_text_in_rect_empty_rect_row_present(spark):
    from docling_spark.operators.extract import text_in_rect
    cells = _cells(spark, [("d", 0, 0, "x", 0.0, 0.0, 1.0, 1.0)])
    rects = spark.createDataFrame(
        [(7, "d", 0, 50.0, 50.0, 60.0, 60.0),
         (8, "other", 0, 0.0, 0.0, 9.0, 9.0)],
        "rect_id int, doc_id string, page_no int, "
        "l double, t double, r double, b double")
    got = {r["rect_id"]: r["text"]
           for r in text_in_rect(cells, rects).collect()}
    assert got == {7: "", 8: ""}


def test_html_table_cells_nested_table_skipped(spark):
    from docling_spark.operators.tables import html_table_cells
    html = ("<html><body>"
            "<table><tr><td><table><tr><td>inner</td></tr></table>"
            "</td></tr></table>"               # nested → outer skipped
            "<table><tr><td>solo</td></tr></table>"
            "</body></html>")
    df = spark.createDataFrame(
        [("d", [{"kind": "html", "text": html, "media_ref": "",
                 "offset": 0}])],
        "doc_id string, spans array<struct<kind string, text string, "
        "media_ref string, offset int>>")
    rows = html_table_cells(df).collect()
    # the nested-outer table is skipped like the reference
    # (html_backend.py:376-379); the INNER standalone grid and the
    # second table still parse
    texts = sorted(r["text"] for r in rows)
    assert texts == ["inner", "solo"]
    assert all(r["num_rows"] == 1 and r["num_cols"] == 1 for r in rows)


def test_reservoir_sample_deterministic_and_weighted(spark):
    from docling_spark.operators.sampling import \
        reservoir_sample_per_source
    rows = [(f"d{i:03d}", "a", 1 if i < 90 else 1000)
            for i in range(100)]
    docs = spark.createDataFrame(
        rows, "doc_id string, source string, w long")
    got1 = sorted(r["doc_id"] for r in reservoir_sample_per_source(
        docs, k=10, weight_col="w").collect())
    got2 = sorted(r["doc_id"] for r in reservoir_sample_per_source(
        docs, k=10, weight_col="w").collect())
    assert got1 == got2 and len(got1) == 10          # deterministic
    # the 10 heavy docs (w=1000, 10% of rows) must dominate the sample
    heavy = sum(1 for d in got1 if int(d[1:]) >= 90)
    assert heavy >= 7
    # different salt → different draw (k=5 of the 10 heavy docs, so
    # the chosen subset varies with the salt)
    got_a = sorted(r["doc_id"] for r in reservoir_sample_per_source(
        docs, k=5, weight_col="w").collect())
    got_b = sorted(r["doc_id"] for r in reservoir_sample_per_source(
        docs, k=5, weight_col="w", salt="s2").collect())
    assert got_a != got_b


def test_reservoir_sample_uniform_without_weight(spark):
    from docling_spark.operators.sampling import \
        reservoir_sample_per_source
    docs = spark.createDataFrame(
        [(f"d{i}", "s") for i in range(50)],
        "doc_id string, source string")
    out = reservoir_sample_per_source(docs, k=5).collect()
    assert len(out) == 5
    assert [r["rank"] for r in sorted(out, key=lambda r: r["rank"])] \
        == [1, 2, 3, 4, 5]


def test_stratified_split_stable_and_proportional(spark):
    from docling_spark.operators.sampling import stratified_split
    docs = spark.createDataFrame(
        [(f"d{i}", "s") for i in range(2000)],
        "doc_id string, source string")
    out = {r["doc_id"]: r["split"]
           for r in stratified_split(docs).collect()}
    frac_train = sum(1 for v in out.values() if v == "train") / 2000
    assert 0.96 <= frac_train <= 0.995
    # growth stability: adding docs never reassigns existing ones
    grown = spark.createDataFrame(
        [(f"d{i}", "s") for i in range(3000)],
        "doc_id string, source string")
    out2 = {r["doc_id"]: r["split"]
            for r in stratified_split(grown).collect()}
    assert all(out2[k] == v for k, v in out.items())


def test_robots_gate_longest_match_and_default_allow(spark):
    from docling_spark.operators.weburl import robots_gate
    docs = spark.createDataFrame(
        [("1", "https://a.com/private/x"),
         ("2", "https://a.com/private/ok/x"),   # re-allowed subtree
         ("3", "https://a.com/pub"),            # no matching rule
         ("4", "https://b.com/private/x"),      # unruled host
         ("5", "https://A.COM:443/private/y")], # host normalization
        "doc_id string, url string")
    rules = spark.createDataFrame(
        [("a.com", "/private", 0), ("a.com", "/private/ok", 1)],
        "host string, path_prefix string, allow int")
    kept = {r["doc_id"] for r in robots_gate(docs, rules).collect()}
    assert kept == {"2", "3", "4"}


def test_robots_gate_tie_breaks_toward_allow(spark):
    from docling_spark.operators.weburl import robots_gate
    docs = spark.createDataFrame(
        [("1", "https://a.com/p/x")], "doc_id string, url string")
    rules = spark.createDataFrame(
        [("a.com", "/p", 0), ("a.com", "/p", 1)],
        "host string, path_prefix string, allow int")
    assert robots_gate(docs, rules).count() == 1


def test_domain_mix_report_shares_sum(spark):
    from docling_spark.operators.weburl import domain_mix_report
    docs = spark.createDataFrame(
        [("1", "https://x.a.com/p", "one two"),
         ("2", "https://a.com/q", "three"),
         ("3", "https://b.org/r", "four five six")],
        "doc_id string, url string, text string")
    out = {r["domain"]: r for r in domain_mix_report(docs).collect()}
    assert out["a.com"]["n_docs"] == 2
    assert out["a.com"]["n_tokens"] == 3
    assert out["b.org"]["token_share_e4"] == 5000


def test_source_bigram_entropy_matches_direct(spark):
    from docling_spark.operators.textstats import source_bigram_entropy
    docs = spark.createDataFrame(
        [(1, "rep", "a b a b a b a b"),
         (2, "div", "q w e r t y u i")],
        "doc_id long, source string, text string")
    out = {r["source"]: r for r in
           source_bigram_entropy(docs).collect()}
    # 'rep': bigrams (a,b)x4, (b,a)x3 — next is fully determined by
    # prev, H = 0 exactly
    assert out["rep"]["cond_entropy_e6"] == 0
    assert out["rep"]["n_bigrams"] == 7
    # 'div': 7 distinct bigrams, each prev seen once → every term
    # ln(1/1)=0 → H = 0 too; extend with a branching prev
    docs2 = spark.createDataFrame(
        [(1, "s", "x a x b")], "doc_id long, source string, text string")
    got = source_bigram_entropy(docs2).collect()[0]
    # bigrams: (x,a),(a,x),(x,b); c_x=2 → two terms ln(1/2)
    num = 2 * math.floor(1_000_000 * 1 * math.log(0.5))
    assert got["cond_entropy_e6"] == math.floor(-num / 3)


def test_single_token_docs_contribute_no_bigrams(spark):
    from docling_spark.operators.textstats import source_bigram_entropy
    docs = spark.createDataFrame(
        [(1, "s", "only"), (2, "s", "a b")],
        "doc_id long, source string, text string")
    got = source_bigram_entropy(docs).collect()[0]
    assert got["n_bigrams"] == 1


def test_heading_outline_title_resets_trail(spark):
    from docling_spark.operators.outline import heading_outline

    def sp(kind, text, off):
        return {"kind": kind, "text": text, "media_ref": "",
                "offset": off}

    df = spark.createDataFrame(
        [("d", [sp("title", "T", 0), sp("section_header", "A", 1),
                sp("title", "T2", 2), sp("section_header", "B", 3)])],
        "doc_id string, spans array<struct<kind string, text string, "
        "media_ref string, offset int>>")
    rows = sorted(heading_outline(df).collect(),
                  key=lambda r: r["span_offset"])
    assert [(r["title"], r["path"]) for r in rows] == [
        ("T", "T"), ("A", "T > A"), ("T2", "T2"), ("B", "T2 > B")]


# --- OCR region planning / reconciliation as Spark stages -----------


def _plan_src(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id string, width double, height double, "
              "rects array<struct<l double, t double, r double, "
              "b double>>")


def test_plan_ocr_empty_rects_sentinel(spark):
    from docling_spark.operators.render import plan_ocr
    out = plan_ocr(_plan_src(spark, [("d", 100.0, 100.0, [])])).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["region_id"], r["n_regions"], r["coverage_e4"]) == (-1, 0, 0)


def test_plan_ocr_three_decisions(spark):
    from docling_spark.operators.render import plan_ocr
    out = plan_ocr(_plan_src(spark, [
        # full-page: coverage 1.0 > 0.75
        ("full", 100.0, 100.0, [(0.0, 0.0, 99.0, 99.0)]),
        # component boxes: one 30x30 rect dilated to 49x49 on 200x200
        # (dilation reach: -10 rows/cols before, +9 after)
        ("comp", 200.0, 200.0, [(50.0, 50.0, 79.0, 79.0)]),
        # below area threshold: 2x2 rect dilated to 21x21 on 300x300
        ("none", 300.0, 300.0, [(150.0, 150.0, 151.0, 151.0)]),
    ])).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    full, = by_doc["full"]
    assert (full["l"], full["t"], full["r"], full["b"]) == (0, 0, 100, 100)
    assert full["coverage_e4"] == 10000
    comp, = by_doc["comp"]
    assert (comp["l"], comp["t"], comp["r"], comp["b"]) == (40, 40, 88, 88)
    assert comp["n_regions"] == 1
    none, = by_doc["none"]
    assert none["region_id"] == -1 and none["n_regions"] == 0
    # 21x21 dilated px on 90000 → 49 e4-units
    assert none["coverage_e4"] == 49


def _rec_src(spark, rows):
    cell_t = ("array<struct<l double, t double, r double, b double, "
              "text string>>")
    return spark.createDataFrame(
        rows, f"doc_id string, prog {cell_t}, ocr {cell_t}")


def test_reconcile_ocr_no_programmatic_keeps_all(spark):
    from docling_spark.operators.render import reconcile_ocr
    ocr = [(0.0, 0.0, 5.0, 5.0, "a"), (10.0, 10.0, 15.0, 15.0, "b")]
    out = reconcile_ocr(_rec_src(spark, [("d", [], ocr)])).collect()
    assert [(r["cell_rank"], r["origin"], r["text"]) for r in
            sorted(out, key=lambda r: r["cell_rank"])] == [
        (0, "ocr", "a"), (1, "ocr", "b")]


def test_reconcile_ocr_touching_edges_intersect(spark):
    from docling_spark.operators.render import reconcile_ocr
    # shares only the x=10 edge with prog → still dropped (<=, not <)
    out = reconcile_ocr(_rec_src(spark, [
        ("d", [(0.0, 0.0, 10.0, 10.0, "P")],
         [(10.0, 0.0, 20.0, 10.0, "edge"),
          (10.1, 0.0, 20.0, 10.0, "clear")]),
    ])).collect()
    texts = [r["text"] for r in sorted(out, key=lambda r: r["cell_rank"])]
    assert texts == ["P", "clear"]


# --- OMML → LaTeX as a standalone Spark stage -----------------------


def test_omml_equations_bare_root_and_order(spark):
    from docling_spark.operators.enrich import omml_equations
    ns = 'xmlns:m="http://schemas.openxmlformats.org/officeDocument/2006/math"'
    bare = (f"<m:oMath {ns}><m:f><m:num><m:r><m:t>1</m:t></m:r></m:num>"
            "<m:den><m:r><m:t>2</m:t></m:r></m:den></m:f></m:oMath>")
    para = (f"<m:oMathPara {ns}>"
            "<m:oMath><m:r><m:t>first</m:t></m:r></m:oMath>"
            "<m:oMath><m:sSup><m:e><m:r><m:t>z</m:t></m:r></m:e>"
            "<m:sup><m:r><m:t>2</m:t></m:r></m:sup></m:sSup></m:oMath>"
            f"</m:oMathPara>")
    df = spark.createDataFrame([("a", bare), ("b", para)],
                               "doc_id string, omml string")
    rows = sorted(omml_equations(df).collect(),
                  key=lambda r: (r["doc_id"], r["eq_no"]))
    assert [(r["doc_id"], r["eq_no"], r["latex"]) for r in rows] == [
        ("a", 0, "\\frac{1}{2}"),
        ("b", 0, "first"),
        ("b", 1, "z^{2}"),
    ]


# --- span-aware table structure (TableFormer stand-in) --------------


def _tcell(l, t, r, b, text):
    return (float(l), float(t), float(r), float(b), text)


def _struct_src(spark, rows):
    cell_t = ("array<struct<l double, t double, r double, b double, "
              "text string>>")
    return spark.createDataFrame(rows, f"doc_id string, cells {cell_t}")


def test_table_grid_with_spans_merged_header():
    from docling_spark.parsers.pdf_page import Cell, table_grid_with_spans
    cells = [Cell(0, "H", 0, 0, 100, 10),
             Cell(1, "a", 0, 20, 30, 30), Cell(2, "b", 35, 20, 65, 30),
             Cell(3, "c", 70, 20, 100, 30),
             Cell(4, "d", 0, 40, 65, 50), Cell(5, "e", 70, 40, 100, 50)]
    data = table_grid_with_spans(cells)
    assert (data.num_rows, data.num_cols) == (3, 3)
    by = {(c.start_row, c.start_col): c for c in data.cells}
    assert by[(0, 0)].col_span == 3 and by[(0, 0)].column_header
    assert by[(2, 0)].col_span == 2 and by[(2, 0)].row_span == 1
    assert by[(1, 1)].col_span == 1
    assert (2, 1) not in by          # covered by the d span


def test_table_grid_with_spans_vertical_merge():
    from docling_spark.parsers.pdf_page import Cell, table_grid_with_spans
    # V bridges rows 1-2 on the right; anchor-based rows survive the
    # bridged gutter (projection-gap rows would collapse to one row)
    cells = [Cell(0, "a", 0, 20, 30, 30), Cell(1, "v", 70, 20, 100, 50),
             Cell(2, "d", 0, 40, 30, 50)]
    data = table_grid_with_spans(cells)
    assert data.num_rows == 2
    by = {(c.start_row, c.start_col): c for c in data.cells}
    assert by[(0, 1)].row_span == 2
    assert by[(1, 0)].row_span == 1


def test_pdf_table_structure_operator(spark):
    from docling_spark.operators.tables import pdf_table_structure
    rows = [("d", [_tcell(0, 0, 100, 10, "H"),
                   _tcell(0, 20, 30, 30, "a"),
                   _tcell(35, 20, 65, 30, "b")])]
    out = pdf_table_structure(_struct_src(spark, rows)).collect()
    got = {(r["start_row"], r["start_col"]):
           (r["row_span"], r["col_span"], r["column_header"], r["text"])
           for r in out}
    assert got[(0, 0)] == (1, 2, 1, "H")
    assert got[(1, 0)] == (1, 1, 0, "a")
    assert got[(1, 1)] == (1, 1, 0, "b")
    assert all(r["num_rows"] == 2 and r["num_cols"] == 2 for r in out)


# --- iterative BPE trainer ------------------------------------------


def test_bpe_train_greedy_disjoint_and_order(spark):
    from docling_spark.operators.bpe import bpe_train
    df = spark.createDataFrame(
        [(["a", "b", "a", "b"],), (["a", "b", "a", "b", "a", "b"],)],
        "tokens array<string>")
    merges = bpe_train(df, rounds=5)
    # r1: "a b" count 2+3=5 ; r2: "ab ab" 1+2=3 (greedy: [ab]*3 →
    # [abab, ab], never [ab, abab]) ; r3: "abab ab" on the odd doc;
    # r4: no adjacent pairs remain → early stop
    assert merges == [("a b", 5), ("ab ab", 3), ("abab ab", 1)]


def test_bpe_train_tie_breaks_lexicographic(spark):
    from docling_spark.operators.bpe import bpe_train
    df = spark.createDataFrame([(["b", "c"],), (["a", "b"],)],
                               "tokens array<string>")
    merges = bpe_train(df, rounds=1)
    assert merges == [("a b", 1)]


def test_bpe_train_stops_when_no_pairs(spark):
    from docling_spark.operators.bpe import bpe_train
    df = spark.createDataFrame([(["x"],), ([],)], "tokens array<string>")
    assert bpe_train(df, rounds=3) == []


def test_bpe_encode_applies_in_rank_order(spark):
    from docling_spark.operators.bpe import bpe_encode, bpe_train
    df = spark.createDataFrame(
        [(["a", "b", "a", "b"],), (["a", "b", "a", "b", "a", "b"],),
         (["a", "c", "b"],)],
        "tokens array<string>")
    merges = bpe_train(df.limit(2), rounds=3)
    out = {tuple(r["tokens"]): r["bpe_tokens"]
           for r in bpe_encode(df, merges).collect()}
    assert out[("a", "b", "a", "b")] == ["abab"]
    # merge 3 ("abab ab") then coalesces the greedy leftover
    assert out[("a", "b", "a", "b", "a", "b")] == ["ababab"]
    # merges only fire on ADJACENT learned pairs — 'c' blocks them
    assert out[("a", "c", "b")] == ["a", "c", "b"]


def test_omml_equations_malformed_xml_sentinel(spark):
    from docling_spark.operators.enrich import omml_equations
    df = spark.createDataFrame([("bad", "<m:oMath><unclosed")],
                               "doc_id string, omml string")
    rows = omml_equations(df).collect()
    assert [(r["doc_id"], r["eq_no"], r["latex"]) for r in rows] == [
        ("bad", -1, None)]


def test_bpe_train_drops_null_and_empty_symbols(spark):
    from docling_spark.operators.bpe import bpe_train
    df = spark.createDataFrame(
        [(["a", None, "", "b"],), (["a", "b"],)],
        "tokens array<string>")
    # post-filter both docs are [a, b]: one merge, count 2 — a NULL
    # pair key must never win the argmax and crash pair.split
    assert bpe_train(df, rounds=2) == [("a b", 2)]
