"""Hyperlink extraction + outlink host graph (operators/links.py)."""

from docling_spark.operators.links import extract_links


def test_extract_links_basic():
    html = ('<html><body>'
            '<a href="https://a.com/x">first</a>'
            '<a name="no-href">skip me</a>'
            '<a href="/rel" rel="NoFollow external">second</a>'
            '</body></html>')
    out = extract_links(html, "https://base.com/dir/page.html")
    assert len(out) == 2
    assert out[0]["href"] == "https://a.com/x"
    assert out[0]["url"] == "https://a.com/x"
    assert out[0]["anchor"] == "first"
    assert out[0]["nofollow"] == 0
    # rel is lowercased; multi-token rel still flags nofollow
    assert out[1]["rel"] == "nofollow external"
    assert out[1]["nofollow"] == 1
    # root-relative resolution
    assert out[1]["url"] == "https://base.com/rel"


def test_extract_links_relative_resolution():
    base = "https://h.com/a/b/page.html"
    cases = {
        "sub.html": "https://h.com/a/b/sub.html",
        "../up.html": "https://h.com/a/up.html",
        "?q=1": "https://h.com/a/b/page.html?q=1",
        "#frag": "https://h.com/a/b/page.html#frag",
        "//other.com/p": "https://other.com/p",
    }
    html = "".join(f'<a href="{h}">x</a>' for h in cases)
    out = extract_links(f"<html><body>{html}</body></html>", base)
    assert [l["url"] for l in out] == list(cases.values())


def test_extract_links_nested_anchor_text():
    html = ('<html><body><a href="/x">  click <b>here</b>\n now '
            '</a></body></html>')
    out = extract_links(html, None)
    assert out[0]["anchor"] == "click here now"
    assert out[0]["url"] == "/x"  # no base: href passes through


def test_html_links_df(spark):
    from docling_spark.operators.links import (html_links,
                                               outlink_host_graph)
    df = spark.createDataFrame(
        [("d1", '<html><body><a href="https://x.com/1">one</a>'
                '<a href="/r" rel="nofollow">two</a></body></html>',
          "https://s.com/p"),
         ("d2", "<html><body>no links</body></html>",
          "https://s.com/p"),
         ("d3", None, "https://s.com/p")],
        "doc_id string, html string, base_url string")
    links = html_links(df, base_col="base_url")
    rows = links.collect()
    assert {r["doc_id"] for r in rows} == {"d1"}
    by_idx = {r["link_idx"]: r for r in rows}
    assert by_idx[0]["url"] == "https://x.com/1"
    assert by_idx[1]["url"] == "https://s.com/r"
    assert by_idx[1]["nofollow"] == 1

    g = {(r["src_host"], r["dst_host"]): r
         for r in outlink_host_graph(links).collect()}
    assert g[("s.com", "x.com")]["n_links"] == 1
    assert g[("s.com", "x.com")]["n_nofollow"] == 0
    assert g[("s.com", "s.com")]["n_nofollow"] == 1


def test_anchor_text_index(spark):
    from docling_spark.operators.links import anchor_text_index
    rows = [
        (1, "https://a.com/x", "Click Here"),
        (2, "https://a.com/y", "click  again"),
        (2, "https://b.com/z", "B Site"),
        (3, "https://a.com/x", "here"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, url string, anchor string")
    got = {(r["dst_host"], r["term"]): (r["n_links"], r["n_docs"])
           for r in anchor_text_index(df).collect()}
    assert got[("a.com", "click")] == (2, 2)
    assert got[("a.com", "here")] == (2, 2)
    assert got[("a.com", "again")] == (1, 1)
    assert got[("b.com", "site")] == (1, 1)
