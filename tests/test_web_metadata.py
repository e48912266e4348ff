"""HTML head metadata, feed parsing, URL path templates
(operators/metadata.py, feeds.py, weburl.py::url_path_templates)."""

from pyspark.sql import functions as F

from docling_spark.operators.feeds import parse_feed
from docling_spark.operators.metadata import extract_metadata


def test_extract_metadata_basic():
    html = ('<html><head><title> My  Page </title>'
            '<link rel="canonical" href="https://e.com/p">'
            '<meta name="description" content="a desc">'
            '<meta property="og:title" content="OG title">'
            '<meta property="og:image" content="https://e.com/i.png">'
            '<meta property="og:type" content="article">'
            '<script type="application/ld+json">'
            '{"@type": "Article", "name": "x"}</script>'
            '</head><body><p>body</p></body></html>')
    m = extract_metadata(html)
    assert m["title"] == "My Page"
    assert m["canonical"] == "https://e.com/p"
    assert m["description"] == "a desc"
    assert m["og_title"] == "OG title"
    assert m["og_image"] == "https://e.com/i.png"
    assert m["og_type"] == "article"
    assert m["jsonld_types"] == "Article"
    assert m["n_meta"] == 4


def test_extract_metadata_first_wins_and_missing():
    html = ('<html><head><title>first</title><title>second</title>'
            '<meta name="description" content="d1">'
            '<meta name="Description" content="d2">'
            '<meta property="og:title" content="t1">'
            '<meta property="og:title" content="t2">'
            '</head><body></body></html>')
    m = extract_metadata(html)
    assert m["title"] == "first"
    assert m["description"] == "d1"
    assert m["og_title"] == "t1"
    assert m["canonical"] is None
    assert m["jsonld_types"] == ""


def test_extract_metadata_jsonld_forms():
    # list-of-dict, @graph envelope, @type list, malformed block
    html = ('<html><head>'
            '<script type="application/ld+json">'
            '[{"@type": "Recipe"}, {"@type": ["Product", "Thing"]}]'
            '</script>'
            '<script type="application/ld+json">'
            '{"@graph": [{"@type": "Article"}, {"@type": "Recipe"}]}'
            '</script>'
            '<script type="application/ld+json">not json {</script>'
            '<script>var x = {"@type": "NotLdJson"};</script>'
            '</head><body></body></html>')
    m = extract_metadata(html)
    assert m["jsonld_types"] == "Article|Product|Recipe|Thing"


def test_parse_feed_rss():
    xml = ('<?xml version="1.0"?><rss version="2.0"><channel>'
           '<title>chan</title>'
           '<item><title>A</title><link>https://e.com/a</link>'
           '<pubDate>Mon, 01 Jan 2024 00:00:00 GMT</pubDate></item>'
           '<item><title>B</title><link>https://e.com/b</link></item>'
           '</channel></rss>')
    out = parse_feed(xml)
    assert [e["kind"] for e in out] == ["rss", "rss"]
    assert [e["entry_idx"] for e in out] == [0, 1]
    assert out[0]["url"] == "https://e.com/a"
    assert out[0]["title"] == "A"
    assert out[0]["published"] == "Mon, 01 Jan 2024 00:00:00 GMT"
    assert out[1]["published"] == ""
    # channel <title> must not leak into entry titles
    assert out[1]["title"] == "B"


def test_parse_feed_atom_rel_preference():
    xml = ('<?xml version="1.0"?>'
           '<feed xmlns="http://www.w3.org/2005/Atom">'
           '<title>feed</title>'
           '<entry><title>E1</title>'
           '<link rel="self" href="https://e.com/self"/>'
           '<link href="https://e.com/alt"/>'
           '<updated>2024-01-05T00:00:00Z</updated></entry>'
           '<entry><title>E2</title>'
           '<link rel="enclosure" href="https://e.com/enc"/>'
           '<published>2024-01-06T00:00:00Z</published></entry>'
           '</feed>')
    out = parse_feed(xml)
    assert out[0]["kind"] == "atom"
    # no-rel link defaults to alternate and wins over rel=self
    assert out[0]["url"] == "https://e.com/alt"
    assert out[0]["published"] == "2024-01-05T00:00:00Z"
    # no alternate at all: first link is the fallback
    assert out[1]["url"] == "https://e.com/enc"
    assert out[1]["published"] == "2024-01-06T00:00:00Z"


def test_parse_feed_unknown_root():
    assert parse_feed("<html><body><item><link>x</link></item>"
                      "</body></html>") == []


def test_feed_urls_spark_roundtrip(spark):
    from docling_spark.operators.feeds import feed_urls
    rss = ('<rss version="2.0"><channel><item><title>t</title>'
           '<link>https://e.com/1</link></item></channel></rss>')
    df = spark.createDataFrame(
        [("f1", rss), ("f2", "<garbage/>"), ("f3", None)],
        "feed_id string, xml string")
    rows = feed_urls(df).collect()
    assert len(rows) == 1
    assert rows[0].feed_id == "f1" and rows[0].url == "https://e.com/1"


def test_html_metadata_spark_null_row(spark):
    from docling_spark.operators.metadata import html_metadata
    df = spark.createDataFrame(
        [("d1", "<html><head><title>t</title></head></html>"),
         ("d2", None)],
        "doc_id string, html string")
    rows = {r.doc_id: r for r in html_metadata(df).collect()}
    assert rows["d1"].title == "t"
    assert rows["d2"].title is None and rows["d2"].n_meta is None
    assert len(rows) == 2  # NULL html keeps its row


def test_url_path_templates(spark):
    from docling_spark.operators.weburl import url_path_templates
    urls = [
        "https://www.shop.com/product/123",
        "https://shop.com:443/product/4567?utm=x",
        "https://shop.com/product/123/reviews",
        "https://cdn.com/a/0123456789abcdef0123/img",
        "https://cdn.com/about",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = {(r.host, r.template): r
            for r in url_path_templates(df).collect()}
    assert rows[("shop.com", "/product/{n}")].n_urls == 2
    assert rows[("shop.com", "/product/{n}")].n_params == 1
    assert rows[("shop.com", "/product/{n}/reviews")].n_urls == 1
    assert rows[("cdn.com", "/a/{h}/img")].n_params == 1
    assert rows[("cdn.com", "/about")].n_params == 0


def test_extract_metadata_robots():
    from docling_spark.operators.metadata import extract_metadata
    html = ('<html><head>'
            '<meta name="ROBOTS" content="NOINDEX, nofollow">'
            '</head><body></body></html>')
    assert extract_metadata(html)["robots_meta"] == "NOINDEX, nofollow"
    assert extract_metadata("<html></html>")["robots_meta"] is None


def test_noindex_gate(spark):
    from docling_spark.operators.metadata import noindex_gate
    docs = spark.createDataFrame(
        [("keep", "<html><head></head><body>x</body></html>"),
         ("drop", '<html><head><meta name="robots" '
                  'content="a, NoIndex ,b"></head></html>'),
         ("keep2", '<html><head><meta name="robots" '
                   'content="noindexish"></head></html>')],
        "doc_id string, html string")
    kept = {r.doc_id for r in noindex_gate(docs).collect()}
    assert kept == {"keep", "keep2"}  # token match, not substring


def test_hreflang_links(spark):
    from docling_spark.operators.metadata import hreflang_links
    html = ('<html><head>'
            '<link rel="alternate" hreflang="en" href="/en">'
            '<link rel="stylesheet" href="/css">'
            '<link rel="ALTERNATE" hreflang="fr-CA" href="/fr">'
            '<link rel="alternate" href="/no-lang">'
            '</head></html>')
    df = spark.createDataFrame([("d", html)], "doc_id string, html string")
    rows = hreflang_links(df).collect()
    assert [(r.alt_idx, r.hreflang, r.href) for r in rows] == [
        (0, "en", "/en"), (1, "fr-CA", "/fr")]


def test_robots_sitemaps(spark):
    from docling_spark.operators.weburl import robots_sitemaps
    txt = ("# header comment\n"
           "User-agent: *\n"
           "Disallow: /x\n"
           "  Sitemap: https://e.com/a.xml   # trailing\n"
           "sitemap:https://e.com/b.xml\n"
           "Sitemapish: https://e.com/decoy.xml\n")
    df = spark.createDataFrame([("e.com", txt), ("f.com", "none here")],
                               "host string, robots_txt string")
    rows = robots_sitemaps(df).collect()
    assert [(r.host, r.sm_idx, r.sitemap_url) for r in rows] == [
        ("e.com", 0, "https://e.com/a.xml"),
        ("e.com", 1, "https://e.com/b.xml")]
