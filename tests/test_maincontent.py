"""Main-content extraction (DOM boilerplate stripping): rule-level
unit tests, behavior on the real Wikipedia fixture, and the Spark
operator driven through mapInPandas."""

from pyspark.sql import functions as F

from docling_spark.golden import fixture_payload
from docling_spark.parsers.boilerplate import (
    classify_blocks,
    strip_boilerplate,
)

PAGE = """<html><body>
<nav><a href="#">Home</a> <a href="#">About</a></nav>
<div class="sidebar"><p>promo box click here today</p></div>
<p>MAIN this is a long enough paragraph of real prose content.</p>
<p><a href="#">first link</a> <a href="#">second link</a> also</p>
<p>tiny <a href="#">x</a></p>
<footer>copyright footer 2026</footer>
</body></html>"""


def test_rule_chain_verdicts():
    verdicts = [(b["tag"], b["verdict"]) for b in classify_blocks(PAGE)]
    assert verdicts == [
        ("nav", "furniture"),
        ("p", "furniture"),      # hinted sidebar ancestor
        ("p", "kept"),
        ("p", "link_density"),
        ("p", "short_link"),
        ("footer", "furniture"),
    ]
    out = strip_boilerplate(PAGE)
    assert out["text"].startswith("MAIN ")
    assert out["n_kept"] == 1 and out["n_dropped"] == 5
    # 31 linked chars over 90 boilerplate + 59 main-block judged chars
    assert out["doc_link_density_e4"] == (31 * 10000) // (90 + 59)


def test_text_density_rule_drops_tag_soup():
    html = ("<html><body><div><span>a</span><span>b</span>"
            "<span>c</span><b>d</b></div>"
            "<p>a real paragraph with plenty of prose in it</p>"
            "</body></html>")
    by_tag = {b["tag"]: b["verdict"] for b in classify_blocks(html)}
    assert by_tag["div"] == "text_density"
    assert by_tag["p"] == "kept"


def test_content_anchor_shields_hinted_wrappers():
    # a skin-flag class on <html> and a hinted wrapper OUTSIDE <main>
    # must not poison article content INSIDE <main>; a hinted node
    # inside the anchor still drops
    html = ('<html class="vector-feature-sticky-header-enabled">'
            '<body><div class="page-header"><p>site chrome text here'
            '</p></div>'
            '<main><p>the article body prose which is long enough to '
            'pass the length gate</p>'
            '<div class="related"><p>related links promo text here'
            '</p></div></main></body></html>')
    verdicts = [(b["text"][:12], b["verdict"])
                for b in classify_blocks(html)]
    assert verdicts == [
        ("site chrome ", "furniture"),
        ("the article ", "kept"),
        ("related link", "furniture"),
    ]


def test_wiki_fixture_strips_chrome_keeps_prose():
    duck = fixture_payload("wiki_duck.html")
    out = strip_boilerplate(duck)
    assert out["n_kept"] > 50              # real prose survives
    assert out["n_dropped"] > out["n_kept"]  # wiki chrome dominates
    assert "Jump to content" not in out["text"]       # top nav
    assert "Creative Commons" not in out["text"]      # license footer
    assert "true ducks" in out["text"]                # body prose


def test_operator_filters_before_python_and_matches_local(spark):
    from docling_spark.operators.maincontent import extract_main_content
    from docling_spark.schema import INPUT_SCHEMA

    rows = [(f"d{i}", [("html", PAGE, "", 0)]) for i in range(4)]
    rows.append(("nohtml", [("md", "# just markdown", "", 0)]))
    corpus = spark.createDataFrame(rows, schema=INPUT_SCHEMA)
    out = extract_main_content(corpus)
    got = {r["doc_id"]: r for r in out.collect()}
    assert set(got) == {f"d{i}" for i in range(4)}  # no-html filtered
    want = strip_boilerplate(PAGE)
    assert got["d0"]["text"] == want["text"]
    assert got["d0"]["n_dropped"] == want["n_dropped"]
    assert got["d0"]["doc_link_density_e4"] == want["doc_link_density_e4"]
    # the no-html filter runs in Catalyst, below the Python node (the
    # plan string prints root-first, so "below" = later in the string)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Filter" in plan.split("MapInPandas", 1)[1]
