"""Fast HTML tokenizer (parsers/dom.py::_fast_feed) — differential
equality against the stdlib html.parser path. The fast path may BAIL
(whole-document fallback) whenever it likes; what it may never do is
produce a different tree than the stdlib builder for the same input.
"""

import glob

import pytest

from docling_spark.parsers import dom


def _stdlib_parse(payload: str) -> dom.Element:
    b = dom._TreeBuilder()
    b.feed(payload)
    b.close()
    return b.root


def _canon(node):
    if isinstance(node, str):
        return ("#text", node, False)
    if isinstance(node, dom.TextNode):
        return ("#text", node.data, node.preformatted)
    return (node.name,
            tuple(sorted(node.attrs.items(),
                         key=lambda kv: (kv[0], kv[1] or ""))),
            tuple(_canon(c) for c in node.children))


FIXTURES = sorted(glob.glob("/root/reference/tests/data/html/*.html"))


@pytest.mark.parametrize("path", FIXTURES,
                         ids=[p.rsplit("/", 1)[1] for p in FIXTURES])
def test_fast_path_matches_stdlib_on_reference_fixtures(path):
    payload = open(path, encoding="utf-8", errors="replace").read()
    b = dom._TreeBuilder()
    dom._fast_feed(b, payload)      # fixtures must NOT bail (perf gate)
    assert _canon(b.root) == _canon(_stdlib_parse(payload))


NASTY = [
    # well-formed subset — fast path must handle these
    '<p class="a" id=b>x &amp; y</p>',
    "<ul><li>a<li>b</ul>",
    "<br/><img src='q.png' alt=>",
    "<script>if (a < b && c) { x = '&amp;'; }</script><p>t</p>",
    "<style>a > b { color: red }</style>ok",
    "<!-- a < b --><div>c</div>",
    "<!DOCTYPE html><html><body>hi</body></html>",
    "<P><B>UPPER</B></P>",
    "<a href=\"x?a=1&amp;b=2\">l</a>",
    "<td rowspan=2 colspan='3'>c</td>",
    "text only, no tags at all",
    "",
    "<div>unclosed",
    "</div>stray end tag",
    "<?php echo 1; ?><p>after pi</p>",
    "<![CDATA[raw < stuff]]><p>after</p>",
    "<img alt= src=x>",
    # outside the subset — fast path bails, public parse must still
    # agree with stdlib by construction
    "<p>a < b</p>",
    "<p a==b>x</p>",
    "<img alt=/>",
    "<img src=x />",
    "<p a='1'b='2'>x</p>",
    "<a href=\"unterminated>x</a>",
    # raw-text (cdata) mode: a '</tag'-prefixed NON-matching end tag
    # is data, not an exit (html.parser checks the tag name)
    "<script>var a='</scriptx>'</script><p>t</p>",
    "<script>a</SCRIPT>b",
    "<script></style></script>x",
    "<style>s{content:'</styles>'}</style>q",
    "<script>x</script >y",
    "<script>x</ script>y",
    "<script>x</script x>y",
    "<p 'loose'>x</p>",
    "<!-- unterminated comment",
    "<script>never closed",
    "< notag>",
    "trailing lt <",
    "<!DOCTYPE html [<!ENTITY x 'y'>]><p>z</p>",
]


@pytest.mark.parametrize("payload", NASTY)
def test_public_parse_always_equals_stdlib(payload):
    assert (_canon(dom.parse_html(payload))
            == _canon(_stdlib_parse(payload)))


def test_fast_subset_does_not_bail():
    # the perf contract: common well-formed markup stays on the fast
    # path (a silent universal bail would pass the equality tests
    # while losing the speedup)
    for payload in NASTY[:13]:
        b = dom._TreeBuilder()
        dom._fast_feed(b, payload)  # raises _Bail on regression


def test_fuzz_fragments_differential():
    # deterministic composition fuzz: every random concatenation of
    # atoms must parse identically via the public path and the stdlib
    import random
    atoms = [
        "<div>", "</div>", "<p class='x'>", "</p>", "text", " ",
        "&amp;", "&", "<br/>", "<!-- c -->", "<script>a<b</script>",
        "<", ">", "'", '"', "<a href=x>", "</a>", "=", "/", "&#65;",
        "<style>p{}</style>", "<!DOCTYPE html>", "<img src='a&b'>",
        "\n", "]]>", "<![CDATA[x]]>", "<?pi?>", "</>", "<>",
        "</scriptx>", "</script>", "<script>", "</script x>",
    ]
    rng = random.Random(42)
    for _ in range(400):
        payload = "".join(rng.choice(atoms)
                          for _ in range(rng.randint(1, 12)))
        assert (_canon(dom.parse_html(payload))
                == _canon(_stdlib_parse(payload))), repr(payload)
