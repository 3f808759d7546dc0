"""HTML extraction tests: crafted-markup semantics, a faithful Python
regex twin over the documents table, and the plain-text passthrough
contract (html_extract must be the identity + zero links on tag-free
text, so it can sit in front of any corpus without a format probe)."""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

from lightning_metastore_spark.functions.html import (  # noqa: E402
    html_extract,
)

from tests.conftest import SF_DIR  # noqa: E402

_BLOCKS = (
    r"(?is)<script\b[^>]*>.*?</script>",
    r"(?is)<style\b[^>]*>.*?</style>",
    r"(?s)<!--.*?-->",
)
_HEAD = r"(?is)<head\b[^>]*>.*?</head>"
_NAMED = (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
          ("&apos;", "'"), ("&#39;", "'"), ("&#34;", '"'),
          ("&nbsp;", " "))


def _decode(s: str) -> str:
    for ent, ch in _NAMED:
        s = s.replace(ent, ch)
    s = re.sub(r"&(?!amp;)#?[a-zA-Z0-9]{1,8};", " ", s)
    return s.replace("&amp;", "&")


def _flatten(s: str) -> str:
    s = re.sub(r"(?s)<[^>]*>", " ", s)
    return re.sub(r"\s+", " ", _decode(s)).strip()


def twin(text: str) -> dict:
    """Pure-Python model of html_extract's per-row contract."""
    src = text or ""
    stripped = src
    for pat in _BLOCKS:
        stripped = re.sub(pat, " ", stripped)
    m = re.search(r"(?is)<title\b[^>]*>(.*?)</title>", stripped)
    title = _flatten(m.group(1)) if m else ""
    body = re.sub(_HEAD, " ", stripped)
    clean = _flatten(body)
    anchors = re.findall(r"(?is)<a\b[^>]*>(.*?)</a>", body)
    anchor_chars = sum(len(_flatten(a)) for a in anchors)
    n_chars = len(clean)
    return {"title": title, "clean_text": clean, "n_chars": n_chars,
            "n_links": len(anchors),
            "link_density": round(anchor_chars / max(1, n_chars), 6)}


_PAGE = ("<html><head><title> My &amp; Page </title>"
         "<style>p{color:red}</style></head>"
         "<body><h1>Hello&nbsp;world</h1><p>the escape is &amp;lt; "
         "literally</p><a href='/a'>nav one</a>"
         "<script>var x = '<p>not text</p>';</script>"
         "<!-- hidden <a>ghost</a> comment --><a>two</a></body></html>")


def test_html_extract_crafted_semantics(spark):
    docs = spark.createDataFrame(
        [(1, _PAGE), (2, "plain text doc AT&T a&b"), (3, None)],
        "doc_id long, text string")
    rows = {r.doc_id: r for r in html_extract(docs).collect()}

    p = rows[1]
    assert p.title == "My & Page"
    # head/script/comment content gone; &amp;lt; stays literal "&lt;"
    assert p.clean_text == ("Hello world the escape is &lt; literally "
                            "nav one two")
    assert "not text" not in p.clean_text and "ghost" not in p.clean_text
    assert p.n_links == 2
    anchor_len = len("nav one") + len("two")
    assert p.link_density == round(anchor_len / p.n_chars, 6)

    # passthrough: tag-free text is untouched (bare & is not an entity)
    assert rows[2].clean_text == "plain text doc AT&T a&b"
    assert rows[2].n_links == 0 and rows[2].link_density == 0.0
    assert rows[3].clean_text == "" and rows[3].n_chars == 0


def test_html_extract_matches_python_twin(spark):
    """Java-regex and Python-re evaluations of the documented pipeline
    agree on crafted markup AND on the whole documents table."""
    crafted = [
        (10, _PAGE),
        (11, "<p>unclosed <a href=x>link text"),          # no </a>
        (12, "a < b and c > d"),                          # bare angle
        (13, "<A HREF='/x'>CASE</A><TITLE>up</TITLE>"),   # case-insens
        (14, "x &unknown; y &#x1F600; z &#9731;"),        # entity sweep
        (15, "<a>one</a><a>two</a><a>three</a>"),
    ]
    docs = spark.createDataFrame(crafted, "doc_id long, text string")
    got = {r.doc_id: r for r in html_extract(docs).collect()}
    for i, txt in crafted:
        exp = twin(txt)
        r = got[i]
        for k, v in exp.items():
            assert getattr(r, k) == v, (i, k, getattr(r, k), v)

    real = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .orderBy("doc_id").limit(60))
    got = html_extract(real).orderBy("doc_id").collect()
    src = {r.doc_id: r.text for r in real.collect()}
    for r in got:
        exp = twin(src[r.doc_id])
        assert (r.clean_text, r.n_links, r.link_density) == \
            (exp["clean_text"], exp["n_links"], exp["link_density"])


def test_html_extract_plan_is_map_only(spark):
    """No exchange, no Python eval: one codegen'd projection."""
    docs = spark.createDataFrame([(1, _PAGE)], "doc_id long, text string")
    plan = html_extract(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


# ---------------------------------------------------------------------------
# URL canonicalization + url_dedup
# ---------------------------------------------------------------------------

def _twin_canon(u: str) -> str:
    import re as _re
    u = u.strip()
    m = _re.match(r"^(?:([^:/?#]+):)?(?://([^/?#]*))?([^?#]*)(?:\?([^#]*))?",
                  u)
    scheme = (m.group(1) or "").lower()
    auth = (m.group(2) or "").lower()
    path = m.group(3) or ""
    query = m.group(4) or ""
    if scheme == "http":
        auth = _re.sub(r":80$", "", auth)
    elif scheme == "https":
        auth = _re.sub(r":443$", "", auth)
    track = {"fbclid", "gclid", "msclkid", "mc_eid", "igshid",
             "ref", "ref_src", "spm"}

    def keep(p):
        k = p.split("=")[0].lower()
        return p != "" and not k.startswith("utm_") and k not in track

    q = "&".join(sorted(p for p in query.split("&") if keep(p)))
    if path == "/" and q == "":
        path = ""
    return ((scheme + ":" if scheme else "")
            + ("//" + auth if auth else "")
            + path + ("?" + q if q else ""))


URLS = [
    "HTTPS://Example.COM:443/Path/?b=2&utm_source=x&a=1#frag",
    "http://a.com/",
    "http://a.com/?utm_campaign=1",
    "http://a.com:80/x",
    "http://a.com:8080/x",
    "https://b.org/p?gclid=abc&z=9&z=1&ref=tw",
    "/relative/path?z=1",
    "example.com/no-scheme",
    "  http://trim.me/x  ",
    "ftp://Files.Example.com:21/a/b",
    "http://q.com/x?a=1&a=0&A=2",        # key case + equal-key sort
    "http://e.com/x?",                     # empty query
    "mailto:someone@example.com",
]


def test_url_canonicalize_matches_python_twin(spark):
    from lightning_metastore_spark.functions.html import url_canonicalize

    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(URLS)], "doc_id long, url string")
    got = {r.doc_id: r.canonical_url
           for r in url_canonicalize(df).collect()}
    want = {i: _twin_canon(u) for i, u in enumerate(URLS)}
    assert got == want
    # spot-check the headline rules
    assert got[0] == "https://example.com/Path/?a=1&b=2"
    assert got[1] == "http://a.com"
    assert got[2] == "http://a.com"
    assert got[3] == "http://a.com/x"
    assert got[4] == "http://a.com:8080/x"


def test_url_dedup_keeps_min_id_per_canonical(spark):
    from lightning_metastore_spark.functions.html import url_dedup

    rows = [
        (1, "http://a.com/x?utm_source=nl"),
        (2, "HTTP://A.com:80/x"),
        (3, "http://a.com/x#top"),
        (4, "http://a.com/y"),
        (5, None),                 # NULL url: excluded, never grouped
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {r.canonical_url: (r.doc_id, r.dup_count)
           for r in url_dedup(df).collect()}
    assert got == {"http://a.com/x": (1, 3), "http://a.com/y": (4, 1)}
