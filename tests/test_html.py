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
