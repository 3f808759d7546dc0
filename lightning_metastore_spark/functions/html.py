"""HTML -> training-text extraction as pure JVM column expressions.

The first step of every web-crawl curation pipeline (the WET-style
extraction CommonCrawl consumers re-do with trafilatura/justext):
strip script/style/comment blocks, pull the <title>, flatten tags to
text, decode the common entities, and compute the link density that
boilerplate classifiers key on (navigation/footer chrome is mostly
anchor text; main content is not).

Everything here is regexp_replace / regexp_extract_all / higher-order
array expressions — whole-stage-codegen JVM, no Python in the hot
path, map-only at any corpus size. The extraction is deliberately a
documented approximation (regular, not a real HTML5 tree parser):
block boundaries come from non-greedy tag-pair matches, unknown
entities decode to a space, and malformed markup degrades to
stripping `<...>` runs — the right trade for a filter feature at
100 TB, not a DOM for rendering.

Entity contract (single-pass, mirrors html.unescape on this set):
``&lt; &gt; &quot; &apos; &nbsp; &#39; &#34;`` decode to their
characters, any OTHER ``&name;`` / ``&#NN;`` / ``&#xHH;`` entity
becomes one space, and ``&amp;`` decodes to ``&`` LAST so
``&amp;lt;`` yields the literal text ``&lt;`` (never ``<``).

Reference parity note: the reference's unstructured scan surfaces raw
file text only (UnstructuredData.scala:142-208 — pdf/image/video/txt);
HTML feature extraction is part of the driver-mandated LLM-pipeline
extension, not a reference port.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# non-greedy paired blocks whose CONTENT must vanish, then comments
_BLOCK_PATTERNS = (
    r"(?is)<script\b[^>]*>.*?</script>",
    r"(?is)<style\b[^>]*>.*?</style>",
    r"(?s)<!--.*?-->",
)
# the whole <head> vanishes from BODY text (title is extracted from it
# separately, before this pattern applies)
_HEAD_PATTERN = r"(?is)<head\b[^>]*>.*?</head>"

# decoded before the unknown-entity sweep; &amp; handled last (see
# module docstring for why that ordering is the single-pass contract)
_NAMED_ENTITIES = (
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
    ("&apos;", "'"), ("&#39;", "'"), ("&#34;", '"'), ("&nbsp;", " "),
)
_UNKNOWN_ENTITY = r"&(?!amp;)#?[a-zA-Z0-9]{1,8};"


def strip_blocks(col: Column) -> Column:
    """Remove script/style blocks and comments (content and all)."""
    out = col
    for pat in _BLOCK_PATTERNS:
        out = F.regexp_replace(out, pat, " ")
    return out


def decode_entities(col: Column) -> Column:
    """Single-pass entity decode per the module contract."""
    out = col
    for ent, ch in _NAMED_ENTITIES:
        out = F.regexp_replace(out, ent, ch)
    out = F.regexp_replace(out, _UNKNOWN_ENTITY, " ")
    return F.regexp_replace(out, "&amp;", "&")


def _flatten(col: Column) -> Column:
    """Tags -> space, entities decoded, whitespace collapsed+trimmed.

    Tags become a SPACE (not empty string) so ``a</p><p>b`` stays two
    words; the collapse pass canonicalizes the damage.
    """
    txt = F.regexp_replace(col, r"(?s)<[^>]*>", " ")
    txt = decode_entities(txt)
    return F.trim(F.regexp_replace(txt, r"\s+", " "))


def html_title(col: Column) -> Column:
    """First <title> body, flattened; '' when absent."""
    return _flatten(F.regexp_extract(
        strip_blocks(col), r"(?is)<title\b[^>]*>(.*?)</title>", 1))


def html_extract(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """(doc_id, title, clean_text, n_chars, n_links, link_density) —
    the per-document HTML extraction + boilerplate features.

    ``clean_text`` is the flattened body (head/script/style/comment
    blocks stripped — the title lives in its own column, not the body —
    tags to spaces, entities decoded, whitespace collapsed); ``n_links``
    counts
    ``<a>`` pairs; ``link_density`` is flattened-anchor-text chars over
    ``max(1, n_chars)``, rounded to 6dp — the navigation/footer
    detector (content pages sit well under ~0.3, chrome near 1.0).
    Plain text without angle brackets passes through unchanged with
    zero links; per the module's regular-approximation contract, any
    ``<...>`` span in non-HTML input (e.g. ``a<b we have f(x)>0``) is
    stripped as if it were a tag — run this stage only on inputs that
    ARE markup (the ``html_input`` flag exists for exactly that).

    100 TB shape: one map-only projection, no joins, no shuffle, no
    Python — filters downstream of it (e.g. link_density < x) stay
    pushable and the scan prunes to (id, text).
    """
    src = F.coalesce(F.col(text_col), F.lit(""))
    body = F.regexp_replace(strip_blocks(src), _HEAD_PATTERN, " ")
    clean = _flatten(body)
    anchors = F.regexp_extract_all(
        body, F.lit(r"(?is)<a\b[^>]*>(.*?)</a>"), 1)
    anchor_chars = F.aggregate(
        anchors, F.lit(0).cast("long"),
        lambda acc, x: acc + F.length(_flatten(x)).cast("long"))
    n_chars = F.length(clean).cast("long")
    density = F.round(
        anchor_chars / F.greatest(F.lit(1).cast("long"), n_chars), 6)
    return docs.select(
        F.col(id_col),
        html_title(src).alias("title"),
        clean.alias("clean_text"),
        n_chars.alias("n_chars"),
        F.size(anchors).cast("long").alias("n_links"),
        density.alias("link_density"))


# ---------------------------------------------------------------------------
# URL canonicalization + URL-level dedup (the crawl-frontier keep rule)
# ---------------------------------------------------------------------------

# RFC 3986 appendix-B split, fragment group never read (dropped)
_URL_PARTS = r"^(?:([^:/?#]+):)?(?://([^/?#]*))?([^?#]*)(?:\?([^#]*))?"
# exact-match tracking params removed alongside the utm_* prefix family
_TRACKING_PARAMS = ("fbclid", "gclid", "msclkid", "mc_eid", "igshid",
                    "ref", "ref_src", "spm")


def url_canonical_expr(col: Column) -> Column:
    """Canonical form of a URL column, pure JVM expression.

    Documented rules (the common crawl-dedup canonicalizer, not full
    RFC normalization): trim; drop the #fragment; lowercase scheme and
    authority (never path/query); strip the scheme-default port
    (http:80 / https:443); drop tracking query params (``utm_*``
    prefix + the ``_TRACKING_PARAMS`` exact set, matched on the
    lowercased key); byte-sort surviving ``k=v`` params (equal keys
    then sort by value — deterministic); drop a bare-root ``/`` path
    when no query survives. Opaque/relative URLs degrade gracefully:
    absent parts extract as '' and are omitted from the rebuild
    (``file:///p`` loses its empty-authority ``//`` — acceptable for a
    dedup key, not for refetching).

    100 TB shape: map-only codegen'd projection — regexp splits +
    higher-order array filter/sort, no Python, no shuffle.
    """
    u = F.trim(col)
    scheme = F.lower(F.regexp_extract(u, _URL_PARTS, 1))
    auth = F.lower(F.regexp_extract(u, _URL_PARTS, 2))
    path = F.regexp_extract(u, _URL_PARTS, 3)
    query = F.regexp_extract(u, _URL_PARTS, 4)
    auth = (F.when(scheme == "http", F.regexp_replace(auth, r":80$", ""))
            .when(scheme == "https", F.regexp_replace(auth, r":443$", ""))
            .otherwise(auth))
    track = F.array(*[F.lit(t) for t in _TRACKING_PARAMS])

    def _keep(p):
        key = F.lower(F.split(p, "=").getItem(0))
        return ((p != "") & ~key.startswith("utm_")
                & ~F.array_contains(track, key))

    q = F.array_join(F.array_sort(F.filter(F.split(query, "&"), _keep)),
                     "&")
    path = F.when((path == "/") & (q == ""), F.lit("")).otherwise(path)
    return F.concat(
        F.when(scheme != "", F.concat(scheme, F.lit(":"))).otherwise(F.lit("")),
        F.when(auth != "", F.concat(F.lit("//"), auth)).otherwise(F.lit("")),
        path,
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")))


def url_canonicalize(docs: DataFrame, url_col: str = "url") -> DataFrame:
    """All input columns + ``canonical_url`` (see url_canonical_expr)."""
    return docs.withColumn("canonical_url",
                           url_canonical_expr(F.col(url_col)))


def url_dedup(docs: DataFrame, url_col: str = "url",
              id_col: str = "doc_id") -> DataFrame:
    """URL-level dedup: (id, canonical_url, dup_count), keeping the
    smallest id per canonical URL — the ``exact_dedup`` shape keyed on
    the canonical form instead of the text hash. One hash-aggregation
    shuffle on the canonical URL. Rows with a NULL URL are EXCLUDED —
    absent URLs are not duplicate evidence, and grouping them would
    collapse every URL-less doc into one bogus cluster (the same
    contract as curate_corpus's url stage)."""
    canon = url_canonical_expr(F.col(url_col))
    return (docs.select(F.col(id_col), canon.alias("canonical_url"))
            .filter(F.col("canonical_url").isNotNull())
            .groupBy("canonical_url")
            .agg(F.min(id_col).alias(id_col),
                 F.count(F.lit(1)).alias("dup_count"))
            .select(id_col, "canonical_url", "dup_count"))


def url_survivors(docs: DataFrame, url_col: str = "url",
                  id_col: str = "doc_id") -> DataFrame:
    """(id, url_survivor) for every doc that HAS a URL: True for the
    smallest id per canonical form, False for the rest. The ONE
    implementation of the crawl keep rule — curate_corpus's URL stage
    and the streaming ingest frontier rejector both consume this, so
    batch curation and streaming admission can never drift. NULL-URL
    docs have no row (no URL evidence — callers default them to
    survivor)."""
    cu = docs.select(F.col(id_col),
                     url_canonical_expr(F.col(url_col)).alias("__cu"))
    nn = cu.filter(F.col("__cu").isNotNull())
    umin = nn.groupBy("__cu").agg(F.min(id_col).alias("__umin"))
    return (nn.join(umin, "__cu")
            .select(id_col, (F.col(id_col) == F.col("__umin"))
                    .alias("url_survivor")))
