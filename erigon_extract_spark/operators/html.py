"""HTML → text extraction for raw-web corpora (the jusText/Readability
class of heuristics, public knowledge): strip invisible content, segment
into block-level text blocks, drop boilerplate blocks by link density and
minimum length, and reassemble the survivors.

This is the one universally-hit pretraining stage upstream of the
curation chain (operators/curation.py, operators/text.py): real corpora
start from crawled HTML, not clean text. The heuristic implemented here
is the standard public recipe — remove ``<script>/<style>/<head>`` and
comments, treat block-level tags as segment boundaries, and call a block
boilerplate when most of its characters sit inside ``<a>`` anchors
(navigation/footer chrome) or it is too short to carry prose.

Plan shape (the part that matters at 100 TB): the WHOLE operator is one
projection of Catalyst expressions — chained ``regexp_replace`` for the
strips, one ``split`` into a block array, and ``transform``/``filter``
higher-order functions for the per-block text/link-density math. Zero
UDFs, zero shuffles, zero Python in the hot path: whole-stage codegen
end to end, embarrassingly parallel over input splits, and composes with
the downstream dedup/quality operators without a materialization.

Regex dialect: every pattern lives in the common Java-regex (Spark) /
RE2 (DuckDB) subset — no backreferences, no lookaround — so the DuckDB
oracle in queries.py mirrors them verbatim (same discipline as
operators/curation.py's PII patterns). Nested ``<a>`` elements are not
HTML-conformant and are out of scope; the non-greedy anchor match pairs
each ``<a>`` with the nearest close, which is the documented contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# invisible-content strips, applied in order (comments first so a
# commented-out script cannot hide a '</script>' from the next pass).
# \b after the tag name and \s* in the close tag are load-bearing:
# without them '<head...>' swallows '<header>' and '</a...>' swallows
# '</abbr>' (review-caught; the oracle mirrors the same patterns, so
# the hash gate alone could never surface the lost text)
COMMENT_RE = r"(?s)<!--.*?-->"
HEAD_RE = r"(?is)<head\b[^>]*>.*?</head\s*>"
SCRIPT_RE = r"(?is)<script\b[^>]*>.*?</script\s*>"
STYLE_RE = r"(?is)<style\b[^>]*>.*?</style\s*>"

# block-level elements whose tags (open or close) delimit text blocks
BLOCK_TAGS = (
    "p|div|br|h1|h2|h3|h4|h5|h6|li|ul|ol|table|tr|td|th|blockquote|"
    "section|article|header|footer|nav|form|pre"
)
BLOCK_RE = rf"(?i)</?(?:{BLOCK_TAGS})\b[^>]*>"

# capture group 1 = the anchor's inner markup (inline tags stripped later)
ANCHOR_RE = r"(?is)<a\b[^>]*>(.*?)</a\s*>"
TAG_RE = r"<[^>]*>"

# capture group 1 = a double-quoted href value (the HTML-conformant form;
# single-quoted/unquoted attributes are out of scope, documented)
HREF_RE = r'(?is)<a\b[^>]*\bhref\s*=\s*"([^"]*)"'

# minimal entity set, decoded AFTER tag-stripping; '&amp;' must be last so
# '&amp;lt;' decodes to the literal '&lt;' and not to '<'
ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def decode_entities(col: Column) -> Column:
    """Decode the minimal entity set, '&amp;' last (see ENTITIES)."""
    for ent, ch in ENTITIES:
        col = F.replace(col, F.lit(ent), F.lit(ch))
    return col


def _visible_text(col: Column) -> Column:
    """Markup fragment → visible text: strip tags, decode entities,
    collapse whitespace, trim. Mirrored verbatim by the SQL oracle."""
    t = decode_entities(F.regexp_replace(col, TAG_RE, " "))
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def html_extract_text(
    df: DataFrame,
    *,
    html_col: str = "html",
    out_col: str = "text",
    min_words: int = 3,
    max_link_density_pct: int = 50,
) -> DataFrame:
    """Extract main text from an HTML column.

    A block survives when its visible text is non-empty, has at least
    ``min_words`` whitespace-separated words, and at most
    ``max_link_density_pct`` percent of its characters come from anchor
    text. The density compare is exact integer arithmetic
    (``anchor_len * 100 <= text_len * pct``) so the keep decision cannot
    flip on float rounding between engines.

    Adds ``out_col`` (kept blocks joined with newlines),
    ``n_blocks_total`` (non-empty visible blocks) and ``n_blocks_kept``.
    """
    c = F.coalesce(F.col(html_col), F.lit(""))
    for pat in (COMMENT_RE, HEAD_RE, SCRIPT_RE, STYLE_RE):
        c = F.regexp_replace(c, pat, " ")
    c = F.regexp_replace(c, BLOCK_RE, "\n")

    anchor_join = lambda b: F.array_join(  # noqa: E731
        F.regexp_extract_all(b, F.lit(ANCHOR_RE), F.lit(1)), " "
    )
    seg = F.transform(
        F.split(c, "\n"),
        lambda b: F.struct(
            _visible_text(b).alias("t"),
            F.length(_visible_text(anchor_join(b))).alias("alen"),
        ),
    )
    nonempty = F.filter(seg, lambda s: s["t"] != F.lit(""))
    kept = F.filter(
        nonempty,
        lambda s: (F.size(F.split(s["t"], " ")) >= F.lit(int(min_words)))
        & (
            s["alen"] * F.lit(100)
            <= F.length(s["t"]) * F.lit(int(max_link_density_pct))
        ),
    )
    return df.withColumns(
        {
            out_col: F.array_join(
                F.transform(kept, lambda s: s["t"]), "\n"
            ),
            "n_blocks_total": F.size(nonempty).cast("long"),
            "n_blocks_kept": F.size(kept).cast("long"),
        }
    )


SITEMAP_LOC_RE = r"(?is)<loc\s*>\s*(.*?)\s*</loc\s*>"


def extract_sitemap_locs(
    df: DataFrame,
    *,
    xml_col: str = "xml",
    keep_cols: tuple[str, ...] = ("doc_id",),
    out_col: str = "loc",
) -> DataFrame:
    """One row per ``<loc>`` URL in a sitemap/sitemap-index document, in
    document order — the OTHER crawl-discovery feed besides page links
    (sitemaps.org protocol, public knowledge). Same zero-shuffle
    regexp_extract_all explode as extract_links; entity-decodes the
    URL ('&amp;' etc. are required escaping inside sitemap <loc>)."""
    url = F.explode(
        F.regexp_extract_all(
            F.coalesce(F.col(xml_col), F.lit("")),
            F.lit(SITEMAP_LOC_RE),
            F.lit(1),
        )
    )
    df = df.select(*keep_cols, url.alias("__raw"))
    return df.select(
        *keep_cols, decode_entities(F.col("__raw")).alias(out_col)
    )


# a sitemaps.org file is EITHER an index (<sitemapindex> of <sitemap>
# entries pointing at other sitemap FILES) or a urlset (<urlset> of
# <url> entries pointing at PAGES) — never mixed, so the document's
# root tag classifies every <loc> inside it (protocol guarantee; this
# avoids per-entry scoping regexes, which RE2/Java-without-lookaround
# cannot express)
SITEMAP_INDEX_RE = r"(?is)<sitemapindex[\s>]"


def resolve_sitemap_index(
    sitemaps: DataFrame,
    *,
    url_col: str = "url",
    xml_col: str = "xml",
    out_col: str = "loc",
) -> DataFrame:
    """Resolve one level of ``<sitemapindex>`` indirection over a fetched
    sitemap corpus (sitemaps.org protocol: an index lists child sitemap
    FILES, each child a ``<urlset>`` of page URLs; indexes may not nest,
    so one resolution level is the protocol-complete depth).

    Input: one row per fetched sitemap document ``(url_col, xml_col)``.
    Output: one row per discovered PAGE URL — ``root_url`` (the sitemap
    the crawl started from), ``out_col`` (the page), and ``depth``
    (0 = the root was itself a urlset; 1 = the page came from a child
    urlset listed by a root index). Child references whose document is
    missing from the corpus contribute nothing (an unfetched child has
    no pages to discover); a child that is itself an index is dropped —
    the protocol forbids nested indexes, and bounding the walk keeps the
    plan static.

    Scale shape: classification and both extractions are zero-shuffle
    projections; the ONE shuffle is the child-loc -> corpus equi-join on
    the canonical URL string (broadcastable when the index side is small,
    AQE decides). No driver loop, no recursion — depth is fixed by the
    protocol, so the whole resolution is a static two-branch union."""
    is_index = F.coalesce(F.col(xml_col), F.lit("")).rlike(SITEMAP_INDEX_RE)
    tagged = sitemaps.select(
        F.col(url_col).alias("__sm_url"),
        F.col(xml_col).alias("__sm_xml"),
        is_index.alias("__sm_is_index"),
    )
    locs = extract_sitemap_locs(
        tagged,
        xml_col="__sm_xml",
        keep_cols=("__sm_url", "__sm_is_index"),
        out_col="__sm_loc",
    )
    # depth 0: the root document is a urlset — its locs ARE pages
    pages0 = locs.filter(~F.col("__sm_is_index")).select(
        F.col("__sm_url").alias("root_url"),
        F.col("__sm_loc").alias(out_col),
        F.lit(0).alias("depth"),
    )
    # depth 1: root is an index — join each child loc to the corpus and
    # extract pages from child documents that are themselves urlsets
    children = locs.filter(F.col("__sm_is_index")).select(
        F.col("__sm_url").alias("root_url"),
        F.col("__sm_loc").alias("__child_url"),
    )
    child_docs = children.join(
        tagged.filter(~F.col("__sm_is_index")),
        children["__child_url"] == tagged["__sm_url"],
    ).select("root_url", "__sm_xml")
    pages1 = extract_sitemap_locs(
        child_docs,
        xml_col="__sm_xml",
        keep_cols=("root_url",),
        out_col=out_col,
    ).select("root_url", out_col, F.lit(1).alias("depth"))
    return pages0.unionByName(pages1)


# RSS 2.0 carries the link as element TEXT (<link>url</link>); Atom as
# an attribute (<link href="url"/>). Both in the RE2/Java common subset.
RSS_LINK_RE = r"(?is)<link\s*>\s*(.*?)\s*</link\s*>"
ATOM_LINK_RE = r'(?is)<link\b[^>]*\bhref\s*=\s*"([^"]*)"'


def extract_feed_links(
    df: DataFrame,
    *,
    xml_col: str = "xml",
    keep_cols: tuple[str, ...] = ("doc_id",),
    out_col: str = "link",
) -> DataFrame:
    """One row per link URL in an RSS 2.0 / Atom feed document — the
    third crawl-discovery feed besides page links and sitemaps. Matches
    BOTH syndication dialects in one pass: RSS text-content ``<link>``
    elements (item and channel links alike — channel links are
    legitimate frontier URLs, documented contract) and Atom ``<link
    href="...">`` attributes, RSS matches first, each entity-decoded.
    Zero-shuffle: two regexp_extract_all arrays concatenated and
    exploded, one projection end to end — same plan family as
    extract_links/extract_sitemap_locs, and the output column feeds the
    canonicalize_url -> robots_filter -> dedup_url chain unchanged."""
    xml = F.coalesce(F.col(xml_col), F.lit(""))
    both = F.concat(
        F.regexp_extract_all(xml, F.lit(RSS_LINK_RE), F.lit(1)),
        F.regexp_extract_all(xml, F.lit(ATOM_LINK_RE), F.lit(1)),
    )
    df = df.select(*keep_cols, F.explode(both).alias("__raw"))
    return df.select(
        *keep_cols, decode_entities(F.col("__raw")).alias(out_col)
    )


def extract_links(
    df: DataFrame,
    *,
    html_col: str = "html",
    keep_cols: tuple[str, ...] = ("doc_id",),
    out_col: str = "href",
) -> DataFrame:
    """One row per ``<a href="...">`` value, in document order — the
    crawl-frontier / web-graph feed. Zero-shuffle explode of a
    ``regexp_extract_all`` projection; pair with
    operators/urls.url_host / canonicalize_url for graph vertices.

    The extracted value is entity-decoded (same minimal set and order as
    extract_sitemap_locs): conformant HTML escapes '&' in attribute
    values as '&amp;', so a raw href '/q?a=1&amp;b=2' must become
    '/q?a=1&b=2' before canonicalize_url splits params — without the
    decode the second param would mis-parse as 'amp;b' (r7 advice)."""
    raw = F.explode(
        F.regexp_extract_all(
            F.coalesce(F.col(html_col), F.lit("")),
            F.lit(HREF_RE),
            F.lit(1),
        )
    )
    return df.select(*keep_cols, raw.alias("__raw")).select(
        *keep_cols, decode_entities(F.col("__raw")).alias(out_col)
    )
