"""Crafted-HTML unit cases for operators/html.html_extract_text — each
branch of the extraction spec pinned on hand-written pages (the
text_pii_scrub fixture strategy), plus the zero-shuffle plan contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from erigon_extract_spark.operators.html import html_extract_text

PAGE = (
    "<html><head><title>T</title><style>p {color: red}</style></head>"
    "<body><script>var x = '</p>';</script>"
    "<!-- hidden <p>comment para</p> -->"
    "<h1>Deep learning corpora</h1>"
    "<p>Crawled pages carry chrome and ads around the article body.</p>"
    '<div class="nav"><a href="/">Home</a> <a href="/a">About</a> '
    '<a href="/c">Contact</a></div>'
    '<p>Read the <a href="/d"><b>full details</b></a> in the report.</p>'
    "<p>Fish &amp; chips &lt;3 &quot;quoted&quot; &#39;ok&#39;&nbsp;done</p>"
    "<ul><li>tiny</li></ul>"
    "</body></html>"
)


def _extract(spark, html):
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    return html_extract_text(df).select(
        "text", "n_blocks_total", "n_blocks_kept"
    ).first()


def test_full_page(spark):
    row = _extract(spark, PAGE)
    blocks = row["text"].split("\n")
    assert blocks == [
        "Deep learning corpora",
        "Crawled pages carry chrome and ads around the article body.",
        # inline <b> stripped inside the anchor; density 12/31 < 50%
        "Read the full details in the report.",
        # entities decoded, &nbsp; collapsed into a single space
        "Fish & chips <3 \"quoted\" 'ok' done",
    ]
    # dropped but counted: nav (pure links), li ("tiny", under min words)
    assert row["n_blocks_total"] == 6
    assert row["n_blocks_kept"] == 4


def test_script_style_head_comment_invisible(spark):
    row = _extract(
        spark,
        "<head><p>head para text here</p></head>"
        "<script>keep out of corpus</script><style>b {x: y}</style>"
        "<!-- no comment text --><p>only this one stays here</p>",
    )
    assert row["text"] == "only this one stays here"
    assert row["n_blocks_total"] == 1


def test_link_density_boundary_is_exact_integer(spark):
    # 10 anchor chars of 20 => exactly 50%: kept (<=), not a float compare
    half = '<p>aaaa bbbb <a href="/x">cccc dddd!</a></p>'
    assert _extract(spark, half)["n_blocks_kept"] == 1
    over = '<p>aaa bbb <a href="/x">cccc ddddd!</a></p>'  # 11 of 20
    assert _extract(spark, over)["n_blocks_kept"] == 0


def test_min_words_and_empty(spark):
    assert _extract(spark, "<p>two words</p>")["n_blocks_kept"] == 0
    assert _extract(spark, "<p>now three words</p>")["n_blocks_kept"] == 1
    row = _extract(spark, "<p>   </p><div></div>")
    assert row["text"] == ""
    assert row["n_blocks_total"] == 0


def test_null_html(spark):
    df = spark.createDataFrame([(1, None)], "doc_id long, html string")
    row = html_extract_text(df).first()
    assert row["text"] == "" and row["n_blocks_total"] == 0


def test_header_element_is_not_head(spark):
    # regression: '<head[^>]*>' once swallowed '<header>' and, with an
    # implicit </head>, everything up to '</header>'
    row = _extract(
        spark,
        "<head><title>T</title></head>"
        "<p>Important article content stays.</p>"
        "<header><h1>My Site Banner Words</h1></header>"
        "<p>tail text also stays here.</p>",
    )
    blocks = row["text"].split("\n")
    assert blocks == [
        "Important article content stays.",
        "My Site Banner Words",
        "tail text also stays here.",
    ]


def test_abbr_close_does_not_end_anchor(spark):
    # regression: '</a[^>]*>' once matched '</abbr>', truncating anchor
    # text and understating link density. This block is 100% anchor text
    # and must be dropped.
    row = _extract(
        spark,
        '<p><a href="/x">see the <abbr title="API">API</abbr> docs</a></p>',
    )
    assert row["n_blocks_kept"] == 0
    assert row["n_blocks_total"] == 1


def test_amp_decoded_last(spark):
    # '&amp;lt;' must decode to the literal '&lt;', never to '<'
    row = _extract(spark, "<p>escape shows &amp;lt; here</p>")
    assert row["text"] == "escape shows &lt; here"


def test_extract_sitemap_locs(spark):
    from erigon_extract_spark.operators.html import extract_sitemap_locs

    xml = (
        '<?xml version="1.0"?><urlset>'
        "<url><loc>http://a.com/x</loc></url>"
        "<url><loc>\n  http://a.com/y?p=1&amp;q=2  \n</loc></url>"
        "<URL><LOC>http://a.com/upper</LOC></URL>"  # case-insensitive
        "<url></url>"  # no loc -> nothing
        "</urlset>"
    )
    df = spark.createDataFrame([(1, xml)], "doc_id long, xml string")
    locs = [r["loc"] for r in extract_sitemap_locs(df).collect()]
    assert locs == [
        "http://a.com/x",
        "http://a.com/y?p=1&q=2",  # trimmed + &amp; decoded per spec
        "http://a.com/upper",
    ]


def test_zero_shuffle_plan(spark):
    df = spark.createDataFrame([(1, PAGE)], "doc_id long, html string")
    plan = html_extract_text(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure projection: map-stage only


def test_resolve_sitemap_index(spark):
    from erigon_extract_spark.operators.html import resolve_sitemap_index

    idx = (
        '<?xml version="1.0"?><sitemapindex>'
        "<sitemap><loc>http://h.com/sm1.xml</loc></sitemap>"
        "<sitemap><loc>http://h.com/sm2.xml</loc></sitemap>"
        "<sitemap><loc>http://h.com/missing.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    sm1 = ("<urlset><url><loc>http://h.com/a</loc></url>"
           "<url><loc>http://h.com/b</loc></url></urlset>")
    sm2 = "<urlset><url><loc>http://h.com/c</loc></url></urlset>"
    direct = "<urlset><url><loc>http://h.com/d</loc></url></urlset>"
    df = spark.createDataFrame(
        [
            ("http://h.com/index.xml", idx),
            ("http://h.com/sm1.xml", sm1),
            ("http://h.com/sm2.xml", sm2),
            ("http://h.com/direct.xml", direct),
        ],
        "url string, xml string",
    )
    out = resolve_sitemap_index(df).collect()
    rows = sorted((r["root_url"], r["loc"], r["depth"]) for r in out)
    # direct urlsets yield their own pages at depth 0 (sm1/sm2/direct);
    # the index yields its children's pages at depth 1; the missing
    # child contributes nothing
    assert rows == [
        ("http://h.com/direct.xml", "http://h.com/d", 0),
        ("http://h.com/index.xml", "http://h.com/a", 1),
        ("http://h.com/index.xml", "http://h.com/b", 1),
        ("http://h.com/index.xml", "http://h.com/c", 1),
        ("http://h.com/sm1.xml", "http://h.com/a", 0),
        ("http://h.com/sm1.xml", "http://h.com/b", 0),
        ("http://h.com/sm2.xml", "http://h.com/c", 0),
    ]


def test_resolve_sitemap_index_nested_index_dropped(spark):
    from erigon_extract_spark.operators.html import resolve_sitemap_index

    # a child that is itself an index violates the protocol's no-nesting
    # rule; its pages are NOT discovered (bounded walk)
    idx = ("<sitemapindex><sitemap><loc>http://h.com/sub.xml</loc>"
           "</sitemap></sitemapindex>")
    sub = ("<sitemapindex><sitemap><loc>http://h.com/leaf.xml</loc>"
           "</sitemap></sitemapindex>")
    leaf = "<urlset><url><loc>http://h.com/x</loc></url></urlset>"
    df = spark.createDataFrame(
        [
            ("http://h.com/root.xml", idx),
            ("http://h.com/sub.xml", sub),
            ("http://h.com/leaf.xml", leaf),
        ],
        "url string, xml string",
    )
    out = resolve_sitemap_index(df).collect()
    rows = sorted((r["root_url"], r["loc"], r["depth"]) for r in out)
    assert rows == [
        ("http://h.com/leaf.xml", "http://h.com/x", 0),
        ("http://h.com/sub.xml", "http://h.com/x", 1),
    ]


def test_extract_feed_links_rss_and_atom(spark):
    from erigon_extract_spark.operators.html import extract_feed_links

    rss = (
        "<rss><channel><link>http://h.com/</link>"
        "<item><title>t1</title><link> http://h.com/p1?a=1&amp;b=2 "
        "</link></item>"
        "<item><link>http://h.com/p2</link></item></channel></rss>"
    )
    atom = (
        '<feed xmlns="http://www.w3.org/2005/Atom">'
        '<link href="http://h.com/feed" rel="self"/>'
        '<entry><link href="http://h.com/e1?x=1&amp;y=2"/></entry>'
        '<entry><LINK HREF="http://h.com/e2"/></entry></feed>'
    )
    df = spark.createDataFrame(
        [(1, rss), (2, atom)], "doc_id long, xml string"
    )
    out = extract_feed_links(df).collect()
    got = sorted((r["doc_id"], r["link"]) for r in out)
    assert got == [
        (1, "http://h.com/"),
        (1, "http://h.com/p1?a=1&b=2"),
        (1, "http://h.com/p2"),
        (2, "http://h.com/e1?x=1&y=2"),
        (2, "http://h.com/e2"),
        (2, "http://h.com/feed"),
    ]


def test_feed_and_sitemap_extracts_zero_shuffle(spark):
    from erigon_extract_spark.operators.html import extract_feed_links

    df = spark.createDataFrame([(1, "<rss/>")], "doc_id long, xml string")
    plan = extract_feed_links(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
