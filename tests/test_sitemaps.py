"""Sitemap parsing tests (M165, operators/sitemaps.py) — the
sitemaps.org 0.9 subset pinned against hand-computed expectations;
q174's DuckDB oracle twin re-runs extraction, entity unescape, and
the census in SQL at corpus scale."""

from __future__ import annotations

from batch_processing_analysis_spark.operators import robots as RB
from batch_processing_analysis_spark.operators import sitemaps as SM

URLSET = "\n".join([
    '<?xml version="1.0" encoding="UTF-8"?>',
    '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">',
    "<url><loc>https://a.com/p?x=1&amp;y=2</loc>",
    "<lastmod>2024-01-01</lastmod><priority>0.8</priority></url>",
    "<url><loc> https://a.com/q </loc></url>",
    "<url><loc>https://a.com/&amp;lt;odd&amp;gt;</loc>",
    "<priority>bogus</priority></url>",
    "<url><lastmod>2024-03-03</lastmod></url>",
    "</urlset>",
])
INDEX = ("<sitemapindex><sitemap><loc>https://b.com/sm1.xml</loc>"
         "<lastmod>2024-02-02</lastmod></sitemap>"
         "<sitemap><loc>https://b.com/sm2.xml</loc></sitemap>"
         "</sitemapindex>")


def test_parse_urlset_and_index(spark):
    df = spark.createDataFrame([("a.com", URLSET), ("b.com", INDEX)],
                               "domain string, sitemap_xml string")
    rows = {(r["domain"], r["kind"], r["loc"]):
            (r["lastmod"], r["changefreq"], r["priority"])
            for r in SM.parse_sitemaps(df).collect()}
    # entity unescape in loc; explicit priority
    assert rows[("a.com", "url", "https://a.com/p?x=1&y=2")] == \
        ("2024-01-01", "", 0.8)
    # loc whitespace trimmed; absent priority -> spec default 0.5
    assert rows[("a.com", "url", "https://a.com/q")] == ("", "", 0.5)
    # '&amp;lt;' unescapes to literal '&lt;' (amp replaced LAST);
    # malformed priority -> NULL
    assert rows[("a.com", "url", "https://a.com/&lt;odd&gt;")] == \
        ("", "", None)
    # index entries carry kind='sitemap', NULL priority
    assert rows[("b.com", "sitemap", "https://b.com/sm1.xml")] == \
        ("2024-02-02", "", None)
    assert rows[("b.com", "sitemap", "https://b.com/sm2.xml")] == \
        ("", "", None)
    # entry with no <loc> dropped (spec: loc mandatory)
    assert len(rows) == 5


def test_attribute_bearing_entries(spark):
    """Entry tags may carry attributes (real sitemaps namespace the
    root; some generators attribute entries); the tag-name boundary
    keeps <urlset …> from matching as a <url> block."""
    xml = ('<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9" '
           'xmlns:xhtml="http://www.w3.org/1999/xhtml">'
           '<url data-x="1"><loc>https://a.com/attr</loc></url>'
           "<url><loc>https://a.com/plain</loc></url>"
           "</urlset>")
    df = spark.createDataFrame([("a.com", xml)],
                               "domain string, sitemap_xml string")
    rows = {r["loc"]: r["kind"] for r in SM.parse_sitemaps(df).collect()}
    assert rows == {"https://a.com/attr": "url",
                    "https://a.com/plain": "url"}


def test_expand_sitemap_indexes(spark):
    """Bounded-depth index recursion over fetched payloads: a 2-level
    index (root index -> child index -> urlsets) expands to all leaf
    URLs with the right depth; a missing payload contributes nothing;
    max_depth truncates."""
    root = ('<sitemapindex>'
            "<sitemap><loc>https://b.com/child.xml</loc></sitemap>"
            "<sitemap><loc>https://b.com/leaf0.xml</loc></sitemap>"
            "<sitemap><loc>https://b.com/missing.xml</loc></sitemap>"
            "</sitemapindex>")
    child = ('<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
             "<sitemap><loc>https://b.com/leaf1.xml</loc></sitemap>"
             "</sitemapindex>")
    leaf0 = "<urlset><url><loc>https://b.com/p0</loc></url></urlset>"
    leaf1 = ("<urlset><url><loc>https://b.com/p1</loc></url>"
             "<url><loc>https://b.com/p2</loc></url></urlset>")
    seeds = spark.createDataFrame(
        [("b.com", root),
         ("a.com", "<urlset><url><loc>https://a.com/x</loc></url></urlset>")],
        "domain string, sitemap_xml string")
    payloads = spark.createDataFrame(
        [("https://b.com/child.xml", child),
         ("https://b.com/leaf0.xml", leaf0),
         ("https://b.com/leaf1.xml", leaf1)],
        "loc string, sitemap_xml string")
    got = {(r["domain"], r["loc"]): r["depth"]
           for r in SM.expand_sitemap_indexes(seeds, payloads).collect()}
    assert got == {("a.com", "https://a.com/x"): 0,
                   ("b.com", "https://b.com/p0"): 1,
                   ("b.com", "https://b.com/p1"): 2,
                   ("b.com", "https://b.com/p2"): 2}
    # depth bound: the child index's leaves are out of reach at 1
    shallow = {r["loc"] for r in SM.expand_sitemap_indexes(
        seeds, payloads, max_depth=1).collect()}
    assert shallow == {"https://a.com/x", "https://b.com/p0"}


def test_robots_sitemap_directive(spark):
    rb = spark.createDataFrame(
        [("a.com", "\n".join([
            "Sitemap: https://a.com/sitemap.xml",
            "User-agent: *",
            "Disallow: /x",
            "sitemap: https://a.com/sitemap2.xml  # trailing comment",
            "Sitemap:",
        ])),
         ("b.com", "User-agent: *\nDisallow: /")],
        "domain string, robots_txt string")
    got = sorted((r["domain"], r["sitemap_url"])
                 for r in RB.robots_sitemaps(rb).collect())
    assert got == [("a.com", "https://a.com/sitemap.xml"),
                   ("a.com", "https://a.com/sitemap2.xml")]
    # the group-blind sitemap parse must not disturb the group scan
    pol = RB.parse_robots(rb)
    assert {(r["domain"], r["agent"], r["pattern"])
            for r in pol.collect()} == {("a.com", "*", "/x"),
                                        ("b.com", "*", "/")}


def test_no_python_in_plan(spark):
    df = spark.createDataFrame([("a.com", URLSET)],
                               "domain string, sitemap_xml string")
    plan = SM.parse_sitemaps(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_recrawl_status_classification(spark):
    """new / stale / fresh / unlisted under W3C lastmod parsing with
    newest-fetch and newest-lastmod dedup on each side."""
    from datetime import datetime

    corpus = spark.createDataFrame(
        [("https://a.com/p1", datetime(2024, 1, 10)),
         ("https://a.com/p1", datetime(2024, 1, 5)),   # older dup
         ("https://a.com/p2", datetime(2024, 1, 10)),
         ("https://a.com/p3", datetime(2024, 1, 10)),
         ("https://a.com/p4", datetime(2024, 1, 10)),
         ("https://a.com/gone", datetime(2024, 1, 2))],
        "canon_url string, fetched_at timestamp")
    entries = spark.createDataFrame(
        [("https://a.com/p1", "2024-01-08"),        # < newest fetch
         ("https://a.com/p1", "2024-01-02"),        # older listing
         ("https://a.com/p2", "2024-01-15T09:00:00Z"),  # newer: stale
         ("https://a.com/p3", ""),                  # no lastmod: fresh
         ("https://a.com/p4", "not-a-date"),        # malformed: fresh
         ("https://a.com/new", "2024-02-01 00:00:00")],
        "loc string, lastmod string")
    out = {r["canon_url"]: (r["status"], r["lastmod_ts"])
           for r in SM.recrawl_status(corpus, entries).collect()}
    assert out["https://a.com/p1"][0] == "fresh"
    # newest listing won the dedup even though it stays fresh
    assert out["https://a.com/p1"][1] == datetime(2024, 1, 8)
    assert out["https://a.com/p2"][0] == "stale"
    assert out["https://a.com/p2"][1] == datetime(2024, 1, 15, 9)
    assert out["https://a.com/p3"] == ("fresh", None)
    assert out["https://a.com/p4"] == ("fresh", None)
    assert out["https://a.com/new"][0] == "new"
    assert out["https://a.com/gone"][0] == "unlisted"
    assert len(out) == 6


def test_recrawl_feeds_from_parse(spark):
    """recrawl_status consumes parse_sitemaps output directly (the
    M165 -> M168 composition)."""
    from datetime import datetime

    xml = ("<urlset><url><loc>https://a.com/x</loc>"
           "<lastmod>2024-03-01</lastmod></url></urlset>")
    sm = spark.createDataFrame([("a.com", xml)],
                               "domain string, sitemap_xml string")
    entries = SM.parse_sitemaps(sm).filter("kind = 'url'")
    corpus = spark.createDataFrame(
        [("https://a.com/x", datetime(2024, 2, 1))],
        "canon_url string, fetched_at timestamp")
    got = SM.recrawl_status(corpus, entries).collect()
    assert len(got) == 1 and got[0]["status"] == "stale"
