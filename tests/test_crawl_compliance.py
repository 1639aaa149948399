"""Crawl-compliance facade tests (M166, pipeline.prepare_crawl_corpus)
— sitemap discovery → RFC 9309 robots permission → canonical keep-set
→ URL governance, composed; q175's DuckDB twin recomputes every stage
independently at corpus scale. Here: hand-computed keep/drop pins, the
_reuse_derived exchange-sharing plan claim, and index expansion
through the facade."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from batch_processing_analysis_spark.pipeline import (
    prepare_crawl_corpus,
    prepare_web_corpus,
)

SITEMAP = ('<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
           "<url><loc>https://a.com/keep</loc></url>"
           "<url><loc>https://a.com/tmp/x</loc></url>"
           "<url><loc>https://a.com/q?x=1</loc></url>"
           "<url><loc>https://b.com/open</loc></url>"
           "<url><loc>https://norobots.com/z</loc></url>"
           "</urlset>")
ROBOTS = [
    ("a.com", "User-agent: *\nDisallow: /tmp/\nDisallow: /*?x=1$"),
    # rule-less named group: mybot allowed everything on b.com
    ("b.com", "User-agent: mybot\nDisallow:\n\nUser-agent: *\nDisallow: /"),
]


@pytest.fixture(scope="module")
def fixture(spark):
    sitemaps = spark.createDataFrame([("seeds.example", SITEMAP)],
                                     "domain string, sitemap_xml string")
    robots = spark.createDataFrame(ROBOTS,
                                   "domain string, robots_txt string")
    docs = spark.createDataFrame(
        [(1, "https://a.com/keep", 10),      # discovered + allowed
         (2, "HTTPS://A.com:443/keep", 9),   # same canonical: deduped
         (3, "https://a.com/tmp/x", 8),      # discovered but disallowed
         (4, "https://a.com/q?x=1", 7),      # query-string rule blocks
         (5, "https://b.com/open", 6),       # empty named group: allowed
         (6, "https://norobots.com/z", 5),   # no robots doc: allowed
         (7, "https://a.com/undiscovered", 4),  # not in any sitemap
         (8, "not a url", 3)],               # un-canonicalizable
        "doc_id int, url string, score int")
    return sitemaps, robots, docs


def test_keep_drop_pins(spark, fixture):
    sitemaps, robots, docs = fixture
    out = prepare_crawl_corpus(docs, sitemaps, robots, "MyBot")
    got = {r["doc_id"]: r["canon_url"] for r in out.collect()}
    # doc 1 beats doc 2 on the shared canonical (lowest id survives)
    assert got == {1: "https://a.com/keep",
                   5: "https://b.com/open",
                   6: "https://norobots.com/z"}
    # a different agent obeys b.com's '*' disallow-all
    other = {r["doc_id"] for r in prepare_crawl_corpus(
        docs, sitemaps, robots, "other").collect()}
    assert other == {1, 6}


def test_quota_and_blocklist_compose(spark, fixture):
    sitemaps, robots, docs = fixture
    block = spark.createDataFrame([("norobots.com",)], "domain string")
    out = prepare_crawl_corpus(docs, sitemaps, robots, "mybot",
                               order_col="score", domain_quota=1,
                               blocklist=block)
    got = {r["doc_id"] for r in out.collect()}
    # norobots.com blocklisted; one doc per registrable domain remains
    assert got == {1, 5}


def test_reuse_derived_saves_an_exchange(spark, fixture):
    """The facade derives canon_url/host once, semi-joins on
    canon_url, and the dedup window inherits that exchange
    (_reuse_derived); recomputing the canonical column after the join
    (the naive composition) costs one more Exchange of the corpus."""
    sitemaps, robots, docs = fixture
    from batch_processing_analysis_spark.functions import web as WEB
    from batch_processing_analysis_spark.operators import robots as RB
    from batch_processing_analysis_spark.operators import sitemaps as SM

    fused = prepare_crawl_corpus(docs, sitemaps, robots, "mybot")
    seeds = SM.parse_sitemaps(sitemaps).filter(F.col("kind") == "url")
    loc = F.col("loc")
    p, q = WEB.url_path(loc), WEB.url_query(loc)
    target = F.concat(F.when(p == "", "/").otherwise(p),
                      F.when(q == "", "").otherwise(
                          F.concat(F.lit("?"), q)))
    sd = seeds.select("loc", WEB.url_host(loc).alias("_rb_host"),
                      target.alias("_rb_path"))
    decided = RB.robots_allowed(
        sd, RB.parse_robots(robots), "mybot",
        domain_col="_rb_host", path_col="_rb_path",
        agents=RB.parse_robots_agents(robots))
    keep = (decided.filter(F.col("allowed"))
            .select(WEB.url_canonicalize(F.col("loc"))
                    .alias("canon_url"))
            .filter(F.col("canon_url").isNotNull()).distinct())
    naive_base = (docs.withColumn(
        "canon_url", WEB.url_canonicalize(F.col("url")))
        .filter(F.col("canon_url").isNotNull())
        .join(keep, "canon_url", "left_semi").drop("canon_url"))
    naive = prepare_web_corpus(naive_base)

    # same rows either way
    assert sorted(r["doc_id"] for r in fused.collect()) == \
        sorted(r["doc_id"] for r in naive.collect())
    # plan shape under the at-scale join strategy (keep-set too big to
    # broadcast); plans taken PRE-execution so the AQE wrapper shows
    # one clean initial plan, the house counting pattern
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        fp = prepare_crawl_corpus(docs, sitemaps, robots, "mybot") \
            ._jdf.queryExecution().executedPlan().toString()
        np_ = prepare_web_corpus(naive_base) \
            ._jdf.queryExecution().executedPlan().toString()
        # r11 optimization: the PSL host map's distinct-host side now
        # derives from the PRE-window frame (host_source=base), so the
        # dedup window no longer duplicates into the mapping branch.
        # The naive composition still pays the canon re-derivation
        # window exchange AND re-executes its own (post-semi-join)
        # subtree in the mapping branch — measured delta 5 at this
        # fixture; assert the reuse saves at least the 2 the original
        # shape guaranteed so the check stays directional, not
        # magic-number-coupled to Catalyst details.
        assert fp.count("Exchange") <= np_.count("Exchange") - 2, \
            (fp, np_)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_index_payloads_expand_through_facade(spark, fixture):
    _, robots, docs = fixture
    index = ("<sitemapindex><sitemap>"
             "<loc>https://seeds.example/child.xml</loc>"
             "</sitemap></sitemapindex>")
    child = ('<urlset><url><loc>https://a.com/keep</loc></url>'
             "<url><loc>https://norobots.com/z</loc></url></urlset>")
    sitemaps = spark.createDataFrame([("seeds.example", index)],
                                     "domain string, sitemap_xml string")
    payloads = spark.createDataFrame(
        [("https://seeds.example/child.xml", child)],
        "loc string, sitemap_xml string")
    out = prepare_crawl_corpus(docs, sitemaps, robots, "mybot",
                               sitemap_payloads=payloads)
    assert {r["doc_id"] for r in out.collect()} == {1, 6}
    # without payloads the index discovers nothing
    empty = prepare_crawl_corpus(docs, sitemaps, robots, "mybot")
    assert empty.count() == 0


def test_expand_frontier(spark):
    """Link-following discovery: out-links resolve, non-web schemes
    drop, robots gate per target host, known URLs never re-enter,
    in-link counts and earliest referrer aggregate."""
    from batch_processing_analysis_spark.pipeline import expand_frontier

    pages = spark.createDataFrame(
        [("http://a.com/d/p1.html",
          '<a href="n.html">x</a><a href="/x/blocked">y</a>'
          '<a href="https://ext.org/e">z</a>'
          '<a href="mailto:a@b.c">m</a>'),
         ("http://a.com/d/p2.html",
          '<a href="n.html">x</a><a href="known.html">k</a>')],
        "url string, html string")
    robots = spark.createDataFrame(
        [("a.com", "User-agent: *\nDisallow: /x/")],
        "domain string, robots_txt string")
    known = spark.createDataFrame(
        [("http://a.com/d/known.html",)], "canon_url string")
    out = {r["canon_url"]: (r["n_refs"], r["first_src"])
           for r in expand_frontier(pages, robots, "bot",
                                    known=known).collect()}
    assert out == {
        # two pages link the same relative target: n_refs=2
        "http://a.com/d/n.html": (2, "http://a.com/d/p1.html"),
        # no robots for ext.org: allowed
        "https://ext.org/e": (1, "http://a.com/d/p1.html"),
    }


def test_expand_frontier_plan_stays_staged(spark):
    """r11 regression guard: expand_frontier stages (src, resolved) and
    (src, canon_url) as stored frames. Without those barriers the
    Column helpers compose by SUBSTITUTION — url_canonicalize copies
    the whole url_resolve tree into each of its ~8 regexp references
    and the scheme/host/path derivations copy the composed tree again,
    which blew the q180 physical plan up to 797 KB of formatted text
    and a few hundred regex evaluations per link row
    (plans/r11/q180_frontier_expansion_before.txt). Assert the plan
    text stays orders of magnitude below that, and Python-free."""
    from batch_processing_analysis_spark.pipeline import expand_frontier

    pages = spark.createDataFrame(
        [("http://a.com/d/p1.html", '<a href="n.html">x</a>')],
        "url string, html string")
    robots = spark.createDataFrame(
        [("a.com", "User-agent: *\nDisallow: /x/")],
        "domain string, robots_txt string")
    plan = expand_frontier(pages, robots, "bot") \
        ._jdf.queryExecution().executedPlan().toString()
    assert len(plan) < 120_000, len(plan)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
