"""robots.txt governance tests (M164, operators/robots.py) — RFC 9309
parse + decision semantics pinned against hand-computed expectations;
q173's DuckDB oracle twin re-implements parse and decision in SQL at
corpus scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from batch_processing_analysis_spark.operators import robots as RB

DEMO = "\n".join([
    "# comment line",
    "User-agent: *",
    "Disallow: /private",
    "Allow: /private/ok",
    "",
    "User-agent: mybot",
    "User-agent: otherbot",
    "Disallow: /tmp/*",
    "Allow: /tmp/keep$",
    "Crawl-delay: 2",
    "Disallow:",
])


@pytest.fixture(scope="module")
def policies(spark):
    rb = spark.createDataFrame(
        [("a.com", DEMO),
         ("b.com", "User-agent: *\nDisallow: /"),
         ("c.com", "User-agent: mybot\nAllow: /pub\nDisallow: /"),
         ("meta.com", "User-agent: *\nDisallow: /a+b(1)$x")],
        "domain string, robots_txt string")
    return RB.parse_robots(rb).cache()


def test_group_scan(spark, policies):
    """Consecutive user-agent lines share one group; blank lines do
    NOT delimit; comments and crawl-delay are ignored; empty disallow
    produces no rule."""
    rows = {(r["domain"], r["agent"], r["rule"], r["pattern"])
            for r in policies.collect()}
    assert ("a.com", "*", "disallow", "/private") in rows
    assert ("a.com", "*", "allow", "/private/ok") in rows
    # both agents of the multi-UA group carry both rules
    for agent in ("mybot", "otherbot"):
        assert ("a.com", agent, "disallow", "/tmp/*") in rows
        assert ("a.com", agent, "allow", "/tmp/keep$") in rows
    # empty Disallow: emitted no rule; crawl-delay not a rule
    assert not any(r[3] == "" for r in rows)
    assert not any(r[2] == "crawl-delay" for r in rows)


def _decide(spark, policies, agent, pairs):
    urls = spark.createDataFrame(pairs, "domain string, path string")
    out = RB.robots_allowed(urls, policies, agent)
    return {(r["domain"], r["path"]): r["allowed"] for r in out.collect()}

def test_named_group_beats_star(spark, policies):
    got = _decide(spark, policies, "MyBot", [
        ("a.com", "/private/x"),    # named group has no /private rule
        ("a.com", "/tmp/a"),
        ("a.com", "/tmp/keep"),     # $-anchored allow, longest match
        ("a.com", "/tmp/keepX"),    # anchor must NOT match a prefix
        ("c.com", "/pub/ok"),
        ("c.com", "/secret"),
    ])
    assert got == {("a.com", "/private/x"): True,
                   ("a.com", "/tmp/a"): False,
                   ("a.com", "/tmp/keep"): True,
                   ("a.com", "/tmp/keepX"): False,
                   ("c.com", "/pub/ok"): True,
                   ("c.com", "/secret"): False}


def test_star_group_and_allow_tiebreak(spark, policies):
    got = _decide(spark, policies, "strangerbot", [
        ("a.com", "/private/x"),
        ("a.com", "/private/ok/y"),  # longer allow beats disallow
        ("a.com", "/tmp/a"),         # named group does NOT apply
        ("b.com", "/anything"),
        ("c.com", "/pub/ok"),        # no * group on c.com: unrestricted
        ("nopolicy.com", "/x"),
    ])
    assert got == {("a.com", "/private/x"): False,
                   ("a.com", "/private/ok/y"): True,
                   ("a.com", "/tmp/a"): True,
                   ("b.com", "/anything"): False,
                   ("c.com", "/pub/ok"): True,
                   ("nopolicy.com", "/x"): True}


def test_metachars_are_literal(spark, policies):
    """Regex metacharacters in patterns match literally; an interior
    '$' is literal (only a TRAILING '$' anchors)."""
    got = _decide(spark, policies, "anybot", [
        ("meta.com", "/a+b(1)$xtail"),   # literal match, then prefix
        ("meta.com", "/aab(1)$x"),       # '+' must not mean one-or-more
        ("meta.com", "/other"),
    ])
    assert got == {("meta.com", "/a+b(1)$xtail"): False,
                   ("meta.com", "/aab(1)$x"): True,
                   ("meta.com", "/other"): True}


def test_equal_length_tie_allow_wins(spark):
    rb = spark.createDataFrame(
        [("t.com", "User-agent: *\nDisallow: /dir\nAllow: /dir")],
        "domain string, robots_txt string")
    pol = RB.parse_robots(rb)
    got = _decide(spark, pol, "x", [("t.com", "/dir/page")])
    assert got == {("t.com", "/dir/page"): True}


def test_no_python_in_plans(spark, policies):
    urls = spark.createDataFrame([("a.com", "/x")],
                                 "domain string, path string")
    for df in (policies, RB.robots_allowed(urls, policies, "mybot")):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


def test_crawl_delays(spark):
    rb = spark.createDataFrame(
        [("a.com", "\n".join([
            "User-agent: *",
            "Crawl-delay: 1",
            "Disallow: /x",
            "User-agent: mybot",   # crawl-delay above ended UA accumulation
            "Crawl-delay: 2.5",
            "Crawl-delay: 4",      # later line overrides
            "User-agent: later",   # new group: no delay
            "Disallow: /y",
            "Crawl-delay: nonsense",
        ]))],
        "domain string, robots_txt string")
    got = {(r["domain"], r["agent"]): r["crawl_delay_s"]
           for r in RB.parse_crawl_delays(rb).collect()}
    assert got == {("a.com", "*"): 1.0, ("a.com", "mybot"): 4.0}


def _py_robots_allowed(policy_rows, agent, domain, path):
    """Independent pure-Python transcription of the RFC decision."""
    import re

    mine = [r for r in policy_rows
            if r[0] == domain and r[1] == agent]
    rules = mine or [r for r in policy_rows
                     if r[0] == domain and r[1] == "*"]
    best = None
    for _, _, rule, pattern in rules:
        anchored = pattern.endswith("$")
        body = pattern[:-1] if anchored else pattern
        rx = "^" + re.escape(body).replace(r"\*", ".*") + (
            "$" if anchored else "")
        if re.search(rx, path):
            key = (len(pattern), rule == "allow")
            if best is None or key > best[0]:
                best = (key, rule)
    return best is None or best[1] != "disallow"


def test_fuzzed_agreement_with_reference_resolver(spark):
    """The Spark parse+decide pipeline agrees with an independent
    Python transcription on randomized policies and paths (the q173
    DuckDB oracle is the third implementation, driver-gated)."""
    import random

    rng = random.Random(20260817)
    segs = ["a", "b+", "c(1)", "tmp", "keep", "x$y", "dir.d"]

    def rand_pattern():
        p = "/" + "/".join(rng.choice(segs)
                           for _ in range(rng.randint(1, 3)))
        if rng.random() < 0.3:
            p += "*"
        if rng.random() < 0.3:
            p += "$"
        return p

    domains, texts = [], []
    for di in range(8):
        lines = []
        for _ in range(rng.randint(1, 3)):  # groups
            for _ in range(rng.randint(1, 2)):  # agents per group
                lines.append("User-agent: "
                             + rng.choice(["*", "mybot", "other"]))
            for _ in range(rng.randint(1, 4)):  # rules per group
                lines.append(rng.choice(["Allow", "Disallow"])
                             + ": " + rand_pattern())
        domains.append(f"d{di}.com")
        texts.append("\n".join(lines))
    rb = spark.createDataFrame(list(zip(domains, texts)),
                               "domain string, robots_txt string")
    pol = RB.parse_robots(rb)
    policy_rows = [(r["domain"], r["agent"], r["rule"], r["pattern"])
                   for r in pol.collect()]

    paths = ["/" + "/".join(rng.choice(segs)
                            for _ in range(rng.randint(1, 4)))
             for _ in range(40)]
    pairs = [(d, p) for d in domains + ["none.com"] for p in paths]
    urls = spark.createDataFrame(pairs, "domain string, path string")
    for agent in ("mybot", "strange"):
        out = RB.robots_allowed(urls, pol, agent)
        got = {(r["domain"], r["path"]): r["allowed"]
               for r in out.collect()}
        for (d, p), allowed in got.items():
            want = _py_robots_allowed(policy_rows, agent, d, p)
            assert allowed == want, (agent, d, p, allowed, want)
