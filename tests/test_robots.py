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


def test_empty_named_group_allows_all(spark):
    """RFC 9309 §2.2.1: a named group that EXISTS but has no rules
    (the allow-all idiom 'User-agent: mybot' + empty 'Disallow:')
    takes precedence over '*' — presence comes from the user-agent
    scan (parse_robots_agents), which the rule rows cannot see."""
    rb = spark.createDataFrame(
        [("e.com", "User-agent: mybot\nDisallow:\n\n"
                   "User-agent: *\nDisallow: /"),
         # same idiom with the named group LAST in the file
         ("f.com", "User-agent: *\nDisallow: /\n\nUser-agent: mybot")],
        "domain string, robots_txt string")
    pol = RB.parse_robots(rb)
    uas = RB.parse_robots_agents(rb)
    urls = spark.createDataFrame(
        [("e.com", "/x"), ("e.com", "/private/a"), ("f.com", "/y")],
        "domain string, path string")
    got = {(r["domain"], r["path"]): r["allowed"]
           for r in RB.robots_allowed(urls, pol, "MyBot",
                                      agents=uas).collect()}
    assert got == {("e.com", "/x"): True,
                   ("e.com", "/private/a"): True,
                   ("f.com", "/y"): True}
    # everyone else still obeys the '*' disallow-all
    got_star = {(r["domain"], r["path"]): r["allowed"]
                for r in RB.robots_allowed(urls, pol, "other",
                                           agents=uas).collect()}
    assert set(got_star.values()) == {False}
    # the documented fallback blind spot: without agents, rule-less
    # named groups are invisible and mybot wrongly inherits '*'
    fallback = {(r["domain"], r["path"]): r["allowed"]
                for r in RB.robots_allowed(urls, pol,
                                           "mybot").collect()}
    assert set(fallback.values()) == {False}


def test_no_python_in_plans(spark, policies):
    urls = spark.createDataFrame([("a.com", "/x")],
                                 "domain string, path string")
    for df in (policies, RB.robots_allowed(urls, policies, "mybot")):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


def _subtree_names(jnode, out):
    out.append(jnode.nodeName())
    kids = jnode.children()
    for i in range(kids.size()):
        _subtree_names(kids.apply(i), out)
    return out


def test_url_side_zero_exchange(spark, policies):
    """The decision join's STREAMED subtree — the URL table — contains
    no Exchange, no Sort, no Window, and no monotonically_increasing_id
    (the r10 plan had two URL-side Exchanges + a window + a synthetic
    row id; the module docstring's 'URL side never shuffles' claim is
    now structurally pinned)."""
    urls = spark.createDataFrame(
        [("a.com", f"/p/{i}") for i in range(100)],
        "domain string, path string")
    out = RB.robots_allowed(urls, policies, "mybot")
    jplan = out._jdf.queryExecution().sparkPlan()
    names = _subtree_names(jplan, [])
    assert not any("MonotonicallyIncreasingID" in n or "Window" in n
                   for n in names), names
    # locate the URL-side decision join and audit its streamed child
    def find_bhj(node):
        if "BroadcastHashJoin" in node.nodeName():
            kids = _subtree_names(node.children().apply(0), [])
            # the URL side is the subtree WITHOUT an aggregate
            # (the policy side carries the collect_list aggregation)
            if not any("Aggregate" in k for k in kids):
                return node
        kids = node.children()
        for i in range(kids.size()):
            got = find_bhj(kids.apply(i))
            if got is not None:
                return got
        return None

    bhj = find_bhj(jplan)
    assert bhj is not None, names
    streamed = _subtree_names(bhj.children().apply(0), [])
    assert not any("Exchange" in n or "Sort" in n or "Window" in n
                   for n in streamed), streamed


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


def _py_robots_allowed(policy_rows, agent_presence, agent, domain,
                       path):
    """Independent pure-Python transcription of the RFC decision.
    ``agent_presence`` is the set of (domain, agent) pairs named by
    user-agent lines — group selection keys on PRESENCE (an empty
    named group still shields its agent from '*'), not on having
    rules."""
    import re

    if (domain, agent) in agent_presence:
        rules = [r for r in policy_rows
                 if r[0] == domain and r[1] == agent]
    else:
        rules = [r for r in policy_rows
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


def _r10_window_robots_allowed(urls, policies, agent, agents):
    """The r10 decision plan (window + row_number + join-back),
    reimplemented here as a parity reference for the r11 broadcast+HOF
    rewrite — same semantics, different physical shape — with the
    presence fix applied so both implementations decide the same
    spec."""
    from pyspark.sql import Window as W

    agent = agent.lower()
    has_named = (agents.filter(F.col("agent") == agent)
                 .select("domain").distinct()
                 .withColumn("_named", F.lit(True)))
    eff = (policies.filter(F.col("agent").isin(agent, "*"))
           .join(F.broadcast(has_named), "domain", "left")
           .filter((F.col("agent") == agent) | F.col("_named").isNull())
           .select("domain", "rule", "spec_len", "regex"))
    u = urls.withColumn("_uid", F.monotonically_increasing_id())
    cand = (u.select("_uid", F.col("domain").alias("_dom"),
                     F.col("path").alias("_path"))
            .join(F.broadcast(eff), F.col("_dom") == eff["domain"],
                  "left")
            .filter(F.col("regex").isNull()
                    | F.expr("_path rlike regex")))
    wu = W.partitionBy("_uid").orderBy(
        F.desc_nulls_last("spec_len"),
        F.desc(F.col("rule") == "allow"))
    decided = (cand.withColumn("_rn", F.row_number().over(wu))
               .filter(F.col("_rn") == 1)
               .select("_uid",
                       F.coalesce(F.col("rule") != "disallow",
                                  F.lit(True)).alias("allowed")))
    return (u.join(decided, "_uid", "left")
            .withColumn("allowed", F.coalesce("allowed", F.lit(True)))
            .drop("_uid"))


def test_fuzzed_agreement_with_reference_resolver(spark):
    """The Spark parse+decide pipeline agrees with an independent
    Python transcription AND with the r10 window-plan reference on
    randomized policies and paths — including rule-less groups (the
    q173 DuckDB oracle is the fourth implementation, driver-gated)."""
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
            # 0 rules = the allow-all idiom: presence without rules
            for _ in range(rng.randint(0, 4)):  # rules per group
                lines.append(rng.choice(["Allow", "Disallow"])
                             + ": " + rand_pattern())
        domains.append(f"d{di}.com")
        texts.append("\n".join(lines))
    # a mid-file 0-rule group merges into the NEXT group's user-agent
    # lines (consecutive UA lines share a group), so only a TRAILING
    # rule-less group survives — plant one deterministically
    domains.append("d8.com")
    texts.append("User-agent: *\nDisallow: /\n\nUser-agent: mybot")
    rb = spark.createDataFrame(list(zip(domains, texts)),
                               "domain string, robots_txt string")
    pol = RB.parse_robots(rb)
    uas = RB.parse_robots_agents(rb)
    policy_rows = [(r["domain"], r["agent"], r["rule"], r["pattern"])
                   for r in pol.collect()]
    presence = {(r["domain"], r["agent"]) for r in uas.collect()}
    assert any((d, a) in presence and not any(
        pr[0] == d and pr[1] == a for pr in policy_rows)
        for d, a in presence), "fixture must include a rule-less group"

    paths = ["/" + "/".join(rng.choice(segs)
                            for _ in range(rng.randint(1, 4)))
             for _ in range(40)]
    pairs = [(d, p) for d in domains + ["none.com"] for p in paths]
    urls = spark.createDataFrame(pairs, "domain string, path string")
    for agent in ("mybot", "strange"):
        out = RB.robots_allowed(urls, pol, agent, agents=uas)
        got = {(r["domain"], r["path"]): r["allowed"]
               for r in out.collect()}
        r10 = {(r["domain"], r["path"]): r["allowed"]
               for r in _r10_window_robots_allowed(
                   urls, pol, agent, uas).collect()}
        assert got == r10, "r11 HOF plan diverged from r10 window plan"
        for (d, p), allowed in got.items():
            want = _py_robots_allowed(policy_rows, presence, agent,
                                      d, p)
            assert allowed == want, (agent, d, p, allowed, want)


def test_crawl_schedule_delay_resolution(spark):
    """Effective-delay selection mirrors the RFC group rule: named
    delay wins; a rule-less named group shadows the '*' delay down to
    the DEFAULT (obey only your own group); no robots -> default; an
    agent named in two groups keeps the politest delay."""
    rb = spark.createDataFrame(
        [("s.com", "User-agent: *\nCrawl-delay: 2"),
         ("n.com", "User-agent: mybot\nCrawl-delay: 0.5\n\n"
                   "User-agent: *\nCrawl-delay: 5"),
         ("e.com", "User-agent: mybot\nDisallow:\n\n"
                   "User-agent: *\nCrawl-delay: 9"),
         ("t.com", "User-agent: mybot\nCrawl-delay: 3\n\n"
                   "User-agent: other\nUser-agent: mybot\n"
                   "Crawl-delay: 4")],
        "domain string, robots_txt string")
    urls = spark.createDataFrame(
        [(d, f"/p{i}", i) for d in
         ("s.com", "n.com", "e.com", "t.com", "none.com")
         for i in range(3)],
        "domain string, path string, score int")
    out = RB.crawl_schedule(
        urls, RB.parse_crawl_delays(rb), "MyBot", order_col="score",
        agents=RB.parse_robots_agents(rb))
    rows = {(r["domain"], r["path"]):
            (r["crawl_delay_s"], r["fetch_slot"], r["fetch_offset_s"])
            for r in out.collect()}
    assert rows[("s.com", "/p2")] == (2.0, 2, 4.0)
    assert rows[("n.com", "/p1")] == (0.5, 1, 0.5)
    # rule-less named group: default 1.0, NOT the '*' group's 9
    assert rows[("e.com", "/p2")] == (1.0, 2, 2.0)
    assert rows[("none.com", "/p0")] == (1.0, 0, 0.0)
    # two groups naming the agent: max(3, 4) = 4
    assert rows[("t.com", "/p1")] == (4.0, 1, 4.0)
    # slots are dense 0..n-1 within every domain
    for d in ("s.com", "n.com", "e.com", "t.com", "none.com"):
        assert sorted(s for (dd, _), (_, s, _) in rows.items()
                      if dd == d) == [0, 1, 2]


def test_crawl_schedule_url_side_plan(spark):
    """One URL-side exchange, on the domain key (the partitioning a
    crawl executor needs anyway); the delay dimension broadcasts."""
    rb = spark.createDataFrame(
        [("s.com", "User-agent: *\nCrawl-delay: 2")],
        "domain string, robots_txt string")
    urls = spark.createDataFrame(
        [("s.com", f"/p{i}", i) for i in range(20)],
        "domain string, path string, score int")
    out = RB.crawl_schedule(urls, RB.parse_crawl_delays(rb), "mybot",
                            order_col="score",
                            agents=RB.parse_robots_agents(rb))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
