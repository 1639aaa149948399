"""robots.txt governance (M164 — RFC 9309, the Robots Exclusion
Protocol): parse a corpus of robots.txt documents into a per-
(domain, agent) policy table and decide URL permission by the spec's
longest-match rule — the third leg of web-corpus governance beside
per-domain quotas (M154/M162) and the PSL registrable domain (M161):
a compliant crawl corpus keeps a row only when the fetching agent was
ALLOWED to fetch it.

Spec semantics implemented (RFC 9309 + the de-facto Google
extensions, pinned in tests/test_robots.py):

- **Lines** are ``key: value`` with ``#`` comments stripped; keys are
  case-insensitive; unknown keys are ignored.
- **Groups**: a ``user-agent`` line NOT immediately preceded by
  another ``user-agent`` line starts a new group; consecutive
  ``user-agent`` lines share the group (multi-agent groups); ``allow``
  / ``disallow`` lines attach to the most recent group. Blank lines
  do NOT delimit groups (RFC 9309 §2.2.1 — only user-agent lines do).
- **Empty ``disallow:``** is allow-all and produces no rule.
- **Group selection**: an agent obeys ITS named group when one exists
  for the domain, else the ``*`` group; named and ``*`` rules never
  mix (RFC 9309 §2.2.1).
- **Matching**: rule paths are prefix patterns with ``*`` (any chars)
  and a trailing ``$`` (end anchor); the most specific (LONGEST
  pattern) match wins; on a length tie ``allow`` wins (RFC 9309
  §2.2.2). No matching rule ⇒ allowed.

Engine shape: parsing is explode + window functions (the stateful
"current group" scan becomes a running sum of group starts over the
per-document line order). The decision collapses each domain's
agent-effective rules into ONE array column on the broadcast side
(rules per domain are tens, not millions), broadcast-joins it to the
URL table once, and decides per row with higher-order functions
(``filter`` the array on RLIKE, ``array_max`` on
``struct(spec_len, is_allow)`` — struct ordering IS the RFC's
longest-match-then-allow-wins key), so the URL side — the biggest
table in a crawl pipeline — incurs ZERO exchanges, no window, no
join-back, and no synthetic row ids (tests/test_robots.py pins the
plan structurally). All expressions are built-ins; the DuckDB oracle
twin (q173) re-implements the whole parse+match in SQL independently.

RFC 9309 precedence subtlety (pinned in tests): a named group that
exists but carries NO allow/disallow rules — the common allow-all
idiom ``User-agent: mybot`` + ``Disallow:`` — still takes precedence
over ``*``. Rule rows alone cannot see such groups, so group
PRESENCE comes from :func:`parse_robots_agents`; pass its output as
``agents=`` to :func:`robots_allowed` (the policies-only fallback is
kept for pre-parsed policy tables but documents this blind spot).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

# regex metacharacters to neutralize in robots path patterns ('*' and
# a TRAILING '$' carry meaning; a non-trailing '$' is literal)
_ESCAPE_RE = r"([.+?^(){}\[\]|\\])"


def _pattern_regex(pattern: F.Column) -> F.Column:
    """Translate a robots path pattern to an anchored Java/RE2 regex:
    escape metachars, ``*`` → ``.*``, keep ONE trailing ``$`` as the
    end anchor (a non-trailing ``$`` is literal and gets escaped)."""
    anchored = pattern.endswith("$")
    body = F.when(anchored,
                  F.substring(pattern, 1, F.length(pattern) - 1)) \
        .otherwise(pattern)
    esc = F.regexp_replace(body, _ESCAPE_RE, r"\\$1")
    # Java replacement syntax: literal backslash = \\ , literal $ = \$
    esc = F.regexp_replace(esc, r"\$", "\\\\\\$")
    esc = F.regexp_replace(esc, r"\*", ".*")
    return F.concat(F.lit("^"), esc,
                    F.when(anchored, "$").otherwise(""))


def _grouped_lines(robots: DataFrame, domain_col: str,
                   text_col: str) -> DataFrame:
    """Shared parse core: robots corpus → per-line
    (domain, ln, key, val, is_ua, gid) with the RFC group scan (a
    user-agent line not preceded by one starts a group; consecutive
    user-agent lines share it) as window functions."""
    lines = robots.select(
        F.col(domain_col).alias("domain"),
        F.posexplode(F.split(F.col(text_col), "\n"))
        .alias("ln", "raw"),
    )
    clean = lines.withColumn(
        "stripped", F.trim(F.regexp_replace(F.col("raw"), "#.*", "")))
    kv = (
        clean.filter(F.col("stripped").contains(":"))
        .withColumn("key", F.lower(F.trim(
            F.regexp_extract("stripped", "^([^:]+):", 1))))
        .withColumn("val", F.trim(
            F.regexp_extract("stripped", "^[^:]+:(.*)$", 1)))
        .filter(F.col("key").isin("user-agent", "allow", "disallow",
                                  "crawl-delay"))
    )
    wl = W.partitionBy("domain").orderBy("ln")
    return (
        kv.withColumn("is_ua", (F.col("key") == "user-agent"))
        .withColumn("prev_ua", F.coalesce(F.lag("is_ua").over(wl),
                                          F.lit(False)))
        .withColumn("gstart",
                    (F.col("is_ua") & ~F.col("prev_ua")).cast("int"))
        .withColumn("gid", F.sum("gstart").over(
            wl.rowsBetween(W.unboundedPreceding, 0)))
    )


def _group_agents(grouped: DataFrame) -> DataFrame:
    return grouped.filter(F.col("is_ua")).select(
        "domain", "gid", F.lower(F.col("val")).alias("agent"))


def parse_robots(robots: DataFrame, domain_col: str = "domain",
                 text_col: str = "robots_txt", *,
                 _grouped: DataFrame | None = None) -> DataFrame:
    """robots.txt corpus → policy table
    (domain, agent, rule ∈ {allow, disallow}, pattern, spec_len,
    regex). One row per (group agent × rule line); ``spec_len`` is the
    raw pattern length (the RFC's specificity key) and ``regex`` the
    pre-translated anchored matcher, so the decision join needs no
    per-row translation.

    ``_grouped``: a pre-staged :func:`_grouped_lines` frame — callers
    that also need :func:`parse_robots_agents` /
    :func:`parse_crawl_delays` stage the group scan once (typically a
    lazy localCheckpoint) instead of re-parsing the corpus per
    derived table."""
    grouped = (_grouped if _grouped is not None
               else _grouped_lines(robots, domain_col, text_col))
    uas = _group_agents(grouped)
    rules = grouped.filter(
        F.col("key").isin("allow", "disallow")
        & (F.col("val") != "") & (F.col("gid") > 0)
    ).select("domain", "gid", F.col("key").alias("rule"),
             F.col("val").alias("pattern"))
    return (
        rules.join(uas, ["domain", "gid"])
        .select("domain", "agent", "rule", "pattern",
                F.length("pattern").alias("spec_len"),
                _pattern_regex(F.col("pattern")).alias("regex"))
    )


def parse_robots_agents(robots: DataFrame, domain_col: str = "domain",
                        text_col: str = "robots_txt", *,
                        _grouped: DataFrame | None = None) -> DataFrame:
    """robots.txt corpus → distinct (domain, agent) group PRESENCE —
    every agent NAMED by a ``user-agent`` line, including agents whose
    group carries no allow/disallow rules (the allow-all idiom).
    RFC 9309 group selection keys on presence, not on having rules:
    feed this as ``agents=`` to :func:`robots_allowed` so an empty
    named group correctly shields its agent from the ``*`` rules.
    ``_grouped``: see :func:`parse_robots`."""
    grouped = (_grouped if _grouped is not None
               else _grouped_lines(robots, domain_col, text_col))
    return _group_agents(grouped).select("domain", "agent").distinct()


def robots_sitemaps(robots: DataFrame, domain_col: str = "domain",
                    text_col: str = "robots_txt") -> DataFrame:
    """robots.txt corpus → (domain, sitemap_url): the ``Sitemap:``
    directive (sitemaps.org cross-reference; RFC 9309 treats it as a
    non-group record valid anywhere in the file, so this parse is
    deliberately group-blind — it must NOT influence or depend on the
    user-agent group scan). Feeds :mod:`.sitemaps` for crawl-seed URL
    discovery."""
    lines = robots.select(
        F.col(domain_col).alias("domain"),
        F.explode(F.split(F.col(text_col), "\n")).alias("raw"),
    )
    clean = lines.withColumn(
        "stripped", F.trim(F.regexp_replace(F.col("raw"), "#.*", "")))
    return (
        clean.filter(F.lower(F.trim(F.regexp_extract(
            "stripped", "^([^:]+):", 1))) == "sitemap")
        .select("domain", F.trim(F.regexp_extract(
            "stripped", "^[^:]+:(.*)$", 1)).alias("sitemap_url"))
        .filter(F.col("sitemap_url") != "")
    )


def parse_crawl_delays(robots: DataFrame, domain_col: str = "domain",
                       text_col: str = "robots_txt", *,
                       _grouped: DataFrame | None = None) -> DataFrame:
    """robots.txt corpus → (domain, agent, crawl_delay_s double) — the
    de-facto ``crawl-delay`` directive (not in RFC 9309 but honored by
    most crawlers), per group agent; non-numeric values are dropped,
    multiple delays in one group keep the LAST (later lines override,
    the same reading crawlers apply). Feeds a crawl scheduler's
    per-domain rate limit the same way the policy table feeds the
    fetch-permission join. ``_grouped``: see :func:`parse_robots`."""
    grouped = (_grouped if _grouped is not None
               else _grouped_lines(robots, domain_col, text_col))
    uas = _group_agents(grouped)
    delays = (
        grouped.filter((F.col("key") == "crawl-delay")
                       & (F.col("gid") > 0))
        .withColumn("crawl_delay_s",
                    F.col("val").try_cast("double"))
        .filter(F.col("crawl_delay_s").isNotNull())
    )
    wlast = W.partitionBy("domain", "gid").orderBy(F.desc("ln"))
    last = (
        delays.withColumn("_rn", F.row_number().over(wlast))
        .filter(F.col("_rn") == 1)
        .select("domain", "gid", "crawl_delay_s")
    )
    return last.join(uas, ["domain", "gid"]) \
        .select("domain", "agent", "crawl_delay_s")


def crawl_schedule(urls: DataFrame, delays: DataFrame, agent: str,
                   order_col: str, default_delay_s: float = 1.0,
                   domain_col: str = "domain",
                   agents: DataFrame | None = None) -> DataFrame:
    """Politeness scheduler (M167): assign each URL a per-domain fetch
    slot under the domain's effective ``crawl-delay`` for ``agent``.

    Effective delay follows the SAME group selection as the rules
    (RFC 9309 §2.2.1 — a crawler obeys exactly one group): when the
    agent has a named group on the domain (presence via ``agents``,
    the :func:`parse_robots_agents` output, falling back to the delay
    rows), the named group's delay applies — or ``default_delay_s``
    if that group declared none (it does NOT inherit the ``*``
    delay); otherwise the ``*`` delay, else the default.

    Adds ``crawl_delay_s`` (double), ``fetch_slot`` (0-based
    row_number within the domain by ``order_col`` then URL columns —
    deterministic), and ``fetch_offset_s`` = slot × delay, the
    earliest polite start relative to the domain's first fetch.

    Scale shape: ONE exchange of the URL table, on ``domain_col`` —
    the partitioning a crawl executor needs anyway (all of a domain's
    fetches drain from one partition) — with the delay dimension
    broadcast; skewed mega-domains are a real hazard here, but the
    schedule itself is the serialization the crawl must respect, so
    the skew is the workload's, not the plan's."""
    agent = agent.lower()
    presence = agents if agents is not None else delays
    has_named = (
        presence.filter(F.col("agent") == agent)
        .select("domain").distinct()
        .withColumn("_named", F.lit(True))
    )
    eff = (
        delays.filter(F.col("agent").isin(agent, "*"))
        .join(F.broadcast(has_named), "domain", "left")
        .filter((F.col("agent") == agent)
                | F.col("_named").isNull())
        .groupBy("domain")
        # an agent named in TWO separate groups may carry two delays
        # (groups do not merge in the file); max() keeps the
        # conservative (politest) one
        .agg(F.max("crawl_delay_s").alias("crawl_delay_s"))
        .withColumnRenamed("domain", "_cd_domain")
    )
    # a named group WITHOUT a delay row needs no special case: the
    # shadowing filter removed the '*' row, eff has no row for the
    # domain, and the coalesce resolves to the default — exactly the
    # "obey only your own group" semantics
    wd = W.partitionBy(domain_col).orderBy(
        F.col(order_col).asc(), *[F.col(c) for c in urls.columns
                                  if c not in (domain_col, order_col)])
    return (
        urls.join(F.broadcast(eff),
                  F.col(domain_col) == F.col("_cd_domain"), "left")
        .withColumn(
            "crawl_delay_s",
            F.coalesce(F.col("crawl_delay_s"),
                       F.lit(float(default_delay_s))))
        .withColumn("fetch_slot",
                    F.row_number().over(wd) - F.lit(1))
        .withColumn("fetch_offset_s",
                    F.col("fetch_slot") * F.col("crawl_delay_s"))
        .drop("_cd_domain")
    )


def robots_allowed(urls: DataFrame, policies: DataFrame, agent: str,
                   domain_col: str = "domain",
                   path_col: str = "path",
                   agents: DataFrame | None = None) -> DataFrame:
    """Add ``allowed`` (boolean) to ``urls`` for ``agent`` under the
    parsed ``policies`` (RFC 9309 decision: named group if one exists
    for the domain else ``*``; longest matching pattern wins; length
    tie → allow; no match / no policies → allowed).

    ``agents`` (output of :func:`parse_robots_agents`) supplies group
    PRESENCE so an empty named group — ``User-agent: mybot`` +
    ``Disallow:`` — correctly takes precedence over ``*`` (RFC 9309
    §2.2.1). Without it, presence is approximated from the rule rows,
    which cannot see rule-less groups and would wrongly apply the
    ``*`` rules to such agents.

    Scale shape: the per-domain effective rules collapse to one array
    column (``collect_list(struct(spec_len, is_allow, regex))``) on
    the dimension side, broadcast-join once on domain, decide in a
    single projection via higher-order functions — the URL side never
    shuffles, sorts, or windows, and no synthetic row id exists to
    diverge under recomputation."""
    agent = agent.lower()
    presence = agents if agents is not None else policies
    has_named = (
        presence.filter(F.col("agent") == agent)
        .select("domain").distinct()
        .withColumn("_named", F.lit(True))
    )
    eff = (
        policies.filter(F.col("agent").isin(agent, "*"))
        .join(F.broadcast(has_named), "domain", "left")
        .filter((F.col("agent") == agent)
                | F.col("_named").isNull())  # '*' only without a named group
        .groupBy("domain")
        .agg(F.collect_list(F.struct(
            F.col("spec_len").cast("int").alias("sl"),
            (F.col("rule") == "allow").alias("al"),
            F.col("regex").alias("rx"))).alias("_rb_rules"))
        .withColumnRenamed("domain", "_rb_domain")
    )
    # struct(sl, al) compares lexicographically: longest pattern wins,
    # and on a length tie allow (true > false) wins — exactly the RFC
    # key. filter/transform/array_max of a NULL or empty array yield
    # NULL, so no-policy domains and no-match URLs coalesce to allowed.
    best = F.expr(
        f"array_max(transform(filter(_rb_rules, "
        f"r -> `{path_col}` rlike r.rx), r -> struct(r.sl, r.al)))")
    return (
        urls.join(F.broadcast(eff),
                  F.col(domain_col) == F.col("_rb_domain"), "left")
        .withColumn("allowed",
                    F.coalesce(best.getField("al"), F.lit(True)))
        .drop("_rb_domain", "_rb_rules")
    )
