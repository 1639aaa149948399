"""Public-Suffix-List registrable-domain tests (M161,
functions/psl.py) — the full publicsuffix.org algorithm over the real
vendored snapshot, pinned against hand-computed expectations from the
spec's matching rules; q171's DuckDB oracle twin re-derives the rules
and the resolution in SQL at corpus scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from batch_processing_analysis_spark.functions import psl as PSL

# (host, expected registrable domain) — every rule class in the spec:
# normal multi-level, wildcard, exception, private-section, 5-label,
# default-* fallback, and the NULL (unregistrable) shapes.
CASES = [
    # ICANN normal rules
    ("www.example.co.uk", "example.co.uk"),
    ("example.com", "example.com"),
    ("deep.a.b.example.com", "example.com"),
    # private-section suffixes — the whole point of the full list:
    # sub-sites of a shared host are DISTINCT registrable domains
    ("foo.github.io", "foo.github.io"),
    ("a.foo.github.io", "foo.github.io"),
    ("bar.github.io", "bar.github.io"),
    ("x.blogspot.com", "x.blogspot.com"),
    ("d1.cloudfront.net", "d1.cloudfront.net"),
    # wildcard *.ck: any single label under ck is a public suffix
    ("foo.ck", None),            # foo.ck IS a public suffix
    ("www.foo.ck", "www.foo.ck"),
    ("a.www.foo.ck", "www.foo.ck"),
    # exception !www.ck beats the wildcard
    ("www.ck", "www.ck"),
    ("sub.www.ck", "www.ck"),
    # 3-label wildcard + exception (*.kawasaki.jp / !city.kawasaki.jp)
    ("a.city.kawasaki.jp", "city.kawasaki.jp"),
    ("city.kawasaki.jp", "city.kawasaki.jp"),
    ("a.b.kawasaki.jp", "a.b.kawasaki.jp"),
    ("b.kawasaki.jp", None),     # wildcard makes b.kawasaki.jp a suffix
    # 5-label private rule
    ("s3.cn-north-1.amazonaws.com.cn", None),
    ("b.s3.cn-north-1.amazonaws.com.cn", "b.s3.cn-north-1.amazonaws.com.cn"),
    # default rule * — unlisted TLD
    ("foo.internal", "foo.internal"),
    ("a.foo.internal", "foo.internal"),
    # unregistrable shapes
    ("localhost", None),
    ("10.0.0.1", None),
    ("co.uk", None),
    ("github.io", None),
    # FQDN-root trailing dot strips before matching
    ("example.com.", "example.com"),
    ("foo.github.io.", "foo.github.io"),
]


@pytest.fixture(scope="module")
def rules(spark):
    return PSL.load_psl_rules(spark).cache()


def test_rules_snapshot_shape(spark, rules):
    """The vendored snapshot parses to the real list's rule mix:
    thousands of normal rules, ~100 wildcards, a handful of
    exceptions, both sections present."""
    by_kind = {r["kind"]: r["n"] for r in rules.groupBy("kind")
               .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert by_kind["normal"] > 9000
    assert 50 <= by_kind["wildcard"] <= 500
    assert 2 <= by_kind["exception"] <= 50
    sections = {r["section"] for r in
                rules.select("section").distinct().collect()}
    assert sections == {"icann", "private"}
    assert rules.filter(F.col("key_labels") > PSL.MAX_RULE_LABELS) \
        .count() == 0


def test_case_matrix(spark, rules):
    hosts = spark.createDataFrame([(h,) for h, _ in CASES],
                                  "host string")
    got = {r["host"]: r["psl_domain"]
           for r in PSL.psl_domain_map(hosts, rules).collect()}
    for host, want in CASES:
        assert got[host] == want, (host, got[host], want)


def test_join_back_and_null_semantics(spark, rules):
    df = spark.createDataFrame(
        [(1, "a.foo.github.io"), (2, "localhost"), (3, "b.github.io")],
        "doc_id long, host string")
    out = PSL.with_psl_registered_domain(df, "host", rules=rules)
    rows = {r["doc_id"]: r["psl_domain"] for r in out.collect()}
    assert rows == {1: "foo.github.io", 2: None, 3: "b.github.io"}
    assert out.count() == 3  # left join: no row loss


def test_icann_only_collapses_private(spark):
    """include_private=False reproduces the browser/registry view:
    github.io sub-sites collapse into the single ICANN registrable
    domain github.io."""
    rules = PSL.load_psl_rules(spark, include_private=False)
    hosts = spark.createDataFrame(
        [("foo.github.io",), ("bar.github.io",)], "host string")
    got = {r["host"]: r["psl_domain"]
           for r in PSL.psl_domain_map(hosts, rules).collect()}
    assert got == {"foo.github.io": "github.io",
                   "bar.github.io": "github.io"}


def test_deep_rule_snapshot_fails_loudly(spark, tmp_path):
    """A future snapshot with a rule deeper than MAX_RULE_LABELS must
    refuse to load (the tail expansion would silently never match it,
    mis-resolving those hosts) and point at the constant to bump."""
    deep = tmp_path / "psl.dat"
    deep.write_text("com\na.b.c.d.e.f\n", encoding="utf-8")
    with pytest.raises(ValueError, match="MAX_RULE_LABELS"):
        PSL.load_psl_rules(spark, path=str(deep))
    # the vendored snapshot itself loads (its deepest rule fits)
    PSL.load_psl_rules(spark)


def test_agrees_with_pinned_subset_on_its_domain(spark, rules):
    """On the pinned-subset function's own turf (co.uk-class ccTLD
    registries + plain 2-level) the two implementations agree — the
    PSL form strictly extends, never contradicts."""
    from batch_processing_analysis_spark.functions import web as WEB

    hosts = ["www.example.co.uk", "a.b.example.com.au", "x.example.com",
             "example.co.za", "www.example.org.uk"]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    both = (
        PSL.psl_domain_map(df, rules)
        .withColumn("pinned", WEB.registered_domain(F.col("host")))
    )
    for r in both.collect():
        assert r["psl_domain"] == r["pinned"], r


def test_no_python_in_plan(spark, rules):
    """The mapping plan stays JVM-side: broadcast hash join + codegen
    string ops, no BatchEvalPython / mapInPandas anywhere."""
    hosts = spark.createDataFrame([("a.foo.github.io",)], "host string")
    plan = PSL.psl_domain_map(hosts, rules)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan


def test_quota_separates_private_subsites(spark, rules):
    """The VERDICT r9 'done' criterion: domain_quota_topk keyed on the
    PSL domain keeps ``quota`` docs from EACH github.io sub-site,
    where the pinned last-2-label grouping would cap the whole shared
    host as one mega-domain."""
    from batch_processing_analysis_spark.operators.mixing import (
        domain_quota_topk,
    )

    rows = [(i, f"site{i % 4}.github.io", float(i)) for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, host string, "
                                       "score double")
    with_dom = PSL.with_psl_registered_domain(docs, "host", rules=rules)
    capped = domain_quota_topk(with_dom, "psl_domain", quota=3,
                               order_col="score")
    per = {r["psl_domain"]: r["n"] for r in capped.groupBy("psl_domain")
           .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per == {f"site{k}.github.io": 3 for k in range(4)}
    # the naive last-2-label key sees ONE domain and keeps 3 total
    from batch_processing_analysis_spark.functions import web as WEB
    naive = docs.withColumn("dom", WEB.registered_domain(F.col("host")))
    assert domain_quota_topk(naive, "dom", quota=3,
                             order_col="score").count() == 3


def test_quota_pre_rank_parity_and_bound(spark):
    """The two-phase pre-rank is bit-identical to the plain window on
    a hot-domain fixture (one domain = 80% of rows), and the rows
    entering the final per-domain exchange are bounded at
    buckets x quota."""
    from batch_processing_analysis_spark.operators.mixing import (
        domain_quota_topk,
    )

    rows = [(i, "mega.example" if i % 5 else f"d{i % 7}.example",
             float((i * 37) % 101)) for i in range(2000)]
    docs = spark.createDataFrame(rows, "doc_id long, domain string, "
                                       "score double")
    plain = domain_quota_topk(docs, "domain", quota=10,
                              order_col="score", pre_rank_buckets=0)
    staged = domain_quota_topk(docs, "domain", quota=10,
                               order_col="score", pre_rank_buckets=16)
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, staged.collect()))
    assert a == b and len(a) > 0
    # the pre-rank phase alone (replicated) bounds the hot domain
    w1_out = (
        docs.withColumn("_salt", F.pmod(F.xxhash64(F.col("doc_id")),
                                        F.lit(16)))
        .withColumn("_rn", F.row_number().over(
            __import__("pyspark.sql.window", fromlist=["Window"])
            .Window.partitionBy("domain", "_salt")
            .orderBy(F.desc("score"), F.asc("doc_id"))))
        .filter(F.col("_rn") <= 10)
    )
    hot = w1_out.filter(F.col("domain") == "mega.example").count()
    assert hot <= 16 * 10


def _py_psl_domain(host: str, rules_rows) -> str | None:
    """Independent pure-Python reference resolver (spec transcription,
    no shared code with functions/psl.py's join form)."""
    import re

    rhost = host[:-1] if host.endswith(".") else host
    if re.match(r"^[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+$", rhost):
        return None
    labels = rhost.split(".")
    n = len(labels)
    exc, best = None, 1
    for key, kind, kl in rules_rows:
        klabels = key.split(".")
        if n < len(klabels) or labels[n - len(klabels):] != klabels:
            continue
        if kind == "exception":
            exc = max(exc or 0, kl - 1)
        elif kind == "wildcard":
            if n >= kl + 1:
                best = max(best, kl + 1)
        else:
            best = max(best, kl)
    ps = exc if exc is not None else best
    if n >= ps + 1:
        return ".".join(labels[n - ps - 1:])
    return None


def test_fuzzed_agreement_with_reference_resolver(spark, rules):
    """Triple-implementation agreement: the Spark broadcast-join map,
    the q171 DuckDB oracle (driver-gated), and THIS independent
    Python transcription of the spec agree. 400 fuzzed hosts built
    from real rule keys (normal/wildcard/exception, ICANN and
    private) with 0-3 random extra labels and occasional FQDN dots."""
    import random

    rows = [(r["match_key"], r["kind"], r["key_labels"])
            for r in rules.collect() if r["match_key"].isascii()]
    rng = random.Random(20260816)
    keys = rng.sample([k for k, _, _ in rows], 300)
    hosts = []
    for key in keys:
        extra = rng.randint(0, 3)
        pre = ".".join(f"l{rng.randint(0, 99)}" for _ in range(extra))
        h = f"{pre}.{key}" if pre else key
        if rng.random() < 0.1:
            h += "."
        hosts.append(h)
    hosts += ["10.1.2.3", "localhost", "a.b.c.d.e.f.example.com",
              "x.y.nom.br", "q.sch.uk", "deep.q.sch.uk"]
    df = spark.createDataFrame([(h,) for h in set(hosts)], "host string")
    got = {r["host"]: r["psl_domain"]
           for r in __import__(
               "batch_processing_analysis_spark.functions.psl",
               fromlist=["psl"]).psl_domain_map(df, rules).collect()}
    for h in got:
        want = _py_psl_domain(h, rows)
        assert got[h] == want, (h, got[h], want)
