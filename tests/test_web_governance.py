"""URL-governance facade tests (pipeline.prepare_web_corpus — M154 +
M161 composed): canonical-URL dedup → PSL domain → blocklist → quota,
pinned at the component level; q172's DuckDB oracle twin covers the
whole composition at corpus scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from batch_processing_analysis_spark.pipeline import prepare_web_corpus


@pytest.fixture(scope="module")
def rules(spark):
    from batch_processing_analysis_spark.functions import psl as PSL

    return PSL.load_psl_rules(spark).cache()


def test_canonical_dedup_keeps_lowest_id(spark, rules):
    df = spark.createDataFrame(
        [(1, "HTTPS://a.github.io:443/p", 1),
         (2, "https://a.github.io/p", 9),       # same canonical URL
         (3, "https://a.github.io/q", 5),
         (4, "not a url", 7)],                  # canonicalizes to NULL
        "doc_id long, url string, score long")
    out = prepare_web_corpus(df, psl_rules=rules)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {1, 3}                  # 2 deduped, 4 dropped
    assert rows[1]["canon_url"] == "https://a.github.io/p"
    assert rows[1]["psl_domain"] == "a.github.io"


def test_blocklist_and_null_domain_passthrough(spark, rules):
    df = spark.createDataFrame(
        [(1, "https://x.blocked.com/a", 1),
         (2, "https://y.blocked.com/b", 2),
         (3, "https://kept.org/c", 3),
         (4, "https://10.0.0.1/d", 4)],         # NULL domain survives
        "doc_id long, url string, score long")
    block = spark.createDataFrame([("blocked.com",)], "domain string")
    out = prepare_web_corpus(df, blocklist=block, psl_rules=rules)
    got = {r["doc_id"]: r["psl_domain"] for r in out.collect()}
    assert got == {3: "kept.org", 4: None}


def test_quota_caps_per_psl_domain(spark, rules):
    rows = [(i, f"https://site{i % 3}.github.io/p/{i}", (i * 7) % 23)
            for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, url string, "
                                     "score long")
    out = prepare_web_corpus(df, order_col="score", domain_quota=4,
                             psl_rules=rules)
    per = {r["psl_domain"]: r["n"] for r in out.groupBy("psl_domain")
           .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per == {f"site{k}.github.io": 4 for k in range(3)}


def test_quota_requires_order_col(spark):
    df = spark.createDataFrame([(1, "https://a.com/", 1)],
                               "doc_id long, url string, score long")
    with pytest.raises(ValueError, match="order_col"):
        prepare_web_corpus(df, domain_quota=5)


def test_facade_plan_stays_jvm_side(spark, rules):
    """No Python eval anywhere in the composed plan — parse, dedup
    window, PSL broadcast join, anti-join, and two-phase quota are all
    codegen/JVM operators."""
    df = spark.createDataFrame(
        [(1, "https://a.github.io/p", 1)],
        "doc_id long, url string, score long")
    block = spark.createDataFrame([("blocked.com",)], "domain string")
    plan = prepare_web_corpus(
        df, order_col="score", domain_quota=5, blocklist=block,
        psl_rules=rules)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
