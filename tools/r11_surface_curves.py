"""Scale measurements for the round-10/11 surface (VERDICT r10 task 6):

1. **Warm ×factor curves for q173/q174/q175** — the robots/sitemap
   queries landed after the r10 curve run; q175 is the new
   crawl-compliance facade. Same protocol as r10: min-of-``reps``
   after an untimed warm-up at BOTH sizes, absolute times recorded so
   an overhead-dominated row is visible as such.
2. **Robots decision at a realistic URL:domain ratio** — 10⁵ (and
   ×10 = 10⁶) URLs against 10² domains' parsed policies, decision
   stage only (the parse is a fixed dimension cost, pre-materialized).
   Measures BOTH the r11 broadcast+HOF plan and the r10
   window/row_number plan (reimplemented here verbatim) so the
   zero-URL-shuffle claim carries a number, plus the ×10 URL-side
   scaling of the fixed plan.

Usage: python tools/r11_surface_curves.py [--factor 10] [--reps 3]
       [--n-urls 100000] [--out R11_SURFACE_CURVES.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

from scaling_curves import build_blowup  # noqa: E402


def _timed(fn, reps: int) -> float:
    fn()  # untimed warm-up
    best = 9e9
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(best, 3)


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _r10_window_plan(urls, policies, agent, agents):
    """The replaced r10 decision plan (window + row_number +
    join-back on monotonically_increasing_id), kept here as the
    measurement baseline for the r11 rewrite."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--n-urls", type=int, default=100_000)
    ap.add_argument("--n-domains", type=int, default=100)
    ap.add_argument("--out", default="-")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from batch_processing_analysis_spark.operators import robots as RB
    from batch_processing_analysis_spark.plans import registry
    from batch_processing_analysis_spark.plans import (  # noqa: F401
        queries_eventlog,
        queries_relational,
        queries_text,
    )
    from batch_processing_analysis_spark.session import get_spark

    spark = get_spark("r11_surface_curves")
    allq = {**registry.QUERIES, **registry.EXTRA_QUERIES}
    result: dict = {"sf_dir": args.sf_dir, "factor": args.factor,
                    "reps": args.reps}

    # ---- 1. warm curves ------------------------------------------------
    blow = build_blowup(spark, args.sf_dir, args.factor)
    curves = {}
    for name in ("q173_robots_governance", "q174_sitemap_census",
                 "q175_crawl_compliance"):
        fn = allq[name]
        base = _timed(lambda: _noop(fn(spark, args.sf_dir)), args.reps)
        big = _timed(lambda: _noop(fn(spark, blow)), args.reps)
        row = {"base_s": base, f"x{args.factor}_s": big,
               "time_ratio": round(big / base, 2) if base else None}
        if base < 1.0:
            row["note"] = ("overhead-dominated: sub-second base means "
                           "the ratio measures fixed job cost, not "
                           "scaling")
        curves[name] = row
        print(f"{name}: {row}", file=sys.stderr)
    result["warm_curves"] = curves

    # ---- 2. robots decision at 10^5 / 10^6 URLs vs 10^2 domains --------
    k = F.col("id")
    lines = F.concat(
        F.lit("User-agent: *\nDisallow: /p1/\nAllow: /p1/keep$\n"
              "Disallow: /p2/*\nDisallow: /*?x=1$\n\n"
              "User-agent: mybot\nDisallow: /p3/\nAllow: /p3/ok"))
    robots = spark.range(args.n_domains).select(
        F.concat(F.lit("d"), k.cast("string"), F.lit(".com"))
        .alias("domain"),
        lines.alias("robots_txt"))
    pol = RB.parse_robots(robots).cache()
    uas = RB.parse_robots_agents(robots).cache()
    pol.count(), uas.count()  # materialize the dimension once

    def urls_of(n):
        i = F.col("id")
        return spark.range(n).select(
            F.concat(F.lit("d"), (i % args.n_domains).cast("string"),
                     F.lit(".com")).alias("domain"),
            F.concat(F.lit("/p"), (i % 7).cast("string"), F.lit("/"),
                     i.cast("string"),
                     F.when(i % 13 == 0, "?x=1").otherwise(""))
            .alias("path"))

    dec = {}
    base_urls = urls_of(args.n_urls)
    big_urls = urls_of(args.n_urls * args.factor)
    hof_base = _timed(lambda: _noop(RB.robots_allowed(
        base_urls, pol, "mybot", agents=uas)), args.reps)
    hof_big = _timed(lambda: _noop(RB.robots_allowed(
        big_urls, pol, "mybot", agents=uas)), args.reps)
    r10_base = _timed(lambda: _noop(_r10_window_plan(
        base_urls, pol, "mybot", uas)), args.reps)
    dec["n_urls"] = args.n_urls
    dec["n_domains"] = args.n_domains
    dec["hof_base_s"] = hof_base
    dec[f"hof_x{args.factor}_s"] = hof_big
    dec["hof_url_scaling"] = round(hof_big / hof_base, 2) \
        if hof_base else None
    dec["r10_window_plan_base_s"] = r10_base
    dec["speedup_vs_r10_plan"] = round(r10_base / hof_base, 2) \
        if hof_base else None
    # parity while we're here: both plans must agree on every URL
    from pyspark.sql import functions as FF
    a = RB.robots_allowed(base_urls, pol, "mybot", agents=uas) \
        .groupBy("allowed").count().collect()
    b = _r10_window_plan(base_urls, pol, "mybot", uas) \
        .groupBy("allowed").count().collect()
    dec["allowed_histogram"] = sorted(
        (bool(r["allowed"]), r["count"]) for r in a)
    dec["plans_agree"] = sorted(
        (bool(r["allowed"]), r["count"]) for r in a) == sorted(
        (bool(r["allowed"]), r["count"]) for r in b)
    print(f"robots_decision: {dec}", file=sys.stderr)
    result["robots_decision"] = dec

    out = json.dumps(result, indent=1, sort_keys=True)
    if args.out == "-":
        print(out)
    else:
        Path(args.out).write_text(out + "\n")
        print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
