"""Duplicate-stage sweep over the FOUR bench facades (the
tools/find_dup_stages.py byte-signature detector, applied to the
exact facade compositions bench.py times: analyze_batches on the
event log, prepare_corpus / prepare_web_corpus / prepare_crawl_corpus
on the 10x doc blow-up with the bench's own fixture expressions).
Closes the loop the per-query sweep leaves open: a COMPOSITION can
duplicate a subtree even when each operator is individually staged.

Usage: python tools/find_dup_stages_facades.py [facade ...]
(default: all four). Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS,
SPARK_GRAFT_MIN_PARTITION_SIZE.
"""
import json
import os
import sys
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

MIN_RUN_MS = 200
MIN_SHUFFLE_OUT = 1


def main() -> None:
    wanted = sys.argv[1:] or ["analyze_batches", "prepare_corpus",
                              "prepare_web_corpus", "prepare_crawl_corpus"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]").appName("dupfacades")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
                os.environ.get("SPARK_GRAFT_MIN_PARTITION_SIZE", "64k"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "true")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from batch_processing_analysis_spark.pipeline import (
        analyze_batches,
        prepare_corpus,
        prepare_crawl_corpus,
        prepare_web_corpus,
        release_analysis,
    )
    from batch_processing_analysis_spark.sources.event_log import (
        events_as_event_log,
    )
    from batch_processing_analysis_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang")
    big = None
    for i in range(10):
        part = docs.select(
            (F.col("doc_id") + F.lit(i * 100_000_000)).alias("doc_id"),
            F.concat(F.col("text"), F.lit(f" v{i}")).alias("text"),
            "lang",
        )
        big = part if big is None else big.unionByName(part)
    big = big.repartition(spark.sparkContext.defaultParallelism)
    gov_block = spark.createDataFrame([("example.com",)], "domain string")

    def _gov_input():
        d = F.col("doc_id")
        url = F.concat(
            F.when(d % 2 == 0, "HTTPS").otherwise("https"),
            F.lit("://h"), (d % 5000).cast("string"),
            F.when(d % 5 == 0, ".github.io").otherwise(".example.org"),
            F.when(d % 3 == 0, ":443").otherwise(""),
            F.lit("/p/"), (d % 97).cast("string"),
        )
        return big.select("doc_id", url.alias("url"), (d % 101).alias("score"))

    def _crawl_inputs():
        d = F.col("doc_id")
        canon = F.concat(
            F.lit("https://h"), (d % 5000).cast("string"),
            F.when(d % 5 == 0, ".github.io").otherwise(".example.org"),
            F.lit("/p/"), (d % 97).cast("string"),
        )
        seeds = (
            big.filter(d % 3 != 0)
            .select((d % 512).alias("shard"),
                    F.concat(F.lit("<url><loc>"), canon,
                             F.lit("</loc></url>")).alias("frag"))
            .groupBy("shard")
            .agg(F.concat_ws("", F.collect_list("frag")).alias("body"))
            .select(
                F.concat(F.lit("sm"), F.col("shard").cast("string"))
                .alias("domain"),
                F.concat(F.lit("<urlset>"), F.col("body"),
                         F.lit("</urlset>")).alias("sitemap_xml"),
            )
        )
        k = F.col("id")
        robots = (
            spark.range(5000).filter(k % 3 != 0)
            .select(
                F.concat(
                    F.lit("h"), k.cast("string"),
                    F.when(k % 5 == 0, ".github.io")
                    .otherwise(".example.org")).alias("domain"),
                F.when(k % 2 == 0,
                       F.lit("User-agent: *\nDisallow: /p/1*"))
                .otherwise(F.lit("User-agent: bench\nDisallow:\n\n"
                                 "User-agent: *\nDisallow: /"))
                .alias("robots_txt"),
            )
        )
        return _gov_input(), seeds, robots

    runners = {
        "analyze_batches":
            lambda: analyze_batches(events_as_event_log(spark, sf_dir)),
        "prepare_corpus": lambda: prepare_corpus(big),
        "prepare_web_corpus":
            lambda: prepare_web_corpus(_gov_input(), order_col="score",
                                       domain_quota=50,
                                       blocklist=gov_block),
        "prepare_crawl_corpus":
            lambda: prepare_crawl_corpus(*_crawl_inputs(), "bench",
                                         order_col="score",
                                         domain_quota=50,
                                         blocklist=gov_block),
    }

    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId

    def stages():
        url = f"{ui}/api/v1/applications/{app}/stages?status=complete"
        with urllib.request.urlopen(url) as r:
            return json.load(r)

    for name in wanted:
        fn = runners[name]
        out = fn()
        out.write.format("noop").mode("overwrite").save()  # warm-up
        release_analysis(out)
        seen = {s["stageId"] for s in stages()}
        out = fn()
        out.write.format("noop").mode("overwrite").save()
        release_analysis(out)
        groups: dict[tuple, list] = {}
        for s in stages():
            if s["stageId"] in seen:
                continue
            key = (s.get("inputBytes", 0), s.get("shuffleReadBytes", 0),
                   s.get("shuffleWriteBytes", 0),
                   s.get("numCompleteTasks", 0))
            groups.setdefault(key, []).append(s)
        dups = [
            (key, grp) for key, grp in groups.items()
            if len(grp) > 1 and key[2] >= MIN_SHUFFLE_OUT
            and max(g.get("executorRunTime", 0) for g in grp) >= MIN_RUN_MS
        ]
        if not dups:
            print(f"{name}: no duplicate stages above thresholds",
                  flush=True)
            continue
        print(f"{name}: {len(dups)} duplicate group(s)", flush=True)
        for (inb, shr, shw, ntasks), grp in sorted(
                dups, key=lambda kg: -max(g.get("executorRunTime", 0)
                                          for g in kg[1])):
            ids = [g["stageId"] for g in grp]
            runs = [g.get("executorRunTime", 0) for g in grp]
            print(f"  x{len(grp)} stages {ids} runMs={runs} "
                  f"in={inb} shR={shr} shW={shw} tasks={ntasks}",
                  flush=True)
            for g in grp:
                print(f"    [{g['stageId']}] {g['name'][:90]}")
    spark.stop()


if __name__ == "__main__":
    main()
