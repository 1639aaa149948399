"""Stage+job profile of one bench facade via the Spark UI REST API —
the facade analog of tools/profile_query.py (guide §1.1/§7.1): untimed
warm-up, then ONE timed noop-sink run; prints per-stage executor
run/cpu/shuffle/input plus the serial job timeline with inter-job gaps,
so stage-ROUND latency (the analyze_batches cost model, VERDICT r11
task 3) is visible next to per-stage compute.

Usage: python tools/profile_facade.py analyze_batches_events
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_MIN_PARTITION_SIZE
(same session confs as bench.py so the profile matches the board).
"""
import datetime as _dt
import json
import os
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _facade_runner(spark, sf_dir: str, label: str):
    from pyspark.sql import functions as F

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

    if label == "analyze_batches_events":
        build = lambda: analyze_batches(events_as_event_log(spark, sf_dir))  # noqa: E731
    else:
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
        if label == "prepare_corpus_10x_docs":
            build = lambda: prepare_corpus(big)  # noqa: E731
        elif label == "prepare_web_corpus_10x_docs":
            _gov_block = spark.createDataFrame(
                [("example.com",)], "domain string")
            d = F.col("doc_id")
            url = F.concat(
                F.when(d % 2 == 0, "HTTPS").otherwise("https"),
                F.lit("://h"), (d % 5000).cast("string"),
                F.when(d % 5 == 0, ".github.io").otherwise(".example.org"),
                F.when(d % 3 == 0, ":443").otherwise(""),
                F.lit("/p/"), (d % 97).cast("string"),
            )
            gov = big.select("doc_id", url.alias("url"),
                             (d % 101).alias("score"))
            build = lambda: prepare_web_corpus(  # noqa: E731
                gov, order_col="score", domain_quota=50,
                blocklist=_gov_block)
        else:
            raise SystemExit(f"unknown facade {label}")

    def run_once() -> float:
        t0 = time.time()
        out = build()
        out.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        release_analysis(out)
        return dt

    return run_once


def main() -> None:
    label = sys.argv[1] if len(sys.argv) > 1 else "analyze_batches_events"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from bench import _scratch_dir
    from pyspark.sql import SparkSession
    _b = (
        SparkSession.builder.master(f"local[{cpus}]").appName("profile")
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
    )
    _scratch = _scratch_dir()
    if _scratch:
        _b = _b.config("spark.local.dir", _scratch)
    spark = _b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    run_once = _facade_runner(spark, sf_dir, label)
    run_once()  # warm-up (parquet footers, codegen, worker pool)
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId

    def stages():
        url = f"{ui}/api/v1/applications/{app}/stages?status=complete"
        with urllib.request.urlopen(url) as r:
            return json.load(r)

    seen = {s["stageId"] for s in stages()}
    wall = run_once()
    time.sleep(0.5)
    new = [s for s in stages() if s["stageId"] not in seen]
    new.sort(key=lambda s: -(s.get("executorRunTime", 0)))
    print(f"\n{label}: wall={wall:.3f}s, {len(new)} stages")
    print(f"{'stage':>5} {'tasks':>5} {'runMs':>7} {'cpuMs':>8} "
          f"{'deserMs':>7} {'gcMs':>5} "
          f"{'shRead':>9} {'shWrite':>9} {'input':>10}  name")
    for s in new[:40]:
        print(f"{s['stageId']:>5} {s['numCompleteTasks']:>5} "
              f"{s.get('executorRunTime', 0):>7} "
              f"{s.get('executorCpuTime', 0) // 1000000:>8} "
              f"{s.get('executorDeserializeTime', 0):>7} "
              f"{s.get('jvmGcTime', 0):>5} "
              f"{s.get('shuffleReadBytes', 0):>9} "
              f"{s.get('shuffleWriteBytes', 0):>9} "
              f"{s.get('inputBytes', 0):>10}  {s['name'][:52]}")
    total = sum(s.get("executorRunTime", 0) for s in new)
    print(f"total executorRunTime = {total} ms; wall {wall * 1000:.0f} ms")
    with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/jobs") as r:
        jobs = json.load(r)
    ids = {s["stageId"] for s in new}
    jobs = [j for j in jobs if any(s in ids for s in j.get("stageIds", []))]
    jobs.sort(key=lambda j: j["submissionTime"])

    def _ts(s: str) -> float:
        return _dt.datetime.strptime(
            s.replace("GMT", "+0000"), "%Y-%m-%dT%H:%M:%S.%f%z").timestamp()

    print(f"{len(jobs)} jobs in timed run (gap = driver-only time since "
          f"previous job's completion):")
    prev_end = None
    for j in jobs:
        sub, end = _ts(j["submissionTime"]), _ts(j["completionTime"])
        gap = f"{sub - prev_end:+.3f}s gap" if prev_end is not None else ""
        prev_end = max(prev_end or end, end)
        print(f"  job {j['jobId']:>4} dur {end - sub:6.3f}s "
              f"tasks {j.get('numTasks'):>4} stages "
              f"{len(j.get('stageIds', [])):>2}  {gap}  "
              f"{(j.get('description') or j.get('name', ''))[:48]}")
    spark.stop()


if __name__ == "__main__":
    main()
