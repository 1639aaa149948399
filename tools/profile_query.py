"""Stage-level profile of one registered query via the Spark UI REST
API (guide §1.1/§7.1 empirical loop, in-terminal): untimed warm-up,
then ONE timed noop-sink run; prints per-stage executorRunTime /
executorCpuTime / shuffle and input bytes plus the job timeline, so
single-task CPU-dense stages, driver-only planning gaps, and
blocked-waiting stages are visible without the UI.

Usage: python tools/profile_query.py q140_ppjoin_exact
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_MIN_PARTITION_SIZE
(same session confs as bench.py so the profile matches the board).
"""
import json
import os
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    name = sys.argv[1]
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
    import __spark_entry__ as entry_mod
    from batch_processing_analysis_spark.plans import registry as _reg
    qs = dict(entry_mod.queries())
    for _n, _f in _reg.EXTRA_QUERIES.items():
        qs.setdefault(_n, _f)
    fn = qs[name]
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId

    def stages():
        url = f"{ui}/api/v1/applications/{app}/stages?status=complete"
        with urllib.request.urlopen(url) as r:
            return json.load(r)

    seen = {s["stageId"] for s in stages()}
    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    time.sleep(0.5)
    new = [s for s in stages() if s["stageId"] not in seen]
    new.sort(key=lambda s: -(s.get("executorRunTime", 0)))
    print(f"\n{name}: wall={wall:.3f}s, {len(new)} stages")
    print(f"{'stage':>5} {'tasks':>5} {'runMs':>7} {'cpuMs':>8} "
          f"{'shRead':>9} {'shWrite':>9} {'input':>10}  name")
    for s in new:
        print(f"{s['stageId']:>5} {s['numCompleteTasks']:>5} "
              f"{s.get('executorRunTime', 0):>7} "
              f"{s.get('executorCpuTime', 0) // 1000000:>8} "
              f"{s.get('shuffleReadBytes', 0):>9} "
              f"{s.get('shuffleWriteBytes', 0):>9} "
              f"{s.get('inputBytes', 0):>10}  {s['name'][:60]}")
    total = sum(s.get("executorRunTime", 0) for s in new)
    print(f"total executorRunTime = {total} ms; wall {wall * 1000:.0f} ms")
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/jobs") as r:
        jobs = json.load(r)
    ids = {s["stageId"] for s in new}
    jobs = [j for j in jobs if any(s in ids for s in j.get("stageIds", []))]
    jobs.sort(key=lambda j: j["submissionTime"])
    print(f"{len(jobs)} jobs in timed run (gaps = driver-only time):")
    for j in jobs:
        print(" ", j["jobId"], j["submissionTime"][-12:],
              j["completionTime"][-12:], j.get("numTasks"))
    spark.stop()


if __name__ == "__main__":
    main()
