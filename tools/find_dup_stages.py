"""Duplicate-stage detector: run each named query once (after an
untimed warm-up) and group its stages by (inputBytes,
shuffleWriteBytes, taskCount) — two stages with byte-identical input
AND byte-identical shuffle output are almost always the same subtree
executed twice (a multi-consumer frame missing a staging barrier; the
q34 occurrence-denominator fan-out was found exactly this way).
Self-join sides share input but differ in output, so they don't trip
the detector.

Usage: python tools/find_dup_stages.py q34_waiting_time_report [...]
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_MIN_PARTITION_SIZE
(bench confs, so findings correspond to board rows).
"""
import json
import os
import sys
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

MIN_RUN_MS = 200        # ignore sub-noise stages
MIN_SHUFFLE_OUT = 1     # a zero-output stage pair carries no signal


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession
    spark = (
        SparkSession.builder.master(f"local[{cpus}]").appName("dupstages")
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
    import __spark_entry__ as entry_mod
    from batch_processing_analysis_spark.plans import registry as _reg
    qs = dict(entry_mod.queries())
    for _n, _f in _reg.EXTRA_QUERIES.items():
        qs.setdefault(_n, _f)
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId

    def stages():
        url = f"{ui}/api/v1/applications/{app}/stages?status=complete"
        with urllib.request.urlopen(url) as r:
            return json.load(r)

    for name in names:
        fn = qs.get(name)
        if fn is None:
            print(f"{name}: UNKNOWN", flush=True)
            continue
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        seen = {s["stageId"] for s in stages()}
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
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
            print(f"{name}: no duplicate stages above thresholds", flush=True)
            continue
        print(f"{name}: {len(dups)} duplicate group(s)", flush=True)
        for (inb, shr, shw, ntasks), grp in sorted(
                dups, key=lambda kg: -max(g.get("executorRunTime", 0)
                                          for g in kg[1])):
            ids = [g["stageId"] for g in grp]
            runs = [g.get("executorRunTime", 0) for g in grp]
            print(f"  x{len(grp)} stages {ids} runMs={runs} "
                  f"in={inb} shR={shr} shW={shw} tasks={ntasks}", flush=True)
            for g in grp:
                det = [ln.strip() for ln in g.get("details", "").split("\n")
                       if "batch_processing" in ln][:2]
                print(f"    [{g['stageId']}] {g['name'][:90]}")
                for ln in det:
                    print(f"        {ln[:160]}")
    spark.stop()


if __name__ == "__main__":
    main()
