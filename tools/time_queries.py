"""Solo-time named queries with the bench.py protocol (untimed
warm-up + min-of-2, noop sink) in a fresh session.

Usage: python tools/time_queries.py q44_embedding_neardup q130_... [--runs N]

Prints one line per query: name, min seconds, runs. Same session confs
as bench.py so numbers are comparable to the board.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 2
    for a in sys.argv[1:]:
        if a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from bench import _scratch_dir
    from pyspark.sql import SparkSession

    _b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("time_queries")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
                os.environ.get("SPARK_GRAFT_MIN_PARTITION_SIZE", "64k"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
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
    for _name, _fn in _reg.EXTRA_QUERIES.items():
        qs.setdefault(_name, _fn)

    out = {}
    for name in names:
        fn = qs.get(name)
        if fn is None:
            print(f"SKIP {name}", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"warmup {name}")
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = None
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"timed {name} #{i}")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
        print(f"{name}: {out[name]}s")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
