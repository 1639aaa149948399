"""Capture .explain("formatted") for named queries into plans/r12/.

Usage: python tools/explain_queries.py <suffix> q165_edjoin_increment ...

Writes plans/r12/<name>_<suffix>.txt for each query name (suffix is
"before" or "after"). Plan-only: nothing is executed, so this is safe
to run beside other Spark work. Uses the same session confs as
bench.py so the captured plans match what the bench runs.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPO = Path(__file__).resolve().parent.parent


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from bench import _scratch_dir
    from pyspark.sql import SparkSession

    _b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("explain")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
                os.environ.get("SPARK_GRAFT_MIN_PARTITION_SIZE", "64k"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
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

    out_dir = REPO / "plans" / "r12"
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        fn = qs.get(name)
        if fn is None:
            print(f"SKIP {name}: not registered", file=sys.stderr)
            continue
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        (out_dir / f"{name}_{suffix}.txt").write_text(plan)
        n_exch = plan.count("Exchange")
        n_py = (plan.count("BatchEvalPython")
                + plan.count("ArrowEvalPython"))
        print(f"{name}: exchanges={n_exch} python_nodes={n_py} "
              f"-> {name}_{suffix}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
