"""A/B the prepare_web_corpus PSL host_source choice on the bench's
10x facade input: mapping derived from the pre-window `base` (current)
vs from the post-window `deduped` (r10 shape). Same protocol as the
facade runners (warm-up + min-of-2, noop sink)."""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ab_webcorpus")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
                os.environ.get("SPARK_GRAFT_MIN_PARTITION_SIZE", "64k"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from batch_processing_analysis_spark.functions import psl as PSL
    from batch_processing_analysis_spark.pipeline import (
        prepare_web_corpus,
        release_analysis,
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

    def gov_input():
        d = F.col("doc_id")
        url = F.concat(
            F.when(d % 2 == 0, "HTTPS").otherwise("https"),
            F.lit("://h"), (d % 5000).cast("string"),
            F.when(d % 5 == 0, ".github.io").otherwise(".example.org"),
            F.when(d % 3 == 0, ":443").otherwise(""),
            F.lit("/p/"), (d % 97).cast("string"),
        )
        return big.select("doc_id", url.alias("url"),
                          (d % 101).alias("score"))

    def current():
        return prepare_web_corpus(gov_input(), order_col="score",
                                  domain_quota=50, blocklist=gov_block)

    orig = PSL.with_psl_registered_domain

    def no_host_source():
        def patched(df, host_col, **kw):
            kw.pop("host_source", None)
            return orig(df, host_col, **kw)
        PSL.with_psl_registered_domain = patched
        try:
            return prepare_web_corpus(gov_input(), order_col="score",
                                      domain_quota=50, blocklist=gov_block)
        finally:
            PSL.with_psl_registered_domain = orig

    for label, fn in [("host_source=base", current),
                      ("mapping_from_deduped", no_host_source)]:
        out = fn()
        out.write.format("noop").mode("overwrite").save()
        release_analysis(out)
        best = None
        for _ in range(2):
            t0 = time.time()
            out = fn()
            out.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            release_analysis(out)
            best = dt if best is None else min(best, dt)
        print(f"{label}: {best:.3f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
