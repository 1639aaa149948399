"""Scale-neutrality check for the r11 AQE coalescing floor: at x1
(sf0.1) the 64k floor re-parallelizes CPU-dense byte-light stages; at
x10 the byte-derived target dominates and the floor must be inert
(64k ~= 1m). Two linear operators exercised: dup_span_stats (explode +
hash join-back) and interval/verify-free language_id (trigram staging)."""
import os, sys, time, json
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F
floor = sys.argv[1]
spark = (SparkSession.builder.master("local[32]").appName(f"scalefloor-{floor}")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", floor)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.driver.memory", "24g")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from batch_processing_analysis_spark.sources.tables import load_table
from batch_processing_analysis_spark.operators.dedup import dup_span_stats
from batch_processing_analysis_spark.operators.text_analysis import language_id
docs = load_table(spark, "/root/testdata/sf0.1", "documents").select("doc_id", "text", "lang")
out = {}
for scale in (1, 10):
    big = None
    for i in range(scale):
        part = docs.select((F.col("doc_id") + F.lit(i * 100_000_000)).alias("doc_id"),
            F.concat(F.col("text"), F.lit(f" v{i}")).alias("text"), "lang")
        big = part if big is None else big.unionByName(part)
    big = big.repartition(spark.sparkContext.defaultParallelism).localCheckpoint(eager=True)
    for name, fn in (("dup_span", lambda: dup_span_stats(big)),
                     ("lang_id", lambda: language_id(big))):
        fn().write.format("noop").mode("overwrite").save()
        best = None
        for _ in range(2):
            t0=time.time(); fn().write.format("noop").mode("overwrite").save()
            dt=time.time()-t0; best = dt if best is None else min(best, dt)
        out[f"{name}_x{scale}"] = round(best, 3)
        print(f"{name} x{scale} [{floor}]: {best:.3f}s", flush=True)
    big.unpersist()
print(json.dumps({"floor": floor, **out}))
spark.stop()
