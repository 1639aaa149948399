"""A/B prepare_corpus(near_dedup=True)'s keep-list staging: the
ADOPTED shape (bare-text checkpoint, per-operator feature passes:
quality, language-id's internal trigram checkpoint, exact-edge
re-hash) vs two REJECTED staged-wide-pass variants (quality columns +
content hash [+ trigram array] derived in one keep-text checkpoint).
Measured r11-close over FOUR boards at sf0.1 (two sequential
min-of-2, one interleaved min-of-3, one interleaved min-of-4): adopted
7.07/8.54/8.21/8.07 s vs wide-with-tg 7.32/8.97/7.44/8.29 s vs
wide-no-tg 7.94/7.95/8.30 s — the adopted shape wins 3 of 4 with
overlapping bands, i.e. the wide stage never beats it beyond host
noise: each per-operator pass over the bare-text checkpoint computes
distinct work, and carrying staged arrays through the
edge/ngram/resolve scans costs what the merged passes save. Protocol:
warm-up + interleaved min-of-N reps (AB_REPS), noop sink, plus a
sorted-collect result-identity assertion across all shapes."""

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
        .appName("ab_neardedup")
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

    from pyspark.sql import Window as W

    from batch_processing_analysis_spark.operators import dedup as D
    from batch_processing_analysis_spark.operators import text_analysis as TA
    from batch_processing_analysis_spark.operators.graph import (
        resolve_duplicates,
    )
    from batch_processing_analysis_spark.pipeline import prepare_corpus
    from batch_processing_analysis_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang")

    def adopted_shape():
        """pipeline.prepare_corpus(near_dedup=True) as shipped:
        bare-text checkpoint + per-operator feature passes."""
        return prepare_corpus(docs, near_dedup=True)

    def _downstream(staged):
        """Shared tail: edges -> canonical keep-list -> filter/join ->
        shard window (identical across variants)."""
        qual = staged.select("doc_id", "n_tokens", "quality_score")
        edges = D.exact_pair_edges(staged, hash_col="_chash").unionByName(
            D.ngram_jaccard_pairs(staged, n=5, df_max=10, threshold=0.5)
            .select("id_a", "id_b")
        )
        canon = (
            resolve_duplicates(
                staged.withColumn("_pref_len", F.length("text")),
                edges, prefer_col="_pref_len",
            )
            .filter(F.col("is_canonical") == 1)
            .select("doc_id")
        )
        if "_tg" in staged.columns:
            pred = TA.language_id(staged, tg_col="_tg").select(
                "doc_id", "predicted_lang")
        else:
            pred = TA.language_id(staged).select(
                "doc_id", "predicted_lang")
        kept = (
            qual.filter(
                (F.col("quality_score") >= 0.2)
                & F.col("n_tokens").between(5, 10_000)
            )
            .join(canon, "doc_id", "left_semi")
            .join(pred, "doc_id")
        )
        w = W.partitionBy("predicted_lang").orderBy("doc_id").rowsBetween(
            W.unboundedPreceding, 0
        )
        return (
            kept.withColumn("_cum", F.sum("n_tokens").over(w))
            .select(
                "doc_id", "predicted_lang", "n_tokens", "quality_score",
                F.floor((F.col("_cum") - F.col("n_tokens")) / F.lit(4096.0))
                .cast("long").alias("shard"),
            )
        )

    def staged_wide_tg():
        """REJECTED variant B: keep-text wide stage carrying quality
        columns + trigram array + content hash through one
        checkpoint."""
        cols = TA.quality_columns("text")
        staged = docs.select(
            F.col("doc_id"), F.col("lang"), F.col("text"),
            *[c.alias(n) for n, c in cols.items()],
            TA.char_trigrams(F.col("text")).alias("_tg"),
            F.md5(D.content_norm("text")).alias("_chash"),
        ).localCheckpoint(eager=False)
        return _downstream(staged)

    def staged_no_tg():
        """REJECTED variant C: wide stage WITHOUT the trigram array
        (quality + content hash + text only); language_id self-stages
        its narrow trigram frame — trades one extra trigram pass for
        not carrying the ~3x-text array through the edge/ngram/resolve
        scans."""
        cols = TA.quality_columns("text")
        staged = docs.select(
            F.col("doc_id"), F.col("lang"), F.col("text"),
            *[c.alias(n) for n, c in cols.items()],
            F.md5(D.content_norm("text")).alias("_chash"),
        ).localCheckpoint(eager=False)
        return _downstream(staged)

    variants = [("adopted_per_operator_passes", adopted_shape),
                ("staged_wide_pass_with_tg", staged_wide_tg),
                ("staged_wide_no_tg", staged_no_tg)]

    # Result identity first: all shapes must agree row for row.
    a = sorted(tuple(r) for r in adopted_shape().collect())
    for label, fn in variants[1:]:
        b = sorted(tuple(r) for r in fn().collect())
        assert a == b and a, (
            f"{label} disagrees: {len(a)} vs {len(b)} rows; "
            f"first diff {next((x for x, y in zip(a, b) if x != y), None)}"
        )
    print(f"parity: OK ({len(a)} rows identical across all shapes)",
          flush=True)

    reps = int(os.environ.get("AB_REPS", "3"))
    best = {label: None for label, _ in variants}
    for fn in (f for _, f in variants):
        fn().write.format("noop").mode("overwrite").save()  # warm
    for _ in range(reps):  # interleaved: host drift hits all variants
        for label, fn in variants:
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best[label] = dt if best[label] is None else min(best[label], dt)
    for label, _ in variants:
        print(f"{label}: {best[label]:.3f}s (min of {reps})", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
