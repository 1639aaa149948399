"""Bucketed PPJoin base state (M131, operators/incremental.py):
increment-from-published-base output is identical to the batch
operator's delta-touching pairs (even though the frozen base-time df
order ranks prefixes differently than fresh union df), and the base
side of the candidate join reads bucket-aligned — no Exchange over the
published ranked table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from batch_processing_analysis_spark.operators.dedup import ppjoin_pairs
from batch_processing_analysis_spark.operators.incremental import (
    ppjoin_increment_from_base,
    publish_ppjoin_base,
)
from batch_processing_analysis_spark.sources.bucketed import load_bucketed
from batch_processing_analysis_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def published_base(spark, sf_dir, tmp_path_factory):
    wh = tmp_path_factory.mktemp("ppj_wh")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.filter(F.col("doc_id") % 2 == 0)
    # external tables so the parquet path is known for the degraded read
    publish_ppjoin_base(spark, base, "ppjb", k=3, num_buckets=8,
                        path_root=str(wh))
    yield docs, str(wh)
    for t in ("ppjb_ranked", "ppjb_df", "ppjb_sets", "ppjb_pstats"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_increment_from_base_identity(spark, sf_dir, published_base):
    docs, _ = published_base
    delta = docs.filter(F.col("doc_id") % 2 == 1)
    inc = {(r.id_a, r.id_b): r.jac_micro
           for r in ppjoin_increment_from_base(
               spark, delta, "ppjb", t_pct=50, k=3).collect()}
    full = {(r.id_a, r.id_b): r.jac_micro
            for r in ppjoin_pairs(docs, t_pct=50, k=3).collect()}
    expected = {p: j for p, j in full.items()
                if p[0] % 2 == 1 or p[1] % 2 == 1}
    assert inc == expected
    assert inc, "fixture produced no cross-delta pairs"


def test_base_prefix_scan_is_exchange_free(spark, published_base):
    """Relative plan assertion: the candidate join against the
    BUCKETED ranked table needs exactly one fewer Exchange than the
    identical join against a bucketing-blind path read of the same
    parquet files (the missing one being the base-side tk shuffle)."""
    docs, wh = published_base
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        delta_pfx = (
            docs.filter(F.col("doc_id") % 2 == 1).limit(50)
            .select(F.col("doc_id").alias("gid"),
                    F.xxhash64("text").alias("tk"),
                    F.length("text").alias("n"),
                    F.lit(1).alias("rn"))
        )

        def cand_plan(base_ranked):
            a = delta_pfx.alias("a")
            b = base_ranked.alias("b")
            j = a.join(b, (F.col("a.tk") == F.col("b.tk"))
                       & (F.col("a.gid") != F.col("b.gid")))
            return j._jdf.queryExecution().executedPlan().toString()

        bucketed = cand_plan(load_bucketed(spark, "ppjb_ranked"))
        degraded = cand_plan(spark.read.parquet(f"{wh}/ppjb_ranked"))
        assert bucketed.count("Exchange") \
            == degraded.count("Exchange") - 1, (bucketed, degraded)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_from_base_guard_trips_and_passes(spark, published_base):
    """r8 guard symmetry: ppjoin_increment_from_base measures the
    prefix-df bound from the published ranked table + delta before the
    candidate join."""
    from batch_processing_analysis_spark.operators.dedup import (
        CandidateVolumeExceeded,
    )

    docs, _ = published_base
    delta = docs.filter(F.col("doc_id") % 2 == 1)
    with pytest.raises(CandidateVolumeExceeded):
        ppjoin_increment_from_base(spark, delta, "ppjb", t_pct=50, k=3,
                                   max_candidates=1).collect()
    inc = {(r.id_a, r.id_b): r.jac_micro
           for r in ppjoin_increment_from_base(
               spark, delta, "ppjb", t_pct=50, k=3,
               max_candidates=1_000_000_000).collect()}
    full = {(r.id_a, r.id_b): r.jac_micro
            for r in ppjoin_pairs(docs, t_pct=50, k=3).collect()}
    assert inc == {p: j for p, j in full.items()
                   if p[0] % 2 == 1 or p[1] % 2 == 1}


def test_stats_guard_bound_identical_to_base_scan(spark, published_base):
    """r9 delta-proportional guard (VERDICT r8 task 4): the bound the
    guard measures from the published ``_pstats`` table is bit-identical
    to the bound the r8 base-scan form measures from raw ranked lineage
    — proven by tripping both paths at max_candidates=0 and comparing
    the integers in the refusal (hiding the stats table forces the
    fallback)."""
    import re

    from batch_processing_analysis_spark.operators.dedup import (
        CandidateVolumeExceeded,
    )

    docs, _ = published_base
    delta = docs.filter(F.col("doc_id") % 2 == 1)

    def _trip_bound():
        with pytest.raises(CandidateVolumeExceeded) as ei:
            ppjoin_increment_from_base(spark, delta, "ppjb", t_pct=50,
                                       k=3, max_candidates=0).collect()
        return int(re.search(r"upper bound (\d+) exceeds",
                             str(ei.value)).group(1))

    with_stats = _trip_bound()
    spark.sql("ALTER TABLE ppjb_pstats RENAME TO ppjb_pstats_hidden")
    try:
        without_stats = _trip_bound()
    finally:
        spark.sql("ALTER TABLE ppjb_pstats_hidden RENAME TO ppjb_pstats")
    assert with_stats == without_stats and with_stats > 0
