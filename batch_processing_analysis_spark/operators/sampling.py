"""Seeded negative sampling (M80): contrastive-training pairs at
corpus scale.

Contrastive objectives (CLIP/SimCSE-style, public literature) need,
per anchor document, k pseudo-random "negatives" — documents that are
NOT related to the anchor. Two things go wrong at 100 TB:

1. "random" via a global shuffle = a global sort (single-partition
   window trap). Here negatives come from **hash jumps**: negative i
   of an anchor lives in bucket ``hash(seed ‖ anchor ‖ i) mod B``, and
   each bucket is represented by its min-id member — every lookup is
   an equi-join on a bucket id, fully parallel, deterministic, and
   engine-reproducible (md5 convention);
2. false negatives: a near-duplicate of the anchor sampled as its
   "negative" poisons the loss. Pass ``clusters`` (doc_id →
   cluster/component id, e.g. from graph.resolve_duplicates or
   exact-dedup content hashes) and same-cluster pairs are dropped —
   the leakage-aware-split argument (M72) applied to pair mining.

Self-pairs are always dropped. A bucket whose representative IS the
anchor (or its clustermate) simply yields < k negatives for that
anchor — documented underfill, preferred over a rejection-resample
loop that would break the one-pass shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import hash60


def negative_samples(docs: DataFrame, k: int = 4, n_buckets: int = 256,
                     seed: str = "neg", id_col: str = "doc_id",
                     clusters: DataFrame | None = None,
                     cluster_col: str = "cluster") -> DataFrame:
    """(anchor_id, neg_id, i) — up to ``k`` deterministic negatives per
    anchor. One groupBy builds the B bucket representatives; anchors
    explode to k bucket probes and equi-join them. ``clusters``
    (id_col, cluster_col) enables same-cluster exclusion."""
    ids = docs.select(F.col(id_col))
    reps = (
        ids.groupBy(
            F.pmod(hash60(F.concat(F.lit(seed), F.lit("\x1f"),
                                   F.col(id_col).cast("string"))),
                   F.lit(n_buckets)).alias("_b")
        )
        .agg(F.min(id_col).alias("neg_id"))
    )
    probes = ids.select(
        F.col(id_col).alias("anchor_id"),
        F.explode(F.array(*[
            F.struct(
                F.lit(i).alias("i"),
                F.pmod(
                    hash60(F.concat(F.lit(seed), F.lit("\x1f"),
                                    F.col(id_col).cast("string"),
                                    F.lit("\x1f"), F.lit(str(i)))),
                    F.lit(n_buckets),
                ).alias("_b"),
            )
            for i in range(k)
        ])).alias("_p"),
    ).select("anchor_id", "_p.i", "_p._b")
    pairs = (
        probes.join(reps, "_b")
        .filter(F.col("anchor_id") != F.col("neg_id"))
        .select("anchor_id", "neg_id", "i")
    )
    if clusters is not None:
        ca = clusters.select(F.col(id_col).alias("anchor_id"),
                             F.col(cluster_col).alias("_ca"))
        cb = clusters.select(F.col(id_col).alias("neg_id"),
                             F.col(cluster_col).alias("_cb"))
        pairs = (
            pairs.join(ca, "anchor_id", "left")
            .join(cb, "neg_id", "left")
            .filter(
                F.col("_ca").isNull() | F.col("_cb").isNull()
                | (F.col("_ca") != F.col("_cb"))
            )
            .select("anchor_id", "neg_id", "i")
        )
    return pairs


def weighted_sample(df: DataFrame, k: int, weight_col: str,
                    seed: str, id_col: str = "doc_id") -> DataFrame:
    """Seeded weighted sampling WITHOUT replacement (M86): k rows drawn
    with probability proportional to ``weight_col`` — the quality- or
    length-weighted corpus draw (sample high-quality documents more
    often without hard-filtering the tail).

    Algorithm A-Res (Efraimidis & Spiliopoulos 2006, "Weighted random
    sampling with a reservoir", public): each row gets key
    u^(1/w) with u uniform in (0,1]; the k largest keys are the
    sample. Here u is the md5-derived 60-bit hash of ``seed ‖ id``
    mapped to (0,1] — deterministic and engine-reproducible — and the
    ordering uses the monotone-equivalent ln(u)/w (descending, id
    tiebreak), avoiding pow().

    Scale: ORDER BY + LIMIT plans as TakeOrderedAndProject — a
    distributed per-partition top-k + k-row driver merge, never a
    global sort. Rows with NULL, NaN, or non-positive weight are
    excluded (their inclusion probability is 0/undefined — and Spark
    orders NaN ABOVE every double, so without the explicit isnan guard
    a single NaN weight would pass ``> 0`` AND win the descending sort,
    monopolizing the sample).

    Returns the input columns plus ``sample_key`` (the ln(u)/w key,
    rounded; exposed so re-draws with a larger k are prefix-stable).
    """
    if k <= 0:
        raise ValueError(f"k ({k}) must be positive")
    h = hash60(F.concat(F.lit(seed), F.lit("\x1f"),
                        F.col(id_col).cast("string")))
    u = (h.cast("double") + F.lit(1.0)) / F.lit(float((1 << 60) + 1))
    wd = F.col(weight_col).cast("double")
    key = F.log(u) / wd
    return (
        df.filter(wd.isNotNull() & ~F.isnan(wd) & (wd > 0))
        .withColumn("_wkey", key)
        .orderBy(F.desc("_wkey"), F.asc(id_col))
        .limit(k)
        .withColumn("sample_key", F.round("_wkey", 9))
        .drop("_wkey")
    )
