"""Incremental corpus merge (M32 scale extension): ingest a delta batch
against an already-deduplicated base corpus WITHOUT re-deduplicating the
base — the shape every periodically-refreshed 100 TB training corpus
needs (re-running all-pairs dedup per ingest is quadratic in ingest
count; incremental is linear in |delta|).

- **exact**: the base contributes only its content-hash registry (at
  scale: a persisted/bucketed hash table, NOT a rescan of base text);
  the delta is deduplicated within itself, then anti-joined against the
  registry. Pure equi-joins on the 128-bit hash.
- **near-dup (MinHash/LSH)**: base contributes its stored band table
  (band, bkey, id); candidates are ``delta-bands ⋈ union-bands`` — the
  base×base pair join, the dominant cost of a batch re-run, is never
  built. With the skew guard computed over the UNION band population,
  the incremental candidate set is EXACTLY the batch candidate set on
  base∪delta minus the pairs internal to base (tests/test_incremental.py
  proves the identity).

Storing the band table bucketed by (band, bkey)
(sources/bucketed.py) makes the incremental join exchange-free on the
base side: only delta bands shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import exact_dedup, lsh_candidate_pairs, minhash_signatures


def content_hash(text: Column) -> Column:
    """The exact-dedup content key: md5 of whitespace-normalized
    lowercase text (identical to :func:`dedup.exact_dedup`)."""
    return F.md5(F.trim(F.regexp_replace(F.lower(text), r"\s+", " ")))


def merge_exact_increment(base: DataFrame, delta: DataFrame,
                          id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """Base ∪ (delta rows surviving incremental exact dedup), with a
    ``origin`` provenance column ('base' | 'delta').

    A delta row survives iff it is the canonical (min-id) row of its
    content-hash cluster WITHIN delta and its hash is unseen in base.
    Base rows pass through untouched — the invariant that makes ingest
    idempotent and the base immutable. Schemas must match.

    Scale: base is touched only to produce its distinct hash registry
    (one map-side-combinable aggregate — or, operationally, a persisted
    registry table reused across ingests); everything pairwise happens
    within the (small) delta.
    """
    registry = base.select(
        content_hash(F.col(text_col)).alias("content_hash")
    ).distinct()
    canon = exact_dedup(delta, id_col, text_col).filter(
        F.col("is_canonical") == 1
    ).select(id_col, "content_hash")
    kept = (
        delta.join(canon, id_col)
        .join(registry, "content_hash", "left_anti")
        .drop("content_hash")
    )
    return base.withColumn("origin", F.lit("base")).unionByName(
        kept.withColumn("origin", F.lit("delta"))
    )


def _bands(sigs: DataFrame, id_col: str, num_hashes: int,
           rows_per_band: int) -> DataFrame:
    """(id, band, bkey) rows — same banding as dedup.lsh_candidate_pairs."""
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(
                "_", *[F.col(f"sig{b * rows_per_band + r}").cast("string")
                       for r in range(rows_per_band)]
            ).alias("bkey"),
        )
        for b in range(num_hashes // rows_per_band)
    ]
    return sigs.select(
        F.col(id_col), F.explode(F.array(*band_structs)).alias("_bb")
    ).select(id_col, F.col("_bb.band").alias("band"),
             F.col("_bb.bkey").alias("bkey"))


def lsh_increment_pairs(base: DataFrame, delta: DataFrame,
                        id_col: str = "doc_id", text_col: str = "text",
                        k: int = 3, num_hashes: int = 8,
                        rows_per_band: int = 2,
                        max_bucket: int = 1000) -> DataFrame:
    """Near-dup candidate pairs INTRODUCED by the delta: every LSH
    candidate (id_a < id_b, distinct) with at least one side in delta.

    Identity (proved in tests/test_incremental.py): with the skew guard
    evaluated over the union band population, this equals
    ``lsh_candidate_pairs(base ∪ delta)`` minus its base-internal
    pairs. Ids must be globally unique across base and delta.

    Scale shape: the join is delta-bands (small) ⋈ union-bands — the
    base×base self-join never exists. With base bands persisted
    bucketed by (band, bkey), the base side doesn't even shuffle; the
    guard population count is a map-side-combinable aggregate over
    stored bands plus the delta's.
    """
    bb = band_rows(base, id_col, text_col, k, num_hashes, rows_per_band)
    db = band_rows(delta, id_col, text_col, k, num_hashes, rows_per_band)
    return increment_pairs_from_bands(db, bb.unionByName(db), id_col,
                                      max_bucket)


def band_rows(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text", k: int = 3, num_hashes: int = 8,
              rows_per_band: int = 2) -> DataFrame:
    """(id, band, bkey) LSH band rows for ``docs`` — the unit stored in
    a durable band registry (streaming/incremental_ingest.py) or a
    bucketed base-band table (sources/bucketed.py)."""
    sig = minhash_signatures(docs, id_col, text_col, k, num_hashes)
    return _bands(sig, id_col, num_hashes, rows_per_band)


def increment_pairs_from_bands(delta_bands: DataFrame,
                               all_bands: DataFrame,
                               id_col: str = "doc_id",
                               max_bucket: int = 1000) -> DataFrame:
    """Candidate pairs with ≥1 side in the delta, from PRE-BUILT band
    rows: the join core of :func:`lsh_increment_pairs`, factored out so
    the streaming ingest loop can feed it stored bands instead of
    re-signaturing the base corpus."""
    pop = (
        all_bands.groupBy("band", "bkey")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") <= max_bucket)
        .drop("_n")
    )
    guarded_all = all_bands.join(pop, ["band", "bkey"])
    guarded_delta = delta_bands.join(pop, ["band", "bkey"])
    x, y = guarded_delta.alias("x"), guarded_all.alias("y")
    return (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bkey") == F.col("y.bkey"))
            & (F.col(f"x.{id_col}") != F.col(f"y.{id_col}")),
        )
        .select(
            F.least(F.col(f"x.{id_col}"), F.col(f"y.{id_col}")).alias("id_a"),
            F.greatest(F.col(f"x.{id_col}"), F.col(f"y.{id_col}")).alias("id_b"),
        )
        .distinct()
    )


__all__ = [
    "content_hash",
    "merge_exact_increment",
    "lsh_increment_pairs",
    "band_rows",
    "increment_pairs_from_bands",
    "lsh_candidate_pairs",
]


def corpus_diff(old: DataFrame, new: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Snapshot reconciliation between two corpus versions: one row per
    doc id in either snapshot with ``status`` ∈ {added, removed,
    changed, unchanged} — the audit report an ingest pipeline emits per
    release. Comparison is by the exact-dedup content hash (whitespace/
    case-normalized), so formatting-only edits read as ``unchanged``.

    One full outer join on the id; content hashes are narrow
    expressions — no text ever shuffles (hashes do).
    """
    o = old.select(F.col(id_col), content_hash(F.col(text_col)).alias("_ho"))
    n = new.select(F.col(id_col), content_hash(F.col(text_col)).alias("_hn"))
    return o.join(n, id_col, "full_outer").select(
        id_col,
        F.when(F.col("_ho").isNull(), F.lit("added"))
        .when(F.col("_hn").isNull(), F.lit("removed"))
        .when(F.col("_ho") == F.col("_hn"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("status"),
    )
