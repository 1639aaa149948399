"""Count-min sketch (M67): fixed-memory frequency estimation, the
frequency member of the sketch family (M50 holds HLL cardinality and
GK quantiles).

Cormode & Muthukrishnan 2005 ("An improved data stream summary: the
count-min sketch and its applications"): a depth×width counter grid;
every item increments one counter per row (bucket = hash_d(item) mod
width); the estimate is the MIN over rows — always ≥ the true count,
over by at most ≈ 2·N/width with probability 1 − 2⁻ᵈᵉᵖᵗʰ.

Why this shape at 100 TB: the sketch state is depth·width rows
REGARDLESS of vocabulary size, the build is one partial-aggregatable
groupBy over flat (d, bucket) rows (map-side combine collapses each
partition to ≤ depth·width rows before the shuffle), and two sketches
built on different data splits merge by adding counters — the
classic distributed-counting trade when exact per-key counts would
shuffle billions of distinct keys.

Hashing is the repo's portable ``hash60`` convention (md5-derived, see
operators/dedup.py:42), so a DuckDB oracle twin reproduces the grid —
and therefore every estimate — bit-for-bit. No UDFs, no arrays beyond
one depth-sized literal per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import hash60


def _bucket(item: Column, d: int, width: int) -> Column:
    """Row-``d`` bucket of ``item``: hash60(d ‖ unit-sep ‖ item) mod
    width (hash60 is non-negative, so ``pmod`` == the oracle's ``%``)."""
    return F.pmod(
        hash60(F.concat(F.lit(str(d)), F.lit("\x1f"), item.cast("string"))),
        F.lit(width),
    )


def cms_sketch(items: DataFrame, item_col: str = "item",
               depth: int = 4, width: int = 1024,
               weight_col: str | None = None) -> DataFrame:
    """Build the sketch: one row per occupied (d, bucket) counter,
    ``c`` = occurrence count (or sum of ``weight_col``) of the items
    hashing there. ≤ depth·width rows regardless of input size.
    """
    grid = items.select(
        F.explode(F.array(*[
            F.struct(F.lit(d).alias("d"),
                     _bucket(F.col(item_col), d, width).alias("bucket"))
            for d in range(depth)
        ])).alias("_db"),
        *( [F.col(weight_col).alias("_w")] if weight_col else [] ),
    ).select("_db.d", "_db.bucket", *(["_w"] if weight_col else []))
    agg = F.sum("_w") if weight_col else F.count(F.lit(1))
    return grid.groupBy("d", "bucket").agg(agg.alias("c"))


def cms_estimate(sketch: DataFrame, queries: DataFrame,
                 item_col: str = "item",
                 depth: int = 4, width: int = 1024) -> DataFrame:
    """Point-query the sketch: per distinct query item, ``est`` =
    min over rows of its bucket counter (0 where the bucket is
    empty). ``depth``/``width`` MUST match the build. The sketch side
    is ≤ depth·width rows — Spark broadcasts it; the query side never
    shuffles.
    """
    q = queries.select(item_col).distinct()
    qe = q.select(
        F.col(item_col),
        F.explode(F.array(*[
            F.struct(F.lit(d).alias("d"),
                     _bucket(F.col(item_col), d, width).alias("bucket"))
            for d in range(depth)
        ])).alias("_db"),
    ).select(item_col, "_db.d", "_db.bucket")
    return (
        qe.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches built with the SAME (depth, width): counters
    add. This is what makes the sketch distributive — per-day / per-
    split sketches combine without touching the raw data again."""
    return (
        a.unionByName(b)
        .groupBy("d", "bucket")
        .agg(F.sum("c").alias("c"))
    )


def exact_heavy_hitters(items: DataFrame, item_col: str = "item",
                        k: int = 100) -> DataFrame:
    """Two-pass EXACT heavy hitters without a full-cardinality shuffle
    (M112; Misra & Gries 1982 "Finding repeated elements"; merge rule
    and mergeability bound from Agarwal et al. 2012, "Mergeable
    summaries").

    Returns ``(item_col, n)`` — the EXACT occurrence count of every
    item whose global count strictly exceeds ``N/(k+1)`` — without
    ever shuffling the full item cardinality:

    - **Pass 1** (``mapInPandas``, Arrow-batched): each partition
      folds its batches into a Misra-Gries summary of ``k`` counters
      (add each batch's value_counts, then truncate by subtracting the
      (k+1)-th largest counter and dropping ≤0 — at most ``k`` values
      can sit strictly above that cut). MG's guarantee: a summary
      undercounts any item by at most n_p/(k+1), so an item with
      partition count > n_p/(k+1) MUST survive its partition summary.
      Since Σ_p n_p/(k+1) = N/(k+1), any global heavy hitter exceeds
      the per-partition threshold in at least one partition — the
      union of summaries (≤ partitions·k rows) is a provable candidate
      superset.
    - **Pass 2**: exact counts of candidates only — a broadcast
      left-semi join prunes the re-scan to candidate rows, the groupBy
      shuffles ≤ partitions·k distinct keys, and the integer filter
      ``n·(k+1) > N`` (N from a 1-row broadcast cross-join, no driver
      action) keeps exactly the true heavy hitters.

    Why this shape at 100 TB: a vocabulary-wide ``groupBy(token)``
    shuffles billions of distinct keys to answer a question about the
    top ~k of them; here the shuffle is bounded by partitions·k
    REGARDLESS of cardinality, both scans are full-speed columnar, and
    the only Python is one Arrow-batched dict fold per partition. The
    CMS path above answers point queries approximately in fixed
    memory; this answers the top-of-distribution question exactly.

    The result is deterministic and partitioning-independent: MG
    candidate SETS vary with partitioning, but pass 2 re-counts
    exactly and the final filter depends only on true counts — any
    candidate superset yields the identical output (the DuckDB twin is
    a plain ``HAVING count(*)·(k+1) > total``).

    NULL items are first-class (ADVICE r5): pass 1 counts them
    (``value_counts(dropna=False)``, the NaN/None key normalized to a
    single ``None`` counter — since Python 3.10 two distinct float-NaN
    objects hash as distinct dict keys, so un-normalized NaN keys
    would fragment the counter across batches) and pass 2's semi join
    is null-safe, so a NULL that truly exceeds N/(k+1) comes back as a
    NULL-keyed output row, matching the plain groupBy/HAVING twin.
    ``item_col`` must be an atomic type (the NaN normalization uses a
    scalar ``pd.isna``).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    import pandas as pd
    from pyspark.sql.types import StructType

    field = items.schema[item_col]
    src = items.select(item_col)

    def mg_partition(batches):
        counters: dict = {}
        for pdf in batches:
            counts = pdf[item_col].value_counts(dropna=False)
            for val, c in counts.items():
                key = None if pd.isna(val) else val
                counters[key] = counters.get(key, 0) + int(c)
            if len(counters) > k:
                cut = sorted(counters.values(), reverse=True)[k]
                counters = {v: c - cut
                            for v, c in counters.items() if c > cut}
        yield pd.DataFrame({item_col: list(counters.keys())},
                           dtype=object)

    cand = src.mapInPandas(
        mg_partition, schema=StructType([field])
    ).distinct()
    total = src.agg(F.count(F.lit(1)).alias("_total"))
    return (
        src.join(F.broadcast(cand),
                 src[item_col].eqNullSafe(cand[item_col]), "left_semi")
        .groupBy(item_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("n") * F.lit(k + 1) > F.col("_total"))
        .select(item_col, "n")
    )


def bloom_build(items: DataFrame, item_col: str = "item",
                m_bits: int = 1 << 16, k: int = 5,
                seed: str = "bloom:0") -> DataFrame:
    """Relational Bloom filter build (M117; Bloom 1970, "Space/time
    trade-offs in hash coding with allowable errors"): the membership
    member of the sketch family (M50 cardinality, M67 frequency).

    The filter is the DISTINCT set-bit table ``(bit)`` — each item
    sets ``k`` bits, bit_d = hash60(seed ‖ d ‖ item) mod m_bits (the
    CMS bucket convention, so a DuckDB twin reproduces every position
    bit-for-bit). ≤ m_bits rows regardless of input cardinality, built
    by one partial-aggregated distinct — the shuffle carries at most
    partitions·m_bits rows, never the input's key cardinality. Two
    filters with the same (m_bits, k, seed) merge by
    :func:`bloom_merge` (distinct union — exactly the bitwise OR), the
    property that makes the filter the standard broadcast-sized
    membership gate for INCREMENTAL dedup at corpus scale: yesterday's
    corpus compresses to m_bits bits, today's delta probes it without
    touching yesterday's rows ([[operators/incremental.py]] runs the
    exact anti-join when both sides ARE available).

    Guarantees (and what the tests pin): NO false negatives ever —
    every inserted item probes all-k-bits-set by construction; false
    positives at rate ≈ (set_bits/m)^k (:func:`bloom_fpr_micro`).
    """
    if m_bits <= 0 or k <= 0:
        raise ValueError(f"m_bits ({m_bits}) and k ({k}) must be positive")
    return (
        items.select(
            F.explode(F.array(*[
                F.pmod(hash60(F.concat(F.lit(seed), F.lit("\x1f"),
                                       F.lit(str(d)), F.lit("\x1f"),
                                       F.col(item_col).cast("string"))),
                       F.lit(m_bits)).alias("bit")
                for d in range(k)
            ])).alias("bit"))
        .distinct()
    )


def bloom_probe(items: DataFrame, filt: DataFrame,
                item_col: str = "item", m_bits: int = 1 << 16,
                k: int = 5, seed: str = "bloom:0") -> DataFrame:
    """Probe: item → its k bit positions → count how many are set →
    ``maybe`` = 1 iff all k hit (possibly present; 0 is a CERTAIN
    absence). One equi-join of the probe's (item, bit) rows against
    the ≤ m_bits-row filter — broadcast-sized by construction — and a
    per-item count; no row of the filter's source corpus is touched.
    Duplicate probe items collapse (the output is per distinct item).
    """
    pos = items.select(F.col(item_col)).distinct().select(
        F.col(item_col),
        F.explode(F.array(*[
            F.pmod(hash60(F.concat(F.lit(seed), F.lit("\x1f"),
                                   F.lit(str(d)), F.lit("\x1f"),
                                   F.col(item_col).cast("string"))),
                   F.lit(m_bits)).alias("bit")
            for d in range(k)
        ])).alias("bit"),
    )
    hits = (
        pos.join(filt.select("bit").withColumn("_set", F.lit(1)),
                 "bit", "left")
        .groupBy(item_col)
        .agg(F.count("_set").alias("_hits"))
    )
    return hits.select(
        item_col,
        (F.col("_hits") == k).cast("int").alias("maybe"),
    )


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """OR of two same-shaped filters: distinct union of set bits.
    ``probe(merge(A, B)) == probe on the union corpus`` exactly (same
    positions, same union of bits) — the mergeability the incremental
    path relies on."""
    return a.select("bit").unionByName(b.select("bit")).distinct()


def bloom_fpr_micro(filt: DataFrame, m_bits: int, k: int) -> DataFrame:
    """Observed false-positive-rate estimate, integer micros:
    ``floor((set_bits/m)^k · 10⁶)`` — the load-dependent actual rate
    (Bloom 1970 eq. for a given occupancy), not the design-point
    formula. One count over the ≤ m_bits-row filter; the pow is on a
    1-row frame."""
    if m_bits <= 0 or k <= 0:
        raise ValueError(f"m_bits ({m_bits}) and k ({k}) must be positive")
    return filt.agg(
        F.count(F.lit(1)).alias("set_bits"),
    ).select(
        "set_bits",
        F.floor(F.pow(F.col("set_bits").cast("double") / F.lit(m_bits),
                      F.lit(k)) * F.lit(1_000_000))
        .cast("long").alias("fpr_micro"),
    )
