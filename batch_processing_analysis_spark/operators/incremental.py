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

from .checkpoints import data_barrier
from .dedup import exact_dedup, lsh_candidate_pairs, minhash_signatures


class OverlappingIdsError(ValueError):
    """An id appears in BOTH base and delta of an exact increment
    operator. The increments' flag/union construction would double
    that id's token multiset and silently shrink its similarity
    ratios — the one misuse path the r7 operators documented but did
    not police (ADVICE r7). Raised by the opt-in
    ``check_disjoint_ids`` guard; route re-ingested ids through
    :func:`corpus_diff` / the exact-hash registry first."""


def _check_disjoint_ids(base: DataFrame, delta: DataFrame, id_col: str,
                        op: str) -> None:
    """Opt-in loud-failure guard: one LEFT SEMI join on the id column,
    short-circuited by ``limit(1)`` — cost is a narrow hash join over
    ids only (no text moves), negligible next to the pair join it
    protects."""
    overlap = (
        delta.select(id_col).join(base.select(id_col), id_col,
                                  "left_semi").limit(1).collect()
    )
    if overlap:
        raise OverlappingIdsError(
            f"{op}: id {overlap[0][0]!r} is present in BOTH base and "
            f"delta — the increment would double its token multiset "
            f"and shrink its similarity ratios. Deduplicate ids first "
            f"(corpus_diff / merge_exact_increment)."
        )


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


def ppjoin_increment_pairs(base: DataFrame, delta: DataFrame,
                           id_col: str = "doc_id",
                           text_col: str = "text", t_pct: int = 50,
                           k: int = 3,
                           max_candidates: int | None = None,
                           check_disjoint_ids: bool = False) -> DataFrame:
    """EXACT incremental PPJoin (M122): every pair with Jaccard ≥
    ``t_pct/100`` and AT LEAST ONE side in ``delta`` — the exactness
    analog of :func:`lsh_increment_pairs` (VERDICT r5 stretch 8), so
    the periodically-refreshed corpus keeps a provably-complete
    near-dup answer without re-running the base×base join per ingest.

    Same prefix-filter theorem as :func:`dedup.ppjoin_pairs`
    (SSJoin/PPJoin, public), with two incremental adaptations:

    - **df order over the UNION.** The theorem holds for ANY fixed
      global token order, but both sides of one run must use the same
      one; document frequency is recomputed over base ∪ delta each
      ingest (one partial-aggregable count — at scale the base's
      (gid, shingle-hash) rows are a persisted bucketed table, so the
      recount is a scan of narrow stored rows, never a re-shingling
      of base text).
    - **symmetric prefix TABLES, per-pair index condition.** The
      batch operator's probe/index asymmetry assigns prefix lengths
      by pair roles (smaller record indexes); with one side pinned to
      delta the roles vary per pair, so both TABLES carry the basic
      bound ``L − ⌈t·L⌉ + 1`` and the JOIN CONDITION tightens the
      matched row to the smaller side's index bound
      ``L − ⌈2t/(1+t)·L⌉ + 1`` — the same candidate cut as the batch
      asymmetric tables, zero recall loss (the theorem puts the first
      common token inside the smaller's index prefix), pure codegen.
      The positional and length filters also apply (role-free).

    The base×base stage never exists: the candidate join is
    delta-prefix ⋈ union-prefix. Identity (pinned by
    tests/test_incremental.py): output == batch ppjoin_pairs on
    base ∪ delta minus the pairs internal to base. Ids must be
    globally unique across base and delta (the lsh_increment_pairs
    contract): an id present on BOTH sides would double its token
    multiset under the side flags and silently shrink its prefix
    ratios — route re-ingested ids through corpus_diff / the exact
    registry first.

    ``max_candidates`` measures Σ_g df_delta-pfx(g)·df_union-pfx(g)
    before the join and raises :class:`dedup.CandidateVolumeExceeded`
    over budget, like the batch operator. ``check_disjoint_ids=True``
    polices the globally-unique-id contract up front
    (:class:`OverlappingIdsError`) for one cheap id semi-join.
    """
    from .dedup import (
        _check_candidate_budget,
        hash60,
        shingle_rows,
    )
    from pyspark.sql import Window as W

    if not 1 <= t_pct <= 100:
        raise ValueError(f"t_pct must be in [1, 100], got {t_pct}")
    if check_disjoint_ids:
        _check_disjoint_ids(base, delta, id_col, "ppjoin_increment_pairs")
    # Per-side shingling with LITERAL delta flags (r7): the r6 form
    # shingled the tagged union and JOINED the flag back on by id —
    # a full extra shuffle of the token table that the union of two
    # flagged shingle scans makes unnecessary.
    def _tok_side(side: DataFrame, flag: bool) -> DataFrame:
        lowered = side.select(F.col(id_col),
                              F.lower(F.col(text_col)).alias(text_col))
        return shingle_rows(lowered, id_col, text_col, k).select(
            F.col(id_col).alias("gid"),
            hash60(F.col("shingle")).alias("tk"),
            F.lit(flag).alias("_delta"),
        )

    tok = data_barrier(
        _tok_side(base, False).unionByName(_tok_side(delta, True))
        .distinct()
    )
    dfreq = tok.groupBy("tk").agg(F.count(F.lit(1)).alias("_df"))
    sizes = tok.groupBy("gid").agg(F.count(F.lit(1)).alias("_n"),
                                   F.first("_delta").alias("_delta"))
    # Staged: the delta prefix, the union prefix, the guard's bound
    # aggregate, and the verify's set arrays all derive from ranked
    # (the ppjoin_pairs pattern — without it each consumer re-runs the
    # df join + rank window; measured 96 s vs ~45 s at the sf1
    # blow-up). A window-count form of _df/_n was built and
    # A/B-measured in r12: slower (see ppjoin_pairs).
    ranked = (
        tok.drop("_delta")
        .join(dfreq, "tk")
        .join(sizes, "gid")
        .withColumn("_rn", F.row_number().over(
            W.partitionBy("gid").orderBy("_df", "tk")))
    )
    ranked = data_barrier(ranked)
    ceil_tl = F.floor((F.lit(t_pct) * F.col("_n") + F.lit(99)) / F.lit(100))
    is_pfx = F.col("_rn") <= F.col("_n") - ceil_tl + 1
    pfx_all = ranked.filter(is_pfx).select(
        "gid", "tk", "_n", "_rn", "_delta")
    pfx_delta = pfx_all.filter(F.col("_delta"))
    if max_candidates is not None:
        # Σ_tk ca·cb in ONE aggregate pass over ranked (both prefix
        # memberships are row-local predicates); the r11 shape ran two
        # aggregate passes and a join. Same bound, bit-exact.
        dpfx = is_pfx & F.col("_delta")
        bound = (
            ranked.groupBy("tk").agg(
                F.sum(dpfx.cast("long")).alias("_ca"),
                F.sum(is_pfx.cast("long")).alias("_cb"))
            .agg(F.sum(F.col("_ca") * F.col("_cb")).alias("_b"))
            .collect()[0]["_b"]
        ) or 0
        _check_candidate_budget(
            int(bound), max_candidates, "ppjoin_increment_pairs",
            "lsh_increment_pairs (probabilistic recall)",
        )
    a, b = pfx_delta.alias("a"), pfx_all.alias("b")
    ubound = (F.least(F.col("a._rn"), F.col("b._rn"))
              + F.least(F.col("a._n") - F.col("a._rn"),
                        F.col("b._n") - F.col("b._rn")))

    # Per-PAIR index-prefix condition (recovers the probe/index
    # asymmetry that delta-pinning forbids at the TABLE level): the
    # theorem puts a qualifying pair's first common token inside the
    # SMALLER record's index prefix (n − ⌈2t/(1+t)·n⌉ + 1) and the
    # larger's probe prefix. Both sides carry full probe prefixes; the
    # join condition tightens the matched row to the smaller side's
    # index bound — same candidate cut as the batch operator's
    # asymmetric tables, zero recall loss, pure codegen.
    def ceil_ix(n):
        return F.floor((F.lit(2 * t_pct) * n
                        + F.lit(100 + t_pct - 1)) / F.lit(100 + t_pct))

    ix_a = F.col("a._n") - ceil_ix(F.col("a._n")) + 1
    ix_b = F.col("b._n") - ceil_ix(F.col("b._n")) + 1
    b_smaller = (
        (F.col("b._n") < F.col("a._n"))
        | ((F.col("b._n") == F.col("a._n"))
           & (F.col("b.gid") < F.col("a.gid")))
    )
    idx_cond = F.when(b_smaller, F.col("b._rn") <= ix_b) \
        .otherwise(F.col("a._rn") <= ix_a)
    cand = (
        a.join(
            b,
            (F.col("a.tk") == F.col("b.tk"))
            & (F.col("a.gid") != F.col("b.gid"))
            & (F.col("b._n") * 100 >= F.lit(t_pct) * F.col("a._n"))
            & (F.col("a._n") * 100 >= F.lit(t_pct) * F.col("b._n"))
            & idx_cond
            & (ubound * (100 + t_pct)
               >= F.lit(t_pct) * (F.col("a._n") + F.col("b._n"))),
        )
        .select(F.least(F.col("a.gid"), F.col("b.gid")).alias("id_a"),
                F.greatest(F.col("a.gid"), F.col("b.gid")).alias("id_b"))
        .distinct()
    )
    sets_arr = ranked.select("gid", "tk").groupBy("gid").agg(
        F.collect_list("tk").alias("_set"),
        F.count(F.lit(1)).alias("_n"),
    )
    va = sets_arr.select(F.col("gid").alias("id_a"),
                         F.col("_set").alias("_seta"),
                         F.col("_n").alias("_na"))
    vb = sets_arr.select(F.col("gid").alias("id_b"),
                         F.col("_set").alias("_setb"),
                         F.col("_n").alias("_nb"))
    inter = F.size(F.array_intersect(F.col("_seta"), F.col("_setb")))
    union = F.col("_na") + F.col("_nb") - F.col("_i")
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("_i", inter.cast("long"))
        .filter(F.col("_i") * 100 >= F.lit(t_pct) * union)
        .select(
            "id_a", "id_b",
            F.floor(F.col("_i") * F.lit(1_000_000) / union)
            .cast("long").alias("jac_micro"),
        )
    )


def _containment_cand(pfx_side: DataFrame, all_side: DataFrame,
                      c_pct: int) -> DataFrame:
    """Containment candidate join (A-prefix ⋈ B-all-tokens + size
    filter): frames carry ``(gid, tk, n)``. Shared by both incremental
    variants so the predicate exists once."""
    a, b = pfx_side.alias("a"), all_side.alias("b")
    return (
        a.join(
            b,
            (F.col("a.tk") == F.col("b.tk"))
            & (F.col("a.gid") != F.col("b.gid"))
            & (F.col("b.n") * 100 >= F.lit(c_pct) * F.col("a.n")),
        )
        .select(F.col("a.gid").alias("id_a"),
                F.col("b.gid").alias("id_b"))
    )


def _containment_verify(cand: DataFrame, sets_all: DataFrame,
                        c_pct: int) -> DataFrame:
    """Vernica array-intersect verify for ORDERED containment pairs:
    ``sets_all`` carries ``(gid, set, n)``; the ratio denominator is
    the contained (id_a) side's size. Shared by both incremental
    variants so the cont_micro formula exists once."""
    va = sets_all.select(F.col("gid").alias("id_a"),
                         F.col("set").alias("_seta"),
                         F.col("n").alias("_na"))
    vb = sets_all.select(F.col("gid").alias("id_b"),
                         F.col("set").alias("_setb"))
    inter = F.size(F.array_intersect(F.col("_seta"), F.col("_setb")))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("_i", inter.cast("long"))
        .filter(F.col("_i") * 100 >= F.lit(c_pct) * F.col("_na"))
        .select(
            "id_a", "id_b",
            F.floor(F.col("_i") * F.lit(1_000_000) / F.col("_na"))
            .cast("long").alias("cont_micro"),
        )
    )


def containment_increment_pairs(base: DataFrame, delta: DataFrame,
                                id_col: str = "doc_id",
                                text_col: str = "text", c_pct: int = 80,
                                k: int = 3,
                                max_candidates: int | None = None,
                                check_disjoint_ids: bool = False
                                ) -> DataFrame:
    """EXACT incremental containment join (M142): every ORDERED pair
    ``(id_a ⊆-ish id_b)`` with ``|A∩B| ≥ (c_pct/100)·|A|`` and AT
    LEAST ONE side in ``delta`` — :func:`ppjoin_increment_pairs`'s
    asymmetric sibling, completing the incremental story for the
    quote/subset join (VERDICT r6 task 3 family). Identity: output ==
    batch :func:`dedup.containment_pairs` on base ∪ delta minus its
    base-internal pairs (pinned by tests/test_containment_increment.py).

    The containment prefix principle (see :func:`dedup.
    containment_pairs`) holds for ANY fixed global token order, and
    only the CONTAINED side can be prefix-shortened — the index side
    joins all tokens. Delta-touching ordered pairs therefore come from
    exactly two joins, neither of which is base×base:

    - ``pfx(delta) ⋈ all(base ∪ delta)`` — delta docs contained in
      anything;
    - ``pfx(base) ⋈ all(delta)`` — base docs contained in delta docs
      (the base side is prefix-FILTERED rows only, and the all-tokens
      side is the small delta).

    Ids must be globally unique across base and delta (the
    lsh_increment_pairs contract): an id present on BOTH sides would
    double its token multiset under the side flags and silently
    shrink its containment ratios — route re-ingested ids through
    corpus_diff / the exact registry first.

    ``max_candidates`` measures both joins' Σ df·df bounds before
    either runs, like the batch operator.
    """
    from pyspark.sql import Window as W

    from .dedup import (
        _check_candidate_budget,
        hash60,
        shingle_rows,
    )

    if not 1 <= c_pct <= 100:
        raise ValueError(f"c_pct must be in [1, 100], got {c_pct}")
    if check_disjoint_ids:
        _check_disjoint_ids(base, delta, id_col,
                            "containment_increment_pairs")
    # Per-side shingling with literal flags — see
    # ppjoin_increment_pairs (same r7 shuffle removal).
    def _tok_side(side: DataFrame, flag: bool) -> DataFrame:
        lowered = side.select(F.col(id_col),
                              F.lower(F.col(text_col)).alias(text_col))
        return shingle_rows(lowered, id_col, text_col, k).select(
            F.col(id_col).alias("gid"),
            hash60(F.col("shingle")).alias("tk"),
            F.lit(flag).alias("_delta"),
        )

    tok = data_barrier(
        _tok_side(base, False).unionByName(_tok_side(delta, True))
        .distinct()
    )
    dfreq = tok.groupBy("tk").agg(F.count(F.lit(1)).alias("_df"))
    sizes = tok.groupBy("gid").agg(F.count(F.lit(1)).alias("_n"),
                                   F.first("_delta").alias("_delta"))
    # Join-based rank build (window-count form A/B-measured slower —
    # see ppjoin_pairs); the one-pass guard and the ranked-derived
    # all_union/sets below are the r12 changes.
    ranked = (
        tok.drop("_delta")
        .join(dfreq, "tk")
        .join(sizes, "gid")
        .withColumn("_rn", F.row_number().over(
            W.partitionBy("gid").orderBy("_df", "tk")))
    )
    ranked = data_barrier(ranked)
    ceil_cl = F.floor((F.lit(c_pct) * F.col("_n") + F.lit(99)) / F.lit(100))
    is_pfx = F.col("_rn") <= F.col("_n") - ceil_cl + 1
    pfx_all = ranked.filter(is_pfx).select(
        "gid", "tk", F.col("_n").alias("n"), "_delta")
    pfx_delta = pfx_all.filter(F.col("_delta"))
    pfx_base = pfx_all.filter(~F.col("_delta"))
    all_union = ranked.select("gid", "tk", F.col("_n").alias("n"),
                              "_delta")
    all_delta = all_union.filter(F.col("_delta"))
    if max_candidates is not None:
        # Both joins' bounds in ONE aggregate pass over ranked —
        # Σ_tk (pfx_delta·all_union + pfx_base·all_delta); all four
        # per-token counts are conditional sums of row-local
        # predicates (the r11 shape ran two aggregate passes and a
        # join). Same bound, bit-exact.
        dflag = F.col("_delta").cast("long")
        bound = (
            ranked.groupBy("tk").agg(
                F.sum(F.when(is_pfx, dflag).otherwise(F.lit(0)))
                .alias("_cad"),
                F.sum(F.when(is_pfx, 1 - dflag).otherwise(F.lit(0)))
                .alias("_cab"),
                F.count(F.lit(1)).alias("_cu"),
                F.sum(dflag).alias("_cud"))
            .agg(F.sum(F.col("_cad") * F.col("_cu")
                       + F.col("_cab") * F.col("_cud")).alias("_b"))
            .collect()[0]["_b"] or 0
        )
        _check_candidate_budget(
            int(bound), max_candidates, "containment_increment_pairs",
            "lsh_increment_pairs (probabilistic recall)",
        )

    cand = (
        _containment_cand(pfx_delta, all_union, c_pct)
        .unionByName(_containment_cand(pfx_base, all_delta, c_pct))
        .distinct()
    )
    sets_arr = ranked.select("gid", "tk").groupBy("gid").agg(
        F.collect_list("tk").alias("set"),
        F.count(F.lit(1)).alias("n"),
    )
    return _containment_verify(cand, sets_arr, c_pct)


__all__ = [
    "OverlappingIdsError",
    "content_hash",
    "merge_exact_increment",
    "lsh_increment_pairs",
    "band_rows",
    "increment_pairs_from_bands",
    "lsh_candidate_pairs",
    "ppjoin_increment_pairs",
    "containment_increment_pairs",
    "containment_increment_from_base",
    "edjoin_increment_pairs",
    "publish_edjoin_base",
    "edjoin_increment_from_base",
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


def ppjoin_prefix_stats(ranked: DataFrame,
                        extra_group_cols: tuple[str, ...] = ()
                        ) -> DataFrame:
    """Threshold-INDEPENDENT per-token guard statistics for a ranked
    token table ``(gid, tk, n, rn)`` — the publish-time half of the
    delta-proportional candidate-volume guard (VERDICT r8 task 4).

    A ranked row is in the PPJoin/containment prefix at integer
    threshold ``t`` iff ``rn ≤ n − ⌈t·n/100⌉ + 1`` iff
    ``t ≤ ⌊100·(n − rn + 1)/n⌋ =: t_max`` (pure integer algebra:
    with c = n − rn + 1, ``⌊(t·n+99)/100⌋ ≤ c ⟺ t·n ≤ 100·c``), so
    counting rows per ``(tk, t_max)`` once lets ANY later threshold
    recover its exact per-token prefix count with a filter + SUM —
    no rescan of the ranked table. Output: ``(tk, t_max, cnt)``,
    ≤ 101 rows per distinct token, typically far fewer. The stats are
    additive across corpus increments (each ranked row contributes to
    exactly one cell), so streaming waves fold by per-cell SUM.
    ``extra_group_cols`` (e.g. ``("ingest_batch",)``) lets a backfill
    job rebuild a per-wave stats registry from a ranked registry in
    one pass (:func:`backfill_ppjoin_stats`).
    """
    t_max = F.expr("CAST((100 * (n - rn + 1)) DIV n AS INT)")
    return (
        ranked.groupBy(*extra_group_cols, "tk", t_max.alias("t_max"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def prefix_counts_at(stats: DataFrame, t_pct: int) -> DataFrame:
    """Exact per-token PREFIX row counts at threshold ``t_pct`` from a
    :func:`ppjoin_prefix_stats` table: ``(tk, _cnt)`` — equals
    ``pfx(ranked).groupBy(tk).count()`` bit-for-bit (the t_max
    equivalence above), without touching the ranked table."""
    return (
        stats.filter(F.col("t_max") >= t_pct)
        .groupBy("tk").agg(F.sum("cnt").alias("_cnt"))
    )


def token_counts(stats: DataFrame) -> DataFrame:
    """Exact per-token TOTAL row counts from a
    :func:`ppjoin_prefix_stats` table: ``(tk, _cnt)`` — equals
    ``ranked.groupBy(tk).count()`` (= the document frequency, tokens
    being distinct per doc)."""
    return stats.groupBy("tk").agg(F.sum("cnt").alias("_cnt"))


def publish_ppjoin_base(spark, base: DataFrame, table_prefix: str,
                        id_col: str = "doc_id", text_col: str = "text",
                        k: int = 3, num_buckets: int = 16,
                        path_root: str | None = None) -> None:
    """Persist a base corpus's PPJoin build state as BUCKETED tables
    (M131) so every later :func:`ppjoin_increment_from_base` ingest
    joins the (huge) base side WITHOUT an Exchange — the M28 bucketing
    pattern applied to the exact-join increment. Three tables:

    - ``{prefix}_ranked`` (gid, tk, n, rn) bucketed+sorted by ``tk``:
      every token row, ranked per doc by the FROZEN base-time
      (df asc, tk) total order. Storing full ranked rows (not a
      prefix) keeps the publish threshold-independent — the increment
      filters ``rn ≤ L − ⌈t·L⌉ + 1`` at read time, which preserves
      bucketing.
    - ``{prefix}_df`` (tk, df) bucketed by ``tk``: the frozen document
      frequencies, joined (left) onto delta tokens so both sides rank
      in ONE total order; tokens unseen in base take df=0 — rarest,
      any fixed order satisfies the prefix theorem (see
      :func:`ppjoin_increment_pairs`; freezing the order is what makes
      the base state reusable — recomputing union df would change base
      prefixes every ingest).
    - ``{prefix}_sets`` (gid, set, n) bucketed by ``gid``: per-doc
      hash arrays for the Vernica verify.
    - ``{prefix}_pstats`` (tk, t_max, cnt) bucketed by ``tk``: the
      threshold-independent guard statistics
      (:func:`ppjoin_prefix_stats`) — every later increment's
      candidate-volume guard aggregates DELTA lineage only and joins
      these (VERDICT r8 task 4: per-ingest guard cost proportional to
      |delta|, not |base|). Pre-r9 publishes lack this table; the
      increments fall back to deriving the counts from
      ``{prefix}_ranked`` (the r8 shape — same bound, base-scan cost).

    The frozen order prunes slightly less than fresh union df when the
    delta shifts frequencies, but the OUTPUT is identical (exactness
    never depends on which fixed order is used) — pinned by the
    identity test against the batch operator. ``path_root`` makes the
    tables external under that directory.
    """
    from pyspark.sql import Window as W

    from ..sources.bucketed import write_bucketed
    from .dedup import hash60, shingle_rows

    def _path(table: str) -> str | None:
        return f"{path_root}/{table}" if path_root else None

    lowered = base.select(F.col(id_col),
                          F.lower(F.col(text_col)).alias(text_col))
    tok = shingle_rows(lowered, id_col, text_col, k).select(
        F.col(id_col).alias("gid"), hash60(F.col("shingle")).alias("tk")
    ).distinct().localCheckpoint(eager=False)
    dfreq = tok.groupBy("tk").agg(F.count(F.lit(1)).alias("df"))
    sizes = tok.groupBy("gid").agg(F.count(F.lit(1)).alias("n"))
    ranked = (
        tok.join(dfreq.withColumnRenamed("df", "_df"), "tk")
        .join(sizes, "gid")
        .withColumn("rn", F.row_number().over(
            W.partitionBy("gid").orderBy("_df", "tk")))
        .select("gid", "tk", "n", "rn")
    )
    ranked = ranked.localCheckpoint(eager=False)
    write_bucketed(ranked, f"{table_prefix}_ranked", "tk", num_buckets,
                   path=_path(f"{table_prefix}_ranked"))
    write_bucketed(dfreq, f"{table_prefix}_df", "tk", num_buckets,
                   path=_path(f"{table_prefix}_df"))
    write_bucketed(ppjoin_prefix_stats(ranked), f"{table_prefix}_pstats",
                   "tk", num_buckets, path=_path(f"{table_prefix}_pstats"))
    sets = tok.groupBy("gid").agg(
        F.collect_list("tk").alias("set"),
        F.count(F.lit(1)).alias("n"),
    )
    write_bucketed(sets, f"{table_prefix}_sets", "gid", num_buckets,
                   path=_path(f"{table_prefix}_sets"))


def ppjoin_increment_from_base(spark, delta: DataFrame,
                               table_prefix: str,
                               id_col: str = "doc_id",
                               text_col: str = "text", t_pct: int = 50,
                               k: int = 3,
                               max_candidates: int | None = None,
                               check_disjoint_ids: bool = False
                               ) -> DataFrame:
    """Exact incremental PPJoin against a PUBLISHED base (M131): same
    contract as :func:`ppjoin_increment_pairs` (every qualifying pair
    with ≥1 delta side, identical output to the batch operator on
    base ∪ delta minus base-internal pairs) but the base side is never
    re-shingled, never re-ranked, and never shuffled — its prefix rows
    arrive pre-bucketed on the join key ``tk``
    (tests/test_bucketed_ppjoin.py asserts the base scan feeds the
    candidate join with NO Exchange). Only the delta (small, by
    definition of an ingest) pays shuffles.

    Ranking uses the base-frozen (df, tk) order for BOTH sides —
    tokens unseen in base take df=0 (rarest) — so the two prefix
    definitions agree without touching base state. When the publish
    carries a ``{prefix}_pstats`` table (r9+), the candidate-volume
    guard aggregates delta lineage only and joins the published
    per-token prefix counts — per-ingest guard cost ∝ |delta|; a
    pre-stats publish falls back to the base-scan guard (same bound).
    """
    from pyspark.sql import Window as W

    from ..sources.bucketed import load_bucketed
    from .dedup import hash60, shingle_rows

    if not 1 <= t_pct <= 100:
        raise ValueError(f"t_pct must be in [1, 100], got {t_pct}")
    ranked_b = load_bucketed(spark, f"{table_prefix}_ranked")
    df_b = load_bucketed(spark, f"{table_prefix}_df")
    sets_b = load_bucketed(spark, f"{table_prefix}_sets")
    pfx_counts_b = (
        prefix_counts_at(load_bucketed(spark, f"{table_prefix}_pstats"),
                         t_pct)
        if spark.catalog.tableExists(f"{table_prefix}_pstats") else None
    )
    if check_disjoint_ids:
        _check_disjoint_ids(
            sets_b.select(F.col("gid").alias(id_col)), delta, id_col,
            "ppjoin_increment_from_base")

    lowered = delta.select(F.col(id_col),
                           F.lower(F.col(text_col)).alias(text_col))
    tok_d = shingle_rows(lowered, id_col, text_col, k).select(
        F.col(id_col).alias("gid"), hash60(F.col("shingle")).alias("tk")
    ).distinct().localCheckpoint(eager=False)
    sizes_d = tok_d.groupBy("gid").agg(F.count(F.lit(1)).alias("n"))
    ranked_d = (
        tok_d.join(F.broadcast(df_b), "tk", "left")
        .withColumn("_df", F.coalesce("df", F.lit(0).cast("long")))
        .join(sizes_d, "gid")
        .withColumn("rn", F.row_number().over(
            W.partitionBy("gid").orderBy("_df", "tk")))
        .select("gid", "tk", "n", "rn")
    )
    sets_d = tok_d.groupBy("gid").agg(
        F.collect_list("tk").alias("set"),
        F.count(F.lit(1)).alias("n"),
    )
    # delta×base keeps base bucketing (pfx inside the core is a
    # filter, not a re-partition); delta×delta is a small self-join.
    return _ppjoin_increment_core(ranked_d, ranked_b,
                                  sets_b.unionByName(sets_d), t_pct,
                                  max_candidates,
                                  others_pfx_counts=pfx_counts_b)


def _ppjoin_increment_core(ranked_d: DataFrame, ranked_others: DataFrame,
                           sets_all: DataFrame, t_pct: int,
                           max_candidates: int | None = None,
                           others_pfx_counts: DataFrame | None = None
                           ) -> DataFrame:
    """Candidate + verify core shared by
    :func:`ppjoin_increment_from_base` and the streaming exact ingest
    (streaming/incremental_ingest.py:exact_neardup_micro_batch).

    ``ranked_d`` / ``ranked_others`` carry ``(gid, tk, n, rn)`` ranked
    under ONE shared fixed total token order (any fixed order is
    exact — see :func:`ppjoin_increment_pairs`); ``sets_all`` carries
    ``(gid, set, n)`` for every doc either side references. Output:
    every pair with Jaccard ≥ t and ≥1 side in ``ranked_d``.
    ``max_candidates`` measures Σ_tk pfx_delta·pfx_all BEFORE the pair
    joins (the :func:`ppjoin_increment_pairs` guard, r8 symmetry —
    the published-base/streaming paths were the only exact joins
    without it). ``others_pfx_counts`` — per-token prefix counts of
    ``ranked_others`` at this threshold, ``(tk, _cnt)`` from
    :func:`prefix_counts_at` over published/registry stats — makes the
    guard DELTA-PROPORTIONAL: only delta lineage is aggregated, the
    others side contributes a pre-counted join (VERDICT r8 task 4).
    The bound is bit-identical either way (the t_max equivalence in
    :func:`ppjoin_prefix_stats`); without stats the guard derives the
    counts from ``ranked_others`` raw lineage (the r8 shape).
    """

    def pfx(frame):
        ceil_tl = F.floor(
            (F.lit(t_pct) * F.col("n") + F.lit(99)) / F.lit(100))
        return frame.filter(F.col("rn") <= F.col("n") - ceil_tl + 1)

    pfx_d = pfx(ranked_d).localCheckpoint(eager=False)
    if max_candidates is not None:
        from .dedup import _check_candidate_budget

        ca = pfx_d.groupBy("tk").agg(F.count(F.lit(1)).alias("_ca"))
        if others_pfx_counts is not None:
            # Σ_tk ca·(ca + pfx_others) over DELTA tokens only — base
            # tokens absent from the delta contribute 0 to the bound
            # (the original inner join on ca's tks drops them too).
            z = F.lit(0).cast("long")
            bound = (
                ca.join(others_pfx_counts, "tk", "left")
                .agg(F.sum(F.col("_ca")
                           * (F.col("_ca") + F.coalesce("_cnt", z)))
                     .alias("_b"))
                .collect()[0]["_b"]
            ) or 0
        else:
            cb = (pfx_d.select("tk")
                  .unionByName(pfx(ranked_others).select("tk"))
                  .groupBy("tk").agg(F.count(F.lit(1)).alias("_cb")))
            bound = (
                ca.join(cb, "tk")
                .agg(F.sum(F.col("_ca") * F.col("_cb")).alias("_b"))
                .collect()[0]["_b"]
            ) or 0
        _check_candidate_budget(
            int(bound), max_candidates, "_ppjoin_increment_core",
            "lsh_increment_pairs (probabilistic recall)",
        )
    a = pfx_d.alias("a")
    ubound = (F.least(F.col("a.rn"), F.col("b.rn"))
              + F.least(F.col("a.n") - F.col("a.rn"),
                        F.col("b.n") - F.col("b.rn")))

    # per-pair index-prefix condition — see ppjoin_increment_pairs
    def ceil_ix(n):
        return F.floor((F.lit(2 * t_pct) * n
                        + F.lit(100 + t_pct - 1)) / F.lit(100 + t_pct))

    ix_a = F.col("a.n") - ceil_ix(F.col("a.n")) + 1
    ix_b = F.col("b.n") - ceil_ix(F.col("b.n")) + 1
    b_smaller = (
        (F.col("b.n") < F.col("a.n"))
        | ((F.col("b.n") == F.col("a.n"))
           & (F.col("b.gid") < F.col("a.gid")))
    )
    idx_cond = F.when(b_smaller, F.col("b.rn") <= ix_b) \
        .otherwise(F.col("a.rn") <= ix_a)

    def cand_against(side) -> DataFrame:
        b = side.alias("b")
        return (
            a.join(
                b,
                (F.col("a.tk") == F.col("b.tk"))
                & (F.col("a.gid") != F.col("b.gid"))
                & (F.col("b.n") * 100 >= F.lit(t_pct) * F.col("a.n"))
                & (F.col("a.n") * 100 >= F.lit(t_pct) * F.col("b.n"))
                & idx_cond
                & (ubound * (100 + t_pct)
                   >= F.lit(t_pct) * (F.col("a.n") + F.col("b.n"))),
            )
            .select(F.least(F.col("a.gid"), F.col("b.gid")).alias("id_a"),
                    F.greatest(F.col("a.gid"), F.col("b.gid"))
                    .alias("id_b"))
        )

    cand = (
        cand_against(pfx(ranked_others))
        .unionByName(cand_against(pfx_d))
        .distinct()
    )
    va = sets_all.select(F.col("gid").alias("id_a"),
                         F.col("set").alias("_seta"),
                         F.col("n").alias("_na"))
    vb = sets_all.select(F.col("gid").alias("id_b"),
                         F.col("set").alias("_setb"),
                         F.col("n").alias("_nb"))
    inter = F.size(F.array_intersect(F.col("_seta"), F.col("_setb")))
    union = F.col("_na") + F.col("_nb") - F.col("_i")
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("_i", inter.cast("long"))
        .filter(F.col("_i") * 100 >= F.lit(t_pct) * union)
        .select(
            "id_a", "id_b",
            F.floor(F.col("_i") * F.lit(1_000_000) / union)
            .cast("long").alias("jac_micro"),
        )
    )


def containment_increment_from_base(spark, delta: DataFrame,
                                    table_prefix: str,
                                    id_col: str = "doc_id",
                                    text_col: str = "text",
                                    c_pct: int = 80,
                                    k: int = 3,
                                    max_candidates: int | None = None,
                                    check_disjoint_ids: bool = False
                                    ) -> DataFrame:
    """Exact incremental containment join against a PUBLISHED PPJoin
    base (M131 extension — VERDICT r6 task 3): same contract as
    :func:`containment_increment_pairs` (every qualifying ORDERED pair
    with ≥1 delta side, identical to the batch operator on
    base ∪ delta minus base-internal pairs) but the base side is never
    re-shingled, never re-ranked, and never shuffled.

    REUSES the :func:`publish_ppjoin_base` tables unchanged: the
    ``{prefix}_ranked`` table stores ALL token rows under the frozen
    base-time (df asc, tk) total order — threshold-independent AND
    predicate-independent, because any fixed total order satisfies the
    containment prefix principle just as it does Jaccard's (the
    contained side's prefix is a rank filter at read time, which
    preserves ``tk`` bucketing; the index side needs all tokens, which
    is exactly what the table stores). One published build state
    serves both exact joins.

    Three candidate joins, none base×base; the two that touch base
    read bucket-aligned on the join key ``tk``
    (tests/test_containment_increment.py asserts one fewer Exchange
    than a bucketing-blind path read):

    - ``pfx(delta) ⋈ all(base)``   — delta contained in base
    - ``pfx(delta) ⋈ all(delta)``  — delta contained in delta
    - ``pfx(base) ⋈ all(delta)``   — base contained in delta
    """
    from pyspark.sql import Window as W

    from ..sources.bucketed import load_bucketed
    from .dedup import hash60, shingle_rows

    if not 1 <= c_pct <= 100:
        raise ValueError(f"c_pct must be in [1, 100], got {c_pct}")
    ranked_b = load_bucketed(spark, f"{table_prefix}_ranked")
    df_b = load_bucketed(spark, f"{table_prefix}_df")
    sets_b = load_bucketed(spark, f"{table_prefix}_sets")
    stats_b = (
        load_bucketed(spark, f"{table_prefix}_pstats")
        if spark.catalog.tableExists(f"{table_prefix}_pstats") else None
    )
    if check_disjoint_ids:
        _check_disjoint_ids(
            sets_b.select(F.col("gid").alias(id_col)), delta, id_col,
            "containment_increment_from_base")

    lowered = delta.select(F.col(id_col),
                           F.lower(F.col(text_col)).alias(text_col))
    tok_d = shingle_rows(lowered, id_col, text_col, k).select(
        F.col(id_col).alias("gid"), hash60(F.col("shingle")).alias("tk")
    ).distinct().localCheckpoint(eager=False)
    sizes_d = tok_d.groupBy("gid").agg(F.count(F.lit(1)).alias("n"))
    # frozen base-time order; unseen tokens rank rarest (df=0)
    ranked_d = (
        tok_d.join(F.broadcast(df_b), "tk", "left")
        .withColumn("_df", F.coalesce("df", F.lit(0).cast("long")))
        .join(sizes_d, "gid")
        .withColumn("rn", F.row_number().over(
            W.partitionBy("gid").orderBy("_df", "tk")))
        .select("gid", "tk", "n", "rn")
        .localCheckpoint(eager=False)
    )

    def pfx(frame: DataFrame) -> DataFrame:
        ceil_cl = F.floor(
            (F.lit(c_pct) * F.col("n") + F.lit(99)) / F.lit(100))
        return frame.filter(F.col("rn") <= F.col("n") - ceil_cl + 1)

    pfx_d = pfx(ranked_d)
    if max_candidates is not None:
        # Σ_tk [pfx_delta·(all_base + all_delta) + pfx_base·all_delta]
        # — the three joins' bounds in one job, before any runs (r8
        # guard symmetry with containment_increment_pairs). Every term
        # carries a delta factor, so tokens absent from the delta
        # contribute 0: with a published stats table the aggregate
        # runs over DELTA lineage only and LEFT-joins the base's
        # pre-counted prefix/total columns (VERDICT r8 task 4) — the
        # bound is bit-identical to the base-scan form.
        from .dedup import _check_candidate_budget

        cpd = pfx_d.groupBy("tk").agg(F.count(F.lit(1)).alias("_cpd"))
        cad = ranked_d.groupBy("tk").agg(F.count(F.lit(1)).alias("_cad"))
        z = F.lit(0).cast("long")
        if stats_b is not None:
            cpb = prefix_counts_at(stats_b, c_pct) \
                .withColumnRenamed("_cnt", "_cpb")
            cab = token_counts(stats_b).withColumnRenamed("_cnt", "_cab")
            joined = (cad.join(cpd, "tk", "full_outer")
                      .join(cab, "tk", "left")
                      .join(cpb, "tk", "left"))
        else:
            cpb = pfx(ranked_b).groupBy("tk").agg(
                F.count(F.lit(1)).alias("_cpb"))
            cab = ranked_b.groupBy("tk").agg(
                F.count(F.lit(1)).alias("_cab"))
            joined = (cad.join(cab, "tk", "full_outer")
                      .join(cpd, "tk", "full_outer")
                      .join(cpb, "tk", "full_outer"))
        bound = (
            joined.agg(F.sum(
                F.coalesce("_cpd", z)
                * (F.coalesce("_cab", z) + F.coalesce("_cad", z))
                + F.coalesce("_cpb", z) * F.coalesce("_cad", z)
            ).alias("_b")).collect()[0]["_b"] or 0
        )
        _check_candidate_budget(
            int(bound), max_candidates,
            "containment_increment_from_base",
            "lsh_increment_pairs (probabilistic recall)",
        )
    cands = (
        # delta ⊆ base: base unshuffled
        _containment_cand(pfx_d, ranked_b, c_pct)
        .unionByName(_containment_cand(pfx_d, ranked_d, c_pct))
        .unionByName(_containment_cand(pfx(ranked_b), ranked_d, c_pct))
        .distinct()
    )
    sets_d = tok_d.groupBy("gid").agg(
        F.collect_list("tk").alias("set"),
        F.count(F.lit(1)).alias("n"),
    )
    return _containment_verify(cands, sets_b.unionByName(sets_d), c_pct)


def edjoin_increment_pairs(base: DataFrame, delta: DataFrame,
                           id_col: str = "doc_id",
                           text_col: str = "text", d: int = 10,
                           q: int = 4,
                           max_candidates: int | None = None,
                           check_disjoint_ids: bool = False
                           ) -> DataFrame:
    """EXACT incremental edit-distance join (M145): every pair with
    ``levenshtein ≤ d`` and AT LEAST ONE side in ``delta`` —
    completing the incremental trio (Jaccard M122, containment M142,
    edit distance M145) so every exact content-keyed join the engine
    offers has a never-rebuild-base×base ingest path. Identity:
    output == batch :func:`dedup.edjoin_pairs` on base ∪ delta minus
    its base-internal pairs (tests/test_edjoin_increment.py).

    Pass-Join decomposition (see :func:`dedup.edjoin_pairs` — the
    chunk side is always the SHORTER string, so delta-touching pairs
    come from exactly two equi-joins, neither base×base):

    - ``chunks(delta) ⋈ substrings(base ∪ delta)`` — delta doc is the
      shorter side (its partner may be anywhere);
    - ``chunks(base) ⋈ substrings(delta)`` — base doc shorter, delta
      partner.

    The short-string tiny bucket needs only ONE banded join,
    ``probe(delta) ⋈ tiny(base ∪ delta)``: the ±1 band explode is
    symmetric, so probing from the delta side alone reaches every
    within-d partner. ``max_candidates`` measures all three joins'
    key-count bounds before any runs.
    """
    from .dedup import (
        _check_candidate_budget,
        passjoin_chunk_rows,
        passjoin_substring_rows,
    )

    if d < 0:
        raise ValueError(f"d must be non-negative, got {d}")
    if q < 2:
        raise ValueError(f"q must be >= 2, got {q}")
    if check_disjoint_ids:
        _check_disjoint_ids(base, delta, id_col, "edjoin_increment_pairs")
    cutoff = q * d + q - 1
    t_b = data_barrier(base.select(F.col(id_col), F.col(text_col))
                       .withColumn("_len", F.length(text_col)))
    t_d = data_barrier(delta.select(F.col(id_col), F.col(text_col))
                       .withColumn("_len", F.length(text_col)))
    # Only t_b/t_d (small: id, text, len) persist; the chunk/substring
    # frames are cheap explodes with ≤2 consumers each (one guard
    # aggregate on raw lineage + one candidate join) — checkpointing
    # the ~|docs|·O(d²)-row substring frames pinned storage memory
    # against the guard's own aggregate at probe scale (the q165 ×100
    # OOM; SURVEY §6.1d-r8, same cure as dedup.edjoin_pairs).
    ch_d = passjoin_chunk_rows(t_d, id_col, text_col, d)
    ch_b = passjoin_chunk_rows(t_b, id_col, text_col, d)
    sub_d = passjoin_substring_rows(t_d, id_col, text_col, d)
    sub_u = sub_d.unionByName(
        passjoin_substring_rows(t_b, id_col, text_col, d)
    )

    tiny_u = (
        t_b.select(F.col(id_col), "_len")
        .unionByName(t_d.select(F.col(id_col), "_len"))
        .filter(F.col("_len") <= cutoff)
        .withColumn("_band", F.expr(f"_len div {d + 1}"))
    )
    probe_d = t_d.filter(F.col("_len") <= cutoff).select(
        F.col(id_col), F.col("_len"),
        F.explode(F.array(
            F.expr(f"_len div {d + 1}") - 1,
            F.expr(f"_len div {d + 1}"),
            F.expr(f"_len div {d + 1}") + 1)).alias("_band"),
    )
    nparts = None
    if max_candidates is not None:
        def _pass_bound_df(ch, sub):
            cc = ch.groupBy("_ck", "_lc", "_i").agg(
                F.count(F.lit(1)).alias("_cc"))
            cs = sub.groupBy("_ck", "_lx", "_i").agg(
                F.count(F.lit(1)).alias("_cs"))
            return (
                cc.join(cs, (F.col("_lc") == F.col("_lx"))
                        & (cc["_ck"] == cs["_ck"])
                        & (cc["_i"] == cs["_i"]))
                .agg(F.sum(F.col("_cc") * F.col("_cs")).alias("_b"))
            )

        tc = tiny_u.groupBy("_band").agg(F.count(F.lit(1)).alias("_c"))
        pc = probe_d.groupBy("_band").agg(F.count(F.lit(1)).alias("_cp"))
        bound_tiny_df = (
            pc.join(tc, "_band")
            .agg(F.sum(F.col("_cp") * F.col("_c")).alias("_b"))
        )
        # All three bound aggregates in ONE job (previously three
        # sequential collect round-trips, each a full pass over its
        # chunk/substring explode — the guard measured as HALF of
        # q165's runtime at sf0.1: 7.28 s guarded vs 3.53 s
        # unguarded). The union runs the independent subtrees
        # concurrently (guide §2.6) and pays one driver trip. Still
        # raw-lineage: nothing is materialized on the refusal path
        # (the §6.1d-r8 OOM constraint is untouched). A side-tagged
        # single-aggregation form (one shuffle, no count join) was
        # built and A/B-measured in r12: WORSE — the near-unique-key
        # hash aggregate with four sum buffers loses to the old
        # shape's streaming sort-merge sum over co-partitioned count
        # tables (48.6 s vs 42.5 s executor; OPTIMIZATION_r12.md).
        parts = [_pass_bound_df(ch_d, sub_u), _pass_bound_df(ch_b, sub_d),
                 bound_tiny_df]
        tagged = parts[0].select(F.lit(0).alias("_k"), "_b")
        for i, p in enumerate(parts[1:], start=1):
            tagged = tagged.unionByName(
                p.select(F.lit(i).alias("_k"), "_b"))
        bound_total = sum(int(r["_b"] or 0) for r in tagged.collect())
        _check_candidate_budget(
            bound_total,
            max_candidates, "edjoin_increment_pairs",
            "lsh_increment_pairs (probabilistic recall)",
        )
        from .dedup import sized_partitions_for_bound

        nparts = sized_partitions_for_bound(base.sparkSession,
                                            bound_total)

    # Guard passed — NOW persist the one frame the candidate joins
    # read twice: sub_d feeds _pass_cand(ch_b, sub_d) directly and
    # _pass_cand(ch_d, sub_u) via the union. ch_d/ch_b/sub_u each have
    # a single consumer below (the guard above read the pre-checkpoint
    # lineage), so persisting them buys no reuse and re-pins the
    # storage this restructure exists to free. Checkpointing after the
    # guard keeps the refusal path storage-free while the happy path
    # regains the join-side reuse (the 1.4× q165 drift when the r8
    # restructure dropped these outright — measured,
    # BENCH_local_r08_sf01).
    sub_d = data_barrier(sub_d)
    sub_u = sub_d.unionByName(
        passjoin_substring_rows(t_b, id_col, text_col, d))
    if nparts is not None:
        # Size the candidate joins from the measured bound (VERDICT r8
        # task 3 — see dedup.sized_partitions_for_bound): each side
        # repartitioned on its own equi keys with one partition count,
        # so the pass joins stay co-partitioned with ~bounded rows per
        # task instead of bound/session_partitions.
        sub_u = sub_u.repartition(nparts, "_ck", "_i", "_lx")
        sub_d = sub_d.repartition(nparts, "_ck", "_i", "_lx")
        ch_d = ch_d.repartition(nparts, "_ck", "_i", "_lc")
        ch_b = ch_b.repartition(nparts, "_ck", "_i", "_lc")

    def _pass_cand(ch, sub) -> DataFrame:
        return (
            sub.join(
                ch,
                (sub["_ck"] == ch["_ck"]) & (sub["_i"] == ch["_i"])
                & (F.col("_lx") == F.col("_lc")),
            )
            .filter((F.col("_ly") > F.col("_lc"))
                    | ((F.col("_ly") == F.col("_lc"))
                       & (F.col("_gc") < F.col("_gs"))))
            .select(F.least("_gc", "_gs").alias("id_a"),
                    F.greatest("_gc", "_gs").alias("id_b"))
        )

    pa, pb = probe_d.alias("pa"), tiny_u.alias("pb")
    cand_tiny = pa.join(
        pb,
        (F.col("pa._band") == F.col("pb._band"))
        & (F.col(f"pa.{id_col}") != F.col(f"pb.{id_col}"))
        & (F.abs(F.col("pa._len") - F.col("pb._len")) <= d),
    ).select(
        F.least(F.col(f"pa.{id_col}"), F.col(f"pb.{id_col}"))
        .alias("id_a"),
        F.greatest(F.col(f"pa.{id_col}"), F.col(f"pb.{id_col}"))
        .alias("id_b"),
    )
    cand = (
        _pass_cand(ch_d, sub_u)
        .unionByName(_pass_cand(ch_b, sub_d))
        .unionByName(cand_tiny)
    )
    if nparts is not None:
        # Sized dedup + verify exchanges — see dedup.edjoin_pairs.
        cand = cand.repartition(nparts, "id_a", "id_b").distinct() \
            .repartition(nparts, "id_a")
    else:
        cand = cand.distinct()
    t_u = t_b.unionByName(t_d)
    lev = F.levenshtein(F.col("_ta"), F.col("_tb"), d)
    joined = cand.join(t_u.select(F.col(id_col).alias("id_a"),
                                  F.col(text_col).alias("_ta")), "id_a")
    if nparts is not None:
        joined = joined.repartition(nparts, "id_b")
    return (
        joined
        .join(t_u.select(F.col(id_col).alias("id_b"),
                         F.col(text_col).alias("_tb")), "id_b")
        .select("id_a", "id_b", lev.cast("long").alias("dist"))
        .filter(F.col("dist") >= 0)
    )


# ---------------------------------------------------------------------------
# M146: published Pass-Join base + exact edit-distance increment from it
# (VERDICT r7 task 2 — completes the published-base symmetry of the
# exact-join trio: Jaccard M131, containment M142, edit distance M146).
# ---------------------------------------------------------------------------

def _edjoin_key(ck: Column, i: Column, length: Column) -> Column:
    """Composite Pass-Join candidate key: one 64-bit hash over
    (substring-hash, chunk-slot, chunk-side length). The batch operator
    joins equi on the 3-tuple; folding it into ONE column lets the
    published tables bucket on exactly the join key, which Spark's v1
    bucketing requires for an exchange-free scan (bucketing is
    DISABLED by the planner when the equi keys are a superset of the
    bucket keys — measured on this box, not assumed). A hash collision
    can only MERGE keys — candidates grow, never shrink — and the
    banded-levenshtein verify reads raw text, so exactness is
    unaffected."""
    return F.xxhash64(ck, i, length)


def _edjoin_chunk_keyed(t: DataFrame, id_col: str, text_col: str,
                        d: int) -> DataFrame:
    """Chunk rows carrying the composite key: (_gc, _lc, _key)."""
    from .dedup import passjoin_chunk_rows

    return passjoin_chunk_rows(t, id_col, text_col, d).select(
        "_gc", "_lc",
        _edjoin_key(F.col("_ck"), F.col("_i"), F.col("_lc")).alias("_key"),
    )


def _edjoin_sub_keyed(t: DataFrame, id_col: str, text_col: str,
                      d: int) -> DataFrame:
    """Substring rows carrying the composite key: (_gs, _ly, _lx, _key).
    ``_lx`` (the partner length the substring was enumerated for) stays
    a data column — the orientation filter and the residual exactness
    check read it after the key join."""
    from .dedup import passjoin_substring_rows

    return passjoin_substring_rows(t, id_col, text_col, d).select(
        "_gs", "_ly", "_lx",
        _edjoin_key(F.col("_ck"), F.col("_i"), F.col("_lx")).alias("_key"),
    )


def _edjoin_pass_cand_keyed(ch: DataFrame, sub: DataFrame) -> DataFrame:
    """Pass-Join candidate join over composite-keyed rows: equi on
    ``_key`` ONLY (so a bucketed side scans exchange-free), with the
    length equality re-checked as a RESIDUAL condition — written as
    ``_lx − _lc = 0`` so Catalyst cannot lift it back into the equi
    keys (EqualTo over a mixed-side expression is not extractable) —
    and the batch operator's orientation filter (chunk side is the
    shorter doc; equal lengths pair once)."""
    s, c = sub.alias("s"), ch.alias("c")
    return (
        s.join(
            c,
            (F.col("s._key") == F.col("c._key"))
            & ((F.col("s._lx") - F.col("c._lc")) == F.lit(0)),
        )
        .filter((F.col("s._ly") > F.col("c._lc"))
                | ((F.col("s._ly") == F.col("c._lc"))
                   & (F.col("c._gc") < F.col("s._gs"))))
        .select(F.least("c._gc", "s._gs").alias("id_a"),
                F.greatest("c._gc", "s._gs").alias("id_b"))
    )


def edjoin_guard_stats(t: DataFrame, ch: DataFrame, sub: DataFrame,
                       d: int, q: int,
                       extra_group_cols: tuple[str, ...] = ()
                       ) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The three aggregate tables the edit-distance candidate-volume
    guard needs from a corpus side, pre-counted (VERDICT r8 task 4 —
    the (d, q)-pinned analog of :func:`ppjoin_prefix_stats`; no
    threshold axis because the chunk scheme is parameter-specific and
    the publish already pins (d, q) in its meta table):

    - chunk-key counts ``(_key, _lc, cnt)``,
    - substring-key counts ``(_key, _lx, cnt)``,
    - tiny-bucket band counts ``(_band, cnt)`` over ``_len ≤ cutoff``.

    All three are additive across corpus increments (each chunk/
    substring/text row contributes to exactly one cell), so streaming
    waves fold by per-cell SUM and a later guard aggregates DELTA
    lineage only, joining these.
    """
    cutoff = q * d + q - 1
    chunkstats = ch.groupBy(*extra_group_cols, "_key", "_lc").agg(
        F.count(F.lit(1)).alias("cnt"))
    substats = sub.groupBy(*extra_group_cols, "_key", "_lx").agg(
        F.count(F.lit(1)).alias("cnt"))
    tinystats = (
        t.select(*extra_group_cols, "_len")
        .filter(F.col("_len") <= cutoff)
        .groupBy(*extra_group_cols,
                 F.expr(f"_len div {d + 1}").alias("_band"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return chunkstats, substats, tinystats


def publish_edjoin_base(spark, base: DataFrame, table_prefix: str,
                        id_col: str = "doc_id", text_col: str = "text",
                        d: int = 10, q: int = 4, num_buckets: int = 16,
                        path_root: str | None = None) -> None:
    """Persist a base corpus's Pass-Join build state as BUCKETED tables
    (M146) so every later :func:`edjoin_increment_from_base` ingest
    joins the (huge) base side WITHOUT an Exchange — the M131 publish
    pattern applied to the edit-distance join. Unlike M131 there is no
    frozen-order subtlety: the join keys are CONTENT substrings, a pure
    function of each document's text and ``d``, so the publish is
    trivially ingest-stable (VERDICT r7 task 2). Four tables:

    - ``{prefix}_chunks`` (_gc, _lc, _key) bucketed by ``_key``: each
      base doc's own d+1 chunk rows under the composite key.
    - ``{prefix}_subs`` (_gs, _ly, _lx, _key) bucketed by ``_key``:
      each base doc's multi-match-aware substring rows. O(d²) rows per
      doc — the storage-for-shuffle trade the Pass-Join index side
      always pays; both tables are narrow (ints + one 64-bit key).
    - ``{prefix}_texts`` (id, text, _len) bucketed by the id: the
      verify side and the tiny-bucket lengths (the `_len ≤ cutoff`
      read prunes on the pushed filter).
    - ``{prefix}_meta`` (d, q): the parameters the chunk/substring
      schemes were built with. ``edjoin_increment_from_base`` refuses
      to run against a mismatched publish — the chunk scheme is
      d-specific, so a silent d change would silently lose pairs.
    - ``{prefix}_chunkstats`` / ``{prefix}_substats`` (bucketed by
      ``_key``) / ``{prefix}_tinystats``: the pre-counted guard
      aggregates (:func:`edjoin_guard_stats`) — every later
      increment's candidate-volume guard aggregates DELTA lineage
      only and joins these (VERDICT r8 task 4). Pre-r9 publishes lack
      them; the increment falls back to the base-scan guard (same
      bound).
    """
    from ..sources.bucketed import write_bucketed

    if d < 0:
        raise ValueError(f"d must be non-negative, got {d}")
    if q < 2:
        raise ValueError(f"q must be >= 2, got {q}")

    def _path(table: str) -> str | None:
        return f"{path_root}/{table}" if path_root else None

    t_b = (base.select(F.col(id_col), F.col(text_col))
           .withColumn("_len", F.length(text_col))
           .localCheckpoint(eager=False))
    ch_b = _edjoin_chunk_keyed(t_b, id_col, text_col, d)
    sub_b = _edjoin_sub_keyed(t_b, id_col, text_col, d)
    write_bucketed(ch_b, f"{table_prefix}_chunks", "_key", num_buckets,
                   path=_path(f"{table_prefix}_chunks"))
    write_bucketed(sub_b, f"{table_prefix}_subs", "_key", num_buckets,
                   path=_path(f"{table_prefix}_subs"))
    write_bucketed(t_b, f"{table_prefix}_texts", id_col, num_buckets,
                   path=_path(f"{table_prefix}_texts"))
    cstats, sstats, tstats = edjoin_guard_stats(t_b, ch_b, sub_b, d, q)
    write_bucketed(cstats, f"{table_prefix}_chunkstats", "_key",
                   num_buckets, path=_path(f"{table_prefix}_chunkstats"))
    write_bucketed(sstats, f"{table_prefix}_substats", "_key",
                   num_buckets, path=_path(f"{table_prefix}_substats"))
    write_bucketed(tstats, f"{table_prefix}_tinystats", "_band",
                   num_buckets, path=_path(f"{table_prefix}_tinystats"))
    meta = spark.createDataFrame([(d, q)], "d int, q int")
    w = meta.write.mode("overwrite").format("parquet")
    if path_root:
        w = w.option("path", f"{path_root}/{table_prefix}_meta")
    w.saveAsTable(f"{table_prefix}_meta")


def edjoin_increment_from_base(spark, delta: DataFrame,
                               table_prefix: str,
                               id_col: str = "doc_id",
                               text_col: str = "text", d: int = 10,
                               q: int = 4,
                               max_candidates: int | None = None,
                               check_disjoint_ids: bool = False
                               ) -> DataFrame:
    """Exact incremental edit-distance join against a PUBLISHED
    Pass-Join base (M146): same contract as
    :func:`edjoin_increment_pairs` (every pair with levenshtein ≤ d
    and ≥1 delta side, identical to batch :func:`dedup.edjoin_pairs`
    on base ∪ delta minus base-internal pairs) but the base side is
    never re-chunked, never re-enumerated, and never shuffled — its
    chunk and substring rows arrive pre-bucketed on the composite
    candidate key. Only the delta pays shuffles, so a rolling
    fuzzy-dedup ingest is linear in |delta| per ingest with zero
    repeated base work (VERDICT r7 missing #1).

    Three Pass-Join candidate joins (none base×base; the two touching
    base scan bucket-aligned) plus the tiny-bucket banded join:

    - ``chunks(delta) ⋈ subs(base)``  — delta doc shorter, base partner
    - ``chunks(delta) ⋈ subs(delta)`` — both in delta
    - ``chunks(base) ⋈ subs(delta)``  — base doc shorter, delta partner
    - ``probe(delta) ⋈ tiny(base ∪ delta)`` — short strings (±1 band
      explode is symmetric, so probing from delta alone is complete)
    """
    from ..sources.bucketed import load_bucketed

    if d < 0:
        raise ValueError(f"d must be non-negative, got {d}")
    if q < 2:
        raise ValueError(f"q must be >= 2, got {q}")
    meta = spark.table(f"{table_prefix}_meta").collect()[0]
    if (meta["d"], meta["q"]) != (d, q):
        raise ValueError(
            f"edjoin_increment_from_base: published base "
            f"'{table_prefix}' was built with d={meta['d']}, "
            f"q={meta['q']} but the increment was called with d={d}, "
            f"q={q} — the chunk scheme is parameter-specific; "
            f"re-publish or match the parameters")
    ch_b = load_bucketed(spark, f"{table_prefix}_chunks")
    sub_b = load_bucketed(spark, f"{table_prefix}_subs")
    t_bt = load_bucketed(spark, f"{table_prefix}_texts")
    stats_b = (
        (load_bucketed(spark, f"{table_prefix}_chunkstats"),
         load_bucketed(spark, f"{table_prefix}_substats"),
         load_bucketed(spark, f"{table_prefix}_tinystats"))
        if spark.catalog.tableExists(f"{table_prefix}_chunkstats")
        else None
    )
    if check_disjoint_ids:
        _check_disjoint_ids(
            t_bt.select(F.col(id_col)), delta, id_col,
            "edjoin_increment_from_base")

    t_d = (delta.select(F.col(id_col), F.col(text_col))
           .withColumn("_len", F.length(text_col))
           .localCheckpoint(eager=False))
    return _edjoin_increment_core(t_d, ch_b, sub_b, t_bt, id_col,
                                  text_col, d, q, max_candidates,
                                  others_stats=stats_b)


def _edjoin_increment_core(t_d: DataFrame, ch_o: DataFrame,
                           sub_o: DataFrame, t_o: DataFrame,
                           id_col: str, text_col: str, d: int,
                           q: int,
                           max_candidates: int | None = None,
                           others_stats: tuple[DataFrame, DataFrame,
                                               DataFrame] | None = None
                           ) -> DataFrame:
    """Candidate + verify core shared by
    :func:`edjoin_increment_from_base` and the streaming exact
    edit-distance gate (streaming/incremental_ingest.py).

    ``t_d`` carries the delta's ``(id, text, _len)``; ``ch_o`` /
    ``sub_o`` are the OTHER side's composite-keyed chunk/substring
    rows (published tables or the durable stream registry); ``t_o``
    its ``(id, text, _len)`` rows. Output: every pair with
    levenshtein ≤ d and ≥1 side in the delta. ``max_candidates``
    measures all three pass joins' key-count bounds plus the banded
    tiny bound before any pair join runs (the
    :func:`edjoin_increment_pairs` guard, r8 symmetry).
    ``others_stats`` — the other side's pre-counted
    (chunkstats, substats, tinystats) from :func:`edjoin_guard_stats`
    (published tables or the folded stream stats registry) — makes
    the guard DELTA-PROPORTIONAL: only delta lineage is aggregated,
    the others side contributes pre-counted joins (VERDICT r8
    task 4). The bound is bit-identical either way; without stats the
    guard re-derives the counts from the others' chunk/substring/text
    rows (the r8 shape)."""
    cutoff = q * d + q - 1
    ch_d = _edjoin_chunk_keyed(t_d, id_col, text_col, d) \
        .localCheckpoint(eager=False)
    sub_d = _edjoin_sub_keyed(t_d, id_col, text_col, d) \
        .localCheckpoint(eager=False)
    if max_candidates is not None:
        from .dedup import _check_candidate_budget

        cc_d = ch_d.groupBy("_key", "_lc").agg(
            F.count(F.lit(1)).alias("_cc"))
        cs_d = sub_d.groupBy("_key", "_lx").agg(
            F.count(F.lit(1)).alias("_cs"))

        def _cross_df(cc, cs):
            return (
                cc.join(cs, (cc["_key"] == cs["_key"])
                        & (F.col("_lx") == F.col("_lc")))
                .agg(F.sum(F.col("_cc") * F.col("_cs")).alias("_b"))
            )

        pc = (t_d.select("_len").filter(F.col("_len") <= cutoff)
              .select(F.expr(f"_len div {d + 1}").alias("_b0"))
              .select(F.explode(F.array(
                  F.col("_b0") - 1, F.col("_b0"),
                  F.col("_b0") + 1)).alias("_band"))
              .groupBy("_band").agg(F.count(F.lit(1)).alias("_cp")))
        tc_d = (t_d.select("_len").filter(F.col("_len") <= cutoff)
                .groupBy(F.expr(f"_len div {d + 1}").alias("_band"))
                .agg(F.count(F.lit(1)).alias("_c")))
        if others_stats is not None:
            cstats_o, sstats_o, tstats_o = others_stats
            cc_o = cstats_o.withColumnRenamed("cnt", "_cc")
            cs_o = sstats_o.withColumnRenamed("cnt", "_cs")
            tc = (tc_d.unionByName(
                tstats_o.withColumnRenamed("cnt", "_c"))
                .groupBy("_band").agg(F.sum("_c").alias("_c")))
        else:
            cc_o = ch_o.groupBy("_key", "_lc").agg(
                F.count(F.lit(1)).alias("_cc"))
            cs_o = sub_o.groupBy("_key", "_lx").agg(
                F.count(F.lit(1)).alias("_cs"))
            tc = (t_o.select("_len").unionByName(t_d.select("_len"))
                  .filter(F.col("_len") <= cutoff)
                  .groupBy(F.expr(f"_len div {d + 1}").alias("_band"))
                  .agg(F.count(F.lit(1)).alias("_c")))
        bound_tiny_df = (
            pc.join(tc, "_band")
            .agg(F.sum(F.col("_cp") * F.col("_c")).alias("_b"))
        )
        # All four bound aggregates in ONE job (previously four
        # sequential collect round-trips — the edjoin_increment_pairs
        # consolidation, applied to the shared core). Raw-lineage on
        # the refusal path is untouched: nothing is materialized.
        parts = [_cross_df(cc_d, cs_o), _cross_df(cc_d, cs_d),
                 _cross_df(cc_o, cs_d), bound_tiny_df]
        tagged = parts[0].select(F.lit(0).alias("_k"), "_b")
        for i, p in enumerate(parts[1:], start=1):
            tagged = tagged.unionByName(
                p.select(F.lit(i).alias("_k"), "_b"))
        _check_candidate_budget(
            sum(int(r["_b"] or 0) for r in tagged.collect()),
            max_candidates, "_edjoin_increment_core",
            "lsh_increment_pairs (probabilistic recall)",
        )

    tiny_u = (
        t_o.select(F.col(id_col), "_len")
        .unionByName(t_d.select(F.col(id_col), "_len"))
        .filter(F.col("_len") <= cutoff)
        .withColumn("_band", F.expr(f"_len div {d + 1}"))
    )
    probe_d = t_d.filter(F.col("_len") <= cutoff).select(
        F.col(id_col), F.col("_len"),
        F.explode(F.array(
            F.expr(f"_len div {d + 1}") - 1,
            F.expr(f"_len div {d + 1}"),
            F.expr(f"_len div {d + 1}") + 1)).alias("_band"),
    )
    pa, pb = probe_d.alias("pa"), tiny_u.alias("pb")
    cand_tiny = pa.join(
        pb,
        (F.col("pa._band") == F.col("pb._band"))
        & (F.col(f"pa.{id_col}") != F.col(f"pb.{id_col}"))
        & (F.abs(F.col("pa._len") - F.col("pb._len")) <= d),
    ).select(
        F.least(F.col(f"pa.{id_col}"), F.col(f"pb.{id_col}"))
        .alias("id_a"),
        F.greatest(F.col(f"pa.{id_col}"), F.col(f"pb.{id_col}"))
        .alias("id_b"),
    )
    cand = (
        _edjoin_pass_cand_keyed(ch_d, sub_o)
        .unionByName(_edjoin_pass_cand_keyed(ch_d, sub_d))
        .unionByName(_edjoin_pass_cand_keyed(ch_o, sub_d))
        .unionByName(cand_tiny)
        .distinct()
    )
    t_u = t_o.select(F.col(id_col), F.col(text_col)).unionByName(
        t_d.select(F.col(id_col), F.col(text_col)))
    lev = F.levenshtein(F.col("_ta"), F.col("_tb"), d)
    return (
        cand.join(t_u.select(F.col(id_col).alias("id_a"),
                             F.col(text_col).alias("_ta")), "id_a")
        .join(t_u.select(F.col(id_col).alias("id_b"),
                         F.col(text_col).alias("_tb")), "id_b")
        .select("id_a", "id_b", lev.cast("long").alias("dist"))
        .filter(F.col("dist") >= 0)
    )


def _containment_increment_core(ranked_d: DataFrame,
                                ranked_others: DataFrame,
                                sets_all: DataFrame,
                                c_pct: int,
                                max_candidates: int | None = None,
                                others_stats: DataFrame | None = None
                                ) -> DataFrame:
    """Candidate + verify core for delta-vs-others EXACT containment
    over pre-ranked token rows — shared by the streaming containment
    gate (streaming/incremental_ingest.py) and mirroring
    :func:`_ppjoin_increment_core`'s contract.

    ``ranked_d`` / ``ranked_others`` carry ``(gid, tk, n, rn)`` under
    ONE shared fixed total token order; ``sets_all`` carries
    ``(gid, set, n)`` for every doc either side references. Output:
    every ORDERED pair with ``|A∩B| ≥ (c_pct/100)·|A|`` and ≥1 side in
    ``ranked_d``. Only the contained (A) side prefix-shortens; the two
    candidate joins are pfx(delta) ⋈ all(union) and
    pfx(others) ⋈ all(delta) — others×others never exists.
    ``others_stats`` — a :func:`ppjoin_prefix_stats` table over
    ``ranked_others`` (the durable stream stats registry) — makes the
    guard DELTA-PROPORTIONAL (VERDICT r8 task 4): the others side
    contributes pre-counted prefix/total columns instead of two raw
    rescans; the bound is bit-identical either way."""

    def pfx(frame: DataFrame) -> DataFrame:
        ceil_cl = F.floor(
            (F.lit(c_pct) * F.col("n") + F.lit(99)) / F.lit(100))
        return frame.filter(F.col("rn") <= F.col("n") - ceil_cl + 1) \
            .select("gid", "tk", "n")

    all_d = ranked_d.select("gid", "tk", "n")
    all_u = all_d.unionByName(ranked_others.select("gid", "tk", "n"))
    if max_candidates is not None:
        # Σ_tk [pfx_delta·all_union + pfx_others·all_delta] before
        # either join runs (r8 guard symmetry). Every term carries a
        # delta factor (all_union = all_delta + all_others, and
        # pfx_delta is the multiplier on the others part), so tokens
        # absent from the delta contribute 0 — the stats path
        # aggregates delta lineage only and LEFT-joins the
        # pre-counted others columns.
        from .dedup import _check_candidate_budget

        cpd = pfx(ranked_d).groupBy("tk").agg(
            F.count(F.lit(1)).alias("_cpd"))
        cad = all_d.groupBy("tk").agg(F.count(F.lit(1)).alias("_cad"))
        z = F.lit(0).cast("long")
        if others_stats is not None:
            cpo = prefix_counts_at(others_stats, c_pct) \
                .withColumnRenamed("_cnt", "_cpo")
            cao = token_counts(others_stats) \
                .withColumnRenamed("_cnt", "_cao")
            bound = (
                cad.join(cpd, "tk", "full_outer")
                .join(cao, "tk", "left")
                .join(cpo, "tk", "left")
                .agg(F.sum(
                    F.coalesce("_cpd", z)
                    * (F.coalesce("_cad", z) + F.coalesce("_cao", z))
                    + F.coalesce("_cpo", z) * F.coalesce("_cad", z)
                ).alias("_b")).collect()[0]["_b"] or 0
            )
        else:
            cpo = pfx(ranked_others).groupBy("tk").agg(
                F.count(F.lit(1)).alias("_cpo"))
            cu = all_u.groupBy("tk").agg(F.count(F.lit(1)).alias("_cu"))
            bound = (
                cu.join(cad, "tk", "full_outer")
                .join(cpd, "tk", "full_outer")
                .join(cpo, "tk", "full_outer")
                .agg(F.sum(
                    F.coalesce("_cpd", z) * F.coalesce("_cu", z)
                    + F.coalesce("_cpo", z) * F.coalesce("_cad", z)
                ).alias("_b")).collect()[0]["_b"] or 0
            )
        _check_candidate_budget(
            int(bound), max_candidates, "_containment_increment_core",
            "lsh_increment_pairs (probabilistic recall)",
        )
    cand = (
        _containment_cand(pfx(ranked_d), all_u, c_pct)
        .unionByName(_containment_cand(pfx(ranked_others), all_d, c_pct))
        .distinct()
    )
    return _containment_verify(cand, sets_all, c_pct)
