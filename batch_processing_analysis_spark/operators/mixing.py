"""Weighted source mixing for training-corpus assembly (M36 scale
extension).

Pretraining corpora are MIXTURES: each source (web crawl, code, books,
…) contributes a token budget proportional to a tuned weight (the
public recipe in GPT-3 Table 2.2 / LLaMA Table 1 / The Pile). This
operator materializes a mixture deterministically:

1. per-source budget = ``total_budget · w_s / Σw`` (weights broadcast —
   they are a handful of rows);
2. docs within a source are ordered by a seeded content hash (the
   [[operators/ordering.py]] permutation trick) — an unbiased,
   reproducible sample prefix, not "whatever the scan returned";
3. a per-source running token sum admits documents while the budget
   holds: a doc enters iff the tokens BEFORE it fit strictly inside
   the budget, so a source overshoots by at most one document
   (standard prefix-packing semantics).

One shuffle (window partitioned by source); no collect, no iteration.
Re-weighting or re-seeding is a metadata change, not a new corpus scan
shape — at 100 TB the window reuses the source partitioning every run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from .dedup import hash60


def mix_sources(docs: DataFrame, weights: dict[str, float],
                total_budget: int, seed: str = "mix:0",
                id_col: str = "doc_id", source_col: str = "source",
                tokens_col: str = "n_tokens") -> DataFrame:
    """Select a weighted mixture of documents across sources.

    Returns the selected rows as ``(id, source, n_tokens, cum_tokens)``
    where ``cum_tokens`` is the running total within the source in
    selection order. Sources absent from ``weights`` contribute
    nothing. A document is selected iff the source's tokens strictly
    before it are under the source budget
    ``floor(total_budget · w / Σw)`` — so every non-empty budget admits
    at least one document and overshoots by at most one.
    """
    if total_budget <= 0:
        raise ValueError("total_budget must be positive")
    if not weights or any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-empty and non-negative")
    total_w = sum(weights.values())
    wdf = docs.sparkSession.createDataFrame(
        [(s, float(total_budget) * w / total_w) for s, w in weights.items()],
        f"{source_col} string, _budget double",
    )
    keyed = docs.join(F.broadcast(wdf), source_col).withColumn(
        "_k",
        hash60(F.concat(F.lit(seed), F.lit(":"),
                        F.col(id_col).cast("string"))),
    )
    w = W.partitionBy(source_col).orderBy("_k", id_col).rowsBetween(
        W.unboundedPreceding, 0
    )
    return (
        keyed.withColumn("cum_tokens", F.sum(tokens_col).over(w))
        .filter((F.col("cum_tokens") - F.col(tokens_col))
                < F.floor(F.col("_budget")))
        .select(id_col, source_col, tokens_col, "cum_tokens")
    )


def temperature_mix_weights(docs: DataFrame, alpha: float = 0.3,
                            source_col: str = "source",
                            size_col: str | None = None) -> DataFrame:
    """Temperature-scaled source sampling weights (M92): the public
    multilingual-pretraining recipe (XLM, Conneau & Lample 2019 §3.1;
    mBERT; mT5 §3.2) — a source with empirical share ``p_s`` samples
    with probability ``q_s ∝ p_s^α``, flattening the head (α<1) so
    low-resource sources are not drowned out.

    ``size_col`` measures a source's mass (e.g. ``n_chars`` or a token
    count); ``None`` counts documents. Output, one row per source:

    - ``n_size`` — the source's exact integer mass;
    - ``p_micro`` — empirical share, integer micros;
    - ``q_micro`` — temperature-scaled sampling weight, integer
      micros, normalized over sources.

    Determinism: ``p_s^α`` is a pure per-row double (identical IEEE
    result in both engines); the cross-source normalizer sums the
    QUANTIZED ``floor(p_s^α·1e6)`` integers, so no float sum's
    ordering can flip a micro (the plans/registry.py convention).

    Scale: one partial-aggregated groupBy on source + one broadcast of
    the |sources|-row total; the weights table is dimension-sized.
    """
    if alpha < 0:
        raise ValueError("alpha must be non-negative")
    mass = (F.count(F.lit(1)) if size_col is None
            else F.sum(size_col).cast("long"))
    per = docs.groupBy(F.col(source_col).alias("source")).agg(
        mass.alias("n_size")
    )
    # ``per`` is referenced by the total, the scores, and the
    # normalizer — unstaged, each reference re-scans the corpus. The
    # staged frame is |sources| rows.
    from .checkpoints import checkpoint_tracked

    per, _ = checkpoint_tracked(per, eager=False)
    tot = per.agg(F.sum("n_size").alias("_tot"))
    scored = per.join(F.broadcast(tot)).select(
        "source", "n_size",
        F.floor(F.col("n_size") * F.lit(1_000_000) / F.col("_tot"))
        .cast("long").alias("p_micro"),
        F.floor(
            F.pow(F.col("n_size").cast("double") / F.col("_tot"),
                  F.lit(float(alpha))) * F.lit(1e6)
        ).cast("long").alias("_pa_micro"),
    )
    norm = scored.agg(F.sum("_pa_micro").alias("_z"))
    return scored.join(F.broadcast(norm)).select(
        "source", "n_size", "p_micro",
        F.floor(F.col("_pa_micro") * F.lit(1_000_000) / F.col("_z"))
        .cast("long").alias("q_micro"),
    )


def epoch_plan(docs: DataFrame, token_budget: int, alpha: float = 0.3,
               max_epochs_micro: int = 4_000_000,
               source_col: str = "source",
               size_col: str | None = "n_chars") -> DataFrame:
    """Per-source epoch/repetition plan (M93): turn M92's
    temperature-scaled weights into a concrete sampling plan for a
    fixed token budget, with a repetition cap — the public
    data-constrained recipe (Muennighoff et al. 2023 find ~4 epochs of
    repetition near-free, rapidly decaying after) every mixture that
    up-samples small sources needs.

    Per source: ``requested = floor(budget · q_s)``;
    ``epochs = requested / available`` (integer micros); sources whose
    requested repetition exceeds ``max_epochs_micro`` are CAPPED at
    ``floor(available · max_epochs)`` and flagged, so the training
    loader can redistribute or shrink the run. All arithmetic is
    integer micros (exactness bound: ``budget · 1e6 < 2⁶³``, i.e.
    budgets up to ~9·10¹² units).

    Output per source: ``n_size`` (available mass), ``q_micro``
    (sampling weight), ``requested_tokens``, ``epochs_micro``
    (requested/available), ``granted_tokens``, ``capped`` (0/1).

    Scale: inherits :func:`temperature_mix_weights`' single
    partial-aggregated groupBy; everything after is arithmetic on the
    |sources|-row weights table.
    """
    if token_budget <= 0:
        raise ValueError("token_budget must be positive")
    if max_epochs_micro <= 0:
        raise ValueError("max_epochs_micro must be positive")
    w = temperature_mix_weights(docs, alpha=alpha, source_col=source_col,
                                size_col=size_col)
    req = F.floor(F.lit(token_budget) * F.col("q_micro") / F.lit(1_000_000)
                  ).cast("long")
    cap = F.floor(F.col("n_size") * F.lit(max_epochs_micro)
                  / F.lit(1_000_000)).cast("long")
    return w.select(
        "source", "n_size", "q_micro",
        req.alias("requested_tokens"),
        # when-guard, not coalesce: ANSI raises on x/0 before
        # null-handling could apply. A zero-mass source (all-empty
        # texts) reports NULL epochs: requested > 0 over 0 available
        # has no finite epoch count; granted stays 0 and capped flags.
        F.when(F.col("n_size") > 0,
               F.floor(req * F.lit(1_000_000) / F.col("n_size")))
        .cast("long").alias("epochs_micro"),
        F.least(req, cap).alias("granted_tokens"),
        (req > cap).cast("int").alias("capped"),
    )
