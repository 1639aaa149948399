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
