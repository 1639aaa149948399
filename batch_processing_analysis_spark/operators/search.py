"""BM25 keyword search over a document corpus (M31 scale extension).

Okapi BM25 (Robertson & Walker 1994; the Lucene-smoothed idf variant,
``ln(1 + (N - df + 0.5)/(df + 0.5))``) expressed as a relational plan —
the batch-engine analog of an inverted-index lookup:

1. per-document length ``dl`` = whitespace-token count — a per-row
   expression, no shuffle;
2. postings restricted to the query terms BEFORE any aggregation:
   ``explode(tokens) → filter(term ∈ query)`` so only matching
   occurrences ever reach a shuffle (at 100 TB this is the difference
   between shuffling the corpus and shuffling the hit set);
3. ``df`` per query term + corpus size ``N`` / average length
   ``avgdl`` — two tiny aggregates broadcast back (1 + |q| rows);
4. per-(doc, term) BM25 contribution, quantized to integer micros
   (``floor(s·10⁶ + 0.5)``) so the per-document summation is an EXACT
   integer sum — order-independent and engine-portable (float sums
   are associativity-sensitive; quantize-then-sum is the same trick as
   the SRP integer dot products, operators/similarity.py);
5. top-k via ``orderBy(score desc, id) LIMIT k`` — Spark plans a
   TakeOrdered (per-partition heap + driver merge), never a full sort.

No reference analog (the reference has no text search); the public
semantics are the BM25 formula itself.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import tokens


def bm25_topk(docs: DataFrame, query_terms: Sequence[str], k: int = 10,
              k1: float = 1.2, b: float = 0.75, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """Top-``k`` documents for a bag-of-words query by BM25.

    Returns ``(id_col, n_hit_terms, score_micro)`` — ``score_micro``
    is the BM25 score in integer micros (Σ over matched terms of
    ``floor(idf·tf_norm·10⁶ + 0.5)``), exact and portable; divide by
    1e6 for the conventional float score. Ties break on ``id_col``.

    Duplicate query terms are collapsed (set semantics, standard for
    bag-of-words retrieval). Scale: the only shuffle carrying data
    proportional to corpus size is the per-(doc, term) tf aggregation,
    and it is pre-filtered to query-term occurrences only.
    """
    q = sorted(set(query_terms))
    if not q:
        raise ValueError("query_terms must be non-empty")

    # Staged once (lazy checkpoint): the corpus stats and the tf
    # aggregate both consume the tokenized rows — unstaged, the
    # tokenize + filter pipeline ran once per consumer (and again per
    # tf consumer below).
    base = docs.select(
        F.col(id_col),
        tokens(F.lower(F.col(text_col))).alias("_tk"),
    ).select(
        id_col,
        F.size("_tk").alias("dl"),
        # Keep only query-term occurrences before exploding: the
        # filtered array is tiny even when the document is not.
        F.filter(F.col("_tk"), lambda t: t.isin(*q)).alias("_hits"),
    ).localCheckpoint(eager=False)

    # Corpus stats: one row (N, avgdl). Computed over ALL docs (dl is
    # per-row work; the aggregate is a scalar) and crossJoin-broadcast
    # (a 1-row build side — the plan audit allowlists this shape).
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )

    tf = (
        base.select(id_col, "dl", F.explode("_hits").alias("term"))
        .groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )

    # Document frequency per query term (≤ |q| rows) — broadcast back.
    df_t = tf.groupBy("term").agg(F.countDistinct(id_col).alias("df"))

    scored = (
        tf.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "_contrib",
            F.col("idf")
            * (F.col("tf") * (1.0 + k1))
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
            ),
        )
        .withColumn(
            # Integer micros BEFORE the per-doc sum: float addition is
            # order-sensitive; integer addition is not.
            "_micros",
            F.floor(F.col("_contrib") * F.lit(1e6) + F.lit(0.5)).cast("long"),
        )
    )

    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_hit_terms"),
            F.sum("_micros").alias("score_micro"),
        )
        .orderBy(F.col("score_micro").desc(), F.col(id_col))
        .limit(k)
    )
