"""Benchmark decontamination for training corpora (M21).

Published procedure (GPT-3 appendix C, Brown et al. 2020; PaLM §6.1,
Chowdhery et al. 2022): a training document is *contaminated* if it
shares an exact word n-gram (n≈8-13) with any document of an evaluation
benchmark; contaminated documents are flagged or dropped before
training so eval numbers stay honest.

Relational shape (Spark-first, no UDF):

1. benchmark → distinct lowercased word n-grams (one narrow pass;
   benchmarks are small — thousands of documents — so the gram table
   broadcasts);
2. corpus → per-document distinct n-grams via a higher-order-function
   ``transform``/``slice`` over the token array (no shuffle; the array
   lives inside one row);
3. a broadcast left join gram→gram, then one partial-aggregatable
   groupBy(doc) counting total vs contaminated grams.

Scale: the corpus side is a single scan with map-side partial
aggregation; the only shuffle is the per-doc count combine. The
benchmark gram set stays on the small side of a broadcast join — at
1000 executors nothing about this plan changes. If the benchmark is
genuinely huge, pass ``broadcast_benchmark=False`` to fall back to a
hash join on the gram key.

No analogue in the reference (a process-mining pipeline); this is part
of the training-data extension surface, same family as dedup.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import tokens


def word_ngrams(text: Column, n: int) -> Column:
    """Distinct lowercased word n-grams of ``text`` (space-joined).

    Documents with fewer than ``n`` tokens yield an empty array. Stays
    inside codegen: split → sequence → transform/slice/concat_ws.
    """
    tk = tokens(F.lower(text))
    return F.when(
        F.size(tk) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(tk) - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(tk, i, F.lit(n))),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def benchmark_ngrams(benchmark: DataFrame, n: int = 8,
                     text_col: str = "text") -> DataFrame:
    """Distinct n-gram table of the evaluation benchmark: one column
    ``_gram``. Small by construction (eval sets are thousands of docs);
    the caller broadcasts it."""
    return (
        benchmark
        .select(F.explode(word_ngrams(F.col(text_col), n)).alias("_gram"))
        .distinct()
    )


def decontaminate(docs: DataFrame, benchmark: DataFrame, n: int = 8,
                  id_col: str = "doc_id", text_col: str = "text",
                  bench_text_col: str = "text",
                  broadcast_benchmark: bool = True) -> DataFrame:
    """Flag corpus documents sharing any exact word ``n``-gram with the
    benchmark.

    Returns one row per corpus document:
    ``(id_col, n_grams, n_contaminated, contamination_ratio,
    contaminated)`` where ``n_grams`` counts the document's distinct
    n-grams, ``n_contaminated`` those also present in the benchmark,
    ``contamination_ratio`` their 6-dp ratio (0 for gram-less docs),
    and ``contaminated`` is the 0/1 drop flag (any hit ⇒ 1 — the
    published n-gram-collision rule).

    Every document appears in the output (``explode_outer`` keeps
    short/empty docs), so the flag column is a total annotation the
    corpus filter can anti-join or predicate on.
    """
    grams = benchmark_ngrams(benchmark, n=n, text_col=bench_text_col)
    if broadcast_benchmark:
        grams = F.broadcast(grams)
    doc_grams = docs.select(
        F.col(id_col),
        F.explode_outer(word_ngrams(F.col(text_col), n)).alias("_gram"),
    )
    hits = doc_grams.join(
        grams.withColumn("_hit", F.lit(1)), on="_gram", how="left"
    )
    return (
        hits.groupBy(id_col)
        .agg(
            F.count("_gram").alias("n_grams"),
            F.count("_hit").alias("n_contaminated"),
        )
        .select(
            id_col,
            "n_grams",
            "n_contaminated",
            F.round(
                F.col("n_contaminated") / F.greatest(F.col("n_grams"), F.lit(1)),
                6,
            ).alias("contamination_ratio"),
            (F.col("n_contaminated") > 0).cast("int").alias("contaminated"),
        )
    )
