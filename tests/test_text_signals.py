"""Repetition and pattern-count signals (operators/text_analysis.py)
on handcrafted documents with known values."""

from __future__ import annotations

from batch_processing_analysis_spark.operators import text_analysis as TA


def _docs(spark, items):
    return spark.createDataFrame(items, "doc_id long, text string")


def test_repetition_signals_known_values(spark):
    docs = _docs(spark, [
        (1, "a a a a"),            # 2-grams: "a a" x3 -> dup 2/3, top 1.0
        (2, "w x y z"),            # all distinct -> dup 0, top 1/3
        (3, "solo"),               # <2 tokens -> zeros
    ])
    rows = {r["doc_id"]: r for r in TA.repetition_signals(docs).collect()}
    assert rows[1]["dup_2gram_frac"] == round(2 / 3, 6)
    assert rows[1]["top_2gram_frac"] == 1.0
    assert rows[1]["dup_3gram_frac"] == 0.5      # "a a a" x2
    assert rows[2]["dup_2gram_frac"] == 0.0
    assert rows[2]["top_2gram_frac"] == round(1 / 3, 6)
    assert rows[3]["dup_2gram_frac"] == 0.0 and rows[3]["top_3gram_frac"] == 0.0


def test_pattern_counts_known_values(spark):
    docs = _docs(spark, [
        (1, "mail me at bob@example.com or see https://x.io/a b"),
        (2, "card 123456789 pin 1234"),
        (3, ""),
    ])
    rows = {r["doc_id"]: r for r in TA.pattern_counts(docs).collect()}
    assert rows[1]["n_emails"] == 1 and rows[1]["n_urls"] == 1
    assert rows[2]["n_digit_runs"] == 1          # only the 9-digit run
    assert rows[2]["digit_frac"] == round(13 / len("card 123456789 pin 1234"), 6)
    assert rows[3]["n_emails"] == 0 and rows[3]["digit_frac"] == 0.0


def test_winnowing_rows_match_array_form(spark, sf_dir):
    """The relational fingerprint rows and the array-form operator must
    produce identical per-doc fingerprint COUNTS (same algorithm, two
    physical shapes)."""
    from pyspark.sql import functions as F
    from batch_processing_analysis_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    rows = (
        TA.winnowing_fingerprint_rows(docs)
        .groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    )
    arrs = TA.winnowing_fingerprints(docs).select(
        "doc_id", F.col("n_fingerprints").alias("n")
    )
    assert rows.exceptAll(arrs).count() == 0
    assert arrs.exceptAll(rows).count() == 0


def test_prepare_corpus_facade(spark, sf_dir):
    """Facade output: only canonical, quality-passing docs; shards are
    contiguous non-negative indices per language with bounded budgets."""
    from pyspark.sql import functions as F
    from batch_processing_analysis_spark.pipeline import prepare_corpus
    from batch_processing_analysis_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = prepare_corpus(docs)
    rows = out.collect()
    assert rows and all(r["shard"] >= 0 for r in rows)
    assert all(r["quality_score"] >= 0.2 for r in rows)
    # Shard budgets: every shard except a language's last stays under
    # budget + one document's overshoot (cumulative-quotient property).
    by_shard: dict = {}
    for r in rows:
        by_shard.setdefault((r["predicted_lang"], r["shard"]), 0)
        by_shard[(r["predicted_lang"], r["shard"])] += r["n_tokens"]
    last = {}
    for (lang, shard), tot in by_shard.items():
        last[lang] = max(last.get(lang, -1), shard)
    for (lang, shard), tot in by_shard.items():
        if shard < last[lang]:
            assert tot >= 4096 - 10_000  # never pathologically empty


def test_bigram_logprob_semantics(spark):
    import math

    from batch_processing_analysis_spark.operators.text_analysis import (
        bigram_logprob,
    )

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a c"), (3, "solo"), (4, "")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in bigram_logprob(docs).collect()}
    # Corpus bigrams: (a,b)x2, (b,a)x1, (a,c)x1 -> p(b|a)=2/3, p(a|b)=1,
    # p(c|a)=1/3.
    q = lambda p: math.floor(-math.log(p) * 1e6 + 0.5)
    assert got[1]["n_bigrams"] == 3
    assert got[1]["sum_neglogp_micro"] == 2 * q(2 / 3) + q(1.0)
    assert got[2]["sum_neglogp_micro"] == q(1 / 3)
    # < 2 tokens -> zeros
    assert (got[3]["n_bigrams"], got[3]["avg_neglogp"]) == (0, 0.0)
    assert (got[4]["n_bigrams"], got[4]["avg_neglogp"]) == (0, 0.0)


def test_profile_columns_census(spark):
    from batch_processing_analysis_spark.operators.profiling import (
        profile_columns,
    )

    df = spark.createDataFrame(
        [("en", None), ("en", 5), ("fr", None), (None, None)],
        "lang string, score long",
    )
    got = {r["col_name"]: r for r in profile_columns(df, ["lang", "score"]).collect()}
    assert (got["lang"]["n_rows"], got["lang"]["n_nulls"]) == (4, 1)
    assert got["lang"]["n_distinct"] == 2
    assert (got["lang"]["top_value"], got["lang"]["top_count"]) == ("en", 2)
    # score: one non-null value
    assert (got["score"]["n_nulls"], got["score"]["n_distinct"]) == (3, 1)
    assert (got["score"]["top_value"], got["score"]["top_count"]) == ("5", 1)


def test_profile_columns_all_null(spark):
    from batch_processing_analysis_spark.operators.profiling import (
        profile_columns,
    )

    df = spark.createDataFrame([(None,), (None,)], "x string")
    row = profile_columns(df, ["x"]).collect()[0]
    assert (row["n_rows"], row["n_nulls"], row["n_distinct"],
            row["top_value"], row["top_count"]) == (2, 2, 0, None, 0)


def test_cdc_chunks_reassemble_and_shift_stability(spark):
    from batch_processing_analysis_spark.operators.text_analysis import (
        cdc_chunks,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [(1, base), (2, "XY" + base), (3, "short"), (4, "")],
        "doc_id long, text string",
    )
    rows = cdc_chunks(docs, k=8, modulus=4).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["seg_idx"], r["chunk"]))
    # Chunks concatenate back to the exact original text, in order.
    assert "".join(c for _, c in sorted(by_doc[1])) == base
    assert "".join(c for _, c in sorted(by_doc[2])) == "XY" + base
    # Sub-k document: one whole-text chunk. Empty: no rows.
    assert by_doc[3] == [(0, "short")]
    assert 4 not in by_doc
    # Shift robustness: a 2-char prefix insertion leaves the TAIL chunk
    # set identical (boundaries are content-defined, not offsets).
    tail1 = {c for _, c in by_doc[1][1:]}
    tail2 = {c for _, c in by_doc[2][1:]}
    assert tail1 & tail2, (by_doc[1], by_doc[2])
