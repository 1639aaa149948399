"""Streaming corpus operators: exact dedup over an unbounded document
stream (the ingestion-side twin of operators/dedup.exact_dedup).

A training-data ingestion pipeline dedups as documents ARRIVE — before
paying storage/compute downstream — not in a later batch pass. The
exact-dedup key (md5 of whitespace-normalized lowercase text) is
identical to the batch operator, so a batch re-run over the stream's
output finds nothing left to drop.

Semantics: keep the FIRST-ARRIVING document of each content-hash
cluster within the watermark horizon (the batch pass keeps min-id; the
set of kept *clusters* is identical, the representative may differ —
documented divergence inherent to streaming, where arrival order is the
only total order available). State is the hash→seen set bounded by the
watermark via ``dropDuplicatesWithinWatermark``; duplicates separated
by more than the horizon require a periodic batch sweep, the standard
lambda-architecture split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.dedup import content_norm

CONTENT_HASH = "content_hash"


def with_content_hash(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Batch-identical content hash (operators/dedup.py:exact_dedup)."""
    norm = content_norm(text_col)
    return docs.withColumn(CONTENT_HASH, F.md5(norm))


def stream_exact_dedup(docs: DataFrame, time_col: str = "ingest_time",
                       text_col: str = "text",
                       watermark: str = "10 minutes") -> DataFrame:
    """First-arriving-survivor exact dedup on a document stream.

    State: one row per distinct content hash inside the watermark
    horizon — bounded, keyed, and shuffled on the hash exactly like the
    batch operator's single exchange.
    """
    return (
        with_content_hash(docs, text_col)
        .withWatermark(time_col, watermark)
        .dropDuplicatesWithinWatermark([CONTENT_HASH])
    )


def stream_quality_filter(docs: DataFrame, *, quality_min: float = 0.2,
                          tokens_min: int = 5, tokens_max: int = 10_000,
                          text_col: str = "text") -> DataFrame:
    """Streaming twin of the prepare_corpus quality/token gate: score
    and filter documents AS THEY ARRIVE.

    quality_features is pure per-row codegen (no shuffle, no state), so
    the exact batch operator applies unchanged to an unbounded stream —
    the ingestion-side half of the corpus filter. The parts that need
    corpus-global state (dedup keep-list, shard packing) stay in the
    batch/stateful layers: stream_exact_dedup handles the in-horizon
    dedup; shard assignment is a batch compaction pass by construction
    (a running per-language token sum has no streaming total order).

    Emits the scored columns plus the original payload columns, gated
    on the same thresholds as pipeline.prepare_corpus — a batch re-run
    over the stream's survivors keeps every one of them. The score
    columns attach via withColumns (shared expressions with the batch
    operator), NOT a join — a self-join on a stream would be a
    watermark-requiring stream-stream join for no reason.
    """
    from ..operators.text_analysis import quality_columns

    scored = docs.withColumns(quality_columns(text_col))
    return scored.filter(
        (F.col("quality_score") >= quality_min)
        & F.col("n_tokens").between(tokens_min, tokens_max)
    )


def stream_decontaminate(docs: DataFrame, benchmark_grams: set[str],
                         n: int = 8, text_col: str = "text") -> DataFrame:
    """Streaming twin of operators/decontamination.decontaminate: flag
    documents sharing an exact word n-gram with the benchmark AS THEY
    ARRIVE.

    The batch operator's gram-level broadcast join would need a
    stateful per-doc re-aggregation on a stream (explode → join →
    groupBy(doc)), so the streaming form keeps the row layout: an
    Arrow-batched pandas UDF tests the document's gram array against a
    task-broadcast frozen set — stateless, watermark-free, one Python
    hop per ~10k-row batch (the multimodal plumbing shape, not a
    per-row UDF). Gram construction is the SAME `word_ngrams`
    expression as batch, so flags agree exactly (tested by replay in
    tests/test_corpus_stream.py).

    ``benchmark_grams``: the collected output of
    decontamination.benchmark_ngrams — eval sets are small (thousands
    of docs ⇒ at most a few million grams), the same object a real
    deployment ships as a Bloom filter.
    """
    import pandas as pd
    from pyspark.sql import functions as F  # noqa: F811 — local alias
    from pyspark.sql.functions import pandas_udf

    from ..operators.decontamination import word_ngrams

    bc = docs.sparkSession.sparkContext.broadcast(frozenset(benchmark_grams))

    def _hit_fn(grams):
        bench = bc.value
        return grams.apply(
            lambda g: int(any(x in bench for x in g)) if g is not None else 0
        )

    # (explicit functionType: `from __future__ import annotations`
    # stringifies signatures, which pandas_udf cannot infer from)
    _hit = pandas_udf(_hit_fn, "integer")

    return docs.withColumn(
        "contaminated", _hit(word_ngrams(F.col(text_col), n))
    )


def stream_validate(docs: DataFrame, rules) -> DataFrame:
    """Streaming twin of operators/validation.validate (M71): the
    admission-control gate applied AS DOCUMENTS ARRIVE.

    Rules are stateless per-row Column predicates, so the exact batch
    operator applies unchanged to an unbounded stream — same flags,
    same NULL-is-failure coercion, no watermark, no state (the same
    argument as stream_quality_filter). Route ``n_violations == 0``
    to the corpus sink and the rest to a quarantine sink from ONE
    writeStream each (two filters over the same flagged plan).
    Batch-replay equality is pinned in tests/test_corpus_stream.py.
    """
    from ..operators.validation import validate

    return validate(docs, rules)


def stream_weighted_reservoir(docs: DataFrame, k: int, seed: str,
                              group_col: str = "source",
                              id_col: str = "doc_id",
                              weight_col: str = "weight") -> DataFrame:
    """Streaming weighted reservoir sample (M116): maintain, per
    group, the running A-Res sample of everything seen so far —
    k rows drawn without replacement with probability ∝ weight, over
    an unbounded stream, in O(k) state per group.

    Exactly the batch rule of [[operators/sampling.py]]
    ``weighted_sample`` (Efraimidis & Spiliopoulos 2006): key =
    ln(u)/w with u the md5-derived 60-bit hash of ``seed ‖ id`` mapped
    to (0,1]; the k LARGEST keys win (id ascending tiebreak). Because
    the key is a pure per-row function — no randomness drawn at
    arrival time — the reservoir after any prefix of the stream equals
    the batch sample of that prefix EXACTLY, which is the test oracle
    (streamed == batch on replay, the streaming family's standard
    gate) and what makes restarts idempotent: replaying rows the state
    already absorbed changes nothing (merge is an idempotent,
    commutative top-k).

    Rows with NULL/NaN/non-positive weight are excluded (the batch
    operator's rule). Output mode ``update``: each micro-batch emits
    the group's CURRENT reservoir (rank-stamped); the sink keeps the
    latest row per (group, rank). State is a fixed-size triple of
    lists — watermark-free (NoTimeout): a reservoir never expires.

    Scale: state is k·(key, id, weight) per group — independent of
    stream length; the shuffle is the groupBy(group) exchange Spark
    already needs for stateful processing.
    """
    import hashlib
    import math
    from typing import Iterator

    from pyspark.sql.streaming.state import (GroupState,
                                             GroupStateTimeout)

    if k <= 0:
        raise ValueError(f"k ({k}) must be positive")

    out_schema = T.StructType([
        T.StructField(group_col, T.StringType()),
        T.StructField("rank", T.IntegerType()),
        T.StructField(id_col, T.LongType()),
        T.StructField(weight_col, T.DoubleType()),
        T.StructField("sample_key", T.DoubleType()),
    ])
    state_schema = T.StructType([
        T.StructField("keys", T.ArrayType(T.DoubleType())),
        T.StructField("ids", T.ArrayType(T.LongType())),
        T.StructField("ws", T.ArrayType(T.DoubleType())),
    ])

    def _key(doc_id: int) -> float:
        h = int(hashlib.md5(
            f"{seed}\x1f{doc_id}".encode()).hexdigest()[:15], 16)
        u = (h + 1.0) / float((1 << 60) + 1)
        return math.log(u)

    def fn(key: tuple, pdfs: Iterator["pd.DataFrame"],
           state: GroupState) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        rows: dict[int, tuple[float, float]] = {}
        if state.exists:
            keys, ids, ws = state.get
            rows = {i: (kk, w) for kk, i, w in zip(keys, ids, ws)}
        for pdf in pdfs:
            for doc_id, w in zip(pdf[id_col], pdf[weight_col]):
                w = float(w) if w is not None else float("nan")
                # NaN/NULL/<=0 excluded, the batch rule (+inf stays:
                # ln(u)/inf = -0.0 beats every finite key, exactly as
                # in the batch operator).
                if not (w > 0):
                    continue
                rows[int(doc_id)] = (_key(int(doc_id)) / w, w)
        # top-k by (key desc, id asc) — the batch operator's order
        top = sorted(rows.items(),
                     key=lambda it: (-it[1][0], it[0]))[:k]
        if top:
            state.update((
                [kk for _, (kk, _) in top],
                [i for i, _ in top],
                [w for _, (_, w) in top],
            ))
            yield pd.DataFrame({
                group_col: [key[0]] * len(top),
                "rank": list(range(1, len(top) + 1)),
                id_col: [i for i, _ in top],
                weight_col: [w for _, (_, w) in top],
                "sample_key": [round(kk, 9) for _, (kk, _) in top],
            })

    return (
        docs.groupBy(F.col(group_col))
        .applyInPandasWithState(
            fn, out_schema, state_schema, "update",
            GroupStateTimeout.NoTimeout,
        )
    )


def stream_heavy_hitter_summary(items: DataFrame, k: int = 20,
                                n_shards: int = 4,
                                item_col: str = "item") -> DataFrame:
    """Streaming Misra-Gries heavy-hitter summary (M130): maintain,
    per item-hash shard, a live ``k``-counter MG summary of everything
    seen so far — the streaming half of M112's two-pass exact heavy
    hitters (whose pass 1 runs the SAME fold per static partition).
    The live summary answers "what is trending in the ingest feed NOW"
    in O(n_shards·k) state over an unbounded stream; a periodic batch
    pass (M112 pass 2) turns the candidate union into exact counts.

    Sharding is by the md5-derived ``hash60(item) % n_shards`` — a
    pure function of the item, so ALL occurrences of an item land in
    one shard and the MG guarantee composes: an item with global count
    > N/(k+1) has shard count > n_shard/(k+1) in its (only) shard and
    MUST survive that shard's summary (Misra & Gries 1982 bound;
    merge-then-truncate validity from Agarwal et al. 2012 mergeable
    summaries). The union of shard summaries is therefore a provable
    candidate superset of the global heavy hitters at every prefix.

    Per update, the whole micro-batch folds into the counter dict
    FIRST and truncates ONCE (subtract the (k+1)-th largest, drop ≤0),
    so the result is deterministic regardless of how Arrow chunks the
    batch — and a plain Python replay of the same micro-batch sequence
    reproduces the state exactly (the test oracle). NULL items count
    under the ``None`` key (the M112 contract).

    Output mode ``update``: each micro-batch emits the shard's FULL
    summary padded to exactly ``k`` rank-stamped rows (count desc,
    item asc; NULL-item padding above the summary size), so a
    latest-row-per-(shard, rank) sink never shows stale entries from a
    shrunken summary. ``mg_count`` is the MG LOWER BOUND on the item's
    shard count (undercount ≤ n_shard/(k+1)), not an exact count.
    """
    import math  # noqa: F401  (parity with module conventions)
    from typing import Iterator

    from pyspark.sql.streaming.state import (GroupState,
                                             GroupStateTimeout)

    from ..operators.dedup import hash60

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")

    out_schema = T.StructType([
        T.StructField("shard", T.IntegerType()),
        T.StructField("rank", T.IntegerType()),
        T.StructField(item_col, T.StringType()),
        T.StructField("mg_count", T.LongType()),
    ])
    state_schema = T.StructType([
        T.StructField("its", T.ArrayType(T.StringType())),
        T.StructField("cts", T.ArrayType(T.LongType())),
    ])

    def fn(key: tuple, pdfs: Iterator["pd.DataFrame"],
           state: GroupState) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        counters: dict = {}
        if state.exists:
            its, cts = state.get
            counters = dict(zip(its, cts))
        for pdf in pdfs:
            for val, c in pdf[item_col].value_counts(dropna=False) \
                    .items():
                kk = None if pd.isna(val) else val
                counters[kk] = counters.get(kk, 0) + int(c)
        if len(counters) > k:
            cut = sorted(counters.values(), reverse=True)[k]
            counters = {v: c - cut
                        for v, c in counters.items() if c > cut}
        state.update((list(counters.keys()),
                      [int(c) for c in counters.values()]))
        top = sorted(counters.items(),
                     key=lambda it: (-it[1], it[0] is None, it[0]))
        items_out = [v for v, _ in top] + [None] * (k - len(top))
        counts_out = [c for _, c in top] + [None] * (k - len(top))
        yield pd.DataFrame({
            "shard": [int(key[0])] * k,
            "rank": list(range(1, k + 1)),
            item_col: items_out,
            "mg_count": pd.array(counts_out, dtype="Int64"),
        })

    # NULL items shard deterministically too (hash60(NULL) is NULL,
    # which would make a NULL group key): a \x00-prefixed sentinel no
    # real string equals routes them; the Python replay in the tests
    # uses the same sentinel.
    sharded = items.withColumn(
        "_shard",
        F.pmod(hash60(F.coalesce(F.col(item_col), F.lit("\x00NULL"))),
               F.lit(n_shards)).cast("int")
    )
    return sharded.groupBy(F.col("_shard")).applyInPandasWithState(
        fn, out_schema, state_schema, "update",
        GroupStateTimeout.NoTimeout,
    )
