"""Deterministic global shuffle for training-data ordering (M33 scale
extension).

Training runs need the corpus in a pseudorandom order that is (a)
reproducible bit-for-bit across runs/engines (resume, auditing), (b)
different per epoch, and (c) computable without a global sort of 100 TB
on one key range. The standard trick: order by a seeded content hash —
``key = hash60(seed ':' id)`` — which is a fixed pseudorandom
permutation of ids for that seed.

Plan shape: per-row key expression → one hash shuffle on
``shard = key mod S`` → per-shard window sort for within-shard
positions. No global sort ever exists; each shard sorts independently
(Spark plans the window as sort-within-partition after the exchange).
Shard sizes are multinomial-uniform — for S ≪ N the imbalance is
O(√(N/S)), negligible; the shard is also the natural write unit
(``partitionBy("shard")`` at the sink).

Epochs: vary ``seed`` (e.g. ``f"train:{epoch}"``) — a brand-new
permutation with zero state carried between epochs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from .dedup import hash60


def seeded_shuffle(df: DataFrame, seed: str, num_shards: int,
                   id_col: str = "doc_id") -> DataFrame:
    """Assign every row a deterministic (shard, pos) training order.

    Returns the input columns plus ``shard`` (∈ [0, num_shards)) and
    ``pos`` (1-based within-shard position). The induced global order
    (shard, pos) is a seeded pseudorandom permutation: key is the
    60-bit md5 hash of ``seed ':' id`` (portable — the DuckDB twin is
    byte-identical), shard is key mod S, position orders by (key, id).
    Ids must be unique; the (key, id) tiebreak makes the order total
    even under hash collisions.
    """
    if num_shards <= 0:
        raise ValueError("num_shards must be positive")
    keyed = df.withColumn(
        "_k",
        hash60(F.concat(F.lit(seed), F.lit(":"),
                        F.col(id_col).cast("string"))),
    ).withColumn("shard", (F.col("_k") % num_shards).cast("int"))
    w = W.partitionBy("shard").orderBy("_k", id_col)
    return keyed.withColumn("pos", F.row_number().over(w)).drop("_k")
