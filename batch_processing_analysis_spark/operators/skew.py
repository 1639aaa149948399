"""Skew remedies for hot join keys.

AQE's skew-join split (``spark.sql.adaptive.skewJoin.enabled``) handles
sort-merge joins whose PARTITIONS are skewed, but it cannot split a
single hot KEY on the build side of a shuffled hash join, and it does
nothing for deliberately keyed windows. Salting is the classic manual
remedy (documented in the Spark SQL performance guide lineage and every
large-scale deployment): widen the hot key with a salt ∈ [0, S), join
on (key, salt), replicating the *smaller* side S×.

When to reach for it, at 100 TB: a fact-to-fact equi-join where one
key holds >~1 partition's worth of rows AND the other side is too big
to broadcast. When NOT to: if the small side broadcasts, broadcast —
salting replicates it S× through the shuffle anyway.

Determinism: the salt is ``pmod(hash(row), S)`` of the big side's full
row — content-derived, so re-runs and retries land rows on the same
salt (no ``rand()``, which would break task-retry idempotency and any
oracle comparison).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def salted_join(big: DataFrame, small: DataFrame, on: str | list[str],
                salt: int = 16, how: str = "inner") -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on`` with the hot-key salt
    rewrite: ``big`` rows get a content-derived salt, ``small`` rows
    are exploded across all ``salt`` values, and the join runs on
    (key..., salt) — a single hot key now spreads over ``salt``
    reducers instead of one.

    Output columns and rows are identical to ``big.join(small, on,
    how)`` for ``how`` in {"inner", "left"} (each big row still meets
    each matching small row exactly once — the explode is on the other
    side).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    on = [on] if isinstance(on, str) else list(on)

    b = big.withColumn(
        SALT_COL, F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(salt))
    )
    s = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    ).withColumn(SALT_COL, F.col(SALT_COL).cast("int"))
    joined = b.join(s, on + [SALT_COL], how)
    return joined.drop(SALT_COL)
