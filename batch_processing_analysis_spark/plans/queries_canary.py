"""Driver-environment canary queries (VERDICT r4 task 1d).

Round 4's correctness gate diverged from the local verifier on six
queries; the root cause (un-cast DuckDB ``sum()`` → HUGEINT → float64
through the driver's pandas canonicalization) was recoverable only by
construct-level inference. These canaries make the next divergence
self-diagnosing: each one exercises EXACTLY ONE fragile construct
class, tiny enough to be free in the window, so a red CORRECTNESS row
names the driver-side mechanism directly.

q111 float-round      round(int/int, 6) doubles + quantized-ln micros
q112 regex-split      ``\\s+`` split / global regexp_replace / md5 norm
q113 json-extract     ``$.k`` extraction + numeric cast on the events JSON
q114 md5-hex-cast     the HASH60 hex-prefix → BIGINT convention
q115 nullable-int-agg min/max/sum over an empty group (NULL bigints)
q116 hugeint-probe    raw sum() NEXT TO its BIGINT cast — expected RED
                      on any driver whose canonicalizer converts HUGEINT
                      via pandas (the r4 mechanism); green means raw
                      sums are safe in that environment
q117 unicode-lower    lower() over non-ASCII literals shared verbatim
q122 pow              quantized libm pow at the mixing αs vs exact
                      sqrt (extra — post-freeze, head of r6 rotation)

All except q116 are expected green in every environment; q116 is a
deliberate probe whose docstring (and this header) records that a red
row is the hypothesis CONFIRMING outcome, not a defect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import hash60
from ..sources.tables import load_table
from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# q111: float rounding — the round(x, 6) convention used across the
# registered surface, fed exact rationals, plus the floor(-ln(p)·1e6+0.5)
# quantization q72/q76 rely on (detects libm ulp drift between the
# driver's DuckDB build and Spark's JVM Math.log).
# ---------------------------------------------------------------------------

@query(
    "q111_canary_float_round",
    r"""
    SELECT n_nationkey,
           round(n_nationkey * 1.0 / 7, 6) AS r_div7,
           round(n_nationkey * 1.0 / 3, 6) AS r_div3,
           CAST(floor(-ln((n_nationkey + 1) * 1.0 / 26) * 1e6 + 0.5)
                AS BIGINT) AS neglogp_micro
    FROM nation
    """,
    primary=False,
)
def q111_canary_float_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canary: 6dp rounding of exact rationals + quantized ln (25 rows)."""
    n = _t(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.round(F.col("n_nationkey") * 1.0 / 7, 6).alias("r_div7"),
        F.round(F.col("n_nationkey") * 1.0 / 3, 6).alias("r_div3"),
        F.floor(-F.log((F.col("n_nationkey") + 1) * 1.0 / 26) * 1e6 + 0.5)
        .cast("long").alias("neglogp_micro"),
    )


# ---------------------------------------------------------------------------
# q112: the whitespace-regex constructs shared by the text family —
# string_split_regex('\s+') tokenization (TOKS_SQL) and the
# regexp_replace(lower(text), '\s+', ' ', 'g') + trim + md5 content
# normalization (exact_dedup).
# ---------------------------------------------------------------------------

@query(
    "q112_canary_regex_split",
    r"""
    SELECT doc_id,
           len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))
             AS n_tokens_ws,
           substr(md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))),
                  1, 16) AS norm_hash16
    FROM documents WHERE doc_id % 97 = 0
    """,
    primary=False,
)
def q112_canary_regex_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canary: \\s+ split count + global-replace md5 normalization."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 97 == 0)
    toks = F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != "")
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens_ws"),
        F.substring(F.md5(norm), 1, 16).alias("norm_hash16"),
    )


# ---------------------------------------------------------------------------
# q113: JSON path extraction + numeric cast (the q86 construct class).
# ---------------------------------------------------------------------------

@query(
    "q113_canary_json_extract",
    r"""
    SELECT event_id,
           CAST(props->>'$.k' AS BIGINT) AS k,
           CASE WHEN json_valid(props) THEN 1 ELSE 0 END AS is_valid
    FROM events WHERE event_id % 499 = 0
    """,
    primary=False,
)
def q113_canary_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canary: $.k extraction from the events props JSON (21 rows)."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_id") % 499 == 0)
    parsed = F.from_json("props", "k long")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
        F.when(parsed.isNotNull(), 1).otherwise(0).alias("is_valid"),
    )


# ---------------------------------------------------------------------------
# q114: the md5-hex-prefix → BIGINT seeded-hash convention (HASH60)
# every deterministic sample/shuffle/bucket in the repo builds on.
# ---------------------------------------------------------------------------

@query(
    "q114_canary_hex_cast",
    r"""
    SELECT n_nationkey,
           CAST('0x' || substr(md5('canary:' || CAST(n_nationkey AS VARCHAR)),
                               1, 15) AS BIGINT) AS h60,
           CAST('0x' || substr(md5('canary:' || CAST(n_nationkey AS VARCHAR)),
                               1, 15) AS BIGINT) % 64 AS bucket
    FROM nation
    """,
    primary=False,
)
def q114_canary_hex_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canary: 60-bit md5-hex hash, full value AND mod-64 bucket."""
    n = _t(spark, sf_dir, "nation")
    h = hash60(F.concat(F.lit("canary:"), F.col("n_nationkey").cast("string")))
    return n.select(
        "n_nationkey", h.alias("h60"), (h % 64).alias("bucket")
    )


# ---------------------------------------------------------------------------
# q115: NULL-producing integer aggregates over an empty group — the
# nullable-int column class the driver's pandas path turns into float64
# on BOTH sides (symmetric, so expected green; red would mean the
# driver treats SQL NULL asymmetrically between Spark and DuckDB).
# ---------------------------------------------------------------------------

@query(
    "q115_canary_nullable_agg",
    r"""
    SELECT r_regionkey,
           count(CASE WHEN r_regionkey < 0 THEN 1 END) AS n_neg,
           min(CASE WHEN r_regionkey < 0 THEN r_regionkey END) AS min_empty,
           max(CASE WHEN r_regionkey < 0 THEN r_regionkey END) AS max_empty,
           CAST(sum(CASE WHEN r_regionkey < 0 THEN r_regionkey END)
                AS BIGINT) AS sum_empty
    FROM region GROUP BY r_regionkey
    """,
    primary=False,
)
def q115_canary_nullable_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canary: min/max/sum of an empty set → NULL bigint columns."""
    r = _t(spark, sf_dir, "region")
    neg = F.when(F.col("r_regionkey") < 0, F.col("r_regionkey"))
    return r.groupBy("r_regionkey").agg(
        F.count(neg).alias("n_neg"),
        F.min(neg).alias("min_empty"),
        F.max(neg).alias("max_empty"),
        F.sum(neg).cast("long").alias("sum_empty"),
    )


# ---------------------------------------------------------------------------
# q116: THE deliberate probe. s_raw is an un-cast DuckDB sum() —
# HUGEINT — while s_cast is the same value cast to BIGINT. Identical
# values through any exact canonicalizer; a pandas-based one converts
# s_raw to float64 ("300.0" vs "300") and hashes red. A red
# CORRECTNESS row here CONFIRMS the r4 divergence mechanism; it is the
# probe working, not a defect (module docstring; DRIVER_ENV.md).
# Allowlisted out of tests/test_oracle_types.py for exactly this reason.
# ---------------------------------------------------------------------------

@query(
    "q116_canary_hugeint_probe",
    r"""
    SELECT r_regionkey,
           sum(r_regionkey * 10 + 3) AS s_raw,
           CAST(sum(r_regionkey * 10 + 3) AS BIGINT) AS s_cast
    FROM region GROUP BY r_regionkey
    """,
    primary=False,
)
def q116_canary_hugeint_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canary probe: raw HUGEINT sum vs BIGINT cast (red = pandas canon)."""
    r = _t(spark, sf_dir, "region")
    s = F.sum(F.col("r_regionkey") * 10 + 3)
    return r.groupBy("r_regionkey").agg(
        s.alias("s_raw"), s.cast("long").alias("s_cast")
    )


# ---------------------------------------------------------------------------
# q117: unicode case folding — lower() over non-ASCII literals shared
# verbatim between the dialects (the testdata is pure ASCII, so this is
# the only query that exercises multibyte case mapping).
# ---------------------------------------------------------------------------

_UNICODE_SAMPLES: list[tuple[int, str]] = [
    (0, "Straße"),
    (1, "ÅNGSTRÖM"),
    (2, "Ëlëvàtor"),
    # no word-final capital sigma: Java lowercases it contextually to ς
    # (SpecialCasing.txt), utf8proc to σ — a KNOWN cross-engine
    # divergence, excluded so the canary is green unless the driver
    # drifts on the plain mappings below
    (3, "ΔΗΜΟΚΡΑΤΙΑ"),
    (4, "МОСКВА"),
    (5, "Ćevapčići"),
]


@query(
    "q117_canary_unicode_lower",
    "SELECT sid, lower(s) AS lowered, length(s) AS n_chars FROM (VALUES "
    + ", ".join(f"({i}, '{s}')" for i, s in _UNICODE_SAMPLES)
    + ") AS t(sid, s)",
    primary=False,
)
def q117_canary_unicode_lower(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canary: multibyte lower() + character length on shared literals."""
    df = spark.createDataFrame(_UNICODE_SAMPLES, "sid int, s string")
    return df.select(
        "sid",
        F.lower(F.col("s")).alias("lowered"),
        F.length("s").alias("n_chars"),
    )


# ---------------------------------------------------------------------------
# q122: libm pow — the q120/q121 (M92/M93) temperature-weight construct
# floor(pow(p, α)·1e6). pow is NOT a correctly-rounded IEEE op (unlike
# sqrt), so JVM Math.pow and the driver DuckDB's libm may differ by an
# ulp; this canary quantizes pow over exact rationals at the three αs
# the mixing surface uses, so a divergence names itself before a
# mixing query rotates into a window. Registered as an extra — the r5
# window froze before it existed; head of the r6 rotation.
# ---------------------------------------------------------------------------

@query(
    "q122_canary_pow",
    r"""
    SELECT n_nationkey,
           CAST(floor(pow((n_nationkey + 1) * 1.0 / 26, 0.3) * 1e6)
                AS BIGINT) AS pow03_micro,
           CAST(floor(pow((n_nationkey + 1) * 1.0 / 26, 0.5) * 1e6)
                AS BIGINT) AS pow05_micro,
           CAST(floor(pow((n_nationkey + 1) * 1.0 / 26, 0.7) * 1e6)
                AS BIGINT) AS pow07_micro,
           CAST(floor(sqrt((n_nationkey + 1) * 1.0 / 26) * 1e6)
                AS BIGINT) AS sqrt_micro
    FROM nation
    """,
    primary=False,
)
def q122_canary_pow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canary: quantized libm pow at α ∈ {0.3, 0.5, 0.7} + exact sqrt
    (25 rows). sqrt IS correctly rounded — if pow columns diverge and
    sqrt doesn't, the mechanism is libm pow ulp drift."""
    n = _t(spark, sf_dir, "nation")
    p = (F.col("n_nationkey") + 1) * 1.0 / 26
    return n.select(
        "n_nationkey",
        F.floor(F.pow(p, F.lit(0.3)) * 1e6).cast("long").alias("pow03_micro"),
        F.floor(F.pow(p, F.lit(0.5)) * 1e6).cast("long").alias("pow05_micro"),
        F.floor(F.pow(p, F.lit(0.7)) * 1e6).cast("long").alias("pow07_micro"),
        F.floor(F.sqrt(p) * 1e6).cast("long").alias("sqrt_micro"),
    )
