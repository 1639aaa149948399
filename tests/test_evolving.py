"""Schema-evolution loader (sources/evolving.py): three generations of
the same table — column added, column widened, column retired — land in
one frame with the declared target schema."""

from __future__ import annotations

from batch_processing_analysis_spark.sources.evolving import (
    align_to_schema,
    load_evolving,
)

TARGET = "doc_id bigint, text string, quality double, lang string"


def test_load_evolving_three_generations(spark, tmp_path):
    # Gen 1: no quality column yet, doc_id was int32-narrow.
    g1 = spark.createDataFrame([(1, "one", "en")],
                               "doc_id int, text string, lang string")
    # Gen 2: quality added as float; legacy column still present.
    g2 = spark.createDataFrame([(2, "two", 0.5, "de", "legacy")],
                               "doc_id bigint, text string, quality float, "
                               "lang string, retired string")
    # Gen 3: exactly the target.
    g3 = spark.createDataFrame([(3, "three", 0.9, "fr")], TARGET)
    p1, p2, p3 = (str(tmp_path / d) for d in ("g1", "g2", "g3"))
    g1.write.parquet(p1); g2.write.parquet(p2); g3.write.parquet(p3)

    out = load_evolving(spark, [p1, p2, p3], TARGET)
    assert out.schema.simpleString() == (
        "struct<doc_id:bigint,text:string,quality:double,lang:string>"
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["quality"] is None          # added after gen 1
    assert rows[2]["quality"] == 0.5           # float -> double widened
    assert "retired" not in out.columns        # extras dropped, not merged
    assert rows[3]["lang"] == "fr"

    # The vanilla merged read refuses this mix (int vs bigint) — the
    # failure mode the loader exists to replace.
    import pytest as _pytest
    with _pytest.raises(Exception):
        spark.read.option("mergeSchema", "true").parquet(p1, p2, p3) \
            .collect()


def test_align_is_identity_on_conforming_frame(spark):
    df = spark.createDataFrame([(1, "x", 0.1, "en")], TARGET)
    from pyspark.sql.types import StructType

    aligned = align_to_schema(df, StructType.fromDDL(TARGET))
    assert aligned.schema == df.schema
    assert aligned.collect() == df.collect()
