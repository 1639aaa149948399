"""Connected components (operators/graph.py) on graphs with known
component structure."""

from __future__ import annotations

from pyspark.sql import functions as F

from batch_processing_analysis_spark.operators.graph import connected_components


def cc_map(nodes_df, edges_df, **kw):
    out = connected_components(nodes_df, edges_df, id_col="id", **kw)
    return {r["id"]: r["component"] for r in out.collect()}


def test_components_chain_star_and_singleton(spark):
    # Chain 1-2-3-4, star 10-{11,12,13}, singleton 20, pair 30-31
    # (edge given in descending order to exercise symmetrization).
    nodes = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 4, 10, 11, 12, 13, 20, 30, 31]], "id long"
    )
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (10, 13), (31, 30)],
        "id_a long, id_b long",
    )
    got = cc_map(nodes, edges)
    assert got == {1: 1, 2: 1, 3: 1, 4: 1,
                   10: 10, 11: 10, 12: 10, 13: 10,
                   20: 20, 30: 30, 31: 30}


def test_long_path_converges_within_log_iterations(spark):
    # A 64-node path has diameter 63; pointer jumping must close it in
    # far fewer supersteps than plain propagation (<= ~log2(64) + slack).
    n = 64
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    got = cc_map(nodes, edges, max_iterations=10)
    assert got == {i: 0 for i in range(n)}


def test_duplicate_and_self_edges_are_harmless(spark):
    nodes = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 2), (3, 3)], "id_a long, id_b long"
    )
    got = cc_map(nodes, edges)
    assert got == {1: 1, 2: 1, 3: 3}


# ---------------------------------------------------------------------------
# resolve_duplicates (M41): pairs -> components -> canonical keep-list
# ---------------------------------------------------------------------------

def test_resolve_duplicates_default_min_id(spark):
    from batch_processing_analysis_spark.operators.graph import (
        resolve_duplicates,
    )

    docs = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 7, 9]], "doc_id long"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "id_a long, id_b long"
    )
    got = {
        r["doc_id"]: (r["component"], r["is_canonical"])
        for r in resolve_duplicates(docs, pairs).collect()
    }
    # Chain 1-2-3 collapses to component 1; min id is canonical.
    assert got[1] == (1, 1) and got[2] == (1, 0) and got[3] == (1, 0)
    # Isolated docs are their own kept component.
    assert got[7] == (7, 1) and got[9] == (9, 1)


def test_resolve_duplicates_prefer_column(spark):
    from batch_processing_analysis_spark.operators.graph import (
        resolve_duplicates,
    )

    docs = spark.createDataFrame(
        [(1, 10), (2, 99), (3, 99)], "doc_id long, n_chars long"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "id_a long, id_b long"
    )
    got = {
        r["doc_id"]: r["is_canonical"]
        for r in resolve_duplicates(docs, pairs, prefer_col="n_chars").collect()
    }
    # Longest wins; tie on n_chars=99 broken by min doc id -> 2.
    assert got == {1: 0, 2: 1, 3: 0}
