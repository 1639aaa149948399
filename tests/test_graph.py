"""Connected components (operators/graph.py) on graphs with known
component structure."""

from __future__ import annotations

from pyspark.sql import functions as F

from batch_processing_analysis_spark.operators.graph import connected_components


def cc_map(nodes_df, edges_df, **kw):
    out = connected_components(nodes_df, edges_df, id_col="id", **kw)
    return {r["id"]: r["component"] for r in out.collect()}


def _persistent_ids(spark):
    return set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())


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


def test_pagerank_matches_integer_reference(spark):
    from batch_processing_analysis_spark.operators.graph import pagerank

    # Classic 4-node web: a hub (0) linked by everyone, plus a cycle.
    edges = [(1, 0), (2, 0), (3, 0), (0, 1), (1, 2), (2, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")

    # Pure-Python mirror of the documented integer recurrence.
    def ref_ranks(n_iter):
        nodes = {s for s, _ in edges} | {d for _, d in edges}
        deg = {}
        for s, _ in edges:
            deg[s] = deg.get(s, 0) + 1
        r = {v: 1_000_000 for v in nodes}
        for _ in range(n_iter):
            inc = {v: 0 for v in nodes}
            for s, d in edges:
                inc[d] += (85 * r[s]) // (100 * deg[s])
            r = {v: 150_000 + inc[v] for v in nodes}
        return r

    got = {row["id"]: row["rank_micros"]
           for row in pagerank(df, n_iterations=10).collect()}
    assert got == ref_ranks(10)          # bit-exact, not approximate
    assert max(got, key=got.get) == 0    # the hub dominates


def test_pagerank_dangling_and_isolated(spark):
    from batch_processing_analysis_spark.operators.graph import pagerank

    # 1 -> 2 (2 dangles); 9 isolated, supplied via nodes.
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    nodes = spark.createDataFrame([(9,)], "id long")
    got = {r["id"]: r["rank_micros"]
           for r in pagerank(df, n_iterations=3, nodes=nodes).collect()}
    # Isolated + dangling nodes keep exactly the teleport share as
    # outflow; node 2 receives 1's damped rank each round.
    assert set(got) == {1, 2, 9}
    assert got[1] == 150_000 and got[9] == 150_000
    assert got[2] == 150_000 + (85 * 150_000) // 100


def test_pagerank_releases_superstep_checkpoints(spark):
    from batch_processing_analysis_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(i, (i + 1) % 20) for i in range(20)], "src long, dst long"
    )
    before = _persistent_ids(spark)
    out = pagerank(edges, n_iterations=6)
    out.count()
    new = _persistent_ids(spark) - before
    assert len(new) <= 1, new  # only the final rank table survives
