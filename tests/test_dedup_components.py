"""connected_components / near_dup_components / dedup_canonical:
graph-shape unit tests (chain diameter, multiple components, empty
graph) and the end-to-end keep-one-per-cluster property. The oracled
entries (near_dup_components_docs, dedup_canonical_docs) are covered
by the generic DuckDB gate in test_entry_oracle.py.
"""

from pyspark.sql import functions as F

from sinter_spark.operators import dedup


def _cc(spark, edges):
    pairs = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    return {
        (r["node"], r["component"])
        for r in dedup.connected_components(pairs).collect()
    }


def test_chain_converges_past_diameter(spark):
    # 1-2-3-4-5 chain: min label must propagate 4 hops
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (5, 1)}


def test_multiple_components_and_direction(spark):
    # labels flow against edge direction too (graph is undirected)
    got = _cc(spark, [(7, 2), (2, 9), (20, 30)])
    assert got == {(2, 2), (7, 2), (9, 2), (20, 20), (30, 20)}


def test_empty_pair_graph(spark):
    pairs = spark.createDataFrame([], "id_a bigint, id_b bigint")
    out = dedup.connected_components(pairs)
    assert out.columns == ["node", "component"]
    assert out.count() == 0


def test_dedup_canonical_keeps_one_per_cluster(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),  # exact dup of 1
            (3, "alpha beta gamma delta epsilon zet"),  # near dup of 1
            (4, "completely unrelated content here xyz"),
        ],
        "doc_id bigint, text string",
    )
    kept = sorted(r["doc_id"] for r in dedup.dedup_canonical(df, exact=True).collect())
    assert kept == [1, 4]


def test_near_dup_components_lsh_path_superset(spark, sf_dir):
    """The scale path (LSH pair graph) must cluster at least everything
    the exact path clusters: LSH candidates ⊇ exact J≥0.5 pairs at
    (64,16) banding, and adding edges can only merge components."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    exact_nodes = {
        r["node"] for r in dedup.near_dup_components(docs, exact=True).collect()
    }
    lsh_nodes = {r["node"] for r in dedup.near_dup_components(docs).collect()}
    assert exact_nodes <= lsh_nodes
