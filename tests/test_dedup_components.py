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


def test_near_dup_components_lsh_path_matches_exact(spark, sf_dir):
    """With candidate verification, the scale path equals the exact
    path whenever banding recall is full (it is on this table):
    verified candidates ⊆ exact J≥0.5 pairs by construction, and the
    (64,16) banding catches every exact pair here."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    exact_nodes = {
        r["node"] for r in dedup.near_dup_components(docs, exact=True).collect()
    }
    lsh_nodes = {r["node"] for r in dedup.near_dup_components(docs).collect()}
    assert lsh_nodes == exact_nodes


def test_verify_jaccard_equals_exact_oracle(spark, sf_dir):
    """verify_jaccard_pairs over ALL-PAIRS candidates must equal the
    shingle-join oracle jaccard_pairs exactly — same similarity
    definition, same rounding."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(80).cache()
    ids = docs.select("doc_id")
    allpairs = (
        ids.withColumnRenamed("doc_id", "id_a")
        .crossJoin(ids.withColumnRenamed("doc_id", "id_b"))
        .where(F.col("id_a") < F.col("id_b"))
    )
    got = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in dedup.verify_jaccard_pairs(docs, allpairs, threshold=0.2).collect()
    }
    want = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in dedup.jaccard_pairs(docs, threshold=0.2).collect()
    }
    assert got == want and len(want) > 0
    docs.unpersist()


def test_lsh_threshold_is_honored(spark):
    """regression: threshold used to be silently dropped on the LSH
    path — raw banding candidates (J ≳ 0.5) became cluster edges even
    when the caller asked for 0.9, over-merging and DELETING docs."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame(
        [
            (1, base),
            (2, base),                                  # J = 1.0 with 1
            (3, base + " lambda mu nu xi omicron pi"),  # moderate J vs 1
            (4, "unrelated content entirely different"),
        ],
        "doc_id bigint, text string",
    )
    strict = {
        frozenset((r["node"], r["component"]))
        for r in dedup.near_dup_components(df, threshold=0.95).collect()
        if r["node"] != r["component"]
    }
    loose_kept = sorted(
        r["doc_id"] for r in dedup.dedup_canonical(df, threshold=0.5).collect()
    )
    assert strict == {frozenset((1, 2))}   # doc 3 not merged at 0.95
    assert loose_kept == [1, 4] or loose_kept == [1, 3, 4]
    spark.catalog.clearCache()
