"""Plan-shape pins for the round-2 dedup rewrites (VERDICT r1 items
1-3): signatures must be shuffle-free row-local projections, and the
LSH bucket table must be computed once (persisted) for the self-join.

These are the properties the 100 TB design depends on; a regression
(e.g. someone reintroducing explode+groupBy signatures) fails here
even while answers stay correct.
"""

import pytest
from pyspark.sql import functions as F

from sinter_spark import plans
from sinter_spark.operators import dedup


@pytest.fixture()
def docs(spark):
    rows = [(f"d{i}", f"some little document number {i} " * 3) for i in range(50)]
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_minhash_signatures_zero_exchanges(spark, docs):
    sig = dedup.minhash_signatures(docs, n_hashes=16)
    assert plans.count_exchanges(sig) == 0


def test_simhash_zero_exchanges(spark, docs):
    s = dedup.simhash(docs)
    assert plans.count_exchanges(s) == 0


def test_minhash_buckets_zero_exchanges(spark, docs):
    # banding is explode of a row-local array — still no shuffle
    b = dedup.minhash_buckets(docs, n_hashes=16, bands=4)
    assert plans.count_exchanges(b) == 0


def test_lsh_candidates_join_free_single_bucket_scan(spark, docs):
    # v4 grouped shape: pairs explode bucket-locally from ONE persisted
    # aggregated bucket table — no self-join (zero join operators in
    # the plan), and the signature subtree never appears twice
    cand = dedup.minhash_lsh_candidates(docs, n_hashes=16, bands=4)
    plan = plans.physical_plan(cand)
    assert plan.count("InMemoryTableScan") == 1
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "BroadcastHashJoin" not in plan
    try:
        cand.count()  # materialize to keep the persist honest
    finally:
        spark.catalog.clearCache()


def test_simhash_candidates_join_free_single_bucket_scan(spark, docs):
    cand = dedup.simhash_near_pairs(docs)
    plan = plans.physical_plan(cand)
    assert plan.count("InMemoryTableScan") == 1
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    spark.catalog.clearCache()


def test_mega_bucket_cap_drops_degenerate_clusters(spark):
    # 500 identical docs land in identical buckets; with the cap the
    # candidate join must not blow up quadratically, and the audit view
    # reports the dropped mass
    rows = [(f"d{i}", "exactly the same boilerplate text") for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    cand = dedup.minhash_lsh_candidates(df, n_hashes=16, bands=4, max_bucket=100)
    assert cand.count() == 0  # all buckets oversized -> dropped
    audit = dedup.oversized_buckets(
        dedup.minhash_buckets(df, n_hashes=16, bands=4), ["band", "bucket"], 100
    )
    assert audit.count() > 0
    assert audit.agg(F.max("n_members")).collect()[0][0] == 500
    spark.catalog.clearCache()
