"""IVF ANN: recall-vs-brute-force gate, probe monotonicity, index
partition pruning, assignment determinism and plan shape."""

import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from sinter_spark.operators import ivf, similarity


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def cents(emb):
    return ivf.train_centroids(emb, n_clusters=8, seed=7)


@pytest.fixture(scope="module")
def query(emb):
    return [float(x) for x in emb.where("vec_id = 0").collect()[0]["embedding"]]


def test_recall_monotone_and_full_probe_exact(emb, cents, query):
    exact = [r["vec_id"] for r in similarity.cosine_topk(emb, query, k=10).collect()]
    recalls = []
    for n_probe in (1, 4, 8):
        got = [
            r["vec_id"]
            for r in ivf.ivf_topk(emb, cents, query, k=10, n_probe=n_probe).collect()
        ]
        recalls.append(len(set(exact) & set(got)) / len(exact))
    assert recalls == sorted(recalls), recalls  # more probes never hurt
    assert recalls[-1] == 1.0  # probing every cluster IS brute force
    assert recalls[1] >= 0.4  # partial probe finds most neighbors


def test_assignment_deterministic_and_total(emb, cents):
    a = ivf.assign_clusters(emb, cents)
    n = emb.count()
    assert a.count() == n
    assert a.where(F.col("cluster_id").isNull()).count() == 0
    ids = a.select("cluster_id").distinct().collect()
    assert all(0 <= r["cluster_id"] < len(cents) for r in ids)
    b = ivf.assign_clusters(emb, cents)
    assert (
        a.select("vec_id", "cluster_id")
        .exceptAll(b.select("vec_id", "cluster_id"))
        .count()
        == 0
    )


def test_assignment_plan_is_narrow(emb, cents):
    plan = ivf.assign_clusters(emb, cents)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "MapInArrow" in plan


def test_index_partition_pruning(emb, cents, query, spark, tmp_path):
    path = str(tmp_path / "ivf_idx")
    ivf.write_ivf_index(emb, cents, path)
    res = ivf.ivf_search_index(spark, path, query, k=10, n_probe=2)
    plan = res._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[(.*?)\]", plan)
    assert m and "cluster_id" in m.group(1) and " IN " in m.group(1), plan[:800]
    # pruned search agrees with the unwritten-DataFrame path
    direct = ivf.ivf_topk(emb, cents, query, k=10, n_probe=2)
    assert [r["vec_id"] for r in res.collect()] == [
        r["vec_id"] for r in direct.collect()
    ]


def test_train_rejects_undersized_sample(spark):
    tiny = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(4)], "vec_id bigint, embedding array<float>"
    )
    with pytest.raises(ValueError, match="smaller than n_clusters"):
        ivf.train_centroids(tiny, n_clusters=8)


def test_incremental_append_equals_rebuild(emb, cents, query, spark, tmp_path):
    """VERDICT_r03 #8: appending new vectors to a written index (same
    centroids, no retrain) must probe identically to a from-scratch
    build over the union, with partition pruning preserved."""
    old = emb.where("vec_id < 400")
    new = emb.where("vec_id >= 400")
    path_inc = str(tmp_path / "ivf_inc")
    ivf.write_ivf_index(old, cents, path_inc)
    ivf.append_to_ivf_index(spark, path_inc, new)
    path_full = str(tmp_path / "ivf_full")
    ivf.write_ivf_index(emb, cents, path_full)

    got_inc = ivf.ivf_search_index(spark, path_inc, query, k=10, n_probe=3)
    got_full = ivf.ivf_search_index(spark, path_full, query, k=10, n_probe=3)
    assert [tuple(r) for r in got_inc.collect()] == [tuple(r) for r in got_full.collect()]

    # appended rows land INSIDE cluster_id= dirs: pruning still applies
    plan = got_inc._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[(.*?)\]", plan)
    assert m and "cluster_id" in m.group(1), plan[:800]

    # the index now holds every row exactly once
    data = spark.read.parquet(f"{path_inc}/data")
    assert data.count() == emb.count()
    assert data.select("vec_id").distinct().count() == emb.count()
