"""SemDeDup-style embedding-space keep-one dedup (round 5)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sinter_spark.operators.similarity import semantic_dedup


def _table(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _clustered_rows(n_clusters=8, per=4, dim=16, seed=5):
    """Clusters of tiny perturbations around orthogonal-ish centers:
    within-cluster cosine ~0.999, across ~0."""
    rng = np.random.default_rng(seed)
    rows = []
    vid = 0
    for c in range(n_clusters):
        center = rng.normal(size=dim)
        center /= np.linalg.norm(center)
        for _ in range(per):
            v = center + rng.normal(scale=0.01, size=dim)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    # plus singletons
    for _ in range(10):
        v = rng.normal(size=dim)
        rows.append((vid, [float(x) for x in v]))
        vid += 1
    return rows, n_clusters, per


class TestSemanticDedup:
    def test_exact_keeps_one_per_cluster(self, spark):
        rows, n_clusters, per = _clustered_rows()
        df = _table(spark, rows)
        out = semantic_dedup(df, threshold=0.9, exact=True)
        # every cluster collapses to its min-id member; singletons stay
        kept = sorted(r.vec_id for r in out.collect())
        expected = [c * per for c in range(n_clusters)] + list(
            range(n_clusters * per, n_clusters * per + 10)
        )
        assert kept == expected

    def test_lsh_equals_exact_on_separated_clusters(self, spark):
        rows, _, _ = _clustered_rows()
        df = _table(spark, rows)
        exact = sorted(
            r.vec_id for r in semantic_dedup(df, threshold=0.9, exact=True).collect()
        )
        lsh = sorted(
            r.vec_id
            for r in semantic_dedup(
                df, threshold=0.9, dim=16, n_planes=16, bands=8
            ).collect()
        )
        # bands=8 (2-bit blocks) makes ~identical vectors share a block
        # with overwhelming probability — recall 1.0 on 0.999-cosine
        # clusters, and the exact-cosine verify kills false candidates
        assert lsh == exact

    def test_requires_dim_for_lsh(self, spark):
        df = _table(spark, [(0, [1.0, 0.0])])
        with pytest.raises(ValueError):
            semantic_dedup(df, threshold=0.9)

    def test_passes_through_original_columns(self, spark):
        rows = [(0, [1.0, 0.0], "a"), (1, [1.0, 0.0], "b"), (2, [0.0, 1.0], "c")]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label string"
        )
        out = semantic_dedup(df, threshold=0.99, exact=True)
        assert out.columns == df.columns
        assert sorted(r.vec_id for r in out.collect()) == [0, 2]
