"""Checkpoint/resume: lineage, crash-resume idempotency, metrics."""

import pytest
from pyspark.sql import functions as F

from sinter_spark.binding import bind
from sinter_spark.checkpoint import CheckpointStore, read_violations, run_checkpointed
from sinter_spark.images import fmt_dim, generate_images, image_schema


def _pass_fn(sub):
    res = bind(image_schema(), sub, row_key="image_id")
    return res.violations


@pytest.fixture()
def img_df(spark):
    return generate_images(spark, 1500, seed=42, max_dim=32, partitions=4)


def test_full_run_then_resume_is_noop(spark, img_df, tmp_path):
    store = CheckpointStore(spark, str(tmp_path / "ckpt"))
    run_id = run_checkpointed(img_df, _pass_fn, store, run_id="r1", n_buckets=8, buckets_per_job=4)
    v1 = read_violations(store, run_id)
    n1 = v1.count()
    assert n1 == _pass_fn(img_df).count()
    assert store.done_buckets("r1") == set(range(8))
    # resume: everything done → no new work, results unchanged
    run_checkpointed(img_df, _pass_fn, store, run_id="r1", n_buckets=8, buckets_per_job=4)
    assert read_violations(store, run_id).count() == n1


def test_crash_then_resume_completes_exactly(spark, img_df, tmp_path):
    store = CheckpointStore(spark, str(tmp_path / "ckpt"))
    with pytest.raises(RuntimeError, match="injected failure"):
        run_checkpointed(
            img_df, _pass_fn, store, run_id="r2", n_buckets=8, buckets_per_job=2, fail_after=2
        )
    done_mid = store.done_buckets("r2")
    assert 0 < len(done_mid) < 8  # partial progress recorded
    # resume finishes only the pending buckets
    run_checkpointed(img_df, _pass_fn, store, run_id="r2", n_buckets=8, buckets_per_job=2)
    assert store.done_buckets("r2") == set(range(8))
    # no duplicates vs a clean one-shot run
    expected = _pass_fn(img_df).count()
    got = read_violations(store, "r2").count()
    assert got == expected


def test_metrics_lineage(spark, img_df, tmp_path):
    store = CheckpointStore(spark, str(tmp_path / "ckpt"))
    run_checkpointed(img_df, _pass_fn, store, run_id="r3", n_buckets=4, buckets_per_job=4)
    m = store.metrics("r3")
    rows = m.collect()
    assert {r["bucket"] for r in rows} == {0, 1, 2, 3}
    assert sum(r["rows"] for r in rows) == 1500
    assert all(r["status"] == "done" for r in rows)
    assert all("violation_rate" in (r["stats"] or {}) for r in rows if r["rows"])


def test_lineage_mismatch_rejected(spark, img_df, tmp_path):
    store = CheckpointStore(spark, str(tmp_path / "ckpt"))
    run_checkpointed(img_df, _pass_fn, store, run_id="r4", n_buckets=4, buckets_per_job=4)
    with pytest.raises(ValueError, match="cannot resume"):
        run_checkpointed(img_df, _pass_fn, store, run_id="r4", n_buckets=8)


def test_bucket_fn_mismatch_rejected(spark, img_df, tmp_path):
    """A run bucketed under a different hash basis (older engine, or a
    pre-stamp run) must refuse to resume: its done-bucket ids name
    different row sets under the current mapping."""
    import json

    store = CheckpointStore(spark, str(tmp_path / "ckpt"))
    run_checkpointed(img_df, _pass_fn, store, run_id="r5", n_buckets=4, buckets_per_job=4)
    info = json.loads(store._state.properties["run.r5"])
    info["bucket_fn"] = "xxhash64(bigint key) % n, v1"  # simulate old engine
    store._state.update_properties(**{"run.r5": json.dumps(info)})
    with pytest.raises(ValueError, match="not comparable"):
        run_checkpointed(img_df, _pass_fn, store, run_id="r5", n_buckets=4)
    info.pop("bucket_fn")  # pre-stamp run: basis unknowable -> refuse too
    store._state.update_properties(**{"run.r5": json.dumps(info)})
    with pytest.raises(ValueError, match="unstamped"):
        run_checkpointed(img_df, _pass_fn, store, run_id="r5", n_buckets=4)


def test_hll_sketch_lineage_and_treewise_merge(spark, img_df, tmp_path):
    from sinter_spark.checkpoint import global_distinct
    from sinter_spark.operators import sketch

    store = CheckpointStore(spark, str(tmp_path / "ckpt"))
    run_checkpointed(img_df, _pass_fn, store, run_id="r5", n_buckets=8, buckets_per_job=4)
    # every bucket row carries a 4KB register array
    rows = store.metrics("r5").collect()
    assert all(r["sketch"] is not None and len(bytes(r["sketch"])) == sketch.M for r in rows if r["rows"])
    est = global_distinct(store, "r5")
    exact = img_df.select("image_id").na.drop().distinct().count()
    assert abs(est - exact) / exact < 0.05  # ~1.6% typical at p=12


def test_sketch_merge_associativity():
    import numpy as np

    from sinter_spark.operators import sketch

    rng = np.random.default_rng(0)
    h1 = rng.integers(-(2**63), 2**63 - 1, 5000, dtype=np.int64)
    h2 = rng.integers(-(2**63), 2**63 - 1, 5000, dtype=np.int64)
    s1 = sketch.sketch_from_hashes(h1)
    s2 = sketch.sketch_from_hashes(h2)
    both = sketch.sketch_from_hashes(np.concatenate([h1, h2]))
    assert sketch.merge_sketches([s1, s2]) == both  # union == concat
    # estimate accuracy on 10k distinct
    est = sketch.estimate(both)
    assert abs(est - 10000) / 10000 < 0.05


def test_chunk_loop_scans_source_exactly_twice(spark, img_df, tmp_path):
    """The docstring's '≤2 source scans per chunk' claim, measured: an
    accumulator counts every source row entering the pipeline; one
    single-chunk run must read exactly 2× the table (violations pass +
    metrics/HLL pass)."""
    import pandas as pd

    acc = spark.sparkContext.accumulator(0)

    def counted(batches):
        for pdf in batches:
            acc.add(len(pdf))
            yield pdf

    src = img_df.mapInPandas(counted, img_df.schema)
    store = CheckpointStore(spark, str(tmp_path / "ckpt"))
    run_checkpointed(src, _pass_fn, store, run_id="rscan", n_buckets=4, buckets_per_job=4)
    n = img_df.count()
    assert acc.value == 2 * n, f"expected {2*n} source rows read, saw {acc.value}"
