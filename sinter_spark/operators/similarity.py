"""Similarity search over embedding columns (array<float>).

* ``cosine_topk`` — brute-force top-k vs one query vector: the exact
  baseline. One narrow projection (zip_with dot product, JVM-side) +
  a top-k sort of scalar scores. Linear scan — fine for one query at
  any scale, and the oracle for the bucketed path.
* ``cosine_self_pairs`` — exact all-pairs ≥ threshold (oracle; O(n²),
  small inputs only).
* ``rp_lsh_buckets`` / ``rp_lsh_near_pairs`` — the scale path:
  random-hyperplane (SimHash-for-vectors) bucketing; only vectors
  sharing a signature block meet in the join. Deterministic planes
  derived from a seed so runs are reproducible.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from .dedup import _cap_buckets


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    round_to: int | None = 6,
) -> DataFrame:
    """Top-k rows by cosine similarity to query_vec (ties broken by id
    for determinism)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = cosine(F.col(vec_col), q)
    if round_to is not None:
        sim = F.round(sim, round_to)
    return (
        df.select(F.col(id_col), sim.alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def cosine_self_pairs(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    round_to: int | None = 6,
) -> DataFrame:
    """Exact all-pairs with cosine ≥ threshold (a < b). Quadratic —
    the oracle baseline for rp_lsh_near_pairs."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    sim = cosine(F.col("va"), F.col("vb"))
    if round_to is not None:
        sim = F.round(sim, round_to)
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", sim.alias("cos_sim"))
        .where(F.col("cos_sim") >= threshold)
    )


def _planes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.standard_normal((n_planes, dim))


def rp_lsh_buckets(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    n_planes: int = 16,
    seed: int = 7,
) -> DataFrame:
    """(id, bucket): sign-pattern of n_planes random hyperplanes, built
    as one JVM-side expression (no UDF): bit i = [Σ_j v_j·p_ij > 0]."""
    from ..plans import widen_small_scan

    planes = _planes(dim, n_planes, seed)
    df = widen_small_scan(df)
    v = F.col(vec_col)
    acc = F.lit(0).cast("bigint")
    for i in range(n_planes):
        dot = F.aggregate(
            F.zip_with(
                v,
                F.array(*[F.lit(float(x)) for x in planes[i]]),
                lambda x, p: x.cast("double") * p,
            ),
            F.lit(0.0),
            lambda a, b: a + b,
        )
        acc = acc + F.when(dot > 0, F.shiftleft(F.lit(1).cast("bigint"), i)).otherwise(F.lit(0).cast("bigint"))
    return df.select(F.col(id_col), acc.alias("bucket"))


def rp_lsh_near_pairs(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    threshold: float = 0.9,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 7,
    round_to: int | None = 6,
    max_bucket: int | None = 1000,
    cache: bool = True,
) -> DataFrame:
    """Approximate near-dup pairs: random-hyperplane signature split
    into ``bands`` blocks; pairs sharing ≥1 block get their exact
    cosine verified. Recall grows with bands; cost stays near-linear.

    The block table is persisted before the self-join (signature
    subtree computed once) and blocks larger than ``max_bucket`` are
    dropped — a degenerate embedding distribution (e.g. millions of
    zero vectors in one block) would otherwise make the join quadratic.
    The dropped mass is reportable via ``dedup.dropped_mass`` on the
    result (no silent caps).
    """
    sigs = rp_lsh_buckets(df, id_col=id_col, vec_col=vec_col, dim=dim, n_planes=n_planes, seed=seed)
    bits_per = n_planes // bands
    blocks = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(bi).alias("blk"),
                    F.shiftright(F.col("bucket"), bi * bits_per)
                    .bitwiseAND(F.lit((1 << bits_per) - 1))
                    .alias("val"),
                )
                for bi in range(bands)
            ]
        )
    ).alias("bb")
    bt = sigs.select(id_col, blocks).select(id_col, F.col("bb.blk").alias("blk"), F.col("bb.val").alias("val"))
    from .dedup import oversized_buckets

    audit = oversized_buckets(bt, ["blk", "val"], max_bucket) if max_bucket is not None else None
    bt = _cap_buckets(bt, ["blk", "val"], max_bucket)
    if cache:
        bt = bt.persist(StorageLevel.MEMORY_AND_DISK)
    a = bt.alias("a")
    b = bt.alias("b")
    cand = (
        a.join(b, ["blk", "val"])
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )
    va = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    sim = cosine(F.col("va"), F.col("vb"))
    if round_to is not None:
        sim = F.round(sim, round_to)
    out = (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", sim.alias("cos_sim"))
        .where(F.col("cos_sim") >= threshold)
    )
    from .dedup import _attach_cache, _attach_drop_audit

    out = _attach_drop_audit(out, audit)
    if cache:
        out = _attach_cache(out, bt)  # release via dedup.release_cache
    return out
