"""The lsh_fixtures scalar twins must equal the distributed kernels
bit-for-bit on adversarial inputs — the equality that makes them valid
oracles for minhash_lsh_docs / simhash_docs / rp_lsh_near_pairs.

The corpus-level equality runs in test_entry_oracle.py's parametrized
gate; this file drives the edge cases benign corpus text never hits:
multibyte UTF-8, U+0130 lowering, docs shorter than k, token-free
docs, control-byte tokenization, NULL text, near-zero hyperplane dots.
"""

import numpy as np
import pytest
from pyspark.sql import types as T

from sinter_spark.lsh_fixtures import (
    minhash_affine_params,
    minhash_sig_scalar,
    rp_bucket_scalar,
    simhash_scalar,
)

ADVERSARIAL_DOCS = [
    (0, "plain ascii text with spaces"),
    (1, "İstanbul İİİ capital dotted-I"),  # U+0130 lowering divergence trap
    (2, "ünïcödé ßtraße 中文字符 🎉🎊"),  # multibyte shingles at byte grain
    (3, "abc"),  # shorter than k=4 -> constant signature
    (4, ""),  # empty string (no tokens, constant minhash sig)
    (5, "a\tb\nc\rd\x01e\x1ff"),  # control bytes split tokens (<= 0x20)
    (6, None),  # NULL text -> omitted by both
    (7, "   \t\n  "),  # whitespace-only: no tokens
    (8, "x" * 5000),  # one long run, single repeated shingle
    (9, "MiXeD CaSe TOKENS MiXeD case tokens"),
]

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


@pytest.fixture(scope="module")
def adv_df(spark):
    return spark.createDataFrame(ADVERSARIAL_DOCS, DOC_SCHEMA)


def test_minhash_scalar_equals_arrow_kernel(spark, adv_df):
    from sinter_spark.operators import dedup

    got = {
        r["doc_id"]: list(r["sig"])
        for r in dedup.minhash_signatures_arrow(adv_df, k=4, n_hashes=64).collect()
    }
    A, B = minhash_affine_params()
    want = {
        d: minhash_sig_scalar(t, k=4, A=A, B=B)
        for d, t in ADVERSARIAL_DOCS
        if t is not None
    }
    assert got == want


def test_simhash_scalar_equals_arrow_kernel(spark, adv_df):
    from sinter_spark.operators import dedup

    got = {r["doc_id"]: r["simhash"] for r in dedup.simhash_arrow(adv_df).collect()}
    want = {}
    for d, t in ADVERSARIAL_DOCS:
        if t is None:
            continue
        v = simhash_scalar(t)
        if v is not None:
            want[d] = v
    # token-free docs (4, 7) and NULL (6) must be absent on BOTH sides
    assert 4 not in got and 7 not in got and 6 not in got
    assert got == want


def test_rp_bucket_scalar_equals_jvm_fold(spark):
    """Including vectors engineered to give near-zero dots, where any
    summation-order divergence would flip a sign."""
    from sinter_spark.operators import similarity

    rng = np.random.Generator(np.random.PCG64(99))
    vecs = [[float(np.float32(x)) for x in rng.standard_normal(64)] for _ in range(20)]
    # near-zero dot vs plane 0: project out the plane-0 component
    planes = rng.standard_normal((16, 64))  # NOT the operator's planes (seed differs)
    from sinter_spark.lsh_fixtures import rp_block_rows  # noqa: F401  (import sanity)

    op_planes = similarity._planes(64, 16, 7)
    v = rng.standard_normal(64)
    v -= (v @ op_planes[0]) / (op_planes[0] @ op_planes[0]) * op_planes[0]
    vecs.append([float(np.float32(x)) for x in v])
    vecs.append([0.0] * 64)  # all-zero vector: every dot == 0 (not > 0)

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("embedding", T.ArrayType(T.FloatType())),
            ]
        ),
    )
    got = {
        r["vec_id"]: r["bucket"]
        for r in similarity.rp_lsh_buckets(df, dim=64, n_planes=16, seed=7).collect()
    }
    want = {i: rp_bucket_scalar(v, op_planes) for i, v in enumerate(vecs)}
    assert got == want
    assert got[len(vecs) - 1] == 0  # zero vector lands in bucket 0 on both


def test_oracle_sql_builders_follow_env(tmp_path, monkeypatch):
    """The builders read $SINTER_ORACLE_SF_DIR at call time, so the
    in-repo gate and the driver (sf0.01 default) see matching data."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sinter_spark import lsh_fixtures as lf

    docs = pa.table(
        {"doc_id": pa.array([1, 2], pa.int64()), "text": ["abcd efgh", "abcd efgh"]}
    )
    pq.write_table(docs, tmp_path / "documents.parquet")
    emb = pa.table(
        {
            "vec_id": pa.array([1, 2], pa.int64()),
            "embedding": pa.array([[1.0] * 64, [1.0] * 64], pa.list_(pa.float32())),
        }
    )
    pq.write_table(emb, tmp_path / "embeddings.parquet")
    monkeypatch.setenv("SINTER_ORACLE_SF_DIR", str(tmp_path))

    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{tmp_path}/embeddings.parquet'")
    # identical docs -> the one candidate pair; identical vectors -> cos 1.0
    assert con.execute(lf.minhash_oracle_sql()).fetchall() == [(1, 2)]
    assert con.execute(lf.rp_lsh_oracle_sql()).fetchall() == [(1, 2, 1.0)]
    sh = con.execute(lf.simhash_oracle_sql()).fetchall()
    assert len(sh) == 2 and sh[0][1] == sh[1][1]
