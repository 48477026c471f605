"""Sequence packing + deterministic source mixing (round 5).

The distributed prefix sum must equal the naive global window on any
input (incl. skew, zeros, nulls), and the mixing hash must be
engine-portable (Spark ≡ scalar Python ≡ DuckDB SQL).
"""

import random

import duckdb
import pytest
from pyspark.sql import Window, functions as F

from sinter_spark.operators.packing import (
    deterministic_bucket,
    deterministic_bucket_py,
    deterministic_bucket_sql,
    mix_sources,
    pack_documents,
)


def _naive_pack(spark_df, chunk, id_col="doc_id"):
    w = Window.orderBy(id_col).rowsBetween(Window.unboundedPreceding, -1)
    return spark_df.select(
        F.col(id_col),
        F.col("n_tokens"),
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).alias("start_offset"),
    ).selectExpr(
        id_col,
        "n_tokens",
        "start_offset",
        f"start_offset div {chunk} as chunk_first",
        f"(start_offset + greatest(n_tokens, 1L) - 1) div {chunk} as chunk_last",
    )


class TestPackDocuments:
    def test_matches_global_window_cumsum(self, spark):
        rng = random.Random(7)
        rows = [(i * 3 + 1, "tok " * rng.randint(0, 40)) for i in range(400)]
        rng.shuffle(rows)
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = pack_documents(df, 64, num_partitions=7)
        want = _naive_pack(
            df.select(
                "doc_id",
                F.size(
                    F.regexp_extract_all(
                        F.coalesce("text", F.lit("")),
                        F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"),
                        0,
                    )
                ).cast("long").alias("n_tokens"),
            ),
            64,
        )
        assert sorted(got.collect()) == sorted(want.collect())

    def test_contiguous_offsets_and_span(self, spark):
        df = spark.createDataFrame(
            [(i, "w " * (i % 9)) for i in range(200)], "doc_id long, text string"
        )
        rows = sorted(pack_documents(df, 16, num_partitions=5).collect())
        off = 0
        for r in rows:
            assert r["start_offset"] == off
            off += r["n_tokens"]
            assert r["chunk_first"] == r["start_offset"] // 16
            end = r["start_offset"] + max(r["n_tokens"], 1) - 1
            assert r["chunk_last"] == end // 16
            assert r["chunk_first"] <= r["chunk_last"]

    def test_zero_token_and_null_text_docs(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c"), (2, ""), (3, None), (4, "d e")],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r for r in pack_documents(df, 2, num_partitions=2).collect()}
        assert rows[2]["n_tokens"] == 0 and rows[3]["n_tokens"] == 0
        # zero-token doc sits at its offset's chunk
        assert rows[2]["chunk_first"] == rows[2]["chunk_last"] == rows[2]["start_offset"] // 2
        assert rows[4]["start_offset"] == 3

    def test_null_ids_are_excluded(self, spark):
        df = spark.createDataFrame(
            [(1, "a"), (None, "b"), (2, "c")], "doc_id long, text string"
        )
        got = pack_documents(df, 4, num_partitions=2).collect()
        assert sorted(r["doc_id"] for r in got) == [1, 2]

    def test_empty_input(self, spark):
        df = spark.createDataFrame([], "doc_id long, text string")
        assert pack_documents(df, 8, num_partitions=3).count() == 0

    def test_single_partition_and_skewed_ids(self, spark):
        # ids concentrated in one range partition stress the prefix map
        rows = [(i, "x " * 5) for i in range(50)] + [(10_000 + i, "y") for i in range(3)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        for p in (1, 4):
            got = sorted(pack_documents(df, 8, num_partitions=p).collect())
            # last doc starts after 50 docs x 5 tokens + 2 'y' docs
            assert got[-1]["start_offset"] == 50 * 5 + 2
        assert pack_documents(df, 8, num_partitions=1).count() == 53

    def test_invalid_chunk_size(self, spark):
        df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
        with pytest.raises(ValueError):
            pack_documents(df, 0)

    def test_one_exchange_and_arrow_pass(self, spark):
        from sinter_spark import plans

        df = spark.createDataFrame(
            [(i, "t " * (i % 4)) for i in range(100)], "doc_id long, text string"
        )
        out = pack_documents(df, 32, num_partitions=4)
        plan = plans.physical_plan(out)
        # the cumsum is Arrow-batched, downstream is pure Column math,
        # and nothing above the cached ranged projection shuffles —
        # every Exchange in the tree is the ONE range shuffle inside
        # the persisted subtree (printed twice: stored plan + child)
        assert "MapInPandas" in plan
        above_cache = plan.split("InMemoryTableScan")[0]
        assert "Exchange" not in above_cache
        assert "hashpartitioning" not in plan
        assert "rangepartitioning" in plan


class TestDeterministicBucket:
    def test_spark_equals_scalar_twin(self, spark):
        keys = [0, 1, 2, 47, 10**6, 2**31, 2**53 + 7, 2**62]
        df = spark.createDataFrame([(k,) for k in keys], "k long")
        got = {
            r["k"]: r["b"]
            for r in df.select("k", deterministic_bucket("k", seed=3).alias("b")).collect()
        }
        for k in keys:
            assert got[k] == deterministic_bucket_py(k, seed=3)

    def test_sql_twin_matches_in_duckdb(self):
        con = duckdb.connect()
        expr = deterministic_bucket_sql("k", seed=3)
        rows = con.execute(
            f"SELECT k, {expr} AS b FROM (SELECT unnest(range(0, 5000)) AS k)"
        ).fetchall()
        for k, b in rows:
            assert b == deterministic_bucket_py(k, seed=3)

    def test_roughly_uniform(self):
        hits = sum(1 for k in range(20000) if deterministic_bucket_py(k) < 5000)
        assert abs(hits / 20000 - 0.5) < 0.02


class TestMixSources:
    def _docs(self, spark, n=4000):
        return spark.createDataFrame(
            [(i, f"src{i % 4}") for i in range(n)], "doc_id long, source string"
        )

    def test_weight_bounds(self, spark):
        df = self._docs(spark, 100)
        with pytest.raises(ValueError):
            mix_sources(df, {"src0": 1.2})
        with pytest.raises(ValueError):
            mix_sources(df, {"src0": 0.5}, default_weight=-0.1)

    def test_zero_and_one_weights(self, spark):
        df = self._docs(spark)
        kept = mix_sources(df, {"src0": 0.0, "src1": 1.0}, default_weight=1.0)
        by_src = {r["source"]: r["n"] for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
        assert "src0" not in by_src
        assert by_src["src1"] == 1000 and by_src["src2"] == 1000

    def test_fraction_converges_to_weight(self, spark):
        df = self._docs(spark, 8000)
        kept = mix_sources(df, {"src0": 0.5}, default_weight=0.0).count()
        assert abs(kept / 2000 - 0.5) < 0.06

    def test_deterministic_and_partition_independent(self, spark):
        df = self._docs(spark, 1000)
        a = sorted(r["doc_id"] for r in mix_sources(df, {"src1": 0.3}, seed=9).collect())
        b = sorted(
            r["doc_id"]
            for r in mix_sources(df.repartition(13), {"src1": 0.3}, seed=9).collect()
        )
        assert a == b

    def test_kept_set_matches_scalar_twin(self, spark):
        df = self._docs(spark, 500)
        kept = {
            r["doc_id"]
            for r in mix_sources(df, {"src0": 0.25, "src2": 0.8}, seed=1, default_weight=0.5).collect()
        }
        for i in range(500):
            w = {0: 0.25, 2: 0.8}.get(i % 4, 0.5)
            expect = deterministic_bucket_py(i, seed=1) < round(w * 10000)
            assert (i in kept) == expect, i

    def test_bucket_column_projection(self, spark):
        df = self._docs(spark, 50)
        rows = mix_sources(df, {}, default_weight=1.0, bucket_col="bucket").collect()
        for r in rows:
            assert r["bucket"] == deterministic_bucket_py(r["doc_id"])


class TestShuffledPacking:
    def _docs(self, spark, n=120, seed=3):
        rng = random.Random(seed)
        rows = [(i, "w " * rng.randrange(1, 40)) for i in range(n)]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_matches_global_window_in_hash_order(self, spark):
        from pyspark.sql import Window

        from sinter_spark.operators.packing import shuffle_order_hash
        from sinter_spark.operators.text import token_count

        df = self._docs(spark)
        got = pack_documents(df, 64, num_partitions=5, shuffle_seed=21).orderBy(
            "doc_id"
        )
        tok = F.coalesce(
            token_count(F.coalesce(F.col("text"), F.lit(""))).cast("long"), F.lit(0)
        )
        w = Window.orderBy(
            shuffle_order_hash("doc_id", 21), F.col("doc_id")
        ).rowsBetween(Window.unboundedPreceding, -1)
        naive = (
            df.select(
                "doc_id",
                tok.alias("n_tokens"),
                F.coalesce(F.sum(tok).over(w), F.lit(0)).alias("start_offset"),
            )
            .orderBy("doc_id")
            .collect()
        )
        for g, n in zip(got.collect(), naive):
            assert (g.doc_id, g.n_tokens, g.start_offset) == (
                n.doc_id, n.n_tokens, n.start_offset,
            )

    def test_seeds_give_uncorrelated_orders(self, spark):
        """Regression for the affine-seed defect: folding the seed
        ADDITIVELY shifts every hash by a constant, so different seeds
        produced (near-)identical ORDERINGS. The seed-derived
        multiplier must actually permute."""
        from sinter_spark.operators.packing import shuffle_order_hash_py

        keys = list(range(500))
        order_a = sorted(keys, key=lambda k: (shuffle_order_hash_py(k, 7), k))
        order_b = sorted(keys, key=lambda k: (shuffle_order_hash_py(k, 8), k))
        pos_b = {k: i for i, k in enumerate(order_b)}
        # Spearman-ish: mean absolute rank displacement should be large
        # (≈ n/3 for independent permutations), not ~0
        disp = sum(abs(i - pos_b[k]) for i, k in enumerate(order_a)) / len(keys)
        assert disp > len(keys) / 6

    def test_scalar_twin(self, spark):
        from sinter_spark.operators.packing import (
            shuffle_order_hash,
            shuffle_order_hash_py,
        )

        df = spark.createDataFrame([(k,) for k in (0, 1, 12345, 2**40)], "k long")
        got = df.select(
            "k", shuffle_order_hash("k", 11).alias("h")
        ).collect()
        for r in got:
            assert r.h == shuffle_order_hash_py(r.k, 11)

    def test_single_range_exchange(self, spark):
        df = self._docs(spark, n=60)
        plan = (
            pack_documents(df, 64, num_partitions=4, shuffle_seed=5)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Exchange rangepartitioning") <= 2  # cached plan + child copy
        assert "Exchange hashpartitioning" not in plan


class TestIntegralKeyGuard:
    def test_string_key_fails_loudly_not_silently_empty(self, spark):
        """Regression: a string/UUID key used to cast to NULL long,
        giving every row a NULL bucket — mix_sources dropped ALL rows
        while exiting 0. Must raise instead."""
        df = spark.createDataFrame(
            [("u-1", "t", "a"), ("u-2", "t", "b")],
            "doc_id string, text string, source string",
        )
        with pytest.raises(TypeError, match="integral"):
            mix_sources(df, {"a": 1.0}, key_col="doc_id")
        from sinter_spark.operators.packing import sample_stratified

        with pytest.raises(TypeError, match="integral"):
            sample_stratified(df, {"a": 1}, key_col="doc_id")
        with pytest.raises(TypeError, match="integral"):
            pack_documents(df, 64)
