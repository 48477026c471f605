"""Decontamination + repetition-feature operators (round 5).

Semantics are pinned three ways: hand-computed expectations on crafted
documents, a scalar-Python differential on random word-salad, and the
DuckDB oracle twins (the same SQL the driver gate runs)."""

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from sinter_spark.operators.decontam import (
    contamination,
    decontaminate,
    decontamination_oracle_sql,
    ngrams,
)
from sinter_spark.operators.text import repetition_features, repetition_oracle_sql


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# ngrams


class TestNgrams:
    def test_basic(self, spark):
        df = spark.createDataFrame([(["a", "b", "c", "d"],)], "t array<string>")
        out = df.select(ngrams(F.col("t"), 2).alias("g")).first().g
        assert out == ["a b", "b c", "c d"]

    def test_short_doc_empty(self, spark):
        df = spark.createDataFrame([(["a", "b"],)], "t array<string>")
        assert df.select(ngrams(F.col("t"), 3).alias("g")).first().g == []

    def test_n1_is_tokens(self, spark):
        df = spark.createDataFrame([(["x", "y"],)], "t array<string>")
        assert df.select(ngrams(F.col("t"), 1).alias("g")).first().g == ["x", "y"]

    def test_n_below_one_raises(self):
        with pytest.raises(ValueError):
            ngrams(F.col("t"), 0)


# ---------------------------------------------------------------------------
# contamination / decontaminate


class TestContamination:
    def test_hand_computed(self, spark):
        train = _docs(
            spark,
            [
                (1, "a b c d e f"),  # grams of bench doc: overlap "a b c"… all 4
                (2, "a b c x y z"),  # shares only "a b c"
                (3, "p q r s t u"),  # no overlap
                (4, "a b"),  # too short for 3-grams
                (5, None),  # null text
            ],
        )
        bench = _docs(spark, [(100, "a b c d e f")])
        rep = {
            r.doc_id: r
            for r in contamination(train, bench, n=3, min_matches=2).collect()
        }
        assert rep[1].n_grams == 4 and rep[1].matched_grams == 4
        assert rep[1].contaminated
        assert rep[2].matched_grams == 1 and not rep[2].contaminated
        assert rep[3].matched_grams == 0 and not rep[3].contaminated
        assert rep[4].n_grams == 0 and rep[4].contamination_ratio == 0.0
        assert rep[5].n_grams == 0 and not rep[5].contaminated

    def test_min_ratio_gate(self, spark):
        train = _docs(spark, [(1, "a b c x y z w v u t s r")])  # 10 grams, 1 match
        bench = _docs(spark, [(9, "a b c")])
        r1 = contamination(train, bench, n=3, min_matches=1).first()
        assert r1.contaminated
        r2 = contamination(train, bench, n=3, min_matches=1, min_ratio=0.5).first()
        assert not r2.contaminated

    def test_distinct_grams_counted_once(self, spark):
        # "a b a b a b" has 3-grams [a b a, b a b, a b a] -> 2 distinct
        train = _docs(spark, [(1, "a b a b a b")])
        bench = _docs(spark, [(9, "a b a")])
        r = contamination(train, bench, n=3).first()
        assert r.n_grams == 2 and r.matched_grams == 1

    def test_decontaminate_drops_and_keeps_schema(self, spark):
        train = _docs(spark, [(1, "a b c d"), (2, "x y z w")])
        bench = _docs(spark, [(9, "a b c")])
        out = decontaminate(train, bench, n=3)
        assert out.columns == train.columns
        assert [r.doc_id for r in out.collect()] == [2]

    def test_plan_broadcast_and_single_wide_shuffle(self, spark):
        """The 100 TB contract: the corpus side is never sort-merge
        joined; the only hashpartitioning exchange over corpus rows is
        the final groupBy on the unique doc id."""
        train = _docs(spark, [(i, "a b c d e f") for i in range(50)])
        bench = _docs(spark, [(9, "a b c d")])
        plan = (
            contamination(train, bench, n=3)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan
        # exchanges: bench-side distinct + final groupBy (partial aggs
        # are map-side) — nothing else may shuffle
        assert plan.count("Exchange hashpartitioning") <= 2


# ---------------------------------------------------------------------------
# repetition features


def _rep_py(text):
    """Scalar twin of repetition_features for the differential."""
    toks = text.lower().strip().split() if text and text.strip() else []

    def grams(n):
        return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]

    def dup_frac(xs):
        if not xs:
            return 0.0
        from collections import Counter

        c = Counter(xs)
        return round(sum(1 for x in xs if c[x] > 1) / len(xs), 6)

    g2, g3 = grams(2), grams(3)
    from collections import Counter

    top2 = max(Counter(g2).values()) if g2 else 0
    return {
        "n_tokens": len(toks),
        "dup_token_frac": dup_frac(toks),
        "top_bigram_share": round(top2 / len(g2), 6) if g2 else 0.0,
        "dup_trigram_frac": dup_frac(g3),
    }


class TestRepetitionFeatures:
    def test_hand_computed(self, spark):
        df = _docs(spark, [(1, "a a a b")])
        r = repetition_features(df).first()
        assert r.n_tokens == 4
        assert r.dup_token_frac == 0.75  # three 'a's duplicated, 'b' not
        # bigrams: [a a, a a, a b] -> top share 2/3
        assert r.top_bigram_share == round(2 / 3, 6)
        # trigrams: [a a a, a a b] -> none duplicated
        assert r.dup_trigram_frac == 0.0

    def test_empty_and_null_zero(self, spark):
        df = _docs(spark, [(1, ""), (2, None), (3, "   ")])
        for r in repetition_features(df).collect():
            assert (
                r.n_tokens == 0
                and r.dup_token_frac == 0.0
                and r.top_bigram_share == 0.0
                and r.dup_trigram_frac == 0.0
            )

    def test_differential_random(self, spark):
        rng = random.Random(11)
        vocab = ["aa", "bb", "cc", "dd"]
        rows = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 30))))
            for i in range(60)
        ]
        got = {r.doc_id: r for r in repetition_features(_docs(spark, rows)).collect()}
        for i, text in rows:
            exp = _rep_py(text)
            for k, v in exp.items():
                assert getattr(got[i], k) == v, (i, k, text)

    def test_zero_exchanges(self, spark):
        df = _docs(spark, [(1, "a b c")])
        plan = (
            repetition_features(df)._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# DuckDB oracle twins (same SQL the driver gate runs)


class TestOracleTwins:
    @pytest.fixture()
    def con(self, sf_dir):
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
        )
        return con

    def _spark_docs(self, spark, sf_dir):
        return spark.read.parquet(f"{sf_dir}/documents.parquet")

    def test_repetition_parity(self, spark, sf_dir, con):
        sp = {
            r.doc_id: r
            for r in repetition_features(self._spark_docs(spark, sf_dir)).collect()
        }
        for doc_id, n, dt, tb, dg in con.execute(repetition_oracle_sql()).fetchall():
            r = sp[doc_id]
            assert (r.n_tokens, r.dup_token_frac, r.top_bigram_share,
                    r.dup_trigram_frac) == (n, dt, tb, dg), doc_id

    def test_contamination_parity(self, spark, sf_dir, con):
        docs = self._spark_docs(spark, sf_dir)
        rep = contamination(
            docs.where(F.col("doc_id") % 37 != 0),
            docs.where(F.col("doc_id") % 37 == 0),
            n=5,
        )
        sp = {r.doc_id: r for r in rep.collect()}
        rows = con.execute(decontamination_oracle_sql(n=5)).fetchall()
        assert len(rows) == len(sp)
        for doc_id, n, m, ratio, flag in rows:
            r = sp[doc_id]
            assert (r.n_grams, r.matched_grams, r.contamination_ratio,
                    r.contaminated) == (n, m, ratio, flag), doc_id


class TestHashedGrams:
    def test_hashed_equals_string_join(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        bench = docs.where(F.col("doc_id") % 37 == 0)
        train = docs.where(F.col("doc_id") % 37 != 0)
        a = sorted(
            map(tuple, contamination(train, bench, n=5).collect())
        )
        b = sorted(
            map(tuple, contamination(train, bench, n=5, hash_grams=True).collect())
        )
        assert a == b

    def test_hashed_plan_still_broadcast(self, spark):
        train = spark.createDataFrame(
            [(i, "a b c d e f") for i in range(20)], "doc_id long, text string"
        )
        bench = spark.createDataFrame([(9, "a b c d")], "doc_id long, text string")
        plan = (
            contamination(train, bench, n=3, hash_grams=True)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


class TestScrubIdempotence:
    def test_scrub_fixpoint_property(self, spark):
        """Redaction placeholders must not re-match any pattern —
        scrubbing is a fixpoint after one pass (random adversarial
        text, incl. PII fragments abutting placeholders)."""
        import random as _r

        from sinter_spark.operators.scrub import scrub_text

        rng = _r.Random(13)
        frags = [
            "a@b.co", "https://x.y/p?q=a@b.io", "10.0.0.1", "<URL>",
            "<EMAIL>", "<IP>", "word", "1.2.3.4.5", "x@y", "http://",
        ]
        rows = [
            (i, " ".join(rng.choice(frags) for _ in range(rng.randrange(0, 12))))
            for i in range(80)
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        once = scrub_text(df).select("doc_id", F.col("scrubbed").alias("text"))
        twice = scrub_text(once)
        # nothing left to redact on the second pass…
        assert (
            twice.where(F.col("n_url") + F.col("n_email") + F.col("n_ipv4") > 0)
            .count() == 0
        )
        # …and the text is bit-stable
        joined = once.join(twice.select("doc_id", "scrubbed"), "doc_id")
        assert joined.where(F.col("text") != F.col("scrubbed")).count() == 0


# ---------------------------------------------------------------------------
# hypothesis differential: contamination vs a straight-line scalar twin


def _contam_py(train, bench, n):
    """Scalar twin of contamination() (whitespace regex ≡ Spark \\s+)."""
    import re

    def grams(text):
        toks = (
            re.split(r"\s+", text.lower().strip())
            if text and text.strip()
            else []
        )
        return {
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        }

    bench_grams = set().union(*(grams(t) for _, t in bench)) if bench else set()
    out = {}
    for doc_id, text in train:
        g = grams(text)
        out[doc_id] = (len(g), len(g & bench_grams))
    return out


class TestContaminationHypothesis:
    def test_differential_fuzz(self, spark):
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        # tokens avoid İ (U+0130: JVM lower() ≠ Python str.lower()) but
        # include multibyte, digits, punctuation and empty/whitespace
        token = st.sampled_from(
            ["a", "b", "ab", "1", "!", "é", "ß", "中", "x-y", "...", "B"]
        )
        doc = st.lists(token, min_size=0, max_size=12).map(" ".join)
        docs = st.lists(doc, min_size=1, max_size=12)

        @settings(
            max_examples=15,
            deadline=None,
            suppress_health_check=[HealthCheck.function_scoped_fixture],
        )
        @given(train_texts=docs, bench_texts=docs, n=st.integers(1, 4))
        def run(train_texts, bench_texts, n):
            train = list(enumerate(train_texts))
            bench = [(100 + i, t) for i, t in enumerate(bench_texts)]
            sdf = spark.createDataFrame(train, "doc_id long, text string")
            bdf = spark.createDataFrame(bench, "doc_id long, text string")
            got = {
                r.doc_id: (r.n_grams, r.matched_grams)
                for r in contamination(sdf, bdf, n=n).collect()
            }
            assert got == _contam_py(train, bench, n)

        run()
