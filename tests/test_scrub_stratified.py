"""PII/URL scrubbing + exact-quota stratified sampling (round 5)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from sinter_spark.operators.packing import sample_stratified, sample_stratified_sql
from sinter_spark.operators.scrub import (
    PATTERNS,
    inject_pii_column,
    scrub_oracle_sql,
    scrub_text,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestScrub:
    def test_each_pattern(self, spark):
        rows = [
            (1, "mail a.b+c@ex-1.co please"),
            (2, "go to https://x.y/z?u=1 now"),
            (3, "plain http://h links too"),
            (4, "server at 10.0.0.255 up"),
            (5, "nothing here"),
            (6, None),
        ]
        got = {r.doc_id: r for r in scrub_text(_docs(spark, rows)).collect()}
        assert got[1].scrubbed == "mail <EMAIL> please" and got[1].n_email == 1
        assert got[2].scrubbed == "go to <URL> now" and got[2].n_url == 1
        assert got[3].scrubbed == "plain <URL> links too"
        assert got[4].scrubbed == "server at <IP> up" and got[4].n_ipv4 == 1
        assert got[5].scrubbed == "nothing here"
        assert (got[5].n_url, got[5].n_email, got[5].n_ipv4) == (0, 0, 0)
        assert got[6].scrubbed is None and got[6].n_url == 0

    def test_url_redacted_before_email_and_counts_are_raw(self, spark):
        # the email-shaped query param is inside the URL: the URL pass
        # removes it first, but the raw counts see both
        rows = [(1, "ref https://t.co/?e=a@b.io x")]
        r = scrub_text(_docs(spark, rows)).first()
        assert r.scrubbed == "ref <URL> x"
        assert r.n_url == 1 and r.n_email == 1

    def test_custom_patterns(self, spark):
        pats = {"num": (r"\d+", "#")}
        r = scrub_text(_docs(spark, [(1, "a 12 b 345")]), patterns=pats).first()
        assert r.scrubbed == "a # b #" and r.n_num == 2

    def test_multiple_occurrences(self, spark):
        r = scrub_text(_docs(spark, [(1, "a@b.co c@d.io and e@f.gg")]))\
            .first()
        assert r.scrubbed == "<EMAIL> <EMAIL> and <EMAIL>"
        assert r.n_email == 3

    def test_zero_exchanges(self, spark):
        plan = (
            scrub_text(_docs(spark, [(1, "x")]))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan

    def test_oracle_parity(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        injected = docs.select("doc_id", inject_pii_column().alias("text"))
        sp = {r.doc_id: r for r in scrub_text(injected).collect()}
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
        )
        rows = con.execute(scrub_oracle_sql()).fetchall()
        assert len(rows) == len(sp)
        hits = 0
        for doc_id, scrubbed, n_url, n_email, n_ip in rows:
            r = sp[doc_id]
            assert (r.scrubbed, r.n_url, r.n_email, r.n_ipv4) == (
                scrubbed, n_url, n_email, n_ip,
            ), doc_id
            hits += n_url + n_email + n_ip
        assert hits > 0  # the injection actually exercised redaction


class TestSampleStratified:
    def _table(self, spark):
        rows = [
            (i, f"t{i}", ["a", "b", "c"][i % 3]) for i in range(90)
        ]
        return spark.createDataFrame(rows, "doc_id long, text string, source string")

    def test_exact_quotas(self, spark):
        df = self._table(spark)
        out = sample_stratified(df, {"a": 5, "b": 0, "c": 30}, default_quota=0)
        counts = {
            r.source: r.n
            for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
        }
        assert counts == {"a": 5, "c": 30}

    def test_quota_above_group_size_keeps_all(self, spark):
        df = self._table(spark)
        out = sample_stratified(df, {"a": 1000}, default_quota=0)
        assert out.count() == 30

    def test_default_quota(self, spark):
        df = self._table(spark)
        out = sample_stratified(df, {"a": 2}, default_quota=3)
        counts = {
            r.source: r.n
            for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
        }
        assert counts == {"a": 2, "b": 3, "c": 3}

    def test_all_zero_quota_empty(self, spark):
        df = self._table(spark)
        assert sample_stratified(df, {}, default_quota=0).count() == 0

    def test_negative_quota_raises(self, spark):
        with pytest.raises(ValueError):
            sample_stratified(self._table(spark), {"a": -1})

    def test_partitioning_independent(self, spark):
        df = self._table(spark)
        a = sorted(
            r.doc_id
            for r in sample_stratified(df, {"a": 4, "b": 7}, seed=9).collect()
        )
        b = sorted(
            r.doc_id
            for r in sample_stratified(
                df.repartition(13), {"a": 4, "b": 7}, seed=9
            ).collect()
        )
        assert a == b and len(a) == 11

    def test_sql_twin_parity(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        quotas = {"src0": 11, "src1": 3, "src3": 0}
        sp = sorted(
            r.doc_id
            for r in sample_stratified(
                docs, quotas, seed=5, default_quota=7
            ).collect()
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
        )
        du = sorted(
            r[0]
            for r in con.execute(
                "SELECT doc_id FROM ("
                + sample_stratified_sql(quotas, seed=5, default_quota=7)
                + ")"
            ).fetchall()
        )
        assert sp == du

    def test_map_side_window_group_limit(self, spark):
        """The 100 TB contract: row_number <= k is pruned BELOW the
        exchange (partial WindowGroupLimit), so each map task ships at
        most max-quota rows per source instead of the whole table."""
        df = self._table(spark)
        plan = (
            sample_stratified(df, {"a": 5, "b": 2}, default_quota=1)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("WindowGroupLimit") >= 2  # partial + final
