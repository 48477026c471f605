"""Iceberg-shaped catalog: snapshots, dynamic overwrite, time travel.

The checkpoint engine (checkpoint.py) runs entirely through this API;
these tests pin the commit semantics it relies on (SURVEY.md §7.0).
"""

import os

import pytest
from pyspark.sql import functions as F

from sinter_spark.catalog import LocalParquetCatalog, get_catalog, has_iceberg


@pytest.fixture()
def catalog(spark, tmp_path):
    return LocalParquetCatalog(spark, str(tmp_path / "wh"))


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, v string")


class TestTableLifecycle:
    def test_create_load_exists_drop(self, spark, catalog):
        assert not catalog.table_exists("t")
        t = catalog.create_table("t", "k int, v string")
        assert catalog.table_exists("t")
        assert catalog.load_table("t").name == "t"
        with pytest.raises(ValueError, match="already exists"):
            catalog.create_table("t", "k int, v string")
        catalog.drop_table("t")
        assert not catalog.table_exists("t")
        with pytest.raises(ValueError, match="does not exist"):
            catalog.load_table("t")

    def test_empty_table_reads_schema(self, spark, catalog):
        t = catalog.create_table("t", "k int, v string")
        df = t.read()
        assert df.count() == 0
        assert df.columns == ["k", "v"]

    def test_nested_names_and_listing(self, spark, catalog):
        catalog.create_table("violations/r1", "k int, v string")
        catalog.create_table("state", "k int, v string")
        assert sorted(catalog.list_tables()) == ["state", "violations/r1"]
        with pytest.raises(ValueError, match="illegal"):
            catalog.create_table("../escape", "k int, v string")


class TestSnapshots:
    def test_append_accumulates(self, spark, catalog):
        t = catalog.create_table("t", "k int, v string")
        t.append(_df(spark, [(1, "a")]))
        t.append(_df(spark, [(2, "b")]))
        assert t.read().count() == 2
        snaps = t.snapshots()
        assert [s.operation for s in snaps] == ["append", "append"]
        assert snaps[1].parent_id == snaps[0].snapshot_id

    def test_time_travel(self, spark, catalog):
        t = catalog.create_table("t", "k int, v string")
        s1 = t.append(_df(spark, [(1, "a")]))
        t.append(_df(spark, [(2, "b")]))
        assert t.read_at(s1.snapshot_id).count() == 1
        assert t.read().count() == 2
        with pytest.raises(ValueError, match="no snapshot"):
            t.read_at(99)

    def test_properties_roundtrip(self, spark, catalog):
        t = catalog.create_table("t", "k int, v string")
        t.update_properties(owner="ckpt", retries="3")
        assert t.properties["owner"] == "ckpt"
        t.update_properties(retries="4")
        assert t.properties == {"owner": "ckpt", "retries": "4"}


class TestPartitionedOverwrite:
    def test_dynamic_overwrite_replaces_only_written_partitions(self, spark, catalog):
        t = catalog.create_table("t", "k int, v string", partition_by=["k"])
        t.append(_df(spark, [(1, "old1"), (2, "old2")]))
        # overwrite only k=1; k=2 must survive
        t.overwrite_partitions(_df(spark, [(1, "new1")]))
        got = {(r["k"], r["v"]) for r in t.read().collect()}
        assert got == {(1, "new1"), (2, "old2")}
        assert t.snapshots()[-1].operation == "overwrite"

    def test_overwrite_is_idempotent(self, spark, catalog):
        t = catalog.create_table("t", "k int, v string", partition_by=["k"])
        t.overwrite_partitions(_df(spark, [(1, "x"), (1, "y")]))
        t.overwrite_partitions(_df(spark, [(1, "x"), (1, "y")]))
        assert t.read().count() == 2  # not 4

    def test_manifest_tracks_partitions(self, spark, catalog):
        t = catalog.create_table("t", "k int, v string", partition_by=["k"])
        t.overwrite_partitions(_df(spark, [(1, "a"), (2, "b")]))
        t.overwrite_partitions(_df(spark, [(2, "c")]))
        m = t.manifest()
        assert set(m) == {"k=1", "k=2"}
        assert m["k=1"] != m["k=2"]  # k=2 re-points at the newer commit

    def test_partition_column_preserved_on_read(self, spark, catalog):
        t = catalog.create_table("t", "k int, v string", partition_by=["k"])
        t.append(_df(spark, [(7, "a")]))
        row = t.read().where(F.col("k") == 7).collect()[0]
        assert row["k"] == 7 and row["v"] == "a"


class TestCommitSemantics:
    def test_data_before_metadata(self, spark, catalog):
        """Files written but not committed are invisible (crash between
        data write and metadata swap leaves the previous snapshot)."""
        t = catalog.create_table("t", "k int, v string", partition_by=["k"])
        t.append(_df(spark, [(1, "a")]))
        # simulate a torn write: drop stray files without a commit
        stray = os.path.join(t.path, "data", "zz-uncommitted")
        os.makedirs(os.path.join(stray, "k=9"), exist_ok=True)
        _df(spark, [(9, "ghost")]).write.mode("overwrite").parquet(os.path.join(stray, "k=9"))
        assert {r["k"] for r in t.read().collect()} == {1}


class TestBackendDetection:
    def test_local_fallback(self, spark, tmp_path):
        assert not has_iceberg(spark)
        cat = get_catalog(spark, str(tmp_path / "wh"))
        assert isinstance(cat, LocalParquetCatalog)
