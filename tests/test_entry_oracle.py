"""Driver-replica correctness gate: each queries() entry vs its DuckDB
oracle — row count, column names, and order-insensitive value equality
(mirrors CORRECTNESS_r{N}.json comparison)."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


def canon(df_pandas):
    """Sort columns by name, stringify, sort rows — order-insensitive."""
    pdf = df_pandas.reindex(sorted(df_pandas.columns), axis=1)
    rows = [tuple(str(v) for v in row) for row in pdf.itertuples(index=False)]
    return sorted(rows), list(pdf.columns)


ORACLED = sorted(entrymod.oracle_sql())
ALL = sorted(entrymod.queries())


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, duck, sf_dir, name):
    q = entrymod.queries()[name]
    spark_pdf = q(spark, sf_dir).toPandas()
    duck_pdf = duck.execute(entrymod.oracle_sql()[name]).df()
    s_rows, s_cols = canon(spark_pdf)
    d_rows, d_cols = canon(duck_pdf)
    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), f"{name}: rowcount {len(s_rows)} vs {len(d_rows)}"
    mism = [i for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b][:5]
    assert not mism, f"{name}: first mismatches {[(s_rows[i], d_rows[i]) for i in mism]}"


@pytest.mark.parametrize("name", [n for n in ALL if n not in ORACLED])
def test_rows_only_queries_run(spark, sf_dir, name):
    df = entrymod.queries()[name](spark, sf_dir)
    assert df.count() >= 0
    assert df.columns


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert df.columns == ["row_key", "path", "code", "message"]


def test_minhash_lsh_superset_of_exact_jaccard(spark, sf_dir):
    """LSH candidates must cover (recall) the exact high-Jaccard pairs."""
    from sinter_spark.operators import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    exact = {
        (r["id_a"], r["id_b"])
        for r in dedup.jaccard_pairs(docs, k=4, threshold=0.7).collect()
    }
    cand = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_lsh_candidates(docs, k=4, n_hashes=64, bands=16).collect()
    }
    missed = exact - cand
    # banded LSH at (64,16) catches J≥0.7 with prob ≫ 99%
    assert len(missed) <= max(1, len(exact) // 20), f"LSH missed {len(missed)}/{len(exact)}"
