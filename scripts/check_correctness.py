#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate: run each
``__spark_entry__.queries()`` entry on Spark and its ``oracle_sql()``
twin in DuckDB over the same parquet tables, then compare row count,
schema (column names, sorted), and a value hash (columns sorted by
name, rows sorted, floats rounded to 9 significant digits).

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
Defaults: sf_dir=/root/testdata/sf0.01, all queries.
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _norm_cell(v):
    if v is None:
        return "\0"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(bool(v)).lower()
    return str(v)


def _hash_rows(cols, rows) -> str:
    import hashlib

    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(_norm_cell(r[i]) for i in order) for r in rows)
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def main() -> int:
    import duckdb

    import __spark_entry__ as entry
    from sinter_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # lsh_fixtures oracle builders follow the checked sf
    os.environ["SINTER_ORACLE_SF_DIR"] = sf_dir

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = entry.queries(), entry.oracle_sql()
    out, bad = {}, []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        rec = {"rows_match": None, "schema_match": None, "hash_match": None, "err": None}
        try:
            sdf = fn(spark, sf_dir)
            s_cols = list(sdf.columns)
            s_rows = [tuple(r) for r in sdf.collect()]
            rec["spark_rows"] = len(s_rows)
            sql = oracles.get(name)
            if sql is None:
                rec["err"] = "no_oracle"
            else:
                cur = con.execute(sql)
                o_cols = [d[0] for d in cur.description]
                o_rows = cur.fetchall()
                rec["oracle_rows"] = len(o_rows)
                rec["rows_match"] = len(s_rows) == len(o_rows)
                rec["schema_match"] = sorted(s_cols) == sorted(o_cols)
                rec["hash_match"] = (
                    rec["schema_match"]
                    and _hash_rows(s_cols, s_rows) == _hash_rows(o_cols, o_rows)
                )
                if not (rec["rows_match"] and rec["schema_match"] and rec["hash_match"]):
                    bad.append(name)
        except Exception as e:  # noqa: BLE001 — report, keep checking
            rec["err"] = f"{type(e).__name__}: {e}"
            bad.append(name)
        out[name] = rec
        status = "OK" if name not in bad else "FAIL"
        if rec["err"] == "no_oracle":
            status = "rows-only"
        print(f"{name:28s} {status:9s} {json.dumps(rec, default=str)[:160]}")
    print(f"\n{len(out)} queries, {len(bad)} failing: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
