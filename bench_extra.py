"""Round-6 optimization harness (guide §1.4): per-stage isolation of
the expensive headline queries with the noop sink, plus plan capture.

NOT the official bench — bench.py is frozen for measurement. This file
exists so OPTIMIZATION_r06.md numbers are reproducible.

Usage:
    python bench_extra.py [sf_dir] [what ...]
    what ∈ {plans, minhash, winnow, decontam, validate, all}
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timeit(spark, label, fn, trials=2):
    best = float("inf")
    out = None
    for _ in range(trials):
        spark.sparkContext.setJobDescription(label)
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(None)
    print(f"  {label:55s} {best:7.3f}s  {out if out is not None else ''}", flush=True)
    return best


def capture_plan(qs, name, spark, sf_dir, suffix):
    os.makedirs("plans/r06", exist_ok=True)
    df = qs[name](spark, sf_dir)
    p = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    path = f"plans/r06/{name}_{suffix}.txt"
    with open(path, "w") as f:
        f.write(p)
    print(f"wrote {path} ({p.count('Exchange')} Exchange)", flush=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
    what = set(sys.argv[2:]) or {"all"}
    suffix = os.environ.get("PLAN_SUFFIX", "before")

    from sinter_spark.session import get_spark

    spark = get_spark(cores=os.environ.get("SPARK_GRAFT_CPUS", "32"),
                      app_name="bench_extra",
                      extra_conf={"spark.sql.adaptive.enabled": "false"})
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    spark.range(1000).selectExpr("sum(id)").collect()

    if what & {"plans", "all"}:
        for name in ["minhash_lsh_docs", "winnow_overlap_docs",
                     "decontaminate_docs", "validate_events",
                     "dup_lineitem_orderkey", "simhash_docs",
                     "ivf_topk_cosine", "batch_topk_cosine",
                     "hourly_rollup", "sessions_per_user"]:
            capture_plan(qs, name, spark, sf_dir, suffix)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    if what & {"minhash", "all"}:
        print("== minhash_lsh_docs decomposition ==", flush=True)
        from sinter_spark.operators import dedup

        timeit(spark, "minhash: signatures only (noop)",
               lambda: noop(dedup.minhash_signatures_arrow(docs)))
        timeit(spark, "minhash: buckets only (noop)",
               lambda: noop(dedup.minhash_buckets(docs)))
        timeit(spark, "minhash: full candidates count",
               lambda: qs["minhash_lsh_docs"](spark, sf_dir).count(), trials=1)
        spark.catalog.clearCache()
        timeit(spark, "minhash: full candidates count (cache cleared)",
               lambda: qs["minhash_lsh_docs"](spark, sf_dir).count(), trials=1)
        spark.catalog.clearCache()

    if what & {"winnow", "all"}:
        print("== winnow_overlap_docs decomposition ==", flush=True)
        from sinter_spark.operators.winnow import winnow_fingerprints

        timeit(spark, "winnow: fingerprints only (noop)",
               lambda: noop(winnow_fingerprints(docs, k=8, window=8)))
        timeit(spark, "winnow: fp distinct count",
               lambda: winnow_fingerprints(docs, k=8, window=8)
               .select("doc_id", "fp").distinct().count())
        timeit(spark, "winnow: full pairs count",
               lambda: qs["winnow_overlap_docs"](spark, sf_dir).count(), trials=1)
        spark.catalog.clearCache()

    if what & {"decontam", "all"}:
        print("== decontaminate_docs decomposition ==", flush=True)
        from sinter_spark.operators import decontam

        bench = docs.where(F.col("doc_id") % 37 == 0)
        train = docs.where(F.col("doc_id") % 37 != 0)
        bg = (bench.select(decontam._tokenize("text").alias("_t"))
              .select(F.explode(decontam.ngrams(F.col("_t"), 5)).alias("g"))
              .distinct())
        timeit(spark, "decontam: bench grams distinct count", lambda: bg.count())
        tg = (train.select("doc_id", decontam._tokenize("text").alias("_t"))
              .select("doc_id", F.array_distinct(decontam.ngrams(F.col("_t"), 5)).alias("_g")))
        timeit(spark, "decontam: train gram arrays (noop)", lambda: noop(tg))
        timeit(spark, "decontam: full count",
               lambda: qs["decontaminate_docs"](spark, sf_dir).count())

    if what & {"validate", "all"}:
        print("== validate_events decomposition ==", flush=True)
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        timeit(spark, "events: raw scan (noop)", lambda: noop(ev))
        timeit(spark, "events: scan partitions",
               lambda: ev.rdd.getNumPartitions(), trials=1)
        from sinter_spark.binding import bind
        res = bind(entrymod.events_schema(), ev, row_key="event_id")
        timeit(spark, "validate: flagged (noop)", lambda: noop(res.flagged))
        timeit(spark, "validate: violations count",
               lambda: qs["validate_events"](spark, sf_dir).count())

    spark.stop()


if __name__ == "__main__":
    main()
