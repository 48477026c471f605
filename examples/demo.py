"""End-to-end demo: define → bind → validate → table checks → resume.

Run: python examples/demo.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sinter_spark.session import get_spark

spark = get_spark(cores=4, shuffle_partitions=8)

import sinter_spark as ss
from sinter_spark.images import fmt_dim, generate_images, validate_images_full

# 1. runtime schema, sinter-style
schema = ss.Schema.define(
    [
        ("image_id", "uuid"),
        ("w", "integer", {"gt": 0, "lteq": 16384}),
        ("h", "integer", {"gt": 0, "lteq": 16384}),
        ("fmt", "string", {"choices": ["raw", "png", "qjpg"]}),
        ("caption", "string", {"min_length": 1, "max_length": 512}),
    ],
    title="images",
)

# 2. synthesize a deterministic image+caption table and bind
df = generate_images(spark, 20_000, seed=42, max_dim=48).cache()
res = ss.bind(schema, df, row_key="image_id")
print("== violations by code ==")
res.counts_by_code().show()
print("== per-partition verdicts ==")
res.verdicts.show(4, truncate=False)

# 3. the full suite: + decode/PSNR/caption kernel, uniqueness,
#    referential, drift
suite = validate_images_full(df, fmt_dim(spark))
print("== full-suite violations ==")
suite.violations.groupBy("code").count().orderBy("code").show()

# 4. checkpointed, resumable run
from sinter_spark.checkpoint import CheckpointStore, read_violations, run_checkpointed

with tempfile.TemporaryDirectory() as d:
    store = CheckpointStore(spark, f"{d}/ckpt")
    run_id = run_checkpointed(
        df,
        lambda sub: ss.bind(schema, sub, row_key="image_id").violations,
        store,
        n_buckets=8,
        buckets_per_job=4,
    )
    print("checkpointed violations:", read_violations(store, run_id).count())
    store.metrics(run_id).orderBy("bucket").show()

spark.stop()
