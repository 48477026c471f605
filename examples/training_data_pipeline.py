"""End-to-end training-data curation demo over the testdata tables —
the round-5 operator chain, stage by stage, with printed audits:

    quality features → PII/URL scrub → repetition filter →
    benchmark decontamination → reference-corpus dedup (Bloom) →
    semantic dedup (embeddings) → source mixing → exact quotas →
    sequence packing in deterministic shuffle order

Run: python examples/training_data_pipeline.py
(the same chain runs as one job via
 `python -m sinter_spark pipeline --help`)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sinter_spark.session import get_spark

spark = get_spark(cores=4, shuffle_partitions=8)

from sinter_spark.operators import decontam, packing, scrub, similarity, text
from sinter_spark.operators.bloom import build_bloom, dedup_against

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
docs = spark.read.parquet(f"{SF}/documents.parquet")
emb = spark.read.parquet(f"{SF}/embeddings.parquet").select("vec_id", "embedding")
print(f"corpus: {docs.count()} docs")

# 1. quality + repetition signals (both zero-shuffle Column passes)
q = text.quality_features(docs)
rep = text.repetition_features(docs)
keep_ids = (
    q.where(F.col("quality") >= 0.2)
    .select("doc_id")
    .join(rep.where(F.col("dup_trigram_frac") <= 0.2).select("doc_id"), "doc_id")
)
docs = docs.join(keep_ids, "doc_id", "left_semi")
print(f"after quality/repetition filter: {docs.count()}")

# 2. PII/URL scrub (the synthetic corpus has none — audit shows 0s)
scrubbed = scrub.scrub_text(docs)
audit = scrubbed.agg(
    F.sum("n_url").alias("urls"),
    F.sum("n_email").alias("emails"),
    F.sum("n_ipv4").alias("ips"),
).first()
print(f"scrub audit: {audit.urls} urls, {audit.emails} emails, {audit.ips} ips")
docs = docs.drop("text").join(
    scrubbed.select("doc_id", F.col("scrubbed").alias("text")), "doc_id"
)

# 3. benchmark decontamination (eval set = a deterministic slice here)
bench = docs.where(F.col("doc_id") % 37 == 0)
train = docs.where(F.col("doc_id") % 37 != 0)
docs = decontam.decontaminate(train, bench, n=8)
print(f"after decontamination vs {bench.count()}-doc benchmark: {docs.count()}")

# 4. reference-corpus dedup with a persisted-able Bloom prefilter
reference = docs.where(F.col("doc_id") % 11 == 0)
flt = build_bloom(reference, expected_n=50, fpr=0.01)
docs = dedup_against(docs, reference, bloom=flt)
print(f"after reference dedup (bloom m={flt.m} bits, k={flt.k}): {docs.count()}")

# 5. semantic keep-one dedup over the embedding table (LSH path)
kept_vecs = similarity.semantic_dedup(emb, threshold=0.45, dim=64, bands=8)
print(f"semantic dedup keeps {kept_vecs.count()} / {emb.count()} embeddings")

# 6. deterministic mixing + exact quotas
docs = packing.mix_sources(docs, {"src0": 1.0, "src4": 0.0}, default_weight=0.7, seed=3)
docs = packing.sample_stratified(docs, {"src0": 60}, default_quota=40, seed=3)
print(f"after mixing + quotas: {docs.count()}")

# 7. sequence packing in deterministic hash-shuffle order
packed = packing.pack_documents(docs, chunk_tokens=256, shuffle_seed=7)
stats = packed.agg(
    F.sum("n_tokens").alias("tokens"), (F.max("chunk_last") + 1).alias("chunks")
).first()
print(f"packed: {stats.tokens} tokens into {stats.chunks} chunks of 256")

spark.stop()
print("ok")
