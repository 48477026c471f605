"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship validation pass; ``queries()`` maps
operator names → (spark, sf_dir) → DataFrame; ``oracle_sql()`` gives
the DuckDB-equivalent SQL the driver cross-checks at sf=0.01.
Every computed column is aliased identically on both sides.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sinter_spark import Schema
from sinter_spark.binding import bind
from sinter_spark.operators import dedup, packing, similarity, text
from sinter_spark.operators.drift import histogram
from sinter_spark.operators.referential import referential_violations
from sinter_spark.operators.stats import column_stats
from sinter_spark.operators.uniqueness import duplicate_keys

_EVENT_TYPES = ["click", "view", "purchase", "signup"]
_LI_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_linenumber"]
_LIQ_COLS = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_extendedprice"]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def events_schema() -> Schema:
    """Flagship sinter schema over the events table."""
    return Schema.define(
        [
            ("event_id", "integer"),
            ("event_type", "string", {"choices": _EVENT_TYPES}),
            ("value", "float", {"gt": 0, "lteq": 450}),
            ("user_id", "integer", {"gteq": 1}),
            ("props", "string", {"format": r"^\{.*\}$"}),
        ],
        title="events",
    )


def _validate_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # project to the schema's fields BEFORE the widen (guide §2.3:
    # project before the exchange) — the widen's content-hash key and
    # shuffle otherwise carry the unused ts column (measured at sf1.0:
    # 1.52 s → 1.18 s best)
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "event_type", "value", "user_id", "props"
    )
    from sinter_spark.plans import widen_small_scan

    res = bind(events_schema(), widen_small_scan(ev), row_key="event_id")
    return res.violations.select(
        "row_key",
        F.array_join("path", ".").alias("path"),
        "code",
        "message",
    )


# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full sinter-semantics validation pass over events."""
    return _validate_events(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def q_validate_events(spark, sf):
        return _validate_events(spark, sf)

    def q_stats_lineitem(spark, sf):
        return column_stats(_t(spark, sf, "lineitem"), _LI_COLS, approx=False)

    def q_quantiles_lineitem(spark, sf):
        # p50/p95/p99 riding the same single wide aggregate; accuracy
        # >= n at every test SF makes the GK sketch exact — the element
        # at 1-indexed rank ceil(p*n), which is DuckDB's quantile_disc.
        # Value selection (not arithmetic), so doubles match exactly.
        return column_stats(
            _t(spark, sf, "lineitem"), _LIQ_COLS, approx=False,
            quantiles=(0.5, 0.95, 0.99), quantile_accuracy=1_000_000,
        )

    def q_dup_lineitem_orderkey(spark, sf):
        return duplicate_keys(_t(spark, sf, "lineitem"), "l_orderkey")

    def q_ref_orphan_events_users(spark, sf):
        v = referential_violations(
            _t(spark, sf, "events"), _t(spark, sf, "customer").select(F.col("c_custkey").alias("user_id")),
            "user_id", row_key="event_id",
        )
        return v.select("row_key", F.array_join("path", ".").alias("path"), "code")

    def q_hist_events_value(spark, sf):
        # NOT widened: map-side partial agg collapses 1M rows to 16 bins
        # on the scan task; a widen shuffles the full table for nothing
        # (measured 0.51 s -> 1.21 s with the widen — reverted)
        return histogram(_t(spark, sf, "events"), "value", bins=16, lo=0.0, hi=500.0)

    def q_q1_pricing(spark, sf):
        li = _t(spark, sf, "lineitem")
        return (
            li.where(F.col("l_shipdate") <= "1998-09-02")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
                F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
                F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
                F.round(F.avg("l_discount"), 4).alias("avg_disc"),
                F.count(F.lit(1)).alias("count_order"),
            )
            .orderBy("l_returnflag", "l_linestatus")
        )

    def q_sessions_per_user(spark, sf):
        from pyspark.sql import Window as W

        ev = _t(spark, sf, "events")
        w = W.partitionBy("user_id").orderBy("ts")
        epoch = F.col("ts").cast("timestamp").cast("long")
        gap = epoch - F.lag(epoch).over(w)
        marked = ev.select("user_id", "ts").withColumn(
            "new_s", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
        )
        return marked.groupBy("user_id").agg(F.sum("new_s").alias("n_sessions"))

    def q_hourly_rollup(spark, sf):
        # NOT widened: same partial-agg argument as q_hist_events_value
        # (measured 0.69 s -> 1.65 s with the widen — reverted)
        ev = _t(spark, sf, "events")
        return (
            ev.groupBy(
                F.date_trunc("hour", "ts").alias("hour"),
                "event_type",
            )
            .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        )

    def q_doc_fingerprints(spark, sf):
        d = _t(spark, sf, "documents")
        return d.select("doc_id", text.fingerprint("text").alias("fp"))

    def q_exact_dup_docs(spark, sf):
        d = dedup.exact_dup_groups(_t(spark, sf, "documents"))
        return d.select("fp", "n_docs")

    def q_jaccard_pairs_docs(spark, sf):
        return dedup.jaccard_pairs(_t(spark, sf, "documents"), k=4, threshold=0.5)

    def q_minhash_lsh_docs(spark, sf):
        return dedup.minhash_lsh_candidates(_t(spark, sf, "documents"), k=4, n_hashes=64, bands=16)

    def q_near_dup_components_docs(spark, sf):
        # exact=True: the SQL-expressible oracle path (Jaccard pair
        # graph); the scale path (LSH pair graph) is exercised by the
        # rows-only near_dup_components default in tests.
        return dedup.near_dup_components(_t(spark, sf, "documents"), exact=True, threshold=0.5)

    def q_dedup_canonical_docs(spark, sf):
        return dedup.dedup_canonical(_t(spark, sf, "documents"), exact=True, threshold=0.5).select("doc_id")

    def q_simhash_docs(spark, sf):
        return dedup.simhash_arrow(_t(spark, sf, "documents"))

    def q_winnow_overlap_docs(spark, sf):
        # substring-level dedup (round 4): winnowed fingerprint overlap
        # pairs — fragment sharing, not whole-doc similarity; oracled
        # by the scalar-twin fingerprints + an IN-SQL self-join
        from sinter_spark.operators.winnow import substring_overlap_pairs

        # min_shared=15 selects genuine fragment overlap on this corpus
        # (the n_shared distribution's long tail); lower values admit
        # background phrase-sharing between unrelated synthetic docs.
        # max_bucket=200: ubiquitous-phrase fps aren't discriminative
        # and carry 92% of the Σb² join cost at sf0.1 — dropped WITH
        # audit, and the oracle SQL replicates the same cap
        return substring_overlap_pairs(
            _t(spark, sf, "documents"),
            k=8, window=8, min_shared=15, max_bucket=200, cache=False,
        )

    def q_text_quality_docs(spark, sf):
        return text.quality_features(_t(spark, sf, "documents"))

    def q_repetition_docs(spark, sf):
        # Gopher-style repetition signals — row-local nested HOFs over
        # materialized token/ngram arrays: zero exchanges in the plan
        return text.repetition_features(_t(spark, sf, "documents"))

    def q_decontaminate_docs(spark, sf):
        # benchmark decontamination: eval-set 5-grams deduped on the
        # SMALL side + broadcast; the corpus is exploded once and
        # reduced by one map-side-combined groupBy on the unique doc
        # id. hash_grams (round 6): the join/broadcast move 8-byte
        # xxhash64 token-slice keys instead of gram strings — pinned
        # hashed ≡ string (tests/test_textpipe.py::TestHashedGrams)
        # and oracle-checked against the string-join DuckDB twin.
        from sinter_spark.operators import decontam

        docs = _t(spark, sf, "documents")
        bench = docs.where(F.col("doc_id") % 37 == 0)
        train = docs.where(F.col("doc_id") % 37 != 0)
        return decontam.contamination(train, bench, n=5, hash_grams=True)

    def q_pack_chunks_docs(spark, sf):
        # concat-and-chunk sequence packing: distributed prefix sum
        # (range shuffle + P-row driver collect + zero-shuffle Arrow
        # cumsum), chunk span by integer division — the standard
        # pretraining packing, exactly reproducible in window SQL
        return packing.pack_documents(
            _t(spark, sf, "documents"), chunk_tokens=256, num_partitions=8
        )

    def q_pack_shuffled_docs(spark, sf):
        # same distributed prefix sum, laid out in deterministic
        # hash-shuffle order (the global pre-training shuffle) — the
        # range partitioner keys on the seed-derived multiplier hash
        return packing.pack_documents(
            _t(spark, sf, "documents"),
            chunk_tokens=256,
            num_partitions=8,
            shuffle_seed=11,
        )

    def q_mix_sources_docs(spark, sf):
        # deterministic data mixing: per-source keep-fractions via a
        # pure-arithmetic hash of doc_id (reproducible independent of
        # partitioning/retries — training-data lineage requirement)
        return packing.mix_sources(
            _t(spark, sf, "documents"),
            {"src0": 1.0, "src1": 0.75, "src2": 0.5, "src3": 0.25, "src4": 0.0},
            seed=7,
            default_weight=0.6,
            bucket_col="bucket",
        ).select("doc_id", "source", F.col("bucket").cast("long").alias("bucket"))

    def q_scrub_docs(spark, sf):
        # PII/URL scrubbing audit: the synthetic corpus carries no PII,
        # so the query plants it deterministically (same injection in
        # the oracle) and redacts — pure regexp Columns, zero shuffles
        from sinter_spark.operators import scrub

        d = _t(spark, sf, "documents").select(
            "doc_id", scrub.inject_pii_column().alias("text")
        )
        return scrub.scrub_text(d)

    def q_sample_stratified_docs(spark, sf):
        # exact per-source quotas in deterministic hash order; the
        # row_number<=k window gets map-side WindowGroupLimit pruning
        return packing.sample_stratified(
            _t(spark, sf, "documents"),
            {"src0": 40, "src1": 25, "src2": 10, "src4": 0},
            seed=3,
            default_quota=15,
        )

    def q_langid_docs(spark, sf):
        d = _t(spark, sf, "documents")
        return d.select("doc_id", text.lang_id("text").alias("pred_lang"))

    def q_topk_cosine(spark, sf):
        emb = _t(spark, sf, "embeddings")
        qvec = emb.orderBy("vec_id").select("embedding").first()["embedding"]
        return similarity.cosine_topk(emb, list(qvec), k=10, round_to=5)

    def q_batch_topk_cosine(spark, sf):
        # batched ANN: top-k for a TABLE of queries in ONE corpus scan
        # (broadcast query matrix × Arrow-batch matmul, per-batch
        # pruned candidates, one final per-query top-k)
        emb = _t(spark, sf, "embeddings")
        qs = (
            emb.orderBy("vec_id")
            .limit(5)
            .select(F.col("vec_id").alias("query_id"), "embedding")
        )
        return similarity.cosine_topk_batch(emb, qs, k=10, round_to=5)

    def q_embedding_near_pairs(spark, sf):
        return similarity.cosine_self_pairs(
            _t(spark, sf, "embeddings"), threshold=0.9, round_to=5
        )

    def q_dedup_against_docs(spark, sf):
        # Bloom-prefiltered reference-corpus dedup: result is pinned
        # byte-identical to the plain fingerprint anti-join, so the
        # oracle is the md5 NOT IN — and the driver gate exercises the
        # REAL path (distributed bloom build + probe + confirm join)
        from sinter_spark.operators.bloom import dedup_against

        docs = _t(spark, sf, "documents")
        ref = docs.where(F.col("doc_id") % 11 == 0)
        return dedup_against(docs, ref).select("doc_id")

    def q_semantic_dedup_embeddings(spark, sf):
        # SemDeDup-style keep-one in embedding space; exact=True is the
        # oracle-comparable pair path (same convention as
        # near_dup_components_docs) — the LSH path is pinned by pytest.
        # The synthetic embeddings are near-orthogonal (max natural
        # cosine ~0.51), so exact duplicates are planted
        # deterministically (vec_id%20==0 re-enters as id+10000, the
        # identical vector) and the threshold sits at 0.45 where the
        # table also has 14 natural pairs — clusters of both kinds.
        emb = _t(spark, sf, "embeddings").select("vec_id", "embedding")
        planted = emb.where(F.col("vec_id") % 20 == 0).select(
            (F.col("vec_id") + 10000).alias("vec_id"), F.col("embedding")
        )
        return similarity.semantic_dedup(
            emb.unionByName(planted), threshold=0.45, exact=True
        ).select("vec_id")

    def q_dup_salted(spark, sf):
        # the salted two-phase path on a LOW-cardinality skewed key —
        # must equal the plain GROUP BY the oracle runs
        return duplicate_keys(_t(spark, sf, "lineitem"), "l_returnflag", salt_buckets=16)

    def q_psi_events_value(spark, sf):
        # distribution drift: PSI of `value` histograms, first half of
        # the month vs second half, computed fully in-engine so DuckDB
        # can replicate it (operators/drift.py does the same numpy-side)
        ev = _t(spark, sf, "events")
        half = F.when(F.dayofmonth("ts") <= 15, "a").otherwise("b")
        width = 500.0 / 16
        b = F.least(F.greatest(F.floor(F.col("value") / width), F.lit(0)), F.lit(15)).cast("int")
        hist = (
            ev.where(F.col("value").isNotNull())
            .groupBy(half.alias("half"), b.alias("bin"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        tot = hist.groupBy("half").agg(F.sum("n").alias("tot"))
        probs = hist.join(tot, "half").select(
            "half", "bin", (F.col("n") / F.col("tot")).alias("p")
        )
        a = probs.where("half = 'a'").select("bin", F.col("p").alias("pa"))
        c = probs.where("half = 'b'").select("bin", F.col("p").alias("pb"))
        eps = 1e-9
        joined = a.join(c, "bin", "full").select(
            F.greatest(F.coalesce("pa", F.lit(0.0)), F.lit(eps)).alias("pa"),
            F.greatest(F.coalesce("pb", F.lit(0.0)), F.lit(eps)).alias("pb"),
        )
        return joined.agg(
            F.round(F.sum((F.col("pa") - F.col("pb")) * F.log(F.col("pa") / F.col("pb"))), 6).alias("psi")
        )

    def q_rp_lsh_near_pairs(spark, sf):
        return similarity.rp_lsh_near_pairs(
            _t(spark, sf, "embeddings"), dim=64, threshold=0.9, n_planes=16, bands=4, round_to=5
        )

    def q_ivf_topk_cosine(spark, sf):
        # ORACLED (round 4): content-deterministic centroid training
        # (sample = first IVF_SAMPLE rows by vec_id — kmeans becomes a
        # pure function of table content, so the fixture twin re-derives
        # the same index geometry; lsh_fixtures.ivf_fixture_centroids).
        # The oracle independently re-assigns every vector with per-row
        # scalar math and DuckDB recomputes cosine + top-k; recall-vs-
        # brute-force + partition-pruning gates live in tests/test_ivf.py
        from sinter_spark.lsh_fixtures import (
            IVF_K, IVF_N_CLUSTERS, IVF_N_PROBE, IVF_ROUND, IVF_SAMPLE, IVF_SEED,
        )
        from sinter_spark.operators import ivf

        emb = _t(spark, sf, "embeddings")
        cents = ivf.train_centroids(
            emb, n_clusters=IVF_N_CLUSTERS, sample_size=IVF_SAMPLE,
            sample_order_by="vec_id", seed=IVF_SEED,
        )
        q = list(emb.orderBy("vec_id").select("embedding").first()["embedding"])
        return ivf.ivf_topk(
            emb, cents, q, k=IVF_K, n_probe=IVF_N_PROBE, round_to=IVF_ROUND
        )

    def q_image_decode_features(spark, sf):
        # ORACLED (round 4): decode features over the deterministic
        # media fixture; DuckDB compares against generation-time ground
        # truth (sinter_spark.media_fixtures) — Spark does the
        # distributed decode, the oracle only checks it. Float features
        # are floored to milli-units on BOTH sides for exact hashing.
        import pandas as pd

        from sinter_spark.media_fixtures import image_payload_rows
        from sinter_spark.operators.multimodal import decode_image_features

        rows = [(k, d, f) for (k, d, f, _w, _h) in image_payload_rows()]
        df = spark.createDataFrame(
            pd.DataFrame(rows, columns=["image_id", "bytes", "fmt"]),
            "image_id string, bytes binary, fmt string",
        ).repartition(8)
        feats = decode_image_features(df)
        return feats.select(
            "row_key",
            "ok",
            F.col("dec_w").cast("long").alias("dec_w"),
            F.col("dec_h").cast("long").alias("dec_h"),
            F.floor(F.col("brightness") * 1000).cast("long").alias("bright_milli"),
            F.col("phash64"),
        ).orderBy("row_key")

    def q_audio_features(spark, sf):
        # ORACLED (round 4): REAL WAV decode + spectral features over
        # the deterministic clip fixture; ground truth computed from
        # the quantized PCM WITHOUT the RIFF parser (decoder-
        # independent), compared exactly via floored milli/micro units.
        import pandas as pd

        from sinter_spark.media_fixtures import audio_payload_rows
        from sinter_spark.operators.audio import decode_audio_features

        df = spark.createDataFrame(
            pd.DataFrame(audio_payload_rows(), columns=["audio_id", "bytes", "fmt"]),
            "audio_id string, bytes binary, fmt string",
        )
        feats = decode_audio_features(df)
        return feats.select(
            "row_key",
            "ok",
            F.col("sample_rate").cast("long").alias("sample_rate"),
            F.col("n_samples").cast("long").alias("n_samples"),
            F.floor(F.col("duration_s") * 1000).cast("long").alias("dur_milli"),
            F.col("channels").cast("long").alias("channels"),
            F.floor(F.col("rms") * 1000000.0).cast("long").alias("rms_micro"),
            F.floor(F.col("peak") * 1000000.0).cast("long").alias("peak_micro"),
            F.floor(F.col("zero_crossing_rate") * 1000000.0).cast("long").alias("zcr_micro"),
            F.floor(F.col("spectral_centroid_hz") * 1000).cast("long").alias("centroid_milli"),
        ).orderBy("row_key")

    def q_video_frames(spark, sf):
        # ORACLED (round 4): REAL rawvid frame sampling (indexed O(k)
        # seek); ground truth computed from the SOURCE frames, never
        # touching the decoder (rawvid is lossless), stub rows mirror
        # the kernel's deterministic payload-slice digests.
        import pandas as pd

        from sinter_spark.media_fixtures import VIDEO_SAMPLE_K, video_payload_rows
        from sinter_spark.operators.multimodal import sample_video_frames

        df = spark.createDataFrame(
            pd.DataFrame(video_payload_rows(), columns=["video_id", "bytes", "fmt"]),
            "video_id string, bytes binary, fmt string",
        )
        fr = sample_video_frames(df, n_frames=VIDEO_SAMPLE_K, fmt_col="fmt")
        return fr.select(
            "row_key",
            F.col("frame_idx").cast("long").alias("frame_idx"),
            "ok",
            F.col("frame_w").cast("long").alias("frame_w"),
            F.col("frame_h").cast("long").alias("frame_h"),
            F.floor(F.col("brightness") * 1000).cast("long").alias("bright_milli"),
            F.col("phash64"),
            F.col("frame_digest"),
        ).orderBy("row_key", "frame_idx")

    def q_infer_events_schema(spark, sf):
        # schema inference census (sinter.ex:368-399 semantics over a
        # DataFrame): per-column inferred type + required (null ratio)
        from sinter_spark.api import infer_schema_from_df

        ev = _t(spark, sf, "events")
        inferred = infer_schema_from_df(ev, sample=10**9)  # full census
        rows = [
            (n, str(fd.type), fd.required) for n, fd in inferred.fields.items()
        ]
        return spark.createDataFrame(rows, "field string, type_spec string, required boolean")

    def q_image_suite_violations(spark, sf):
        from sinter_spark.images import fmt_dim, generate_images, validate_images_full

        df = generate_images(spark, 2000, seed=42, max_dim=32, partitions=8)
        res = validate_images_full(df, fmt_dim(spark))
        return res.violations.groupBy("code").agg(F.count(F.lit(1)).alias("n")).orderBy("code")

    def q_image_near_dup(spark, sf):
        # image near-duplicates: decode-once DCT pHash + pair-of-blocks
        # hamming LSH. Pair-of-blocks bucketing GUARANTEES recall at
        # hamming<=6 and the fixture sits far below the mega-bucket cap,
        # so the LSH output equals the full quadratic truth — oracled
        # against a DuckDB all-pairs bit_count(xor) join over the
        # generation-time fingerprint table (media_fixtures.neardup_*).
        from sinter_spark.images import codecs as ic, synth as isyn
        from sinter_spark.media_fixtures import (
            NEARDUP_COPIES, NEARDUP_H, NEARDUP_N, NEARDUP_SEED, NEARDUP_W,
        )
        from sinter_spark.operators.multimodal import image_near_dup_pairs

        ids = [isyn.uuid_for(NEARDUP_SEED, i) for i in range(NEARDUP_N)]
        rows = []
        for x in ids:
            px = isyn.render_reference(x, NEARDUP_W, NEARDUP_H)
            rows.append((x, ic.encode_raw(px), NEARDUP_W, NEARDUP_H, "raw", "c", 0))
        for x in ids[:NEARDUP_COPIES]:
            px = isyn.render_reference(x, NEARDUP_W, NEARDUP_H)
            rows.append(
                (f"{x}-copy", ic.ENCODERS["qjpg"](px), NEARDUP_W, NEARDUP_H, "qjpg", "c", 0)
            )
        df = spark.createDataFrame(rows, isyn.IMAGE_DDL).repartition(8)
        return (
            image_near_dup_pairs(df)
            .select("id_a", "id_b", F.col("hamming").cast("long").alias("hamming"))
            .orderBy("id_a", "id_b")
        )

    return {
        "validate_events": q_validate_events,
        "stats_lineitem": q_stats_lineitem,
        "quantiles_lineitem": q_quantiles_lineitem,
        "dup_lineitem_orderkey": q_dup_lineitem_orderkey,
        "ref_orphan_events_users": q_ref_orphan_events_users,
        "hist_events_value": q_hist_events_value,
        "q1_pricing": q_q1_pricing,
        "sessions_per_user": q_sessions_per_user,
        "hourly_rollup": q_hourly_rollup,
        "doc_fingerprints": q_doc_fingerprints,
        "exact_dup_docs": q_exact_dup_docs,
        "jaccard_pairs_docs": q_jaccard_pairs_docs,
        "near_dup_components_docs": q_near_dup_components_docs,
        "dedup_canonical_docs": q_dedup_canonical_docs,
        "minhash_lsh_docs": q_minhash_lsh_docs,
        "simhash_docs": q_simhash_docs,
        "winnow_overlap_docs": q_winnow_overlap_docs,
        "text_quality_docs": q_text_quality_docs,
        "repetition_docs": q_repetition_docs,
        "decontaminate_docs": q_decontaminate_docs,
        "pack_chunks_docs": q_pack_chunks_docs,
        "pack_shuffled_docs": q_pack_shuffled_docs,
        "mix_sources_docs": q_mix_sources_docs,
        "scrub_docs": q_scrub_docs,
        "sample_stratified_docs": q_sample_stratified_docs,
        "langid_docs": q_langid_docs,
        "topk_cosine": q_topk_cosine,
        "batch_topk_cosine": q_batch_topk_cosine,
        "embedding_near_pairs": q_embedding_near_pairs,
        "dedup_against_docs": q_dedup_against_docs,
        "semantic_dedup_embeddings": q_semantic_dedup_embeddings,
        "dup_salted": q_dup_salted,
        "psi_events_value": q_psi_events_value,
        "rp_lsh_near_pairs": q_rp_lsh_near_pairs,
        "ivf_topk_cosine": q_ivf_topk_cosine,
        "image_decode_features": q_image_decode_features,
        "audio_features": q_audio_features,
        "video_frames": q_video_frames,
        "image_suite_violations": q_image_suite_violations,
        "image_near_dup": q_image_near_dup,
        "infer_events_schema": q_infer_events_schema,
    }


def oracle_sql() -> dict[str, str]:
    choices_msg = "must be one of: ['click', 'view', 'purchase', 'signup']".replace("'", "''")
    stats_parts = "\nUNION ALL\n".join(
        f"""SELECT '{c}' AS column, COUNT(*) AS n_rows,
              CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
              CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS DOUBLE)/COUNT(*) AS null_rate,
              CAST(MIN({c}) AS DOUBLE) AS min_value,
              CAST(MAX({c}) AS DOUBLE) AS max_value,
              COUNT(DISTINCT {c}) AS n_distinct
         FROM lineitem"""
        for c in _LI_COLS
    )
    # quantiles: selection, not arithmetic — DuckDB's quantile_disc is
    # the same element Spark's exact-accuracy GK sketch returns (the
    # 1-indexed rank ceil(p*n) of the sorted non-null values), so the
    # comparison is tolerance-free even for double columns
    quantile_parts = "\nUNION ALL\n".join(
        f"""SELECT '{c}' AS column, COUNT(*) AS n_rows,
              CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
              CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS DOUBLE)/COUNT(*) AS null_rate,
              CAST(MIN({c}) AS DOUBLE) AS min_value,
              CAST(MAX({c}) AS DOUBLE) AS max_value,
              COUNT(DISTINCT {c}) AS n_distinct,
              CAST(quantile_disc({c}, 0.5) AS DOUBLE) AS q_50,
              CAST(quantile_disc({c}, 0.95) AS DOUBLE) AS q_95,
              CAST(quantile_disc({c}, 0.99) AS DOUBLE) AS q_99
         FROM lineitem"""
        for c in _LIQ_COLS
    )
    # media ground-truth oracles (round 4): literal VALUES tables of
    # generation-time expectations — DuckDB compares, Spark decodes
    from sinter_spark.media_fixtures import (
        audio_oracle_sql,
        image_oracle_sql,
        neardup_oracle_sql,
        suite_violations_oracle_sql,
        video_oracle_sql,
    )

    media_oracles = {
        "image_decode_features": image_oracle_sql(),
        "audio_features": audio_oracle_sql(),
        "video_frames": video_oracle_sql(),
        # round 4: LSH pair pipeline vs all-pairs hamming truth, and the
        # full-suite violation census vs a single-process re-derivation
        # of every check from the pure (seed, i) generator
        "image_near_dup": neardup_oracle_sql(),
        "image_suite_violations": suite_violations_oracle_sql(),
    }
    # seeded-hash LSH oracles (round 4): signatures re-derived by the
    # straight-line scalar twin in sinter_spark.lsh_fixtures (reads the
    # same parquet: $SINTER_ORACLE_SF_DIR, default the driver's sf0.01);
    # the pair derivation itself (band/block self-join, exact-cosine
    # verify) runs IN SQL
    from sinter_spark.lsh_fixtures import (
        ivf_oracle_sql,
        minhash_oracle_sql,
        rp_lsh_oracle_sql,
        simhash_oracle_sql,
        winnow_oracle_sql,
    )

    from sinter_spark.operators.decontam import decontamination_oracle_sql as _decontam_oracle
    from sinter_spark.operators.packing import sample_stratified_sql as _stratified_oracle
    from sinter_spark.operators.packing import shuffle_order_hash_sql

    def _pack_shuffled_oracle() -> str:
        ord_sql = shuffle_order_hash_sql("doc_id", seed=11)
        return rf"""
            WITH t AS (
              SELECT doc_id,
                     CAST(len(regexp_extract_all(coalesce(text, ''),
                          '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_tokens
                FROM documents
               WHERE doc_id IS NOT NULL),
            o AS (
              SELECT doc_id, n_tokens,
                     CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY {ord_sql}, doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                          AS BIGINT) AS start_offset
                FROM t)
            SELECT doc_id, n_tokens, start_offset,
                   start_offset // 256 AS chunk_first,
                   (start_offset + greatest(n_tokens, 1) - 1) // 256 AS chunk_last
              FROM o
        """
    from sinter_spark.operators.scrub import scrub_oracle_sql as _scrub_oracle
    from sinter_spark.operators.text import repetition_oracle_sql as _repetition_oracle

    lsh_oracles = {
        "minhash_lsh_docs": minhash_oracle_sql(),
        "simhash_docs": simhash_oracle_sql(),
        "rp_lsh_near_pairs": rp_lsh_oracle_sql(),
        "winnow_overlap_docs": winnow_oracle_sql(),
        "ivf_topk_cosine": ivf_oracle_sql(),
    }
    return media_oracles | lsh_oracles | {
        "validate_events": f"""
            SELECT CAST(event_id AS VARCHAR) AS row_key, 'event_type' AS path,
                   'choices' AS code, '{choices_msg}' AS message
              FROM events
             WHERE event_type IS NOT NULL
               AND event_type NOT IN ('click','view','purchase','signup')
            UNION ALL
            SELECT CAST(event_id AS VARCHAR), 'value', 'gt', 'must be greater than 0'
              FROM events WHERE value IS NOT NULL AND NOT value > 0
            UNION ALL
            SELECT CAST(event_id AS VARCHAR), 'value', 'lteq', 'must be less than or equal to 450'
              FROM events WHERE value IS NOT NULL AND NOT value <= 450
            UNION ALL
            SELECT CAST(event_id AS VARCHAR), 'user_id', 'gteq', 'must be greater than or equal to 1'
              FROM events WHERE user_id IS NOT NULL AND NOT user_id >= 1
            UNION ALL
            SELECT CAST(event_id AS VARCHAR), 'props', 'format', 'does not match required format'
              FROM events WHERE props IS NOT NULL AND NOT regexp_matches(props, '^\\{{.*\\}}$')
            UNION ALL
            SELECT CAST(event_id AS VARCHAR), c.col, 'required', 'field is required'
              FROM events, (SELECT UNNEST(['event_id','event_type','value','user_id','props']) AS col) c
             WHERE CASE c.col WHEN 'event_id' THEN event_id IS NULL
                              WHEN 'event_type' THEN event_type IS NULL
                              WHEN 'value' THEN value IS NULL
                              WHEN 'user_id' THEN user_id IS NULL
                              ELSE props IS NULL END
        """,
        "stats_lineitem": stats_parts,
        "quantiles_lineitem": quantile_parts,
        "dup_lineitem_orderkey": """
            SELECT l_orderkey, COUNT(*) AS cnt FROM lineitem
            GROUP BY l_orderkey HAVING COUNT(*) > 1
        """,
        "ref_orphan_events_users": """
            SELECT CAST(event_id AS VARCHAR) AS row_key, 'user_id' AS path,
                   'referential' AS code
              FROM events
             WHERE user_id IS NOT NULL
               AND user_id NOT IN (SELECT c_custkey FROM customer WHERE c_custkey IS NOT NULL)
        """,
        "hist_events_value": """
            SELECT 'value' AS column,
                   CAST(LEAST(GREATEST(FLOOR(value / 31.25), 0), 15) AS INT) AS bin,
                   COUNT(*) AS count
              FROM events WHERE value IS NOT NULL
             GROUP BY 2
        """,
        "q1_pricing": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 2) AS sum_qty,
                   ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   ROUND(AVG(l_quantity), 4) AS avg_qty,
                   ROUND(AVG(l_discount), 4) AS avg_disc,
                   COUNT(*) AS count_order
              FROM lineitem
             WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
             GROUP BY l_returnflag, l_linestatus
             ORDER BY l_returnflag, l_linestatus
        """,
        "sessions_per_user": """
            WITH marked AS (
              SELECT user_id,
                     CASE WHEN EXTRACT(EPOCH FROM ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 1800
                          OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                          THEN 1 ELSE 0 END AS new_s
                FROM events)
            SELECT user_id, CAST(SUM(new_s) AS BIGINT) AS n_sessions FROM marked GROUP BY user_id
        """,
        "hourly_rollup": """
            SELECT date_trunc('hour', ts) AS hour, event_type,
                   COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value
              FROM events GROUP BY 1, 2
        """,
        "doc_fingerprints": r"""
            SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
              FROM documents
        """,
        "exact_dup_docs": r"""
            SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
                   COUNT(*) AS n_docs
              FROM documents GROUP BY 1 HAVING COUNT(*) > 1
        """,
        "jaccard_pairs_docs": """
            WITH idx AS (
              SELECT doc_id, text,
                     CAST(unnest(generate_series(1, GREATEST(length(text) - 3, 0))) AS INT) AS i
                FROM documents),
            sh AS (SELECT DISTINCT doc_id, substr(text, i, 4) AS shingle FROM idx),
            sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
            shared AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
                FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
               GROUP BY 1, 2)
            SELECT id_a, id_b,
                   ROUND(CAST(shared AS DOUBLE)/(sa.n_sh + sb.n_sh - shared), 6) AS jaccard
              FROM shared
              JOIN sizes sa ON sa.doc_id = id_a
              JOIN sizes sb ON sb.doc_id = id_b
             WHERE CAST(shared AS DOUBLE)/(sa.n_sh + sb.n_sh - shared) >= 0.5
        """,
        "near_dup_components_docs": """
            WITH RECURSIVE idx AS (
              SELECT doc_id, text,
                     CAST(unnest(generate_series(1, GREATEST(length(text) - 3, 0))) AS INT) AS i
                FROM documents),
            sh AS (SELECT DISTINCT doc_id, substr(text, i, 4) AS shingle FROM idx),
            sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
            shared AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
                FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
               GROUP BY 1, 2),
            pairs AS (
              SELECT id_a, id_b FROM shared
                JOIN sizes sa ON sa.doc_id = id_a
                JOIN sizes sb ON sb.doc_id = id_b
               WHERE CAST(shared AS DOUBLE)/(sa.n_sh + sb.n_sh - shared) >= 0.5),
            edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                      UNION SELECT id_b, id_a FROM pairs),
            reach(node, r) AS (
              SELECT src, src FROM edges
              UNION
              SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.node)
            SELECT node, MIN(r) AS component FROM reach GROUP BY node
        """,
        "dedup_canonical_docs": """
            WITH RECURSIVE idx AS (
              SELECT doc_id, text,
                     CAST(unnest(generate_series(1, GREATEST(length(text) - 3, 0))) AS INT) AS i
                FROM documents),
            sh AS (SELECT DISTINCT doc_id, substr(text, i, 4) AS shingle FROM idx),
            sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
            shared AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
                FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
               GROUP BY 1, 2),
            pairs AS (
              SELECT id_a, id_b FROM shared
                JOIN sizes sa ON sa.doc_id = id_a
                JOIN sizes sb ON sb.doc_id = id_b
               WHERE CAST(shared AS DOUBLE)/(sa.n_sh + sb.n_sh - shared) >= 0.5),
            edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                      UNION SELECT id_b, id_a FROM pairs),
            reach(node, r) AS (
              SELECT src, src FROM edges
              UNION
              SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.node),
            cc AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node)
            SELECT d.doc_id FROM documents d
             WHERE d.doc_id NOT IN (SELECT node FROM cc WHERE node <> component)
        """,
        "pack_chunks_docs": r"""
            WITH t AS (
              SELECT doc_id,
                     CAST(len(regexp_extract_all(coalesce(text, ''),
                          '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_tokens
                FROM documents
               WHERE doc_id IS NOT NULL),
            o AS (
              SELECT doc_id, n_tokens,
                     CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                          AS BIGINT) AS start_offset
                FROM t)
            SELECT doc_id, n_tokens, start_offset,
                   start_offset // 256 AS chunk_first,
                   (start_offset + greatest(n_tokens, 1) - 1) // 256 AS chunk_last
              FROM o
        """,
        "pack_shuffled_docs": _pack_shuffled_oracle(),
        "mix_sources_docs": f"""
            WITH b AS (
              SELECT doc_id, source,
                     {packing.deterministic_bucket_sql('doc_id', seed=7)} AS bucket
                FROM documents)
            SELECT doc_id, source, bucket FROM b
             WHERE bucket < CASE source
                              WHEN 'src0' THEN 10000
                              WHEN 'src1' THEN 7500
                              WHEN 'src2' THEN 5000
                              WHEN 'src3' THEN 2500
                              WHEN 'src4' THEN 0
                              ELSE 6000 END
        """,
        "text_quality_docs": r"""
            WITH feat AS (
              SELECT doc_id,
                     length(coalesce(text, '')) AS n_chars_obs,
                     CASE WHEN length(trim(coalesce(text, ''))) = 0 THEN 0
                          ELSE len(regexp_split_to_array(trim(coalesce(text, '')), '\s+')) END AS n_tokens,
                     len(regexp_extract_all(coalesce(text, ''), '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe_tokens,
                     CASE WHEN length(coalesce(text, '')) > 0
                          THEN CAST(length(regexp_replace(coalesce(text, ''), '[^.,;:!?''"()\[\]-]', '', 'g')) AS DOUBLE)/length(coalesce(text, ''))
                          ELSE 0.0 END AS pr,
                     CASE WHEN len(regexp_split_to_array(trim(lower(coalesce(text, ''))), '\s+')) > 0
                          THEN CAST(len(list_filter(regexp_split_to_array(trim(lower(coalesce(text, ''))), '\s+'),
                                    w -> w IN ('the','a','of','and','to','in','is','it'))) AS DOUBLE)
                               / len(regexp_split_to_array(trim(lower(coalesce(text, ''))), '\s+'))
                          ELSE 0.0 END AS sr
                FROM documents)
            SELECT doc_id, n_chars_obs, n_tokens, n_bpe_tokens,
                   ROUND(pr, 6) AS punct_ratio,
                   ROUND(sr, 6) AS stopword_ratio,
                   ROUND(CASE WHEN n_chars_obs = 0 THEN 0.0 ELSE
                     LEAST(n_chars_obs / 200.0, 1.0) * 0.4
                     + CASE WHEN n_tokens > 0
                            AND CAST(n_chars_obs AS DOUBLE)/n_tokens >= 3
                            AND CAST(n_chars_obs AS DOUBLE)/n_tokens <= 10
                            THEN 1.0 ELSE 0.0 END * 0.4
                     + (1.0 - LEAST(pr * 5, 1.0)) * 0.2 END, 6) AS quality
              FROM feat
        """,
        "repetition_docs": _repetition_oracle(),
        "decontaminate_docs": _decontam_oracle(),
        "scrub_docs": _scrub_oracle(),
        "sample_stratified_docs": _stratified_oracle(
            {"src0": 40, "src1": 25, "src2": 10, "src4": 0},
            seed=3,
            default_quota=15,
        ),
        "langid_docs": """
            SELECT doc_id,
                   CASE WHEN regexp_matches(text, '[一-鿿぀-ヿ]') THEN 'zh'
                        WHEN regexp_matches(' ' || lower(text) || ' ', ' (der|die|das|und|nicht) ') THEN 'de'
                        WHEN regexp_matches(' ' || lower(text) || ' ', ' (le|la|les|et|est) ') THEN 'fr'
                        WHEN regexp_matches(' ' || lower(text) || ' ', ' (el|los|las|es|y) ') THEN 'es'
                        ELSE 'en' END AS pred_lang
              FROM documents
        """,
        "topk_cosine": """
            WITH q AS (SELECT embedding FROM embeddings
                        WHERE vec_id = (SELECT MIN(vec_id) FROM embeddings))
            SELECT vec_id,
                   ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                         (SELECT CAST(embedding AS DOUBLE[]) FROM q)), 5) AS cos_sim
              FROM embeddings
             ORDER BY cos_sim DESC, vec_id
             LIMIT 10
        """,
        "batch_topk_cosine": """
            WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
                         FROM embeddings ORDER BY vec_id LIMIT 5),
                 s AS (SELECT q.query_id, e.vec_id,
                              ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                                           q.qv), 5) AS cos_sim
                         FROM embeddings e CROSS JOIN q),
                 r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cos_sim DESC, vec_id) AS rn FROM s)
            SELECT query_id, vec_id, cos_sim FROM r WHERE rn <= 10
        """,
        "embedding_near_pairs": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                                CAST(b.embedding AS DOUBLE[])), 5) AS cos_sim
              FROM embeddings a, embeddings b
             WHERE a.vec_id < b.vec_id
               AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                          CAST(b.embedding AS DOUBLE[])) >= 0.9
        """,
        "dedup_against_docs": r"""
            WITH ref AS (
              SELECT DISTINCT
                     md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
                FROM documents
               WHERE doc_id % 11 = 0 AND text IS NOT NULL)
            SELECT d.doc_id FROM documents d
             WHERE d.text IS NULL
                OR md5(regexp_replace(lower(trim(d.text)), '\s+', ' ', 'g'))
                   NOT IN (SELECT fp FROM ref)
        """,
        "semantic_dedup_embeddings": """
            WITH RECURSIVE corpus AS (
              SELECT vec_id, embedding FROM embeddings
              UNION ALL
              SELECT vec_id + 10000 AS vec_id, embedding
                FROM embeddings WHERE vec_id % 20 = 0),
            pairs AS (
              SELECT a.vec_id AS id_a, b.vec_id AS id_b
                FROM corpus a, corpus b
               WHERE a.vec_id < b.vec_id
                 AND ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                                  CAST(b.embedding AS DOUBLE[])), 6)
                     >= 0.45),
            edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                      UNION SELECT id_b, id_a FROM pairs),
            reach(node, r) AS (
              SELECT src, src FROM edges
              UNION
              SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.node),
            cc AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node)
            SELECT v.vec_id FROM corpus v
             WHERE v.vec_id NOT IN (SELECT node FROM cc WHERE node <> component)
        """,
        "dup_salted": """
            SELECT l_returnflag, COUNT(*) AS cnt FROM lineitem
            GROUP BY l_returnflag HAVING COUNT(*) > 1
        """,
        "psi_events_value": """
            WITH hist AS (
              SELECT CASE WHEN date_part('day', ts) <= 15 THEN 'a' ELSE 'b' END AS half,
                     CAST(LEAST(GREATEST(FLOOR(value / 31.25), 0), 15) AS INT) AS bin,
                     COUNT(*) AS n
                FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
            tot AS (SELECT half, CAST(SUM(n) AS DOUBLE) AS tot FROM hist GROUP BY 1),
            probs AS (SELECT h.half, h.bin, h.n / t.tot AS p
                        FROM hist h JOIN tot t ON h.half = t.half),
            j AS (SELECT GREATEST(COALESCE(a.p, 0), 1e-9) AS pa,
                         GREATEST(COALESCE(b.p, 0), 1e-9) AS pb
                    FROM (SELECT bin, p FROM probs WHERE half = 'a') a
                    FULL JOIN (SELECT bin, p FROM probs WHERE half = 'b') b USING (bin))
            SELECT ROUND(SUM((pa - pb) * LN(pa / pb)), 6) AS psi FROM j
        """,
        "infer_events_schema": """
            SELECT c.field,
                   c.type_spec,
                   CAST((SELECT CASE c.field
                           WHEN 'event_id' THEN COUNT(event_id)
                           WHEN 'ts' THEN COUNT(ts)
                           WHEN 'user_id' THEN COUNT(user_id)
                           WHEN 'event_type' THEN COUNT(event_type)
                           WHEN 'value' THEN COUNT(value)
                           ELSE COUNT(props) END
                    FROM events) >= 0.8 * (SELECT COUNT(*) FROM events) AS BOOLEAN) AS required
              FROM (VALUES ('event_id','integer'), ('ts','datetime'),
                           ('user_id','integer'), ('event_type','string'),
                           ('value','float'), ('props','string')) AS c(field, type_spec)
        """,
    }
