"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

The scale story (100 TB):
* **exact** — fingerprint groupBy (hash shuffle on a high-cardinality
  key; AQE-balanced).
* **n-gram Jaccard** — the *exact* similarity baseline: shingle
  explode + self-join. Quadratic in cluster size per shared shingle —
  correct as an oracle, not the scale path.
* **MinHash + banded LSH** — the scale path: per-doc signature in one
  groupBy (64 JVM-side min aggregates over xxhash64 — no Python),
  banding → bucket join so only candidate pairs meet. Tune
  (n_hashes, bands) for the target Jaccard threshold.
* **SimHash** — 64-bit near-dup fingerprint in one groupBy with
  bit-bucket aggregates; hamming buckets join on rotated prefixes.

Everything is built-in-function Spark; no UDF in any hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .uniqueness import duplicate_keys  # noqa: F401  (re-export: exact dedup)
from .text import fingerprint


def exact_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicates after whitespace/case normalization:
    (fingerprint, n_docs, doc_ids)."""
    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sort_array(F.collect_list(id_col)).alias("doc_ids"))
        .where(F.col("n_docs") > 1)
    )


def char_shingles(df: DataFrame, id_col: str, text_col: str, k: int = 4) -> DataFrame:
    """Distinct char k-gram shingles per doc: (id, shingle)."""
    c = F.col(text_col)
    idx = F.sequence(F.lit(1), F.greatest(F.length(c) - (k - 1), F.lit(0)))
    sh = F.transform(idx, lambda i: F.substring(c, i, k))
    return df.select(F.col(id_col), F.explode(F.array_distinct(sh)).alias("shingle"))


def jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard similar pairs (a < b): shingle self-join.

    O(pairs-sharing-a-shingle) — the correctness oracle for LSH; use
    minhash_lsh_candidates at scale."""
    s = char_shingles(df, id_col, text_col, k)
    sizes = s.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = s.alias("a")
    b = s.alias("b")
    shared = (
        a.join(b, F.col(f"a.shingle") == F.col(f"b.shingle"))
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("shared") / (F.col("n_a") + F.col("n_b") - F.col("shared")), 6
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k: int = 4,
    n_hashes: int = 64,
) -> DataFrame:
    """(id, sig array<bigint>): n_hashes min-hash values per doc, each
    the min of xxhash64(seed_i, shingle) — one shuffle, all JVM-side."""
    s = char_shingles(df, id_col, text_col, k)
    mins = [
        F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"h{i}")
        for i in range(n_hashes)
    ]
    agg = s.groupBy(id_col).agg(*mins)
    return agg.select(F.col(id_col), F.array(*[F.col(f"h{i}") for i in range(n_hashes)]).alias("sig"))


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k: int = 4,
    n_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Candidate near-dup pairs (a < b) via banded LSH over MinHash:
    docs agreeing on ALL rows of ≥1 band meet in a bucket join.
    bands=16 × rows=4 ⇒ ~(J^4) per-band match prob: catches J ≳ 0.5."""
    rows = n_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, k=k, n_hashes=n_hashes)
    bandcols = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.xxhash64(*[F.col("sig")[b * rows + r] for r in range(rows)]).alias("bucket"),
                )
                for b in range(bands)
            ]
        )
    ).alias("bb")
    buckets = sig.select(F.col(id_col), bandcols).select(
        id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(b, ["band", "bucket"])
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, simhash bigint): 64-bit SimHash over word tokens. One
    explode + one groupBy with 64 signed-bit-count aggregates; the
    fingerprint bit i is the sign of Σ±1 over token-hash bit i."""
    words = df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("w"),
    ).where(F.length("w") > 0)
    h = F.xxhash64("w")
    sums = [
        F.sum(
            F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(64)
    ]
    agg = words.groupBy(id_col).agg(*sums)
    acc = F.lit(0).cast("bigint")
    for i in range(64):
        acc = acc + F.when(F.col(f"b{i}") > 0, F.shiftleft(F.lit(1).cast("bigint"), i)).otherwise(F.lit(0).cast("bigint"))
    return agg.select(F.col(id_col), acc.alias("simhash"))


def simhash_near_pairs(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", *, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ max_hamming, using
    4×16-bit block buckets (two fingerprints within hamming 3 agree on
    ≥1 of 4 blocks) — bucket join instead of all-pairs."""
    s = simhash(df, id_col, text_col)
    blocks = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(bi).alias("blk"),
                    F.shiftright(F.col("simhash"), bi * 16).bitwiseAND(F.lit(0xFFFF)).alias("val"),
                )
                for bi in range(4)
            ]
        )
    ).alias("bb")
    bt = s.select(id_col, "simhash", blocks).select(
        id_col, "simhash", F.col("bb.blk").alias("blk"), F.col("bb.val").alias("val")
    )
    a = bt.alias("a")
    b = bt.alias("b")
    cand = (
        a.join(b, ["blk", "val"])
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .distinct()
    )
    return cand.where(F.col("hamming") <= max_hamming)
