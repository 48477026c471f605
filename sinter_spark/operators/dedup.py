"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

The scale story (100 TB):
* **exact** — fingerprint groupBy (hash shuffle on a high-cardinality
  key; AQE-balanced). The per-group id list is BOUNDED (``max_ids``)
  so one pathological billion-copy cluster can't OOM a reducer.
* **n-gram Jaccard** — the *exact* similarity baseline: shingle
  explode + self-join. Quadratic in cluster size per shared shingle —
  correct as an oracle, not the scale path.
* **MinHash + banded LSH** — the scale path. The signature is a
  **row-local array expression** (``aggregate`` over the per-doc
  shingle array carrying 64 running mins): ZERO exchanges before the
  bucket join — the doc's shingle set lives in the doc's row, so no
  explode+groupBy shuffle of a k×-corpus-size stream. Banding →
  bucket join so only candidate pairs meet; buckets above
  ``max_bucket`` are dropped (degenerate boilerplate clusters would
  otherwise make the join quadratic) and exact dedup catches those.
* **SimHash** — 64-bit near-dup fingerprint, likewise one row-local
  expression (token-hash bit sums via ``aggregate``/``zip_with``);
  hamming-block buckets join instead of all-pairs.

Everything is built-in-function Spark; no UDF and no shuffle in any
signature computation. Candidate bucket tables are persisted before
the self-join so the signature subtree is computed once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F
from pyspark.storagelevel import StorageLevel

from .uniqueness import duplicate_keys  # noqa: F401  (re-export: exact dedup)
from .text import fingerprint

_LONG_MAX = (1 << 63) - 1
# POWERS[i] = 1 << i as a signed 64-bit value (bit 63 wraps to Long.MIN).
_POW2 = [1 << i for i in range(63)] + [-(1 << 63)]


def exact_dup_groups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    max_ids: int = 100,
) -> DataFrame:
    """Exact duplicates after whitespace/case normalization:
    (fingerprint, n_docs, doc_ids).

    ``doc_ids`` is capped at ``max_ids`` sorted ids per group: a
    degenerate corpus (billions of copies of one doc) must not build
    an unbounded array on a single reducer. ``n_docs`` is always the
    exact full count.
    """
    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.slice(F.sort_array(F.collect_list(id_col)), 1, max_ids).alias("doc_ids"),
        )
        .where(F.col("n_docs") > 1)
    )


def _shingle_array(text_col: str, k: int) -> Column:
    """Distinct char k-gram shingles of a doc as a row-local array
    column — the zero-shuffle building block for MinHash."""
    c = F.col(text_col)
    idx = F.sequence(F.lit(1), F.greatest(F.length(c) - (k - 1), F.lit(0)))
    return F.array_distinct(F.transform(idx, lambda i: F.substring(c, i, k)))


def char_shingles(df: DataFrame, id_col: str, text_col: str, k: int = 4) -> DataFrame:
    """Distinct char k-gram shingles per doc: (id, shingle) — exploded
    form, used by the exact-Jaccard oracle only."""
    return df.select(F.col(id_col), F.explode(_shingle_array(text_col, k)).alias("shingle"))


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
    the min of xxhash64(seed_i, shingle).

    Row-local and shuffle-free: the shingle array is the *argument* of
    ``F.aggregate`` (evaluated once per row), and the aggregate carries
    an array of n_hashes running mins updated via ``zip_with`` — one
    narrow projection, zero exchanges. Hash values are identical to the
    explode+groupBy formulation (same ``xxhash64(int_seed, shingle)``
    over the same distinct-shingle set), so banding downstream is
    unchanged.
    """
    from ..plans import widen_small_scan

    seeds = F.sequence(F.lit(0), F.lit(n_hashes - 1))  # array<int>, constant-folded
    init = F.array_repeat(F.lit(_LONG_MAX).cast("bigint"), n_hashes)
    sig = F.aggregate(
        _shingle_array(text_col, k),
        init,
        lambda acc, s: F.zip_with(acc, seeds, lambda a, i: F.least(a, F.xxhash64(i, s))),
    )
    # hashing is compute-heavy: widen an under-split (tiny-file) scan so
    # every core participates — a no-op on any real-scale table
    return widen_small_scan(df).select(F.col(id_col), sig.alias("sig"))


def _cap_buckets(
    buckets: DataFrame, keys: list[str], max_bucket: int | None
) -> DataFrame:
    """Drop LSH buckets larger than max_bucket (mega-bucket guard).

    A degenerate corpus (millions of near-empty/boilerplate docs in
    one band-bucket) makes the candidate self-join quadratic in the
    largest bucket. Oversized buckets are dropped — their members are
    exact or near-exact duplicates that exact_dup_groups already
    catches; use :func:`oversized_buckets` to audit dropped mass.
    The window shuffle partitions by the same keys the candidate join
    needs, so the cap adds no extra exchange to the join side.
    """
    if max_bucket is None:
        return buckets
    w = Window.partitionBy(*keys)
    return (
        buckets.withColumn("_bn", F.count(F.lit(1)).over(w))
        .where(F.col("_bn") <= max_bucket)
        .drop("_bn")
    )


def oversized_buckets(
    buckets: DataFrame, keys: list[str], max_bucket: int
) -> DataFrame:
    """Audit view of buckets the cap would drop: (*keys, n_members)."""
    return (
        buckets.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_members"))
        .where(F.col("n_members") > max_bucket)
    )


def minhash_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k: int = 4,
    n_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """(id, band, bucket): banded LSH bucket assignments over MinHash."""
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
    return sig.select(F.col(id_col), bandcols).select(
        id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k: int = 4,
    n_hashes: int = 64,
    bands: int = 16,
    max_bucket: int | None = 1000,
    cache: bool = True,
) -> DataFrame:
    """Candidate near-dup pairs (a < b) via banded LSH over MinHash:
    docs agreeing on ALL rows of ≥1 band meet in a bucket join.
    bands=16 × rows=4 ⇒ ~(J^4) per-band match prob: catches J ≳ 0.5.

    The bucket table is persisted before the self-join so the
    signature subtree is computed once, and buckets larger than
    ``max_bucket`` are dropped (see :func:`_cap_buckets`).
    """
    buckets = _cap_buckets(
        minhash_buckets(df, id_col, text_col, k=k, n_hashes=n_hashes, bands=bands),
        ["band", "bucket"],
        max_bucket,
    )
    if cache:
        buckets = buckets.persist(StorageLevel.MEMORY_AND_DISK)
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(b, ["band", "bucket"])
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, simhash bigint): 64-bit SimHash over word tokens.

    Row-local and shuffle-free: the token-hash array is the argument
    of one ``F.aggregate`` carrying 64 signed bit-counters (zip_with +
    getbit); the fingerprint bit i is the sign of Σ±1 over token-hash
    bit i. Values are identical to the explode+groupBy formulation
    (same xxhash64 token hashes, same sign rule, bit 63 wrapping to
    Long.MIN), with zero exchanges. Docs with no tokens are omitted,
    matching the grouped form where explode yields no rows.
    """
    tokens = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"), lambda w: F.length(w) > 0
    )
    hashes = F.transform(tokens, lambda w: F.xxhash64(w))
    bits = F.sequence(F.lit(0), F.lit(63))
    init = F.array_repeat(F.lit(0).cast("bigint"), 64)
    sums = F.aggregate(
        hashes,
        init,
        lambda acc, h: F.zip_with(
            acc,
            bits,
            lambda a, i: a
            + F.when(F.getbit(h, i) == 1, F.lit(1).cast("bigint")).otherwise(
                F.lit(-1).cast("bigint")
            ),
        ),
    )
    powers = F.array(*[F.lit(p).cast("bigint") for p in _POW2])
    sim = F.aggregate(
        F.zip_with(
            sums,
            powers,
            lambda s, p: F.when(s > 0, p).otherwise(F.lit(0).cast("bigint")),
        ),
        F.lit(0).cast("bigint"),
        lambda a, x: a + x,
    )
    from ..plans import widen_small_scan

    return (
        widen_small_scan(df)
        .select(F.col(id_col), F.size(tokens).alias("_ntok"), sim.alias("simhash"))
        .where(F.col("_ntok") > 0)
        .drop("_ntok")
    )


def simhash_blocks(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, simhash, blk, val): 4×16-bit block bucket assignments."""
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
    return s.select(id_col, "simhash", blocks).select(
        id_col, "simhash", F.col("bb.blk").alias("blk"), F.col("bb.val").alias("val")
    )


def simhash_near_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    max_hamming: int = 3,
    max_bucket: int | None = 1000,
    cache: bool = True,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ max_hamming, using
    4×16-bit block buckets (two fingerprints within hamming 3 agree on
    ≥1 of 4 blocks) — bucket join instead of all-pairs, persisted once,
    mega-buckets dropped (see :func:`_cap_buckets`)."""
    bt = _cap_buckets(simhash_blocks(df, id_col, text_col), ["blk", "val"], max_bucket)
    if cache:
        bt = bt.persist(StorageLevel.MEMORY_AND_DISK)
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
