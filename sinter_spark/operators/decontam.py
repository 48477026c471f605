"""Benchmark decontamination: n-gram overlap against an eval set.

Before pretraining, every serious pipeline removes training documents
that overlap the evaluation benchmarks (the GPT-3 appendix-C /
Gopher-style n-gram decontamination). The reference stops at
validation (`lib/sinter.ex:1` hands validated rows onward); this
module is part of the engine's pipeline charter, same as
``operators/packing.py``.

Semantics
---------
Tokens are whitespace splits of ``lower(trim(text))``; an *n-gram* is
``n`` consecutive tokens joined by a single space. A training document
is scored by how many of its DISTINCT n-grams appear anywhere in the
benchmark corpus, and flagged contaminated when either the matched
count or the matched fraction crosses its threshold. Everything is
exact string matching — no hashing in the oracled path — so DuckDB
can replay it verbatim (``decontamination_oracle_sql``).

100 TB design
-------------
The training side is the 100 TB side; the benchmark side is eval sets
(MBs–GBs). The plan is built so the big side is touched once and
never shuffled on a wide key:

1. Benchmark grams: ``explode`` + ``distinct`` on the SMALL side only,
   then ``F.broadcast`` — the dedup shuffle is over eval-set grams,
   not training data.
2. Training side: tokens/grams are materialized as row-local array
   columns FIRST, then exploded — the HOF collection argument is a
   row-field reference, so Catalyst's no-CSE-on-HOF behavior cannot
   re-tokenize per gram (see the project pitfalls note).
3. One broadcast LEFT join marks matches with zero movement of the
   big side, and the only exchange in the job is the final
   map-side-combined ``groupBy(doc_id)`` — a shuffle of
   (id, small ints), not text.

Skew: a training doc contributes at most ``size(grams)`` rows and the
groupBy key is the unique doc id, so there is no hot key by
construction. ``n_grams == 0`` docs (shorter than ``n`` tokens) never
leave the narrow path and are trivially clean.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def ngrams(tokens: Column, n: int) -> Column:
    """Array of space-joined ``n``-grams from a token-array column.

    ``tokens`` should be a materialized column reference (select the
    split into a column first) — passing the raw ``split(...)``
    expression would re-evaluate it per gram under Catalyst's
    no-CSE-for-HOF-arguments behavior.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    n_tok = F.size(tokens)
    # sequence(1, m) of gram start positions (1-based for slice);
    # guard the short-doc case — sequence(1, 0) would count DOWN.
    starts = F.sequence(F.lit(1), n_tok - (n - 1))
    grams = F.transform(starts, lambda i: F.array_join(F.slice(tokens, i, n), " "))
    return F.when(n_tok >= n, grams).otherwise(F.array().cast("array<string>"))


def _tokenize(text_col: str) -> Column:
    c = F.coalesce(F.col(text_col), F.lit(""))
    return F.when(F.length(F.trim(c)) == 0, F.array().cast("array<string>")).otherwise(
        F.split(F.lower(F.trim(c)), r"\s+")
    )


def gram_keys(tokens: Column, n: int) -> Column:
    """Array of 8-byte n-gram keys (``xxhash64`` over each length-``n``
    token slice) from a token-array column — the ``hash_grams`` twin of
    :func:`ngrams` that never materializes a gram string.

    Key equality ≡ token-sequence equality ≡ joined-string equality
    (tokens are whitespace splits, so the single-space join is
    injective), up to an xxhash64 collision (P ≈ grams·bench/2⁶⁴).
    Building the key hashes the slice elements directly — no per-gram
    array_join allocation, and every downstream surface (distinct,
    broadcast build, join probe) moves 8-byte longs instead of ~n-word
    strings (guide §2.3 narrower types / §4.2 cheap per-row work).
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    n_tok = F.size(tokens)
    starts = F.sequence(F.lit(1), n_tok - (n - 1))
    keys = F.transform(starts, lambda i: F.xxhash64(F.slice(tokens, i, n)))
    return F.when(n_tok >= n, keys).otherwise(F.array().cast("array<bigint>"))


def contamination(
    df: DataFrame,
    benchmark_df: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_matches: int = 1,
    min_ratio: float | None = None,
    hash_grams: bool = False,
) -> DataFrame:
    """Per-document benchmark-overlap report.

    Returns one row per input document:
    ``(id_col, n_grams, matched_grams, contamination_ratio,
    contaminated)`` where ``n_grams`` counts the document's distinct
    n-grams, ``matched_grams`` how many of those occur in
    ``benchmark_df``, and ``contaminated`` is true when
    ``matched_grams >= min_matches`` (and, if ``min_ratio`` is set,
    also requires ``ratio >= min_ratio``).

    Plan shape (the 100 TB contract): benchmark grams are deduped on
    the small side and broadcast; the big side is exploded once and
    reduced by a single map-side-combined groupBy on the unique doc
    id. See the module docstring.

    ``hash_grams=True`` joins on 8-byte n-gram keys
    (:func:`gram_keys` — ``xxhash64`` over the token slice, no gram
    string ever built) instead of the gram string: gram construction
    skips the per-gram ``array_join`` allocation and the exploded join
    column plus the broadcast keys drop from ~n·word bytes to 8 bytes
    each (the thing that matters when the broadcast side is a large
    eval suite). An xxhash64 collision between a corpus gram and a
    DIFFERENT benchmark gram would over-count by one
    (P ≈ grams·bench/2^64 — negligible); the oracled driver query is
    pinned hashed ≡ string at every test SF and the pytest gate pins
    the same on real corpora.

    Both inputs are widened through :func:`plans.widen_small_scan`
    before the gram build: a single-row-group parquet file otherwise
    runs the whole tokenize+gram expression on ONE core (guide §2.5
    input skew — "one huge unsplittable file … repartition immediately
    after the read"); at scale the widen is a no-op.
    """
    from ..plans import widen_small_scan

    make_grams = (lambda t: gram_keys(t, n)) if hash_grams else (lambda t: ngrams(t, n))
    # project to the columns each side actually needs BEFORE the widen
    # (guide §2.3: project before the exchange — the widen's hash key
    # and shuffle must not carry unused columns). The benchmark side
    # keeps its id column (when it has one) purely as the widen's
    # spreading key: a text-only projection would hash duplicate
    # benchmark prompts — common in eval suites — onto one partition,
    # re-serializing the gram build the widen exists to parallelize.
    bench_cols = [c for c in (id_col, text_col) if c in benchmark_df.columns]
    bench_grams = (
        widen_small_scan(benchmark_df.select(*[F.col(c) for c in bench_cols or [text_col]]))
        .select(_tokenize(text_col).alias("_t"))
        .select(F.explode(make_grams(F.col("_t"))).alias("gram"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )

    docs = widen_small_scan(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col), _tokenize(text_col).alias("_t")
    ).select(
        F.col(id_col),
        F.array_distinct(make_grams(F.col("_t"))).alias("_grams"),
    )
    exploded = docs.select(
        F.col(id_col),
        F.size("_grams").alias("_n_grams"),
        # explode_outer keeps gram-less (short) docs in the same pass
        F.explode_outer("_grams").alias("gram"),
    )
    joined = exploded.join(F.broadcast(bench_grams), "gram", "left")
    per_doc = joined.groupBy(id_col).agg(
        F.first("_n_grams").alias("n_grams"),
        F.coalesce(F.sum("_hit"), F.lit(0)).alias("matched_grams"),
    )
    ratio = F.when(
        F.col("n_grams") > 0, F.col("matched_grams") / F.col("n_grams")
    ).otherwise(F.lit(0.0))
    flag = F.col("matched_grams") >= F.lit(int(min_matches))
    if min_ratio is not None:
        flag = flag & (ratio >= F.lit(float(min_ratio)))
    return per_doc.select(
        F.col(id_col),
        F.col("n_grams"),
        F.col("matched_grams"),
        F.round(ratio, 6).alias("contamination_ratio"),
        flag.alias("contaminated"),
    )


def decontaminate(
    df: DataFrame,
    benchmark_df: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_matches: int = 1,
    min_ratio: float | None = None,
) -> DataFrame:
    """Drop contaminated documents; passes every original column through.

    The report join is on the unique ``id_col`` — at scale this is a
    shuffle of (id, bool) against the corpus, or a broadcast when the
    contaminated set is small (it usually is; AQE picks that up from
    runtime stats).
    """
    report = contamination(
        df,
        benchmark_df,
        n=n,
        text_col=text_col,
        id_col=id_col,
        min_matches=min_matches,
        min_ratio=min_ratio,
    )
    bad = report.where(F.col("contaminated")).select(id_col)
    return df.join(bad, id_col, "left_anti")


def decontamination_oracle_sql(
    n: int = 5,
    table: str = "documents",
    benchmark_where: str = "doc_id % 37 = 0",
    min_matches: int = 1,
) -> str:
    """ANSI/DuckDB twin of ``contamination`` over ``table``.

    The benchmark is a deterministic slice of the same table
    (``benchmark_where``) so the check is self-contained on the
    driver's pre-registered views. DuckDB list slicing is INCLUSIVE
    (``t[i:i+n-1]`` is n elements, unlike Spark's length-based
    ``slice``), hence the differing index arithmetic.
    """
    grams = (
        f"list_distinct([array_to_string(t[i:i+{n - 1}], ' ') "
        f"FOR i IN range(1, greatest(len(t) - {n - 1}, 0) + 1)])"
    )
    return f"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN text IS NULL OR trim(text) = '' THEN []
              ELSE string_split_regex(lower(trim(text)), '\\s+') END AS t
  FROM {table}
),
doc_grams AS (SELECT doc_id, {grams} AS grams FROM toks),
bench AS (
  SELECT list(DISTINCT g.gram) AS bl
  FROM doc_grams dg, unnest(dg.grams) AS g(gram)
  WHERE {benchmark_where.replace("doc_id", "dg.doc_id")}
),
scored AS (
  -- DuckDB forbids subqueries inside lambdas; cross-join the (single
  -- row) benchmark gram list instead and close over its column
  SELECT dg.doc_id,
         len(dg.grams) AS n_grams,
         len(list_filter(dg.grams, x -> list_contains(bench.bl, x)))
           AS matched_grams
  FROM doc_grams dg, bench
  WHERE NOT ({benchmark_where.replace("doc_id", "dg.doc_id")})
)
SELECT doc_id,
       n_grams,
       matched_grams,
       round(CASE WHEN n_grams > 0
                  THEN matched_grams / CAST(n_grams AS DOUBLE)
                  ELSE 0.0 END, 6) AS contamination_ratio,
       matched_grams >= {int(min_matches)} AS contaminated
FROM scored
"""
