"""Text-analysis operators for training-data pipelines.

Language-ID (character/stopword heuristic), quality scoring, token
counting (whitespace + BPE-ish regex) and document fingerprinting —
all pure ``pyspark.sql.functions`` Column expressions (JVM-side,
whole-stage codegen; zero Python in the hot path) so they hold at
100 TB and are DuckDB-oracle-expressible for the correctness gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: BPE-ish tokenizer: word pieces | numbers | single punctuation.
#: Kept to the regex subset Java and RE2 share (SURVEY.md §7.3).
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def token_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(TOKEN_RE), 0))


def whitespace_token_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    # split on runs of whitespace; trim first so no empty edge tokens
    return F.when(F.length(F.trim(c)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(c), r"\s+"))
    )


def punct_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    puncts = F.length(F.regexp_replace(c, r"[^.,;:!?'\"()\[\]-]", ""))
    return F.when(F.length(c) > 0, puncts / F.length(c)).otherwise(F.lit(0.0))


def stopword_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    words = F.split(F.trim(F.lower(c)), r"\s+")
    n = F.size(words)
    stops = F.size(F.filter(words, lambda w: w.isin(*_STOPWORDS)))
    return F.when(n > 0, stops / n).otherwise(F.lit(0.0))


def lang_id(col: Column | str) -> Column:
    """n-gram/stopword heuristic language ID (deterministic; the real
    pipeline would swap in fastText — this is the Spark plumbing +
    a reproducible rule)."""
    c = F.col(col) if isinstance(col, str) else col
    padded = F.concat(F.lit(" "), F.lower(c), F.lit(" "))
    return (
        F.when(c.rlike("[一-鿿぀-ヿ]"), F.lit("zh"))
        .when(padded.rlike(" (der|die|das|und|nicht) "), F.lit("de"))
        .when(padded.rlike(" (le|la|les|et|est) "), F.lit("fr"))
        .when(padded.rlike(" (el|los|las|es|y) "), F.lit("es"))
        .otherwise(F.lit("en"))
    )


def normalized_text(col: Column | str) -> Column:
    """Whitespace-collapsed lowercase text — THE canonical exact-match
    normalization. Every operator keyed on text identity (md5
    ``fingerprint``, the Bloom prefilter's xxhash64 probe) must derive
    from this ONE expression: the Bloom path's no-false-negative
    contract is that probe hashes and confirm-join fingerprints see
    byte-identical normalized text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: md5 of ``normalized_text`` (stable across
    engines; the cheap exact-dedup key). NULL text → NULL."""
    return F.md5(normalized_text(col))


def quality_features(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc quality features + composite score, one projection.

    NULL text ≡ empty document: every feature is 0 and quality is 0.0.
    Without the coalesce, ``F.least`` skips nulls — a NULL doc would
    score 0.6 (outranking genuine short texts) and ``size(split(null))``
    would emit -1 token counts."""
    c = F.coalesce(F.col(text_col), F.lit(""))
    n_chars = F.length(c)
    n_tokens = whitespace_token_count(c)
    pr = punct_ratio(c)
    sr = stopword_ratio(c)
    mean_tok = F.when(n_tokens > 0, n_chars.cast("double") / n_tokens).otherwise(F.lit(0.0))
    # composite score in [0,1]: long enough, readable token length,
    # light punctuation (deterministic arithmetic — oracle-friendly)
    quality = F.when(n_chars == 0, F.lit(0.0)).otherwise(
        F.least(n_chars / F.lit(200.0), F.lit(1.0)) * 0.4
        + F.when((mean_tok >= 3) & (mean_tok <= 10), F.lit(1.0)).otherwise(F.lit(0.0)) * 0.4
        + (F.lit(1.0) - F.least(pr * 5, F.lit(1.0))) * 0.2
    )
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars_obs"),
        n_tokens.alias("n_tokens"),
        token_count(c).alias("n_bpe_tokens"),
        F.round(pr, 6).alias("punct_ratio"),
        F.round(sr, 6).alias("stopword_ratio"),
        F.round(quality, 6).alias("quality"),
    )


def repetition_features(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition quality signals, one zero-shuffle pass.

    Per document (Rae et al. 2021 §A1.1, re-based on tokens because
    this corpus has no line structure):

    * ``dup_token_frac`` — fraction of token positions occupied by a
      token that appears more than once.
    * ``top_bigram_share`` — occurrences of the most frequent 2-gram
      over the number of 2-grams (the "top n-gram character fraction"
      analogue).
    * ``dup_trigram_frac`` — fraction of 3-gram positions whose 3-gram
      occurs more than once (the "duplicate n-gram fraction").

    All three are row-local higher-order-function expressions over
    materialized array columns (the arrays are projected FIRST so the
    HOF collection arguments are row-field references — Catalyst does
    not CSE expression arguments of HOFs). Zero exchanges, whole-stage
    codegen, O(G²) per row with G ≤ tokens-per-doc — the shape that
    holds at 100 TB because it never shuffles anything.

    Empty/NULL text yields all-zero features (same convention as
    ``quality_features``).
    """
    from .decontam import ngrams, _tokenize

    def _counts(g: Column) -> Column:
        # occurrences of each element, aligned with the element order
        return F.transform(g, lambda x: F.size(F.filter(g, lambda y: y == x)))

    arrays = df.select(
        F.col(id_col),
        _tokenize(text_col).alias("_tok"),
    ).select(
        F.col(id_col),
        F.col("_tok"),
        ngrams(F.col("_tok"), 2).alias("_g2"),
        ngrams(F.col("_tok"), 3).alias("_g3"),
    )
    n_tok = F.size("_tok")
    dup_tok = F.size(F.filter(_counts(F.col("_tok")), lambda c: c > 1))
    n_g2 = F.size("_g2")
    top_g2 = F.array_max(_counts(F.col("_g2")))
    n_g3 = F.size("_g3")
    dup_g3 = F.size(F.filter(_counts(F.col("_g3")), lambda c: c > 1))

    def _ratio(num: Column, den: Column) -> Column:
        return F.round(
            F.when(den > 0, num.cast("double") / den).otherwise(F.lit(0.0)), 6
        )

    return arrays.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        _ratio(dup_tok, n_tok).alias("dup_token_frac"),
        _ratio(F.coalesce(top_g2, F.lit(0)), n_g2).alias("top_bigram_share"),
        _ratio(dup_g3, n_g3).alias("dup_trigram_frac"),
    )


def repetition_oracle_sql(table: str = "documents") -> str:
    """DuckDB twin of ``repetition_features`` (nested list lambdas).

    DuckDB list slicing is inclusive (``t[i:i+1]`` is a 2-gram), and
    integer ``/`` is already float division; casts are explicit anyway.
    """

    def grams(n: int) -> str:
        return (
            f"[array_to_string(t[i:i+{n - 1}], ' ') "
            f"FOR i IN range(1, greatest(len(t) - {n - 1}, 0) + 1)]"
        )

    counts = "list_transform({g}, x -> len(list_filter({g}, y -> y = x)))"
    return f"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN text IS NULL OR trim(text) = '' THEN []
              ELSE string_split_regex(lower(trim(text)), '\\s+') END AS t
  FROM {table}
),
arrays AS (
  SELECT doc_id, t, {grams(2)} AS g2, {grams(3)} AS g3 FROM toks
)
SELECT doc_id,
       len(t) AS n_tokens,
       round(CASE WHEN len(t) > 0 THEN
         len(list_filter({counts.format(g="t")}, c -> c > 1))
           / CAST(len(t) AS DOUBLE) ELSE 0.0 END, 6) AS dup_token_frac,
       round(CASE WHEN len(g2) > 0 THEN
         list_max({counts.format(g="g2")})
           / CAST(len(g2) AS DOUBLE) ELSE 0.0 END, 6) AS top_bigram_share,
       round(CASE WHEN len(g3) > 0 THEN
         len(list_filter({counts.format(g="g3")}, c -> c > 1))
           / CAST(len(g3) AS DOUBLE) ELSE 0.0 END, 6) AS dup_trigram_frac
FROM arrays
"""
