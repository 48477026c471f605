"""Independent single-process re-derivations of the seeded-hash LSH
surfaces — the oracle bridge for ``minhash_lsh_docs`` /
``simhash_docs`` / ``rp_lsh_near_pairs``, the last doc queries whose
hashes are not expressible in ANSI SQL.

Unlike the media fixtures (pure functions of a seed), these operators
consume the documents/embeddings PARQUET tables, so the expectation
builder reads the same parquet the query reads (resolved at call time
from ``$SINTER_ORACLE_SF_DIR``, defaulting to the driver's sf0.01) and
re-derives every per-row value with straight-line per-doc code that
shares nothing structural with the distributed kernels:

* minhash: the Arrow kernel (``dedup._minhash_arrow_kernel``) hashes
  every window of ONE concatenated batch buffer with doc-boundary
  masking and a segmented ``np.minimum.reduceat``; here each doc is a
  plain per-doc window loop + an (n_shingles × n_hashes) min. Only the
  hash-family PARAMETERS (the splitmix64 constants and the
  PCG64(seed)-drawn affine A/B) are shared — they define the function
  being computed, not how it is computed.
* banding: the operator buckets on ``xxhash64(sig slice)`` JVM-side;
  the oracle SQL self-joins on the raw slice values instead —
  identical pair sets unless xxhash64 collides on 4 longs (~2⁻⁶⁴ per
  bucket pair; such a mismatch would itself be a finding).
* simhash: the kernel's global telescoping-cumsum polynomial hash is
  re-derived as the textbook per-token Horner fold; lowering is
  Python ``str.lower()`` (pinned equal to the kernel's
  ``pc.utf8_lower`` + U+0130 pre-replace).
* rp-lsh: hyperplane dots are re-derived as the same left-to-right
  sequential float64 fold the JVM ``F.aggregate`` performs (bit-exact
  signs); the candidate block join and the exact-cosine verify then
  run IN SQL against the ``embeddings`` view.

The oracle is exact (not approximate) at these scales because the
mega-bucket cap never engages: the largest possible bucket is
n_docs ≤ 500 < max_bucket 1000 at every driver/test sf.
"""

from __future__ import annotations

import os
from functools import lru_cache

import numpy as np

_MASK = (1 << 64) - 1
_U64 = np.uint64


def oracle_sf_dir() -> str:
    """Scale-factor directory the oracle expectations are built from.

    The driver's correctness gate always runs at sf0.01 (the default);
    the in-repo gate (tests/test_entry_oracle.py) exports
    ``SINTER_ORACLE_SF_DIR`` so expectations follow its ``sf_dir``
    fixture."""
    return os.environ.get("SINTER_ORACLE_SF_DIR", "/root/testdata/sf0.01")


def _splitmix64_np(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        x = x + _U64(0x9E3779B97F4A7C15)
        x = (x ^ (x >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> _U64(27))) * _U64(0x94D049BB133111EB)
        return x ^ (x >> _U64(31))


def _splitmix64(x: int) -> int:
    x = (x + 0x9E3779B97F4A7C15) & _MASK
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _MASK
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _MASK
    return x ^ (x >> 31)


@lru_cache(maxsize=4)
def _read_table(sf_dir: str, table: str, cols: tuple) -> list[tuple]:
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, f"{table}.parquet"), columns=list(cols))
    return list(zip(*(t.column(c).to_pylist() for c in cols)))


# --- minhash -----------------------------------------------------------------


def minhash_affine_params(n_hashes: int = 64, seed: int = 7):
    """The (A, B) affine transforms of the minhash family — drawn with
    the same PCG64 stream as ``dedup.minhash_signatures_arrow`` (these
    are parameters of the hash family under test, not a computation)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    A = (rng.integers(1, 2**63, size=n_hashes, dtype=_U64) | _U64(1)).copy()
    B = rng.integers(0, 2**63, size=n_hashes, dtype=_U64).copy()
    return A, B


def minhash_sig_scalar(text: str, *, k: int = 4, A=None, B=None) -> list[int]:
    """Signed-int64 minhash signature of ONE doc: per-doc byte-window
    loop + one (n_shingles × n_hashes) min — the straight-line twin of
    the batch-global Arrow kernel."""
    if A is None or B is None:
        A, B = minhash_affine_params()
    arr = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    if arr.size < k:
        h = _splitmix64_np(np.zeros(1, dtype=_U64))
    else:
        n = arr.size - k + 1
        codes = np.zeros(n, dtype=_U64)
        for j in range(k):
            codes = (codes << _U64(8)) | arr[j : n + j].astype(_U64)
        h = _splitmix64_np(codes)
    with np.errstate(over="ignore"):
        sig = (h[:, None] * A[None, :] + B[None, :]).min(axis=0)
    return [int(v) for v in sig.view(np.int64)]


@lru_cache(maxsize=2)
def minhash_band_rows(
    sf_dir: str, *, k: int = 4, n_hashes: int = 64, bands: int = 16
) -> tuple[tuple, ...]:
    """(doc_id, band, slice) rows: the band slice as a comma-joined
    value string — the join key the oracle SQL buckets on (in place of
    the operator's xxhash64 of the same slice). NULL-text docs are
    omitted, matching the kernel's grouped-form semantics."""
    rows_per = n_hashes // bands
    A, B = minhash_affine_params(n_hashes)
    out = []
    for doc_id, text in _read_table(sf_dir, "documents", ("doc_id", "text")):
        if text is None:
            continue
        sig = minhash_sig_scalar(text, k=k, A=A, B=B)
        for b in range(bands):
            s = ",".join(str(v) for v in sig[b * rows_per : (b + 1) * rows_per])
            out.append((doc_id, b, s))
    return tuple(out)


def minhash_oracle_sql() -> str:
    rows = minhash_band_rows(oracle_sf_dir())
    vals = ",\n".join(f"({d}, {b}, '{s}')" for d, b, s in rows)
    return (
        "WITH bk AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, band, slice "
        f"FROM (VALUES\n{vals}\n) AS t(doc_id, band, slice))\n"
        "SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b\n"
        "  FROM bk a JOIN bk b ON a.band = b.band AND a.slice = b.slice\n"
        " WHERE a.doc_id < b.doc_id"
    )


# --- simhash -----------------------------------------------------------------


def simhash_scalar(text: str) -> int | None:
    """Signed-int64 SimHash of ONE doc: Python ``str.lower()``, a byte
    split at ≤0x20, the textbook Horner polynomial fold per token, and
    a per-bit ±1 majority — the straight-line twin of the kernel's
    telescoping global cumsum. None when the doc has no tokens
    (omitted, like the kernel)."""
    P = 0x100000001B3
    toks = []
    cur = bytearray()
    for byte in text.lower().encode("utf-8"):
        if byte <= 0x20:
            if cur:
                toks.append(bytes(cur))
                cur = bytearray()
        else:
            cur.append(byte)
    if cur:
        toks.append(bytes(cur))
    if not toks:
        return None
    hs = []
    for t in toks:
        acc = 0
        for byte in t:
            acc = (acc * P + byte) & _MASK
        hs.append(_splitmix64(acc))
    ha = np.array(hs, dtype=_U64)
    bits = ((ha[:, None] >> np.arange(64, dtype=_U64)[None, :]) & _U64(1)).astype(np.int64)
    counts = 2 * bits.sum(axis=0) - len(hs)
    v = 0
    for i in range(64):
        if counts[i] > 0:
            v |= 1 << i
    return v - (1 << 64) if v >= (1 << 63) else v


@lru_cache(maxsize=2)
def simhash_rows(sf_dir: str) -> tuple[tuple, ...]:
    out = []
    for doc_id, text in _read_table(sf_dir, "documents", ("doc_id", "text")):
        if text is None:
            continue
        v = simhash_scalar(text)
        if v is not None:
            out.append((doc_id, v))
    return tuple(out)


def simhash_oracle_sql() -> str:
    from .media_fixtures import values_sql

    rows = list(simhash_rows(oracle_sf_dir()))
    return values_sql(
        rows, [("doc_id", "BIGINT"), ("simhash", "BIGINT")], ["doc_id"]
    )


# --- winnowing ---------------------------------------------------------------


def winnow_scalar(text: str, *, k: int = 8, window: int = 8) -> list[tuple[int, int]]:
    """Sorted (pos, fp) winnowed fingerprints of ONE doc — the textbook
    per-window scan from SIGMOD 2003 (explicit min + rightmost-tie
    search per window), the straight-line twin of the kernel's
    O(window) shifted-pass formulation. fp values signed-int64."""
    bs = text.encode("utf-8")
    span = window + k - 1
    if len(bs) < span:
        return []
    m = len(bs) - k + 1
    hs = []
    for p in range(m):
        code = 0
        for j in range(k):
            code = (code << 8) | bs[p + j]
        hs.append(_splitmix64(code))
    sel: dict[int, int] = {}
    for q in range(m - window + 1):
        wvals = hs[q : q + window]
        mn = min(wvals)
        j = max(i for i, v in enumerate(wvals) if v == mn)
        sel[q + j] = wvals[j]
    return sorted(
        (pos, fp - (1 << 64) if fp >= (1 << 63) else fp) for pos, fp in sel.items()
    )


@lru_cache(maxsize=2)
def winnow_fp_rows(sf_dir: str, *, k: int = 8, window: int = 8) -> tuple[tuple, ...]:
    """Distinct (doc_id, fp) rows over the documents table."""
    out = []
    for doc_id, text in _read_table(sf_dir, "documents", ("doc_id", "text")):
        if text is None:
            continue
        fps = {fp for _pos, fp in winnow_scalar(text, k=k, window=window)}
        out.extend((doc_id, fp) for fp in sorted(fps))
    return tuple(out)


def winnow_oracle_sql(min_shared: int = 15, max_bucket: int = 200) -> str:
    """Self-join on raw fingerprint values + HAVING — the SQL twin of
    ``winnow.substring_overlap_pairs``. The operator's mega-bucket cap
    is REPLICATED in SQL (fingerprints carried by more than
    ``max_bucket`` documents are excluded before the join), so the
    oracle is exact at every sf — at sf0.1 the largest bucket is ~3.8k
    docs and uncapped SQL would both mismatch and cost Σb² ≈ 10⁸."""
    rows = winnow_fp_rows(oracle_sf_dir())
    vals = ",\n".join(f"({d}, {fp})" for d, fp in rows)
    return (
        "WITH raw AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(fp AS BIGINT) AS fp "
        f"FROM (VALUES\n{vals}\n) AS t(doc_id, fp)),\n"
        f"kept AS (SELECT fp FROM raw GROUP BY fp HAVING COUNT(*) <= {int(max_bucket)}),\n"
        "fp AS (SELECT raw.* FROM raw JOIN kept USING (fp))\n"
        "SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared\n"
        "  FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id\n"
        " GROUP BY 1, 2\n"
        f"HAVING COUNT(*) >= {int(min_shared)}"
    )


# --- rp-lsh ------------------------------------------------------------------


def rp_bucket_scalar(vec, planes) -> int:
    """Sign-pattern bucket of ONE embedding: the same left-to-right
    sequential float64 fold the JVM expression performs, so the sign of
    a near-zero dot cannot drift from summation order."""
    bucket = 0
    for i in range(planes.shape[0]):
        acc = 0.0
        row = planes[i]
        for j in range(planes.shape[1]):
            acc = acc + float(vec[j]) * float(row[j])
        if acc > 0:
            bucket |= 1 << i
    return bucket


@lru_cache(maxsize=2)
def rp_block_rows(
    sf_dir: str, *, dim: int = 64, n_planes: int = 16, bands: int = 4, seed: int = 7
) -> tuple[tuple, ...]:
    rng = np.random.Generator(np.random.PCG64(seed))
    planes = rng.standard_normal((n_planes, dim))
    bits_per = n_planes // bands
    out = []
    for vec_id, emb in _read_table(sf_dir, "embeddings", ("vec_id", "embedding")):
        if emb is None:
            continue
        bucket = rp_bucket_scalar(emb, planes)
        for bi in range(bands):
            out.append((vec_id, bi, (bucket >> (bi * bits_per)) & ((1 << bits_per) - 1)))
    return tuple(out)


def rp_lsh_oracle_sql(threshold: float = 0.9, round_to: int = 5) -> str:
    rows = rp_block_rows(oracle_sf_dir())
    vals = ",\n".join(f"({v}, {b}, {x})" for v, b, x in rows)
    return (
        "WITH blk AS (SELECT CAST(vec_id AS BIGINT) AS vec_id, blk, val "
        f"FROM (VALUES\n{vals}\n) AS t(vec_id, blk, val)),\n"
        "cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b\n"
        "           FROM blk a JOIN blk b ON a.blk = b.blk AND a.val = b.val\n"
        "          WHERE a.vec_id < b.vec_id)\n"
        "SELECT id_a, id_b, cos_sim FROM (\n"
        "  SELECT c.id_a, c.id_b,\n"
        f"         ROUND(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),\n"
        f"                                      CAST(eb.embedding AS DOUBLE[])), {round_to}) AS cos_sim\n"
        "    FROM cand c\n"
        "    JOIN embeddings ea ON ea.vec_id = c.id_a\n"
        "    JOIN embeddings eb ON eb.vec_id = c.id_b\n"
        f") WHERE cos_sim >= {threshold}"
    )


# --- ivf ---------------------------------------------------------------------

#: fixed hyperparameters of the oracled ``ivf_topk_cosine`` query —
#: shared between __spark_entry__'s Spark query and the oracle twin
IVF_N_CLUSTERS = 8
IVF_N_PROBE = 4
IVF_SAMPLE = 20_000
IVF_SEED = 7
IVF_K = 10
IVF_ROUND = 5


@lru_cache(maxsize=2)
def ivf_fixture_centroids(sf_dir: str) -> np.ndarray:
    """Centroids of the index under test: spherical k-means on the
    content-deterministic sample (rows ordered by ``vec_id``, first
    ``IVF_SAMPLE``) — the exact draw ``train_centroids(...,
    sample_order_by="vec_id")`` makes, re-read here with pyarrow.
    Like ``minhash_affine_params``, these are PARAMETERS of the
    function under test (the index geometry), derived by the shared
    ``kmeans_spherical``; what the oracle then checks independently is
    everything Spark computes distributed: per-vector cluster
    assignment, the probed-cluster restriction, exact cosine, and the
    final top-k ordering."""
    from .operators.ivf import kmeans_spherical

    rows = sorted(
        (r for r in _read_table(sf_dir, "embeddings", ("vec_id", "embedding"))
         if r[1] is not None),
        key=lambda r: r[0],
    )[:IVF_SAMPLE]
    sample = np.array([r[1] for r in rows], dtype=np.float64)
    return kmeans_spherical(sample, n_clusters=IVF_N_CLUSTERS, seed=IVF_SEED)


def ivf_assign_scalar(vec, cents: np.ndarray) -> int:
    """Nearest-centroid id of ONE embedding by cosine (normalize, dot,
    argmax) — the per-row twin of the batch matmul in
    ``ivf.assign_clusters``."""
    v = np.asarray(vec, dtype=np.float64)
    n = np.linalg.norm(v)
    if n:
        v = v / n
    return int(np.argmax(cents @ v))


def ivf_oracle_sql() -> str:
    """DuckDB twin of ``ivf_topk_cosine``: the fixture assigns every
    vector to its nearest centroid with per-row scalar math and embeds
    the PROBED vec_ids as a VALUES table; DuckDB then recomputes the
    exact cosine against the query vector (vec_id = MIN) with its own
    ``list_cosine_similarity`` and takes the same
    (cos_sim DESC, vec_id) top-k."""
    from .operators.ivf import probe_clusters

    sf = oracle_sf_dir()
    cents = ivf_fixture_centroids(sf)
    rows = _read_table(sf, "embeddings", ("vec_id", "embedding"))
    qid = min(v for v, e in rows if e is not None)
    qvec = next(e for v, e in rows if v == qid)
    probes = set(probe_clusters(cents, qvec, IVF_N_PROBE))
    kept = sorted(
        v for v, e in rows if e is not None and ivf_assign_scalar(e, cents) in probes
    )
    vals = ",".join(f"({v})" for v in kept)
    return (
        f"WITH probed AS (SELECT CAST(vec_id AS BIGINT) AS vec_id "
        f"FROM (VALUES {vals}) AS t(vec_id)),\n"
        f"q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings "
        f"WHERE vec_id = {qid})\n"
        f"SELECT e.vec_id, ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),\n"
        f"                       (SELECT qv FROM q)), {IVF_ROUND}) AS cos_sim\n"
        f"  FROM embeddings e JOIN probed p ON p.vec_id = e.vec_id\n"
        f" ORDER BY cos_sim DESC, e.vec_id\n"
        f" LIMIT {IVF_K}"
    )
