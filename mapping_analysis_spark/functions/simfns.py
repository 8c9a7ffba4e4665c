"""Vectorized (Arrow-batched) similarity kernels as pandas UDFs.

These are the only Python-side compute kernels in the engine. They are
``pandas_udf``s — Arrow batch transfer, no row-at-a-time Python UDFs anywhere
(per the input_hint in BASELINE.json). Semantics follow the reference:

* ``trigram_cosine`` — multiset cosine over padded 3-grams, the reference's
  ``COSINE_TRIGRAM`` metric (simmetrics ``qGramWithPadding(3)``; see
  ``util/Utils.java:853-873``). Inputs must already be normalized with
  ``functions.text.normalize_text`` (the reference's ``simplify``,
  ``util/Utils.java:832-851``). Counts are integers, so dot and norms are
  exact in float64 and the resulting double is engine-deterministic.
* ``minhash_signature`` — k-permutation MinHash over word shingles; seeds are
  fixed at construction so signatures are identical across micro-batches and
  checkpoint resumes (LSH banding analogue of
  ``model/functions/blocking/lsh/LshCandidateCreator.java:23-29``).
* ``simhash64`` — 64-bit SimHash over tokens (bit-vote fingerprint).
"""

from __future__ import annotations

import zlib
from collections import Counter

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, LongType

MERSENNE_P = (1 << 61) - 1
_MAX_I64 = 1 << 63


def _padded_trigrams(s: str) -> Counter:
    p = "##" + s + "##"
    return Counter(p[i : i + 3] for i in range(len(p) - 2))


def _trigram_table(strings: list) -> tuple:
    """Per-unique-string padded-trigram count table, fully vectorized.

    Returns (indptr, codes, counts, norms): for string i,
    codes[indptr[i]:indptr[i+1]] are its distinct trigram codes (sorted) and
    counts[...] the multiset counts; norms[i] = Σ count². Codes are exact
    24-bit byte triples (c0<<16 | c1<<8 | c2) — for ASCII (all normalized
    text) byte trigrams ≡ character trigrams, zero collisions. Non-ASCII
    strings are diverted to the Counter fallback by the caller.
    """
    enc = [("##" + s + "##").encode("utf-8") for s in strings]
    lens = np.fromiter((len(b) for b in enc), dtype=np.int64, count=len(enc))
    buf = np.frombuffer(b"".join(enc), dtype=np.uint8).astype(np.int64)
    ends = np.cumsum(lens)
    starts = ends - lens
    n_tri = lens - 2  # every padded string has >= 4 bytes → >= 2 trigrams
    # positions of every trigram start, grouped by string
    tri_str = np.repeat(np.arange(len(enc), dtype=np.int64), n_tri)
    tri_pos = np.arange(n_tri.sum(), dtype=np.int64) + np.repeat(
        starts - np.concatenate(([0], np.cumsum(n_tri)[:-1])), n_tri
    )
    code = (buf[tri_pos] << 16) | (buf[tri_pos + 1] << 8) | buf[tri_pos + 2]
    # multiset counts per (string, code): sort then run-length encode
    key = (tri_str << 24) | code
    key.sort()
    boundary = np.empty(len(key), dtype=bool)
    boundary[0] = True
    np.not_equal(key[1:], key[:-1], out=boundary[1:])
    uniq = key[boundary]
    counts = np.diff(np.concatenate((np.flatnonzero(boundary), [len(key)])))
    u_str = uniq >> 24
    u_code = uniq & 0xFFFFFF
    indptr = np.concatenate(
        ([0], np.cumsum(np.bincount(u_str, minlength=len(enc))))
    )
    norms = np.zeros(len(enc), dtype=np.int64)
    np.add.at(norms, u_str, counts * counts)
    return indptr, u_code, counts, norms


@F.pandas_udf(DoubleType())
def trigram_cosine(a: pd.Series, b: pd.Series) -> pd.Series:
    """Multiset cosine over padded character 3-grams — vectorized exact path.

    Strategy: factorize each side to unique strings (labels repeat across
    many pairs), build per-unique trigram count tables with numpy
    (``_trigram_table``), then compute every pair's dot product in one
    sorted-key intersection over the whole batch: rows (pair, code, count)
    for both sides meet via ``np.intersect1d`` on the composite key.
    Integer counts → float64 dot/norms are exact, so results are
    bit-identical to the per-pair Counter fallback (used only for rows with
    non-ASCII text, where byte-trigrams ≠ char-trigrams).
    """
    n = len(a)
    out = np.zeros(n, dtype=np.float64)
    if n == 0:
        return pd.Series(out)
    av = a.to_numpy(dtype=object)
    bv = b.to_numpy(dtype=object)
    valid = np.fromiter(
        (
            x is not None and y is not None and x.isascii() and y.isascii()
            for x, y in zip(av, bv)
        ),
        dtype=bool,
        count=n,
    )
    # slow-path rows: None → 0.0; non-ASCII → exact Counter math
    for i in np.flatnonzero(~valid):
        x, y = av[i], bv[i]
        if x is None or y is None:
            continue
        ca, cb = _padded_trigrams(x), _padded_trigrams(y)
        dot = sum(c * cb[t] for t, c in ca.items())
        if dot:
            na = sum(c * c for c in ca.values())
            nb = sum(c * c for c in cb.values())
            out[i] = float(dot) / float(np.sqrt(float(na) * float(nb)))
    idx = np.flatnonzero(valid)
    if len(idx) == 0:
        return pd.Series(out)
    ua, ia = np.unique(av[idx].astype(str), return_inverse=True)
    ub, ib = np.unique(bv[idx].astype(str), return_inverse=True)
    pa, ca_codes, ca_counts, na = _trigram_table(list(ua))
    pb, cb_codes, cb_counts, nb = _trigram_table(list(ub))

    def expand(indptr, codes, counts, inv):
        """(pair, code, count) rows for every valid pair's side."""
        seg = indptr[inv + 1] - indptr[inv]  # entries per pair
        row = np.repeat(np.arange(len(inv), dtype=np.int64), seg)
        # element positions: for pair j, indptr[inv[j]] .. +seg[j]
        ofs = np.arange(seg.sum(), dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(seg)[:-1])), seg
        )
        pos = np.repeat(indptr[inv], seg) + ofs
        return (row << 24) | codes[pos], counts[pos]

    ka, wa = expand(pa, ca_codes, ca_counts, ia)
    kb, wb = expand(pb, cb_codes, cb_counts, ib)
    # both key arrays are already sorted (codes sorted within each pair, pair
    # ids ascending) → binary-search intersection, no re-sort
    dots = np.zeros(len(idx), dtype=np.int64)
    if len(ka) and len(kb):
        pos = np.searchsorted(ka, kb)
        pos[pos == len(ka)] = 0  # out-of-range probes can never match ka[0]
        hit = ka[pos] == kb
        # bincount with float weights ≫ unbuffered add.at; products are
        # integers < 2^53 so the float64 accumulation is exact
        dots = np.bincount(
            kb[hit] >> 24,
            weights=(wa[pos[hit]] * wb[hit]).astype(np.float64),
            minlength=len(idx),
        ).astype(np.int64)
    nz = dots > 0
    res = np.zeros(len(idx), dtype=np.float64)
    res[nz] = dots[nz].astype(np.float64) / np.sqrt(
        na[ia[nz]].astype(np.float64) * nb[ib[nz]].astype(np.float64)
    )
    out[idx] = res
    return pd.Series(out)


def _jaro(s1: str, s2: str) -> float:
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0
    if s1 == s2:
        return 1.0
    win = max(max(l1, l2) // 2 - 1, 0)
    m1 = [False] * l1
    m2 = [False] * l2
    m = 0
    for i in range(l1):
        lo, hi = max(0, i - win), min(l2, i + win + 1)
        for j in range(lo, hi):
            if not m2[j] and s1[i] == s2[j]:
                m1[i] = m2[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    return (m / l1 + m / l2 + (m - t) / m) / 3.0


@F.pandas_udf(DoubleType())
def jaro_winkler(a: pd.Series, b: pd.Series) -> pd.Series:
    """Jaro-Winkler similarity — the reference's second core string metric
    (simmetrics ``JaroWinkler()`` defaults: boost threshold 0.7, prefix
    scale 0.1, max common prefix 4; ``util/Utils.java:864-867``).

    Matches DuckDB's ``jaro_winkler_similarity`` bit-for-bit (the oracle;
    verified on 20k random pairs + the corpus label pairs), including its
    empty-vs-empty = 0.0 convention (simmetrics returns 1.0 there — labels
    are never empty after normalization, so the divergence is unreachable
    in the pipelines)."""
    out = np.zeros(len(a), dtype=np.float64)
    for i, (x, y) in enumerate(zip(a, b)):
        if x is None or y is None:
            continue
        j = _jaro(x, y)
        if j > 0.7:
            l = 0
            for cx, cy in zip(x[:4], y[:4]):
                if cx == cy:
                    l += 1
                else:
                    break
            j = j + l * 0.1 * (1 - j)
        out[i] = j
    return pd.Series(out)


def _shingle_hashes(tokens, width: int) -> np.ndarray:
    """Stable 32-bit hashes of word w-shingles.

    Accepts either string tokens (crc32 per shingle — platform-stable) or
    already-hashed int64 values (callers hash JVM-side with
    ``pmod(xxhash64(x), 2^32)`` to keep Arrow transfer and Python CPU low;
    values must fit 32 bits so the exact modmul in ``_min_perm`` holds)."""
    if len(tokens) > 0 and not isinstance(tokens[0], str):
        return np.asarray(tokens, dtype=np.int64) & 0xFFFFFFFF
    if len(tokens) < width:
        shingles = [" ".join(tokens)] if tokens else [""]
    else:
        shingles = [" ".join(tokens[i : i + width]) for i in range(len(tokens) - width + 1)]
    return np.fromiter(
        (zlib.crc32(s.encode("utf-8")) for s in shingles), dtype=np.int64, count=len(shingles)
    )


def make_minhash_udf(num_hashes: int = 16, shingle_width: int = 1, seed: int = 42):
    """Build a pandas UDF computing MinHash signatures over a token array.

    Coefficients are derived from ``seed`` at construction (never from wall
    clock), so a resumed streaming job recomputes identical signatures —
    required for deterministic checkpoint recovery.
    """
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE_P, size=num_hashes, dtype=np.int64)
    b = rng.integers(0, MERSENNE_P, size=num_hashes, dtype=np.int64)

    @F.pandas_udf(ArrayType(LongType()))
    def minhash_signature(tokens: pd.Series) -> pd.Series:
        out = []
        for toks in tokens:
            if toks is None or len(toks) == 0:
                out.append([0] * num_hashes)
                continue
            x = _shingle_hashes(list(toks), shingle_width)
            # (a*x + b) mod p, computed in object→int64-safe space:
            # a,x < 2^61, product fits in python ints; vectorize via float trick
            # is unsafe, so use int64 modmul decomposition.
            sig = _min_perm(x, a, b)
            out.append(sig.tolist())
        return pd.Series(out)

    return minhash_signature


def _min_perm(x: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """min over shingles of (a_i * x + b_i) mod p, exact (no overflow).

    x < 2^32, a < 2^61: split a into hi/lo 31-bit halves so every product
    stays under 2^63. All ops int64.
    """
    p = MERSENNE_P
    x = x.astype(np.int64) % p
    a_lo = a & ((1 << 31) - 1)
    a_hi = a >> 31
    # (a_hi*2^31 + a_lo) * x  mod p  ==  ((a_hi*x mod p) * 2^31 + a_lo*x) mod p
    hi = (a_hi[:, None] * x[None, :]) % p  # a_hi<2^30, x<2^32 → <2^62 OK
    lo = (a_lo[:, None] * x[None, :]) % p
    # hi*2^31 mod p without overflow: hi < p = 2^61-1 so hi<<31 would wrap
    # int64. Split hi = h1*2^30 + h0; since 2^61 ≡ 1 (mod p, Mersenne),
    # hi*2^31 ≡ h1 + (h0 << 31); h0 < 2^30 so every term stays < 2^61 and the
    # three-term sum < 3*2^61 < 2^63. Verified against big-int modmul in
    # tests/test_functions.py::test_min_perm_exact.
    hi_shifted = (hi >> 30) + ((hi & ((1 << 30) - 1)) << 31)
    v = (hi_shifted % p + lo + b[:, None]) % p
    return v.min(axis=1)


def make_simhash_udf(seed: int = 42):
    """64-bit SimHash fingerprint over a token array column."""

    @F.pandas_udf(LongType())
    def simhash64(tokens: pd.Series) -> pd.Series:
        out = np.zeros(len(tokens), dtype=np.int64)
        for i, toks in enumerate(tokens):
            if toks is None or len(toks) == 0:
                out[i] = 0
                continue
            votes = np.zeros(64, dtype=np.int64)
            shifts = np.arange(64, dtype=np.uint64)
            for t in toks:
                bs = t.encode("utf-8")
                h = np.uint64((zlib.crc32(bs) << 32) | zlib.crc32(bs + b"#"))
                bits = ((h >> shifts) & np.uint64(1)).astype(np.int64)
                votes += 2 * bits - 1
            fp = 0
            for bit in np.nonzero(votes > 0)[0]:
                fp |= 1 << int(bit)
            out[i] = fp - _MAX_I64 if fp >= _MAX_I64 else fp
        return pd.Series(out)

    return simhash64
