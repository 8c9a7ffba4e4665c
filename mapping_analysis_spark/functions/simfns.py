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


@F.pandas_udf(DoubleType())
def trigram_cosine(a: pd.Series, b: pd.Series) -> pd.Series:
    out = np.empty(len(a), dtype=np.float64)
    for i, (x, y) in enumerate(zip(a, b)):
        if x is None or y is None:
            out[i] = 0.0
            continue
        ca = _padded_trigrams(x)
        cb = _padded_trigrams(y)
        dot = sum(c * cb[t] for t, c in ca.items())
        if dot == 0:
            out[i] = 0.0
            continue
        na = sum(c * c for c in ca.values())
        nb = sum(c * c for c in cb.values())
        out[i] = float(dot) / float(np.sqrt(float(na) * float(nb)))
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
