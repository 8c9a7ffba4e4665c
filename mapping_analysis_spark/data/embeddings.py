"""Derived embeddings table with planted near-duplicates.

The driver's synthetic ``embeddings.parquet`` is ~uniform random vectors —
its pairwise cosines top out at ~0.5, so it contains no near-duplicates and
cannot exercise a near-dup detector at a realistic threshold. This module
derives (deterministically, seed fixed) an augmented table BOTH engines read
from one shared parquet, same trick as the transcripts table:

* every base vector keeps its vec_id;
* every vec_id % 4 == 0 gains a planted near-duplicate with id
  ``vec_id + 1_000_000``: the base vector plus 5% Gaussian noise, i.e.
  cosine ≈ 0.995 — firmly above the 0.9 query threshold, while all
  non-planted pairs stay below ~0.5. That similarity gap is what makes the
  LSH candidate stage's recall empirically exact (see
  ``operators/dedup.embedding_neardup``).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from mapping_analysis_spark.data.transcripts import SYNTH_ROOT


def ensure_neardup_embeddings(sf_dir: str, seed: int = 42) -> str:
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    out = os.path.join(SYNTH_ROOT, sf_name, "embeddings_nd.parquet")
    if os.path.exists(out):
        return out
    base = pd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    rng = np.random.default_rng(seed)
    rows_id = []
    rows_vec = []
    for vec_id, emb in zip(base["vec_id"], base["embedding"]):
        v = np.asarray(emb, dtype=np.float32)
        rows_id.append(int(vec_id))
        rows_vec.append(v)
        if int(vec_id) % 4 == 0:
            noise = rng.standard_normal(len(v)).astype(np.float32)
            dup = v + 0.05 * np.linalg.norm(v) * noise / np.linalg.norm(noise)
            rows_id.append(int(vec_id) + 1_000_000)
            rows_vec.append(dup.astype(np.float32))
    df = pd.DataFrame({"vec_id": rows_id, "embedding": [list(map(float, v)) for v in rows_vec]})
    os.makedirs(os.path.dirname(out), exist_ok=True)
    tmp = out + ".tmp"
    df.to_parquet(tmp, index=False)
    os.replace(tmp, out)
    return out
