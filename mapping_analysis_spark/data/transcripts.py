"""Deterministic synthetic transcripts table (the engine's primary input).

Schema is fixed by the driver contract (BASELINE.json input_hint):

    conv_id: string, turn_idx: int32, role: string,
    text: string, tool: string (nullable), ts: timestamp

Fixture properties mirror the reference's test corpora (FIXTURES.md):

* **Planted duplicate groups** — each logical *entity* e is emitted as 1..5
  conversation copies ``e{e:06d}_s{source}`` whose per-turn text is a
  typo-corrupted variant of a common template (GeCo-style corruption, cf.
  reference ``corruption/EdgeRemoveCorruptionFunction.java:19-31`` robustness
  fixtures). The hidden gold entity id is recoverable from the conv_id prefix,
  giving a pair-level P/R/F1 oracle exactly like the reference's
  ``util/QualityUtils.java:385-403``.
* **Multi-source structure** — the ``_s{n}`` suffix plays the role of the
  reference's dataSource (``util/Constants.java:330-335``); copies of one
  entity never share a source, so merge restrictions (no source overlap,
  source count <= 5, ``CheckRestrictionsFilterFunction.java:48-52``) are
  exercised.
* **Skew** — one mega-conversation holds ~2% of all turns (hot conv_id), a
  dominant ``tool`` value covers ~60% of tool turns, and ~1/23 of entities
  share one blocking prefix (hot block → drives the salting path, the
  BlockSplit analogue).
* **Late data** — ~5% of rows carry a ts one hour older than their slot
  (watermark fixtures).

Everything is seeded (seed=42, numpy PCG64 → platform-stable); the table is
cached as parquet under ``<repo>/_synth/sf*/`` and both the Spark engine and
the DuckDB oracle read the *same file*, so correctness comparisons are exact.
"""

from __future__ import annotations

import os
from datetime import datetime, timezone

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
SYNTH_ROOT = os.path.join(_REPO_ROOT, "_synth")
if ".zip" in _REPO_ROOT:
    # running from a spark-submit --py-files archive: the package dir is not
    # writable — cache synthetic data under a stable tmp path instead
    SYNTH_ROOT = os.environ.get("SPARK_GRAFT_SYNTH_DIR", "/tmp/mapping_analysis_synth")

# Deterministic ~20k-word vocabulary with Zipfian sampling (heavy-tailed like
# real text — no external data). A tiny flat vocab makes every document pair
# spuriously similar, which no real transcript corpus exhibits.
_SYL_A = ["ba", "ce", "di", "fo", "gu", "ha", "ke", "li", "mo", "nu", "pa", "qo", "ru", "sa", "te", "vi", "wo", "xu", "ya", "ze"]
_SYL_B = ["ra", "se", "ti", "vo", "wu", "la", "mi", "no", "pe", "ki", "du", "fa", "go", "hu", "je", "ne", "ro", "su", "tu", "za"]
_SYL_C = ["", "n", "r", "s", "m"]
VOCAB = [a + b + c + d for a in _SYL_A for b in _SYL_B for c in _SYL_B[:10] for d in _SYL_C][:20000]
# Zipf CDF (s ≈ 1.05, shifted) for rank-frequency sampling
_ranks = np.arange(1, len(VOCAB) + 1, dtype=np.float64)
_weights = 1.0 / (_ranks + 5.0) ** 1.05
_ZIPF_CDF = np.cumsum(_weights / _weights.sum())


def _sample_words(rng: np.random.Generator, k: int) -> list[str]:
    idx = np.searchsorted(_ZIPF_CDF, rng.random(k))
    return [VOCAB[int(i)] for i in idx]

TOOLS = ["search", "search", "search", "browse", "exec", "fetch", "calc"]  # 'search' dominant
ROLES = ["user", "assistant"]

_BASE_TS = int(datetime(2024, 1, 1, tzinfo=timezone.utc).timestamp())


def _n_entities(sf: float) -> int:
    return max(24, int(round(100_000 * sf)))


def _typo(word: str, rng: np.random.Generator) -> str:
    """One seeded character-level corruption (swap / drop / duplicate)."""
    if len(word) < 2:
        return word + "x"
    op = rng.integers(0, 3)
    i = int(rng.integers(0, len(word) - 1))
    if op == 0:  # swap adjacent
        return word[:i] + word[i + 1] + word[i] + word[i + 2 :]
    if op == 1:  # drop
        return word[:i] + word[i + 1 :]
    return word[:i] + word[i] + word[i:]  # duplicate


def _corrupt_text(words: list[str], rng: np.random.Generator) -> list[str]:
    out: list[str] = []
    for w in words:
        r = rng.random()
        if r < 0.06:  # drop word
            continue
        if r < 0.16:  # typo
            out.append(_typo(w, rng))
        else:
            out.append(w)
        if rng.random() < 0.03:  # insert noise word
            out.extend(_sample_words(rng, 1))
    if not out:
        out = [words[0]]
    return out


def generate_transcripts(sf: float, seed: int = SEED) -> pa.Table:
    """Generate the transcripts table for a scale factor. Pure + deterministic."""
    rng = np.random.default_rng(seed)
    n_entities = _n_entities(sf)

    conv_ids: list[str] = []
    turn_idxs: list[int] = []
    roles: list[str] = []
    texts: list[str] = []
    tools: list[str | None] = []
    tss: list[int] = []  # epoch micros

    def emit(conv: str, turn: int, role: str, text: str, tool: str | None, ts_s: float) -> None:
        conv_ids.append(conv)
        turn_idxs.append(turn)
        roles.append(role)
        texts.append(text)
        tools.append(tool)
        tss.append(int(ts_s * 1_000_000))

    for e in range(n_entities):
        n_turns = int(rng.integers(4, 13))
        hot_block = e % 23 == 0  # ~4% of entities share one blocking prefix
        # Entity anchor tokens: distinctive content words (names/ids) that
        # recur across the entity's turns — what real dedup keys on.
        anchors = [f"ent{e}x{i}" for i in range(3)]
        # Per-turn template: list of words + role + tool slot.
        turn_words: list[list[str]] = []
        turn_roles: list[str] = []
        turn_tools: list[str | None] = []
        for t in range(n_turns):
            k = int(rng.integers(6, 17))
            words = _sample_words(rng, k)
            if rng.random() < 0.6:  # sprinkle 1-2 anchors into most turns
                pos = int(rng.integers(0, len(words)))
                words[pos] = anchors[int(rng.integers(0, 3))]
            if t == 0 and hot_block:
                words = ["common", "request"] + words[2:]
            if rng.random() < 0.15:
                turn_roles.append("tool")
                turn_tools.append(TOOLS[int(rng.integers(0, len(TOOLS)))])
            else:
                turn_roles.append(ROLES[t % 2])
                turn_tools.append(None)
            turn_words.append(words)

        # 1..5 source copies, distinct sources (no source overlap within entity)
        n_copies = int(rng.choice([1, 2, 3, 4, 5], p=[0.25, 0.30, 0.20, 0.15, 0.10]))
        sources = list(rng.choice(np.arange(1, 6), size=n_copies, replace=False))
        base_ts = _BASE_TS + e * 37
        for source in sources:
            conv = f"e{e:06d}_s{int(source)}"
            for t in range(n_turns):
                words = turn_words[t]
                if int(source) != int(sources[0]):
                    words = _corrupt_text(words, rng)
                ts_s = base_ts + int(source) * 13 + t * 20
                if rng.random() < 0.05:
                    ts_s -= 3600  # late event
                emit(conv, t, turn_roles[t], " ".join(words), turn_tools[t], ts_s)

    # Mega-conversation: ~2% of all turns under a single hot conv_id.
    mega_turns = max(64, int(0.02 * len(conv_ids)))
    for t in range(mega_turns):
        k = int(rng.integers(4, 9))
        words = _sample_words(rng, k)
        role = "tool" if t % 3 == 2 else ROLES[t % 2]
        tool = "search" if role == "tool" else None
        emit("mega_s1", t, role, " ".join(words), tool, _BASE_TS + t * 2)

    return pa.table(
        {
            "conv_id": pa.array(conv_ids, pa.string()),
            "turn_idx": pa.array(turn_idxs, pa.int32()),
            "role": pa.array(roles, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array(tools, pa.string()),
            "ts": pa.array(tss, pa.timestamp("us")),
        }
    )


def _sf_from_dir(sf_dir: str) -> float:
    name = os.path.basename(os.path.normpath(sf_dir))
    if name.startswith("sf"):
        return float(name[2:])
    raise ValueError(f"cannot infer scale factor from {sf_dir!r}")


def transcripts_path(sf_dir: str) -> str:
    name = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(SYNTH_ROOT, name, "transcripts.parquet")


def ensure_transcripts(sf_dir: str) -> str:
    """Generate-if-missing the transcripts parquet for a testdata sf dir."""
    path = transcripts_path(sf_dir)
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        table = generate_transcripts(_sf_from_dir(sf_dir))
        tmp = path + ".tmp"
        pq.write_table(table, tmp)
        os.replace(tmp, path)  # atomic — safe under concurrent ensure calls
    return path
