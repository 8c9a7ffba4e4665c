"""Text normalization / tokenization / blocking-key column expressions.

All functions here are **native Catalyst expressions** (JVM-side, inside
whole-stage codegen) — no Python in the hot path. Each has an exactly
matching DuckDB SQL fragment in ``functions/sqlgen.py`` used by the
correctness oracle; keep the two in lockstep.

Semantics follow the reference:

* ``normalize_text`` — the reference's ``simplify`` (lowercase, punctuation →
  space, collapse whitespace, trim; ``util/Utils.java:832-851``).
* ``blocking_key`` — sorted-neighborhood prefix key: strip leading "the ",
  remove spaces, first-N chars padded with '#'
  (``util/Utils.java:682-732`` music key, ``util/Utils.java:805-825`` geo
  padding).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_text(col: Column) -> Column:
    """lowercase, non-alnum → space, collapse runs of spaces, trim.

    Formulated as split-on-non-alnum-runs + join rather than two
    ``regexp_replace`` passes: identical output (pinned by
    ``tests/test_functions.py::test_normalize_parity`` against the oracle's
    regex form and verified on the full sf0.5 corpus), but ~8x faster —
    Spark's regexp_replace rebuilds the string once per match (one per
    punctuation char), while split scans once. This is the hottest scalar
    expression in the engine (every record's doc/label/early turns).
    """
    c = F.lower(col)
    return F.array_join(
        F.filter(F.split(c, "[^a-z0-9]+"), lambda x: x != F.lit("")), " "
    )


def tokens(col: Column) -> Column:
    """Whitespace tokens of normalized text, empty tokens removed."""
    return F.filter(F.split(normalize_text(col), " "), lambda t: t != F.lit(""))


def distinct_tokens(col: Column) -> Column:
    """Token *set* (order unspecified — use only for set-size math)."""
    return F.array_distinct(tokens(col))


# GPT-2/cl100k-style pre-tokenizer grammar, restricted to the regex subset
# that Java (Spark) and RE2 (DuckDB, the oracle engine) match identically:
# contraction suffixes, space-prefixed letter runs, 1-3-digit groups
# (cl100k splits long numbers), space-prefixed punctuation runs, residual
# space runs. Leftmost-first alternation in both engines.
BPE_ISH_PATTERN = (
    "'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]{1,3}| ?[^a-zA-Z0-9 ]+| +"
)


def bpe_ish_tokens(col: Column) -> Column:
    """BPE-ish subword pre-tokens of the RAW text (no normalization — the
    grammar itself handles case/punctuation/digits), as an array column.

    This is the counting half of a byte-pair tokenizer: the pre-tokenizer
    split dominates token-count statistics (merges only shrink counts
    within a pre-token), so for corpus sizing / cost estimation it is the
    number that matters, and it stays pure Catalyst."""
    return F.regexp_extract_all(col, F.lit(BPE_ISH_PATTERN), 0)


def blocking_key(col: Column, length: int = 4) -> Column:
    """Prefix blocking key over normalized text.

    Strip leading "the ", drop spaces, take first ``length`` chars, pad with
    '#'. Matches reference ``Utils.getBlockingKey`` semantics.
    """
    norm = normalize_text(col)
    nothe = F.when(norm.startswith("the "), F.substring(norm, 5, 2_000_000)).otherwise(norm)
    nospace = F.replace(nothe, F.lit(" "), F.lit(""))
    return F.rpad(F.substring(nospace, 1, length), length, "#")


def token_set_jaccard(a_tokens: Column, b_tokens: Column) -> Column:
    """Jaccard over token *sets* — exact (integer set sizes → deterministic).

    Inputs must already be distinct arrays (every caller passes
    ``array_distinct`` output): |a ∪ b| = |a| + |b| − |a ∩ b| then needs only
    the intersect pass — array_union built a second hash set per pair and
    was ~2x the cost of this formulation in the scoring hot path.
    """
    inter = F.size(F.array_intersect(a_tokens, b_tokens))
    union = F.size(a_tokens) + F.size(b_tokens) - inter
    return F.when(union == 0, F.lit(0.0)).otherwise(
        inter.cast("double") / union.cast("double")
    )


def sim_e6(sim: Column) -> Column:
    """Similarity as integer millionths: floor(sim*1e6 + 0.5).

    Used for oracle-checked outputs: floor/multiply are exact IEEE ops, so
    Spark and DuckDB produce bit-identical integers (double `round` dialects
    differ in half-way tie handling; this formula is engine-independent).
    Mirrors the reference's 6-dp HALF_UP discipline
    (``util/Utils.java:477-490``).
    """
    return F.floor(sim * F.lit(1_000_000.0) + F.lit(0.5)).cast("long")
