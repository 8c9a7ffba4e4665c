"""DuckDB-SQL fragments that mirror ``functions/text.py`` exactly.

The driver's correctness gate runs each Spark query side-by-side with an
ANSI-SQL oracle in DuckDB and hash-compares values, so every text transform
must have a bit-identical SQL twin. This module is the single source of truth
for those twins; any change to ``functions/text.py`` must be mirrored here
(and vice versa) — ``tests/test_sql_parity.py`` enforces it on samples.

Determinism notes:

* DuckDB ``regexp_replace`` needs the ``'g'`` flag to match Spark's
  replace-all default.
* Similarities are emitted as integer millionths (``sim_e6``) because float
  ``round`` dialects differ; ``floor(x*1e6+0.5)`` is exact IEEE both sides.
* Trigram counts / set sizes are integers, so cosine/jaccard doubles are
  bit-identical across engines before the millionths conversion.
"""

from __future__ import annotations


def norm_sql(col: str) -> str:
    return (
        "trim(regexp_replace(regexp_replace(lower(" + col + "), "
        "'[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"
    )


def tokens_sql(col: str) -> str:
    return f"list_filter(string_split({norm_sql(col)}, ' '), t -> t <> '')"


def blocking_key_sql(col: str, length: int = 4) -> str:
    norm = norm_sql(col)
    nothe = f"CASE WHEN starts_with({norm}, 'the ') THEN substr({norm}, 5) ELSE {norm} END"
    return f"rpad(substr(replace({nothe}, ' ', ''), 1, {length}), {length}, '#')"


def trigrams_sql(norm_col: str) -> str:
    """Padded 3-grams of an already-normalized string ('##' both sides)."""
    p = f"('##' || {norm_col} || '##')"
    return f"[substr({p}, CAST(i AS INT), 3) for i in range(1, len({p}) - 1)]"


def token_jaccard_sql(a_toks: str, b_toks: str) -> str:
    inter = f"len(list_intersect(list_distinct({a_toks}), list_distinct({b_toks})))"
    union = f"len(list_distinct(list_concat({a_toks}, {b_toks})))"
    return f"(CASE WHEN {union} = 0 THEN 0.0 ELSE CAST({inter} AS DOUBLE) / {union} END)"


def sim_e6_sql(sim_expr: str) -> str:
    return f"CAST(floor(({sim_expr}) * 1000000.0 + 0.5) AS BIGINT)"
