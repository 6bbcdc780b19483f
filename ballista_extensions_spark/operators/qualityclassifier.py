"""Quality-classifier gate: a frozen hashed-bag-of-words linear scorer
(VERDICT r12 directive #3) — the DCLM/CCNet-style curation stage where
a trained classifier, not a rule cascade, decides which documents pass
(Computer et al., DataComp-LM arXiv:2406.11794 §4.4; Wenzek et al.,
CCNet arXiv:1911.00359 §4.3 use fastText linear classifiers the same
way). The model here is deliberately that exact shape: token ->
feature-hash -> one weight lookup, mean-pooled, plus bias = the logit;
the gate is ``logit >= 0``.

All JVM built-ins, zero Python in the hot path: tokens come from the
shared ``'#'``-normalization split, each token's feature index is a
polynomial rolling hash over its characters (base 31 mod 1000003 —
the ``fingerprint_rolling`` arithmetic, every intermediate < 2^63)
folded down to ``N_FEATURES`` buckets, and the weight table rides the
plan as ONE shared array literal (the ``_cents_lit`` broadcast
discipline — O(N_FEATURES) literals shipped once per task closure,
never per row). A production deployment at a real vocabulary swaps
the polynomial hash for ``xxhash64(token)`` one-lined; the polynomial
form is used here because the driver's DuckDB oracle must replay the
hash+dot arithmetic bit-for-bit and xxhash64 has no DuckDB twin.

The frozen weights live in source like the BPE merge list: trained by
``tools/train_quality_weights.py`` (deterministic full-batch logistic
regression distilling the Gopher/C4 stopword-density heuristic on the
sf0.01 corpus, weights rounded to 6 decimals) and pinned to that
script's output by tests/test_qualityclassifier.py. No sigmoid in the
scored output: sigmoid is monotone, so the gate thresholds the logit
directly and the cross-engine hash never touches a transcendental.

Scale: one narrow codegen'd projection — cost ∝ corpus tokens, no
shuffle, no driver state, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BASE = 31
PRIME = 1_000_003
N_FEATURES = 257
#: the rule the frozen model distills (C4/Gopher stopword density;
#: only 'the' and 'a' occur in the driver corpus, the rest keep the
#: list honest for real corpora)
STOPWORDS = frozenset({"the", "a", "of", "and", "to", "in", "is"})

_WORDS_SQL = (
    "filter(split(lower(regexp_replace(coalesce({col}, ''), "
    "'[^a-zA-Z0-9]+', '#')), '#'), w -> w != '')"
)
_WORDS_DUCK = (
    "list_filter(string_split(lower(regexp_replace(coalesce({col}, ''), "
    "'[^a-zA-Z0-9]+', '#', 'g')), '#'), w -> w <> '')"
)


def hash_token(w: str) -> int:
    """Python mirror of the SQL feature hash (training + tests)."""
    acc = 0
    for ch in w:
        acc = (acc * BASE + ord(ch)) % PRIME
    return acc % N_FEATURES


def _weights_lit_spark(weights: tuple[float, ...]) -> str:
    return (
        "array("
        + ", ".join(f"CAST({float(v)!r} AS DOUBLE)" for v in weights)
        + ")"
    )


def _weights_lit_duck(weights: tuple[float, ...]) -> str:
    return (
        "["
        + ", ".join(f"CAST({float(v)!r} AS DOUBLE)" for v in weights)
        + "]"
    )


def quality_logit_sql(
    col_sql: str,
    weights: tuple[float, ...] | None = None,
    bias: float | None = None,
) -> str:
    """Spark SQL fragment: the classifier logit for a text expression.
    ``bias + mean over tokens of W[hash(token)]``; documents with no
    tokens score the bare bias."""
    w = FROZEN_QUALITY_WEIGHTS if weights is None else weights
    b = FROZEN_QUALITY_BIAS if bias is None else bias
    words = _WORDS_SQL.format(col=col_sql)
    tok_hash = (
        f"CAST(aggregate(transform(split(t, ''), c -> ascii(c)), 0L, "
        f"(a2, x) -> (a2 * {BASE} + x) % {PRIME}) % {N_FEATURES} AS INT)"
    )
    wsum = (
        f"aggregate({words}, CAST(0 AS DOUBLE), "
        f"(acc, t) -> acc + element_at({_weights_lit_spark(w)}, "
        f"{tok_hash} + 1))"
    )
    return (
        f"CASE WHEN size({words}) = 0 THEN CAST({float(b)!r} AS DOUBLE) "
        f"ELSE CAST({float(b)!r} AS DOUBLE) "
        f"+ {wsum} / CAST(size({words}) AS DOUBLE) END"
    )


def quality_logit_sql_duckdb(
    col_sql: str,
    weights: tuple[float, ...] | None = None,
    bias: float | None = None,
    table_ref: str | None = None,
) -> str:
    """The identical hash+dot arithmetic in DuckDB spelling — the
    oracle generator (same left-fold order, same literals).
    ``table_ref`` names a column holding the weights array (1-row CTE,
    CROSS JOINed) so DuckDB doesn't rebuild the 257-double literal per
    token — same hoisting as dsir.feature_fold_sql_duckdb (VERDICT
    r13 #4), bit-identical results."""
    w = FROZEN_QUALITY_WEIGHTS if weights is None else weights
    b = FROZEN_QUALITY_BIAS if bias is None else bias
    words = _WORDS_DUCK.format(col=col_sql)
    wlit = table_ref if table_ref is not None else _weights_lit_duck(w)
    tok_hash = (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(generate_series(1, length(t)), "
        f"i -> CAST(ascii(t[i]) AS BIGINT))), "
        f"(a2, x) -> (a2 * {BASE} + x) % {PRIME}) % {N_FEATURES}"
    )
    wsum = (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform({words}, t -> {wlit}"
        f"[{tok_hash} + 1])), (acc, x) -> acc + x)"
    )
    return (
        f"CASE WHEN len({words}) = 0 THEN CAST({float(b)!r} AS DOUBLE) "
        f"ELSE CAST({float(b)!r} AS DOUBLE) "
        f"+ {wsum} / CAST(len({words}) AS DOUBLE) END"
    )


def quality_scores(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    weights: tuple[float, ...] | None = None,
    bias: float | None = None,
) -> DataFrame:
    """(doc_id, n_words, logit, passes): the classifier gate over a
    corpus — one codegen'd narrow pass, the broadcast-weights plan
    shape (module docstring)."""
    words = _WORDS_SQL.format(col=text_col)
    logit = quality_logit_sql(text_col, weights, bias)
    return docs.select(
        F.col(id_col),
        F.expr(f"size({words})").cast("long").alias("n_words"),
        F.expr(logit).alias("logit"),
        (F.expr(logit) >= 0).alias("passes"),
    )


# Frozen model: tools/train_quality_weights.py on sf0.01 documents —
# regenerated and asserted identical by tests/test_qualityclassifier.py
# ::test_frozen_weights_reproduce. Train accuracy vs the stopword-
# median label is printed by the tool and pinned (>= 0.95) in the same
# test file.
FROZEN_QUALITY_BIAS = 0.297758
FROZEN_QUALITY_WEIGHTS: tuple[float, ...] = (
    0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, -5.754154, 0.0,
    0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, -5.703439, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0, 0.0, -4.286359, 0.0, 0.0, 0.0, 0.0, -3.35206,
    0.0, 0.0, 0.0, -4.118713, 0.0, 0.0, 0.0, -1.125607, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, -5.006039, 0.0, 0.0, 0.0,
    -4.644334, 0.0, 0.0, -0.48018, 0.0, 0.0, 0.0, -2.851238,
    -3.377404, 0.0, 0.0, 0.0, 0.0, -0.118357, 0.0, 0.0, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 49.267934, 0.0, 0.0, 0.0, 0.0,
    -4.856825, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, -1.552845,
    -4.989002, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, -7.543887, 0.0,
    -0.363187, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, -7.579781,
    -4.073489, 0.0, 0.0, 0.0, 0.0, -0.442135, 0.0, 0.0, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0, -0.73051, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
    0.0, 0.991556, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.100577, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, -5.00229, 0.0, 0.0, 0.0,
    50.558965, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, -3.102904, 0.0, 0.0,
    -4.471548, 0.0, 0.0, 0.0, 0.0, 0.0, -10.276877, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
    -5.385419, 0.0, 0.0, 0.0, 0.567309, 0.0
)
