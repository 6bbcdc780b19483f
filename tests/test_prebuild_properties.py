"""Property tests for the late-r16 pre-builds: independent
pure-Python references checked bit-exactly against the Spark
operators on hypothesis-generated adversarial inputs.

The references mirror the operators' EXPRESSION TREES (same
association order, same IEEE-754 double ops), so equality is exact
``==`` — any drift between the engines' regex/arithmetic semantics
and the documented contracts surfaces as a counterexample, not an
epsilon tweak.
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings, strategies as st

from ballista_extensions_spark.operators import postingstore as PS
from ballista_extensions_spark.operators.text import (
    line_repetition_stats,
)

# the operator's alphabet of interest: unit content, every trim-class
# char, and both separators
_ALPHA = "ab x\t\r\x0b\x0c\n"
_TRIM = r"^[ \t\x0B\f\r]+|[ \t\x0B\f\r]+$"
_PARA = r"\n[ \t\n\x0B\f\r]*\n"


def _line_rep_reference(text: str):
    """Pure-Python mirror of line_repetition_stats for one doc."""

    def units(parts):
        out = []
        for p in parts:
            p = re.sub(_TRIM, "", p)
            if len(p) > 0:
                out.append(p)
        return out

    ls = units(text.split("\n"))
    if not ls:
        return None
    ps = units(re.split(_PARA, text))

    def dedup(seq):
        seen, out = set(), []
        for s in seq:
            if s not in seen:
                seen.add(s)
                out.append(s)
        return out

    ld, pd = dedup(ls), dedup(ps)

    def chars(seq):
        acc = 0
        for s in seq:
            acc = acc + len(s)
        return acc

    return (
        len(ls),
        len(ps),
        1.0 - float(len(ld)) / float(len(ls)),
        1.0 - (float(chars(ld)) / float(chars(ls))),
        1.0 - float(len(pd)) / float(len(ps)),
        1.0 - (float(chars(pd)) / float(chars(ps))),
    )


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    st.lists(
        st.text(alphabet=_ALPHA, min_size=0, max_size=60),
        min_size=1,
        max_size=25,
    )
)
def test_line_repetition_matches_reference(spark, texts):
    df = spark.createDataFrame(
        list(enumerate(texts)), ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: (
            r["n_lines"],
            r["n_paragraphs"],
            r["dup_line_frac"],
            r["dup_line_char_frac"],
            r["dup_para_frac"],
            r["dup_para_char_frac"],
        )
        for r in line_repetition_stats(df).collect()
    }
    want = {
        i: ref
        for i, t in enumerate(texts)
        if (ref := _line_rep_reference(t)) is not None
    }
    assert got == want


def _bm25_reference(docs, terms, k):
    """Pure-Python mirror of the store probe's expression tree:
    same association order as bm25_score_sql + the sorted-term fold
    (terms must be passed sorted, as the equality tests do)."""
    tok = {i: re.split(r"[ \t\n\x0b\x0c\r]+", t) for i, t in docs}
    n = float(len(tok))
    sum_dl = sum(len(v) for v in tok.values())
    avgdl = float(sum_dl) / n
    df = {
        t: sum(1 for v in tok.values() if t in v) for t in terms
    }
    k1, b = 1.2, 0.75
    out = []
    for i, v in tok.items():
        total, n_terms = 0.0, 0
        for t in terms:  # sorted fold order
            tf = sum(1 for w in v if w == t)
            if tf == 0:
                continue
            n_terms += 1
            idf = ((n - float(df[t])) + 0.5) / (float(df[t]) + 0.5)
            dl = float(len(v))
            score = idf * (
                (float(tf) * (k1 + 1.0))
                / (float(tf) + (k1 * ((1.0 - b) + (b * (dl / avgdl)))))
            )
            total = total + score
        if n_terms:
            out.append((i, n_terms, total))
    out.sort(key=lambda r: (-r[2], r[0]))
    return [
        (i, nt, s, rank + 1)
        for rank, (i, nt, s) in enumerate(out[:k])
    ]


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["red", "blue", "green", "gold"]),
            min_size=1,
            max_size=12,
        ).map(" ".join),
        min_size=2,
        max_size=12,
    ),
    st.sets(
        st.sampled_from(["red", "blue", "green", "gold"]),
        min_size=1,
        max_size=3,
    ),
)
def test_bm25_store_matches_reference(spark, texts, termset):
    terms = tuple(sorted(termset))
    docs = list(enumerate(texts))
    table = "postings_prop_store"
    try:
        PS.build_posting_store(
            spark.createDataFrame(docs, ["doc_id", "text"]),
            table,
            buckets=4,
        )
        got = [
            (r["doc_id"], r["n_terms"], r["bm25"], r["rank"])
            for r in PS.bm25_from_store(
                spark, table, terms, k=8
            ).collect()
        ]
        assert got == _bm25_reference(docs, terms, 8)
    finally:
        PS.drop_posting_store(spark, table)
