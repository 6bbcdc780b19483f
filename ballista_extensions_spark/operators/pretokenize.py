"""Byte-level (GPT-2 style) pre-tokenization — the production
tokenizer's first stage: split text into contraction / letter-run /
digit-run / punctuation-run / whitespace-run segments BEFORE BPE, so
merges can never cross a word or class boundary.

The pattern is the GPT-2 shape (contraction suffixes, space-prefixed
letter/digit/other runs, whitespace runs) MINUS the trailing
``\\s+(?!\\S)`` lookahead: lookahead is not RE2-expressible, and this
repo keeps every pattern in the Java-regex/RE2 common subset so the
DuckDB oracle runs the IDENTICAL pattern (same discipline as
operators/text.py:BPE_PATTERN). Consequence (documented, pinned by
tests): a run of 2+ spaces before a word is one whitespace segment and
the word carries no space prefix, where GPT-2 would attach the last
space to the word. The whitespace class is written out explicitly
(``[ \\t\\n\\r\\f\\x0B]``) because Java's ``\\s`` and RE2's ``\\s``
disagree on ``\\x0B``.

Three engines, one segmentation, property-tested against each other on
adversarial unicode (tests/test_pretokenize.py):

- Spark: JVM-side ``regexp_extract_all`` (codegen'd, narrow, no UDF);
- DuckDB: ``regexp_extract_all`` with the same pattern string;
- Python: a linear scanner over ``unicodedata`` categories (the
  Arrow-batched applier's pre-split stage — ``regex``'s ``\\p{L}`` has
  no stdlib-re equivalent, and a scanner is exactly equivalent to this
  lookahead-free alternation).

Scale: pre-tokenization is a per-row projection — zero shuffle, whole-
stage codegen; the per-document segment signature (polyhash of the
segment-length sequence) pins the exact boundaries so the oracle
grades segmentation itself, not just counts.
"""

from __future__ import annotations

import unicodedata

from ballista_extensions_spark.operators.shards import (
    polyhash_sql_duckdb,
    polyhash_sql_spark,
)

__all__ = [
    "PRETOK_PATTERN",
    "py_pretok_segments",
    "pretok_segments_sql_duckdb",
    "pretok_segments_sql_spark",
]

_WS = " \t\n\r\f\x0B"
_WS_CLASS = r" \t\n\r\f\x0B"
_CONTRACTIONS = ("s", "t", "ll", "ve", "re", "d", "m")

#: the lookahead-free GPT-2 pattern, Java-regex/RE2 common subset
PRETOK_PATTERN = (
    r"'(?:s|t|ll|ve|re|d|m)"
    r"| ?\p{L}+"
    r"| ?\p{N}+"
    rf"| ?[^{_WS_CLASS}\p{{L}}\p{{N}}]+"
    rf"|[{_WS_CLASS}]+"
)


def _sql_quote(pat: str) -> str:
    return pat.replace("\\", "\\\\").replace("'", "\\'")


def pretok_segments_sql_spark(col: str) -> str:
    """Spark SQL fragment: the full segment array (whitespace runs
    included — the segmentation is total: concat(segments) == text)."""
    return f"regexp_extract_all({col}, '{_sql_quote(PRETOK_PATTERN)}', 0)"


def pretok_segments_sql_duckdb(col: str) -> str:
    """DuckDB spelling of the identical segmentation. DuckDB string
    literals do not process backslash escapes, so the pattern embeds
    single backslashes."""
    pat = PRETOK_PATTERN.replace("'", "''")
    return f"regexp_extract_all({col}, '{pat}')"


def seg_sig_sql_spark(segs_sql: str) -> str:
    """Order-sensitive signature of a segmentation: polyhash of the
    comma-joined segment-length sequence. Lengths + total content
    determine the boundaries exactly, so equal signatures mean equal
    segmentation."""
    lens = (
        f"array_join(transform({segs_sql}, "
        f"x -> CAST(length(x) AS STRING)), ',')"
    )
    return polyhash_sql_spark(lens)


def seg_sig_sql_duckdb(segs_sql: str) -> str:
    lens = (
        f"array_to_string(list_transform({segs_sql}, "
        f"x -> CAST(length(x) AS VARCHAR)), ',')"
    )
    return polyhash_sql_duckdb(lens)


def py_pretok_segments(text: str) -> list[str]:
    """Pure-Python scanner equivalent to :data:`PRETOK_PATTERN`'s
    leftmost-first alternation (property-tested against both SQL
    engines). Linear in the text length."""
    if not text:
        return []
    segs: list[str] = []
    i, n = 0, len(text)

    def _cat(ch: str) -> str:
        return unicodedata.category(ch)[0]

    while i < n:
        ch = text[i]
        # 1) contraction suffixes, alternation order s|t|ll|ve|re|d|m
        if ch == "'":
            hit = None
            for suf in _CONTRACTIONS:
                if text.startswith(suf, i + 1):
                    hit = suf
                    break
            if hit is not None:
                segs.append("'" + hit)
                i += 1 + len(hit)
                continue
        # 2-4) optionally space-prefixed class runs
        j = i
        if ch == " " and i + 1 < n:
            j = i + 1
        c0 = text[j] if j < n else ""
        if c0 and c0 not in _WS:
            k = _cat(c0)
            if k in ("L", "N"):
                e = j + 1
                while e < n and _cat(text[e]) == k:
                    e += 1
                segs.append(text[i:e])
                i = e
                continue
            # punctuation/other run: anything not WS, not L, not N
            e = j
            while (
                e < n
                and text[e] not in _WS
                and _cat(text[e]) not in ("L", "N")
            ):
                e += 1
            if e > j:
                segs.append(text[i:e])
                i = e
                continue
        # 5) whitespace run (also the lone trailing space)
        if ch in _WS:
            e = i + 1
            while e < n and text[e] in _WS:
                e += 1
            segs.append(text[i:e])
            i = e
            continue
        # unreachable for well-formed input: every char is WS, L, N or
        # other — defensively emit the char alone
        segs.append(ch)
        i += 1
    return segs


_ALNUM = frozenset("abcdefghijklmnopqrstuvwxyz0123456789")


def py_pretok_words(text: str) -> list[str]:
    """The applier's optional pre-split stage: GPT-2 segments, then the
    stream normalization (lowercase, ASCII-alnum only, empties
    dropped) — finer word boundaries than the bare ``#`` splitter
    (contractions split off, letter/digit runs separate), feeding the
    same chunk machinery."""
    out = []
    for seg in py_pretok_segments(text):
        w = "".join(c for c in seg.lower() if c in _ALNUM)
        if w:
            out.append(w)
    return out
