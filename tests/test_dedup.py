"""Dedup operator tests: exact on constructed dups, MinHash/SimHash
recall against the exact Jaccard baseline on the driver corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ballista_extensions_spark.operators import dedup as D


@pytest.fixture(scope="module")
def dup_docs(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha beta gamma delta epsilon"),       # exact dup of 1
        (3, "Alpha  beta GAMMA delta epsilon"),      # normalized dup of 1
        (4, "completely different text entirely here"),
        (5, "alpha beta gamma delta zeta"),          # near dup of 1
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_dedup_exact(dup_docs):
    res = {r.keep_id: r.n_copies for r in D.dedup_exact(dup_docs).collect()}
    assert res[1] == 2          # docs 1+2 collapse
    assert res[3] == 1          # case difference survives exact mode
    assert len(res) == 4


def test_dedup_exact_normalized(dup_docs):
    res = {r.keep_id: r.n_copies for r in D.dedup_exact(dup_docs, normalized=True).collect()}
    assert res[1] == 3          # docs 1+2+3 collapse after normalization
    assert len(res) == 3


def test_near_dup_exact_pairs(spark):
    rows = [
        (0, "one two three four five six seven"),
        (10, "one two three four five six eight"),   # high shingle overlap with 0
        (20, "nothing in common with the others at all"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = D.near_dup_pairs_exact(df, threshold=0.2, probe_mod=10).collect()
    keys = {(r.doc_a, r.doc_b) for r in pairs}
    assert (0, 10) in keys
    assert all(p.jaccard >= 0.2 for p in pairs)
    assert (0, 20) not in keys


def test_minhash_detects_identical(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps over the lazy dog today"),
        (3, "entirely unrelated content goes here in this document now"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = {(r.doc_a, r.doc_b): r.jaccard for r in D.dedup_near_minhash(df, threshold=0.5).collect()}
    assert pairs.get((1, 2)) == 1.0
    assert (1, 3) not in pairs


def test_minhash_recall_vs_exact(documents):
    """MinHash+LSH must recover a solid share of true near-dup pairs
    among the probe subset (banding is probabilistic; 16 hashes / 4
    bands at jaccard>=0.2 on word salad is a loose sieve, so assert
    recall on the pairs both could see)."""
    exact = {
        (r.doc_a, r.doc_b)
        for r in D.near_dup_pairs_exact(documents, threshold=0.35, probe_mod=1).collect()
    }
    if not exact:
        pytest.skip("no high-jaccard pairs at this sf")
    mh = {
        (r.doc_a, r.doc_b)
        for r in D.dedup_near_minhash(documents, threshold=0.35).collect()
    }
    recall = len(exact & mh) / len(exact)
    assert recall >= 0.5, f"recall {recall:.2f} over {len(exact)} true pairs"


def test_lsh_verified_equals_exact_pairs(documents):
    """The LSH-candidate path must reproduce the exact inverted-index
    pair join BIT-EXACTLY (same pairs, same jaccard values): banding
    recall at the defaults is ~100% at threshold 0.35 and verification
    recomputes the identical capped ratio. This equality is what lets
    near_dup_lsh_verified and curation_pipeline_lsh share the exact
    path's SQL oracles."""
    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in D.near_dup_pairs_exact(
            documents, threshold=0.35, probe_mod=1
        ).collect()
    }
    lsh = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in D.near_dup_pairs_lsh_verified(
            documents, threshold=0.35
        ).collect()
    }
    assert exact == lsh


def test_incremental_lsh_equals_corpus_restriction(documents):
    """Incremental near-dup (batch-driven candidates, union-wide caps)
    must equal the corpus-wide LSH pair set restricted to pairs that
    touch the batch — same pairs, same jaccard values."""
    import pyspark.sql.functions as F

    batch = documents.filter(F.col("doc_id") % 7 == 3)
    corpus = documents.filter(F.col("doc_id") % 7 != 3)
    inc = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in D.incremental_near_dup_lsh(
            corpus, batch, threshold=0.35
        ).collect()
    }
    full = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in D.near_dup_pairs_lsh_verified(
            documents, threshold=0.35
        ).collect()
        if r.doc_a % 7 == 3 or r.doc_b % 7 == 3
    }
    assert inc == full


def test_curation_chain_lsh_equals_exact_chain(spark, sf_dir):
    """The end-to-end curation chain must yield the same per-source
    survivor summary whether its closure consumes exact pairs or
    LSH-verified candidates."""
    from ballista_extensions_spark.queries.registry import get_queries

    qs = get_queries()
    a = {
        tuple(r)
        for r in qs["curation_pipeline_summary"](spark, sf_dir).collect()
    }
    b = {tuple(r) for r in qs["curation_pipeline_lsh"](spark, sf_dir).collect()}
    assert a == b


def test_simhash_identical_zero_distance(spark):
    rows = [
        (1, "aaa bbb ccc ddd eee"),
        (2, "aaa bbb ccc ddd eee"),
        (3, "zzz yyy xxx www vvv uuu ttt"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in D.simhash_near_pairs(df).collect()}
    assert pairs.get((1, 2)) == 0
    assert (1, 3) not in pairs


def test_simhash_deterministic(documents):
    a = {r.doc: r.simhash for r in D.simhash64(documents).collect()}
    b = {r.doc: r.simhash for r in D.simhash64(documents).collect()}
    assert a == b


def test_near_dup_df_cap_survives_hot_shingle(spark):
    """Adversarial skew: every document shares one boilerplate phrase
    (a shingle with df = corpus size). The df cap must drop it so (a) no
    spurious pairs emerge from boilerplate alone, (b) the posting join
    never materializes the O(n^2) hot-shingle pair block, and (c) true
    duplicates are still found via their remaining shingles."""
    from ballista_extensions_spark.operators.dedup import near_dup_pairs_exact

    rows = [
        (i, f"common boilerplate phrase unique{i} token{i} tail{i}")
        for i in range(300)
    ]
    # two true duplicates of doc 0
    rows.append((300, rows[0][1]))
    rows.append((301, rows[0][1]))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = near_dup_pairs_exact(
        df, threshold=0.5, probe_mod=1, max_df=100
    ).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    # only the duplicate triangle {0, 300, 301} pairs up
    assert got == {(0, 300), (0, 301), (300, 301)}
    for r in pairs:
        assert r["jaccard"] == 1.0


def test_corpus_snapshot_diff_statuses(spark):
    """added/removed/changed classified exactly; unchanged excluded;
    output carries both hashes for downstream routing."""
    from ballista_extensions_spark.operators.dedup import (
        corpus_snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B2"), (4, "d")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["status"], r["old_hash"] is None,
                      r["new_hash"] is None)
        for r in corpus_snapshot_diff(old, new).collect()
    }
    assert got == {
        2: ("changed", False, False),
        3: ("removed", False, True),
        4: ("added", True, False),
    }  # doc 1 unchanged -> excluded


def test_exact_span_scrub_planted_spans(spark):
    """Lee-et-al-style span scrub: a 10-token span repeated across
    docs keeps only its first occurrence; within-doc repeats scrub
    too; overlapping repeated windows scrub their union; short and
    unique docs pass through unchanged."""
    from ballista_extensions_spark.operators.dedup import exact_span_scrub

    span = " ".join(f"s{i}" for i in range(10))
    uniq = lambda p, k: " ".join(f"{p}{i}" for i in range(k))  # noqa: E731
    rows = [
        (1, f"{uniq('a', 5)} {span} {uniq('b', 5)}"),   # first occ: kept
        (2, f"{uniq('c', 5)} {span} {uniq('d', 5)}"),   # later: scrubbed
        (3, f"{span} {span}"),                           # within-doc repeat
        (4, uniq("e", 30)),                              # unique: unchanged
        (5, "tiny doc"),                                 # < n tokens
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in exact_span_scrub(df, n=10).collect()}
    assert (got[1]["n_before"], got[1]["n_after"]) == (20, 20)
    assert got[1]["clean_text"] == rows[0][1]
    assert (got[2]["n_before"], got[2]["n_after"]) == (20, 10)
    assert got[2]["clean_text"] == f"{uniq('c', 5)} {uniq('d', 5)}"
    # doc 3: spans at pos 0..10 all duplicated (the repeat makes every
    # window non-unique vs doc 1's first occurrence) -> fully scrubbed
    assert got[3]["n_after"] == 0 and got[3]["clean_text"] == ""
    assert got[4]["clean_text"] == rows[3][1]
    assert got[5]["clean_text"] == "tiny doc"


def test_span_scrub_oracle_token_cap_holds():
    """The exact_span_scrub oracle replays token positions with a
    constant generate_series bound (DuckDB rejects lateral bounds);
    a document exceeding it would make the oracle silently drop spans
    and grade the engine red through no fault of its own (ADVICE r11).
    Pin the invariant: every graded/benched corpus stays well under
    the bound."""
    import os

    import duckdb

    cap = 4096  # must match the generate_series bounds in analytics10.py
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        path = f"/root/testdata/{sf}/documents.parquet"
        if not os.path.exists(path):
            continue
        mx, = duckdb.sql(
            f"SELECT max(len(string_split(text, ' '))) FROM '{path}'"
        ).fetchone()
        assert mx < cap, f"{sf}: max tokens {mx} >= oracle cap {cap}"
