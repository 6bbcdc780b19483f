"""Sequence packing (operators/packing.py, VERDICT r14 directive #2):
token conservation, span arithmetic, and determinism."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from ballista_extensions_spark.operators.packing import (
    pack_sequences_manifest,
)

SEED = 7
L = 64


def test_token_conservation(documents):
    """Sum of packed tokens + padding == sum of per-doc tokens + one
    EOS per doc == n_sequences * L (the directive's conservation
    pin)."""
    from ballista_extensions_spark.operators.text import tokens

    d = documents.filter(F.col("text").isNotNull())
    man = pack_sequences_manifest(d, L, SEED).collect()
    doc_tokens = d.select(
        F.sum(F.size(tokens(F.col("text")))).alias("t"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    total_doc = int(doc_tokens["t"]) + int(doc_tokens["n"])  # + EOS each
    assert sum(r["n_tokens"] for r in man) == total_doc
    assert (
        sum(r["n_tokens"] for r in man) + sum(r["padding"] for r in man)
        == len(man) * L
    )
    # padding only on the tail; every other sequence holds exactly L
    tail = max(r["seq_id"] for r in man)
    for r in man:
        if r["seq_id"] != tail:
            assert r["n_tokens"] == L and r["padding"] == 0
    # seq ids are contiguous from 0
    assert sorted(r["seq_id"] for r in man) == list(range(len(man)))


def test_long_doc_spans_sequences(spark):
    """A document longer than the context length spans several
    sequences: the interior sequences hold exactly that one document
    with zero boundaries (no doc starts there)."""
    d = spark.createDataFrame(
        [
            (1, ("w " * 10).strip()),
            (2, ("x " * 300).strip()),
            (3, "y z"),
        ],
        "doc_id long, text string",
    )
    man = (
        pack_sequences_manifest(d, L, SEED)
        .orderBy("seq_id")
        .collect()
    )
    assert sum(r["n_tokens"] for r in man) == 10 + 300 + 2 + 3
    interior = [
        r for r in man if r["n_docs"] == 1 and r["n_doc_starts"] == 0
    ]
    assert interior, "the 300-token doc must fully own >=1 sequence"
    for r in interior:
        assert r["first_rank"] == r["last_rank"]
        assert r["boundary_hash"] == 0


def test_cost_col_contract(spark):
    """cost_col is taken as-is (caller includes EOS): totals equal the
    provided costs exactly; zero-cost documents occupy no positions
    but do not error."""
    d = spark.createDataFrame(
        [(1, "a", 5), (2, "b", 0), (3, "c", 7)],
        "doc_id long, text string, cost long",
    )
    man = pack_sequences_manifest(d, 8, SEED, cost_col="cost").collect()
    assert sum(r["n_tokens"] for r in man) == 12
    assert sum(r["n_doc_starts"] for r in man) == 2  # zero-cost absent


def test_seed_determinism(documents):
    d = documents.filter(F.col("text").isNotNull()).limit(50)
    a = pack_sequences_manifest(d, L, 1).orderBy("seq_id").collect()
    b = pack_sequences_manifest(d, L, 1).orderBy("seq_id").collect()
    c = pack_sequences_manifest(d, L, 2).orderBy("seq_id").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    # a different seed reorders the stream: boundary hashes move even
    # though totals are seed-independent
    assert [r["boundary_hash"] for r in a] != [
        r["boundary_hash"] for r in c
    ]
    assert sum(r["n_tokens"] for r in a) == sum(r["n_tokens"] for r in c)


def test_context_len_validation(documents):
    with pytest.raises(ValueError, match="context_len"):
        pack_sequences_manifest(documents, 0, SEED)


def test_emit_packed_sequences_round_trip(spark):
    """The emitted token-ID stream reconstructs every document: invert
    the vocab, split the concatenated sequence ids on EOS, and each
    piece equals the document's normalized chunk stream in the seeded
    rank order — plus conservation and fixed-length invariants."""
    from ballista_extensions_spark.operators.bpe_stream import (
        FROZEN_STREAM_MERGES,
        _py_chunks,
        token_vocab,
    )
    from ballista_extensions_spark.operators.packing import (
        emit_packed_sequences,
    )
    from ballista_extensions_spark.operators.shards import (
        assign_training_shards,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "pack my box with five dozen liquor jugs 123"),
            (3, "a" * 40),
            (4, "short"),
        ],
        "doc_id long, text string",
    )
    L, seed = 16, 5
    seqs = (
        emit_packed_sequences(docs, FROZEN_STREAM_MERGES, L, seed)
        .orderBy("seq_id")
        .collect()
    )
    # fixed length everywhere but the tail
    for r in seqs[:-1]:
        assert r["n_tokens"] == L and r["padding"] == 0
    assert seqs[-1]["n_tokens"] + seqs[-1]["padding"] == L

    vocab = token_vocab(FROZEN_STREAM_MERGES)
    inv = {i: s for s, i in vocab.items()}
    eos = len(vocab)
    stream = [i for r in seqs for i in r["ids"]]
    pieces, cur = [], []
    for i in stream:
        if i == eos:
            pieces.append("".join(inv[x] for x in cur))
            cur = []
        else:
            cur.append(i)
    assert not cur, "stream must end on an EOS boundary"
    # seeded rank order from the same (corpus, seed)
    order = [
        r["doc_id"]
        for r in assign_training_shards(docs, 10**9, seed)
        .orderBy("rank")
        .collect()
    ]
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    want = ["".join(_py_chunks(texts[d])) for d in order]
    assert pieces == want


def test_segment_ids_match_manifest(documents):
    """packed_segment_ids describes exactly the manifest's cuts
    (VERDICT r15 directive #6): same (corpus, seed, context_len) —
    per sequence, token counts agree, boundary count equals
    n_doc_starts, and n_segments adds 1 exactly when the sequence
    opens mid-document (continuation prefix, segment id 0)."""
    from ballista_extensions_spark.operators.packing import (
        packed_segment_ids,
    )

    d = documents.filter(F.col("text").isNotNull())
    man = {
        r["seq_id"]: r
        for r in pack_sequences_manifest(d, L, SEED).collect()
    }
    seg = {
        r["seq_id"]: r for r in packed_segment_ids(d, L, SEED).collect()
    }
    assert man.keys() == seg.keys() and len(man) > 2
    for sid, m in man.items():
        s = seg[sid]
        assert s["n_tokens"] == m["n_tokens"]
        assert len(s["boundaries"]) == m["n_doc_starts"]
        cont = 0 if (s["boundaries"] and s["boundaries"][0] == 0) else 1
        assert s["n_segments"] == m["n_doc_starts"] + cont


def test_segment_ids_shape_invariants(documents):
    """Mask semantics: per-position array has length n_tokens, is
    non-decreasing, changes value exactly at the boundary offsets,
    and its distinct count is n_segments."""
    from ballista_extensions_spark.operators.packing import (
        packed_segment_ids,
    )

    d = documents.filter(F.col("text").isNotNull())
    rows = packed_segment_ids(d, L, SEED).collect()
    for r in rows:
        ids = r["segment_ids"]
        assert len(ids) == r["n_tokens"]
        assert all(a <= b for a, b in zip(ids, ids[1:]))
        changes = [
            p for p in range(len(ids)) if p == 0 and ids[0] > 0
            or (p > 0 and ids[p] != ids[p - 1])
        ]
        # positions where the id steps (incl. a boundary at offset 0
        # flipping position 0 off the implicit continuation id 0) are
        # exactly the boundary offsets
        assert changes == list(r["boundaries"])
        assert len(set(ids)) == r["n_segments"]


def test_segment_ids_align_with_emitted_eos(spark):
    """Tie the mask to the actual token stream: with the SAME cost
    basis as emit_packed_sequences (BPE ids + EOS), the token
    immediately before every in-sequence boundary is the previous
    document's EOS sentinel."""
    from ballista_extensions_spark.operators.bpe_stream import (
        FROZEN_STREAM_MERGES,
        bpe_stream_token_ids,
        token_vocab,
    )
    from ballista_extensions_spark.operators.packing import (
        emit_packed_sequences,
        packed_segment_ids,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "pack my box with five dozen liquor jugs 123"),
            (3, "a" * 40),
            (4, "short words here"),
        ],
        "doc_id long, text string",
    )
    Lc, seed = 16, 5
    eos = len(token_vocab(FROZEN_STREAM_MERGES))
    seqs = {
        r["seq_id"]: r["ids"]
        for r in emit_packed_sequences(
            docs, FROZEN_STREAM_MERGES, Lc, seed
        ).collect()
    }
    ids_frame = bpe_stream_token_ids(docs, FROZEN_STREAM_MERGES)
    with_cost = docs.join(
        ids_frame.select("doc_id", F.col("n_ids").alias("c")), "doc_id"
    )
    masks = packed_segment_ids(
        with_cost, Lc, seed, cost_col="c"
    ).collect()
    assert masks and set(seqs) == {r["seq_id"] for r in masks}
    saw_inner_boundary = False
    for r in masks:
        toks = seqs[r["seq_id"]]
        assert len(toks) == r["n_tokens"] == len(r["segment_ids"])
        for b in r["boundaries"]:
            if b > 0:
                saw_inner_boundary = True
                assert toks[b - 1] == eos
    assert saw_inner_boundary
