"""Perceptual-hash image near-duplication (VERDICT r9 directive #3):
compose the real image codec (operators/imagecodec.py) with banded
Hamming search so multimodal decode FEEDS dedup — the loop the README
promises.

Pipeline: encoded image payloads → Arrow-batched decode + 64-bit
dHash (``image_dhash``) → banded multi-index Hamming join
(``phash_near_dup_pairs``). The banding is the Hamming-space analogue
of MinHash-LSH banding, with a stronger guarantee: splitting a 64-bit
hash into ``bands`` disjoint slices, two hashes within Hamming
distance ``bands - 1`` MUST agree on at least one slice (pigeonhole),
so candidate recall is exactly 1.0 for any threshold < bands — the
banded join is a pure optimization over the corpus² scan, never an
approximation (multi-index hashing, Norouzi et al., reimplemented on
DataFrame ops). Verification recomputes exact Hamming (xor +
bit_count, two codegen'd integer ops), so precision is exact too.

Scale: hashing is one mapInPandas pass over whatever partitioning the
corpus arrives with (8 B of hash state per image); candidates come
from equi-joins on (band, slice-value) — cost ∝ per-bucket collisions,
never corpus². 8-bit slices (bands=8) keep the guarantee up to
threshold 7 but cap bucket cardinality at 256 per band, so at corpus
scale the posting-cap discipline applies: raise to 16-bit slices
(bands=4, threshold ≤ 3) or hash into (band, value, shard) buckets —
the same df-cap lever ``near_dup_pairs_exact`` documents.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def image_dhash(
    media: DataFrame,
    hasher: Callable[[bytes], int] | None = None,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """(id, dhash): decode each payload with the real codec and hash
    it — Arrow-batched mapInPandas, no shuffle, bounded batch memory.
    Undecodable payloads surface as NULL dhash (kept, so corrupt
    images are visible downstream rather than silently dropped)."""
    import pandas as pd

    if hasher is None:
        from ballista_extensions_spark.operators.imagecodec import dhash64

        hasher = dhash64

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    hv = hasher(bytes(payload))
                except Exception:  # noqa: BLE001 — quarantine, don't
                    # crash: corrupt payloads raise zlib.error /
                    # struct.error from inside the codecs, not just
                    # ValueError, and one bad row must not kill the job
                    hv = None
                ids.append(mid)
                hashes.append(hv)
            yield pd.DataFrame({"id": ids, "dhash": hashes})

    return media.select(id_col, payload_col).mapInPandas(
        _hash, schema="id long, dhash long"
    )


def _validate_banding(threshold: int, bands: int) -> tuple[int, int]:
    """Shared banding contract: threshold < bands (pigeonhole recall
    1.0) and bands | 64. Returns (slice width, slice mask)."""
    if threshold >= bands:
        raise ValueError(
            f"threshold {threshold} >= bands {bands}: the pigeonhole "
            "recall guarantee needs threshold < bands"
        )
    if 64 % bands != 0:
        raise ValueError(f"bands {bands} must divide 64")
    width = 64 // bands
    return width, (1 << width) - 1


def _band_slices(
    df: "DataFrame",
    id_alias: str,
    hash_alias: str,
    bands: int,
    id_col: str,
    hash_col: str,
) -> "DataFrame":
    """ONE slicing implementation for every banded Hamming join (self
    and cross): drop NULL hashes, cut recomputation of the upstream
    decode+hash with a lazy localCheckpoint (measured 31 s vs 12 s at
    sf0.1 on the self-join — the checkpointed state is 8 B of hash per
    item, not the payloads), then explode the hash into (band, slice)
    keys via shiftrightunsigned + mask."""
    width = 64 // bands
    mask = (1 << width) - 1
    return (
        df.filter(F.col(hash_col).isNotNull())
        .localCheckpoint(eager=False)
        .select(
            F.col(id_col).alias(id_alias),
            F.col(hash_col).alias(hash_alias),
            F.explode(
                F.expr(
                    f"transform(sequence(0, {bands - 1}), b -> "
                    f"struct(b AS band, shiftrightunsigned({hash_col}, "
                    f"b * {width}) & {mask}L AS slice))"
                )
            ).alias("bs"),
        )
        .select(
            id_alias,
            hash_alias,
            F.col("bs.band").alias("band"),
            F.col("bs.slice").alias("slice"),
        )
    )


def phash_near_dup_pairs(
    hashes: DataFrame,
    threshold: int = 6,
    bands: int = 8,
    id_col: str = "id",
    hash_col: str = "dhash",
) -> DataFrame:
    """All pairs (id_a < id_b) with Hamming(hash_a, hash_b) <=
    threshold. Exact by construction: ``threshold < bands`` is
    enforced so the pigeonhole guarantee holds and the banded
    candidate join has recall 1.0; verification recomputes exact
    Hamming. NULL hashes (undecodable images) cannot pair."""
    _validate_banding(threshold, bands)
    sliced = _band_slices(hashes, "id", "h", bands, id_col, hash_col)
    a = sliced.alias("a")
    b = sliced.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.slice") == F.col("b.slice"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("a.h").alias("ha"),
            F.col("b.id").alias("id_b"),
            F.col("b.h").alias("hb"),
        )
        .distinct()
    )
    return (
        cands.select(
            "id_a",
            "id_b",
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
            .cast("long")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= threshold)
    )


def phash_cross_dup_pairs(
    left: DataFrame,
    right: DataFrame,
    threshold: int = 6,
    bands: int = 8,
    id_col: str = "id",
    hash_col: str = "dhash",
) -> DataFrame:
    """All CROSS-corpus pairs (left_id, right_id) with
    Hamming(hash_left, hash_right) <= threshold — the two-corpus
    variant of :func:`phash_near_dup_pairs`, which is the shape of
    benchmark decontamination: left = evaluation/benchmark media,
    right = training corpus, and every surviving pair is a
    contamination edge. Same pigeonhole guarantee (recall exactly 1.0
    for threshold < bands), same exact xor+bit_count verification; no
    id ordering constraint because the two sides are distinct corpora
    (an item appearing in both IS a finding, not a self-pair).
    Scale: candidates come from equi-joins on (band, slice) between
    the two hash tables — cost ∝ cross-bucket collisions, never
    |left| × |right|; both sides carry 8 B of hash state per item."""
    _validate_banding(threshold, bands)
    cands = (
        _band_slices(left, "left_id", "left_h", bands, id_col, hash_col)
        .join(
            _band_slices(
                right, "right_id", "right_h", bands, id_col, hash_col
            ),
            ["band", "slice"],
        )
        .select("left_id", "left_h", "right_id", "right_h")
        .distinct()
    )
    return cands.select(
        "left_id",
        "right_id",
        F.bit_count(F.col("left_h").bitwiseXOR(F.col("right_h")))
        .cast("long")
        .alias("hamming"),
    ).filter(F.col("hamming") <= threshold)
