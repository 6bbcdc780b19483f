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
corpus arrives with (8 B of hash state per image); the banded join
runs over DISTINCT hashes only (VERDICT r10 #4): a degenerate
population — millions of all-black frames or blank pages sharing one
dHash — contributes exactly ONE row per band to the candidate join,
so candidate cost is ∝ distinct-hash bucket collisions, never member
count². Identical-hash members are emitted as hamming-0 pairs by a
plain dhash equi-join (AQE skew-split-able), and near-dup DISTINCT
hash pairs are expanded back to id pairs by two more equi-joins
against the (typically tiny, AQE-broadcast) verified hash-pair table.
The quadratic part that remains is the OUTPUT itself (a group of m
identical images has m·(m-1)/2 dup pairs by definition), which no
candidate strategy can shrink — downstream cluster queries aggregate
it without materializing.
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


def _members(
    df: DataFrame, id_col: str, hash_col: str
) -> DataFrame:
    """(id, h) with NULL hashes (undecodable media) dropped; a lazy
    localCheckpoint cuts recomputation of the upstream decode+hash —
    the checkpointed state is 8 B of hash per item, not the payloads
    (measured 31 s vs 12 s at sf0.1 on the self-join).

    The hash-repartition below the checkpoint is load-bearing (r17):
    the consumers are the build sides of several broadcast joins, and
    AQE submits those build jobs CONCURRENTLY — concurrent jobs racing
    a lazy localCheckpoint each recompute its lineage (block-cache
    get-or-compute does not dedup across jobs), so the whole Python
    decode+hash pass ran once PER BUILD (job-profiled: three equal
    1.6 s x 32-task jobs on audio_near_dup_energy). A shuffle map
    stage, by contrast, IS deduplicated across concurrent jobs by the
    DAGScheduler, so pinning one exchange on ``h`` under the racers
    runs the decode exactly once — and the exchange carries only the
    16 B (id, h) proxy, never payloads (guide §8), while
    HashPartitioning(h) is exactly the clustering the downstream
    distinct and equi-self-join on ``h`` need (guide §2.4)."""
    from ballista_extensions_spark.io import default_parallelism

    return (
        df.filter(F.col(hash_col).isNotNull())
        .select(F.col(id_col).alias("id"), F.col(hash_col).alias("h"))
        .repartition(default_parallelism(df.sparkSession), "h")
        .localCheckpoint(eager=False)
    )


def _band_slices(df: DataFrame, width: int, mask: int, bands: int) -> DataFrame:
    """Explode a DISTINCT-hash column ``h`` into (h, band, slice) keys
    via shiftrightunsigned + mask. Input must already be distinct: the
    whole point of the round-11 restructure is that a degenerate
    member population never reaches this explode."""
    return df.select(
        "h",
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), b -> "
                f"struct(b AS band, shiftrightunsigned(h, "
                f"b * {width}) & {mask}L AS slice))"
            )
        ).alias("bs"),
    ).select(
        "h",
        F.col("bs.band").alias("band"),
        F.col("bs.slice").alias("slice"),
    )


def _verified_hash_pairs(
    left_sliced: DataFrame,
    right_sliced: DataFrame,
    threshold: int,
    same_corpus: bool,
) -> DataFrame:
    """THE banded-candidate + verification block, shared by the
    self-join, the cross-corpus join and the store probe: equi-join two
    (h, band, slice) frames on (band, slice), dedup candidate hash
    pairs, verify with exact xor + bit_count. ``same_corpus`` orders
    the pair (``a.h < b.h``) so each unordered pair appears once;
    the two-sided form uses ``!=`` (directional, no self-pairs).
    Equal hashes are deliberately excluded in BOTH forms — hamming-0
    pairs are produced by the callers' member equi-join, never through
    banding."""
    a = left_sliced.alias("a")
    b = right_sliced.alias("b")
    hpred = (
        (F.col("a.h") < F.col("b.h"))
        if same_corpus
        else (F.col("a.h") != F.col("b.h"))
    )
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.slice") == F.col("b.slice"))
            & hpred,
        )
        .select(F.col("a.h").alias("ha"), F.col("b.h").alias("hb"))
        .distinct()
        .select(
            "ha",
            "hb",
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
            .cast("long")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= threshold)
    )


def _near_hash_pairs(
    distinct_hashes: DataFrame, threshold: int, width: int, mask: int,
    bands: int,
) -> DataFrame:
    """(ha < hb, hamming in [1, threshold]) over one corpus's DISTINCT
    hashes via the banded pigeonhole join."""
    sliced = _band_slices(distinct_hashes, width, mask, bands)
    return _verified_hash_pairs(sliced, sliced, threshold, same_corpus=True)


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
    Hamming. NULL hashes (undecodable images) cannot pair.

    Hot-bucket-safe (VERDICT r10 #4): only DISTINCT hashes enter the
    banded join, so m images sharing one dHash cost 1 banded row per
    band instead of m — their pairs come from (a) a plain dhash
    equi-join for hamming-0 members and (b) expansion of the verified
    distinct-hash near-pair table (small → AQE broadcasts it)."""
    width, mask = _validate_banding(threshold, bands)
    members = _members(hashes, id_col, hash_col)
    hp = _near_hash_pairs(
        members.select("h").distinct(), threshold, width, mask, bands
    )
    eq = (
        members.alias("x")
        .join(
            members.alias("y"),
            (F.col("x.h") == F.col("y.h"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            F.lit(0).cast("long").alias("hamming"),
        )
    )
    near = (
        hp.join(members.alias("x"), F.col("x.h") == F.col("ha"))
        .join(members.alias("y"), F.col("y.h") == F.col("hb"))
        .select(
            F.least(F.col("x.id"), F.col("y.id")).alias("id_a"),
            F.greatest(F.col("x.id"), F.col("y.id")).alias("id_b"),
            "hamming",
        )
    )
    return eq.unionByName(near)


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
    Scale: the banded join runs over the DISTINCT hashes of each side
    — cost ∝ distinct-hash cross-bucket collisions, never
    |left| × |right|, and degenerate populations (the all-black-frame
    case) collapse to one banded row per band per side. Equal-hash
    cross pairs come from a plain dhash equi-join; near-pair expansion
    joins both member tables against the small verified hash-pair
    table."""
    width, mask = _validate_banding(threshold, bands)
    lm = _members(left, id_col, hash_col)
    rm = _members(right, id_col, hash_col)
    lsliced = _band_slices(lm.select("h").distinct(), width, mask, bands)
    rsliced = _band_slices(rm.select("h").distinct(), width, mask, bands)
    hp = _verified_hash_pairs(lsliced, rsliced, threshold,
                              same_corpus=False)
    eq = (
        lm.alias("x")
        .join(rm.alias("y"), F.col("x.h") == F.col("y.h"))
        .select(
            F.col("x.id").alias("left_id"),
            F.col("y.id").alias("right_id"),
            F.lit(0).cast("long").alias("hamming"),
        )
    )
    near = (
        hp.join(lm.alias("x"), F.col("x.h") == F.col("ha"))
        .join(rm.alias("y"), F.col("y.h") == F.col("hb"))
        .select(
            F.col("x.id").alias("left_id"),
            F.col("y.id").alias("right_id"),
            "hamming",
        )
    )
    return eq.unionByName(near)
