"""Persisted perceptual-hash store (operators/phashstore.py): probe
exactness vs brute force across the build/compact lifecycle, the
hot-bucket discipline (banded table holds DISTINCT hashes only), and
the exchange-free store side of the persisted probe plan."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from ballista_extensions_spark.operators import phashstore as PS


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def _mk(spark, rows):
    return spark.createDataFrame(rows, "id long, dhash long")


def _brute(stored, new, t):
    return {
        (sa, sb, _hamming(ha, hb))
        for sa, ha in stored
        for sb, hb in new
        if ha is not None and hb is not None and _hamming(ha, hb) <= t
    }


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(7)
    base = [int(v) for v in
            rng.integers(-(1 << 63), 1 << 63, size=60, dtype=np.int64)]
    stored = [(i, base[i]) for i in range(40)]
    # new items: 3 exact dups of stored, 3 near (hamming 2), rest far
    new = [(100, base[0]), (101, base[1]), (102, base[2]),
           (103, base[3] ^ 0b11), (104, base[4] ^ (1 << 40) ^ 1),
           (105, base[5] ^ (1 << 62) ^ (1 << 7)),
           (106, None)]
    new += [(110 + k, base[40 + k]) for k in range(10)]
    return stored, new


def test_probe_matches_brute_force(spark, corpus):
    stored, new = corpus
    store = PS.build_phash_store(_mk(spark, stored), bands=8)
    got = {
        (r["stored_id"], r["new_id"], r["hamming"])
        for r in PS.probe_phash_store(
            store, _mk(spark, new), threshold=6
        ).collect()
    }
    assert got == _brute(stored, new, 6)
    assert len(got) >= 6  # the planted dups and nears all found


def test_compact_then_probe_matches_grown_brute_force(spark, corpus):
    stored, new = corpus
    store = PS.build_phash_store(_mk(spark, stored), bands=8)
    grown = PS.compact_into_phash_store(store, _mk(spark, new))
    # second increment: dup of a phase-1 item + dup of an original
    inc2 = [(200, new[3][1]), (201, stored[6][1]), (202, 42)]
    got = {
        (r["stored_id"], r["new_id"], r["hamming"])
        for r in PS.probe_phash_store(
            grown, _mk(spark, inc2), threshold=6
        ).collect()
    }
    members = stored + [(i, h) for i, h in new if h is not None]
    assert got == _brute(members, inc2, 6)
    assert (103, 200, 0) in got  # matches the COMPACTED increment
    assert (6, 201, 0) in got    # still matches the original build


def test_compact_reject_ids_and_distinct_banding(spark, corpus):
    stored, new = corpus
    store = PS.build_phash_store(_mk(spark, stored), bands=8)
    rejects = spark.createDataFrame([(100,), (101,)], "id long")
    grown = PS.compact_into_phash_store(
        store, _mk(spark, new), reject_ids=rejects
    )
    ids = {r["id"] for r in grown.members.collect()}
    assert 100 not in ids and 101 not in ids and 103 in ids
    # banded table stays DISTINCT-per-hash even after compacting exact
    # dups of stored content (102 duplicates stored hash base[2])
    banded = grown.banded.collect()
    assert len(banded) == len({r["h"] for r in banded}) * 8
    # NULL-hash rows never enter the store
    assert all(r["h"] is not None for r in grown.members.collect())


def test_compact_redelivery_is_idempotent(spark, corpus):
    """At-least-once redelivery (ADVICE r11): re-compacting the SAME
    increment must not append duplicate member rows — in-memory and
    table-backed alike — so later probes emit each pair once."""
    stored, new = corpus
    n_new = len([1 for _, h in new if h is not None])
    for prefix in (None, "phash_idem_store"):
        store = PS.build_phash_store(
            _mk(spark, stored), bands=8, table_prefix=prefix, buckets=4
        )
        once = PS.compact_into_phash_store(
            store, _mk(spark, new), table_prefix=prefix, buckets=4
        )
        twice = PS.compact_into_phash_store(
            once, _mk(spark, new), table_prefix=prefix, buckets=4
        )
        assert twice.members.count() == len(stored) + n_new
        probe = [(300, stored[6][1])]
        pairs = PS.probe_phash_store(
            twice, _mk(spark, probe), threshold=6
        ).collect()
        keys = [(r["stored_id"], r["new_id"]) for r in pairs]
        assert len(keys) == len(set(keys))
        assert (6, 300) in keys
    for t in ("phash_idem_store_members", "phash_idem_store_banded"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_probe_threshold_validation(spark, corpus):
    stored, _ = corpus
    store = PS.build_phash_store(_mk(spark, stored), bands=8)
    with pytest.raises(ValueError, match="pigeonhole"):
        PS.probe_phash_store(store, _mk(spark, stored), threshold=8)
    with pytest.raises(ValueError, match="divide"):
        PS.build_phash_store(_mk(spark, stored), bands=7)


def test_persisted_store_probe_is_exchange_free_on_store_side(
    spark, corpus
):
    """With the store persisted bucketed by h (members) and slice
    (banded), the probe's two store-side scans need NO exchange: the
    only shuffles are the increment's rows moving to the store's
    bucket layouts — the property that keeps per-increment cost
    independent of corpus size."""
    from ballista_extensions_spark import plans as P
    from ballista_extensions_spark.operators.imagedup import (
        _band_slices,
        _members,
        _validate_banding,
    )

    stored, new = corpus
    store = PS.build_phash_store(
        _mk(spark, stored), bands=8, table_prefix="phash_test_store",
        buckets=8,
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        width, mask = _validate_banding(6, 8)
        bm = _members(_mk(spark, new), "id", "dhash").localCheckpoint()
        # hamming-0 member equi-join: 1 exchange (increment -> store
        # bucket layout), store scan exchange-free
        eq = store.members.join(bm, "h")
        eq.count()
        assert P.shuffle_exchanges(eq) == 1
        assert "phash_test_store_members" in (
            eq._jdf.queryExecution().executedPlan().toString()
        )
        # banded candidate join: the increment's banded rows shuffle
        # once; the store's banded table scan is exchange-free
        bsliced = _band_slices(
            bm.select("h").distinct(), width, mask, 8
        ).localCheckpoint()
        cand = store.banded.alias("a").join(
            bsliced.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.slice") == F.col("b.slice")),
        )
        cand.count()
        assert P.shuffle_exchanges(cand) == 1
        assert "phash_test_store_banded" in (
            cand._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        for t in ("phash_test_store_members", "phash_test_store_banded"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
