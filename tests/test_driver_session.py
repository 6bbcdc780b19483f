"""Regression: queries must run under a session the engine did NOT
build (the driver's harness creates its own SparkSession — Spark 4
defaults ANSI on, no ns-parquet conf, arbitrary timezone). load_table
applies the required runtime confs idempotently."""

from __future__ import annotations

import pytest


@pytest.fixture()
def foreign_session(spark):
    """A sibling session with hostile-but-realistic defaults."""
    s = spark.newSession()
    s.conf.set("spark.sql.ansi.enabled", "true")
    s.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    s.conf.set("spark.sql.session.timeZone", "America/New_York")
    return s


def test_events_reads_under_foreign_session(foreign_session, sf_dir):
    from ballista_extensions_spark.io import load_table

    assert load_table(foreign_session, sf_dir, "events").count() > 0


def test_minhash_wrapping_arith_under_foreign_session(foreign_session, sf_dir):
    """The affine rehash multiplies arbitrary 64-bit hashes — ANSI mode
    would raise ARITHMETIC_OVERFLOW; load_table must disable it."""
    from ballista_extensions_spark.queries import get_queries

    rows = get_queries()["dedup_near_minhash"](foreign_session, sf_dir).collect()
    assert rows is not None  # completing without overflow is the contract


def test_entry_under_foreign_session(foreign_session):
    import __spark_entry__ as m

    assert len(m.entry(foreign_session).collect()) > 0
