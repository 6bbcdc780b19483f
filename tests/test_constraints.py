"""Constraint-metadata tests (proto :59-76 -> metadata-only mapping)."""

from __future__ import annotations

from ballista_extensions_spark.catalog import constraints_of, declare_constraints
from ballista_extensions_spark.io import load_table


def test_declare_and_read_constraints(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    decorated = declare_constraints(
        c, primary_key=["c_custkey"], unique=[["c_name"]]
    )
    got = constraints_of(decorated)
    assert got == {"c_custkey": "primary_key", "c_name": "unique"}
    # data unchanged; metadata survives projection of the same columns
    assert decorated.count() == c.count()


def test_constraints_survive_parquet_roundtrip(spark, sf_dir, tmp_path_factory):
    c = load_table(spark, sf_dir, "nation")
    path = str(tmp_path_factory.mktemp("constraints") / "t")
    declare_constraints(c, primary_key=["n_nationkey"]).write.parquet(path)
    back = spark.read.parquet(path)
    assert constraints_of(back) == {"n_nationkey": "primary_key"}


def test_no_constraints_is_empty(spark, sf_dir):
    assert constraints_of(load_table(spark, sf_dir, "region")) == {}
