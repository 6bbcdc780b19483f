"""Driver-contract tests: entry() smoke + queries()/oracle_sql() shape."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        "sum_base_price",
        "avg_disc",
        "count_order",
    }


def test_entry_schema_stable(spark):
    s1 = entrymod.entry(spark).schema
    s2 = entrymod.entry(spark).schema
    assert s1 == s2


def test_oracle_keys_subset():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 40


def test_all_queries_are_callable():
    for name, fn in entrymod.queries().items():
        assert callable(fn), name
