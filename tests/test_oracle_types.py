"""Declared-type audit of every registered oracle.

Round 10 lesson: DuckDB types a bare ``SUM(BIGINT)`` output as HUGEINT
while Spark emits LONG; the driver's hasher distinguishes value types,
so five value-identical media queries failed the gate.  This test binds
every ``oracle_sql()`` statement in DuckDB (binding resolves declared
output types without executing the query) and asserts no oracle emits a
HUGEINT/UHUGEINT column — the silent widening the gate cannot absorb.
No Spark session needed: this is a pure oracle-side scan.
"""

from __future__ import annotations

import duckdb
import pytest

from tests.conftest import SF_DIR

FORBIDDEN = ("HUGEINT", "UHUGEINT")


@pytest.fixture(scope="module")
def duck():
    from ballista_extensions_spark.io import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def test_no_oracle_emits_hugeint(duck):
    import __spark_entry__ as entrymod

    offenders = {}
    for name, sql in entrymod.oracle_sql().items():
        rel = duck.sql(sql)
        bad = [
            (col, str(typ))
            for col, typ in zip(rel.columns, rel.types)
            if any(f in str(typ).upper() for f in FORBIDDEN)
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracles with HUGEINT output columns (wrap the aggregate in "
        f"CAST(... AS BIGINT)): {offenders}"
    )


def test_no_oracle_emits_nested_output(duck):
    """Round 16 lesson, one layer up from the HUGEINT one: the driver's
    canonicalizer sorts the collected pandas frame by every column, and
    pandas cannot factorize ndarray/dict cells — an ARRAY/MAP/STRUCT
    output column makes the query ungradable (CORRECTNESS_r16 recorded
    ``TypeError: unhashable type: 'numpy.ndarray'`` for
    packed_segment_ids, the registry's only never-green row). Registered
    output columns must be scalar; serialize arrays in the final
    projection of BOTH engines (concat_ws / array_to_string)."""
    import __spark_entry__ as entrymod

    offenders = {}
    for name, sql in entrymod.oracle_sql().items():
        rel = duck.sql(sql)
        bad = [
            (col, str(typ))
            for col, typ in zip(rel.columns, rel.types)
            if str(typ).endswith("[]")
            or str(typ).upper().startswith(("LIST", "MAP", "STRUCT"))
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracles with nested (array/map/struct) output columns — the "
        "driver canonicalizer cannot hash these; serialize them to "
        f"scalar strings in both engines: {offenders}"
    )
