"""DuckDB yardstick: time every oracle SQL over the same parquet the
engine reads — the single-node columnar baseline BASELINE.md records
(the reference publishes no numbers; driver bar is engine within 2x of
baseline at the same scale factor).

Protocol matches bench.py: median of N runs per query (default 3).

Usage: python tools/duckdb_bench.py [sf_dir] [reps] [query ...] > duckdb_times.json
(query names filter the sweep, for incremental runs)
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import __spark_entry__ as entrymod
    from ballista_extensions_spark.io import TABLES

    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 32}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    errors: dict[str, str] = {}
    only = set(sys.argv[3:])
    for name, sql in entrymod.oracle_sql().items():
        if only and name not in only:
            continue
        samples = []
        for _ in range(reps):
            t0 = time.time()
            try:
                con.sql(sql).fetchall()
            except Exception as e:  # noqa: BLE001
                errors[name] = f"{type(e).__name__}: {e}"[:200]
                break
            samples.append(time.time() - t0)
        if not samples:
            continue
        samples.sort()
        timings[name] = round(samples[len(samples) // 2], 3)
        spread[name] = [round(samples[0], 3), round(samples[-1], 3)]
        print(f"# {name}: median {timings[name]:.2f}s", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "duckdb_total_wall_sec_oracle_queries",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "protocol": f"median of {reps} runs per query",
                "queries": timings,
                "min_max": spread,
                "errors": errors,
                "sf_dir": sf_dir,
            },
            indent=1,
            sort_keys=True,
        )
    )


if __name__ == "__main__":
    main()
