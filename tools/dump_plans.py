"""Dump `.explain("formatted")` output for registered queries to files.

Usage: python tools/dump_plans.py <sf_dir> <out_dir> <suffix> <query> [query ...]

Writes <out_dir>/<query>_<suffix>.txt for each query — the optimization
rounds' plan-evidence deliverable (plans/r17/<query>_{before,after}.txt).
Streaming replay queries EXECUTE when their DataFrame is built (the
replay runs a full multi-batch stream), so their dumped plan is the plan
of the replayed result read-back plus a header noting that; the plan
evidence for their per-batch work is the sink code itself.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    sf_dir, out_dir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
    names = sys.argv[4:]
    os.makedirs(out_dir, exist_ok=True)
    from ballista_extensions_spark.plans.inspect import executed_plan
    from ballista_extensions_spark.queries import get_queries
    from ballista_extensions_spark.session import get_session

    spark = get_session("dump-plans")
    queries = get_queries()
    unknown = [n for n in names if n not in queries]
    if unknown:
        raise SystemExit(f"unknown query names: {unknown}")
    for name in names:
        df = queries[name](spark, sf_dir)
        plan = executed_plan(df)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"== {name} @ {sf_dir} ({suffix}) ==\n\n")
            f.write(plan)
            f.write("\n")
        print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
