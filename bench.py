"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Protocol (round 6+): each query runs $SPARK_GRAFT_BENCH_REPS times
(default 3) and the reported number is the MEDIAN — single-shot numbers
proved untrustworthy (round-5 post-mortem measured the same unchanged
query at 8.5 s in the sweep vs 0.8-4.3 s solo; cache/JIT state dominates
one-shot timings). BENCH_FULL.json additionally records per-query
min/max so spread is auditable. Python GC runs between queries so
lazily-checkpointed operator frames release their block-manager state
instead of skewing later queries.

Round 9+: BENCH_FULL.json also records per-query shuffle read/write
BYTES (median across reps, from the UI REST cumulative executor totals
— plans/metrics.py) so an exchange regression is visible even when
sf0.1 wall-time hides it; tests/test_shuffle_bytes.py gates the
zero-shuffle claims on the same counters.

The full result (3-decimal timings + row counts) is also written to
BENCH_FULL.json next to this script; the printed line uses 2-decimal
timings and compact separators so it stays well inside the driver's
stdout capture window (round 2's 91-entry line was truncated to its
tail, recording "parsed": null).

Timing = wall clock of plan construction + execution to a driver-side
count/collect (collect for small results; the queries are the same
plan-constructor functions the driver's correctness gate runs).
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

#: Headline set: every registered query. Heavy all-pairs ops are bounded
#: by construction (probe subsets), so the full registry is benchable.
EXCLUDE: set[str] = set()


def _report_shuffle_gate(new_full: dict) -> None:
    """Diff this sweep's shuffle bytes against the BENCH_FULL.json
    committed at git HEAD (tools/shuffle_diff.py) and print the result
    to stderr — non-fatal here (VERDICT r9 directive #5: the gate runs
    with EVERY sweep, so an exchange regression surfaces the round it
    lands); tests/test_shuffle_bytes.py makes the same diff fatal."""
    try:
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "tools"))
        from shuffle_diff import _load, diff

        old = _load("git:HEAD")
        flagged, n_common = diff(old, new_full)
        if flagged:
            print(f"# SHUFFLE GATE: {len(flagged)} regression(s) vs "
                  f"git:HEAD BENCH_FULL.json:", file=sys.stderr)
            for name, a, b in flagged:
                print(f"#   {name}: {a} -> {b} read bytes",
                      file=sys.stderr)
        else:
            print(f"# shuffle gate: no regressions vs git:HEAD across "
                  f"{n_common} common queries", file=sys.stderr)
    except Exception as e:  # noqa: BLE001 — gate is advisory in bench
        print(f"# shuffle gate unavailable: {e}", file=sys.stderr)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from ballista_extensions_spark.session import get_session
    from ballista_extensions_spark.queries import get_queries

    spark = get_session("bench")
    # warm the JVM + parquet footers of EVERY table once so per-query
    # numbers measure execution, not first-touch initialization (the
    # registry orders newest queries first, so without this the cold
    # costs land on whatever happens to run early)
    from ballista_extensions_spark.io import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).count()

    from ballista_extensions_spark.plans.metrics import shuffle_totals

    def _calibration_sec() -> float:
        """Median of 3 runs of a fixed data-independent workload
        (range aggregation — pure JVM compute, no I/O, no Python):
        a box-speed anchor recorded with every sweep so cross-round
        comparisons can normalize machine drift instead of
        rediscovering it with ad-hoc control panels (round 13
        measured the same code 1.27x apart on different days)."""
        ts = []
        for _ in range(3):
            t0 = time.time()
            spark.range(0, 1_000_000_000, 1, 32).selectExpr(
                "sum(id * 3 % 7) AS s"
            ).collect()
            ts.append(time.time() - t0)
        ts.sort()
        return round(ts[1], 3)

    calibration = _calibration_sec()
    print(f"# calibration workload: {calibration}s", file=sys.stderr)

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    # Optional subset (quiet-box re-bench of watch items without the
    # full sweep): python bench.py q1 q2 ... — BENCH_FULL.json is NOT
    # rewritten for subset runs, so the committed full-sweep artifact
    # (the shuffle gate's reference) stays intact.
    only = set(sys.argv[1:])
    subset_run = bool(only)
    if only:
        unknown = only - set(get_queries())
        if unknown:
            # a typo'd watch-item name must fail loudly, not silently
            # bench an empty set
            raise SystemExit(f"unknown query names: {sorted(unknown)}")
        shadowed = only & EXCLUDE
        if shadowed:
            # a requested-but-excluded name would pass the unknown check
            # yet be silently skipped by the sweep loop below — a
            # watch-item re-bench must not report nothing without saying
            # why (ADVICE r11)
            raise SystemExit(
                f"requested names are in EXCLUDE: {sorted(shadowed)}"
            )
    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    rows: dict[str, int] = {}
    errors: dict[str, str] = {}
    # per-query shuffle READ/WRITE bytes (median across reps) — a plan
    # can regress exchanges without moving sf0.1 wall-time, so bytes are
    # first-class bench evidence (VERDICT r8 directive #4); [-1, -1]
    # when the UI REST endpoint is unavailable
    shuffle: dict[str, list[int]] = {}
    for name, fn in get_queries().items():
        if name in EXCLUDE or (only and name not in only):
            continue
        samples: list[float] = []
        sh_samples: list[tuple[int, int]] = []
        n = -1
        for rep in range(reps):
            sh0 = shuffle_totals(spark)
            t0 = time.time()
            # One broken query must not zero the whole benchmark
            # (BENCH_r03 rc=1: a testdata schema change crashed query #28
            # and lost the timings of the 27 already-measured queries).
            try:
                from pyspark.sql import Observation
                from pyspark.sql import functions as F

                # Materialize through the noop sink, NOT count():
                # count() wraps the plan in Aggregate(count(1)), and
                # Catalyst then legally prunes whole operator bodies —
                # a final left join to an Aggregate keyed on the join
                # key is removed outright (aggregate output is unique
                # per key), and projection-only queries lose every
                # computed column. exact_span_scrub timed 0.25s as a
                # bare repartition+count while really costing ~2s; the
                # noop write consumes every row and column, so the
                # timing measures the operator (found round 12). The
                # driver's correctness gate collects rows and was
                # never affected. The row count for the artifact rides
                # the SAME execution as an observed metric — no extra
                # plan run, and the count describes the run actually
                # timed (matters for sampling queries).
                obs = Observation()
                df = fn(spark, sf_dir).observe(
                    obs, F.count(F.lit(1)).alias("n")
                )
                df.write.format("noop").mode("overwrite").save()
                n = int(obs.get["n"])
            except Exception as e:  # noqa: BLE001 — record, keep sweeping
                errors[name] = f"{type(e).__name__}: {e}"[:300]
                print(f"# {name}: ERROR {errors[name]}", file=sys.stderr)
                break
            samples.append(time.time() - t0)
            sh1 = shuffle_totals(spark)
            if sh0[0] >= 0 and sh1[0] >= 0:
                sh_samples.append((sh1[0] - sh0[0], sh1[1] - sh0[1]))
        # drop references to per-query frames and let the ContextCleaner
        # release lazily-checkpointed blocks before the next query's
        # timing window
        df = None
        gc.collect()
        if name in errors or not samples:
            continue
        samples.sort()
        timings[name] = round(samples[len(samples) // 2], 3)
        spread[name] = [round(samples[0], 3), round(samples[-1], 3)]
        rows[name] = n
        if sh_samples:
            reads = sorted(s[0] for s in sh_samples)
            writes = sorted(s[1] for s in sh_samples)
            shuffle[name] = [
                reads[len(reads) // 2],
                writes[len(writes) // 2],
            ]
        else:
            shuffle[name] = [-1, -1]
        print(
            f"# {name}: median {timings[name]:.2f}s of {reps} "
            f"[{samples[0]:.2f}, {samples[-1]:.2f}] ({n} rows, "
            f"shuffle r/w {shuffle[name][0]}/{shuffle[name][1]} B)",
            file=sys.stderr,
        )

    sf = sf_dir.rstrip("/").split("sf")[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    # Tier annotation (VERDICT r12 directive #6): replay/audit queries
    # pay a fixed multi-job evidence cost that is flat in row count;
    # separating the subtotals keeps per-row movement visible instead
    # of being masked by the fixed ~45s replay/audit block.
    from ballista_extensions_spark.queries.registry import query_tier

    tiers = {name: query_tier(name) for name in timings}
    tier_totals = {
        "fixed_evidence": round(
            sum(v for k, v in timings.items()
                if tiers[k] == "fixed_evidence"), 3),
        "per_row": round(
            sum(v for k, v in timings.items()
                if tiers[k] == "per_row"), 3),
    }
    full = {
        "metric": "total_wall_sec_all_queries",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "protocol": f"median of {reps} runs per query",
        "queries": timings,
        "min_max": spread,
        "rows": rows,
        "shuffle_read_write_bytes": shuffle,
        "errors": errors,
        "tiers": tiers,
        "tier_totals_sec": tier_totals,
        "calibration_sec": calibration,
        "sf": sf_val,
    }
    if not subset_run:
        full_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json"
        )
        with open(full_path, "w") as f:
            json.dump(full, f, indent=1, sort_keys=True)
        _report_shuffle_gate(full)
    # Printed line: slowest queries only, hard-capped at ~1800 bytes so
    # the driver's stdout window can never truncate it mid-JSON; the
    # complete per-query map is in BENCH_FULL.json.
    ranked = sorted(timings.items(), key=lambda kv: -kv[1])
    shown: dict[str, float] = {}
    base = {
        "metric": "total_wall_sec_all_queries",
        "value": round(sum(timings.values()), 2),
        "unit": "sec",
        "queries": shown,
        "n_queries": len(timings),
        "n_errors": len(errors),
        "tier_totals_sec": tier_totals,
        "full": "BENCH_FULL.json",
        "sf": sf_val,
    }
    for k, v in ranked:
        shown[k] = round(v, 2)
        if len(json.dumps(base, separators=(",", ":"))) > 1800:
            del shown[k]
            break
    print(json.dumps(base, separators=(",", ":")))


if __name__ == "__main__":
    main()
