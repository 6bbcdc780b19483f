"""Plan-fingerprint regrade gate (VERDICT r6 directive #8).

``queries/registry.py:PRIOR_DRIVER_GRADED`` defers re-grading for
queries the driver already hash-verified — which is only sound while
their implementations are UNCHANGED. Rounds 5–7 enforced that by hand
(remove a name when you rewrite its query); this tool turns the
discipline into a mechanical gate:

- ``record``: compute a normalized fingerprint of every registered
  query's optimized logical plan at sf0.001 and write
  ``tools/plan_fingerprints.json``. Run this whenever the graded set
  is updated (i.e. when a round's CORRECTNESS results are folded into
  ``PRIOR_DRIVER_GRADED``) — the stored fingerprint then means "the
  plan the driver's green grade attests to".
- ``check`` (and ``tests/test_regrade_gate.py``): recompute at HEAD;
  any name in ``PRIOR_DRIVER_GRADED`` whose fingerprint drifted from
  the recorded one is a query that changed behavior after its last
  grading but would still dodge the driver's re-grade window — the
  exact hole the round-6 manual rotations patched.

Normalization strips expression ids (#123), plan ids, and sf paths;
LogicalRDD/LocalRelation nodes print schemas only, so fingerprints are
data-independent (verified cross-process stable). Queries whose plan
legitimately depends on data-sized driver decisions (adaptive
fallbacks) will flag on a testdata change — a SAFE false positive:
the remedy is re-grading, never suppression.

Excluded: the streaming replay queries (building their DataFrame runs
a full multi-batch stream — fingerprinting would be an execution, and
their output reads a freshly-written sink whose plan is trivially a
scan); they are graded fresh every time they change anyway because
their plan IS their code path.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import sys

FP_PATH = os.path.join(os.path.dirname(__file__), "plan_fingerprints.json")
FP_SF_DIR = "/root/testdata/sf0.001"

# Queries whose constructor executes (streaming replay staging); see
# module docstring.
EAGER_EXCLUDED = frozenset({
    "streaming_dedup_replay",
    "streaming_gapfill_replay",
    "streaming_heavy_hitters_replay",
    "streaming_media_dedup_replay",
    "streaming_phash_store_replay",
    "streaming_semdedup_replay",
    "streaming_sigstore_replay",
})

#: Sentinel recorded for plans Catalyst's RewriteDistinctAggregates has
#: touched: the rewrite numbers its per-distinct-aggregate `gid` groups
#: in an order that depends on the JVM-GLOBAL expression-id counter, so
#: the SAME code fingerprints differently depending on what ran earlier
#: in the process (observed on profile_documents, filtered_agg_orders,
#: embedding_centroids — gid groups swap). Semantically identical, so
#: the gate skips them; changes to these queries are caught by the
#: oracle + selfcheck instead.
UNSTABLE = "UNSTABLE-DISTINCT-AGG"


def plan_fingerprint(df) -> str:
    s = df._jdf.queryExecution().optimizedPlan().toString()
    if re.search(r"\bgid#", s):
        return UNSTABLE
    s = re.sub(r"#\d+", "#", s)
    # generated-name counters are JVM-global, so the suffix depends on
    # what ran earlier in the process: lambda variable names
    # (lambda x_1 vs x_7) and CSE aliases (_common_expr_1 vs _7)
    s = re.sub(r"_common_expr_\d+", "_common_expr_", s)
    s = re.sub(r"(lambda [A-Za-z]+)_\d+", r"\1_", s)
    s = re.sub(r"/root/testdata/sf[0-9.]+", "<SF>", s)
    s = re.sub(r"\[id=#?\d*\]", "[id]", s)
    # partition counts derive from SPARK_GRAFT_CPUS / default
    # parallelism (environment, not code) — normalize so the gate
    # compares plan SHAPE, not the machine it was recorded on
    s = re.sub(r"\bRepartition \d+", "Repartition <N>", s)
    s = re.sub(r"(RepartitionByExpression \[.*?\]), \d+", r"\1, <N>", s)
    return hashlib.md5(s.encode()).hexdigest()[:16]


def compute_fingerprints(
    spark, names=None, sf_dir: str = FP_SF_DIR
) -> dict[str, str]:
    from ballista_extensions_spark.queries import get_queries

    # Isolate from caller session state (temp views, conf mutations left
    # by earlier tests): fingerprints must be a function of the CODE, so
    # compute them in a fresh sibling session. load_table re-applies the
    # engine confs idempotently there.
    spark = spark.newSession()
    qs = get_queries()
    out: dict[str, str] = {}
    for name, fn in qs.items():
        if name in EAGER_EXCLUDED or (names is not None and name not in names):
            continue
        # CacheManager rewrites matching subtrees of LATER plans into
        # InMemoryRelation once any query persists a frame — fingerprint
        # the uncached shape so results don't depend on session history
        spark.catalog.clearCache()
        out[name] = plan_fingerprint(fn(spark, sf_dir))
    return out


def load_recorded() -> dict[str, str]:
    with open(FP_PATH) as f:
        return json.load(f)


def drifted_graded_names(
    spark, sf_dir: str = FP_SF_DIR, names=None
) -> list[str]:
    """Names still marked driver-graded whose plan no longer matches
    the fingerprint recorded at grading time — each one must either be
    reverted or removed from PRIOR_DRIVER_GRADED for re-grading."""
    from ballista_extensions_spark.queries.registry import PRIOR_DRIVER_GRADED

    from ballista_extensions_spark.queries.registry import QUERIES

    recorded = load_recorded()
    graded = [
        n
        for n in PRIOR_DRIVER_GRADED
        if n in QUERIES
        and n not in EAGER_EXCLUDED
        and (names is None or n in names)
    ]
    # A graded name with NO recorded fingerprint means the rotation
    # forgot `plan_fingerprint.py record` — that query would dodge the
    # gate forever. Flag it, never skip it.
    missing = [n for n in graded if n not in recorded]
    current = compute_fingerprints(
        spark, names={n for n in graded if n in recorded}, sf_dir=sf_dir
    )
    return sorted(
        missing
        + [
            n
            for n in graded
            if n in recorded
            and UNSTABLE not in (current.get(n), recorded[n])
            and current.get(n) != recorded[n]
        ]
    )


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from ballista_extensions_spark.session import get_session

    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    spark = get_session("plan-fingerprint")
    if mode == "record":
        fps = compute_fingerprints(spark)
        with open(FP_PATH, "w") as f:
            json.dump(fps, f, indent=1, sort_keys=True)
        print(f"recorded {len(fps)} fingerprints -> {FP_PATH}")
        return 0
    bad = drifted_graded_names(spark)
    if bad:
        print(
            "DRIFTED (changed since last driver grading but still in "
            f"PRIOR_DRIVER_GRADED): {bad}"
        )
        return 1
    print("all graded queries match their recorded plan fingerprints")
    return 0


if __name__ == "__main__":
    sys.exit(main())
