"""Runtime shuffle-byte metrics via the Spark UI REST API.

Wall-time alone can hide an exchange regression: at sf0.1 an extra
shuffle of a small frame moves the clock by noise-level milliseconds,
but at 100 TB it is the difference between a map-side pipeline and a
cluster-wide repartition. ``BENCH_FULL.json`` therefore records
per-query shuffle read/write BYTES next to the timings (VERDICT r8
directive #4), and the zero-shuffle claims asserted structurally in
plan tests (bucketed CDC merge, bucketed joins, single-pass text
aggregates) are re-proven at RUNTIME by ``tests/test_shuffle_bytes.py``
with these helpers.

Why REST and not a listener: classic (non-Connect) PySpark has no
Python SparkListener without a py4j callback server, and per-stage
endpoints evict under ``spark.ui.retainedStages`` during a 200-query
sweep. The ``allexecutors`` endpoint exposes CUMULATIVE
``totalShuffleRead``/``totalShuffleWrite`` per executor — never
evicted, so before/after diffs are exact at any sweep length. Local
HTTP to the app's own UI; no external service involved.
"""

from __future__ import annotations

import json
import urllib.request
from collections.abc import Callable

from pyspark.sql import SparkSession


def _drain_listener_bus(spark: SparkSession) -> None:
    """Wait for the async listener bus to finish posting task-end
    events into AppStatusStore — the REST counters lag execution by
    however deep that queue is, so without the drain a query's bytes
    can be attributed to the NEXT measurement window (bench medians
    and the zero-shuffle gates would both flake). Same call Spark's
    own test suites use; best-effort because the py4j surface is
    internal."""
    try:
        spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty()
    except Exception:  # noqa: BLE001 — internal API; degrade silently
        pass


def shuffle_totals(spark: SparkSession) -> tuple[int, int]:
    """Cumulative (shuffle_read_bytes, shuffle_write_bytes) across all
    executors since application start. Returns (-1, -1) if the UI is
    disabled (spark.ui.enabled=false) or returns anything other than
    the expected JSON, so callers degrade to wall-time-only instead of
    crashing the sweep."""
    sc = spark.sparkContext
    if not sc.uiWebUrl:
        return (-1, -1)
    _drain_listener_bus(spark)
    url = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}/allexecutors"
    try:
        with urllib.request.urlopen(url, timeout=10) as resp:
            data = json.load(resp)
        return (
            sum(e.get("totalShuffleRead", 0) for e in data),
            sum(e.get("totalShuffleWrite", 0) for e in data),
        )
    except (OSError, ValueError, TypeError, AttributeError):
        # OSError: socket/HTTP transport; ValueError: non-JSON body
        # (proxy error page, truncation); Type/AttributeError: JSON of
        # an unexpected shape
        return (-1, -1)


def measure_shuffle(
    spark: SparkSession, action: Callable[[], object]
) -> tuple[int, int]:
    """Run ``action`` and return the (read, write) shuffle bytes it
    caused. (-1, -1) when the UI is unavailable."""
    r0, w0 = shuffle_totals(spark)
    action()
    if r0 < 0:
        return (-1, -1)
    r1, w1 = shuffle_totals(spark)
    if r1 < 0:
        return (-1, -1)
    return (r1 - r0, w1 - w0)
