"""Spark Connect smoke: exercise the CLIENT-SIDE plan-protobuf boundary.

``local-cluster`` (tests/test_distributed.py) covers the scheduler /
executor serialization boundaries; Spark Connect additionally covers
boundary #1 of the reference's lifecycle (SURVEY.md §3.1): the CLIENT
serializes the unresolved logical plan to protobuf and ships it to the
server for analysis and execution — the closest Spark analogue of the
reference's logical extension codec (src/codec/extension.rs:39-117,
which encodes the custom Sample node into the wire plan).

Requirements: the Connect server jar (ships with this distribution:
jars/spark-connect_2.13-*.jar) AND the Python client dependencies
(grpcio + friends). This container ships the jar but NOT grpcio, so the
test self-skips with that diagnosis; on an environment with grpcio
installed it runs as-is — `SparkSession.builder.remote("local[4]")`
auto-starts a local Connect server and every DataFrame operation below
round-trips through the protobuf plan channel.

Runs in a subprocess (like the local-cluster smoke) so the Connect
session never fights the suite's classic session over one driver JVM.
"""

from __future__ import annotations

import importlib.util
import json
import os
import subprocess
import sys

import pytest

def _absent(mod: str) -> bool:
    try:
        return importlib.util.find_spec(mod) is None
    except ModuleNotFoundError:  # parent package itself missing
        return True


_MISSING = [m for m in ("grpc", "google.protobuf", "grpc_status") if _absent(m)]

_SCRIPT = r"""
import json, sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

# remote("local[4]") starts an in-process Connect SERVER and connects a
# grpc client to it: plans built below travel client -> protobuf ->
# server analyzer, never the classic py4j path.
spark = SparkSession.builder.remote("local[4]").getOrCreate()
out = {"is_connect": "connect" in type(spark).__module__}

import __spark_entry__ as e
sf = "/root/testdata/sf0.001"
out["entry_rows"] = len(e.entry(spark).collect())
qs = e.queries()
out["dedup_rows"] = len(qs["dedup_exact"](spark, sf).collect())
out["sample_rows"] = len(qs["sample_lineitem"](spark, sf).collect())
spark.stop()
print("RESULT:" + json.dumps(out))
"""


@pytest.mark.skipif(
    bool(_MISSING),
    reason=(
        "Spark Connect Python client deps absent in this container "
        f"(missing: {', '.join(_MISSING)}); the server jar is present — "
        "install grpcio/grpcio-status to enable this boundary test"
    ),
)
def test_queries_survive_connect_plan_boundary():
    env = dict(os.environ)
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
        cwd="/tmp",
    )
    lines = [
        line for line in proc.stdout.splitlines() if line.startswith("RESULT:")
    ]
    assert proc.returncode == 0 and lines, (
        f"subprocess failed rc={proc.returncode}\n"
        f"stdout tail: {proc.stdout[-2000:]}\nstderr tail: {proc.stderr[-2000:]}"
    )
    got = json.loads(lines[0][len("RESULT:") :])
    assert got["is_connect"]
    assert got["entry_rows"] > 0
    assert got["dedup_rows"] > 0
    assert got["sample_rows"] > 0


def test_connect_gap_is_env_only():
    """VERDICT r7 directive #7: the Connect boundary test must skip for
    exactly ONE reason — the grpc client deps are absent from the
    container (no PyPI reachability to vendor them; verified again this
    round). If this test ever fails, grpcio has appeared in the
    environment: delete this guard and the boundary test above
    auto-activates. Any OTHER missing module here means the skip reason
    drifted and the diagnosis needs updating."""
    assert _MISSING, (
        "grpc deps present — the Connect boundary test should now RUN; "
        "remove this marker test"
    )
    assert set(_MISSING) <= {"grpc", "google.protobuf", "grpc_status"}
    assert "grpc" in _MISSING
