"""Runnable example — the embedded single-process lifecycle, mirroring
the reference's examples/datafusion.rs (build session -> read parquet ->
sample(0.4, 42) -> show). The distributed variants (client/scheduler/
executor in the reference) have no separate processes here: the same
code runs on a cluster by changing the master URL — Spark ships the plan
and stages for you (SURVEY.md §3.1 mapping).

Usage: python examples/flagship.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F


def main() -> None:
    from ballista_extensions_spark import get_session, load_table
    from ballista_extensions_spark.operators.sample import sample

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_session("flagship-example")

    # examples/datafusion.rs:26-30 shape: scan -> sample -> show
    lineitem = load_table(spark, sf_dir, "lineitem")
    sampled = sample(lineitem, 0.40, seed=42)
    sampled.show(5)

    # and the flagship analytical pipeline on the sampled data
    (
        sampled.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag", "l_linestatus")
        .show()
    )
    sampled.explain()


if __name__ == "__main__":
    main()
