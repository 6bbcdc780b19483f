"""Runnable example — the distributed rank/percentile toolbox on one
table, every result computed WITHOUT a single-task global window
(operators/prefix.py: range partition -> parallel per-partition scan ->
O(partitions) driver offsets):

  1. exact percentiles       distributed_percentile_disc
  2. equi-depth histogram    distributed_row_number + ntile_from_rank
  3. winsorized mean         clamp at P5/P95, decimal-exact average
  4. Gini concentration      sorted-position formula on global ranks
  5. Pareto frontier         skyline_2d (exclusive prefix-max)

Usage: python examples/scalable_ranks.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F


def main() -> None:
    from ballista_extensions_spark import get_session, load_table
    from ballista_extensions_spark.operators.prefix import (
        distributed_percentile_disc,
        distributed_row_number,
        ntile_from_rank,
    )
    from ballista_extensions_spark.operators.skyline import skyline_2d

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_session("scalable-ranks-example")

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("price"), "o_orderkey"
    )

    print("== exact percentiles (no single-reducer buffer)")
    distributed_percentile_disc(
        o, "price", [0.05, 0.5, 0.95], tiebreak_cols=("o_orderkey",)
    ).orderBy("prob").show()

    print("== equi-depth histogram (4 buckets)")
    ranked = distributed_row_number(
        o, ["price", "o_orderkey"], out_col="rn"
    )
    tot = ranked.agg(F.max("rn").alias("n"))
    (
        ranked.crossJoin(F.broadcast(tot))
        .withColumn("bucket", ntile_from_rank("rn", "n", 4).cast("int"))
        .groupBy("bucket")
        .agg(
            F.min("price").alias("lo"),
            F.max("price").alias("hi"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("bucket")
        .show()
    )

    print("== Pareto frontier of parts (cheap price, large size)")
    p = load_table(spark, sf_dir, "part").select(
        F.col("p_retailprice").alias("price"), "p_size"
    )
    skyline_2d(p, "price", "p_size").orderBy("price").show(10)


if __name__ == "__main__":
    main()
