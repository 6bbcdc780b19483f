"""Temporal joins Spark lacks as built-ins: as-of join and range join.

These are the canonical "custom operator the host engine doesn't ship"
cases (the reference's whole subject is how to add such operators —
SURVEY.md §2 Tier D); both are expressed as compositions of built-ins
(option (a) of the custom-operator ladder), so Catalyst still optimizes
and no Python touches the hot path.

Scale designs:
- as-of join: the union+ordered-window formulation — one shuffle on the
  key, one ordered pass per key; no per-row probing, no range explosion.
  (The naive inequality join is O(n*m) per key; ours is O((n+m) log) for
  the sort.)
- range join: bucket both sides by the range width and join on
  same-or-adjacent bucket, then filter exactly — turns an inequality
  join into an equi-join with a 3x candidate factor, the standard
  interval-join decomposition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts: str = "ts",
    right_value_cols: list[str] | None = None,
    suffix: str = "_matched",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` within the same ``by`` key (NULLs when no
    prior right row exists) — backward as-of join.

    Implementation: tag and union both sides, sort per key by
    (ts, right-first), carry right values forward with
    last(ignorenulls=True), keep left rows. Right rows at exactly the
    same timestamp DO match (right sorts before left on ties), matching
    ``ASOF JOIN ... ON l.ts >= r.ts`` semantics.
    """
    rcols = right_value_cols or [
        c for c in right.columns if c not in (by, ts)
    ]
    lpart = left.select(
        F.col(by), F.col(ts), F.lit(0).alias("__is_right"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in rcols],
        F.lit(None).cast(right.schema[ts].dataType).alias("__r_ts"),
    )
    rpart = right.select(
        F.col(by), F.col(ts), F.lit(1).alias("__is_right"),
        F.lit(None).cast(lpart.schema["__left"].dataType).alias("__left"),
        *[F.col(c).alias(f"__r_{c}") for c in rcols],
        F.col(ts).alias("__r_ts"),
    )
    unioned = lpart.unionByName(rpart)
    # trailing __r_ keys: deterministic winner when several right rows
    # share (key, ts) — last() picks the largest right tuple; without
    # them the choice is sort-order luck (see asof_join_forward).
    w = (
        Window.partitionBy(by)
        .orderBy(
            F.col(ts),
            F.col("__is_right").desc(),
            *[F.col(f"__r_{c}") for c in rcols],
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__m_{c}")
            for c in rcols
        ],
        F.last("__r_ts", ignorenulls=True).over(w).alias(f"{ts}{suffix}"),
    )
    out_left = [F.col(f"__left.{c}").alias(c) for c in left.columns]
    out_right = [F.col(f"__m_{c}").alias(f"{c}{suffix}") for c in rcols]
    return (
        carried.filter(F.col("__is_right") == 0)
        .select(*out_left, *out_right, F.col(f"{ts}{suffix}"))
    )


def range_join_pairs(
    df: DataFrame,
    by: str,
    ts: str = "ts",
    id_col: str = "event_id",
    within_seconds: int = 60,
) -> DataFrame:
    """Self range-join: pairs of rows sharing ``by`` whose timestamps lie
    within ``within_seconds`` of each other (id_a < id_b).

    Bucket decomposition: each row lands in bucket floor(epoch/width);
    candidates come from equi-joining bucket b against {b-1, b, b+1}
    (explode), then the exact |dt| <= width filter. Equality semantics
    are exact; only the candidate generation is banded.
    """
    # exact integer microseconds: a timestamp cast to double loses µs
    # precision at epoch magnitude (2^-22 s ulp), so both the band filter
    # and the reported dt use unix_micros arithmetic
    width_us = within_seconds * 1_000_000
    e = df.select(
        F.col(by),
        F.col(id_col),
        F.col(ts),
        F.unix_micros(F.col(ts)).alias("__us"),
        (F.floor(F.unix_micros(F.col(ts)) / width_us)).cast("long").alias("__b"),
    )
    probes = e.select(
        F.col(by),
        F.col(id_col).alias("id_a"),
        F.col(ts).alias("ts_a"),
        F.col("__us").alias("__us_a"),
        F.explode(
            F.array(F.col("__b") - 1, F.col("__b"), F.col("__b") + 1)
        ).alias("__b"),
    )
    cands = e.select(
        F.col(by),
        F.col(id_col).alias("id_b"),
        F.col(ts).alias("ts_b"),
        F.col("__us").alias("__us_b"),
        "__b",
    )
    dt_us = F.abs(F.col("__us_a") - F.col("__us_b"))
    return (
        probes.join(cands, [by, "__b"])
        .filter((F.col("id_a") < F.col("id_b")) & (dt_us <= width_us))
        .select(
            by,
            "id_a",
            "id_b",
            "ts_a",
            "ts_b",
            (dt_us / 1_000_000.0).cast("double").alias("dt_seconds"),
        )
        .distinct()  # bucket adjacency can yield the same pair twice
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts: str = "ts",
    right_value_cols: list[str] | None = None,
    suffix: str = "_matched",
) -> DataFrame:
    """For each left row, attach the EARLIEST right row with
    ``right.ts >= left.ts`` within the same ``by`` key — forward as-of
    join (attribution: "next event at or after this one"); NULLs when no
    later right row exists. Same union+ordered-window shape as the
    backward :func:`asof_join` with the frame reversed (first-non-null
    over [current, unbounded following]); right rows at exactly the left
    timestamp DO match, mirroring DuckDB ``ASOF ... ON l.ts <= r.ts``.
    One shuffle on the key, one ordered pass — no inequality join."""
    rcols = right_value_cols or [
        c for c in right.columns if c not in (by, ts)
    ]
    lpart = left.select(
        F.col(by), F.col(ts), F.lit(0).alias("__is_right"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in rcols],
        F.lit(None).cast(right.schema[ts].dataType).alias("__r_ts"),
    )
    rpart = right.select(
        F.col(by), F.col(ts), F.lit(1).alias("__is_right"),
        F.lit(None).cast(lpart.schema["__left"].dataType).alias("__left"),
        *[F.col(c).alias(f"__r_{c}") for c in rcols],
        F.col(ts).alias("__r_ts"),
    )
    unioned = lpart.unionByName(rpart)
    # left (0) sorts before right (1) at equal ts, and the frame starts
    # at the current row — so an equal-timestamp right row is inside the
    # left row's frame (inclusive >= semantics). The trailing __r_ keys
    # break ties among right rows sharing (key, ts): without them
    # first(ignorenulls) picks whichever duplicate the sort happened to
    # place first, which is nondeterministic across runs and can diverge
    # from the oracle's tie choice. Smallest right tuple wins.
    w = (
        Window.partitionBy(by)
        .orderBy(
            F.col(ts),
            F.col("__is_right"),
            *[F.col(f"__r_{c}") for c in rcols],
        )
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = unioned.select(
        "*",
        *[
            F.first(f"__r_{c}", ignorenulls=True).over(w).alias(f"__m_{c}")
            for c in rcols
        ],
        F.first("__r_ts", ignorenulls=True).over(w).alias(f"{ts}{suffix}"),
    )
    out_left = [F.col(f"__left.{c}").alias(c) for c in left.columns]
    out_right = [F.col(f"__m_{c}").alias(f"{c}{suffix}") for c in rcols]
    return (
        carried.filter(F.col("__is_right") == 0)
        .select(*out_left, *out_right, F.col(f"{ts}{suffix}"))
    )
