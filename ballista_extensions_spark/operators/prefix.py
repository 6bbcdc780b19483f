"""Distributed prefix aggregation — scalable global cumulative sums and
global ranks without a single-partition window.

Spark's ``Window.orderBy(...)`` with no ``partitionBy`` moves EVERY row to
one task (WindowExec warns "No Partition Defined"); correct on a dimension
table, fatal on a 100 TB fact table. The classic fix — the same plan
Ballista/DataFusion would pick for a global ``SUM() OVER (ORDER BY ...)``
(reference planner.rs builds per-partition physical nodes and merges; we
re-express the idea with Spark primitives) — is a two-phase scan:

1. range-partition by the sort key (``repartitionByRange`` samples key
   quantiles, so partitions are contiguous key ranges and partition id
   order == key order);
2. per-partition running aggregate (a window partitioned by
   ``spark_partition_id()`` — parallel, no global shuffle to one task);
3. per-partition totals (one row per partition) collect to the driver —
   bounded by the partition count, NOT the data — get exclusive-prefix
   summed, and broadcast back as offsets.

The result is row-for-row identical to the global window when the order
columns form a total order (callers must pass a tiebreak column — same
discipline as every rank query in this repo).

Exactness: use decimal value columns for bit-exact parity with a SQL
oracle (decimal addition is associative/commutative — partial sums per
partition then an offset add give the same digits as a sequential scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

__all__ = [
    "distributed_cummax",
    "distributed_cumsum",
    "distributed_percentile_disc",
    "distributed_row_number",
    "grouped_percentile_disc",
    "ntile_from_rank",
]

_PID = "__bx_pid"
_LOCAL = "__bx_local"
_OFF = "__bx_offset"
_MID = "__bx_mid"

# monotonically_increasing_id() packs (partition_id << 33) | sequence:
# 33 bits of per-partition counter. The arithmetic recovery of the
# local row number below is exact only while no partition exceeds
# 2^33 rows — enforced fail-fast in the offsets loop (at the 100 TB
# posture a partition is sized to executor memory, orders of magnitude
# below 8.5e9 rows).
_MID_SEQ_BITS = 33


def _range_partitioned(df: DataFrame, order_cols: list[str], num_partitions: int | None):
    from ballista_extensions_spark.io import default_parallelism

    n = num_partitions or default_parallelism(df.sparkSession)
    part = df.repartitionByRange(n, *[F.col(c) for c in order_cols])
    # Materialize ONCE: the per-partition totals job and the final output
    # job must see identical partitioning (range bounds are sampled, so a
    # re-execution could draw different bounds and mis-align offsets).
    return part.withColumn(_PID, F.spark_partition_id()).localCheckpoint()


def _range_sorted_indexed(
    df: DataFrame, order_cols: list[str], num_partitions: int | None
):
    """Range-partition, sort within partitions, and bake a
    per-partition sequence number into the checkpoint — the zero-
    extra-exchange substrate for global row numbering.

    Why not a ``Window.partitionBy(spark_partition_id())``: the
    localCheckpoint scan is an ``ExistingRDD`` with UNKNOWN output
    partitioning, so Catalyst inserts an ``Exchange
    hashpartitioning(__bx_pid)`` to satisfy the window — a SECOND
    full-corpus shuffle per consumer. Worse, a caller that fans the
    ranked frame out (rank + total + per-value min, the percent-rank
    shape) plans one IDENTICAL exchange per consumer, and AQE's
    exchange reuse dedupes them only best-effort under concurrent
    stage materialization — the r14 `customer_percent_rank_scalable`
    shuffle-byte drift (+35% run-to-run on identical code/data) was
    exactly that race. Here the local sequence is
    ``monotonically_increasing_id`` arithmetic computed INSIDE the
    checkpointed stage (pid<<33 | seq, assigned in the sorted order
    pinned by sortWithinPartitions): downstream consumers read the
    checkpoint and do pure projection — no exchange, no sort, no
    window, nothing for AQE to reuse or race."""
    from ballista_extensions_spark.io import default_parallelism

    n = num_partitions or default_parallelism(df.sparkSession)
    cols = [F.col(c) for c in order_cols]
    return (
        df.repartitionByRange(n, *cols)
        .sortWithinPartitions(*cols)
        .withColumn(_PID, F.spark_partition_id())
        .withColumn(_MID, F.monotonically_increasing_id())
        .localCheckpoint()
    )


def _distributed_prefix(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str,
    agg,
    fold,
    combine,
    frame_end,
    num_partitions: int | None,
) -> DataFrame:
    """Shared two-phase prefix scaffolding for any ASSOCIATIVE window
    aggregate: range-partition (checkpointed so the sampled bounds are
    pinned), per-partition window ``agg`` over the frame, per-partition
    totals collected and ``fold``ed into exclusive-prefix offsets on
    the driver (NULL totals skipped — they contribute nothing), then a
    broadcast join applying ``combine(local, offset)`` with the shared
    NULL discipline: a NULL offset (nothing before this partition)
    passes the local prefix through; a NULL local prefix (only NULLs so
    far in this partition) takes the offset. All three public prefix
    operators (`cumsum`, `cummax`, `row_number`) are instances; fixes
    to the invariants here fix them all at once."""
    part = _range_partitioned(df, order_cols, num_partitions)
    w = (
        Window.partitionBy(_PID)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, frame_end)
    )
    local = part.withColumn(_LOCAL, agg(value_col).over(w))
    totals = local.groupBy(_PID).agg(agg(value_col).alias("__t")).collect()
    totals.sort(key=lambda r: r[_PID])
    offsets, acc = [], None
    for r in totals:
        offsets.append((int(r[_PID]), acc))
        t = r["__t"]
        if t is not None:
            acc = t if acc is None else fold(acc, t)
    total_type = local.schema[_LOCAL].dataType
    off_df = df.sparkSession.createDataFrame(
        offsets, schema=f"{_PID} int, {_OFF} {total_type.simpleString()}"
    )
    joined = local.join(F.broadcast(off_df), _PID)
    out = (
        F.when(F.col(_OFF).isNull(), F.col(_LOCAL))
        .when(F.col(_LOCAL).isNull(), F.col(_OFF))
        .otherwise(combine(F.col(_LOCAL), F.col(_OFF)))
    )
    return joined.withColumn(out_col, out).drop(_PID, _LOCAL, _OFF)


def distributed_cumsum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global ``SUM(value) OVER (ORDER BY order_cols ROWS UNBOUNDED
    PRECEDING .. CURRENT ROW)`` computed with per-partition parallelism.

    ``order_cols`` must be a total order (include a tiebreak key).
    Driver state: one (pid, total) pair per partition — O(partitions),
    independent of row count; the offset table broadcasts back. NULL
    discipline matches SUM OVER: NULL values contribute nothing, and a
    prefix that has seen only NULLs is NULL (see _distributed_prefix).
    """
    return _distributed_prefix(
        df,
        order_cols,
        value_col,
        out_col,
        F.sum,
        lambda a, b: a + b,
        lambda lo, off: lo + off,
        Window.currentRow,
        num_partitions,
    )


def _spark_max(a, b):
    # Spark's MAX orders NaN GREATER than any double (unlike Python's
    # max, where `nan > x` is False and the accumulator would drop
    # it) — once a partition's max is NaN every later offset is NaN.
    if isinstance(a, float) and a != a:
        return a
    if isinstance(b, float) and b != b:
        return b
    return max(a, b)


def distributed_cummax(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "cummax",
    inclusive: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """Global ``MAX(value) OVER (ORDER BY order_cols ROWS UNBOUNDED
    PRECEDING .. CURRENT ROW)`` (or ``.. 1 PRECEDING`` with
    ``inclusive=False`` — the exclusive prefix a skyline scan needs):
    max is associative, so the shared two-phase plan reproduces the
    sequential scan exactly (and bit-exactly — max never rounds). The
    driver fold orders NaN greatest, matching Spark MAX. NULL
    discipline matches MAX OVER (see _distributed_prefix)."""
    return _distributed_prefix(
        df,
        order_cols,
        value_col,
        out_col,
        F.max,
        _spark_max,
        F.greatest,
        Window.currentRow if inclusive else -1,
        num_partitions,
    )


def distributed_row_number(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global ``ROW_NUMBER() OVER (ORDER BY order_cols)`` via the
    two-phase plan: per-partition sequence + exclusive prefix of
    per-partition counts. ``order_cols`` must be a total order.

    The per-partition sequence is ``monotonically_increasing_id``
    arithmetic baked into the range-sorted checkpoint
    (:func:`_range_sorted_indexed`) — NOT a window over
    ``spark_partition_id()``, which would re-shuffle the whole frame a
    second time per consumer and expose fan-out callers to the AQE
    exchange-reuse race (the r14 shuffle-byte-drift adjudication).
    Downstream of the checkpoint this is projection + one broadcast
    join: exchange-free, deterministic plan and bytes."""
    part = _range_sorted_indexed(df, order_cols, num_partitions)
    local = part.withColumn(
        _LOCAL,
        ((F.col(_MID) % F.lit(1 << _MID_SEQ_BITS)) + 1).cast("long"),
    )
    counts = local.groupBy(_PID).agg(F.count(F.lit(1)).alias("__t")).collect()
    counts.sort(key=lambda r: r[_PID])
    offsets, acc = [], 0
    for r in counts:
        if int(r["__t"]) > (1 << _MID_SEQ_BITS):
            raise ValueError(
                f"distributed_row_number: partition {r[_PID]} holds "
                f"{r['__t']} rows, beyond the 2^{_MID_SEQ_BITS} "
                "per-partition sequence range — raise num_partitions"
            )
        offsets.append((int(r[_PID]), acc))
        acc += r["__t"]
    off_df = df.sparkSession.createDataFrame(
        offsets, schema=f"{_PID} int, {_OFF} long"
    )
    joined = local.join(F.broadcast(off_df), _PID)
    return joined.withColumn(
        out_col, (F.col(_LOCAL) + F.col(_OFF)).cast("long")
    ).drop(_PID, _LOCAL, _OFF, _MID)


def distributed_percentile_disc(
    df: DataFrame,
    value_col: str,
    probs: list[float],
    tiebreak_cols: tuple[str, ...] = (),
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact global ``PERCENTILE_DISC(p) WITHIN GROUP (ORDER BY value)``
    for several probabilities at once, with NO single-task sort.

    Spark's built-in percentile aggregates buffer the group's values in
    one aggregation state — a whole-TABLE percentile funnels every value
    through one reducer. Here the rank comes from
    :func:`distributed_row_number` (range partition + parallel rank +
    O(partitions) offsets); the SQL-standard target rank ceil(p*n) is
    computed in exact integer arithmetic (Fraction, never float — a
    1-ulp error in p*n flips the selected row exactly when p*n is
    integral, which is the common case for round probabilities); the
    result is the tiny rank-filter join. DuckDB's quantile_disc /
    percentile_disc use the same ceil(p*n) convention (probe-verified),
    so results are value-identical across engines.

    Returns one row per prob: (prob, <value_col>, rank, n). Driver
    state: one count scalar + the per-partition offsets — O(partitions).
    """
    from fractions import Fraction

    ranked = distributed_row_number(
        df,
        [value_col, *tiebreak_cols],
        out_col="__bx_rn",
        num_partitions=num_partitions,
    )
    row = ranked.agg(F.max("__bx_rn").alias("n")).first()
    n = int(row["n"] or 0)
    targets = []
    for p in probs:
        fr = Fraction(str(p))
        rank = -((-fr.numerator * n) // fr.denominator)  # ceil(p*n), exact
        targets.append((float(p), max(1, rank)))
    spark = df.sparkSession
    tgt = spark.createDataFrame(targets, schema="prob double, __bx_rn long")
    return (
        ranked.join(F.broadcast(tgt), "__bx_rn")
        .select(
            "prob",
            F.col(value_col),
            F.col("__bx_rn").alias("rank"),
            F.lit(n).cast("long").alias("n"),
        )
    )


def grouped_percentile_disc(
    df: DataFrame,
    group_col: str,
    value_col: str,
    probs: list[float],
    tiebreak_cols: tuple[str, ...] = (),
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact per-group ``PERCENTILE_DISC(p) WITHIN GROUP (ORDER BY
    value)`` with NO per-group window — the grouped twin of
    :func:`distributed_percentile_disc`.

    ``Window.partitionBy(group)`` caps parallelism at the group count
    and funnels 1/groups of the fact table through each task — fatal
    when groups are few (5 order priorities) and rows are 100 TB. Here
    the rank comes from ONE global :func:`distributed_row_number` over
    ``(group, value, tiebreaks)`` — parallelism = range partitions, not
    groups — and each group's rank is recovered as
    ``global_rank - group_start + 1``. The per-group (start, count)
    frame is bounded by group cardinality (a dimension) and broadcasts;
    the SQL-standard target rank ceil(p*n_g) is computed in exact
    integer arithmetic (prob as numerator/denominator longs — float
    ceil flips the selected row exactly when p*n is integral).

    Returns one row per (group, prob): (group, prob, <value_col>,
    rank, n). ``tiebreak_cols`` must totalize the per-group order for
    cross-engine determinism. NULL values are excluded up front — the
    SQL-standard PERCENTILE_DISC ignores them; without the filter the
    distributed rank would sort NULLs FIRST and count them in n,
    selecting a NULL for small p. A group whose values are ALL NULL
    still emits one row per prob with value NULL, rank NULL, n=0
    (matching ``GROUP BY`` + ``PERCENTILE_DISC``), and a NULL group
    KEY is a group like any other (null-safe join). ``probs`` must be
    exactly representable with denominator <= 10^6 (0.25, 0.1, ...) —
    a float-artifact denominator like Fraction(1/3)'s 10^16 signals
    the caller passed an inexact float, not a probability; the target
    rank itself is computed with the multiply in DECIMAL(38,0), so no
    group size a long can count overflows it.
    """
    from fractions import Fraction

    fracs = [Fraction(str(p)) for p in probs]
    for p, fr in zip(probs, fracs):
        if fr.denominator > 10**6:
            raise ValueError(
                f"prob {p!r} has denominator {fr.denominator} > 1e6; "
                "pass an exactly-representable probability (e.g. round "
                "to 6 decimal places) — a denominator like 10^16 means "
                "the caller passed an inexact float artifact, not the "
                "probability they intended"
            )

    # fan-out safe without a second checkpoint: re-consuming the
    # ranked frame is projection + broadcast join over the internal
    # range-sorted checkpoint — no exchange to duplicate or race
    ranked = distributed_row_number(
        df.filter(F.col(value_col).isNotNull()),
        [group_col, value_col, *tiebreak_cols],
        out_col="__bx_grn",
        num_partitions=num_partitions,
    )
    stats = ranked.groupBy(group_col).agg(
        F.min("__bx_grn").alias("__g0"),
        F.count(F.lit(1)).cast("long").alias("__gn"),
    )
    pr = df.sparkSession.createDataFrame(
        [(float(p), fr.numerator, fr.denominator) for p, fr in zip(probs, fracs)],
        schema="prob double, __num long, __den long",
    )
    tgt = (
        stats.crossJoin(F.broadcast(pr))
        .select(
            F.col(group_col).alias("__bx_g"),
            "prob",
            "__g0",
            F.col("__gn").alias("n"),
            # ceil(num/den * gn) with the multiply in DECIMAL(38,0):
            # long `__num * __gn` silently wraps under the non-ANSI
            # config once gn > LONG_MAX/num (~9.2e12 rows at num=1e6 —
            # plausible at this module's 100 TB posture). The decimal
            # product is exact (1e6 * 9.2e18 < 1e38) and the quotient
            # is <= gn (num <= den for a probability), so the final
            # cast back to LONG never overflows.
            F.greatest(
                F.lit(1).cast("long"),
                F.expr(
                    "CAST((CAST(__num AS DECIMAL(38,0)) * __gn + __den - 1)"
                    " div __den AS LONG)"
                ),
            ).alias("__bx_target"),
        )
    )
    joined = ranked.join(
        F.broadcast(tgt),
        F.col(group_col).eqNullSafe(F.col("__bx_g"))
        & (F.col("__bx_grn") == F.col("__g0") + F.col("__bx_target") - F.lit(1)),
    )
    out = joined.select(
        group_col,
        "prob",
        F.col(value_col),
        F.col("__bx_target").alias("rank"),
        F.col("n"),
    )
    # Groups with zero non-NULL values were filtered before ranking;
    # SQL still returns them (value NULL, n = 0). The group-key frame
    # is dimension-bounded, so the anti-join + cross with probs is
    # broadcast-sized.
    value_type = df.schema[value_col].dataType.simpleString()
    nonempty = stats.select(F.col(group_col).alias("__bx_sg"))
    empty_groups = (
        df.select(group_col)
        .distinct()
        .join(
            nonempty,
            F.col(group_col).eqNullSafe(F.col("__bx_sg")),
            "left_anti",
        )
    )
    empties = empty_groups.crossJoin(F.broadcast(pr.select("prob"))).select(
        group_col,
        "prob",
        F.lit(None).cast(value_type).alias(value_col),
        F.lit(None).cast("long").alias("rank"),
        F.lit(0).cast("long").alias("n"),
    )
    return out.unionByName(empties)


def ntile_from_rank(rn_col: str, n_col: str, k: int):
    """Exact ``NTILE(k)`` reconstructed from a global rank column and a
    total-count column — the scalable replacement for
    ``ntile(k).over(Window.orderBy(...))`` when the rank comes from
    :func:`distributed_row_number`.

    NTILE's fill rule: with q = n div k and r = n mod k, the first r
    tiles hold q+1 rows and the rest hold q. The CASE short-circuits per
    row, so the div-by-q branch is never evaluated when q = 0 (n < k
    puts every row in the first branch because then r = n).
    """
    q = f"({n_col} div {k})"
    r = f"({n_col} % {k})"
    return F.expr(
        f"CASE WHEN {rn_col} <= {r} * ({q} + 1) "
        f"THEN ({rn_col} - 1) div ({q} + 1) + 1 "
        f"ELSE {r} + 1 + ({rn_col} - {r} * ({q} + 1) - 1) div {q} END"
    )
