"""Streaming gapfill + LOCF — the continuous-aggregate side of
operators/timeseries.time_bucket_gapfill.

A TimescaleDB-style continuous aggregate emits DENSE buckets as time
advances, carrying the last observation across empty buckets — state
that must survive micro-batch boundaries. Spark's built-in windowing
aggregates within buckets but will not synthesize the missing ones, so
the dense axis lives in ``applyInPandasWithState``: per series the
state is just (last_bucket, last_value), and each batch emits the new
buckets plus every gap bucket between the previous batch's frontier
and them — a gap spanning a micro-batch boundary is filled exactly as
if the stream had been one batch.

Input contract: one row per (series, bucket) — i.e. AFTER the
per-bucket aggregation — with buckets arriving in order per series
ACROSS batches (within a batch any order; the kernel sorts). Late
buckets behind a series' frontier would need retraction semantics no
LOCF sink can express; they raise loudly rather than corrupting the
carried value. Buckets ride as epoch seconds (long) so state is two
scalars; callers bucket with ``date_trunc`` + ``unix_timestamp``.

Scale: state per series is O(1); parallelism = series cardinality,
same as the batch operator. Emission is bounded by observed + gap
buckets per batch — a series silent for a long stretch emits its
backlog when it next appears, which is the semantics of filling
between OBSERVED buckets (the batch twin's min..max contract).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["locf_gapfill_stream"]


def locf_gapfill_stream(
    df: DataFrame,
    series_col: str,
    bucket_col: str,
    value_col: str,
    step_seconds: int,
) -> DataFrame:
    """Dense (series, bucket_epoch, value, is_gap) rows from a stream of
    per-bucket observations; gaps carry the last observed value forward,
    including across micro-batch boundaries. ``outputMode`` append."""
    if step_seconds <= 0:
        raise ValueError(f"step_seconds must be positive, got {step_seconds}")
    keyed = df.select(
        F.col(series_col).cast("string").alias("series"),
        F.col(bucket_col).cast("long").alias("bucket"),
        F.col(value_col).cast("double").alias("value"),
    ).filter(
        # a NULL bucket cannot be placed on the dense axis; unfiltered
        # it reaches pandas as NaN and int(b) dies with a non-diagnostic
        # ValueError inside the state function
        F.col("bucket").isNotNull()
    )

    def update(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        last_b, last_v = state.get if state.exists else (None, None)
        out_b: list[int] = []
        out_v: list[float] = []
        out_gap: list[bool] = []
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values("bucket")
        for b, v in zip(batch["bucket"], batch["value"]):
            b = int(b)
            if last_b is not None:
                if b <= last_b:
                    raise ValueError(
                        f"late/duplicate bucket {b} behind frontier {last_b} "
                        f"for series {key[0]!r}; LOCF needs in-order buckets "
                        "per series"
                    )
                for g in range(last_b + step_seconds, b, step_seconds):
                    out_b.append(g)
                    out_v.append(last_v)
                    out_gap.append(True)
            out_b.append(b)
            out_v.append(float(v) if pd.notna(v) else None)
            out_gap.append(False)
            last_b, last_v = b, (float(v) if pd.notna(v) else last_v)
        state.update((last_b, last_v))
        yield pd.DataFrame(
            {
                "series": [key[0]] * len(out_b),
                "bucket": out_b,
                "value": out_v,
                "is_gap": out_gap,
            }
        )

    return keyed.groupBy("series").applyInPandasWithState(
        update,
        outputStructType=(
            "series string, bucket long, value double, is_gap boolean"
        ),
        stateStructType="last_b long, last_v double",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
