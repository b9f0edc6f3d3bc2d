"""Stream-stream joins (extension; Structured Streaming state-bounded).

The reference never joins two live streams — its consumer materializes
each topic to CSV and the hourly batch joins the files
(``POS_spark_dag.py:143-155``), paying a full-file rescan per tick and
losing any cross-topic event that spans the tick boundary. The idiomatic
Structured Streaming form is a watermarked interval join: both sides
declare bounded lateness, the join condition carries an event-time range,
and the engine keeps only the state inside the watermark horizon.

Scale: state per side is O(rows within the interval + watermark window),
partitioned by the join key — the cluster-wide cost is the *rate × horizon*
product, independent of stream age. Without the time bound Spark must keep
EVERY past row of both streams (unbounded state) — these helpers make the
bound mandatory.

Batch DataFrames accept the identical plan (the range condition becomes a
plain theta predicate), which is how the contract tests verify the join
semantics against a SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    lower: str = "0 seconds",
    upper: str = "15 minutes",
    left_watermark: str | None = None,
    right_watermark: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join events of two streams with equal ``on`` keys where
    ``right_ts ∈ [left_ts - lower, left_ts + upper]``.

    ``lower``/``upper`` are interval strings (e.g. ``'10 minutes'``).
    Watermarks are REQUIRED on a real stream (state would otherwise grow
    unboundedly; outer rows additionally only emit once the watermark
    closes their interval) — they default to None so batch verification
    runs the same function unchanged.

    Output: left columns + right columns; EVERY right column that
    collides with a left name — not just the key and timestamp — is
    renamed with a ``r_`` prefix, so the joined schema is genuinely
    unambiguous (two streams of the same event family routinely share
    value column names like ``amount``; leaving those duplicated would
    make any downstream reference throw AMBIGUOUS_REFERENCE).
    """
    if left_watermark is not None:
        left = left.withWatermark(left_ts, left_watermark)
    if right_watermark is not None:
        right = right.withWatermark(right_ts, right_watermark)
    left_names = set(left.columns)
    renamed = right
    for c in right.columns:
        if c in (*on, right_ts) or c in left_names:
            renamed = renamed.withColumnRenamed(c, f"r_{c}")
    r_ts = F.col(f"r_{right_ts}")
    cond = r_ts.between(
        F.col(left_ts) - F.expr(f"INTERVAL {lower}"),
        F.col(left_ts) + F.expr(f"INTERVAL {upper}"),
    )
    for c in on:
        cond = cond & (F.col(c) == F.col(f"r_{c}"))
    return left.join(renamed, cond, how)
