"""Event-time windowing + watermark helpers (T4/T8).

The reference's only "window" is processing-time daily file partitioning
(``sales_YYYYMMDD.csv``, ``kafka_consumer.py:82-83``) and the hourly mtime
micro-batch (``POS_spark_dag.py:66-79``); late events silently land in the
wrong day (T8). These helpers express the same cadences as *event-time*
windows with bounded lateness — correct under reordering, identical
results on replay.

All four shapes work on batch DataFrames too (same functions, same plan)
which is how the contract tests verify them against SQL oracles; on a
stream they incrementalize with state cleaned up by the watermark.

Scale: a windowed agg shuffles on (key, window) — at 100 TB pick window
sizes so per-(key,window) state stays small, and always set a watermark or
state grows without bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.column import Column


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: list[str],
    aggs: list[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Non-overlapping fixed windows — the reference's daily sales files
    (T4) as ``F.window(ts, '1 day')``. Emits window_start/window_end plus
    the grouping keys and aggregates."""
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    g = df.groupBy(F.window(F.col(ts_col), duration), *keys)
    return g.agg(*aggs).select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *keys,
        *[F.col(c) for c in _agg_names(aggs)],
    )


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    keys: list[str],
    aggs: list[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Overlapping windows (duration > slide ⇒ each event lands in
    duration/slide windows). The smoothing the reference can't express."""
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    g = df.groupBy(F.window(F.col(ts_col), duration, slide), *keys)
    return g.agg(*aggs).select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *keys,
        *[F.col(c) for c in _agg_names(aggs)],
    )


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: list[str],
    aggs: list[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Session windows: events within ``gap`` of each other merge into one
    window per key (``F.session_window``). Streaming requires a watermark
    to close sessions; batch mode computes them exactly."""
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    g = df.groupBy(F.session_window(F.col(ts_col), gap), *keys)
    return g.agg(*aggs).select(
        F.col("session_window.start").alias("window_start"),
        F.col("session_window.end").alias("window_end"),
        *keys,
        *[F.col(c) for c in _agg_names(aggs)],
    )


def dedup_with_watermark(df: DataFrame, keys: list[str], ts_col: str, lateness: str) -> DataFrame:
    """Streaming duplicate-key rejection (T7): the reference's producer-side
    "is this id already in the CSV" guard (``kafka_producer.py:41-58``) as
    ``dropDuplicates`` with watermark-bounded state — O(keys within the
    lateness horizon) instead of O(all history)."""
    return df.withWatermark(ts_col, lateness).dropDuplicates([*keys, ts_col])


def _agg_names(aggs: list[Column]) -> list[str]:
    """Output names of aliased aggregate columns (callers alias every agg,
    per the engine's determinism rules)."""
    names = []
    for c in aggs:
        # Column.__repr__ is "Column<'sum(x) AS total'>"
        r = repr(c)
        names.append(r.rsplit(" AS ", 1)[-1].rstrip("'>") if " AS " in r else r)
    return names
