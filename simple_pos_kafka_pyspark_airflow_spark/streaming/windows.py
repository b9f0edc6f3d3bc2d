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
    return _select_windowed(g.agg(*aggs), "window", keys)


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
    return _select_windowed(g.agg(*aggs), "window", keys)


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
    return _select_windowed(g.agg(*aggs), "session_window", keys)


def dedup_with_watermark(df: DataFrame, keys: list[str], ts_col: str, lateness: str) -> DataFrame:
    """Streaming duplicate-key rejection (T7): the reference's producer-side
    "is this id already in the CSV" guard (``kafka_producer.py:41-58``) —
    duplicates are identified by KEY ALONE, exactly like the reference
    (a retried event re-stamped with a fresh timestamp is still the same
    sale and must be rejected; including the timestamp in the dedup
    subset would wave it through and double-count).

    Streaming path: ``dropDuplicatesWithinWatermark(keys)`` — state is
    one entry per key within the lateness horizon and is EVICTED once
    the watermark passes (plain ``dropDuplicates(keys)`` on a stream
    never evicts a subset-keyed state and grows O(all keys ever)). Batch
    twin: plain key dedup, same result set.
    """
    if df.isStreaming:
        return df.withWatermark(ts_col, lateness).dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)


def _select_windowed(agged: DataFrame, window_col: str, keys: list[str]) -> DataFrame:
    """Flatten (window struct, keys, aggs) → (window_start, window_end,
    keys, aggs). Agg output names come from the aggregated frame's OWN
    schema — never from parsing ``Column.__repr__``, whose format is
    version-dependent and silently yields garbage for un-aliased or
    lowercase-``as`` expressions."""
    agg_names = agged.columns[1 + len(keys):]
    return agged.select(
        F.col(f"{window_col}.start").alias("window_start"),
        F.col(f"{window_col}.end").alias("window_end"),
        *keys,
        *[F.col(c) for c in agg_names],
    )


def ohlc_stream(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_cents: Column,
    order_key: Column,
    duration: str = "1 day",
    watermark: str | None = None,
) -> DataFrame:
    """Streaming twin of ``operators/timeseries.ohlc``: OHLC candlestick
    bars over event-time tumbling windows. Identical aggregate set
    (min_by/max_by/min/max/sum/count — every one incrementalizable, so
    the stream keeps six numbers of state per open (key, window) and the
    watermark closes/evicts bars), identical exactness contract
    (``value_cents`` integer grid, ``order_key`` a total order so
    open/close are replay-deterministic regardless of micro-batch
    arrival order). Batch mode computes the same plan exactly — the
    equivalence test drains an AvailableNow stream and compares
    bar-for-bar with the batch operator."""
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    agged = df.groupBy(F.window(F.col(ts_col), duration), F.col(key_col)).agg(
        F.min_by(value_cents, order_key).alias("open_cents"),
        F.max(value_cents).alias("high_cents"),
        F.min(value_cents).alias("low_cents"),
        F.max_by(value_cents, order_key).alias("close_cents"),
        F.sum(value_cents).alias("volume_cents"),
        F.count("*").alias("n"),
    )
    return agged.select(
        F.col("window.start").alias("bucket_ts"),
        key_col,
        "open_cents",
        "high_cents",
        "low_cents",
        "close_cents",
        "volume_cents",
        "n",
    )
