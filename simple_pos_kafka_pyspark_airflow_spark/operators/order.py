"""Sort / limit / top-k operators.

Reference parity (SURVEY.md §2.6): key-ordered rewrites of state files
(``kafka_consumer.py:103,221,313``; ``POS_spark_dag.py:155``) and the
producer's "last 5 sales" display (``kafka_producer.py:151``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def topk(df: DataFrame, k: int, *order: Column) -> DataFrame:
    """Top-k by explicit ordering. ``orderBy().limit(k)`` compiles to
    TakeOrderedAndProject: each task keeps a k-row heap and only k·P rows
    ever move — no global sort, which is the difference between O(n log k)
    and a full shuffle at 100 TB. Callers must pass a total order (include
    a unique key as tiebreak) for deterministic results."""
    return df.orderBy(*order).limit(k)


def sorted_output(df: DataFrame, *cols: str) -> DataFrame:
    """Global ORDER BY for final output. At scale prefer
    ``sortWithinPartitions`` + partitioned sink (the reference's per-file
    key sort is exactly sort-within-partition semantics)."""
    return df.orderBy(*cols)


def zorder_key(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton (Z-order) interleave of two non-negative int columns into
    one long sort key: bit i of ``a`` lands at position 2i, bit i of
    ``b`` at 2i+1 — so rows close in BOTH dimensions are close in the
    key.

    Why this exists at 100 TB: parquet prunes row groups by per-column
    min/max statistics, but sorting by one column leaves the other's
    ranges spanning everything — a 2-D range query (time window × key
    range) then prunes on one dimension only. ``sortWithinPartitions``
    on the Z key clusters BOTH dimensions into each row group, so both
    columns' footer stats tighten and a 2-D predicate skips most of the
    file (this is the layout trick behind Delta/Iceberg OPTIMIZE
    ZORDER, expressed as a plain column + sort — no table format
    needed). Everything is shiftright/bitwise-and/shiftleft — codegen
    intrinsics, no UDF.

    Inputs must already be non-negative and fit ``bits`` bits (quantize
    first: e.g. ``unix_timestamp/3600`` hour buckets, ``pmod(key, 2^16)``
    ranges); 2·bits ≤ 62 keeps the result in a positive long. The key
    ORDERS the layout, it never answers queries — predicates stay on the
    original columns, which is what makes the technique free to adopt.
    """
    from pyspark.sql import functions as F

    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    ai = a.cast("long")
    bi = b.cast("long")
    key = F.lit(0).cast("long")
    for i in range(bits):
        key = (
            key
            + F.shiftleft(F.shiftright(ai, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(bi, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return key


def skyline_2d(df: DataFrame, x: Column, y: Column, partition: str | None = None) -> DataFrame:
    """2-D skyline (Pareto front): the rows not DOMINATED by any other —
    no other row with both metrics ≥ and at least one strictly > — the
    curation question "which documents are best for SOME tradeoff of
    these two qualities" answered without picking weights.

    The textbook sort-scan beats the naive all-pairs O(n²) self-join:
    rank the distinct x values descending, then a point survives iff its
    y equals its x-group's max AND strictly exceeds the running max of
    y over all STRICTLY greater x (dense_rank + one range-window max —
    group boundaries, not row offsets, so duplicate x is handled
    exactly). Dominance never materializes a pair.

    The front depends only on the DISTINCT (x, y) point set, so the
    sort-scan runs over ``distinct(keys, x, y)`` — a partial-aggregable
    collapse that typically shrinks the window input by orders of
    magnitude — and the surviving points semi-join back to the fact
    (shuffle on (x, y), fully distributed; AQE broadcasts the front
    when it is small). Duplicated (x, y) rows are mutually
    non-dominated and all survive the semi-join, matching the NOT
    EXISTS definition the contract oracle runs.

    With ``partition=None`` the window still orders the distinct-point
    set in ONE task — bounded by |distinct (x, y)|, not by the fact
    size, but callers with a huge exact point domain should quantize
    the metrics or pass ``partition``; the per-group form partitions
    the window and has no single-task stage at all.

    ``x``/``y`` should be integer metrics (exact comparisons); pass
    ``partition`` to compute one front per group (the window partitions
    by it — same single exchange)."""
    from pyspark.sql import Window

    keys = [partition] if partition else []
    d = df.withColumn("__x", x).withColumn("__y", y)
    pts = d.select(*keys, "__x", "__y").distinct()
    w_rank = Window.partitionBy(*keys).orderBy(F.col("__x").desc())
    pts = pts.withColumn("__g", F.dense_rank().over(w_rank))
    w_grp = Window.partitionBy(*keys, "__g")
    w_prev = (
        Window.partitionBy(*keys)
        .orderBy("__g")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    pts = pts.withColumn("__gmax", F.max("__y").over(w_grp)).withColumn(
        "__pmax", F.max("__y").over(w_prev)
    )
    front = pts.where(
        (F.col("__y") == F.col("__gmax"))
        & (F.col("__pmax").isNull() | (F.col("__y") > F.col("__pmax")))
    ).select(*keys, "__x", "__y")
    return d.join(front, [*keys, "__x", "__y"], "left_semi").drop("__x", "__y")
