"""Aggregation operators.

Reference parity (SURVEY.md §2.5): groupBy-sum for lifetime spend
(``POS_spark_dag.py:375-376``), groupBy-count for purchase frequency
(``:405-406``), global counts as emptiness gates (``:369,399``),
``dropna().dropDuplicates()`` cleaning (``:96,310``) and the monotonic
``sale_id`` sequence from a tracker file (``kafka_consumer.py:56-79``).

The reference's ``df.rdd.isEmpty()`` anti-pattern (``POS_spark_dag.py:91``
etc.) is deliberately NOT reproduced: ``DataFrame.isEmpty()`` stays in the
optimized plan and reads at most one row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_sequence(
    df: DataFrame,
    existing: DataFrame,
    existing_id: str,
    order_by: list[str],
    out: str = "new_id",
) -> DataFrame:
    """Monotonic id assignment: new rows get ids continuing after
    ``max(existing[id_col])``.

    The reference keeps the last id in a tracker file and increments it one
    message at a time in a single consumer thread
    (``kafka_consumer.py:56-68,74-79``) — correct only because it is
    single-threaded. Distributed re-expression: one ``max()`` over the
    existing table plus ``row_number()`` over a deterministic order of the
    batch. Ids are dense and unique *per batch*; cross-batch monotonicity
    comes from re-reading the max (streaming: keyed state, see
    ``streaming/state.py``).

    Scale: ``row_number`` over a global order is a single-partition sort in
    the worst case; for 100 TB batches switch the window to a salted
    two-phase ranking or use ``monotonically_increasing_id`` when density
    is not required. Batch CDC inserts are small relative to the warehouse,
    so the global window is acceptable there.
    """
    base = existing.agg(F.coalesce(F.max(existing_id), F.lit(0)).alias("__m"))
    w = Window.orderBy(*[F.col(c) for c in order_by])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .crossJoin(F.broadcast(base))
        .withColumn(out, (F.col("__m") + F.col("__rn")).cast("long"))
        .drop("__rn", "__m")
    )


def clean(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """The reference's pre-load cleaning (``POS_spark_dag.py:96``):
    drop null rows, then exact-duplicate rows. One shuffle (the distinct);
    the na-drop is a pushed filter."""
    return df.na.drop(subset=subset).dropDuplicates()
