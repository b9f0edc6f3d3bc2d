"""Window-function operators (extension; SURVEY.md §2.8).

The reference computes membership level and purchase frequency with
groupBy + join-back (``POS_spark_dag.py:375-412``) where a window would be
idiomatic; it has no true window functions. These are the standard forms
the engine exposes. All require a *total* per-partition order (callers
append a unique tiebreak column) so results are deterministic and
oracle-comparable.

Scale: a window partitioned by a key is one shuffle on that key; skewed
partitions (one customer with 10^9 orders) serialize within the partition —
mitigate with pre-aggregation or bucket-salting before ranking.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ranked(df: DataFrame, partition: str, order: list[Column], out: str = "rn") -> DataFrame:
    """row_number() per partition under an explicit total order."""
    w = Window.partitionBy(partition).orderBy(*order)
    return df.withColumn(out, F.row_number().over(w))


def running(
    df: DataFrame, partition: str, order: list[Column], value: str, out: str = "running"
) -> DataFrame:
    """Running sum per partition: rowsBetween(unboundedPreceding, current)."""
    w = (
        Window.partitionBy(partition)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out, F.sum(value).over(w))


def lagged(
    df: DataFrame, partition: str, order: list[Column], value: str, out: str = "prev"
) -> DataFrame:
    """lag(value, 1) per partition — inter-event deltas."""
    w = Window.partitionBy(partition).orderBy(*order)
    return df.withColumn(out, F.lag(value, 1).over(w))
