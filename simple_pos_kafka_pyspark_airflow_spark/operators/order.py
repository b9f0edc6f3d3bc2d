"""Sort / limit / top-k operators.

Reference parity (SURVEY.md §2.6): key-ordered rewrites of state files
(``kafka_consumer.py:103,221,313``; ``POS_spark_dag.py:155``) and the
producer's "last 5 sales" display (``kafka_producer.py:151``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


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
