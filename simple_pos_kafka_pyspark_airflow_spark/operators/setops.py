"""Set operations.

Reference parity (SURVEY.md §2.7): loop-folded unions of per-file
DataFrames (``POS_spark_dag.py:149-152``) and pandas ``concat``
(``kafka_producer.py:282,458``). The reference's deep left-leaning union
tree of single-file reads is an anti-pattern (SURVEY.md §4 #4); multi-path
reads or a single ``unionByName`` fold keep the plan shallow.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame


def union_all(*dfs: DataFrame) -> DataFrame:
    """UNION ALL by column name (order-insensitive, fails on mismatch).

    Unlike positional ``union``, ``unionByName`` is immune to column-order
    drift between inputs — the bug class the reference risks with
    inferSchema per file."""
    if not dfs:
        raise ValueError("union_all needs at least one DataFrame")
    return reduce(DataFrame.unionByName, dfs)
