"""Registry of contract queries.

Each operator the engine claims (SURVEY.md §2) is declared here as a
``ContractQuery``: a Spark builder ``(spark, sf_dir) -> DataFrame`` plus,
where SQL-expressible, an equivalent DuckDB oracle query. The driver (and
our own tests, which mirror its compare) runs both and checks row count,
schema, and an order-insensitive value hash.

Determinism rules every query obeys (so hashes match across engines):

- floating-point canonicalization depends on where the value can land:
  *sums* of 2-decimal money land within ulps of exact cent multiples, far
  from the .xx5 rounding tie, so ``ROUND(x, 2)`` is stable across Spark
  (HALF_UP) and DuckDB (half-even); *per-row products* CAN land exactly on
  .xx5 midpoints where the engines' tie modes diverge, so those use
  ``FLOOR(x * 100)`` over the bit-identical IEEE product instead (exact
  same double → exact same floor on both engines). Never ROUND a per-row
  product; never FLOOR-cents a sum (sums sit AT cent boundaries, where a
  one-ulp order-of-summation difference flips the floor). Raw pass-through
  doubles are left untouched — bit-identical by construction;
- DuckDB's ``SUM(int) -> HUGEINT`` and ``COUNT -> BIGINT`` are cast to
  match Spark's LongType; window ``row_number`` cast to INT on both sides;
- any ``LIMIT``/window ordering includes a unique key as tiebreak;
- computed columns are aliased to the same name on both sides.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

BuildFn = Callable[[SparkSession, str], DataFrame]

#: Modules whose import registers queries (order = SURVEY §2 order).
_QUERY_MODULES = (
    "simple_pos_kafka_pyspark_airflow_spark.plans.queries_relational",
    "simple_pos_kafka_pyspark_airflow_spark.plans.queries_joins",
    "simple_pos_kafka_pyspark_airflow_spark.plans.queries_analytics",
    "simple_pos_kafka_pyspark_airflow_spark.plans.queries_tpch",
    "simple_pos_kafka_pyspark_airflow_spark.plans.queries_llm",
)


@dataclass(frozen=True)
class ContractQuery:
    name: str
    category: str  # scan|project|filter|function|join|agg|sort|setop|window|upsert|stream|llm
    build: BuildFn
    oracle: str | None  # DuckDB SQL over registered views, or None => rows-only check
    notes: str = ""


_REGISTRY: dict[str, ContractQuery] = {}


def register(
    name: str, category: str, oracle: str | None = None, notes: str = ""
) -> Callable[[BuildFn], BuildFn]:
    """Decorator: add a query builder to the registry under ``name``."""

    def deco(fn: BuildFn) -> BuildFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate contract query {name!r}")
        _REGISTRY[name] = ContractQuery(name, category, fn, oracle, notes)
        return fn

    return deco


def load_registry() -> dict[str, ContractQuery]:
    """Import all query modules (idempotent) and return the registry."""
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    return dict(_REGISTRY)
