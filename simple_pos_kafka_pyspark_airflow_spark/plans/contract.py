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
import os
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


#: Queries with a green driver row in CORRECTNESS_r02.json.  The driver
#: oracle-checks only the FIRST 50 queries in ``queries()`` order, so these
#: are rotated to the back of the driver-facing ordering: the round-3 window
#: then certifies the never-driver-checked set (all LLM-pipeline queries,
#: all 22 TPC-H shapes, and the leading uncovered analytics queries).  The
#: rotated-out queries stay covered by tests/test_contract.py, which runs
#: the full registry against the DuckDB oracle with the same compare.
_DRIVER_CERTIFIED_R02 = frozenset(
    {
        "q_scan_parquet", "q_project", "q_cast", "q_ts_parse", "q_derive_arith",
        "q_case_tiers", "q_coalesce", "q_filter_eq", "q_filter_neq",
        "q_filter_date", "q_filter_isin", "q_date_format", "q_substring_decode",
        "q_concat", "q_json_roundtrip", "q_clamp", "q_agg_sum", "q_agg_count",
        "q_agg_global", "q_distinct", "q_dropna", "q_agg_max_seq", "q_rollup",
        "q_approx_distinct", "q_sort", "q_topk", "q_union_all", "q_except",
        "q_intersect", "q_window_rank", "q_window_running", "q_window_lag",
        "q_join_left_anti", "q_join_left", "q_join_semi", "q_join_inner",
        "q_join_broadcast", "q_filter_theta", "q_stock_decrement",
        "q_join_theta", "q_upsert_semantics", "q_scan_csv", "q_sink_append",
        "q_interval_join", "q_scan_orc", "q_scan_jsonl", "q_window_ntile",
        "q_window_dense", "q_window_firstlast", "q_window_range",
    }
)


def _certified_from_disk() -> frozenset[str]:
    """Queries with a green (or clean rows-only) row in ANY recorded
    CORRECTNESS_r*.json at the repo root. Reading the driver's own records
    makes the window rotation self-maintaining: when round N's results
    land, round N+1's ordering automatically pushes the newly-certified
    queries to the back and pulls never-checked ones into the window —
    no code edit per round."""
    import glob
    import json

    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    names: set[str] = set()
    for p in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        try:
            with open(p) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        for q, row in data.items():
            if not isinstance(row, dict):
                continue
            nonvacuous = (row.get("spark_rows") or 0) > 0
            if nonvacuous and (
                row.get("hash_match") is True or row.get("err") == "no_oracle"
            ):
                # 0-row passes don't certify anything (round 1 recorded
                # vacuous greens for queries that were later rewritten)
                names.add(q)
    return frozenset(names)


def driver_ordered_registry() -> dict[str, ContractQuery]:
    """Registry ordered for the driver's 50-query verification window.

    The ordering depends on repo-root ``CORRECTNESS_r*.json`` artifacts
    read at call time — deliberate (it makes the window rotation
    self-maintaining across rounds) but a hidden input, so it is made
    visible and escapable: a log line reports how many queries the disk
    records rotated behind the window, and ``SPARK_GRAFT_STABLE_ORDER=1``
    disables the disk-derived component entirely (pure registration
    order), for deployments that need a reproducible ``queries()``
    ordering independent of checkout state.

    Priority groups (stable registration order within each):
      0. ORACLE-checked LLM-pipeline queries (dedup ladder, simsearch, text
         ops, multimodal), plus the two rows-only dedup queries that failed
         in round 1 (``q_dedup_simhash``/``q_dedup_embed``) whose fixes have
         never been driver-confirmed;
      1. the 22 TPC-H shapes;
      2. remaining never-driver-checked queries — analytics breadth first
         (oracle-checked), then the rows-only LLM queries (a rows-only
         driver row only proves "ran clean", so they yield window slots to
         value-verified queries);
      3. queries already certified green in round 2 (kept last; still run by
         the local full-registry mirror).
    """
    reg = load_registry()
    index = {name: i for i, name in enumerate(reg)}
    if os.environ.get("SPARK_GRAFT_STABLE_ORDER") == "1":
        return reg
    from_disk = _certified_from_disk()
    certified = _DRIVER_CERTIFIED_R02 | from_disk
    if from_disk - _DRIVER_CERTIFIED_R02:
        import logging

        logging.getLogger(__name__).info(
            "driver_ordered_registry: CORRECTNESS_r*.json records rotate %d "
            "certified queries behind the verification window "
            "(SPARK_GRAFT_STABLE_ORDER=1 disables)",
            len((from_disk - _DRIVER_CERTIFIED_R02) & set(reg)),
        )
    _ROWS_ONLY_PRIORITY = frozenset({"q_dedup_simhash", "q_dedup_embed"}) - certified

    def group(name: str, cq: ContractQuery) -> int:
        if name in certified:
            return 3
        if cq.build.__module__.endswith("queries_llm"):
            if cq.oracle is not None or name in _ROWS_ONLY_PRIORITY:
                return 0
            return 2
        if name.startswith("q_tpch_"):
            return 1
        return 2

    ordered = sorted(reg.items(), key=lambda kv: (group(*kv), index[kv[0]]))
    return dict(ordered)
