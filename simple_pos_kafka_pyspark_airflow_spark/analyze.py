"""Physical-plan introspection: the numbers behind the scale rules.

``plan_summary`` distills ``df.explain("formatted")`` into the counts the
engine's plan discipline is stated in (docs/SCALE.md, tests/test_plans.py):
exchanges (each one a full shuffle of its input), broadcast vs sort-merge
joins, scans and whether their filters reached the reader, and cartesian
products (always a bug). CI pins shapes with these; operators print them
while tuning — the loop is "write the query, read the summary, fix the
shape" instead of eyeballing raw explain output.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_text(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (``df.explain`` only prints)."""
    jmode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(jmode)


def plan_summary(df: DataFrame) -> dict[str, object]:
    """Count the plan features the engine's scale rules are written in.

    Keys: ``exchanges``, ``broadcast_joins``, ``sort_merge_joins``,
    ``cartesian_products``, ``scans``, ``scans_with_pushed_filters``,
    ``windows``, ``reused_exchanges``, ``tables`` (scanned file roots).
    """
    plan = explain_text(df)
    scans = re.findall(r"Location: \S+ \[file:([^\]]*)\]", plan)
    pushed = [p for p in re.findall(r"PushedFilters: \[([^\]]*)\]", plan) if p.strip()]

    def nodes(name: str) -> int:
        # count each physical node exactly ONCE via its numbered detail
        # header "(N) NodeName". Raw substring counting was doubly wrong:
        # formatted explain prints every node twice (tree line + detail
        # header), and "Exchange" also substring-matches BroadcastExchange
        # and ReusedExchange — a broadcast-only plan with ZERO shuffles
        # reported exchanges=4, so thresholds pinned against the metric
        # were calibrated on 2x-inflated, broadcast-contaminated counts.
        return len(re.findall(rf"\(\d+\) {name}\b", plan))

    return {
        "exchanges": nodes("Exchange"),
        "reused_exchanges": nodes("ReusedExchange"),
        "broadcast_joins": nodes("BroadcastHashJoin") + nodes("BroadcastNestedLoopJoin"),
        "sort_merge_joins": nodes("SortMergeJoin"),
        "cartesian_products": nodes("CartesianProduct"),
        "scans": len(scans),
        "scans_with_pushed_filters": len(pushed),
        "windows": nodes("Window"),
        "tables": sorted({s.rstrip("/").rsplit("/", 1)[-1] for s in scans}),
    }


def observed(df: DataFrame, name: str, **metrics):
    """Attach in-flight pipeline metrics to a plan — Spark's
    ``Observation`` API, the production observability the reference's
    pipelines lack entirely (their only signal is the Airflow task
    status; reference ``POS_spark_dag.py:438-465``).

    ``metrics`` are aggregate *expressions* (``F.count``, ``F.sum``,
    ``F.count_if`` …) evaluated ON THE ROWS FLOWING THROUGH this point
    of the plan during the NEXT action — zero extra scans, zero extra
    jobs, collected on the driver as task-completion listeners fire.
    This is how a 100 TB curation run reports rows-in / rows-dropped /
    null-rates per stage without re-aggregating anything.

    Returns ``(df, observation)``; read ``observation.get`` AFTER an
    action has materialized the plan (it blocks until the metrics
    arrive). Batch only — streaming queries report through each
    micro-batch's ``StreamingQueryProgress.observedMetrics`` instead.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    return df.observe(obs, *[m.alias(k) for k, m in metrics.items()]), obs
