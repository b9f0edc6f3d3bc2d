"""Projection / filter / scalar-expression operators.

Reference parity (SURVEY.md §2.2): the reference does projection, casts,
CASE-WHEN bucketing, coalesce-defaults and point filters either in PySpark
one-liners (``POS_spark_dag.py:378-390``) or in row-at-a-time pandas/python
(``kafka_consumer.py:111-117``, ``kafka_producer.py:41-85``). Everything
here is a pure Column expression — JVM-side, whole-stage-codegen'd, no
Python in the hot path.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: The reference's membership tiers (POS_spark_dag.py:378-384):
#: lifetime spend → Bronze < 10k ≤ Silver < 50k ≤ Gold < 100k ≤ Platinum.
DEFAULT_TIERS: Sequence[tuple[float, str]] = (
    (100_000.0, "Platinum"),
    (50_000.0, "Gold"),
    (10_000.0, "Silver"),
)
DEFAULT_TIER_FLOOR = "Bronze"


def case_tiers(
    amount: Column,
    tiers: Sequence[tuple[float, str]] = DEFAULT_TIERS,
    floor: str = DEFAULT_TIER_FLOOR,
) -> Column:
    """CASE-WHEN bucketing of a numeric column into named tiers.

    Re-expresses the reference's if/elif chain over a collected aggregate
    (``POS_spark_dag.py:378-384``) as a single catalyst expression, so it
    runs distributed instead of on the driver. Thresholds are inclusive
    lower bounds, evaluated highest-first.
    """
    expr = None
    for bound, label in sorted(tiers, reverse=True):
        cond = amount >= F.lit(bound)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    return expr.otherwise(F.lit(floor)) if expr is not None else F.lit(floor)


def membership_tiers(
    customers: DataFrame,
    orders: DataFrame,
    cust_key: str,
    order_cust_key: str,
    amount_col: str,
    tiers: Sequence[tuple[float, str]] = DEFAULT_TIERS,
    floor: str = DEFAULT_TIER_FLOOR,
) -> DataFrame:
    """The reference's flagship computation (``POS_spark_dag.py:365-392``):

    lifetime spend per customer → tier label → left-join back to the
    customer dimension → customers with no purchases default to the floor
    tier via ``coalesce`` (``POS_spark_dag.py:390``).

    Scale: the aggregate shuffles once on the customer key; the join of the
    (small) per-customer aggregate back to customers is an equi-join on the
    same key, so AQE typically plans a broadcast of the aggregate side. At
    100 TB the orders fact is pre-partitioned by ``order_cust_key`` so the
    groupBy is shuffle-free.
    """
    spend = (
        orders.groupBy(F.col(order_cust_key).alias(cust_key))
        .agg(F.sum(amount_col).alias("lifetime_spend"))
        .withColumn("membership_level", case_tiers(F.col("lifetime_spend"), tiers, floor))
    )
    # the reference CUSTOMERS table already carries membership_level (it is
    # the column this computation REFRESHES) — drop any previous value
    # before the join, or the coalesce below hits an ambiguous reference
    dim = customers
    for stale in ("membership_level", "lifetime_spend"):
        if stale in dim.columns:
            dim = dim.drop(stale)
    return (
        dim.join(spend, on=cust_key, how="left")
        .withColumn("membership_level", F.coalesce(F.col("membership_level"), F.lit(floor)))
        .withColumn("lifetime_spend", F.coalesce(F.col("lifetime_spend"), F.lit(0.0)))
    )


def decode_prefix(col: Column, mapping: dict[str, str], default: str = "Unknown") -> Column:
    """First-character decode (reference ``kafka_producer.py:70-79``: the
    leading char of ``product_id`` keys a category dict). Small static maps
    become a WHEN chain — constant-folded, no join, no UDF."""
    prefix = F.substring(col, 1, 1)
    expr = None
    for k, v in sorted(mapping.items()):
        cond = prefix == F.lit(k)
        expr = F.when(cond, v) if expr is None else expr.when(cond, v)
    return expr.otherwise(F.lit(default)) if expr is not None else F.lit(default)


def clamp(col: Column, lo: float, hi: float) -> Column:
    """Bounded numeric input (reference streamlit ``min_value=`` widgets,
    ``kafka_producer.py:114-115``) as ``greatest(least(x, hi), lo)`` —
    with NULL propagated explicitly: Spark's (and DuckDB's) least/greatest
    SKIP nulls, so a bare composition would turn a missing measurement
    into the UPPER bound (least(NULL, hi) = hi), fabricating the maximum
    allowed value out of absent data."""
    return F.when(col.isNull(), F.lit(None)).otherwise(
        F.greatest(F.least(col, F.lit(hi)), F.lit(lo))
    )
