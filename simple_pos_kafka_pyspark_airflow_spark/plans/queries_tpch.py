"""The rest of the TPC-H suite (Q2..Q22), adapted to the testdata star.

With q1/q3/q5/q6/q7/q10/q14/q18 in ``queries_analytics``, this module
completes all 22 TPC-H query shapes. The testdata schema (TESTDATA.md) has
no ``partsupp``, no ``l_commitdate``/``l_receiptdate``/``l_shipmode``, and
no ``c_phone``, so the affected queries are *adapted* — same plan shape,
same operator mix, substituted predicates — and each adaptation is applied
IDENTICALLY to the Spark build and the DuckDB oracle, so every query keeps
an exact value-compare:

- ``partsupp`` (Q2, Q11, Q16, Q20) → the supply relation derived from
  shipments: ``SELECT l_partkey, l_suppkey, MIN(l_extendedprice /
  l_quantity) AS supplycost, SUM(l_quantity) AS availqty FROM lineitem
  GROUP BY 1, 2``. One extra shuffle on (part, supp) — exactly how a
  lakehouse would materialize a missing dimension from the fact table.
- lateness (Q4 via q_exists_subquery, Q12, Q21) → ``l_shipdate >
  o_orderdate + INTERVAL n DAY`` replaces the commit/receipt comparison.
- ``l_shipmode`` (Q12) → ``o_orderpriority`` classes; ``c_phone`` country
  code (Q22) → ``c_nationkey``.

Scale notes (100 TB): every query below keeps dims (region/nation/part/
supplier) broadcast-eligible, aggregates facts BEFORE joining dims where
the semantics allow (Q2/Q11/Q15/Q17/Q20 pre-aggregate lineitem), and uses
windows instead of self-joins for per-group extremes (Q2, Q15) so the fact
table shuffles once on its natural key. LIMIT queries carry unique
tiebreaks per contract.py determinism rules.

TPC-H text: public spec (tpc.org); the reference implements none of these
— they are north-star warehouse breadth (SURVEY.md §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from .contract import register

#: Derived supply relation shared by Q2/Q11/Q16/Q20 (DuckDB CTE text).
SUPPLY_CTE = """
    supply AS (
        SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
               MIN(l_extendedprice / l_quantity) AS ps_supplycost,
               MIN(l_extendedprice) AS ps_minprice,
               SUM(l_quantity) AS ps_availqty
        FROM lineitem GROUP BY 1, 2
    )
"""


def _supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of SUPPLY_CTE: map-side partial agg collapses the fact
    table to |part × supp| rows before the single (partkey, suppkey)
    shuffle; at 100 TB this materializes once and is bucket-cached."""
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy(
            F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
        )
        .agg(
            F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_supplycost"),
            F.min("l_extendedprice").alias("ps_minprice"),
            F.sum("l_quantity").alias("ps_availqty"),
        )
    )


@register(
    "q_tpch_q2",
    "join",
    oracle=f"""
    WITH {SUPPLY_CTE}
    SELECT ROUND(s_acctbal, 2) AS s_acctbal, s_name, n_name, p_partkey, p_type,
           CAST(FLOOR(ps_supplycost * 10000) AS BIGINT) AS cost_e4
    FROM part
    JOIN supply   ON p_partkey = ps_partkey
    JOIN supplier ON ps_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE p_size IN (15, 25, 35) AND p_type = 'LARGE' AND r_name = 'EUROPE'
      AND ps_supplycost = (
          SELECT MIN(ps2.ps_supplycost)
          FROM supply ps2
          JOIN supplier s2 ON ps2.ps_suppkey = s2.s_suppkey
          JOIN nation n2   ON s2.s_nationkey = n2.n_nationkey
          JOIN region r2   ON n2.n_regionkey = r2.r_regionkey
          WHERE ps2.ps_partkey = p_partkey AND r2.r_name = 'EUROPE')
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    notes="TPC-H Q2 (min-cost supplier; supply relation derived from "
    "lineitem — no partsupp in testdata): correlated MIN subquery expressed "
    "as a min-over-window per part, eliminating the second scan+join pass "
    "the literal subquery implies. The quotient-valued cost is emitted as "
    "FLOOR(x*10000) integer units — cross-engine ROUND of a quotient "
    "double diverges (contract.py), floor of the bit-identical double "
    "cannot. s_acctbal is a raw 2-dec source column, safe to ROUND",
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part").where(
        F.col("p_size").isin(15, 25, 35) & (F.col("p_type") == "LARGE")
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    eur_supply = (
        _supply(spark, sf_dir)
        .join(s, F.col("ps_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    # window-min over the partkey replaces the correlated subquery: one
    # shuffle on ps_partkey instead of re-scanning supply per part.
    # The size/type part filter restricts the PARTITION KEY set, so it
    # commutes with the per-partkey min — semi-join it below the window
    # (the Q17 pattern, VERDICT r7 item 4) and the window sorts only the
    # ~1% of supply rows whose part survives, not all of Europe's supply
    # no forced broadcast: the filtered partkey set is ~1% of part, but at
    # SF1000 that is still millions of keys — AQE promotes to broadcast at
    # runtime from the REAL post-filter size (VERDICT r7 item 5)
    keep = eur_supply.join(
        p.select("p_partkey"),
        F.col("ps_partkey") == F.col("p_partkey"),
        "left_semi",
    )
    w = Window.partitionBy("ps_partkey")
    best = keep.withColumn("min_cost", F.min("ps_supplycost").over(w)).where(
        F.col("ps_supplycost") == F.col("min_cost")
    )
    return (
        best.join(p, F.col("ps_partkey") == p.p_partkey)
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
            F.floor(F.col("ps_supplycost") * 10000).cast("long").alias("cost_e4"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q_tpch_q4",
    "join",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    notes="TPC-H Q4 (order priority checking; lateness = shipdate > "
    "orderdate+90d, testdata has no commitdate): correlated EXISTS → "
    "left-semi join by Catalyst, one shuffle",
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.date_add(o.o_orderdate, 90).cast("timestamp")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q_tpch_q8",
    "join",
    oracle="""
    SELECT o_year,
           ROUND(SUM(CASE WHEN n2.n_name = 'NATION_7' THEN volume ELSE 0 END)
                 / SUM(volume), 6) AS mkt_share
    FROM (
        SELECT EXTRACT(year FROM o_orderdate) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               s_nationkey
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
          AND o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
    ) all_nations
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    GROUP BY o_year
    ORDER BY o_year
    """,
    notes="TPC-H Q8 (national market share): 7-table join, conditional "
    "aggregation ratio; nation/region broadcast twice under different "
    "roles (customer-side filter, supplier-side share)",
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate").between(
            F.lit("1995-01-01").cast("timestamp"), F.lit("1996-12-31").cast("timestamp")
        )
    )
    c = table(spark, sf_dir, "customer")
    n1 = table(spark, sf_dir, "nation").alias("n1")
    n2 = table(spark, sf_dir, "nation").alias("n2")
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        # part side unhinted: ECONOMY is ~1/6 of part (3M+ rows at SF100);
        # AQE picks broadcast only when the runtime size clears the bar
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1.n_nationkey"))
        .join(F.broadcast(r), F.col("n1.n_regionkey") == r.r_regionkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2.n_nationkey"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            vol.alias("volume"),
            F.col("n2.n_name").alias("supp_nation"),
        )
    )
    share = F.sum(F.when(F.col("supp_nation") == "NATION_7", F.col("volume")).otherwise(0.0))
    return (
        joined.groupBy("o_year")
        .agg(F.round(share / F.sum("volume"), 6).alias("mkt_share"))
        .orderBy("o_year")
    )


@register(
    "q_tpch_q9",
    "join",
    oracle="""
    SELECT n_name AS nation, o_year, ROUND(SUM(amount), 2) AS sum_profit
    FROM (
        SELECT n_name, EXTRACT(year FROM o_orderdate) AS o_year,
               l_extendedprice * (1 - l_discount) AS amount
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    notes="TPC-H Q9 (product-type profit; amount drops the ps_supplycost "
    "term — no partsupp): LIKE-filtered part broadcast into the fact, "
    "supplier-nation rollup by year",
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    n = table(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        # part side unhinted: a LIKE-filtered part is ~1-2M rows at SF100
        # (VERDICT r7 item 5) — AQE decides from the runtime size
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            amount.alias("amount"),
        )
    )
    return (
        joined.groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 2).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@register(
    "q_tpch_q11",
    "agg",
    oracle=f"""
    WITH {SUPPLY_CTE}
    SELECT ps_partkey, ROUND(value, 2) AS value
    FROM (
        SELECT ps_partkey, SUM(ps_minprice * ps_availqty) AS value
        FROM supply
        JOIN supplier ON ps_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_3'
        GROUP BY ps_partkey
    ) part_value
    WHERE value > (
        SELECT SUM(ps_minprice * ps_availqty) * 0.001
        FROM supply
        JOIN supplier ON ps_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_3')
    ORDER BY value DESC, ps_partkey
    """,
    notes="TPC-H Q11 (important stock; supply derived from lineitem): "
    "grouped value vs a scalar-subquery threshold — Spark computes the "
    "threshold with a global agg reused via a cross-joined 1-row broadcast, "
    "not a second scan of the base fact. The value weight is ps_minprice "
    "(a native cent-lattice column), NOT the quotient ps_supplycost: "
    "quotient sums land ON .xx5 rounding boundaries where engine summation "
    "order flips the cent, and even per-row ROUND of the same quotient "
    "double diverges (Spark exact-BigDecimal HALF_UP vs DuckDB multiply-"
    "then-nearbyint — both observed live); cent×integer addends stay ulps "
    "from a lattice point, half a cent from any boundary (contract.py)",
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    nation_supply = (
        _supply(spark, sf_dir)
        .join(s, F.col("ps_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("ps_partkey", (F.col("ps_minprice") * F.col("ps_availqty")).alias("v"))
    )
    per_part = nation_supply.groupBy("ps_partkey").agg(F.sum("v").alias("value"))
    threshold = nation_supply.agg((F.sum("v") * 0.001).alias("threshold"))
    return (
        per_part.join(F.broadcast(threshold))
        .where(F.col("value") > F.col("threshold"))
        .select("ps_partkey", F.round("value", 2).alias("value"))
        .orderBy(F.col("value").desc(), "ps_partkey")
    )


@register(
    "q_tpch_q12",
    "join",
    oracle="""
    SELECT l_returnflag AS shipclass,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >  o_orderdate + INTERVAL 60 DAY
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY shipclass
    ORDER BY shipclass
    """,
    notes="TPC-H Q12 (shipping modes/priority; l_returnflag stands in for "
    "l_shipmode, lateness = shipdate > orderdate+60d): join + conditional "
    "counts, date filter pushed to the parquet scan",
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    joined = o.join(li, o.o_orderkey == li.l_orderkey).where(
        li.l_shipdate > F.date_add(o.o_orderdate, 60).cast("timestamp")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        joined.groupBy(F.col("l_returnflag").alias("shipclass"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("shipclass")
    )


@register(
    "q_tpch_q13",
    "agg",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
        SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
        FROM customer
        LEFT JOIN orders ON c_custkey = o_custkey
                        AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    notes="TPC-H Q13 (customer order distribution): left join with an "
    "ON-clause filter (not WHERE — preserves order-less customers), then "
    "a two-level aggregation; second agg is tiny (distinct counts)",
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "q_tpch_q15",
    "join",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               SUM(l_extendedprice * (1 - l_discount)) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, ROUND(total_revenue, 2) AS total_revenue
    FROM supplier
    JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    notes="TPC-H Q15 (top supplier): revenue CTE + scalar MAX — Spark "
    "reuses one aggregated DataFrame for both the rows and the max "
    "(broadcast 1-row join), so lineitem scans once",
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    s = table(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("mx"))
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", F.round("total_revenue", 2).alias("total_revenue"))
        .orderBy("s_suppkey")
    )


@register(
    "q_tpch_q16",
    "agg",
    oracle=f"""
    WITH {SUPPLY_CTE}
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM supply
    JOIN part ON p_partkey = ps_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    notes="TPC-H Q16 (supplier count by part attrs; supply derived from "
    "lineitem, negative-acctbal suppliers stand in for the complaints "
    "filter): NOT IN → left-anti join, distinct-count per 3-col group",
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    bad = table(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        _supply(spark, sf_dir)
        # part side unhinted (13% of part survives the size list — AQE
        # decides); bad stays hinted: key-only rows off supplier, a table
        # 100x smaller than part, so it broadcasts at any SF
        .join(p, F.col("ps_partkey") == p.p_partkey)
        .join(F.broadcast(bad), F.col("ps_suppkey") == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@register(
    "q_tpch_q17",
    "agg",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3'
      AND l_quantity < (
          SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2
          WHERE l2.l_partkey = p_partkey)
    """,
    notes="TPC-H Q17 (small-quantity revenue; no p_container in testdata "
    "— brand-only filter): correlated AVG → per-part window average, one "
    "lineitem shuffle on partkey instead of a rescan per row. The brand "
    "semi-join runs BELOW the window (VERDICT r7 item 2): the window "
    "partitions by the same key the filter restricts, so filtering first "
    "is value-identical and the window sort touches only the branded "
    "~1/25 slice instead of the whole fact table — at 100 TB that is the "
    "difference between sorting 4 TB and sorting 100 TB",
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#3").select("p_partkey")
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity", "l_extendedprice")
    # the equi-filter on the window's OWN partition key commutes with the
    # per-part average: semi-join to the branded partkeys first, so the
    # window runs over exactly the partitions that survive anyway
    # brand slice is ~1/25 of part; unhinted so AQE broadcasts from the
    # measured size instead of trusting a forced hint at any SF
    branded = li.join(p, li.l_partkey == p.p_partkey, "left_semi")
    w = Window.partitionBy("l_partkey")
    flagged = branded.withColumn("avg_qty", F.avg("l_quantity").over(w))
    return flagged.where(F.col("l_quantity") < 0.5 * F.col("avg_qty")).agg(
        F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly")
    )


@register(
    "q_tpch_q19",
    "join",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#5' AND p_size BETWEEN 1 AND 35
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
    notes="TPC-H Q19 (discounted revenue, disjunctive predicates; "
    "container/shipmode terms dropped with the columns): OR-of-ANDs across "
    "join sides — Catalyst extracts the common join key so it stays a hash "
    "join with a residual filter, not a cross product",
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    # p is the FULL part table (the disjunctive filter needs its columns
    # post-join): never force-broadcast an unfiltered dimension — 20M rows
    # at SF100. AQE demotes to shuffle join exactly when it must
    j = li.join(p, li.l_partkey == p.p_partkey)
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & (q >= 1) & (q <= 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25) & (q >= 10) & (q <= 20))
        | ((F.col("p_brand") == "Brand#5") & F.col("p_size").between(1, 35) & (q >= 20) & (q <= 30))
    )
    return j.where(cond).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
    )


@register(
    "q_tpch_q20",
    "join",
    oracle=f"""
    WITH {SUPPLY_CTE}
    SELECT s_name, s_suppkey
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_2'
      AND s_suppkey IN (
          SELECT ps_suppkey FROM supply
          WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
            AND ps_availqty > (
                SELECT 0.5 * SUM(l_quantity) FROM lineitem
                WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
                  AND l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l_shipdate <  TIMESTAMP '1997-01-01'))
    ORDER BY s_suppkey
    """,
    notes="TPC-H Q20 (excess availability; supply derived from lineitem): "
    "nested IN chain → semi joins; the correlated half-year demand becomes "
    "a pre-aggregated (part, supp) frame joined left to supply",
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = table(spark, sf_dir, "part").where(F.col("p_name").like("small%")).select("p_partkey")
    li96 = (
        table(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg((F.sum("l_quantity") * 0.5).alias("half_qty"))
    )
    # key-only 'small%' slice (~1% of part): unhinted, AQE-decided
    supply = _supply(spark, sf_dir).join(
        parts, F.col("ps_partkey") == parts.p_partkey, "left_semi"
    )
    qualified = (
        supply.join(
            li96,
            (F.col("ps_partkey") == li96.l_partkey) & (F.col("ps_suppkey") == li96.l_suppkey),
            "left",
        )
        .where(F.col("ps_availqty") > F.coalesce(F.col("half_qty"), F.lit(0.0)))
        .select("ps_suppkey")
        .distinct()
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_2")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(qualified, s.s_suppkey == F.col("ps_suppkey"), "left_semi")
        .select("s_name", "s_suppkey")
        .orderBy("s_suppkey")
    )


@register(
    "q_tpch_q21",
    "join",
    oracle="""
    WITH late AS (
        SELECT l_orderkey, l_suppkey
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
    ),
    all_supp AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN (SELECT DISTINCT l_orderkey, l_suppkey FROM late) l1
         ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE n_name = 'NATION_5' AND o_orderstatus = 'F'
      AND EXISTS (SELECT 1 FROM all_supp l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    """,
    notes="TPC-H Q21 (suppliers who kept orders waiting; lateness = "
    "shipdate > orderdate+90d). The EXISTS/NOT EXISTS pair is algebrized "
    "into ONE per-order aggregation: a candidate is the unique late "
    "supplier (n_late = 1 ⇒ NOT EXISTS other late) on an order with ≥2 "
    "distinct suppliers (⇒ EXISTS other). The order's status/date are "
    "per-order attributes, so the 'F' filter pushes to the orders scan. "
    "One lineitem⋈orders shuffle + one groupBy replaces the previous "
    "three distinct-shuffled frames plus semi and anti joins — at 100 TB "
    "that is 2 lineitem-sized exchanges instead of 5",
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    o = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    joined = li.join(o, li.l_orderkey == o.o_orderkey)
    late_supp = F.when(
        F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90).cast("timestamp"),
        F.col("l_suppkey"),
    )
    cand = (
        joined.groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(late_supp).alias("n_late"),
            F.max(late_supp).alias("late_suppkey"),
        )
        .where((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_5")
    return (
        cand.join(s, cand.late_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )


@register(
    "q_tpch_q22",
    "agg",
    oracle="""
    SELECT c_nationkey AS cntrycode,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           ROUND(SUM(c_acctbal), 2) AS totacctbal
    FROM customer
    WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
      AND c_acctbal > (
          SELECT AVG(c_acctbal) FROM customer
          WHERE c_acctbal > 0.0 AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13))
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
    notes="TPC-H Q22 (global sales opportunity; c_nationkey stands in for "
    "the phone country code, and 'no orders' becomes 'no urgent orders' — "
    "every testdata customer has orders, which would make the literal "
    "predicate vacuously empty): scalar AVG broadcast + NOT EXISTS → "
    "left-anti join against the filtered orders",
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    codes = [1, 3, 5, 7, 9, 11, 13]
    c = table(spark, sf_dir, "customer").where(F.col("c_nationkey").isin(codes))
    avg_bal = c.where(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal").alias("avg_bal"))
    o = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )
