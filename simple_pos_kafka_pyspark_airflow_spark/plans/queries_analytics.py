"""Contract queries: analytics breadth beyond the reference's surface.

Extensions (SURVEY.md §2.5/§2.7/§2.8 notes): the reference computes its
analytics with groupBy+join only; a user switching engines expects the full
warehouse analytics surface — window-function breadth, multidimensional
aggregation (pivot/cube/grouping sets), exact percentiles, statistical
aggregates, argmax aggregation, subqueries, full/cross/as-of joins, and the
scalar function families (string/regex/math/datetime/array). Plus three
classic TPC-H queries as end-to-end headliners, and a salted two-phase
aggregation that demonstrates the engine's hot-key strategy at 100 TB.

Every query here ships a DuckDB oracle; rounding/cast rules per
``contract.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import cacheutil
from ..catalog import table
from ..operators import joins as join_ops
from .contract import register

#: Reference/current split for the PSI drift contract: first half of the
#: event month is the "reference" distribution, the rest is "live".
_PSI_SPLIT = "2024-01-16 00:00:00"

# ---------------------------------------------------------------------------
# window breadth
# ---------------------------------------------------------------------------


@register(
    "q_window_ntile",
    "window",
    oracle="""
    SELECT c_custkey,
           CAST(ntile(4) OVER (PARTITION BY c_mktsegment
                               ORDER BY c_acctbal, c_custkey) AS INTEGER) AS quartile
    FROM customer
    """,
    notes="§2.8 extension: ntile quartiles per segment (unique-key tiebreak)",
)
def q_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select("c_custkey", F.ntile(4).over(w).cast("int").alias("quartile"))


@register(
    "q_window_dense",
    "window",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(dense_rank() OVER w AS INTEGER) AS dr,
           ROUND(percent_rank() OVER w, 6) AS pr,
           ROUND(cume_dist() OVER w, 6) AS cd
    FROM orders WINDOW w AS (PARTITION BY o_custkey
                             ORDER BY o_totalprice DESC, o_orderkey)
    """,
    notes="§2.8 extension: dense_rank/percent_rank/cume_dist — exact rationals, "
    "identical in both engines; rounded only to normalize double formatting",
)
def q_window_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.dense_rank().over(w).cast("int").alias("dr"),
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


@register(
    "q_window_firstlast",
    "window",
    oracle="""
    SELECT o_custkey, o_orderkey,
           first_value(o_orderkey) OVER w AS first_ok,
           last_value(o_orderkey) OVER w AS last_ok,
           nth_value(o_orderkey, 2) OVER w AS second_ok
    FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    notes="§2.8 extension: first/last/nth value over the full partition frame",
)
def q_window_firstlast(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_ok"),
        F.last("o_orderkey").over(w).alias("last_ok"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_ok"),
    )


@register(
    "q_window_range",
    "window",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate
               RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW), 2) AS rev_30d
    FROM orders
    """,
    notes="§2.8 extension: RANGE frame (trailing 30-day revenue). Spark side "
    "orders by epoch seconds with a numeric range — peer rows (equal ts) are "
    "included by both engines, so the frames agree exactly",
)
def q_window_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-30 * 86400, 0)
    )
    return o.select(
        "o_custkey", "o_orderkey", F.round(F.sum("o_totalprice").over(w), 2).alias("rev_30d")
    )


# ---------------------------------------------------------------------------
# multidimensional aggregation
# ---------------------------------------------------------------------------


@register(
    "q_pivot",
    "agg",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_f,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_o,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_p
    FROM orders GROUP BY o_orderpriority
    """,
    notes="extension: pivot (explicit value list so no extra distinct pass at "
    "scale); missing cells coalesced to 0 to match COUNT FILTER",
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    p = o.groupBy("o_orderpriority").pivot("o_orderstatus", ["F", "O", "P"]).count()
    return p.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("n_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("n_o"),
        F.coalesce(F.col("P"), F.lit(0)).alias("n_p"),
    )


@register(
    "q_cube",
    "agg",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n, ROUND(SUM(o_totalprice), 2) AS total
    FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
    notes="extension: CUBE over two dims (all 4 grouping sets in one pass — "
    "Spark expands then single-shuffles)",
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total")
    )


@register(
    "q_grouping_sets",
    "agg",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
    FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    notes="extension: explicit GROUPING SETS via Spark SQL (same Catalyst Expand "
    "operator as cube/rollup)",
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "orders").createOrReplaceTempView("__gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM __gs_orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "q_percentiles",
    "agg",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_quantity, 0.25), 4) AS p25,
           ROUND(quantile_cont(l_quantity, 0.5), 4) AS p50,
           ROUND(quantile_cont(l_quantity, 0.75), 4) AS p75
    FROM lineitem GROUP BY l_returnflag
    """,
    notes="extension: exact interpolated percentiles (Spark `percentile` ≡ "
    "DuckDB quantile_cont). The exact form sorts per group; at 100 TB swap to "
    "approx_percentile (t-digest) — declared separately as rows-only q_approx_distinct kin",
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", F.lit(0.25)), 4).alias("p25"),
        F.round(F.percentile("l_quantity", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("l_quantity", F.lit(0.75)), 4).alias("p75"),
    )


@register(
    "q_agg_stats",
    "agg",
    oracle="""
    SELECT l_returnflag,
           ROUND(stddev_samp(l_quantity), 4) AS sd_qty,
           ROUND(var_samp(l_quantity), 4) AS var_qty,
           ROUND(corr(l_quantity, l_extendedprice), 4) AS corr_qe,
           ROUND(covar_samp(l_quantity, l_extendedprice), 2) AS cov_qe
    FROM lineitem GROUP BY l_returnflag
    """,
    notes="extension: statistical aggregates (stddev/variance/corr/covar) — "
    "single-pass moment form, partial-aggregable, one shuffle",
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qe"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("cov_qe"),
    )


@register(
    "q_anomaly_zscore",
    "agg",
    oracle="""
    WITH s AS (
      SELECT event_type, AVG(value) AS mu, stddev_pop(value) AS sd
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           ROUND((e.value - s.mu) / s.sd, 4) AS z
    FROM events e JOIN s USING (event_type)
    WHERE s.sd > 0 AND ABS(ROUND((e.value - s.mu) / s.sd, 4)) > 3
    """,
    notes="extension: per-group z-score outlier gate (data-quality anomaly "
    "sweep) — group moments are one partial-aggregable shuffle to a "
    "group-cardinality-sized table that broadcasts back over the fact scan; "
    "never a window over all rows (which would shuffle the full corpus on "
    "the group key and serialize each group through one reducer)",
)
def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import validation

    ev = table(spark, sf_dir, "events")
    gated = validation.anomaly_gate(ev, validation.group_moments(ev))
    return gated.select("event_id", "event_type", "value", "z")


@register(
    "q_embed_drift",
    "agg",
    oracle="""
    WITH x AS (
      SELECT vec_id,
             unnest(list_transform(embedding, (v, i) -> {'pos': i, 'val': v})) AS u
      FROM embeddings
    ), r AS (
      SELECT u.pos, ROUND(AVG(CAST(u.val AS DOUBLE)), 6) AS mu_ref
      FROM x WHERE vec_id % 2 = 0 GROUP BY u.pos
    ), c AS (
      SELECT u.pos, ROUND(AVG(CAST(u.val AS DOUBLE)), 6) AS mu_cur
      FROM x WHERE vec_id % 2 = 1 GROUP BY u.pos
    )
    SELECT CAST(r.pos AS INTEGER) AS pos, mu_ref, mu_cur,
           mu_cur - mu_ref AS shift
    FROM r JOIN c USING (pos)
    """,
    notes="embedding-space drift monitor (operators/validation."
    "embedding_drift): per-dimension mean of a reference slice vs a "
    "current slice (synthetic split: even/odd vec_id) — the encoder-"
    "regression signal scalar monitors can't see. Means rounded to 6 dp "
    "(cross-engine summation-ulp discipline, same as q_embed_centroid); "
    "deliberately NO cross-dimension norm in the contract surface (it "
    "would re-introduce order-dependent summation). posexplode + "
    "partial-aggregable groupBy per side → two dim-cardinality tables "
    "joined on pos; DuckDB's unnest is 1-based, Spark's posexplode "
    "0-based — the join is on each engine's own pos so the offset "
    "cancels, and the output pos is 1-based on both (Spark adds 1)",
)
def q_embed_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import validation

    e = table(spark, sf_dir, "embeddings")
    drift = validation.embedding_drift(
        e.where(F.col("vec_id") % 2 == 0), e.where(F.col("vec_id") % 2 == 1)
    )
    return drift.select(
        (F.col("pos") + 1).cast("int").alias("pos"), "mu_ref", "mu_cur", "shift"
    )


@register(
    "q_agg_conditional",
    "agg",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) FILTER (WHERE l_quantity > 25) AS BIGINT) AS n_big,
           ROUND(SUM(l_extendedprice) FILTER (WHERE l_discount > 0.05), 2) AS disc_rev,
           ROUND(SUM(CASE WHEN l_tax > 0.04 THEN l_extendedprice ELSE 0 END), 2) AS taxed_rev
    FROM lineitem GROUP BY l_returnflag
    """,
    notes="extension: conditional aggregation (FILTER / CASE-sum) — fused into "
    "one scan+agg, no per-condition passes",
)
def q_agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.when(F.col("l_quantity") > 25, 1)).alias("n_big"),
        F.round(F.sum(F.when(F.col("l_discount") > 0.05, F.col("l_extendedprice"))), 2).alias(
            "disc_rev"
        ),
        F.round(
            F.sum(F.when(F.col("l_tax") > 0.04, F.col("l_extendedprice")).otherwise(F.lit(0.0))), 2
        ).alias("taxed_rev"),
    )


@register(
    "q_agg_minmax_by",
    "agg",
    oracle="""
    SELECT o_custkey,
           arg_max(o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) * 16777216 + o_orderkey)
               AS best_order,
           arg_min(o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) * 16777216 + o_orderkey)
               AS worst_order
    FROM orders GROUP BY o_custkey
    """,
    notes="extension: argmax aggregation (max_by/arg_max). Ordering value is "
    "integer cents << 24 | orderkey — an exact int64 composite so ties resolve "
    "deterministically in both engines (plain max_by on a double with duplicate "
    "values is engine-arbitrary)",
)
def q_agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    ordv = (F.round(F.col("o_totalprice") * 100, 0).cast("long") * 16777216 + F.col("o_orderkey"))
    return o.groupBy("o_custkey").agg(
        F.max_by("o_orderkey", ordv).alias("best_order"),
        F.min_by("o_orderkey", ordv).alias("worst_order"),
    )


@register(
    "q_agg_collect",
    "agg",
    oracle="""
    SELECT o_custkey,
           array_to_string(list_sort(list(o_orderkey)), ',') AS order_keys
    FROM orders GROUP BY o_custkey
    """,
    notes="extension: collect_list → sorted → joined (canonical string so the "
    "unordered collect is hash-comparable across engines)",
)
def q_agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.array_join(F.array_sort(F.collect_list("o_orderkey")), ",").alias("order_keys")
    )


@register(
    "q_agg_salted",
    "agg",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice), 2) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
    notes="extension (scale pattern): two-phase salted aggregation — "
    "groupBy(key, salt16) partial, then groupBy(key) final. Same result as the "
    "plain agg (the oracle); the point is the shape: a hot key (3 distinct "
    "returnflags over 100 TB!) fans out over 16 reducers instead of one. "
    "Deterministic salt = xxhash64(orderkey) % 16, no RNG",
)
def q_agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    partial = (
        li.withColumn("__salt", F.pmod(F.xxhash64("l_orderkey"), F.lit(16)))
        .groupBy("l_returnflag", "__salt")
        .agg(F.sum("l_extendedprice").alias("__rev"), F.count("*").alias("__n"))
    )
    return partial.groupBy("l_returnflag").agg(
        F.round(F.sum("__rev"), 2).alias("revenue"), F.sum("__n").alias("n")
    )


# ---------------------------------------------------------------------------
# joins: full / cross / as-of; subqueries
# ---------------------------------------------------------------------------


@register(
    "q_join_full",
    "join",
    oracle="""
    SELECT COALESCE(c.c_custkey, o.o_custkey) AS k,
           CAST(c.c_custkey IS NOT NULL AS INTEGER) AS has_cust,
           CAST(o.o_custkey IS NOT NULL AS INTEGER) AS has_order
    FROM (SELECT DISTINCT c_custkey FROM customer) c
    FULL JOIN (SELECT DISTINCT o_custkey FROM orders) o ON c_custkey = o_custkey
    """,
    notes="extension: full outer join (both-sides-preserved key reconciliation)",
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select("c_custkey").distinct()
    o = table(spark, sf_dir, "orders").select("o_custkey").distinct()
    j = c.join(o, c.c_custkey == o.o_custkey, "full_outer")
    return j.select(
        F.coalesce("c_custkey", "o_custkey").alias("k"),
        F.col("c_custkey").isNotNull().cast("int").alias("has_cust"),
        F.col("o_custkey").isNotNull().cast("int").alias("has_order"),
    )


@register(
    "q_join_cross",
    "join",
    oracle="SELECT n_name, r_name FROM nation CROSS JOIN region",
    notes="extension: cross join (tiny×tiny only — at scale a cross join is "
    "legal solely when one side broadcasts)",
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = table(spark, sf_dir, "nation").select("n_name")
    r = table(spark, sf_dir, "region").select("r_name")
    return n.crossJoin(F.broadcast(r))


@register(
    "q_join_asof",
    "join",
    oracle="""
    SELECT e.event_id AS err_id,
           (SELECT MAX(c.ts) FROM events c
            WHERE c.user_id = e.user_id AND c.event_type = 'click' AND c.ts <= e.ts)
               AS last_click_ts
    FROM events e WHERE e.event_type = 'error'
    """,
    notes="extension: backward as-of join (operators/joins.asof_join_backward) — "
    "latest click at-or-before each error, per user. Implemented as tagged "
    "union + last(ignorenulls) over one per-key window: ONE shuffle, no range "
    "join, the kdb/Flink as-of shape. Output is the matched ts (max over ties, "
    "deterministic); the oracle's correlated MAX is the semantic definition",
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    errors = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        F.col("user_id").alias("err_user"),
        F.col("ts").alias("err_ts"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("click_user"), F.col("ts").alias("click_ts")
    )
    joined = join_ops.asof_join_backward(
        errors, clicks, "err_user", "click_user", "err_ts", "click_ts", pick=["click_ts"]
    )
    return joined.select("err_id", F.col("click_ts").alias("last_click_ts"))


@register(
    "q_rolling_distinct",
    "window",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT event_type, date_trunc('day', ts) AS d, user_id
      FROM events
    ), days AS (
      SELECT DISTINCT event_type, d FROM pairs
    ), contrib AS (
      SELECT p.event_type, p.user_id, days.d AS wday
      FROM pairs p
      JOIN days ON days.event_type = p.event_type
              AND days.d BETWEEN p.d AND p.d + INTERVAL 6 DAY
    )
    SELECT event_type, wday AS day,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct
    FROM contrib GROUP BY 1, 2
    """,
    notes="extension: rolling 7-day distinct users per day per event "
    "type (operators/windows.rolling_distinct) — distinct counts don't "
    "decompose over sliding frames, so the exact shape is "
    "contribute-then-count: dedup the fact to (day,user) pairs FIRST "
    "(the fact table never explodes, only active pairs × 7), then a "
    "second distinct count per window day. The sketched form at 100 TB "
    "is per-day HLL + hll_union_agg over trailing windows "
    "(q_sketch_shards' discipline), documented on the operator. The "
    "oracle phrases the same contribution set as a range join",
)
def q_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.windows import rolling_distinct

    ev = table(spark, sf_dir, "events")
    return rolling_distinct(ev, "ts", "user_id", 7, group_cols=["event_type"])


@register(
    "q_stats_skew",
    "agg",
    oracle="""
    WITH d AS (
      SELECT event_type, CAST(round(value * 10) AS BIGINT) AS x FROM events
    ), g AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sum_x,
             CAST(SUM(x * x) AS BIGINT) AS sum_x2,
             CAST(SUM(x * x * x) AS BIGINT) AS sum_x3,
             CAST(SUM(x * x * x * x) AS BIGINT) AS sum_x4
      FROM d GROUP BY 1
    )
    SELECT event_type, n, sum_x, sum_x2, sum_x3, sum_x4,
           (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(sum_x3 AS DOUBLE)
            - CAST(3 AS DOUBLE) * CAST(n AS DOUBLE) * CAST(sum_x AS DOUBLE) * CAST(sum_x2 AS DOUBLE)
            + CAST(2 AS DOUBLE) * CAST(sum_x AS DOUBLE) * CAST(sum_x AS DOUBLE) * CAST(sum_x AS DOUBLE))
           / NULLIF((CAST(n AS DOUBLE) * CAST(sum_x2 AS DOUBLE) - CAST(sum_x AS DOUBLE) * CAST(sum_x AS DOUBLE))
                    * sqrt((CAST(n AS DOUBLE) * CAST(sum_x2 AS DOUBLE) - CAST(sum_x AS DOUBLE) * CAST(sum_x AS DOUBLE))), 0.0)
             AS skew,
           (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(sum_x4 AS DOUBLE)
            - CAST(4 AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(sum_x AS DOUBLE) * CAST(sum_x3 AS DOUBLE)
            + CAST(6 AS DOUBLE) * CAST(n AS DOUBLE) * CAST(sum_x AS DOUBLE) * CAST(sum_x AS DOUBLE) * CAST(sum_x2 AS DOUBLE)
            - CAST(3 AS DOUBLE) * CAST(sum_x AS DOUBLE) * CAST(sum_x AS DOUBLE) * CAST(sum_x AS DOUBLE) * CAST(sum_x AS DOUBLE))
           / NULLIF((CAST(n AS DOUBLE) * CAST(sum_x2 AS DOUBLE) - CAST(sum_x AS DOUBLE) * CAST(sum_x AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(sum_x2 AS DOUBLE) - CAST(sum_x AS DOUBLE) * CAST(sum_x AS DOUBLE)), 0.0)
           - CAST(3 AS DOUBLE)
             AS kurt
    FROM g
    """,
    notes="extension: per-group skewness + excess kurtosis from exact "
    "integer power sums (operators/aggregates.grouped_skew_kurt) — the "
    "distribution-shape monitors, order-free where the skewness()/"
    "kurtosis() built-ins stream float state. The n-powers cancel out "
    "of the standardized moments (skew = A/B^1.5, kurt = C/B² − 3 with "
    "A,B,C polynomial in the exact sums), A, B and C all evaluated as "
    "FIXED left-associated double trees (the q_stats_corr recipe) so "
    "raw doubles hash-compare — B in int64 would wrap at n ≈ 3e6/group "
    "(n²·x² binds before n·x⁴); deci grid keeps the int64 SUMS exact "
    "to ~9e6 rows/group, documented with the DECIMAL(38,0) widening "
    "path",
)
def q_stats_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.aggregates import grouped_skew_kurt

    ev = table(spark, sf_dir, "events")
    return grouped_skew_kurt(ev, "event_type", F.round(F.col("value") * 10))


@register(
    "q_drift_ks",
    "agg",
    oracle=f"""
    WITH d AS (
      SELECT event_type,
             CAST(round(value * 100) AS BIGINT) AS v,
             CAST(ts < TIMESTAMP '{_PSI_SPLIT}' AS INTEGER) AS r
      FROM events
    ), pv AS (
      SELECT event_type, v,
             CAST(SUM(r) AS BIGINT) AS a,
             CAST(SUM(1 - r) AS BIGINT) AS b
      FROM d GROUP BY 1, 2
    ), c AS (
      SELECT event_type,
             SUM(a) OVER (PARTITION BY event_type ORDER BY v
                          ROWS UNBOUNDED PRECEDING) AS ca,
             SUM(b) OVER (PARTITION BY event_type ORDER BY v
                          ROWS UNBOUNDED PRECEDING) AS cb,
             SUM(a) OVER (PARTITION BY event_type) AS na,
             SUM(b) OVER (PARTITION BY event_type) AS nb
      FROM pv
    )
    SELECT event_type,
           CAST(na AS BIGINT) AS n_ref, CAST(nb AS BIGINT) AS n_live,
           CAST(MAX(abs(ca * nb - cb * na)) AS BIGINT) AS ks_num,
           CAST(na * nb AS BIGINT) AS ks_den,
           CAST(MAX(abs(ca * nb - cb * na)) AS DOUBLE) / CAST(na * nb AS DOUBLE) AS ks
    FROM c GROUP BY event_type, na, nb
    """,
    notes="extension: two-sample Kolmogorov-Smirnov drift per group "
    "(operators/validation.ks_drift) — the BINLESS complement of "
    "q_psi_drift: sup |ECDF_ref − ECDF_live| catches shape changes "
    "smaller than a PSI bin. Exact end-to-end: per-(group, value) "
    "counts (state = distinct values, not rows), one per-group window "
    "sort for the running ECDF numerators, and the sup-difference as "
    "cross-multiplied int64 (cum_ref·n_live − cum_live·n_ref) with "
    "ONE raw division at the end; ties are structural (both ECDFs "
    "jump at the same grouped row). Same first-half/rest split as the "
    "PSI contract",
)
def q_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.validation import ks_drift

    ev = table(spark, sf_dir, "events")
    return ks_drift(
        ev,
        "event_type",
        F.round(F.col("value") * 100),
        F.col("ts") < F.lit(_PSI_SPLIT).cast("timestamp"),
    )


@register(
    "q_rolling_distinct_sketch",
    "window",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT event_type, date_trunc('day', ts) AS d, user_id
      FROM events
    ), days AS (
      SELECT DISTINCT event_type, d FROM pairs
    ), contrib AS (
      SELECT p.event_type, p.user_id, days.d AS wday
      FROM pairs p
      JOIN days ON days.event_type = p.event_type
              AND days.d BETWEEN p.d AND p.d + INTERVAL 6 DAY
    )
    SELECT event_type, wday AS day,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
           CAST(1 AS INTEGER) AS est_ok
    FROM contrib GROUP BY 1, 2
    """,
    notes="the 100 TB form of q_rolling_distinct: per-day HLL sketches "
    "union-merged across each trailing window "
    "(operators/windows.rolling_distinct_sketch) — the fact is touched "
    "once to build day sketches, then every window merges kilobyte "
    "blobs; cost scales with DAYS where the exact form scales with "
    "active pairs × window_days. Self-certifying exact+bound-bit "
    "(q_sketch_shards' pattern): the exact arm rides along and est_ok "
    "asserts |est − exact| ≤ 2% of exact in-plan (lg_k=14 → ~0.8% "
    "expected error), so the driver hash-checks real values, not the "
    "implementation-specific estimate",
)
def q_rolling_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.windows import rolling_distinct, rolling_distinct_sketch

    ev = table(spark, sf_dir, "events")
    exact = rolling_distinct(ev, "ts", "user_id", 7, group_cols=["event_type"])
    est = rolling_distinct_sketch(ev, "ts", "user_id", 7, group_cols=["event_type"])
    return (
        exact.join(est, ["event_type", "day"])
        .select(
            "event_type",
            "day",
            F.col("n_distinct").alias("n_exact"),
            (
                F.abs(F.col("n_est") - F.col("n_distinct").cast("double"))
                <= F.lit(0.02) * F.col("n_distinct").cast("double")
            )
            .cast("int")
            .alias("est_ok"),
        )
    )


@register(
    "q_skyline",
    "window",
    oracle=r"""
    WITH m AS (
      SELECT doc_id, source,
             CAST(len(list_filter(regexp_split_to_array(lower(text), '\s+'),
                                  t -> t <> '')) AS BIGINT) AS n_tok,
             CAST(len(list_distinct(list_filter(regexp_split_to_array(lower(text), '\s+'),
                                                t -> t <> ''))) AS BIGINT) AS n_types
      FROM documents
    )
    SELECT d.doc_id, d.source, d.n_tok, d.n_types
    FROM m d
    WHERE NOT EXISTS (
      SELECT 1 FROM m o
      WHERE o.source = d.source
        AND o.n_tok >= d.n_tok AND o.n_types >= d.n_types
        AND (o.n_tok > d.n_tok OR o.n_types > d.n_types)
    )
    """,
    notes="extension: per-source 2-D skyline / Pareto front "
    "(operators/order.skyline_2d) — documents not dominated on (token "
    "count, vocabulary size), the pick-without-weights curation "
    "frontier. The operator is the textbook sort-scan: dense_rank over "
    "x desc + one RANGE-window running max of y over strictly-greater "
    "x — ONE sort exchange, dominance pairs never materialize; the "
    "oracle runs the quadratic NOT EXISTS dominance definition, so the "
    "contract certifies the rewrite against the semantics. Integer "
    "metrics keep every comparison exact; duplicate (x,y) points are "
    "mutually non-dominated and both survive in both formulations",
)
def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.textops import tokens
    from ..operators.order import skyline_2d

    d = table(spark, sf_dir, "documents")
    toks = tokens(F.lower(F.col("text")))
    m = d.select(
        "doc_id",
        "source",
        F.size(toks).cast("long").alias("n_tok"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_types"),
    )
    return skyline_2d(m, F.col("n_tok"), F.col("n_types"), partition="source")


@register(
    "q_join_asof_nearest",
    "join",
    oracle="""
    SELECT e.event_id AS err_id,
           (SELECT c.ts FROM events c
            WHERE c.user_id = e.user_id AND c.event_type = 'click'
            ORDER BY abs(epoch_us(c.ts) - epoch_us(e.ts)) ASC, c.ts ASC
            LIMIT 1) AS nearest_click_ts
    FROM events e WHERE e.event_type = 'error'
    """,
    notes="extension: NEAREST as-of join "
    "(operators/joins.asof_join_nearest, pandas merge_asof "
    "direction='nearest') — closest click in either direction per "
    "error, equal distance breaking backward. Two window fills (the "
    "forward fill is the backward fill under ts DESC) over ONE key "
    "exchange — no range join, no per-row probe; the oracle's "
    "correlated ORDER BY abs() LIMIT 1 is the semantic definition. "
    "Output is the matched ts, so same-ts right duplicates cannot "
    "produce ambiguity",
)
def q_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    errors = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        F.col("user_id").alias("err_user"),
        F.col("ts").alias("err_ts"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("click_user"), F.col("ts").alias("click_ts")
    )
    joined = join_ops.asof_join_nearest(
        errors, clicks, "err_user", "click_user", "err_ts", "click_ts", pick=["click_ts"]
    )
    return joined.select("err_id", F.col("click_ts").alias("nearest_click_ts"))


@register(
    "q_scalar_subquery",
    "join",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_totalprice > (SELECT ROUND(AVG(o_totalprice), 0) FROM orders)
    """,
    notes="extension: scalar subquery threshold — Spark computes the aggregate "
    "and broadcast-joins it (no driver round-trip); threshold rounded to whole "
    "dollars so the cut point is cross-engine stable",
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    avg = o.agg(F.round(F.avg("o_totalprice"), 0).alias("__thr"))
    return (
        o.crossJoin(F.broadcast(avg))
        .where(F.col("o_totalprice") > F.col("__thr"))
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "q_having",
    "agg",
    oracle="""
    SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n
    FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 10
    """,
    notes="extension: HAVING (post-aggregation filter — Catalyst keeps it "
    "above the agg, after partial aggregation)",
)
def q_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(F.count("*").alias("n")).where(F.col("n") >= 10)


@register(
    "q_union_distinct",
    "setop",
    oracle="""
    SELECT c_custkey AS k FROM customer
    UNION
    SELECT o_custkey AS k FROM orders
    """,
    notes="extension: UNION (distinct) — union + dedup in one shuffle",
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    o = table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    return c.union(o).distinct()


@register(
    "q_explode",
    "function",
    oracle="""
    SELECT p_partkey, unnest(string_split(p_name, ' ')) AS word FROM part
    """,
    notes="extension: explode/unnest (lateral flatten) — row multiplication "
    "stays executor-side, no shuffle",
)
def q_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return p.select("p_partkey", F.explode(F.split("p_name", " ")).alias("word"))


# ---------------------------------------------------------------------------
# scalar function families
# ---------------------------------------------------------------------------


@register(
    "q_string_funcs",
    "function",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS uname,
           lower(c_mktsegment) AS lseg,
           substr(c_name, 10, 8) AS mid,
           CAST(length(c_name) AS INTEGER) AS name_len,
           replace(c_name, '#', '-') AS repl,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded,
           reverse(c_mktsegment) AS rseg,
           trim('  ' || c_name || '  ') AS trimmed
    FROM customer
    """,
    notes="extension: string function family (upper/lower/substr/length/replace/"
    "lpad/reverse/trim) — all codegen, all DuckDB-identical semantics",
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.lower("c_mktsegment").alias("lseg"),
        F.substring("c_name", 10, 8).alias("mid"),
        F.length("c_name").cast("int").alias("name_len"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("repl"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded"),
        F.reverse("c_mktsegment").alias("rseg"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))).alias("trimmed"),
    )


@register(
    "q_regexp",
    "function",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
           CAST(regexp_matches(p_name, 'red') AS INTEGER) AS has_red
    FROM part
    """,
    notes="extension: regex family (extract/replace/match). NOTE DuckDB "
    "regexp_replace is first-match unless 'g' — Spark is always global, so the "
    "oracle passes the flag explicitly",
)
def q_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", r"^([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("p_name", r"[aeiou]", "_").alias("devoweled"),
        F.col("p_name").rlike("red").cast("int").alias("has_red"),
    )


@register(
    "q_math_funcs",
    "function",
    oracle="""
    SELECT p_partkey,
           abs(p_size - 25) AS dist25,
           CAST(ceil(p_retailprice / 100) AS BIGINT) AS ceil_h,
           CAST(floor(p_retailprice / 100) AS BIGINT) AS floor_h,
           ROUND(sqrt(CAST(p_size AS DOUBLE)), 6) AS sqrt_size,
           p_size % 7 AS mod7,
           CAST(sign(p_size - 25) AS INTEGER) AS sgn,
           ROUND(p_retailprice * p_retailprice, 4) AS sq_price
    FROM part
    """,
    notes="extension: math family — only IEEE-exact ops (abs/ceil/floor/sqrt/"
    "mod/sign/multiply); ln/exp are deliberately excluded from oracle checks "
    "(libm vs StrictMath last-ulp divergence)",
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.abs(F.col("p_size") - 25).alias("dist25"),
        F.ceil(F.col("p_retailprice") / 100).cast("long").alias("ceil_h"),
        F.floor(F.col("p_retailprice") / 100).cast("long").alias("floor_h"),
        F.round(F.sqrt(F.col("p_size").cast("double")), 6).alias("sqrt_size"),
        (F.col("p_size") % 7).alias("mod7"),
        F.signum(F.col("p_size") - 25).cast("int").alias("sgn"),
        F.round(F.col("p_retailprice") * F.col("p_retailprice"), 4).alias("sq_price"),
    )


@register(
    "q_datetime_funcs",
    "function",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS y,
           CAST(month(o_orderdate) AS INTEGER) AS mo,
           CAST(day(o_orderdate) AS INTEGER) AS d,
           CAST(quarter(o_orderdate) AS INTEGER) AS q,
           date_trunc('month', o_orderdate) AS month_start,
           o_orderdate + INTERVAL 30 DAY AS plus30,
           CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end
    FROM orders
    """,
    notes="extension: datetime family (year/month/day/quarter/trunc/interval "
    "add/last_day). Day-of-week is deliberately excluded: Spark (Sun=1) and "
    "DuckDB (Sun=0) number weekdays differently",
)
def q_datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.quarter("o_orderdate").alias("q"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("plus30"),
        # cast to timestamp: Spark's DateType round-trips to datetime.date in
        # pandas while DuckDB DATE becomes datetime64 — same instant, different
        # dtype — so both sides emit an explicit midnight timestamp instead
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
    )


@register(
    "q_array_funcs",
    "function",
    oracle="""
    WITH t AS (SELECT p_partkey, string_split(p_name, ' ') AS w FROM part)
    SELECT p_partkey,
           CAST(len(w) AS INTEGER) AS n_words,
           array_to_string(list_sort(w), '|') AS sorted_words,
           CAST(list_contains(w, 'red') AS INTEGER) AS has_red,
           w[1] AS first_word,
           array_to_string(w[2:3], '|') AS mid_words
    FROM t
    """,
    notes="extension: array family (size/sort/contains/index/slice) over split "
    "part names — pure codegen, the array never materializes off-executor",
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part").withColumn("w", F.split("p_name", " "))
    return p.select(
        "p_partkey",
        F.size("w").cast("int").alias("n_words"),
        F.array_join(F.array_sort("w"), "|").alias("sorted_words"),
        F.array_contains("w", "red").cast("int").alias("has_red"),
        F.element_at("w", 1).alias("first_word"),
        F.array_join(F.slice("w", 2, 2), "|").alias("mid_words"),
    )


# ---------------------------------------------------------------------------
# TPC-H headliners
# ---------------------------------------------------------------------------


@register(
    "q_tpch_q1",
    "agg",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           ROUND(AVG(l_extendedprice), 4) AS avg_price,
           ROUND(AVG(l_discount), 6) AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    notes="TPC-H Q1 (pricing summary): the canonical scan+agg headliner — "
    "map-side partial agg over 6 groups, filter pushed to parquet",
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(disc), 2).alias("sum_disc_price"),
        F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@register(
    "q_tpch_q3",
    "join",
    oracle="""
    SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15'
      AND l_shipdate  > TIMESTAMP '1995-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    notes="TPC-H Q3 (shipping priority): filter-heavy 3-way join + agg + top-k; "
    "rounded revenue in the sort key + unique tiebreaks keep the LIMIT cut "
    "deterministic across engines",
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    joined = c.join(o, c.c_custkey == o.o_custkey).join(li, o.o_orderkey == li.l_orderkey)
    agg = joined.groupBy("l_orderkey", "o_orderdate").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
    )
    return (
        agg.select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "q_tpch_q5",
    "join",
    oracle="""
    SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1995-01-01'
      AND o_orderdate <  TIMESTAMP '1996-01-01'
    GROUP BY n_name
    """,
    notes="TPC-H Q5 (local supplier volume): 6-table join with broadcast dims "
    "(nation/region) and a same-nation theta condition",
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    joined = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return joined.groupBy("n_name").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
    )


# ---------------------------------------------------------------------------
# subquery forms (Catalyst rewrites these into semi/anti joins)
# ---------------------------------------------------------------------------


@register(
    "q_exists_subquery",
    "join",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
    GROUP BY o_orderpriority
    """,
    notes="extension (TPC-H Q4 shape): correlated EXISTS — Catalyst rewrites "
    "to a left-semi join, so the subquery costs one shuffle, not a probe per "
    "row (adapted predicate: testdata lineitem has no commit/receipt dates)",
)
def q_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "orders").createOrReplaceTempView("__eq_orders")
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("__eq_lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n
        FROM __eq_orders o
        WHERE EXISTS (SELECT 1 FROM __eq_lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
        GROUP BY o_orderpriority
        """
    )


@register(
    "q_in_subquery",
    "join",
    oracle="""
    SELECT p_partkey, p_name FROM part
    WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
    """,
    notes="extension: uncorrelated IN subquery — rewritten to left-semi join "
    "(never a collected id list on the driver)",
)
def q_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "part").createOrReplaceTempView("__in_part")
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("__in_lineitem")
    return spark.sql(
        """
        SELECT p_partkey, p_name FROM __in_part
        WHERE p_partkey IN (SELECT l_partkey FROM __in_lineitem WHERE l_quantity >= 49)
        """
    )


@register(
    "q_not_exists",
    "join",
    oracle="""
    SELECT s_suppkey, s_name FROM supplier s
    WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 50 AND l.l_discount >= 0.08)
    """,
    notes="extension: NOT EXISTS — rewritten to left-anti join (the "
    "delete-by-absence shape of the reference's CDC diff, POS_spark_dag.py:155)",
)
def q_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "supplier").createOrReplaceTempView("__ne_supplier")
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("__ne_lineitem")
    return spark.sql(
        """
        SELECT s_suppkey, s_name FROM __ne_supplier s
        WHERE NOT EXISTS (SELECT 1 FROM __ne_lineitem l
                          WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 50 AND l.l_discount >= 0.08)
        """
    )


# ---------------------------------------------------------------------------
# event-time operators (batch forms of the streaming windows)
# ---------------------------------------------------------------------------


@register(
    "q_window_tumbling",
    "window",
    oracle="""
    SELECT user_id, date_trunc('hour', ts) AS window_start,
           CAST(COUNT(*) AS BIGINT) AS n, ROUND(SUM(value), 2) AS total
    FROM events GROUP BY user_id, date_trunc('hour', ts)
    """,
    notes="extension (T4 batch form): 1-hour tumbling window per user — "
    "F.window assigns buckets executor-side, then one hash agg; identical to "
    "the streaming plan minus the watermark",
)
def q_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.window("ts", "1 hour"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select("user_id", F.col("window.start").alias("window_start"), "n", "total")
    )


@register(
    "q_sessionize",
    "window",
    oracle="""
    WITH d AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS is_new
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, ts,
             CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS INTEGER) AS sess_id
      FROM d
    )
    SELECT user_id, sess_id, CAST(COUNT(*) AS BIGINT) AS n_events,
           MIN(ts) AS sess_start, MAX(ts) AS sess_end
    FROM s GROUP BY user_id, sess_id
    """,
    notes="extension: gap-based sessionization (30 min) — lag marks session "
    "starts, running sum numbers them; ONE shuffle on user_id for both "
    "windows plus the final agg (operators/windows.sessionize)",
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import windows as win_ops

    ev = table(spark, sf_dir, "events")
    s = win_ops.sessionize(ev, key="user_id", ts="ts", gap="30 MINUTE", tiebreak="event_id")
    return s.groupBy("user_id", "sess_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("sess_start"),
        F.max("ts").alias("sess_end"),
    )


@register(
    "q_window_session_native",
    "window",
    oracle="""
    WITH d AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS is_new
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, ts, event_id, value,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM d
    )
    SELECT user_id, MIN(ts) AS window_start,
           MAX(ts) + INTERVAL 30 MINUTE AS window_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM s GROUP BY user_id, sess_id
    """,
    notes="extension (T4/T8 family, batch form of streaming/windows."
    "session_agg): Spark's NATIVE F.session_window against the same "
    "gaps-and-islands oracle that certifies q_sessionize — the driver pins "
    "that the native merge operator and the lag/running-sum rewrite agree "
    "on every session boundary (merge at ts <= prev+gap, probe-verified; "
    "window_end = last event + gap). Native sessions are the streaming "
    "path (state merges incrementally, watermark closes sessions); the "
    "islands rewrite is the batch/backfill path — plan-swap safety "
    "between them is what lets the engine pick per-workload at 100 TB",
)
def q_window_session_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming import windows as stream_win

    ev = table(spark, sf_dir, "events")
    out = stream_win.session_agg(
        ev,
        ts_col="ts",
        gap="30 minutes",
        keys=["user_id"],
        aggs=[
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        ],
    )
    return out.select("user_id", "window_start", "window_end", "n_events", "total_value")


@register(
    "q_json_funcs",
    "function",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
           CAST(len(json_keys(props)) AS INTEGER) AS n_keys
    FROM events
    """,
    notes="extension: JSON scalar family — get_json_object pushes a JSON "
    "path probe into codegen; map cardinality via from_json to "
    "map<string,string> (schema-free)",
)
def q_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_val"),
        F.size(F.map_keys(F.from_json("props", "map<string,string>"))).cast("int").alias("n_keys"),
    )


@register(
    "q_variant_extract",
    "function",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(props->>'k' AS INTEGER)) AS BIGINT) AS sum_k,
           CAST(MAX(CAST(props->>'k' AS INTEGER)) AS INTEGER) AS max_k
    FROM events
    WHERE props IS NOT NULL
    GROUP BY event_type
    """,
    notes="extension: Spark 4 VARIANT path for semi-structured columns — "
    "parse_json once into the binary Variant encoding, then typed "
    "variant_get extractions ($.k as int) feed a plain aggregate. At "
    "100 TB this is the semi-structured story: parse at ingest, store "
    "VARIANT (or shredded) columns, and every downstream probe reads "
    "the binary encoding instead of re-parsing JSON text per access "
    "(get_json_object re-parses per call — q_json_funcs shows that "
    "older form). try_variant_get degrades malformed rows to NULL "
    "instead of failing the scan",
)
def q_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").where(F.col("props").isNotNull())
    v = ev.select("event_type", F.parse_json("props").alias("_v"))
    k = F.try_variant_get(F.col("_v"), "$.k", "int")
    return v.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
    )


# ---------------------------------------------------------------------------
# more TPC-H headliners
# ---------------------------------------------------------------------------


@register(
    "q_tpch_q6",
    "agg",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1994-01-01'
      AND l_shipdate <  TIMESTAMP '1995-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    notes="TPC-H Q6 (forecast revenue change): pure scan+filter+agg — every "
    "predicate reaches the parquet reader (PushedFilters), the agg is one "
    "partial+final pair over a scalar",
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1994-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))


@register(
    "q_tpch_q14",
    "join",
    oracle="""
    SELECT ROUND(100.00 * SUM(CASE WHEN p_type LIKE 'PROMO%'
                                   THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                 / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1995-09-01'
      AND l_shipdate <  TIMESTAMP '1995-10-01'
    """,
    notes="TPC-H Q14 (promotion effect): fact⋈dim with conditional agg — the "
    "part side broadcasts at these sizes (AQE decides), the CASE fuses into "
    "the single agg pass",
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1995-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-10-01").cast("timestamp"))
    )
    p = table(spark, sf_dir, "part")
    j = li.join(p, li.l_partkey == p.p_partkey)
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), disc).otherwise(F.lit(0.0))
    return j.agg(
        F.round(F.lit(100.0) * F.sum(promo) / F.sum(disc), 4).alias("promo_revenue")
    )


@register(
    "q_tpch_q18",
    "join",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           ROUND(SUM(l_quantity), 2) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey HAVING SUM(l_quantity) > 300)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    """,
    notes="TPC-H Q18 (large-volume customers): agg-derived IN filter (semi "
    "join against a HAVING aggregate) then 3-way join + re-agg — the "
    "pre-aggregation keyed on l_orderkey shrinks the fact before the join",
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__q"))
        .where(F.col("__q") > 300)
        .select("l_orderkey")
    )
    j = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(big.withColumnRenamed("l_orderkey", "__bk"), F.col("o_orderkey") == F.col("__bk"), "left_semi")
    )
    return j.groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice").agg(
        F.round(F.sum("l_quantity"), 2).alias("total_qty")
    )


@register(
    "q_window_sliding",
    "window",
    oracle="""
    WITH w AS (
      SELECT user_id, value,
             date_trunc('hour', ts) - to_hours(k) AS window_start
      FROM events, unnest([0, 1]) AS t(k)
    )
    SELECT user_id, window_start, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 2) AS total
    FROM w GROUP BY user_id, window_start
    """,
    notes="extension (T4 sliding form): 2h window / 1h slide — each event "
    "lands in width/slide windows; Spark's F.window expands executor-side "
    "(epoch-aligned starts ≡ the oracle's hour-trunc minus k hours), then "
    "one hash agg. State at 100 TB is bounded by watermark × keys, not data",
)
def q_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.window("ts", "2 hours", "1 hour"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select("user_id", F.col("window.start").alias("window_start"), "n", "total")
    )


@register(
    "q_profile",
    "agg",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(l_quantity) AS BIGINT) AS qty_nonnull,
           ROUND(MIN(l_quantity), 2) AS qty_min,
           ROUND(MAX(l_quantity), 2) AS qty_max,
           ROUND(AVG(l_quantity), 4) AS qty_avg,
           CAST(COUNT(DISTINCT l_returnflag) AS BIGINT) AS flag_card,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS part_card,
           ROUND(MIN(l_extendedprice), 2) AS price_min,
           ROUND(MAX(l_extendedprice), 2) AS price_max
    FROM lineitem
    """,
    notes="extension (training-data pipeline utility): one-pass table "
    "profile — null counts, ranges, exact cardinalities — the ingest QC "
    "gate before a corpus enters the pipeline; COUNT DISTINCTs expand to "
    "Expand+two-phase agg, everything else partial-aggregates in the scan "
    "pass. At 100 TB swap exact cardinalities for approx_count_distinct",
)
def q_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        F.count("l_quantity").alias("qty_nonnull"),
        F.round(F.min("l_quantity"), 2).alias("qty_min"),
        F.round(F.max("l_quantity"), 2).alias("qty_max"),
        F.round(F.avg("l_quantity"), 4).alias("qty_avg"),
        F.countDistinct("l_returnflag").alias("flag_card"),
        F.countDistinct("l_partkey").alias("part_card"),
        F.round(F.min("l_extendedprice"), 2).alias("price_min"),
        F.round(F.max("l_extendedprice"), 2).alias("price_max"),
    )


@register(
    "q_null_funcs",
    "function",
    oracle="""
    SELECT c_custkey,
           nullif(c_mktsegment, 'BUILDING') AS seg_or_null,
           ifnull(nullif(c_mktsegment, 'BUILDING'), 'WAS_BUILDING') AS seg_defaulted,
           CASE WHEN nullif(c_mktsegment, 'BUILDING') IS NOT NULL
                THEN 'other' ELSE 'building' END AS nvl2_ish,
           CAST(nullif(c_mktsegment, 'BUILDING') IS NULL AS INTEGER) AS is_b
    FROM customer
    """,
    notes="extension: null-handling family (nullif/ifnull/nvl2/isnull) — "
    "all fold to CASE in both engines, codegen-trivial but a real API "
    "surface users expect",
)
def q_null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    seg_or_null = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    return c.select(
        "c_custkey",
        seg_or_null.alias("seg_or_null"),
        F.ifnull(seg_or_null, F.lit("WAS_BUILDING")).alias("seg_defaulted"),
        F.nvl2(seg_or_null, F.lit("other"), F.lit("building")).alias("nvl2_ish"),
        F.isnull(seg_or_null).cast("int").alias("is_b"),
    )


@register(
    "q_try_cast",
    "function",
    oracle="""
    SELECT p_partkey,
           TRY_CAST(split_part(p_name, ' ', 1) AS INTEGER) AS word_as_int,
           TRY_CAST(CAST(p_size AS VARCHAR) AS INTEGER) AS size_roundtrip,
           TRY_CAST('not a number' AS DOUBLE) AS always_null
    FROM part
    """,
    notes="extension: try_cast — failure yields NULL instead of an error in "
    "both engines; the ingest-sanitization primitive for dirty corpora",
)
def q_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.try_to_number(F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)), F.lit("999999"))
        .cast("int")
        .alias("word_as_int"),
        F.col("p_size").cast("string").try_cast("int").alias("size_roundtrip"),
        F.lit("not a number").try_cast("double").alias("always_null"),
    )


@register(
    "q_bitwise",
    "function",
    oracle="""
    SELECT p_partkey,
           p_size & 15 AS b_and,
           p_size | 64 AS b_or,
           xor(p_size, 255) AS b_xor,
           p_size << 2 AS b_shl,
           p_size >> 1 AS b_shr,
           CAST(bit_count(CAST(p_size AS BIGINT)) AS INTEGER) AS popcnt
    FROM part
    """,
    notes="extension: bitwise family (&,|,xor,shifts,popcount) — the "
    "building blocks the simhash/LSH operators use, exposed as queryable "
    "surface",
)
def q_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    sz = F.col("p_size")
    return p.select(
        "p_partkey",
        sz.bitwiseAND(F.lit(15)).alias("b_and"),
        sz.bitwiseOR(F.lit(64)).alias("b_or"),
        sz.bitwiseXOR(F.lit(255)).alias("b_xor"),
        F.shiftleft(sz, 2).alias("b_shl"),
        F.shiftright(sz, 1).alias("b_shr"),
        F.bit_count(sz.cast("long")).cast("int").alias("popcnt"),
    )


@register(
    "q_tpch_q7",
    "join",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INTEGER) AS l_year,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
    GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
    """,
    notes="TPC-H Q7 (volume shipping): 6-way join with the nation dim joined "
    "TWICE (supplier side and customer side) under a cross-pair predicate — "
    "both nation joins broadcast; the disjunctive filter stays above them",
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = table(spark, sf_dir, "supplier")
    li = table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").between(
            F.lit("1995-01-01").cast("timestamp"), F.lit("1996-12-31").cast("timestamp")
        )
    )
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    j = (
        s.join(li, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return j.groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
    )


@register(
    "q_tpch_q10",
    "join",
    oracle="""
    SELECT c_custkey, c_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1995-10-01'
      AND o_orderdate <  TIMESTAMP '1996-01-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    notes="TPC-H Q10 (returned items): 4-way join, date+flag filters pushed "
    "to both fact scans, broadcast nation, top-20 via TakeOrderedAndProject "
    "with rounded revenue + unique key so the cut is cross-engine stable",
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = table(spark, sf_dir, "nation")
    j = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    )
    agg = j.groupBy("c_custkey", "c_name", "c_acctbal", "n_name").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
    )
    return (
        agg.select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q_unpivot",
    "setop",
    oracle="""
    SELECT p_partkey, metric, val
    FROM (SELECT p_partkey,
                 CAST(p_size AS DOUBLE) AS size,
                 p_retailprice AS retailprice
          FROM part)
    UNPIVOT (val FOR metric IN (size, retailprice))
    ORDER BY p_partkey, metric
    """,
    notes="extension: wide→long melt (DataFrame.unpivot / SQL UNPIVOT) — "
    "columnar row-expansion with no shuffle; the long form is what the "
    "profile/quality dashboards aggregate over. Both measures cast to one "
    "type (unpivot requires it); raw doubles pass through bit-identical",
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").alias("retailprice"),
    )
    return p.unpivot(["p_partkey"], ["size", "retailprice"], "metric", "val").orderBy(
        "p_partkey", "metric"
    )


@register(
    "q_window_cume",
    "window",
    oracle="""
    SELECT c_custkey,
           cume_dist()    OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal) AS cd,
           percent_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal) AS pr
    FROM customer
    """,
    notes="§2.8 extension: distribution windows — cume_dist/percent_rank "
    "are rank-count ratios, so equal sort keys get equal outputs (no "
    "unique tiebreak needed, unlike row_number) and the division of "
    "identical integers is bit-identical across engines",
)
def q_window_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal")
    return table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.cume_dist().over(w).alias("cd"),
        F.percent_rank().over(w).alias("pr"),
    )


@register(
    "q_funnel",
    "agg",
    oracle="""
    WITH s AS (
      SELECT user_id, MIN(ts) AS signup_ts
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ), c AS (
      SELECT s.user_id, MIN(e.ts) AS click_ts
      FROM s JOIN events e
        ON e.user_id = s.user_id AND e.event_type = 'click' AND e.ts > s.signup_ts
      GROUP BY s.user_id
    ), p AS (
      SELECT c.user_id, MIN(e.ts) AS buy_ts
      FROM c JOIN events e
        ON e.user_id = c.user_id AND e.event_type = 'purchase' AND e.ts > c.click_ts
      GROUP BY c.user_id
    )
    SELECT CAST((SELECT COUNT(*) FROM s) AS BIGINT) AS n_signup,
           CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_clicked,
           CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_purchased
    """,
    notes="extension: ordered conversion funnel (signup → first later "
    "click → first later purchase, per user) — the sequential-event "
    "pattern product analytics runs constantly. Each stage is a per-user "
    "min-aggregate joined forward on (user, ts>prev): three shuffles on "
    "user_id which AQE plans as one partitioning reused; no window over "
    "the full event stream, no self-cross-join",
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    s = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    c = (
        s.join(clicks, (s.user_id == F.col("c_user")) & (F.col("c_ts") > s.signup_ts))
        .groupBy("user_id")
        .agg(F.min("c_ts").alias("click_ts"))
    )
    buys = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("b_user"), F.col("ts").alias("b_ts")
    )
    p = (
        c.join(buys, (c.user_id == F.col("b_user")) & (F.col("b_ts") > c.click_ts))
        .groupBy("user_id")
        .agg(F.min("b_ts").alias("buy_ts"))
    )
    return (
        s.agg(F.count("*").alias("n_signup"))
        .join(c.agg(F.count("*").alias("n_clicked")))
        .join(p.agg(F.count("*").alias("n_purchased")))
    )


@register(
    "q_cohort_retention",
    "agg",
    oracle="""
    WITH o AS (
      SELECT o_custkey, date_trunc('month', o_orderdate) AS m
      FROM orders
    ),
    f AS (SELECT o_custkey, MIN(m) AS cohort FROM o GROUP BY o_custkey)
    SELECT f.cohort,
           CAST(datediff('month', f.cohort, o.m) AS INTEGER) AS months_since,
           CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_customers
    FROM o JOIN f USING (o_custkey)
    GROUP BY f.cohort, months_since
    ORDER BY f.cohort, months_since
    """,
    notes="cohort retention matrix — customers grouped by first-order "
    "month, counted distinct at each month offset: the standard retention "
    "analysis shape. Two shuffles (first-order agg on custkey, matrix agg "
    "on cohort/offset); months_between over month-truncated dates equals "
    "DuckDB's month datediff exactly, so the offsets are integer-identical",
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").select(
        "o_custkey", F.date_trunc("month", "o_orderdate").alias("m")
    )
    first = o.groupBy("o_custkey").agg(F.min("m").alias("cohort"))
    joined = o.join(first, "o_custkey")
    return (
        joined.groupBy(
            "cohort",
            F.months_between(F.col("m"), F.col("cohort")).cast("int").alias("months_since"),
        )
        .agg(F.countDistinct("o_custkey").alias("n_customers"))
        .orderBy("cohort", "months_since")
    )


@register(
    "q_gapfill_locf",
    "window",
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day, MAX(value) AS v
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    ),
    spans AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1),
    cal AS (
      SELECT user_id, CAST(g AS DATE) AS day
      FROM spans, LATERAL UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) t(g)
    ),
    dense AS (
      SELECT cal.user_id, cal.day, daily.v
      FROM cal LEFT JOIN daily ON cal.user_id = daily.user_id AND cal.day = daily.day
    )
    SELECT user_id, CAST(day AS TIMESTAMP) AS day,
           last_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS day_max,
           CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END AS observed
    FROM dense
    """,
    notes="extension: calendar gap-fill + LOCF forward-fill "
    "(operators/timeseries.gapfill_locf) — per-user daily max purchase "
    "value densified over each user's OWN observed span (never a global "
    "calendar) and missing days carried forward. The calendar explode is "
    "bounded by per-key span-days, not fact rows; the fill is one per-key "
    "window shuffle. MAX (order-free, exact) keeps the filled doubles "
    "bit-identical; `observed` marks manufactured rows. The reference's "
    "daily jobs silently skip empty days — this is the dense-series twin "
    "downstream forecasting needs",
)
def q_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import timeseries

    ev = table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    return timeseries.gapfill_locf(ev, "user_id", "ts", F.max("value"), "day_max")


@register(
    "q_ohlc",
    "agg",
    oracle="""
    WITH t AS (
      SELECT user_id, date_trunc('day', ts) AS bucket_ts,
             CAST(round(value * 100) AS BIGINT) AS cents,
             lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') ||
             lpad(CAST(event_id AS VARCHAR), 12, '0') AS ord
      FROM events
    )
    SELECT user_id, bucket_ts,
           arg_min(cents, ord) AS open_cents,
           MAX(cents) AS high_cents,
           MIN(cents) AS low_cents,
           arg_max(cents, ord) AS close_cents,
           CAST(SUM(cents) AS BIGINT) AS volume_cents,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM t GROUP BY 1, 2
    """,
    notes="extension: per-(user, day) OHLC candlestick bars "
    "(operators/timeseries.ohlc) — open/high/low/close + volume in ONE "
    "partial-aggregable groupBy via min_by/max_by against a total order "
    "key; no window, no sort pass, shuffle carries six numbers per bar "
    "at any fact size. The order key is zero-padded "
    "micros‖event_id text — lexicographic equals numeric order, and a "
    "composite INTEGER key would overflow int64 (micros·10^12); cents "
    "grid keeps every output bigint-exact",
)
def q_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import timeseries

    ev = table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    ord_key = F.concat(
        F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    return timeseries.ohlc(ev, "user_id", "ts", cents, ord_key, "day")


#: 3 unrolled power iterations — enough to demonstrate convergence
#: behavior while keeping the oracle an explicit finite CTE chain.
_PAGERANK_ITERS = 3


def _pagerank_oracle() -> str:
    """Build the unrolled-iteration DuckDB oracle: the same contribution
    snap (ROUND(r·p·1e9) → BIGINT, exact sum) per iteration, so both
    engines step through bit-identical rank vectors. `CAST(1.0 AS DOUBLE)
    - 0.85` forces DOUBLE subtraction: as bare literals DuckDB would
    subtract DECIMALs exactly (0.15) and convert — a different double
    than the Spark side's float subtraction."""
    head = """
    WITH e AS (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst, CAST(COUNT(*) AS BIGINT) AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2
    ),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
    outw AS (SELECT src, CAST(SUM(w) AS BIGINT) AS wout FROM e GROUP BY 1),
    en AS (
      SELECT e.src, e.dst, CAST(e.w AS DOUBLE) / CAST(o.wout AS DOUBLE) AS p
      FROM e JOIN outw o USING (src)
    ),
    r0 AS (SELECT node, 1.0 / nn.n AS rank FROM nodes CROSS JOIN nn)
    """
    steps = []
    for i in range(_PAGERANK_ITERS):
        steps.append(f"""
    , s{i + 1} AS (
      SELECT en.dst AS node,
             CAST(SUM(CAST(ROUND(r{i}.rank * en.p * 1000000000.0, 0) AS BIGINT)) AS BIGINT) AS s
      FROM en JOIN r{i} ON en.src = r{i}.node GROUP BY 1
    ),
    r{i + 1} AS (
      SELECT nodes.node,
             (CAST(1.0 AS DOUBLE) - 0.85) / nn.n
             + 0.85 * (CAST(COALESCE(s{i + 1}.s, 0) AS DOUBLE) / 1000000000.0) AS rank
      FROM nodes CROSS JOIN nn LEFT JOIN s{i + 1} ON s{i + 1}.node = nodes.node
    )""")
    tail = f"""
    SELECT node, ROUND(rank, 6) AS rank FROM r{_PAGERANK_ITERS}
    """
    return head + "".join(steps) + tail


@register(
    "q_pagerank",
    "agg",
    oracle=_pagerank_oracle(),
    notes="extension: weighted PageRank (operators/graph.pagerank) over the "
    "nation trade graph projected from the fact table (customer-nation → "
    "supplier-nation, weight = lineitem count) — the derive-graph-then-"
    "iterate pipeline shape. The projection is the distributed cost (fact "
    "⋈ dims, broadcast dims, one partial-aggregable shuffle); each power "
    "iteration is one src-keyed join + dst-keyed agg with eager "
    "localCheckpoint lineage truncation. Per-node in-sums snap to a 1e-9 "
    "integer grid (order-free exact sums) so both engines iterate through "
    "bit-identical rank vectors; oracle unrolls the 3 iterations as CTEs",
)
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import graph

    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    edges = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .groupBy(
            c["c_nationkey"].alias("src"), s["s_nationkey"].alias("dst")
        )
        .agg(F.count("*").alias("w"))
    )
    ranks = graph.pagerank(edges, iters=_PAGERANK_ITERS)
    return ranks.select("node", F.round("rank", 6).alias("rank"))


@register(
    "q_graph_triangles",
    "agg",
    oracle="""
    WITH de AS (
      SELECT DISTINCT c.c_nationkey AS src, s.s_nationkey AS dst
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
    ),
    und AS (
      SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
      FROM de WHERE LEAST(src, dst) < GREATEST(src, dst)
    ),
    tri AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM und e1
      JOIN und e2 ON e1.v = e2.u
      JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
    )
    SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM (SELECT a AS node FROM tri
          UNION ALL SELECT b FROM tri
          UNION ALL SELECT c FROM tri)
    GROUP BY node
    """,
    notes="extension: per-node triangle counts (operators/graph."
    "triangle_counts) over the undirected nation trade graph — the "
    "clustering-structure primitive next to PageRank's centrality. "
    "Vertex-ordered wedge enumeration (a<b<c) materializes each triangle "
    "exactly once through two equi-join shuffles; degree-orientation is "
    "the documented refinement for power-law graphs. Pure integer "
    "pipeline, exact oracle match",
)
def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import graph

    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    edges = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .select(c["c_nationkey"].alias("src"), s["s_nationkey"].alias("dst"))
        .distinct()
    )
    # materialize the undirected edge set once: triangle enumeration
    # consumes it three times (two wedge sides + the closing join), and
    # each copy otherwise replans the 4-table fact join (r14 before-plan:
    # 88 scans). Nation-graph-sized blocks; bench/oracle clear per query.
    und = cacheutil.materialize(graph.undirected_edges(edges))
    return graph.triangle_counts(und)


@register(
    "q_event_transitions",
    "window",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_state,
             event_type AS next_state
      FROM events
    ),
    pairs AS (
      SELECT prev_state, next_state, CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE prev_state IS NOT NULL GROUP BY 1, 2
    ),
    outdeg AS (SELECT prev_state, CAST(SUM(n) AS BIGINT) AS tot FROM pairs GROUP BY 1)
    SELECT pr.prev_state, pr.next_state, pr.n,
           CAST(pr.n AS DOUBLE) / CAST(od.tot AS DOUBLE) AS p
    FROM pairs pr JOIN outdeg od USING (prev_state)
    """,
    notes="extension: first-order Markov transition matrix "
    "(operators/windows.event_transitions) — population-level state-flow "
    "statistics over per-user event sequences (the aggregate twin of "
    "q_funnel's per-user path test). One per-key window shuffle for the "
    "lag, then a |states|²-cardinality count; the probability is ONE "
    "division of exact integers shipped RAW (never ROUND a quotient — "
    "the engines' rounding modes diverge exactly there)",
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import windows as window_ops

    ev = table(spark, sf_dir, "events")
    return window_ops.event_transitions(ev, "user_id", "ts", "event_type", "event_id")


@register(
    "q_value_histogram",
    "agg",
    oracle="""
    WITH edges AS (
      SELECT MIN(value) AS lo, MAX(value) AS hi,
             (MAX(value) - MIN(value)) / 10.0 AS width
      FROM events
    ),
    binned AS (
      SELECT e.event_type,
             CAST(LEAST(9, GREATEST(0,
               CAST(FLOOR((e.value - d.lo) / d.width) AS BIGINT))) AS INT) AS bin
      FROM events e, edges d
    ),
    counts AS (
      SELECT event_type, bin, CAST(COUNT(*) AS BIGINT) AS n
      FROM binned GROUP BY 1, 2
    ),
    totals AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS tot FROM counts GROUP BY 1)
    SELECT c.event_type, c.bin, c.n,
           CAST(c.n AS DOUBLE) / CAST(t.tot AS DOUBLE) AS frac
    FROM counts c JOIN totals t USING (event_type)
    """,
    notes="extension: per-group fixed-width value histogram "
    "(operators/validation.value_histogram) — the monitoring primitive "
    "under PSI drift, promoted from pytest-only to a driver oracle. One "
    "partial-aggregable (group, bin) shuffle to a group×bins-sized "
    "result; out-of-range values clamp into edge bins so drifted tails "
    "stay visible. Determinism: bin = floor of one subtraction + one "
    "division over bit-identical doubles (correctly-rounded IEEE ops), "
    "frac = ONE division of exact integers — no ROUND anywhere",
)
def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import validation

    ev = table(spark, sf_dir, "events")
    h = validation.value_histogram(ev, "value", "event_type", n_bins=10)
    return h.select("event_type", "bin", "n", "frac")


@register(
    "q_hist_equidepth",
    "agg",
    oracle="""
    WITH b AS (
      SELECT event_type,
             CAST(round(value * 100) AS BIGINT) AS cents,
             CAST(ntile(10) OVER (
               PARTITION BY event_type
               ORDER BY CAST(round(value * 100) AS BIGINT), event_id
             ) AS INTEGER) AS bin
      FROM events
    )
    SELECT event_type, bin,
           MIN(cents) AS lo, MAX(cents) AS hi,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM b GROUP BY 1, 2
    """,
    notes="extension: per-group EQUI-DEPTH histogram "
    "(operators/validation.equidepth_histogram) — equal-count bins with "
    "their actual value ranges, the skew-proof complement of "
    "q_value_histogram's fixed-width bins (one hot bin + nine empty on "
    "a power law). Equal depth IS ntile, so the plan is one per-group "
    "sort exchange (what any exact quantile costs) + a "
    "partial-aggregable (group,bin) rollup; event_id tiebreak "
    "totalizes boundary ties; cents grid keeps lo/hi/n bigint-exact",
)
def q_hist_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import validation

    ev = table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    return validation.equidepth_histogram(ev, cents, "event_type", "event_id", n_bins=10)


@register(
    "q_psi_drift",
    "agg",
    oracle=f"""
    WITH ref AS (SELECT event_type, value FROM events
                 WHERE ts < TIMESTAMP '{_PSI_SPLIT}'),
    cur AS (SELECT event_type, value FROM events
            WHERE ts >= TIMESTAMP '{_PSI_SPLIT}'),
    edges AS (
      SELECT MIN(value) AS lo, MAX(value) AS hi,
             (MAX(value) - MIN(value)) / 8.0 AS width
      FROM ref
    ),
    hist_ref AS (
      SELECT event_type, bin, CAST(COUNT(*) AS BIGINT) AS n
      FROM (SELECT r.event_type,
                   CAST(LEAST(7, GREATEST(0,
                     CAST(FLOOR((r.value - d.lo) / d.width) AS BIGINT))) AS INT) AS bin
            FROM ref r, edges d)
      GROUP BY 1, 2
    ),
    hist_cur AS (
      SELECT event_type, bin, CAST(COUNT(*) AS BIGINT) AS n
      FROM (SELECT c.event_type,
                   CAST(LEAST(7, GREATEST(0,
                     CAST(FLOOR((c.value - d.lo) / d.width) AS BIGINT))) AS INT) AS bin
            FROM cur c, edges d)
      GROUP BY 1, 2
    ),
    frac_ref AS (
      SELECT event_type, bin,
             CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY event_type) AS DOUBLE) AS p
      FROM hist_ref
    ),
    frac_cur AS (
      SELECT event_type, bin,
             CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY event_type) AS DOUBLE) AS q
      FROM hist_cur
    ),
    joined AS (
      SELECT COALESCE(r.event_type, c.event_type) AS event_type,
             GREATEST(COALESCE(r.p, 0.0), 0.0001) AS pe,
             GREATEST(COALESCE(c.q, 0.0), 0.0001) AS qe
      FROM frac_ref r FULL OUTER JOIN frac_cur c
        ON r.event_type = c.event_type AND r.bin = c.bin
    )
    SELECT event_type,
           CAST(SUM(CAST(ROUND((pe - qe) * LN(pe / qe) * 1000000.0, 0) AS BIGINT))
                AS DOUBLE) / 1000000.0 AS psi,
           CAST(COUNT(*) AS INT) AS n_bins_compared
    FROM joined GROUP BY event_type
    """,
    notes="extension: Population Stability Index drift per event_type "
    "(operators/validation.psi_drift) between the month's first-half "
    "reference slice and the second-half live slice, sharing the "
    "REFERENCE's bin edges (the stream-monitoring discipline: live "
    "batches are histogrammed against frozen reference edges). Cost is "
    "group×bins rows end-to-end after two histogram shuffles. "
    "Determinism: each non-negative PSI term is snapped to a 1e-6 "
    "integer grid before the sum (the token_entropy discipline) — "
    "order-free exact 64-bit arithmetic, bit-identical across engines "
    "and cluster sizes",
)
def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import validation

    ev = table(spark, sf_dir, "events")
    split = F.lit(_PSI_SPLIT).cast("timestamp")
    ref = ev.where(F.col("ts") < split)
    cur = ev.where(F.col("ts") >= split)
    row = ref.agg(F.min("value").alias("_lo"), F.max("value").alias("_hi")).first()
    lo, hi = float(row["_lo"]), float(row["_hi"])
    h_ref = validation.value_histogram(ref, "value", "event_type", n_bins=8, lo=lo, hi=hi)
    h_cur = validation.value_histogram(cur, "value", "event_type", n_bins=8, lo=lo, hi=hi)
    psi = validation.psi_drift(h_ref, h_cur, group_col="event_type", grid=1e6)
    return psi.select("event_type", "psi", "n_bins_compared")


@register(
    "q_stats_corr",
    "agg",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sum_x,
             CAST(SUM(y) AS BIGINT) AS sum_y,
             CAST(SUM(x * y) AS BIGINT) AS sum_xy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM (
        SELECT l_returnflag,
               CAST(l_quantity AS BIGINT) AS x,
               CAST(ROUND(l_discount * 100, 0) AS BIGINT) AS y
        FROM lineitem
      )
      GROUP BY l_returnflag
    )
    SELECT l_returnflag, n, sum_x, sum_y, sum_xy,
           CAST(n * sum_xy - sum_x * sum_y AS DOUBLE)
             / NULLIF(SQRT(CAST(n * sxx - sum_x * sum_x AS DOUBLE))
                      * SQRT(CAST(n * syy - sum_y * sum_y AS DOUBLE)), 0.0) AS corr
    FROM m
    """,
    notes="§2.5 extension: per-group Pearson correlation from EXACT "
    "integer moments (operators/aggregates.grouped_corr_exact) — the "
    "deterministic alternative to corr()'s order-dependent float "
    "accumulation. Quantity is integer-valued; discount is snapped to its "
    "hundredths lattice; all five moments are exact int64 sums (one "
    "partial-aggregable shuffle), and the final corr is a fixed tree of "
    "correctly-rounded IEEE ops (two sqrts, one multiply, one divide over "
    "exact-int casts) — bit-identical across engines AND cluster sizes, "
    "shipped RAW with the moments alongside for exact certification",
)
def q_stats_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import aggregates

    li = table(spark, sf_dir, "lineitem")
    return aggregates.grouped_corr_exact(
        li,
        "l_returnflag",
        F.col("l_quantity"),
        F.round(F.col("l_discount") * 100, 0),
    )


@register(
    "q_graph_triangles_oriented",
    "agg",
    oracle="""
    WITH de AS (
      SELECT DISTINCT c.c_nationkey AS src, s.s_nationkey AS dst
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
    ),
    und AS (
      SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
      FROM de WHERE LEAST(src, dst) < GREATEST(src, dst)
    ),
    tri AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM und e1
      JOIN und e2 ON e1.v = e2.u
      JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
    )
    SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM (SELECT a AS node FROM tri
          UNION ALL SELECT b FROM tri
          UNION ALL SELECT c FROM tri)
    GROUP BY node
    """,
    notes="extension: the SAME triangle semantics as q_graph_triangles "
    "through the degree-oriented physical strategy (operators/graph."
    "triangle_counts_oriented) — edges oriented low→high (degree, node), "
    "wedges enumerated only among out-neighbors, so a hub's wedge count "
    "is ZERO instead of deg²/4 and total wedge volume is bounded by the "
    "O(m^1.5) arboricity bound regardless of skew. The driver certifying "
    "both against one oracle pins that the two strategies agree "
    "bit-for-bit — the plan-swap-safety property a 100 TB engine needs "
    "before it can pick the strategy by degree statistics",
)
def q_graph_triangles_oriented(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import graph

    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    edges = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .select(c["c_nationkey"].alias("src"), s["s_nationkey"].alias("dst"))
        .distinct()
    )
    # same materialization as q_graph_triangles: the oriented counter
    # consumes the undirected edge set five times (degree agg ×2, the
    # orientation join, the closing join) — checkpoint it once
    und = cacheutil.materialize(graph.undirected_edges(edges))
    return graph.triangle_counts_oriented(und)


@register(
    "q_sketch_shards",
    "agg",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_exact,
           CAST(1 AS INTEGER) AS merge_ok
    FROM orders GROUP BY year(o_orderdate)
    UNION ALL
    SELECT CAST(NULL AS INTEGER) AS yr,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_exact,
           CAST(1 AS INTEGER) AS merge_ok
    FROM orders
    """,
    notes="extension: MERGEABLE distinct-count sketches (Datasketches HLL "
    "via hll_sketch_agg/hll_union_agg) — the pattern approx_count_distinct "
    "can't express: one sketch ROW per shard (year) is materializable as "
    "an incremental index, and the GLOBAL distinct comes from unioning "
    "the 7 shard sketches — bytes per shard, no second corpus scan, no "
    "distinct-key shuffle. At 100 TB this is how cross-partition "
    "cardinality is served: maintain per-partition sketches at write "
    "time, merge at query time. Self-certifying form (q_approx_distinct "
    "pattern): emits the EXACT per-shard and global distinct counts plus "
    "an in-plan |est−exact| ≤ 2%·exact bit at lgConfigK=14 (rel err "
    "~0.8%); the exact global pass is certification-only — the sketch "
    "union is the product path. Sketches are hash-deterministic, so the "
    "bit is stable run-to-run",
)
def q_sketch_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").select(
        F.year("o_orderdate").alias("yr"), "o_custkey"
    )
    shard = o.groupBy("yr").agg(
        F.hll_sketch_agg("o_custkey", F.lit(14)).alias("_sk"),
        F.count_distinct("o_custkey").alias("n_exact"),
    )
    within = lambda est, exact: (  # noqa: E731
        F.abs(est.cast("double") - exact.cast("double"))
        <= F.lit(0.02) * exact.cast("double")
    ).cast("int")
    per_shard = shard.select(
        "yr",
        "n_exact",
        within(F.hll_sketch_estimate("_sk"), F.col("n_exact")).alias("merge_ok"),
    )
    merged = shard.agg(F.hll_sketch_estimate(F.hll_union_agg("_sk")).alias("_est"))
    g_exact = o.agg(F.count_distinct("o_custkey").alias("n_exact"))
    glob = merged.crossJoin(g_exact).select(
        F.lit(None).cast("int").alias("yr"),
        "n_exact",
        within(F.col("_est"), F.col("n_exact")).alias("merge_ok"),
    )
    return per_shard.unionAll(glob)


@register(
    "q_stats_mad",
    "agg",
    oracle="""
    WITH d AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS x FROM events
    ), m AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(median(x) AS DOUBLE) AS med
      FROM d GROUP BY 1
    )
    SELECT d.event_type, m.n, m.med,
           CAST(median(abs(d.x - m.med)) AS DOUBLE) AS mad
    FROM d JOIN m USING (event_type)
    GROUP BY 1, 2, 3
    """,
    notes="extension: per-group robust location/scale — exact median + "
    "MAD (operators/aggregates.grouped_median_mad). median is the exact "
    "sort-based percentile aggregate: ORDER-FREE, so the raw doubles "
    "hash-compare across engines (unlike any float sum); cents lattice "
    "keeps even-count interpolation on exact half-cents. Two "
    "partial-sort aggregations with the group-cardinality median table "
    "broadcast between them — the robust complement of q_stats_corr's "
    "moment statistics",
)
def q_stats_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.aggregates import grouped_median_mad

    ev = table(spark, sf_dir, "events")
    return grouped_median_mad(ev, "event_type", F.round(F.col("value") * 100))


@register(
    "q_anomaly_robust",
    "agg",
    oracle="""
    WITH d AS (
      SELECT event_id, event_type,
             CAST(round(value * 100) AS BIGINT) AS x
      FROM events
    ), m AS (
      SELECT event_type, CAST(median(x) AS DOUBLE) AS med
      FROM d GROUP BY 1
    ), s AS (
      SELECT d.event_type, CAST(median(abs(d.x - m.med)) AS DOUBLE) AS mad
      FROM d JOIN m USING (event_type) GROUP BY 1
    )
    SELECT d.event_id, d.event_type,
           CAST(CASE WHEN abs(d.x - m.med) > 3.0 * s.mad
                THEN 1 ELSE 0 END AS INTEGER) AS outlier
    FROM d JOIN m USING (event_type) JOIN s USING (event_type)
    """,
    notes="extension: robust per-group outlier gate — |x − median| > "
    "3·MAD, the resistant alternative to q_anomaly_zscore (one outlier "
    "inflates mean AND stddev, masking itself; median/MAD need half "
    "the group to be wrong). Composes grouped_median_mad's exact "
    "medians (order-free sort aggregates on the cents lattice) with a "
    "broadcast of the group-cardinality stats table back onto the "
    "fact; the 3·MAD comparison is a fixed double expression on exact "
    "lattice values — deterministic both engines",
)
def q_anomaly_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.aggregates import grouped_median_mad

    ev = table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    stats = grouped_median_mad(ev, "event_type", F.round(F.col("value") * 100))
    return (
        ev.select("event_id", "event_type", cents.alias("_x"))
        .join(F.broadcast(stats.select("event_type", "med", "mad")), "event_type")
        .select(
            "event_id",
            "event_type",
            (F.abs(F.col("_x") - F.col("med")) > 3.0 * F.col("mad"))
            .cast("int")
            .alias("outlier"),
        )
    )


def _cms_bucket_sql(key: str, a: str, b: str, width: int) -> str:
    """SQL text of the CMS bucket hash — the LITERAL SAME nonnegative-mod
    chain ``((x % m) + m) % m`` the Spark ``_cms_bucket`` evaluates, so
    both engines land buckets in [0, width) for any key sign regardless
    of their ``%`` sign-of-dividend convention."""
    from ..operators.aggregates import CMS_PRIME

    p = CMS_PRIME
    k = f"((({key}) % {p}) + {p}) % {p}"
    v = f"(({k}) * {a} + {b})"
    vp = f"((({v}) % {p}) + {p}) % {p}"
    return f"((({vp}) % {width}) + {width}) % {width}"


def _cms_oracle(width: int = 256) -> str:
    """Generated oracle for q_sketch_countmin: the IDENTICAL hash family
    and shard/merge arithmetic the Spark build runs (pure integer
    nonnegative-mod chains — bit-exact on any engine)."""
    from ..operators.aggregates import CMS_HASHES

    hrows = ", ".join(f"({i}, {a}, {b})" for i, (a, b) in enumerate(CMS_HASHES))
    build_bucket = _cms_bucket_sql("o_custkey", "a", "b", width)
    probe_bucket = _cms_bucket_sql("p.k", "h.a", "h.b", width)
    return f"""
    WITH h(d, a, b) AS (VALUES {hrows}),
    cms AS (
      SELECT d,
             {build_bucket} AS bucket,
             COUNT(*) AS c
      FROM orders, h
      GROUP BY 1, 2
    ), probes AS (
      SELECT DISTINCT o_custkey AS k FROM orders WHERE o_custkey <= 40
    ), est AS (
      SELECT p.k,
             CAST(MIN(COALESCE(cms.c, 0)) AS BIGINT) AS est_n
      FROM probes p
      JOIN h ON TRUE
      LEFT JOIN cms
        ON cms.d = h.d
       AND cms.bucket = {probe_bucket}
      GROUP BY 1
    ), exact AS (
      SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS exact_n
      FROM orders WHERE o_custkey <= 40 GROUP BY 1
    )
    SELECT est.k AS custkey, exact.exact_n, est.est_n,
           CAST(est.est_n >= exact.exact_n AS INTEGER) AS never_under
    FROM est JOIN exact USING (k)
    """


@register(
    "q_sketch_countmin",
    "agg",
    oracle=_cms_oracle(),
    notes="extension: count-min sketch as a RELATIONAL TABLE (d, bucket, "
    "c) — the mergeable frequency twin of q_sketch_shards' HLL "
    "cardinality shards (operators/aggregates.count_min_table / "
    "cms_estimate). Build is one partial-aggregable (depth, bucket) "
    "groupBy whose shuffle is ≤ depth·width rows at ANY fact size "
    "(where the exact groupBy shuffles the key domain); shards merge by "
    "union+sum (counter matrices add — no binary format, no UDAF); "
    "estimates probe ≤ depth·width broadcast rows. width=256 vs ~1k "
    "distinct custkeys forces real collisions, so est>exact rows "
    "exercise the min; never_under is the sketch's HARD guarantee and "
    "the exact_n column keeps the contract value-exact. Hash family is "
    "a public-constant universal mod chain evaluated identically by "
    "both engines (the oracle text is GENERATED from the same "
    "constants)",
)
def q_sketch_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.aggregates import cms_estimate, count_min_table

    o = table(spark, sf_dir, "orders")
    cms = count_min_table(o, "o_custkey", width=256)
    probes = o.where(F.col("o_custkey") <= 40).select("o_custkey").distinct()
    est = cms_estimate(cms, probes, "o_custkey", width=256)
    exact = (
        o.where(F.col("o_custkey") <= 40)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("exact_n"))
    )
    return (
        est.join(exact, "o_custkey")
        .select(
            F.col("o_custkey").alias("custkey"),
            "exact_n",
            "est_n",
            (F.col("est_n") >= F.col("exact_n")).cast("int").alias("never_under"),
        )
    )


@register(
    "q_anomaly_cusum",
    "window",
    oracle="""
    WITH t AS (
      SELECT CAST((CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   * 1000) // COUNT(*) AS BIGINT) AS num,
             CAST(1000 AS BIGINT) AS den
      FROM events
    ), d AS (
      SELECT user_id, ts, event_id,
             den * CAST(round(value * 100) AS BIGINT) - num - den * 2500 AS dev,
             den
      FROM events, t
    ), s AS (
      SELECT user_id, ts, event_id, den,
             SUM(dev) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS sv
      FROM d
    ), m AS (
      SELECT user_id, ts, event_id, den, sv,
             MIN(sv) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS mn
      FROM s
    )
    SELECT user_id, ts, event_id,
           CAST(sv - least(0, mn) AS BIGINT) AS c_scaled,
           CAST(CASE WHEN sv - least(0, mn) > den * 20000 THEN 1 ELSE 0 END
                AS INTEGER) AS alarm
    FROM m
    """,
    notes="extension: one-sided Page CUSUM change-point detection per "
    "user (operators/timeseries.cusum_alarms) — the sequential monitor "
    "that catches small SUSTAINED level shifts the pointwise z-score "
    "gate can't see. The clamped recursion max(0, C+x-k) telescopes to "
    "prefix-sum minus running-min-including-empty-prefix — two window "
    "functions on ONE per-key "
    "shuffle, fully codegen. Cents grid + cross-multiplied rational "
    "target keep every comparison bigint-exact across engines; the "
    "target is the global mean REDUCED to a fixed milli-cent rational "
    "((sum*1000) div n over den=1000, r8 — a raw row-count denominator "
    "multiplied every deviation by N, overflowing int64 at ~1e6*grid "
    "rows/key on a billion-row corpus; floor-div of positive bigints "
    "is engine-identical). Slack 25.00 (~0.5 sigma of "
    "the value distribution), threshold 200.00 (~4 sigma) — the "
    "textbook ARL operating point; fires on ~3% of sf0.01 rows",
)
def q_anomaly_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import cusum_alarms

    ev = table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    # fixed milli-cent rational target: num/den = floor(mean·1000)/1000.
    # den must NOT be the row count — it multiplies every deviation, so
    # per-key prefix sums would grow with corpus size and wrap int64
    # (cusum_alarms docstring bound). Positive sums, so Spark's
    # truncating `div` and DuckDB's flooring `//` agree.
    tot = ev.agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("_sum"),
        F.count("*").alias("_cnt"),
    ).select(
        F.expr("(_sum * 1000) div _cnt").alias("_num"),
        F.lit(1000).cast("long").alias("_den"),
    )
    base = ev.crossJoin(F.broadcast(tot))
    return cusum_alarms(
        base,
        "user_id",
        ["ts", "event_id"],
        cents,
        F.col("_num"),
        F.col("_den"),
        F.lit(2500).cast("long"),
        F.lit(20000).cast("long"),
    )


@register(
    "q_funnel_steps",
    "agg",
    oracle="""
    WITH s0 AS (
      SELECT user_id, MIN(ts) AS t FROM events
      WHERE event_type = 'view' GROUP BY 1
    ), s1 AS (
      SELECT e.user_id, MIN(e.ts) AS t
      FROM events e JOIN s0 ON e.user_id = s0.user_id AND e.ts > s0.t
      WHERE e.event_type = 'click' GROUP BY 1
    ), s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t
      FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
      WHERE e.event_type = 'purchase' GROUP BY 1
    )
    SELECT CAST(0 AS INTEGER) AS step_idx, 'view' AS step,
           CAST(COUNT(*) AS BIGINT) AS n_users FROM s0
    UNION ALL
    SELECT CAST(1 AS INTEGER), 'click', CAST(COUNT(*) AS BIGINT) FROM s1
    UNION ALL
    SELECT CAST(2 AS INTEGER), 'purchase', CAST(COUNT(*) AS BIGINT) FROM s2
    """,
    notes="extension: ordered funnel as the REUSABLE OPERATOR in long format, one row per step (q_funnel is the inline wide-format signup-rooted twin) — how many "
    "users completed each prefix IN ORDER, earliest-completion semantics "
    "(greedy-earliest is provably optimal, so the chain of per-step "
    "user-keyed MIN aggregations is exact, not a heuristic; "
    "operators/timeseries.funnel_counts). Plan: one min-agg + equi-join "
    "per step over frames pre-filtered to ONE event type (predicate "
    "pushed to the scan, inputs shrink monotonically down the funnel); "
    "no window over raw events, no per-user sort. The loop is over the "
    "funnel's 3 steps, never over data",
)
def q_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import funnel_counts

    ev = table(spark, sf_dir, "events")
    return funnel_counts(ev, ["view", "click", "purchase"])


@register(
    "q_cohort_retention_daily",
    "agg",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events
    ), coh AS (
      SELECT user_id, MIN(d) AS c FROM pairs GROUP BY 1
    ), sizes AS (
      SELECT c, CAST(COUNT(*) AS BIGINT) AS n_cohort FROM coh GROUP BY 1
    ), act AS (
      SELECT coh.c, CAST(date_diff('day', coh.c, p.d) AS INTEGER) AS day_offset,
             CAST(COUNT(DISTINCT p.user_id) AS BIGINT) AS n_active
      FROM pairs p JOIN coh ON p.user_id = coh.user_id
      GROUP BY 1, 2
    )
    SELECT act.c AS cohort_day, act.day_offset, sizes.n_cohort, act.n_active,
           CAST(act.n_active AS DOUBLE) / CAST(sizes.n_cohort AS DOUBLE) AS retention
    FROM act JOIN sizes ON act.c = sizes.c
    """,
    notes="extension: cohort retention as the REUSABLE OPERATOR — day-grain on the event stream with the retention RATIO column (q_cohort_retention is the inline month-grain orders twin, counts only); users grouped by first-seen day, per-offset active share "
    "(operators/timeseries.cohort_retention). Plan: fact collapses to "
    "distinct (user, day) pairs ONCE (partial-aggregable), cohort is a "
    "user-keyed min, the matrix is days² rows at any corpus size. "
    "retention is ONE raw division of exact longs (never a float sum), "
    "so the doubles hash-compare across engines",
)
def q_cohort_retention_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import cohort_retention

    ev = table(spark, sf_dir, "events")
    return cohort_retention(ev)


@register(
    "q_rolling_corr",
    "window",
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day,
             CAST(COALESCE(SUM(CASE WHEN event_type = 'click'
                    THEN CAST(FLOOR(value * 100) AS BIGINT) END), 0) AS BIGINT) AS x,
             CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
                    THEN CAST(FLOOR(value * 100) AS BIGINT) END), 0) AS BIGINT) AS y
      FROM events WHERE event_type IN ('click', 'purchase')
      GROUP BY 1
    ), w AS (
      SELECT day,
             CAST(COUNT(*) OVER win AS BIGINT) AS n,
             SUM(x) OVER win AS sx, SUM(y) OVER win AS sy,
             SUM(x * y) OVER win AS sxy,
             SUM(x * x) OVER win AS sxx, SUM(y * y) OVER win AS syy
      FROM daily
      WINDOW win AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT day, n,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / NULLIF(
               sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)), 0.0)
             AS corr
    FROM w
    """,
    notes="extension: trailing-7-row Pearson correlation between two "
    "integer series (daily click-cents vs purchase-cents) from EXACT "
    "int64 window sums — the co-movement drift monitor "
    "(operators/windows.rolling_corr_exact). Per-row cents are "
    "FLOOR(value·100) of bit-identical doubles (never ROUND a product); "
    "the five sums share ONE count-based ROWS frame (head windows "
    "n<7 agree row-for-row across engines); corr's numerator/variance "
    "products are FIXED double trees over the exact sums (the r9 "
    "skew/kurt overflow lesson applied from the start — never int64 "
    "n·S products), so raw doubles hash-compare. One window exchange",
)
def q_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.windows import rolling_corr_exact

    ev = table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100).cast("long")
    daily = (
        ev.where(F.col("event_type").isin("click", "purchase"))
        .groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("event_type") == "click", cents)), F.lit(0)
            ).cast("long").alias("x"),
            F.coalesce(
                F.sum(F.when(F.col("event_type") == "purchase", cents)), F.lit(0)
            ).cast("long").alias("y"),
        )
    )
    return rolling_corr_exact(daily, "day", F.col("x"), F.col("y"), window_rows=7)


@register(
    "q_corpus_gini",
    "agg",
    oracle="""
    WITH d AS (
      SELECT source, CAST(length(text) AS BIGINT) AS x FROM documents
    ), r AS (
      SELECT source, x,
             CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY x) AS BIGINT) AS i
      FROM d
    ), g AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sum_x,
             CAST(SUM(i * x) AS BIGINT) AS ix
      FROM r GROUP BY 1
    )
    SELECT source, n, sum_x,
           CAST(2 * ix - (n + 1) * sum_x AS DOUBLE)
           / NULLIF(CAST(n * sum_x AS DOUBLE), 0.0) AS gini
    FROM g
    """,
    notes="extension: per-source Gini coefficient of document byte sizes "
    "— the corpus-balance inequality audit (G=0 equal shares, G→1 one "
    "doc dominates) means/medians can't answer "
    "(operators/aggregates.grouped_gini). Exact sorted-rank identity "
    "G = (2·Σi·x − (n+1)·Σx)/(n·Σx): one row_number window + one "
    "partial-aggregable agg sharing the group exchange, everything "
    "int64-exact until ONE raw division; rank ties are order-free "
    "(Σi·x over equal x is permutation-invariant), so no tiebreak "
    "needed. int64 bound n·Σx < 2^63 documented on the operator",
)
def q_corpus_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.aggregates import grouped_gini

    d = table(spark, sf_dir, "documents")
    return grouped_gini(d, "source", F.length(F.col("text")))


@register(
    "q_ab_ztest",
    "agg",
    oracle="""
    WITH u AS (
      SELECT user_id,
             CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
               AS conv
      FROM events GROUP BY 1
    ), v AS (
      SELECT CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END AS variant, conv
      FROM u
    ), agg AS (
      SELECT variant, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(conv) AS BIGINT) AS c
      FROM v GROUP BY 1
    ), wide AS (
      SELECT
        (SELECT n FROM agg WHERE variant = 'a') AS n_a,
        (SELECT c FROM agg WHERE variant = 'a') AS conv_a,
        (SELECT n FROM agg WHERE variant = 'b') AS n_b,
        (SELECT c FROM agg WHERE variant = 'b') AS conv_b
    )
    SELECT n_a, conv_a, n_b, conv_b,
           (CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
            - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
           / NULLIF(sqrt(
               (((CAST(conv_a AS DOUBLE) + CAST(conv_b AS DOUBLE))
                 / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)))
                * (1.0 - (CAST(conv_a AS DOUBLE) + CAST(conv_b AS DOUBLE))
                         / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))))
               * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))
             ), 0.0) AS z
    FROM wide
    """,
    notes="extension: two-proportion z-test between two variants from "
    "EXACT integer counts (operators/aggregates.two_proportion_ztest) — "
    "the A/B readout; variant = user_id parity (a deterministic "
    "synthetic split on this data), conversion = any purchase. One "
    "user-keyed agg + one variant-keyed agg; z's divisions and sqrt are "
    "correctly-rounded IEEE in the SAME left-associated tree both "
    "engines evaluate (pool·(1−pool) first, then the 1/n sum), so the "
    "raw double hash-compares. Degenerate splits yield NULL via NULLIF",
)
def q_ab_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.aggregates import two_proportion_ztest

    ev = table(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        F.max((F.col("event_type") == "purchase").cast("long")).alias("conv")
    )
    per_user = users.select(
        F.when(F.col("user_id") % 2 == 0, "a").otherwise("b").alias("variant"),
        F.col("conv").alias("converted"),
    )
    return two_proportion_ztest(per_user, "variant", "converted")


@register(
    "q_salted_distinct",
    "agg",
    oracle="""
    SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct
    FROM events GROUP BY 1
    """,
    notes="extension: exact per-key distinct count via salt-partitioned "
    "two-phase aggregation (operators/aggregates.salted_count_distinct) "
    "— the hot-key rewrite: plain count_distinct funnels a hot key's "
    "whole value set through one reducer (distinct state can't map-side "
    "combine), salting by a hash OF THE VALUE splits that state "
    "salt_buckets ways while staying EXACT (distinct values land in "
    "exactly one bucket, so bucket counts are disjoint and sum to the "
    "truth — which is why the oracle is plain COUNT(DISTINCT): the "
    "bucketing cancels out). AQE skew handling doesn't cover single-key "
    "aggregation state; this is the standard rewrite",
)
def q_salted_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.aggregates import salted_count_distinct

    ev = table(spark, sf_dir, "events")
    return salted_count_distinct(ev, "event_type", "user_id")


@register(
    "q_audit_fk",
    "agg",
    oracle="""
    WITH child AS (
      SELECT o_custkey AS fk FROM orders
      UNION ALL
      SELECT -(o_custkey + 1) AS fk FROM orders WHERE o_orderkey % 1000 = 0
      UNION ALL
      SELECT CAST(NULL AS BIGINT) AS fk FROM orders WHERE o_orderkey % 2000 = 0
    ), viol AS (
      SELECT fk AS fk_value, 'null_fk' AS reason FROM child WHERE fk IS NULL
      UNION ALL
      SELECT fk, 'dangling_fk' FROM child
      WHERE fk IS NOT NULL
        AND fk NOT IN (SELECT c_custkey FROM customer)
    )
    SELECT reason, CAST(COUNT(*) AS BIGINT) AS n_violations,
           CAST(COUNT(DISTINCT fk_value) AS BIGINT) AS n_distinct_keys
    FROM viol GROUP BY 1
    """,
    notes="extension: referential-integrity audit — child rows whose FK "
    "matches no parent PK (operators/validation.fk_violations): one "
    "anti-join on the key, with NULL FKs reported separately from "
    "dangling ones (an anti-join alone conflates them — NULL never "
    "equi-matches — yet a NULL FK is modeling while a dangling value is "
    "corruption). PLANTED violations (negated custkeys + NULL rows) "
    "make both reasons real on this otherwise FK-clean corpus; the "
    "contract aggregates to (reason, n, distinct-keys) so the row set "
    "stays small while the raw-row form stays available for quarantine "
    "sinks",
)
def q_audit_fk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.validation import fk_violations

    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    child = (
        o.select(F.col("o_custkey").alias("fk"))
        .unionByName(
            o.where(F.col("o_orderkey") % 1000 == 0).select(
                (-(F.col("o_custkey") + 1)).alias("fk")
            )
        )
        .unionByName(
            o.where(F.col("o_orderkey") % 2000 == 0).select(
                F.lit(None).cast("long").alias("fk")
            )
        )
    )
    viol = fk_violations(child, c, "fk", "c_custkey")
    return viol.groupBy("reason").agg(
        F.count("*").cast("long").alias("n_violations"),
        F.count_distinct("fk_value").cast("long").alias("n_distinct_keys"),
    )


@register(
    "q_changepoint",
    "window",
    oracle="""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT)
               + CASE WHEN date_trunc('day', ts) >= TIMESTAMP '2024-01-15'
                      THEN 500000 ELSE 0 END AS x
      FROM events GROUP BY 1, 2
    ), cum AS (
      SELECT event_type, day,
             SUM(x) OVER (PARTITION BY event_type ORDER BY day
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sk,
             CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS k,
             SUM(x) OVER (PARTITION BY event_type) AS sn,
             CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
      FROM daily
    ), scored AS (
      SELECT event_type, day, n, ABS(n * sk - k * sn) AS d,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY ABS(n * sk - k * sn) DESC, day ASC) AS rn
      FROM cum
    )
    SELECT event_type, n, day AS split_at, CAST(d AS BIGINT) AS d_max,
           CAST(d AS DOUBLE) / CAST(n AS DOUBLE) AS score
    FROM scored WHERE rn = 1
    """,
    notes="extension: offline single-changepoint detection per group — "
    "the binary-segmentation step: argmax_k |n·S_k − k·S_n| over the "
    "day-ordered series, EXACT int64 (the ks_drift discipline applied "
    "to time; operators/timeseries.changepoint_cusum). A PLANTED level "
    "shift (+500000 cents/day from 2024-01-15) gives the detector a true "
    "answer to find; the online complement is q_anomaly_cusum (Page's "
    "test). One window exchange; ties break to the earliest day; score "
    "is one raw division of exact ints",
)
def q_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import changepoint_cusum

    ev = table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type", F.date_trunc("day", F.col("ts")).alias("day")
        )
        .agg(F.sum(F.floor(F.col("value") * 100).cast("long")).cast("long").alias("_base"))
        .select(
            "event_type",
            "day",
            (
                F.col("_base")
                + F.when(
                    F.col("day") >= F.lit("2024-01-15").cast("timestamp"), 500000
                ).otherwise(0)
            ).alias("x"),
        )
    )
    return changepoint_cusum(daily, "event_type", "day", F.col("x"))


def _join_size_oracle(width: int = 65536) -> str:
    """Generated oracle for q_join_size_sketch: the identical CMS builds
    (shared pmod hash chain), per-depth inner products, min over depths,
    plus the exact join size and the one-sided-guarantee bit."""
    from ..operators.aggregates import CMS_HASHES

    hrows = ", ".join(f"({i}, {a}, {b})" for i, (a, b) in enumerate(CMS_HASHES))
    ba = _cms_bucket_sql("o_orderkey", "a", "b", width)
    bb = _cms_bucket_sql("l_orderkey", "a", "b", width)
    return f"""
    WITH h(d, a, b) AS (VALUES {hrows}),
    cms_a AS (
      SELECT d, {ba} AS bucket, CAST(COUNT(*) AS BIGINT) AS c
      FROM orders, h GROUP BY 1, 2
    ), cms_b AS (
      SELECT d, {bb} AS bucket, CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem, h GROUP BY 1, 2
    ), per_depth AS (
      SELECT cms_a.d, SUM(cms_a.c * cms_b.c) AS ip
      FROM cms_a JOIN cms_b ON cms_a.d = cms_b.d AND cms_a.bucket = cms_b.bucket
      GROUP BY 1
    ), est AS (
      SELECT CAST(MIN(ip) AS BIGINT) AS est_join_size FROM per_depth
    ), exact AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS exact_join_size
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    )
    SELECT est.est_join_size, exact.exact_join_size,
           CAST(est.est_join_size >= exact.exact_join_size AS INTEGER) AS never_under
    FROM est, exact
    """


@register(
    "q_join_size_sketch",
    "agg",
    oracle=_join_size_oracle(),
    notes="extension: equi-join SIZE estimation from two count-min tables "
    "(operators/aggregates.cms_join_size) — the AMS/CMS inner-product "
    "estimator: per-depth Σ_bucket a[b]·b[b] each OVERESTIMATE "
    "Σ_k f_A(k)·f_B(k) (collision mass is non-negative), min over "
    "depths keeps the hard ≥-truth guarantee. This is what prices "
    "broadcast-vs-shuffle and staging BEFORE running a join, at the "
    "cost of joining two ≤ depth·width-row sketch tables the ingest "
    "indexes (IncrementalCmsIndex) already maintain. Exact+bound "
    "self-certification: the exact join size rides along and "
    "never_under is asserted in-plan; oracle text GENERATED from the "
    "same hash constants. Width sizing: the collision term ADDS "
    "~n_A·n_B/width per depth, so width must dwarf the key "
    "cardinality for a tight estimate — 65536 here puts the expected "
    "overshoot at ~20% of the true 60k (1024 would drown it 14×)",
)
def q_join_size_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.aggregates import cms_join_size, count_min_table

    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    est = cms_join_size(
        count_min_table(o, "o_orderkey", width=65536),
        count_min_table(li, "l_orderkey", width=65536),
    )
    exact = o.join(
        li.select(F.col("l_orderkey").alias("o_orderkey")), "o_orderkey"
    ).agg(F.count("*").cast("long").alias("exact_join_size"))
    return est.crossJoin(F.broadcast(exact)).select(
        "est_join_size",
        "exact_join_size",
        (F.col("est_join_size") >= F.col("exact_join_size")).cast("int").alias("never_under"),
    )


@register(
    "q_decay_score",
    "agg",
    oracle="""
    WITH anchor AS (
      SELECT MAX(date_trunc('day', ts)) AS a FROM events
    ), d AS (
      SELECT event_type,
             CAST(FLOOR(value * 100) AS BIGINT) AS v,
             LEAST(4, GREATEST(0,
               CAST(date_diff('day', date_trunc('day', ts), anchor.a) AS BIGINT) // 7
             )) AS k
      FROM events, anchor
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(v * CAST(POWER(2, 4 - k) AS BIGINT)) AS BIGINT) AS scaled_sum,
           CAST(SUM(v * CAST(POWER(2, 4 - k) AS BIGINT)) AS DOUBLE)
             / CAST(POWER(2, 4) AS DOUBLE) AS score
    FROM d GROUP BY 1
    """,
    notes="extension: exponentially time-decayed engagement score in the "
    "EXACT dyadic form (operators/aggregates.decayed_sum_dyadic) — "
    "halve per 7-day bucket against the corpus max-day anchor: every "
    "weight is a power of two, so the scaled sum is pure int64 "
    "(order-free, one partial-aggregable shuffle where Σ v·exp(−λt) is "
    "libm- and order-dependent) and the score is ONE exact division by "
    "2^k_max. The staircase is the documented trade for exactness; the "
    "30-day event span at half_life 7 sizes k_max=4 (max_age=28), "
    "leaving 2^59 of value headroom (the operator docs carry the "
    "envelope formula). DuckDB integer division is '//' (plain '/' "
    "yields DOUBLE), matching the Spark cast-truncation; POWER(2, int) "
    "is exact in both engines at these sizes",
)
def q_decay_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.aggregates import decayed_sum_dyadic

    ev = table(spark, sf_dir, "events")
    anchor = ev.agg(F.max(F.date_trunc("day", F.col("ts"))).alias("_a"))
    d = ev.crossJoin(F.broadcast(anchor)).select(
        "event_type",
        F.floor(F.col("value") * 100).cast("long").alias("v"),
        F.datediff(F.col("_a"), F.date_trunc("day", F.col("ts"))).alias("age"),
    )
    return decayed_sum_dyadic(
        d, "event_type", F.col("v"), F.col("age"), half_life=7, max_age=28
    )


@register(
    "q_sketch_quantile",
    "agg",
    oracle="""
    WITH v AS (
      SELECT CAST(year(l_shipdate) AS INTEGER) AS yr,
             CAST(l_quantity AS BIGINT) AS x
      FROM lineitem
    ), c AS (
      SELECT yr, x, CAST(COUNT(*) AS BIGINT) AS cnt FROM v GROUP BY 1, 2
    ), cum AS (
      SELECT yr, x, cnt,
             SUM(cnt) OVER (PARTITION BY yr ORDER BY x) AS cum
      FROM c
    ), n AS (
      SELECT yr, CAST(SUM(cnt) AS BIGINT) AS n FROM c GROUP BY 1
    ), shard AS (
      SELECT cum.yr, MAX(n.n) AS n,
             MIN(CASE WHEN cum * 4 >= 1 * n.n THEN x END) AS q25,
             MIN(CASE WHEN cum * 2 >= 1 * n.n THEN x END) AS q50,
             MIN(CASE WHEN cum * 4 >= 3 * n.n THEN x END) AS q75,
             MIN(CASE WHEN cum * 20 >= 19 * n.n THEN x END) AS q95
      FROM cum JOIN n USING (yr) GROUP BY cum.yr
    ), gc AS (
      SELECT x, CAST(SUM(cnt) AS BIGINT) AS cnt FROM c GROUP BY 1
    ), gcum AS (
      SELECT x, cnt, SUM(cnt) OVER (ORDER BY x) AS cum FROM gc
    ), gn AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM gc)
    SELECT yr, n, q25, q50, q75, q95,
           CAST(1 AS INTEGER) AS rank_ok, CAST(1 AS INTEGER) AS n_ok
    FROM shard
    UNION ALL
    SELECT CAST(NULL AS INTEGER), gn.n,
           MIN(CASE WHEN cum * 4 >= 1 * gn.n THEN x END),
           MIN(CASE WHEN cum * 2 >= 1 * gn.n THEN x END),
           MIN(CASE WHEN cum * 4 >= 3 * gn.n THEN x END),
           MIN(CASE WHEN cum * 20 >= 19 * gn.n THEN x END),
           CAST(1 AS INTEGER), CAST(1 AS INTEGER)
    FROM gcum, gn GROUP BY gn.n
    """,
    notes="extension: MERGEABLE quantile sketches (Datasketches KLL via "
    "Spark 4's kll_sketch_agg_bigint) — the third sketch leg next to HLL "
    "cardinality (q_sketch_shards) and CMS frequency (q_sketch_countmin): "
    "per-shipyear ~3 KB sketch rows, global quantiles from "
    "kll_merge_agg_bigint over the shard rows — kilobytes move, the fact "
    "is scanned once. Self-certifying (q_sketch_shards discipline): the "
    "hash-checked outputs are EXACT ceil-rank quantiles (min x with "
    "cum·den ≥ num·n — pure integer threshold, engine-agnostic, no "
    "percentile_disc dialect dependence) computed from a 50-distinct-"
    "value cum table; rank_ok asserts in-plan that each sketch quantile "
    "estimate's EXACT rank interval (exclusive, inclusive] sits within "
    "5% normalized rank of the target "
    "(KLL k=200 guarantees ~1.65% at 99% conf; the sketch is "
    "coin-flip randomized so raw estimates are never hashed), and n_ok "
    "asserts kll_sketch_get_n — exact through any merge tree — equals "
    "the true shard/global count. The GLOBAL row certifies the MERGE "
    "path: its sketch is the union of the 7 shard sketches, never a "
    "direct second scan",
)
def q_sketch_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.aggregates import kll_merge_shards, kll_sketch_table

    li = table(spark, sf_dir, "lineitem").select(
        F.year("l_shipdate").cast("int").alias("yr"),
        F.col("l_quantity").cast("long").alias("x"),
    )
    ranks = [(1, 4, "q25"), (1, 2, "q50"), (3, 4, "q75"), (19, 20, "q95")]

    def arm(vals: DataFrame, sketch: DataFrame, keys: list[str]) -> DataFrame:
        """Exact ceil-rank quantiles + sketch certification bits.
        vals: (*keys, x); sketch: (*keys, kll, n).

        The cert arm folds the per-shard cum table into a MAP column
        (bounded: l_quantity has ≤ 50 distinct values; certification-only
        — the product path is the sketch) so the sketch estimate's exact
        rank bounds come from one element_at, no joins back. The bit is
        two-sided on DISCRETE data: the sketch may legitimately return a
        value v with p anywhere in (rank_exclusive(v), rank_inclusive(v)]
        ± the KLL ε, so it asserts
        (cum(v)−cnt(v))/n − ε ≤ p ≤ cum(v)/n + ε."""
        c = vals.groupBy(*keys, "x").agg(F.count("*").cast("long").alias("cnt"))
        w = Window.partitionBy(*keys).orderBy("x") if keys else Window.orderBy("x")
        cum = c.withColumn("cum", F.sum("cnt").over(w))
        cumn = cum.join(sketch.select(*keys, "n"), keys) if keys else cum.crossJoin(
            sketch.select("n")
        )
        # exact quantile q_p = MIN(x : cum·den ≥ num·n) — pure integer
        # threshold, engine-agnostic (no percentile_disc dialect)
        q = cumn.groupBy(*keys).agg(
            F.max("n").alias("n"),
            *[
                F.min(
                    F.when(F.col("cum") * den >= num * F.col("n"), F.col("x"))
                ).alias(name)
                for num, den, name in ranks
            ],
            F.map_from_entries(
                F.collect_list(F.struct("x", F.struct("cum", "cnt")))
            ).alias("_m"),
        )
        out = q.join(sketch.select(*keys, "kll"), keys) if keys else q.crossJoin(
            sketch.select("kll")
        )
        eps = 0.05
        nd = F.col("n").cast("double")
        bits = []
        for num, den, name in ranks:
            p = num / den
            est = F.expr(f"kll_sketch_get_quantile_bigint(kll, CAST({p} AS DOUBLE))")
            e = F.element_at("_m", est)
            bits.append(
                ((e["cum"] - e["cnt"]).cast("double") / nd - F.lit(eps) <= F.lit(p))
                & (F.lit(p) <= e["cum"].cast("double") / nd + F.lit(eps))
            )
        rank_ok = bits[0]
        for b in bits[1:]:
            rank_ok = rank_ok & b
        return out.select(
            *keys,
            "n",
            *[name for _, _, name in ranks],
            rank_ok.cast("int").alias("rank_ok"),
            (F.expr("kll_sketch_get_n_bigint(kll)") == F.col("n"))
            .cast("int")
            .alias("n_ok"),
        )

    sk = kll_sketch_table(li, "yr", "x", k=200)
    per_shard = arm(li, sk, ["yr"])
    merged = kll_merge_shards(sk)
    glob = arm(li.select("x"), merged, []).select(
        F.lit(None).cast("int").alias("yr"), "*"
    )
    return per_shard.unionAll(glob.select(per_shard.columns))


@register(
    "q_winsorize",
    "agg",
    oracle="""
    WITH d AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS x FROM events
    ), c AS (
      SELECT event_type, x, CAST(COUNT(*) AS BIGINT) AS cnt FROM d GROUP BY 1, 2
    ), cum AS (
      SELECT event_type, x, cnt,
             SUM(cnt) OVER (PARTITION BY event_type ORDER BY x) AS cum
      FROM c
    ), n AS (
      SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n FROM c GROUP BY 1
    ), q AS (
      SELECT cum.event_type,
             MIN(CASE WHEN cum * 20 >= 1 * n.n THEN x END) AS q_lo,
             MIN(CASE WHEN cum * 20 >= 19 * n.n THEN x END) AS q_hi
      FROM cum JOIN n USING (event_type) GROUP BY 1
    )
    SELECT d.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           MAX(q.q_lo) AS q_lo, MAX(q.q_hi) AS q_hi,
           CAST(SUM(CASE WHEN d.x < q.q_lo THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clamped_lo,
           CAST(SUM(CASE WHEN d.x > q.q_hi THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clamped_hi,
           CAST(SUM(GREATEST(q.q_lo, LEAST(q.q_hi, d.x))) AS BIGINT) AS sum_w
    FROM d JOIN q USING (event_type)
    GROUP BY d.event_type
    """,
    notes="extension: per-group WINSORIZATION at the exact 5th/95th "
    "ceil-rank percentiles (operators/aggregates.grouped_winsorize) — "
    "heavy-tail containment before any mean/regression (a power-law "
    "column's mean is otherwise owned by its top rows). Exact end to "
    "end: per-(group, value) counts (state = distinct cents values, not "
    "rows) → one window cumsum → integer threshold quantiles (cum·den ≥ "
    "num·n — no percentile dialect) → kilobyte quantile table broadcast "
    "back over the fact; clamp and clamped-sum are pure int64. The "
    "KLL sketch (q_sketch_quantile) replaces the exact cum table when "
    "the value domain outgrows it at 100 TB",
)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.aggregates import grouped_winsorize

    ev = table(spark, sf_dir, "events")
    w = grouped_winsorize(
        ev.select("event_type", F.round(F.col("value") * 100).cast("long").alias("x")),
        "event_type",
        F.col("x"),
        lo=(1, 20),
        hi=(19, 20),
    )
    return w.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.max("q_lo").alias("q_lo"),
        F.max("q_hi").alias("q_hi"),
        F.sum((F.col("x") < F.col("q_lo")).cast("long")).alias("n_clamped_lo"),
        F.sum((F.col("x") > F.col("q_hi")).cast("long")).alias("n_clamped_hi"),
        F.sum("x_w").cast("long").alias("sum_w"),
    )


@register(
    "q_join_asof_fwd",
    "join",
    oracle="""
    SELECT e.event_id AS err_id,
           (SELECT MIN(c.ts) FROM events c
            WHERE c.user_id = e.user_id AND c.event_type = 'click' AND c.ts >= e.ts)
               AS next_click_ts
    FROM events e WHERE e.event_type = 'error'
    """,
    notes="extension: FORWARD as-of join (operators/joins.asof_join_forward) "
    "— earliest click at-or-after each error, per user: the 'what "
    "happened next' mirror of q_join_asof's backward form (next fill "
    "after an order, next deploy after an alert). Same single-shuffle "
    "tagged-union + per-key window shape, mirrored to "
    "first(ignorenulls) over [current, following] with left rows "
    "sorting before right at equal timestamps (inclusive match); the "
    "oracle's correlated MIN is the semantic definition",
)
def q_join_asof_fwd(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    errors = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        F.col("user_id").alias("err_user"),
        F.col("ts").alias("err_ts"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("click_user"), F.col("ts").alias("click_ts")
    )
    joined = join_ops.asof_join_forward(
        errors, clicks, "err_user", "click_user", "err_ts", "click_ts", pick=["click_ts"]
    )
    return joined.select("err_id", F.col("click_ts").alias("next_click_ts"))


@register(
    "q_agg_decimal",
    "agg",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS DECIMAL(38,2)))
                AS VARCHAR) AS sum_price,
           CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS DECIMAL(38,2))
                    * CAST(l_quantity AS BIGINT)) AS VARCHAR) AS sum_weighted
    FROM lineitem GROUP BY l_returnflag
    """,
    notes="the DECIMAL WIDENING path the int64-cents discipline keeps "
    "citing, exercised for real: money summed as DECIMAL(38,2) — exact "
    "decimal arithmetic, order-free, immune to both float "
    "summation-order and the int64 envelope (cents hold ~9.2e16; a "
    "100 TB fact's global money sum can exceed it, DECIMAL(38) holds "
    "1e36). Values ship as canonical strings: a decimal's cross-engine "
    "binary representation is not hash-comparable, its digits are. "
    "Spark sums decimals with exact partial aggregation (no codegen "
    "loss — the aggregate stays whole-stage); per-row DECIMAL(12,2) "
    "cast of the double is exact (2-decimal values within 1e10)",
)
def q_agg_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(12,2)").cast("decimal(38,2)")
    return li.groupBy("l_returnflag").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(price).cast("decimal(38,2)").cast("string").alias("sum_price"),
        F.sum(price * F.col("l_quantity").cast("long"))
        .cast("decimal(38,2)")
        .cast("string")
        .alias("sum_weighted"),
    )


@register(
    "q_agg_mode",
    "agg",
    oracle="""
    WITH c AS (
      SELECT event_type, CAST(user_id % 100 AS BIGINT) AS v,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(arg_max(v, n * 1000 - v) AS BIGINT) AS mode_v,
           CAST(MAX(n) AS BIGINT) AS mode_n
    FROM c GROUP BY event_type
    """,
    notes="extension: exact per-group MODE with deterministic ties "
    "(highest count, then smallest value — ties are the whole point: "
    "Spark's own `mode()` is tie-nondeterministic and would never "
    "hash-compare). Two partial-aggregable shuffles: (group, value) "
    "counts, then one per-group arg_max over the SCALAR composite key "
    "n*1000 - v (exact while v < 1000 — the domain here is mod 100; "
    "wider domains use a struct max_by on Spark and a scaled key sized "
    "to the domain). State scales with distinct values per group, not "
    "rows. The profiling companion of q_stats_mad's median and "
    "q_value_histogram's bins",
)
def q_agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    c = ev.groupBy(
        "event_type", (F.col("user_id") % 100).cast("long").alias("v")
    ).agg(F.count("*").cast("long").alias("n"))
    return c.groupBy("event_type").agg(
        F.max_by("v", F.col("n") * 1000 - F.col("v")).cast("long").alias("mode_v"),
        F.max("n").cast("long").alias("mode_n"),
    )


@register(
    "q_stats_linreg",
    "agg",
    oracle="""
    WITH m AS (
      SELECT l_linestatus,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sum_x,
             CAST(SUM(y) AS BIGINT) AS sum_y,
             CAST(SUM(x * y) AS BIGINT) AS sum_xy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM (
        SELECT l_linestatus,
               CAST(l_quantity AS BIGINT) AS x,
               CAST(FLOOR(l_extendedprice) AS BIGINT) AS y
        FROM lineitem
      )
      GROUP BY l_linestatus
    ),
    s AS (
      SELECT *,
             CAST(n AS HUGEINT) * sum_xy - CAST(sum_x AS HUGEINT) * sum_y AS sxy_star,
             CAST(n AS HUGEINT) * sxx - CAST(sum_x AS HUGEINT) * sum_x AS sxx_star,
             CAST(n AS HUGEINT) * syy - CAST(sum_y AS HUGEINT) * sum_y AS syy_star
      FROM m
    )
    SELECT l_linestatus, n, sum_x, sum_y, sum_xy,
           CAST(sxy_star AS DOUBLE) / NULLIF(CAST(sxx_star AS DOUBLE), 0.0) AS slope,
           (CAST(sum_y AS DOUBLE)
              - (CAST(sxy_star AS DOUBLE) / NULLIF(CAST(sxx_star AS DOUBLE), 0.0))
                * CAST(sum_x AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept,
           (CAST(sxy_star AS DOUBLE) * CAST(sxy_star AS DOUBLE))
             / NULLIF(CAST(sxx_star AS DOUBLE) * CAST(syy_star AS DOUBLE), 0.0) AS r2
    FROM s
    """,
    notes="extension: per-group OLS regression (slope/intercept/R² of "
    "whole-dollar price on quantity) from EXACT integer moments "
    "(operators/aggregates.grouped_linreg_exact) — the deterministic "
    "alternative to regr_slope/regr_intercept/regr_r2's order-dependent "
    "float accumulation. One partial-aggregable shuffle for five int64 "
    "moments; the cross-moment products are widened through Spark "
    "DECIMAL(38,0) / DuckDB HUGEINT (the q_agg_decimal discipline "
    "mid-plan — n·Σy² here reaches ~1e21, past int64) and cast ONCE to "
    "double for a fixed IEEE finish. Trend estimation over drift metrics "
    "is this exact shape at 100 TB: state is 6 numbers per group",
)
def q_stats_linreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import aggregates

    li = table(spark, sf_dir, "lineitem")
    return aggregates.grouped_linreg_exact(
        li, "l_linestatus", F.col("l_quantity"), F.floor(F.col("l_extendedprice"))
    )


@register(
    "q_ab_ttest",
    "agg",
    oracle="""
    WITH g AS (
      SELECT
        CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        CAST(SUM(CASE WHEN event_type = 'purchase' THEN x ELSE 0 END) AS BIGINT) AS sum_a,
        CAST(SUM(CASE WHEN event_type = 'click' THEN x ELSE 0 END) AS BIGINT) AS sum_b,
        CAST(SUM(CASE WHEN event_type = 'purchase' THEN x * x ELSE 0 END) AS BIGINT) AS ssa,
        CAST(SUM(CASE WHEN event_type = 'click' THEN x * x ELSE 0 END) AS BIGINT) AS ssb
      FROM (SELECT event_type, CAST(FLOOR(value * 100) AS BIGINT) AS x FROM events)
      WHERE event_type IN ('purchase', 'click')
    ),
    v AS (
      SELECT *,
        CAST(n_a * ssa - sum_a * sum_a AS DOUBLE)
          / NULLIF(CAST(n_a * (n_a - 1) AS DOUBLE), 0.0) AS va,
        CAST(n_b * ssb - sum_b * sum_b AS DOUBLE)
          / NULLIF(CAST(n_b * (n_b - 1) AS DOUBLE), 0.0) AS vb
      FROM g
    ),
    s AS (SELECT *, va / CAST(n_a AS DOUBLE) + vb / CAST(n_b AS DOUBLE) AS se2 FROM v)
    SELECT n_a, n_b, sum_a, sum_b,
           (CAST(sum_a AS DOUBLE) / CAST(n_a AS DOUBLE)
              - CAST(sum_b AS DOUBLE) / CAST(n_b AS DOUBLE))
             / NULLIF(SQRT(se2), 0.0) AS t_stat,
           (se2 * se2) / NULLIF(
             (va / CAST(n_a AS DOUBLE)) * (va / CAST(n_a AS DOUBLE))
               / NULLIF(CAST(n_a AS DOUBLE) - 1.0, 0.0)
             + (vb / CAST(n_b AS DOUBLE)) * (vb / CAST(n_b AS DOUBLE))
               / NULLIF(CAST(n_b AS DOUBLE) - 1.0, 0.0), 0.0) AS welch_df
    FROM s
    """,
    notes="extension: Welch's unequal-variance two-sample t statistic + "
    "Welch-Satterthwaite df (operators/aggregates.welch_ttest_exact) — "
    "the MEANS companion of q_ab_ztest's proportion test: does mean "
    "purchase value differ from mean click value? ONE conditional-"
    "aggregation pass over the fact (no join, no per-cohort scans): "
    "per-cohort n/Σx/Σx² as exact int64 sums on the cents lattice "
    "(FLOOR(value·100) of the identical IEEE product), then a fixed IEEE "
    "tree for t and df, shipped raw. The n·Σx² product stays in int64 "
    "out to ~2e5 rows/cohort at this lattice; wider cohorts widen "
    "through DECIMAL(38,0)/HUGEINT exactly as q_stats_linreg does",
)
def q_ab_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import aggregates

    ev = table(spark, sf_dir, "events")
    return aggregates.welch_ttest_exact(
        ev, "event_type", "purchase", "click", F.floor(F.col("value") * 100)
    )


@register(
    "q_gapfill_interp",
    "window",
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(MAX(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    ),
    spans AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1),
    cal AS (
      SELECT user_id, CAST(g AS DATE) AS day
      FROM spans, LATERAL UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) t(g)
    ),
    dense AS (
      SELECT cal.user_id, cal.day, daily.v
      FROM cal LEFT JOIN daily ON cal.user_id = daily.user_id AND cal.day = daily.day
    ),
    nb AS (
      SELECT user_id, day, v,
        last_value(v IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY day
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY day
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
        first_value(v IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY day
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY day
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
      FROM dense
    )
    SELECT user_id, CAST(day AS TIMESTAMP) AS day,
           CASE WHEN v IS NOT NULL THEN CAST(v AS DOUBLE)
                ELSE CAST(pv AS DOUBLE)
                     + CAST(date_diff('day', pd, day) * (nv - pv) AS DOUBLE)
                       / CAST(date_diff('day', pd, nd) AS DOUBLE)
           END AS cents_interp,
           CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END AS observed
    FROM nb
    """,
    notes="extension: calendar gap-fill + LINEAR INTERPOLATION "
    "(operators/timeseries.gapfill_interpolate) — the straight-line twin "
    "of q_gapfill_locf for flow-like series: manufactured days trend "
    "between their observed neighbors instead of carrying flat. Values "
    "snap to the cents lattice first, so the interpolation is one fixed "
    "IEEE tree over exact int64 terms (neighbor cents × integer day "
    "offsets) — bit-identical across engines; observed rows bypass the "
    "tree and ship exact. Span endpoints are observations, so every gap "
    "is interior: no extrapolation branch exists. Same scale shape as "
    "LOCF — explode bounded by span-days, neighbors from two ignorenulls "
    "passes over ONE per-key window shuffle",
)
def q_gapfill_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import timeseries

    ev = table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    return timeseries.gapfill_interpolate(
        ev, "user_id", "ts", F.max(F.round(F.col("value") * 100)).cast("long"), "cents_interp"
    )


@register(
    "q_seq_paths",
    "window",
    oracle="""
    WITH steps AS (
      SELECT event_type AS s0,
             lead(event_type, 1) OVER w AS s1,
             lead(event_type, 2) OVER w AS s2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT s0 || '>' || s1 || '>' || s2 AS path,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM steps WHERE s2 IS NOT NULL
    GROUP BY 1
    ORDER BY n DESC, path
    LIMIT 20
    """,
    notes="extension: top-20 most frequent 3-step consecutive event-type "
    "paths (operators/timeseries.top_event_paths) — sequence mining's "
    "workhorse, the depth-3 generalization of q_event_transitions' "
    "Markov bigrams. ONE per-user window shuffle with a deterministic "
    "(ts, event_id) total order; both LEAD columns evaluate in the same "
    "Window node with O(depth) lookahead state; path cardinality is "
    "≤ |types|³ so the count shuffle map-combines to near nothing and "
    "the top-k sorts aggregated rows only. (n DESC, path) total order "
    "makes the LIMIT deterministic",
)
def q_seq_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import timeseries

    ev = table(spark, sf_dir, "events")
    return timeseries.top_event_paths(ev, "user_id", "ts", "event_type", "event_id", depth=3, k=20)


@register(
    "q_stats_wmedian",
    "agg",
    oracle="""
    WITH c AS (
      SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x,
             CAST(SUM(CAST(FLOOR(l_extendedprice) AS BIGINT)) AS BIGINT) AS wsum
      FROM lineitem GROUP BY 1, 2
    ),
    cum AS (
      SELECT l_returnflag, x, wsum,
             SUM(wsum) OVER (PARTITION BY l_returnflag ORDER BY x) AS cw
      FROM c
    ),
    tot AS (SELECT l_returnflag, CAST(SUM(wsum) AS BIGINT) AS total_w FROM c GROUP BY 1)
    SELECT cum.l_returnflag, total_w,
           CAST(MIN(CASE WHEN cw * 2 >= total_w THEN x END) AS BIGINT) AS wmedian
    FROM cum JOIN tot ON cum.l_returnflag = tot.l_returnflag
    GROUP BY cum.l_returnflag, total_w
    """,
    notes="extension: exact REVENUE-WEIGHTED median order quantity per "
    "returnflag (operators/aggregates.grouped_weighted_median) — the "
    "importance-aware centre q_sample_dupweight's duplicate counts feed "
    "in a corpus pipeline (a doc carrying weight 10⁶ moves the typical-"
    "length statistic like the million rows it stands for; the unweighted "
    "median treats it as one). The 2·cum ≥ total decision is integer "
    "cross-multiplied — no float ratio decides. Collapses to per-(group, "
    "value) weight sums FIRST (partial-aggregable; window input is the "
    "distinct-value lattice, never the fact), one window cumsum, one "
    "broadcast totals join",
)
def q_stats_wmedian(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import aggregates

    li = table(spark, sf_dir, "lineitem")
    return aggregates.grouped_weighted_median(
        li, "l_returnflag", F.col("l_quantity"), F.floor(F.col("l_extendedprice"))
    )


@register(
    "q_privacy_kanon",
    "agg",
    oracle="""
    WITH c AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(FLOOR(value / 50) AS BIGINT) AS band,
             CAST(COUNT(*) AS BIGINT) AS class_size
      FROM events GROUP BY 1, 2, 3
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(SUM(CASE WHEN class_size < 5 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_risky_classes,
           CAST(SUM(CASE WHEN class_size < 5 THEN class_size ELSE 0 END) AS BIGINT)
             AS rows_at_risk,
           CAST(MIN(class_size) AS BIGINT) AS min_class_size,
           CAST(CASE WHEN MIN(class_size) >= 5 THEN 1 ELSE 0 END AS INTEGER)
             AS k_anonymous
    FROM c
    """,
    notes="extension: k-anonymity release gate (Sweeney 2002; operators/"
    "validation.k_anonymity_audit) over the quasi-identifier combination "
    "(event_type, day, value band of 50) — rows whose QID class has "
    "fewer than k=5 members are re-identification risks; the structural-"
    "privacy companion of q_text_redact's pattern-level PII scan. One "
    "partial-aggregable class groupBy (state = distinct QID combos) "
    "folded to ONE exact-int summary row — the audit never ships the "
    "sensitive classes themselves, and no float appears anywhere. "
    "FLOOR(value/50) is the identical IEEE division on both engines",
)
def q_privacy_kanon(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import validation

    ev = table(spark, sf_dir, "events").select(
        "event_type",
        F.to_date("ts").alias("d"),
        F.floor(F.col("value") / 50).cast("long").alias("band"),
    )
    return validation.k_anonymity_audit(ev, ["event_type", "d", "band"], k=5)


@register(
    "q_stats_linreg2",
    "agg",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(x1) AS HUGEINT) AS s1,
             CAST(SUM(x2) AS HUGEINT) AS s2,
             CAST(SUM(y) AS HUGEINT) AS sy,
             CAST(SUM(x1 * x1) AS HUGEINT) AS s11,
             CAST(SUM(x1 * x2) AS HUGEINT) AS s12,
             CAST(SUM(x2 * x2) AS HUGEINT) AS s22,
             CAST(SUM(x1 * y) AS HUGEINT) AS s1y,
             CAST(SUM(x2 * y) AS HUGEINT) AS s2y
      FROM (
        SELECT l_returnflag,
               CAST(l_quantity AS BIGINT) AS x1,
               CAST(ROUND(l_discount * 100, 0) AS BIGINT) AS x2,
               CAST(FLOOR(l_extendedprice) AS BIGINT) AS y
        FROM lineitem
      )
      GROUP BY l_returnflag
    ),
    d AS (
      SELECT l_returnflag, n,
             n  * (s11 * s22 - s12 * s12) - s1 * (s1  * s22 - s12 * s2)
                + s2 * (s1  * s12 - s11 * s2)  AS det_m,
             sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)
                + s2 * (s1y * s12 - s11 * s2y) AS det_b0,
             n  * (s1y * s22 - s12 * s2y) - sy * (s1  * s22 - s12 * s2)
                + s2 * (s1  * s2y - s1y * s2)  AS det_b1,
             n  * (s11 * s2y - s1y * s12) - s1 * (s1  * s2y - s1y * s2)
                + sy * (s1  * s12 - s11 * s2)  AS det_b2
      FROM m
    )
    SELECT l_returnflag, CAST(n AS BIGINT) AS n,
           CAST(det_m AS VARCHAR) AS det_m_str,
           CAST(det_b0 AS DOUBLE) / NULLIF(CAST(det_m AS DOUBLE), 0.0) AS b0,
           CAST(det_b1 AS DOUBLE) / NULLIF(CAST(det_m AS DOUBLE), 0.0) AS b1,
           CAST(det_b2 AS DOUBLE) / NULLIF(CAST(det_m AS DOUBLE), 0.0) AS b2
    FROM d
    """,
    notes="extension: TWO-FEATURE least squares (price ~ quantity + "
    "discount) via Cramer's rule over exact integer determinants "
    "(operators/aggregates.grouped_linreg2_exact) — multiple regression "
    "with ZERO float accumulation: nine exact int64 moments from one "
    "partial-aggregable shuffle, 3×3 determinants evaluated in "
    "DECIMAL(38,0)/HUGEINT (terms peak ~1e27 here; bound n³·X⁴ < 1e38 "
    "documented), coefficients as single IEEE divisions. det M ships as "
    "a canonical digit string so the oracle certifies the exact integer "
    "algebra itself, not just rounded quotients. The iterative "
    "QR/gradient alternatives are float-order-dependent and could never "
    "hash-compare",
)
def q_stats_linreg2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import aggregates

    li = table(spark, sf_dir, "lineitem")
    return aggregates.grouped_linreg2_exact(
        li,
        "l_returnflag",
        F.col("l_quantity"),
        F.round(F.col("l_discount") * 100, 0),
        F.floor(F.col("l_extendedprice")),
    )


@register(
    "q_stats_spearman",
    "agg",
    oracle="""
    WITH base AS (
      SELECT l_returnflag,
             CAST(l_quantity AS BIGINT) AS x,
             CAST(FLOOR(l_extendedprice) AS BIGINT) AS y
      FROM lineitem
    ),
    ranked AS (
      SELECT l_returnflag,
             rank() OVER (PARTITION BY l_returnflag ORDER BY x) * 2
               + COUNT(*) OVER (PARTITION BY l_returnflag, x) - 1 AS rx,
             rank() OVER (PARTITION BY l_returnflag ORDER BY y) * 2
               + COUNT(*) OVER (PARTITION BY l_returnflag, y) - 1 AS ry
      FROM base
    ),
    m AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(rx) AS BIGINT) AS sum_rx,
             CAST(SUM(ry) AS BIGINT) AS sum_ry,
             CAST(SUM(rx * ry) AS BIGINT) AS sum_rxy,
             CAST(SUM(rx * rx) AS BIGINT) AS sxx,
             CAST(SUM(ry * ry) AS BIGINT) AS syy
      FROM ranked GROUP BY l_returnflag
    )
    SELECT l_returnflag, n, sum_rx, sum_ry, sum_rxy,
           CAST(CAST(n AS HUGEINT) * sum_rxy
                  - CAST(sum_rx AS HUGEINT) * sum_ry AS DOUBLE)
             / NULLIF(
                 SQRT(CAST(CAST(n AS HUGEINT) * sxx
                             - CAST(sum_rx AS HUGEINT) * sum_rx AS DOUBLE))
                 * SQRT(CAST(CAST(n AS HUGEINT) * syy
                               - CAST(sum_ry AS HUGEINT) * sum_ry AS DOUBLE)),
                 0.0) AS spearman
    FROM m
    """,
    notes="extension: exact SPEARMAN rank correlation (price vs quantity "
    "per returnflag; operators/aggregates.grouped_spearman_exact) — the "
    "robust, monotone-invariant companion of q_stats_corr, exact via the "
    "doubled-mid-rank trick: 2·avgrank = 2·rank() + tie_count − 1 is an "
    "INTEGER even under ties (the /2 cancels in the correlation), so "
    "Spearman is Pearson on an int64 rank lattice. Doubled ranks reach "
    "2n, so the cross-moment products are widened through DECIMAL(38,0)/"
    "HUGEINT (mandatory here — n·Σr² ~ 4n⁴ passes int64 at ~40k rows/"
    "group). Four rank-window sorts over one group partitioning + one "
    "moment shuffle",
)
def q_stats_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import aggregates

    li = table(spark, sf_dir, "lineitem")
    return aggregates.grouped_spearman_exact(
        li, "l_returnflag", F.col("l_quantity"), F.floor(F.col("l_extendedprice"))
    )


@register(
    "q_window_ratio",
    "window",
    oracle="""
    WITH d AS (
      SELECT o_orderpriority,
             CAST(o_orderkey AS BIGINT) AS o_orderkey,
             CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
      FROM orders WHERE o_orderkey % 199 = 0
    )
    SELECT o_orderpriority, o_orderkey, cents,
           CAST(SUM(cents) OVER (PARTITION BY o_orderpriority) AS BIGINT)
             AS group_cents,
           CAST(cents AS DOUBLE)
             / CAST(SUM(cents) OVER (PARTITION BY o_orderpriority) AS DOUBLE)
             AS share
    FROM d
    """,
    notes="§2.8 extension: RATIO-TO-REPORT — each row's share of its "
    "partition's total, the unordered whole-partition window aggregate "
    "(every ranking/running query here is ORDERED; this is the other "
    "window frame shape). Cents lattice keeps the partition sum exact "
    "int64; share is one IEEE division of exact ints, shipped raw. The "
    "windowed total costs ONE per-key shuffle and no sort (no ORDER BY "
    "=> no in-partition ordering pass); the groupBy+join alternative "
    "costs the same exchange plus a join — the window form is strictly "
    "better. Sampled (every 199th order) to keep the contract row set "
    "bounded",
)
def q_window_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 199 == 0)
    d = o.select(
        "o_orderpriority",
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    w = Window.partitionBy("o_orderpriority")
    total = F.sum("cents").over(w)
    return d.select(
        "o_orderpriority",
        "o_orderkey",
        "cents",
        total.cast("long").alias("group_cents"),
        (F.col("cents").cast("double") / total.cast("double")).alias("share"),
    )


@register(
    "q_ab_utest",
    "agg",
    oracle="""
    WITH d AS (
      SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS a,
             CAST(FLOOR(value * 100) AS BIGINT) AS x
      FROM events WHERE event_type IN ('purchase', 'click')
    ),
    c AS (
      SELECT x, CAST(SUM(a) AS BIGINT) AS ca, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM d GROUP BY x
    ),
    r AS (
      SELECT ca, cnt,
             2 * COALESCE(SUM(cnt) OVER (
                   ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) + cnt + 1 AS r2
      FROM c
    ),
    g AS (
      SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
             CAST(SUM(cnt - ca) AS BIGINT) AS n_b,
             CAST(SUM(ca * r2) AS BIGINT) AS ra2,
             CAST(SUM(cnt * cnt * cnt - cnt) AS BIGINT) AS tie_cubes
      FROM r
    )
    SELECT n_a, n_b,
           CAST(ra2 - n_a * (n_a + 1) AS BIGINT) AS u2_a,
           tie_cubes,
           CAST(ra2 - n_a * (n_a + 1) - n_a * n_b AS DOUBLE)
             / NULLIF(
                 SQRT(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
                      * CAST((n_a + n_b + 1) * (n_a + n_b) * (n_a + n_b - 1)
                             - tie_cubes AS DOUBLE)
                      / CAST(3 * (n_a + n_b) * (n_a + n_b - 1) AS DOUBLE)),
                 0.0) AS z_stat
    FROM g
    """,
    notes="extension: Mann-Whitney U / Wilcoxon rank-sum (purchase vs "
    "click value; operators/aggregates.mannwhitney_utest_exact) — the "
    "NONPARAMETRIC companion of q_ab_ttest, the A/B test for skewed "
    "metrics. Distributed WITHOUT a global row sort: mid-ranks come "
    "from the VALUE-COUNT lattice (doubled mid-ranks are integers: "
    "2r = 2·cum_before + cnt + 1), so rank sum, U, and the tie term "
    "Σ(t³−t) are exact int64 and z is one fixed IEEE tree. The window "
    "runs over the distinct-value table, never the fact; X ~ n³ holds "
    "int64 to ~2e6 pooled rows, then widens per the linreg discipline",
)
def q_ab_utest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import aggregates

    ev = table(spark, sf_dir, "events")
    return aggregates.mannwhitney_utest_exact(
        ev, "event_type", "purchase", "click", F.floor(F.col("value") * 100)
    )


@register(
    "q_audit_benford",
    "agg",
    oracle="""
    WITH d AS (
      SELECT CAST(substring(CAST(CAST(abs(round(o_totalprice * 100, 0)) AS BIGINT)
                                 AS VARCHAR), 1, 1) AS INTEGER) AS digit
      FROM orders
      WHERE CAST(abs(round(o_totalprice * 100, 0)) AS BIGINT) > 0
    ),
    c AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_d FROM d GROUP BY digit),
    t AS (SELECT CAST(SUM(n_d) AS BIGINT) AS n FROM c),
    w AS (SELECT [301029995, 176091259, 124938736, 96910013, 79181246,
                  66946789, 57991946, 51152522, 45757490] AS s)
    SELECT digit, n_d, n,
           CAST(s[digit] AS BIGINT) AS expected_e9,
           CAST(n_d AS DOUBLE) * 1000000000.0 / CAST(n AS DOUBLE)
             - CAST(s[digit] AS DOUBLE) AS dev_e9
    FROM c, t, w
    """,
    notes="extension: Benford first-digit audit of order amounts "
    "(operators/validation.benford_audit) — the classic fabricated-"
    "numbers detector as a data-quality gate. First digit from the "
    "integer's DECIMAL STRING (exact on every engine; the arithmetic "
    "log10 route can misbucket one-ulp-under-a-power values differently "
    "per libm); expected shares are precomputed floor(1e9·log10(1+1/d)) "
    "literals (the NDCG grid discipline); per-digit deviation is one "
    "fixed IEEE tree per row with NO cross-row float sum. Digit groupBy "
    "carries 9 rows of state at any fact size",
)
def q_audit_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import validation

    o = table(spark, sf_dir, "orders")
    return validation.benford_audit(o, F.round(F.col("o_totalprice") * 100, 0))


@register(
    "q_ab_cuped",
    "agg",
    oracle="""
    WITH unit AS (
      SELECT user_id, CAST(user_id % 2 AS VARCHAR) AS cohort,
             CAST(COALESCE(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
                       THEN CAST(FLOOR(value * 100) AS BIGINT) END), 0) AS BIGINT)
               AS x,
             CAST(COALESCE(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
                       THEN CAST(FLOOR(value * 100) AS BIGINT) END), 0) AS BIGINT)
               AS y
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id
    ),
    g AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN cohort = '0' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(SUM(CASE WHEN cohort = '1' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             CAST(SUM(x) AS BIGINT) AS sum_x,
             CAST(SUM(y) AS BIGINT) AS sum_y,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(CASE WHEN cohort = '0' THEN x ELSE 0 END) AS BIGINT) AS sxa,
             CAST(SUM(CASE WHEN cohort = '1' THEN x ELSE 0 END) AS BIGINT) AS sxb,
             CAST(SUM(CASE WHEN cohort = '0' THEN y ELSE 0 END) AS BIGINT) AS sya,
             CAST(SUM(CASE WHEN cohort = '1' THEN y ELSE 0 END) AS BIGINT) AS syb
      FROM unit
    ),
    t AS (
      SELECT *,
             CAST(n * sxy - sum_x * sum_y AS DOUBLE)
               / NULLIF(CAST(n * sxx - sum_x * sum_x AS DOUBLE), 0.0) AS theta,
             CAST(sum_x AS DOUBLE) / CAST(n AS DOUBLE) AS mean_x
      FROM g
    ),
    m AS (
      SELECT *,
             CAST(sya AS DOUBLE) / NULLIF(CAST(n_a AS DOUBLE), 0.0)
               - theta * (CAST(sxa AS DOUBLE) / NULLIF(CAST(n_a AS DOUBLE), 0.0)
                          - mean_x) AS adj_mean_a,
             CAST(syb AS DOUBLE) / NULLIF(CAST(n_b AS DOUBLE), 0.0)
               - theta * (CAST(sxb AS DOUBLE) / NULLIF(CAST(n_b AS DOUBLE), 0.0)
                          - mean_x) AS adj_mean_b
      FROM t
    )
    SELECT n, n_a, n_b, sum_x, sum_y, theta, adj_mean_a, adj_mean_b,
           adj_mean_a - adj_mean_b AS adj_diff
    FROM m
    """,
    notes="extension: CUPED variance reduction (Deng-Xu-Kohavi-Walker "
    "2013; operators/aggregates.cuped_adjust_exact) — the "
    "experimentation-platform technique completing the A/B family: "
    "per-user pre-period purchase cents (first half-month) as the "
    "covariate, experiment-period cents as the metric, cohort = "
    "user_id parity; θ = cov/var from POOLED exact int64 moments, "
    "adjusted cohort means as one fixed IEEE tree. One per-unit "
    "aggregation + ONE conditional-aggregation pass (no joins); zero "
    "covariate variance ⇒ NULL adjusted means via NULLIF, never a "
    "silent fallback to raw means",
)
def q_ab_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import aggregates

    ev = table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    cents = F.floor(F.col("value") * 100).cast("long")
    split = F.lit("2024-01-16 00:00:00").cast("timestamp")
    unit = ev.groupBy("user_id").agg(
        F.coalesce(F.sum(F.when(F.col("ts") < split, cents)), F.lit(0))
        .cast("long")
        .alias("x"),
        F.coalesce(F.sum(F.when(F.col("ts") >= split, cents)), F.lit(0))
        .cast("long")
        .alias("y"),
    ).select((F.col("user_id") % 2).cast("string").alias("cohort"), "x", "y")
    return aggregates.cuped_adjust_exact(unit, "cohort", "0", "1", F.col("x"), F.col("y"))


@register(
    "q_skew_report",
    "agg",
    oracle="""
    WITH per_key AS (
      SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS rows_
      FROM orders GROUP BY o_custkey
    ),
    b AS (
      SELECT rows_, CAST(FLOOR(LOG2(rows_)) AS INTEGER) AS bucket
      FROM per_key
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(rows_) AS BIGINT) AS rows,
           CAST(MAX(rows_) AS BIGINT) AS max_rows
    FROM b GROUP BY bucket
    """,
    notes="extension: key-skew telemetry (operators/aggregates."
    "key_skew_report) — the count-of-counts histogram that DECIDES the "
    "skew strategy (salt count for q_agg_salted/q_join_salted, AQE "
    "thresholds) instead of guessing: how many o_custkey values carry "
    "how many order rows, in log₂ buckets. Two tiny partial-aggregable "
    "shuffles (key cardinality, then ≤63 bucket rows). The Spark bucket "
    "is an EXACT power-of-two comparison chain — float log2 could "
    "misbucket at 2^53-scale counts; the oracle's FLOOR(LOG2) is safe "
    "only because oracle-side counts are small, and the compare ignores "
    "that asymmetry since both land identical buckets at sf scale",
)
def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import aggregates

    o = table(spark, sf_dir, "orders")
    return aggregates.key_skew_report(o, "o_custkey")


@register(
    "q_forecast_backtest",
    "agg",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ),
    scored AS (
      SELECT a.event_type, a.cents AS y, s.cents AS ys, p.cents AS yp
      FROM daily a
      JOIN daily s ON a.event_type = s.event_type
                  AND a.day = s.day + INTERVAL 7 DAY
      JOIN daily p ON a.event_type = p.event_type
                  AND a.day = p.day + INTERVAL 1 DAY
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(ABS(y - ys)) AS BIGINT) AS sae_seasonal,
           CAST(SUM(ABS(y - yp)) AS BIGINT) AS sae_naive1,
           CAST(SUM(ABS(y - ys)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             AS mae_seasonal,
           CAST(SUM(ABS(y - yp)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             AS mae_naive1
    FROM scored GROUP BY event_type
    """,
    notes="extension: forecasting-baseline backtest (operators/"
    "timeseries.backtest_naive_forecasts) — seasonal-naive (y(d−7)) vs "
    "naive-1 (y(d−1)) MAE on daily event cents, the two baselines any "
    "real forecast must beat and the canonical weekly-seasonality "
    "detector. Both baselines score the IDENTICAL day set (inner "
    "three-way join), absolute errors exact int64 on the cents lattice, "
    "MAEs single IEEE divisions. The daily frame is key×days sized; "
    "the self-joins are broadcast equi-joins at any calendar size",
)
def q_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import timeseries

    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100, 0).cast("long")).cast("long").alias("cents"))
    return timeseries.backtest_naive_forecasts(daily, "event_type", "day", "cents", season=7)


@register(
    "q_graph_linkpred",
    "agg",
    oracle="""
    WITH de AS (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
             CAST(COUNT(*) AS BIGINT) AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE c.c_nationkey <> s.s_nationkey
      GROUP BY 1, 2
    ),
    top3 AS (
      SELECT src, dst FROM (
        SELECT src, dst,
               ROW_NUMBER() OVER (PARTITION BY src ORDER BY w DESC, dst) AS rk
        FROM de
      ) WHERE rk <= 3
    ),
    und AS (
      SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v FROM top3
    ),
    nbrs AS (
      SELECT u AS m, v AS n FROM und UNION ALL SELECT v AS m, u AS n FROM und
    ),
    wedges AS (
      SELECT l.n AS a, r.n AS b, CAST(COUNT(*) AS BIGINT) AS common
      FROM nbrs l JOIN nbrs r ON l.m = r.m
      WHERE l.n < r.n
      GROUP BY 1, 2
    ),
    non_adj AS (
      SELECT w.* FROM wedges w
      WHERE NOT EXISTS (SELECT 1 FROM und e WHERE e.u = w.a AND e.v = w.b)
    ),
    deg AS (SELECT m AS node, CAST(COUNT(*) AS BIGINT) AS deg FROM nbrs GROUP BY 1)
    SELECT a, b, common,
           CAST(da.deg * db.deg AS BIGINT) AS pa_score
    FROM non_adj
    JOIN deg da ON da.node = a
    JOIN deg db ON db.node = b
    ORDER BY common DESC, pa_score DESC, a, b
    LIMIT 20
    """,
    notes="extension: link prediction by COMMON-NEIGHBOR count "
    "(Liben-Nowell/Kleinberg 2003; operators/graph."
    "common_neighbor_scores) over the TOP-PARTNER nation trade graph — "
    "each nation keeps its 3 biggest partners by exact lineitem count "
    "(operators/graph.top_weight_edges, the kNN-graph construction; "
    "the raw trade graph is COMPLETE at every SF, so r1-r12's unsparsified "
    "form returned zero non-adjacent pairs — vacuously green, never "
    "certifiable). Top non-adjacent nation pairs by shared top partners, "
    "preferential-attachment (deg·deg) exact-int tiebreak. One per-src "
    "window + one neighbor self-join on the midpoint (wedge volume "
    "bounded k²·|nodes| by construction), one anti-join, broadcast "
    "degree joins, (common, pa, a, b) total-ordered top-k. No floats "
    "anywhere (count weights — a float SUM's rank order is "
    "summation-order-dependent across engines)",
)
def q_graph_linkpred(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import graph

    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    de = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .where(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(F.count("*").cast("long").alias("w"))
    )
    # materialize the kNN graph once: common_neighbor_scores consumes it
    # four times (wedge sides via nbrs, the anti-join, the degree table)
    # and each copy otherwise replans the 4-table trade join + top-k
    # window (r14 before-plan: 72 scans). ≤ k·|nations| edges.
    und = cacheutil.materialize(graph.undirected_edges(graph.top_weight_edges(de, k=3)))
    return graph.common_neighbor_scores(und, k=20)


@register(
    "q_privacy_ldiv",
    "agg",
    oracle="""
    WITH c AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS class_size,
             CAST(COUNT(DISTINCT CAST(user_id % 20 AS BIGINT)) AS BIGINT)
               AS n_sensitive
      FROM events GROUP BY 1, 2
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(SUM(CASE WHEN n_sensitive < 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_low_diversity,
           CAST(SUM(CASE WHEN n_sensitive < 3 THEN class_size ELSE 0 END) AS BIGINT)
             AS rows_at_risk,
           CAST(MIN(n_sensitive) AS BIGINT) AS min_diversity,
           CAST(CASE WHEN MIN(n_sensitive) >= 3 THEN 1 ELSE 0 END AS INTEGER)
             AS l_diverse
    FROM c
    """,
    notes="extension: l-diversity audit (Machanavajjhala 2007; operators/"
    "validation.l_diversity_audit) — the attack k-anonymity misses: a "
    "large class whose members all share ONE sensitive value discloses "
    "it by membership alone; every (event_type, day) class must carry "
    "≥ 3 distinct sensitive buckets (user cohort stands in). One exact "
    "groupBy with count_distinct per class, folded to the same never-"
    "ship-the-classes summary row as q_privacy_kanon; a release gate "
    "runs BOTH — they bound different attacks",
)
def q_privacy_ldiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import validation

    ev = table(spark, sf_dir, "events").select(
        "event_type",
        F.to_date("ts").alias("d"),
        (F.col("user_id") % 20).cast("long").alias("sens"),
    )
    return validation.l_diversity_audit(ev, ["event_type", "d"], "sens", l=3)


@register(
    "q_eval_lift",
    "agg",
    oracle="""
    WITH unit AS (
      SELECT user_id,
             CAST(COALESCE(SUM(CASE WHEN event_type = 'click'
                       THEN CAST(FLOOR(value * 100) AS BIGINT) END), 0) AS BIGINT)
               AS score,
             CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS responded
      FROM events GROUP BY user_id
    ),
    ranked AS (
      SELECT score, responded,
             ntile(10) OVER (ORDER BY score DESC, user_id) AS decile
      FROM unit
    ),
    d AS (
      SELECT decile, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(responded) AS BIGINT) AS responders
      FROM ranked GROUP BY decile
    ),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS tot_n,
                 CAST(SUM(responders) AS BIGINT) AS tot_r FROM d),
    c AS (
      SELECT decile, n, responders,
             SUM(n) OVER (ORDER BY decile) AS cum_n,
             SUM(responders) OVER (ORDER BY decile) AS cum_r
      FROM d
    )
    SELECT decile, n, responders,
           CAST(responders AS DOUBLE) / CAST(n AS DOUBLE) AS response_rate,
           (CAST(cum_r AS DOUBLE) / CAST(cum_n AS DOUBLE))
             / NULLIF(CAST(tot_r AS DOUBLE) / CAST(tot_n AS DOUBLE), 0.0)
             AS cum_lift
    FROM c, t
    """,
    notes="extension: decile GAINS/LIFT table — the model-evaluation "
    "classic (rank units by score, split into ntile(10) deciles with a "
    "total-order tiebreak, per-decile response rate and cumulative lift "
    "vs the base rate). Click spend stands in as the score, purchase as "
    "the response. Counts exact int64; rate and lift are fixed IEEE "
    "trees over exact ints; ntile assignment is engine-identical under "
    "the (score DESC, user_id) total order (extras to the first "
    "deciles, standard SQL). One per-unit agg, then the SCALE-SAFE "
    "ntile: distributed_total_rank (range-bucketed prefix sums — no "
    "single-partition sort anywhere) + the pure ntile_from_rank "
    "expression, pinned row-identical to window ntile in "
    "tests/test_rank_scale.py — then two 10-row aggregates",
)
def q_eval_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.order import distributed_total_rank, ntile_from_rank

    ev = table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100).cast("long")
    unit = ev.groupBy("user_id").agg(
        F.coalesce(F.sum(F.when(F.col("event_type") == "click", cents)), F.lit(0))
        .cast("long")
        .alias("score"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("responded"),
    )
    ranked = distributed_total_rank(
        unit, F.col("score"), F.col("user_id"), descending=True
    ).select(
        "score",
        "responded",
        ntile_from_rank(F.col("rank"), F.col("n_total"), 10).alias("decile"),
    )
    # the 10-row decile table feeds BOTH the totals broadcast and the
    # cumulative window — persist it so the whole rank pipeline above
    # runs once, not once per consumer (r14 before-plan: the lattice
    # subtree appeared twice downstream of the rank join-back)
    from pyspark.storagelevel import StorageLevel

    d = (
        ranked.groupBy("decile")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("responded").cast("long").alias("responders"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    t = d.agg(
        F.sum("n").cast("long").alias("tot_n"), F.sum("responders").cast("long").alias("tot_r")
    )
    cw = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    c = d.select(
        "decile",
        "n",
        "responders",
        F.sum("n").over(cw).alias("cum_n"),
        F.sum("responders").over(cw).alias("cum_r"),
    )
    return c.crossJoin(F.broadcast(t)).select(
        "decile",
        "n",
        "responders",
        (F.col("responders").cast("double") / F.col("n").cast("double")).alias("response_rate"),
        (
            (F.col("cum_r").cast("double") / F.col("cum_n").cast("double"))
            / F.nullif(F.col("tot_r").cast("double") / F.col("tot_n").cast("double"), F.lit(0.0))
        ).alias("cum_lift"),
    )


@register(
    "q_seg_rfm",
    "agg",
    oracle="""
    WITH cust AS (
      SELECT o_custkey,
             CAST(date_diff('day', MAX(CAST(o_orderdate AS DATE)),
                            (SELECT MAX(CAST(o_orderdate AS DATE)) FROM orders))
                  AS BIGINT) AS recency_days,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
               AS monetary_cents
      FROM orders GROUP BY o_custkey
    ),
    scored AS (
      SELECT ntile(5) OVER (ORDER BY recency_days ASC, o_custkey) AS r,
             ntile(5) OVER (ORDER BY frequency DESC, o_custkey) AS f,
             ntile(5) OVER (ORDER BY monetary_cents DESC, o_custkey) AS m
      FROM cust
    )
    SELECT CAST(r AS INTEGER) AS r, CAST(f AS INTEGER) AS f,
           CAST(m AS INTEGER) AS m,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM scored GROUP BY r, f, m
    """,
    notes="extension: RFM customer segmentation — THE retail analytics "
    "the reference's POS warehouse exists to feed: per-customer recency "
    "(days since last order vs the corpus max date), frequency (orders), "
    "monetary (cents), each quintile-scored by ntile(5) under a total "
    "order (best = 1 on every axis: recent ASC, frequent DESC, big-"
    "spender DESC), aggregated to ≤125 segment cells. All integers; "
    "each quintile runs the SCALE-SAFE distributed_total_rank + "
    "ntile_from_rank path (range-bucketed prefix sums — no single-"
    "partition sort of the customer table; pinned row-identical to "
    "window ntile in tests/test_rank_scale.py). "
    "The scalar max-date subquery broadcasts",
)
def q_seg_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.order import distributed_total_rank, ntile_from_rank

    o = table(spark, sf_dir, "orders")
    mx = o.agg(F.max(F.to_date("o_orderdate")).alias("_mx"))
    cust = (
        o.groupBy("o_custkey")
        .agg(
            F.max(F.to_date("o_orderdate")).alias("_last"),
            F.count("*").cast("long").alias("frequency"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
            .cast("long")
            .alias("monetary_cents"),
        )
        .crossJoin(F.broadcast(mx))
        .select(
            "o_custkey",
            F.datediff(F.col("_mx"), F.col("_last")).cast("long").alias("recency_days"),
            "frequency",
            "monetary_cents",
        )
    )
    # checkpoint the per-customer frame ONCE (the rank pass scans its
    # input three times: bounds, lattice, tie-rank join), then MELT the
    # three dimensions into one long frame and rank them in a SINGLE
    # grouped pass — descending axes ride as negated values (identical
    # total order), and group_cols partitions every stage by dimension,
    # so the whole RFM scoring is one bounded set of fact-sized shuffles
    # with no single-partition stage anywhere
    cust = cacheutil.materialize(cust)
    melt = cust.select(
        "o_custkey",
        F.explode(
            F.array(
                F.struct(F.lit("r").alias("dim"), F.col("recency_days").alias("x")),
                F.struct(F.lit("f").alias("dim"), (-F.col("frequency")).alias("x")),
                F.struct(
                    F.lit("m").alias("dim"), (-F.col("monetary_cents")).alias("x")
                ),
            )
        ).alias("e"),
    ).select("o_custkey", "e.dim", "e.x")
    ranked = distributed_total_rank(
        melt, F.col("x"), F.col("o_custkey"), group_cols=["dim"]
    ).select(
        "o_custkey",
        "dim",
        ntile_from_rank(F.col("rank"), F.col("n_total"), 5).alias("t"),
    )
    scored = ranked.groupBy("o_custkey").agg(
        F.max(F.when(F.col("dim") == "r", F.col("t"))).alias("r"),
        F.max(F.when(F.col("dim") == "f", F.col("t"))).alias("f"),
        F.max(F.when(F.col("dim") == "m", F.col("t"))).alias("m"),
    )
    return scored.groupBy("r", "f", "m").agg(
        F.count("*").cast("long").alias("n_customers")
    )


@register(
    "q_basket_rules",
    "agg",
    oracle="""
    WITH basket AS (
      SELECT DISTINCT l_orderkey, p_brand
      FROM lineitem JOIN part ON l_partkey = p_partkey
    ),
    n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_baskets FROM basket),
    item AS (SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_item FROM basket GROUP BY 1),
    pair AS (
      SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
             CAST(COUNT(*) AS BIGINT) AS n_pair
      FROM basket a
      JOIN basket b ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
      GROUP BY 1, 2
    )
    SELECT brand_a, brand_b, n_pair,
           ia.n_item AS n_a, ib.n_item AS n_b,
           CAST(n_pair AS DOUBLE) / CAST(ia.n_item AS DOUBLE) AS conf_ab,
           CAST(n_pair AS DOUBLE) / CAST(ib.n_item AS DOUBLE) AS conf_ba,
           CAST(n_pair AS DOUBLE) * CAST(n_baskets AS DOUBLE)
             / (CAST(ia.n_item AS DOUBLE) * CAST(ib.n_item AS DOUBLE)) AS lift
    FROM pair
    JOIN item ia ON ia.p_brand = brand_a
    JOIN item ib ON ib.p_brand = brand_b
    CROSS JOIN n
    ORDER BY n_pair DESC, brand_a, brand_b
    LIMIT 20
    """,
    notes="extension: market-basket ASSOCIATION RULES — the other classic "
    "retail analytic the reference's POS data exists for: brand pairs "
    "co-purchased in one order, with support, both confidences, and "
    "lift. The pair join is keyed on the ORDER (baskets are ~4 items, "
    "pairs ≤ 6/order — never the brand cross product); per-item counts "
    "broadcast back; lift/confidence are fixed IEEE trees over exact "
    "int64 counts. The text twin (q_text_cooccur) mines token pairs "
    "with A-priori pruning — same algebra, different corpus. Top-20 by "
    "(support DESC, pair) total order",
)
def q_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    basket = (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    n = basket.select(F.count_distinct("l_orderkey").cast("long").alias("n_baskets"))
    item = basket.groupBy("p_brand").agg(F.count("*").cast("long").alias("n_item"))
    a = basket.select(F.col("l_orderkey"), F.col("p_brand").alias("brand_a"))
    b = basket.select(F.col("l_orderkey"), F.col("p_brand").alias("brand_b"))
    pair = (
        a.join(b, "l_orderkey")
        .where(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count("*").cast("long").alias("n_pair"))
    )
    ia = item.select(F.col("p_brand").alias("brand_a"), F.col("n_item").alias("n_a"))
    ib = item.select(F.col("p_brand").alias("brand_b"), F.col("n_item").alias("n_b"))
    scored = (
        pair.join(F.broadcast(ia), "brand_a")
        .join(F.broadcast(ib), "brand_b")
        .crossJoin(F.broadcast(n))
        .select(
            "brand_a",
            "brand_b",
            "n_pair",
            "n_a",
            "n_b",
            (F.col("n_pair").cast("double") / F.col("n_a").cast("double")).alias("conf_ab"),
            (F.col("n_pair").cast("double") / F.col("n_b").cast("double")).alias("conf_ba"),
            (
                F.col("n_pair").cast("double")
                * F.col("n_baskets").cast("double")
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
            ).alias("lift"),
        )
    )
    return scored.orderBy(F.col("n_pair").desc(), "brand_a", "brand_b").limit(20)


@register(
    "q_seg_abc",
    "agg",
    oracle="""
    WITH cust AS (
      SELECT o_custkey,
             CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY o_custkey
    ),
    t AS (SELECT CAST(SUM(cents) AS BIGINT) AS total FROM cust),
    ranked AS (
      SELECT cents,
             SUM(cents) OVER (ORDER BY cents DESC, o_custkey) AS cum
      FROM cust
    ),
    classed AS (
      SELECT cents,
             CASE WHEN cum * 100 <= 80 * total THEN 'A'
                  WHEN cum * 100 <= 95 * total THEN 'B'
                  ELSE 'C' END AS cls
      FROM ranked, t
    )
    SELECT cls,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(cents) AS BIGINT) AS revenue_cents
    FROM classed GROUP BY cls
    """,
    notes="extension: Pareto / ABC analysis — the 80/15/5 revenue-"
    "concentration classification every inventory/CRM team runs: "
    "customers sorted by revenue, class A while cumulative revenue ≤ "
    "80% of total, B to 95%, C after. The thresholds are INTEGER "
    "CROSS-MULTIPLIED (cum·100 ≤ 80·total on exact cents — no float "
    "share ever decides a boundary customer). The global cumsum runs "
    "the SCALE-SAFE distributed_total_rank path (range-bucketed prefix "
    "sums — no single-partition sort of the customer table; pinned "
    "row-identical to the window cumsum in tests/test_rank_scale.py); "
    "3-row output. int64 bound: cum·100 needs total < 9.2e16 cents "
    "≈ $920 T",
)
def q_seg_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.order import distributed_total_rank

    o = table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
        .cast("long")
        .alias("cents")
    )
    ranked = distributed_total_rank(
        cust, F.col("cents"), F.col("o_custkey"), descending=True
    )
    classed = ranked.select(
        "cents",
        F.when(F.col("cum") * 100 <= 80 * F.col("x_total"), F.lit("A"))
        .when(F.col("cum") * 100 <= 95 * F.col("x_total"), F.lit("B"))
        .otherwise(F.lit("C"))
        .alias("cls"),
    )
    return classed.groupBy("cls").agg(
        F.count("*").cast("long").alias("n_customers"),
        F.sum("cents").cast("long").alias("revenue_cents"),
    )


@register(
    "q_repurchase_interval",
    "agg",
    oracle="""
    WITH gaps AS (
      SELECT c.c_mktsegment,
             CAST(date_diff('day',
                    lag(CAST(o.o_orderdate AS DATE)) OVER (
                      PARTITION BY o.o_custkey
                      ORDER BY CAST(o.o_orderdate AS DATE), o.o_orderkey),
                    CAST(o.o_orderdate AS DATE)) AS BIGINT) AS gap_days
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    g AS (SELECT c_mktsegment, gap_days FROM gaps WHERE gap_days IS NOT NULL),
    cnt AS (
      SELECT c_mktsegment, gap_days, CAST(COUNT(*) AS BIGINT) AS n
      FROM g GROUP BY 1, 2
    ),
    cum AS (
      SELECT c_mktsegment, gap_days, n,
             SUM(n) OVER (PARTITION BY c_mktsegment ORDER BY gap_days) AS cw
      FROM cnt
    ),
    tot AS (SELECT c_mktsegment, CAST(SUM(n) AS BIGINT) AS n_gaps FROM cnt GROUP BY 1)
    SELECT cum.c_mktsegment, n_gaps,
           CAST(MIN(CASE WHEN cw * 2 >= n_gaps THEN gap_days END) AS BIGINT)
             AS median_gap_days
    FROM cum JOIN tot ON cum.c_mktsegment = tot.c_mktsegment
    GROUP BY cum.c_mktsegment, n_gaps
    """,
    notes="extension: REPURCHASE CADENCE per market segment — the retail "
    "retention metric: per-customer consecutive order gaps (lag over a "
    "(date, orderkey) total order — same-day double orders need the "
    "tiebreak), then the exact lower median gap per segment via the "
    "q_stats_wmedian cumulative-count ladder (integer day lattice, "
    "cross-multiplied threshold). One per-customer window shuffle + one "
    "segment-value count shuffle; first orders (no predecessor) are "
    "excluded, not zero-filled",
)
def q_repurchase_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.aggregates import grouped_weighted_median

    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("o_custkey").orderBy(
        F.to_date("o_orderdate"), F.col("o_orderkey")
    )
    gaps = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .select(
            "c_mktsegment",
            F.datediff(
                F.to_date("o_orderdate"), F.lag(F.to_date("o_orderdate")).over(w)
            )
            .cast("long")
            .alias("gap_days"),
        )
        .where(F.col("gap_days").isNotNull())
    )
    med = grouped_weighted_median(gaps, "c_mktsegment", F.col("gap_days"), F.lit(1))
    return med.select(
        "c_mktsegment",
        F.col("total_w").alias("n_gaps"),
        F.col("wmedian").alias("median_gap_days"),
    )


@register(
    "q_cohort_clv",
    "agg",
    oracle="""
    WITH firsts AS (
      SELECT o_custkey,
             MIN(date_trunc('month', CAST(o_orderdate AS DATE))) AS cohort_month
      FROM orders GROUP BY o_custkey
    ),
    spend AS (
      SELECT f.cohort_month,
             CAST((EXTRACT(YEAR FROM CAST(o.o_orderdate AS DATE))
                     - EXTRACT(YEAR FROM f.cohort_month)) * 12
                  + (EXTRACT(MONTH FROM CAST(o.o_orderdate AS DATE))
                     - EXTRACT(MONTH FROM f.cohort_month)) AS BIGINT)
               AS month_age,
             CAST(round(o.o_totalprice * 100, 0) AS BIGINT) AS cents
      FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
    ),
    m AS (
      SELECT CAST(cohort_month AS TIMESTAMP) AS cohort_month, month_age,
             CAST(SUM(cents) AS BIGINT) AS rev_cents
      FROM spend GROUP BY 1, 2
    )
    SELECT cohort_month, month_age, rev_cents,
           CAST(SUM(rev_cents) OVER (
             PARTITION BY cohort_month ORDER BY month_age) AS BIGINT)
             AS cum_rev_cents
    FROM m
    WHERE month_age <= 24
    """,
    notes="extension: cohort LIFETIME-VALUE curve — the MONEY twin of "
    "q_cohort_retention (which counts actives): customers bucketed by "
    "first-order month, revenue accumulated by integer month-age, "
    "cumulative per cohort — the curve CAC payback is read from. Exact "
    "cents throughout; month_age is pure integer calendar arithmetic "
    "(year·12 + month deltas — identical on both engines, no interval "
    "division); the cumsum window runs over (cohorts × ages) aggregated "
    "rows, never facts. Truncated at 24 ages for a bounded contract "
    "row set",
)
def q_cohort_clv(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    firsts = o.groupBy("o_custkey").agg(
        F.min(F.trunc(F.to_date("o_orderdate"), "month")).alias("_cm")
    )
    spend = o.join(firsts, "o_custkey").select(
        F.col("_cm"),
        (
            (F.year(F.to_date("o_orderdate")) - F.year("_cm")) * 12
            + (F.month(F.to_date("o_orderdate")) - F.month("_cm"))
        )
        .cast("long")
        .alias("month_age"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    m = spend.groupBy(
        F.col("_cm").cast("timestamp").alias("cohort_month"), "month_age"
    ).agg(F.sum("cents").cast("long").alias("rev_cents"))
    w = (
        Window.partitionBy("cohort_month")
        .orderBy("month_age")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return m.where(F.col("month_age") <= 24).select(
        "cohort_month",
        "month_age",
        "rev_cents",
        F.sum("rev_cents").over(w).cast("long").alias("cum_rev_cents"),
    )


@register(
    "q_rank_distributed",
    "window",
    oracle="""
    WITH cust AS (
      SELECT o_custkey,
             CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY o_custkey
    ), r AS (
      SELECT o_custkey, cents,
             CAST(row_number() OVER (ORDER BY cents DESC, o_custkey) AS BIGINT)
               AS rnk,
             CAST(SUM(cents) OVER (ORDER BY cents DESC, o_custkey) AS BIGINT)
               AS cum
      FROM cust
    )
    SELECT o_custkey, cents, rnk, cum FROM r WHERE rnk <= 200
    """,
    notes="extension (r11): the scale-safe global-rank operator's own "
    "contract row — distributed_total_rank (range-bucketed prefix sums, "
    "no single-partition sort) must reproduce row_number + running-sum "
    "window semantics EXACTLY under the (cents DESC, custkey) total "
    "order, top-200 by rank for bounded output. This is the primitive "
    "q_seg_rfm/q_seg_abc/q_eval_lift now ride; certifying it directly "
    "pins the machinery, not just its three consumers. The oracle's "
    "RANGE default frame equals ROWS because the order is total",
)
def q_rank_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.order import distributed_total_rank

    o = table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
        .cast("long")
        .alias("cents")
    )
    ranked = distributed_total_rank(
        cust, F.col("cents"), F.col("o_custkey"), descending=True
    )
    return ranked.where(F.col("rank") <= 200).select(
        "o_custkey",
        "cents",
        F.col("rank").alias("rnk"),
        F.col("cum").alias("cum"),
    )


@register(
    "q_eval_calibration",
    "agg",
    oracle="""
    WITH unit AS (
      SELECT user_id,
             CAST(COALESCE(SUM(CASE WHEN event_type = 'click'
                    THEN CAST(floor(value * 100) AS BIGINT) END), 0) AS BIGINT)
               AS score,
             CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS responded
      FROM events GROUP BY user_id
    ),
    m AS (SELECT CAST(MAX(score) AS BIGINT) AS mx FROM unit)
    SELECT CAST((score * 10) // (mx + 1) AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(responded) AS BIGINT) AS responders,
           CAST(SUM(responded) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             AS response_rate,
           CAST(SUM(score) AS BIGINT) AS sum_score
    FROM unit, m
    GROUP BY bucket
    """,
    notes="extension (r11): CALIBRATION / reliability table — the "
    "companion of q_eval_lift's rank-deciles: fixed-width SCORE bins "
    "(integer cross-engine division, buckets 0..9 by score·10 div "
    "(max+1)) with per-bin volume and observed response rate — how a "
    "monotone score maps to outcome probability, the curve every "
    "threshold decision reads. Exact int64 counts/scores; the rate is "
    "one division over exact ints (bit-identical per IEEE). Two "
    "shuffles (per-unit agg + 10-bin agg), max broadcasts; no sort, no "
    "window — shape-invariant to 100 TB",
)
def q_eval_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100).cast("long")
    unit = ev.groupBy("user_id").agg(
        F.coalesce(F.sum(F.when(F.col("event_type") == "click", cents)), F.lit(0))
        .cast("long")
        .alias("score"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("responded"),
    )
    m = unit.agg(F.max("score").cast("long").alias("mx"))
    return (
        unit.crossJoin(F.broadcast(m))
        .select(
            F.expr("(score * 10) div (mx + 1)").cast("long").alias("bucket"),
            "responded",
            "score",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("responded").cast("long").alias("responders"),
            (
                F.sum("responded").cast("double") / F.count("*").cast("double")
            ).alias("response_rate"),
            F.sum("score").cast("long").alias("sum_score"),
        )
    )


@register(
    "q_eval_auc",
    "agg",
    oracle="""
    WITH unit AS (
      SELECT user_id,
             CAST(COALESCE(SUM(CASE WHEN event_type = 'click'
                    THEN CAST(floor(value * 100) AS BIGINT) END), 0) AS BIGINT)
               AS score,
             CAST(CASE WHEN SUM(CASE WHEN event_type = 'purchase'
                    THEN 1 ELSE 0 END) >= 14 THEN 1 ELSE 0 END AS BIGINT)
               AS responded
      FROM events GROUP BY user_id
    ),
    lat AS (
      SELECT score, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(responded) AS BIGINT) AS p
      FROM unit GROUP BY score
    ),
    cum AS (
      SELECT n, p,
             COALESCE(SUM(n) OVER (ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
      FROM lat
    ),
    t AS (
      SELECT CAST(SUM(p * (2 * below + n + 1)) AS BIGINT) AS r2,
             CAST(SUM(p) AS BIGINT) AS n_pos,
             CAST(SUM(n) - SUM(p) AS BIGINT) AS n_neg
      FROM cum
    )
    SELECT n_pos, n_neg,
           CAST(r2 - n_pos * (n_pos + 1) AS BIGINT) AS u2,
           CAST(r2 - n_pos * (n_pos + 1) AS DOUBLE)
             / CAST(2 * n_pos * n_neg AS DOUBLE) AS auc
    FROM t
    """,
    notes="extension (r11): exact ROC AUC — the third leg of the "
    "model-eval family beside q_eval_lift (rank deciles) and "
    "q_eval_calibration (reliability bins); the positive class is the "
    "above-median heavy purchaser (>=14 purchase events, splits every "
    "SF - EVERY synthetic user purchases at least once). AUC is the Mann-Whitney U "
    "statistic normalized: midrank sum over positives computed on the "
    "SCORE LATTICE (2R1 = Σ p·(2·below + n + 1) — all integer, ties "
    "exact by construction), below-counts from distributed_total_rank "
    "(no single-partition sort; the oracle's window runs on the "
    "lattice, not units). u2 = 2·U1 certifies the integer core; auc is "
    "ONE division over exact ints — bit-identical per IEEE. "
    "operators/aggregates.auc_exact (grouped form available); pairwise-"
    "definition pytest in tests/test_plans.py",
)
def q_eval_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.aggregates import auc_exact

    ev = table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100).cast("long")
    unit = ev.groupBy("user_id").agg(
        F.coalesce(F.sum(F.when(F.col("event_type") == "click", cents)), F.lit(0))
        .cast("long")
        .alias("score"),
        F.when(
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)) >= 14,
            1,
        )
        .otherwise(0)
        .cast("long")
        .alias("responded"),
    )
    return auc_exact(unit, F.col("score"), F.col("responded"), F.col("user_id"))


@register(
    "q_attribution",
    "window",
    oracle="""
    WITH e AS (
      SELECT user_id, ts, event_id, event_type, value,
             CASE WHEN event_type IN ('click','view','signup')
                  THEN event_type END AS touch_ev
      FROM events
    ),
    carried AS (
      SELECT event_type, value,
             last_value(touch_ev IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_touch,
             first_value(touch_ev IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS first_touch
      FROM e
    ),
    conv AS (
      SELECT COALESCE(last_touch, 'direct') AS touch, 'last' AS model,
             CAST(floor(value * 100) AS BIGINT) AS cents
      FROM carried WHERE event_type = 'purchase'
      UNION ALL
      SELECT COALESCE(first_touch, 'direct') AS touch, 'first' AS model,
             CAST(floor(value * 100) AS BIGINT) AS cents
      FROM carried WHERE event_type = 'purchase'
    )
    SELECT model, touch, CAST(COUNT(*) AS BIGINT) AS n_conversions,
           CAST(SUM(cents) AS BIGINT) AS attributed_cents
    FROM conv GROUP BY model, touch
    """,
    notes="extension (r12, promised by the r11 operator docstring): last- "
    "AND first-touch revenue attribution over the events stream — each "
    "purchase credits its revenue to the most-recent (model='last') or "
    "earliest (model='first') preceding click/view/signup of the same "
    "user; conversions with no preceding touch stay visible in the "
    "'direct' bucket. Both models are the SAME one-shuffle per-user "
    "window (last/first ignorenulls over [unbounded, -1) on the (ts, "
    "event_id) total order — the id tiebreak pins simultaneous events), "
    "unioned with a model tag; output is <= 2*(|touch_types|+1) rows. "
    "Revenue on the exact cents grid (floor(value*100) — identical IEEE "
    "double mult in both engines). operators/timeseries."
    "last_touch_attribution; planted-sequence pytest in "
    "tests/test_timeseries.py",
)
def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import last_touch_attribution

    ev = table(spark, sf_dir, "events")
    out = None
    for model in ("last", "first"):
        part = last_touch_attribution(ev, model=model).withColumn(
            "model", F.lit(model)
        )
        out = part if out is None else out.unionByName(part)
    return out.select("model", "touch", "n_conversions", "attributed_cents")


@register(
    "q_attribution_linear",
    "window",
    oracle="""
    WITH e AS (
      SELECT event_type,
             CAST(floor(value * 100) AS BIGINT) * 1000000 AS micro,
             COUNT(CASE WHEN event_type = 'click' THEN 1 END) OVER w AS c_click,
             COUNT(CASE WHEN event_type = 'view' THEN 1 END) OVER w AS c_view,
             COUNT(CASE WHEN event_type = 'signup' THEN 1 END) OVER w AS c_signup
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ), conv AS (
      SELECT *, c_click + c_view + c_signup AS n_all
      FROM e WHERE event_type = 'purchase'
    ), legs AS (
      SELECT 'click' AS touch,
             CASE WHEN n_all > 0 THEN (micro * c_click) // n_all END AS credit,
             c_click > 0 AS touched
      FROM conv
      UNION ALL
      SELECT 'view',
             CASE WHEN n_all > 0 THEN (micro * c_view) // n_all END,
             c_view > 0
      FROM conv
      UNION ALL
      SELECT 'signup',
             CASE WHEN n_all > 0 THEN (micro * c_signup) // n_all END,
             c_signup > 0
      FROM conv
      UNION ALL
      SELECT 'direct',
             CASE WHEN n_all = 0 THEN micro END,
             n_all = 0
      FROM conv
    )
    SELECT touch,
           CAST(COUNT(*) AS BIGINT) AS n_conversions,
           CAST(SUM(credit) AS BIGINT) AS attributed_microcents
    FROM legs WHERE touched GROUP BY touch
    """,
    notes="extension (r12): LINEAR (equal-split multi-touch) attribution "
    "— completes the model family beside q_attribution's last/first: "
    "every purchase splits its revenue equally over ALL preceding "
    "touches of the user, credit per channel proportional to its share "
    "of the touch history. Exact integer MICRO-CENTS grid: per "
    "(conversion, type), (cents*10^6*n_type) div n_all — integral "
    "division of positive int64s (Spark computes it as (a - a%b)/b: "
    "the exact-multiple double division; a bare a/b could round up "
    "across an integer boundary and disagree with the oracle's // by "
    "one microcent). Plan: |touch_types| conditional COUNT windows "
    "over ONE per-user frame — one hash exchange, NO per-(conversion, "
    "touch) pair join (that shape is quadratic per user); 'direct' "
    "keeps unattributed revenue visible. operators/timeseries."
    "linear_touch_attribution; hand-sequence pytest",
)
def q_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import linear_touch_attribution

    return linear_touch_attribution(table(spark, sf_dir, "events"))


def _ushape_leg_sql(t: str) -> str:
    f = f"CAST(ft = '{t}' AS BIGINT)"
    l = f"CAST(lt = '{t}' AS BIGINT)"
    return f"""
      SELECT '{t}' AS touch,
             CASE WHEN n = 1 THEN micro * {f}
                  WHEN n = 2 THEN (micro // 2) * ({f} + {l})
                  WHEN n >= 3 THEN ((micro * 2) // 5) * ({f} + {l})
                       + ((micro * (c_{t} - {f} - {l})) // (5 * (n - 2)))
             END AS credit,
             c_{t} > 0 AS touched
      FROM conv"""


@register(
    "q_attribution_ushape",
    "window",
    oracle="""
    WITH e AS (
      SELECT event_type,
             CAST(floor(value * 100) AS BIGINT) * 1000000 AS micro,
             first_value(touch_ev IGNORE NULLS) OVER w AS ft,
             last_value(touch_ev IGNORE NULLS) OVER w AS lt,
             COUNT(CASE WHEN event_type = 'click' THEN 1 END) OVER w AS c_click,
             COUNT(CASE WHEN event_type = 'view' THEN 1 END) OVER w AS c_view,
             COUNT(CASE WHEN event_type = 'signup' THEN 1 END) OVER w AS c_signup
      FROM (SELECT *, CASE WHEN event_type IN ('click','view','signup')
                           THEN event_type END AS touch_ev FROM events)
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ), conv AS (
      SELECT *, c_click + c_view + c_signup AS n
      FROM e WHERE event_type = 'purchase'
    ), legs AS (
    """
    + "\n      UNION ALL".join(_ushape_leg_sql(t) for t in ("click", "view", "signup"))
    + """
      UNION ALL
      SELECT 'direct', CASE WHEN n = 0 THEN micro END, n = 0 FROM conv
    )
    SELECT touch,
           CAST(COUNT(*) AS BIGINT) AS n_conversions,
           CAST(SUM(credit) AS BIGINT) AS attributed_microcents
    FROM legs WHERE touched GROUP BY touch
    """,
    notes="extension (r12): POSITION-BASED (U-shaped, 40/20/40) "
    "attribution — completes the four standard models (q_attribution "
    "last/first, q_attribution_linear equal-split): first touch 40%, "
    "last 40%, middles split 20%; one touch takes all, two split 50/50, "
    "none stays 'direct'. Same exact micro-cent integral-division "
    "discipline ((a-a%b)/b == DuckDB //, all operands positive) and the "
    "SAME single per-user window frame — two carried first/last values "
    "+ three conditional counts, one hash exchange, no joins. The type "
    "legs of the oracle are GENERATED from one template "
    "(_ushape_leg_sql) so the three branches cannot drift. operators/"
    "timeseries.position_touch_attribution; hand-sequence pytest",
)
def q_attribution_ushape(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import position_touch_attribution

    return position_touch_attribution(table(spark, sf_dir, "events"))
