"""Time-series regularization: calendar gap-fill + last-observation-
carried-forward (LOCF).

Extension beyond the reference's dataflow surface (its daily jobs only
aggregate days that exist — reference ``airflow/dags/POS_spark_dag.py``'s
daily summaries silently skip empty days): downstream consumers of a
daily series (forecasting, day-over-day deltas, SLA dashboards) need a
DENSE series, which means manufacturing the missing (key, day) rows and
deciding their value. This module does the standard pair:

- ``densify``: one row per key per calendar day of the KEY'S OWN observed
  span (min..max day per key — never a global calendar, which would
  fabricate rows before a key existed);
- LOCF via ``last(value, ignorenulls=True)`` over an unbounded-preceding
  window — the canonical forward-fill.

Scale: the calendar explode is bounded by per-key span (days), not by the
fact row count — a key observed over Y years adds ≤ 365·Y rows regardless
of how many billion events it has, and the span aggregate that feeds it is
partial-aggregable. The LOCF window shuffles once on the key; at 100 TB
that is the same single hash-exchange any per-key window costs, and AQE
splits skewed keys. No driver-side state of any kind.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def densify(df: DataFrame, key_col: str, day_col: str) -> DataFrame:
    """One row per ``key`` per day between that key's first and last
    observed day (inclusive): per-key span aggregate → ``sequence`` +
    ``explode``. Input must already be one-row-per-(key, day)."""
    spans = df.groupBy(key_col).agg(
        F.min(day_col).alias("_d0"), F.max(day_col).alias("_d1")
    )
    cal = spans.select(
        key_col, F.explode(F.sequence("_d0", "_d1")).alias(day_col)
    )
    return cal.join(df, [key_col, day_col], "left")


def gapfill_locf(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_agg: Column,
    value_name: str = "value",
) -> DataFrame:
    """Daily-aggregate ``df`` by (key, day), densify each key's span, and
    forward-fill missing days with the last observed value.

    ``value_agg`` is the per-(key, day) aggregate expression (e.g.
    ``F.max("value")``). Order-sensitive float aggregates (``F.sum`` of
    doubles) are the caller's determinism problem; the contract query uses
    ``max``, which is order-free and exact.

    Output: ``(key_col, day, value_name, observed)`` where ``observed``
    is 1 for real days, 0 for manufactured ones. The first day of each
    key's span is always observed (the span starts at an observation), so
    LOCF never emits a leading NULL. ``day`` is emitted as a midnight
    TIMESTAMP (not DATE): the contract comparison pipeline normalizes
    both engines through pandas, where DATE columns round-trip
    inconsistently (object-dtype ``date`` vs ``datetime64``) — every
    date-grained contract output in this library is a timestamp."""
    daily = df.groupBy(
        F.col(key_col), F.to_date(ts_col).alias("_day")
    ).agg(value_agg.alias("_v"))
    dense = densify(daily, key_col, "_day")
    w = (
        Window.partitionBy(key_col)
        .orderBy("_day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return dense.select(
        key_col,
        F.col("_day").cast("timestamp").alias("day"),
        F.last("_v", ignorenulls=True).over(w).alias(value_name),
        F.when(F.col("_v").isNotNull(), F.lit(1)).otherwise(F.lit(0)).alias("observed"),
    )


def cusum_alarms(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: Column,
    target_num: Column,
    target_den: Column,
    slack: Column,
    threshold: Column,
) -> DataFrame:
    """One-sided (upper) Page CUSUM per key, exactly, in two window
    passes: the sequential change-point detector every metrics pipeline
    wants ("did this user's spend level SHIFT, and when?") — not the
    pointwise z-score gate (``q_anomaly_zscore``), which misses small
    sustained shifts entirely.

    The textbook recursion ``C_i = max(0, C_{i-1} + x_i − target −
    slack)`` looks inherently sequential, but it telescopes: with
    ``S_i = Σ_{j≤i} d_j`` (prefix sum of deviations), ``C_i = S_i −
    min(0, min_{j≤i} S_j)`` (the 0 is the empty prefix — dropping it
    clamps the FIRST positive run to zero) — a running sum and a
    running min over the SAME
    per-key window, one shuffle, both whole-stage-codegen. That is the
    entire scale story: CUSUM over a trillion rows costs exactly one
    exchange keyed by the monitored entity.

    Exactness: ``value_col``, the rational target (``target_num /
    target_den``), ``slack`` and ``threshold`` must all be INTEGER
    columns on a common grid (cents, milli-units); deviations are
    cross-multiplied — ``d_i = den·x_i − num − den·slack`` — so no
    quotient is ever materialized and the alarm decision ``C_i >
    den·threshold`` is bigint-exact on any engine, any row order within
    the (total) ``order_cols`` tiebreak.

    int64 bound (ADVICE r7): the per-key prefix sum holds up to
    ``rows_per_key · max|den·x − num − den·slack|``, which must stay
    under 2^63 ≈ 9.2e18. The denominator MULTIPLIES every deviation, so
    callers must pass a REDUCED rational target — a fixed small
    denominator (milli-units: ``num = (Σx·1000) div n``, ``den = 1000``)
    or a gcd-reduced exact mean — never a corpus-row-count denominator:
    with ``den = N`` the bound shrinks as 1/N and a billion-row corpus
    overflows at ~1e6·grid rows per key. At ``den = 1e3`` and cent
    values ≤ 1e7 the safe depth is ~9e8 rows per key; at milli-unit
    ``den = 1e6`` it is ~9e5 — pick the coarsest den the target
    tolerance allows (the target rounds by at most 1/den of one grid
    unit, far inside any alarm threshold).

    Returns the input keys + ``order_cols`` + ``c_scaled`` (the CUSUM
    statistic in den-units) + ``alarm`` (int 0/1). Callers filter
    ``alarm = 1`` for change points; the first alarm row per key is the
    detected shift onset."""
    d = target_den * value_col - target_num - target_den * slack
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    s = F.sum(d).over(w)
    with_s = df.select(
        key_col, *order_cols, target_den.alias("_den"), threshold.alias("_h"), s.alias("_s")
    )
    m = F.least(F.lit(0).cast("long"), F.min("_s").over(w))
    return with_s.select(
        key_col,
        *order_cols,
        (F.col("_s") - m).alias("c_scaled"),
        ((F.col("_s") - m) > F.col("_den") * F.col("_h")).cast("int").alias("alarm"),
    )


def ohlc(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_cents: Column,
    order_key: Column,
    bucket: str = "day",
) -> DataFrame:
    """Per-(key, calendar-bucket) OHLC candlestick: open / high / low /
    close plus count and volume — the time-series summarization every
    metrics warehouse keeps (the reference's daily job aggregates only a
    SUM per day, ``POS_spark_dag.py:401-420``; this is the full bar).

    ONE partial-aggregable groupBy: ``min_by``/``max_by`` against a
    caller-supplied total ``order_key`` pick the first/last value of the
    bucket, ``min``/``max``/``sum``/``count`` do the rest — every
    aggregate has a map-side combine, so the shuffle carries six numbers
    per (key, bucket) at any fact size, and no window/sort pass ever
    runs (the naive first/last-over-ordered-window formulation sorts
    every partition; min_by does not).

    Exactness contract: ``value_cents`` must be an INTEGER grid column
    (cents) — sums stay bigint-exact and order-free. ``order_key`` must
    be a TOTAL order (ties would make open/close nondeterministic);
    callers build it as ``epoch·10^k + unique_id``. int64 bound: volume
    needs rows_per_bucket · max|cents| < 2^63.

    Output: (key, bucket_ts, open/high/low/close/volume cents, n).
    """
    b = F.date_trunc(bucket, F.col(ts_col))
    return (
        df.select(
            F.col(key_col),
            b.alias("_bucket"),
            value_cents.alias("_v"),
            order_key.alias("_o"),
        )
        .groupBy(key_col, "_bucket")
        .agg(
            F.min_by("_v", "_o").alias("open_cents"),
            F.max("_v").alias("high_cents"),
            F.min("_v").alias("low_cents"),
            F.max_by("_v", "_o").alias("close_cents"),
            F.sum("_v").alias("volume_cents"),
            F.count("*").alias("n"),
        )
        .withColumnRenamed("_bucket", "bucket_ts")
    )


def funnel_counts(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-funnel analysis: for each prefix of ``steps``, how many
    users completed it IN ORDER — the product-analytics staple (view →
    click → purchase) the reference's dashboards could never express
    beyond single-event counts.

    Semantics (the standard earliest-completion rule): a user completes
    step i at the EARLIEST event of type ``steps[i]`` that is strictly
    after their step-i−1 completion time; greedy-earliest is optimal
    here (taking any later step-i event can only shrink the remaining
    window), so this is exact, not a heuristic.

    Plan: one user-keyed min aggregation per step — k−1 equi-joins on
    the user id over frames ALREADY filtered to one event type (the
    type predicate pushes to the scan; each join's inputs are
    per-step-completion sized, monotonically shrinking down the
    funnel). No window over raw events, no per-user event sorting: cost
    is O(matching events) per step, shuffled on the uniform user key.
    k is the funnel length (2-6 in practice) — a driver-side loop over
    STEPS, never over data.

    Output: one row per step — (step_idx, step, n_users), n_users
    non-increasing down the funnel.
    """
    if len(steps) < 1:
        raise ValueError("funnel_counts needs at least one step")
    u, t, ts = user_col, type_col, ts_col
    cur = (
        df.where(F.col(t) == steps[0])
        .groupBy(u)
        .agg(F.min(ts).alias("_t"))
    )
    counts = [cur]
    for s in steps[1:]:
        nxt = (
            df.where(F.col(t) == s)
            .select(u, F.col(ts).alias("_ts"))
            .join(cur, u)
            .where(F.col("_ts") > F.col("_t"))
            .groupBy(u)
            .agg(F.min("_ts").alias("_t"))
        )
        counts.append(nxt)
        cur = nxt
    spark = df.sparkSession
    parts = [
        c.agg(F.count("*").cast("long").alias("n_users")).select(
            F.lit(i).cast("int").alias("step_idx"),
            F.lit(steps[i]).alias("step"),
            "n_users",
        )
        for i, c in enumerate(counts)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_offset: int | None = None,
) -> DataFrame:
    """Cohort retention: group users by FIRST-SEEN day, then for every
    later day-offset report how many of that cohort were active — the
    "day-N retention" matrix.

    Plan: dedup the fact to active (user, day) pairs (one
    partial-aggregable shuffle — the fact never explodes), derive each
    user's cohort day with a user-keyed min, join pairs back to cohorts
    on the user id, and count distinct users per (cohort_day, offset).
    Output cardinality is days² at worst — dashboard-sized at any
    corpus size.

    ``retention`` is ONE raw division of exact longs (n_active /
    n_cohort ≤ 1) — correctly-rounded IEEE, hash-stable across engines
    (never a float sum). Offset 0 always reports retention 1.0.

    Output: (cohort_day, day_offset, n_cohort, n_active, retention).
    """
    u = user_col
    day = F.date_trunc("day", F.col(ts_col))
    pairs = df.select(F.col(u), day.alias("_day")).distinct()
    cohorts = pairs.groupBy(u).agg(F.min("_day").alias("_cohort"))
    sizes = cohorts.groupBy("_cohort").agg(
        F.count("*").cast("long").alias("n_cohort")
    )
    joined = pairs.join(cohorts, u).select(
        F.col("_cohort"),
        F.datediff(F.col("_day"), F.col("_cohort")).cast("int").alias("day_offset"),
        F.col(u),
    )
    if max_offset is not None:
        joined = joined.where(F.col("day_offset") <= int(max_offset))
    active = joined.groupBy("_cohort", "day_offset").agg(
        F.count_distinct(u).cast("long").alias("n_active")
    )
    return (
        active.join(sizes, "_cohort")
        .select(
            F.col("_cohort").alias("cohort_day"),
            "day_offset",
            "n_cohort",
            "n_active",
            (
                F.col("n_active").cast("double") / F.col("n_cohort").cast("double")
            ).alias("retention"),
        )
    )


def changepoint_cusum(
    df: DataFrame,
    group_col: str,
    order_col: str,
    x_int,
) -> DataFrame:
    """Offline single-changepoint detection per group — the binary-
    segmentation step: the split k maximizing the centered cumulative-sum
    deviation

        D_k = |n·S_k − k·S_n|        (= n·k·|mean(x_1..k) − mean(x)|)

    over the ``order_col`` sequence, EXACT in int64 (the ``ks_drift``
    discipline applied to time): one per-group window sort gives the
    prefix sums S_k, the group totals ride the same exchange, and the
    argmax ships with its statistic — no floats anywhere except the
    final normalized score (one raw division). The online/streaming
    complement is ``cusum_alarms`` (Page's test against a target); this
    is the retrospective "WHERE did the level shift" question.

    Ties on D_k break to the EARLIEST order value (deterministic,
    oracle-comparable). int64 bound: n·|S_k| < 2^63. Output: (group, n,
    split_at = order value of the last pre-split row, d_max, score =
    D_max/n as a double).
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(group_col)
    d = df.select(F.col(group_col), F.col(order_col), x_int.cast("long").alias("_x"))
    cum = d.select(
        group_col,
        order_col,
        F.sum("_x").over(w).alias("_sk"),
        F.row_number().over(Window.partitionBy(group_col).orderBy(order_col)).cast("long").alias("_k"),
        F.sum("_x").over(w_all).alias("_sn"),
        F.count("*").over(w_all).cast("long").alias("n"),
    )
    scored = cum.select(
        group_col,
        order_col,
        "n",
        F.abs(F.col("n") * F.col("_sk") - F.col("_k") * F.col("_sn")).alias("_d"),
    )
    w_pick = Window.partitionBy(group_col).orderBy(
        F.col("_d").desc(), F.col(order_col).asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w_pick))
        .where(F.col("_rn") == 1)
        .select(
            group_col,
            "n",
            F.col(order_col).alias("split_at"),
            F.col("_d").alias("d_max"),
            (F.col("_d").cast("double") / F.col("n").cast("double")).alias("score"),
        )
    )


def gapfill_interpolate(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_agg_int: Column,
    value_name: str = "value",
) -> DataFrame:
    """Daily-aggregate ``df`` by (key, day), densify each key's span, and
    LINEARLY INTERPOLATE missing days between their observed neighbors —
    the straight-line companion of ``gapfill_locf`` (which carries the
    last value flat). LOCF is right for state-like series (stock on
    hand); interpolation is right for flow-like series (a meter read on
    Mon and Thu implies Tue/Wed trended between them).

    ``value_agg_int`` must produce an INTEGER-lattice aggregate (e.g.
    cents via ``F.max(F.round(value*100)).cast("long")``): with integer
    neighbor values and integer day offsets, the interpolated value

        v = prev_v + (day − prev_d)·(next_v − prev_v) / (next_d − prev_d)

    is ONE fixed tree of IEEE ops over exact int64 terms — bit-identical
    across engines — and observed rows bypass the tree entirely (their
    exact value ships). Both span endpoints are observations (densify
    never extends past them), so every manufactured row has BOTH
    neighbors: no extrapolation case exists, and the denominator is ≥ 2.

    Scale: identical shape to ``gapfill_locf`` — the calendar explode is
    bounded by per-key span-days, the neighbor lookup is two
    ignorenulls-window passes over ONE per-key shuffle (Catalyst
    evaluates all four window columns in a single Window node pair
    sharing the sort). Output: ``(key, day TIMESTAMP, value_name DOUBLE,
    observed)``."""
    daily = df.groupBy(F.col(key_col), F.to_date(ts_col).alias("_day")).agg(
        value_agg_int.alias("_v")
    )
    dense = densify(daily, key_col, "_day")
    back = (
        Window.partitionBy(key_col)
        .orderBy("_day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy(key_col)
        .orderBy("_day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    pv = F.last("_v", ignorenulls=True).over(back)
    pd = F.last(F.when(F.col("_v").isNotNull(), F.col("_day")), ignorenulls=True).over(back)
    nv = F.first("_v", ignorenulls=True).over(fwd)
    nd = F.first(F.when(F.col("_v").isNotNull(), F.col("_day")), ignorenulls=True).over(fwd)
    dd = F.datediff(F.col("_day"), pd).cast("long")
    dn = F.datediff(nd, pd).cast("long")
    interp = F.when(F.col("_v").isNotNull(), F.col("_v").cast("double")).otherwise(
        pv.cast("double") + (dd * (nv - pv)).cast("double") / dn.cast("double")
    )
    return dense.select(
        key_col,
        F.col("_day").cast("timestamp").alias("day"),
        interp.alias(value_name),
        F.when(F.col("_v").isNotNull(), F.lit(1)).otherwise(F.lit(0)).alias("observed"),
    )


def top_event_paths(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    uniq_col: str,
    depth: int = 3,
    k: int = 20,
) -> DataFrame:
    """Top-``k`` most frequent length-``depth`` CONSECUTIVE event-type
    paths across all keys — sequence mining's workhorse query ("what do
    users do in their next two steps after a signup?"), the n-step
    generalization of a Markov transition matrix (q_event_transitions is
    the depth=2 bigram form).

    Physical shape: ONE per-key window shuffle ordered by
    ``(ts, uniq)`` (the unique column makes simultaneous events
    deterministic — timestamps alone would be a nondeterministic sort),
    ``depth−1`` LEAD columns evaluated in the SAME Window node (no extra
    exchange per step), then a partial-aggregable path count and a
    global top-k with (count DESC, path ASC) total order. Paths that
    would run past a key's last event (any NULL lead) are dropped, not
    padded — each key with m events contributes exactly
    ``max(m−depth+1, 0)`` paths.

    Scale: the window state is O(depth) per row (bounded lookahead, not
    a full-partition buffer); path cardinality is ≤ |types|^depth —
    tiny — so the count shuffle is map-side-combined to near nothing.
    No driver state; the top-k is a single-partition sort of the
    aggregated (not raw) rows."""
    w = Window.partitionBy(key_col).orderBy(ts_col, uniq_col)
    steps = [F.col(type_col)] + [
        F.lead(type_col, i).over(w) for i in range(1, depth)
    ]
    # every step must be non-null: a NULL type row would otherwise be
    # silently SKIPPED by concat_ws, promoting a 2-step fragment into a
    # counted "3-step" path (and a null LAST lead alone can't prove the
    # middle ones non-null when the type column itself is nullable)
    complete = steps[0].isNotNull()
    for s in steps[1:]:
        complete = complete & s.isNotNull()
    paths = df.select(
        F.concat_ws(">", *steps).alias("path"),
        complete.alias("_complete"),
    ).where(F.col("_complete"))
    counts = paths.groupBy("path").agg(F.count("*").cast("long").alias("n"))
    return counts.orderBy(F.col("n").desc(), F.col("path")).limit(k)


def backtest_naive_forecasts(
    daily: DataFrame,
    key_col: str,
    day_col: str,
    value_col: str,
    season: int = 7,
) -> DataFrame:
    """Backtest the two canonical forecasting BASELINES — seasonal naive
    (ŷ(d) = y(d − season)) and naive-1 (ŷ(d) = y(d − 1)) — over an
    integer-lattice daily series. Any real forecasting effort must beat
    these to justify itself, which makes this backtest the first query
    of every forecast project; on a data platform it doubles as a
    seasonality DETECTOR (seasonal-naive MAE ≪ naive-1 MAE ⇒ strong
    weekly structure).

    Fairness: errors are scored only on days where BOTH lagged values
    exist (inner three-way join on the per-key calendar), so the two
    baselines face the identical day set. The inputs join on derived
    day keys — no densify needed, a missing day simply contributes no
    scored row (document the semantics; LOCF-fill first if you want
    gaps scored).

    Determinism: with integer ``value_col`` the absolute errors and
    their sums are exact int64; the two MAEs are single IEEE divisions.
    Scale: ``daily`` is key × days sized (already aggregated); the two
    self-joins are on (key, day) equi-keys and broadcast at any
    realistic calendar size. Output: ``(key, n_days, sae_seasonal,
    sae_naive1, mae_seasonal, mae_naive1)``."""
    a = daily.select(
        F.col(key_col).alias("_k"), F.col(day_col).alias("_d"), F.col(value_col).alias("_y")
    )
    s = daily.select(
        F.col(key_col).alias("_k"),
        F.date_add(F.col(day_col), season).alias("_d"),
        F.col(value_col).alias("_ys"),
    )
    p = daily.select(
        F.col(key_col).alias("_k"),
        F.date_add(F.col(day_col), 1).alias("_d"),
        F.col(value_col).alias("_yp"),
    )
    scored = a.join(s, ["_k", "_d"]).join(p, ["_k", "_d"])
    return (
        scored.groupBy(F.col("_k").alias(key_col))
        .agg(
            F.count("*").cast("long").alias("n_days"),
            F.sum(F.abs(F.col("_y") - F.col("_ys"))).cast("long").alias("sae_seasonal"),
            F.sum(F.abs(F.col("_y") - F.col("_yp"))).cast("long").alias("sae_naive1"),
        )
        .select(
            key_col,
            "n_days",
            "sae_seasonal",
            "sae_naive1",
            (F.col("sae_seasonal").cast("double") / F.col("n_days").cast("double")).alias(
                "mae_seasonal"
            ),
            (F.col("sae_naive1").cast("double") / F.col("n_days").cast("double")).alias(
                "mae_naive1"
            ),
        )
    )


def _microcents_checked(value_col: str, max_factor: Column) -> Column:
    """Conversion value on the exact integer MICRO-CENTS grid, with the
    grid's preconditions ENFORCED in the value path (r13, ADVICE): the
    ``(a - a%b)/b`` integral division the attribution models use is
    exact only for non-negative operands whose product stays under 2^53
    — a negative conversion value (refund/chargeback row) or an
    out-of-bound product would silently diverge from the oracle's ``//``
    by a microcent instead of failing. ``assert_true`` raises loudly on
    violation; being coalesced INTO the micro-cents column, it can never
    be pruned away. ``max_factor`` is the largest multiplier later
    applied to the micro value before a division (the preceding-touch
    count for these models); the bound compare runs in double so it
    cannot itself overflow int64. NULL values pass through as NULL
    (no conversion value -> no credit), matching both engines."""
    raw = F.col(value_col)
    micro = F.floor(raw * 100).cast("long") * F.lit(1_000_000)
    in_bound = (
        micro.cast("double") * F.greatest(max_factor, F.lit(1)).cast("double")
    ) < F.lit(float(2**53))
    # Two separate assertions so the failure names its cause (r14,
    # ADVICE): a negative value is usually a REFUND/CHARGEBACK row — a
    # normal occurrence in conversion data that the caller must handle
    # upstream, not a grid-arithmetic bug — so its message says exactly
    # that and how to proceed.  Both stay coalesced into the value column
    # (never prunable); assert_true returns NULL when its condition holds.
    neg_msg = F.concat(
        F.lit(
            "attribution input has a NEGATIVE conversion value (a "
            "refund/chargeback row): value="
        ),
        raw.cast("string"),
        F.lit(
            ". The micro-cent credit grid models non-negative revenue "
            "only - pre-filter refund rows (value >= 0) or net them out "
            "per conversion before attribution."
        ),
    )
    bound_msg = F.concat(
        F.lit(
            "attribution micro-cent grid violated: credit product >= "
            "2^53 for value="
        ),
        raw.cast("string"),
    )
    ok_sign = raw.isNull() | (raw >= 0)
    ok_bound = raw.isNull() | ~ok_sign | in_bound
    return F.coalesce(
        F.assert_true(ok_sign, neg_msg).cast("long"),
        F.assert_true(ok_bound, bound_msg).cast("long"),
        micro,
    )


def last_touch_attribution(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    value_col: str = "value",
    conversion_type: str = "purchase",
    touch_types: tuple[str, ...] = ("click", "view", "signup"),
    model: str = "last",
) -> DataFrame:
    """Last-touch revenue attribution (r11; contract row q_attribution
    since r12): every conversion event credits its revenue to the
    MOST RECENT preceding touch event of the same user (``model='last'``,
    the standard marketing-attribution baseline) or the EARLIEST one
    (``model='first'`` — same plan, ``first(ignorenulls)`` over the same
    frame); the equal-split multi-touch model is
    ``linear_touch_attribution`` (r12 — conditional-count windows over
    the same frame).

    Plan: ONE per-user window ordered by the (ts, id) total order (the
    id tiebreak makes simultaneous events deterministic) carrying
    ``last(touch_type, ignorenulls=True)`` over [unbounded preceding,
    current row); conversions with no preceding touch land in the
    ``'direct'`` bucket rather than dropping (unattributed revenue must
    stay visible — silently dropping it overstates every channel).
    Revenue on the exact cents grid. One hash exchange on the user key
    — the same single shuffle any per-key window costs; the output is
    |touch_types|+1 rows.

    Output: ``(touch, n_conversions, attributed_cents)``."""
    if model not in ("last", "first"):
        raise ValueError(f"model must be 'last' or 'first', got {model!r}")
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(
        F.col(type_col).isin(*touch_types), F.col(type_col)
    )
    # first-touch = the EARLIEST preceding touch: same frame, first()
    carried = (
        F.last(touch, ignorenulls=True).over(w)
        if model == "last"
        else F.first(touch, ignorenulls=True).over(w)
    )
    conv = (
        events.withColumn("__touch", carried)
        .where(F.col(type_col) == conversion_type)
        .select(
            F.coalesce(F.col("__touch"), F.lit("direct")).alias("touch"),
            F.floor(F.col(value_col) * 100).cast("long").alias("__cents"),
        )
    )
    return conv.groupBy("touch").agg(
        F.count("*").cast("long").alias("n_conversions"),
        F.sum("__cents").cast("long").alias("attributed_cents"),
    )


def linear_touch_attribution(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    value_col: str = "value",
    conversion_type: str = "purchase",
    touch_types: tuple[str, ...] = ("click", "view", "signup"),
) -> DataFrame:
    """LINEAR (equal-split multi-touch) revenue attribution — the r12
    completion of ``last_touch_attribution``'s model family: every
    conversion splits its revenue EQUALLY over all preceding touches of
    the same user, so a channel's credit is proportional to its share
    of the touch history, not just its position.

    Exactness: credit is computed on the integer MICRO-CENTS grid —
    per conversion and touch type, ``(cents · 10⁶ · n_type) div n_all``
    (integral division of exact int64s; all operands positive, so Spark
    ``div`` ≡ DuckDB ``//`` and the driver hash-compares). A float
    ``value/n`` would make the aggregate order-dependent across
    engines. Bound: cents ≤ ~10⁴, ×10⁶ ×touch-count ≤ 10³ → ≤ 10¹³,
    far under 2⁶³.

    Plan: |touch_types| conditional COUNT windows over the SAME
    [unbounded, -1) per-user frame the last/first models use — one hash
    exchange on the user key, no joins, no touch-row explosion (the
    naive per-(conversion, touch) pair join is quadratic per user; the
    per-TYPE split only needs the preceding counts). Conversions with
    no preceding touch keep their full revenue in ``'direct'``.

    Output: ``(touch, n_conversions, attributed_microcents)`` —
    ``n_conversions`` counts conversions that credited the touch type
    (every conversion for 'direct' rows appears exactly once there).

    Reference parity: none (the reference has no attribution); SURVEY
    §2.11 extension."""
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cnts = {
        t: F.count(F.when(F.col(type_col) == t, True)).over(w) for t in touch_types
    }
    conv = events.withColumns(
        {f"__c_{t}": c for t, c in cnts.items()}
    ).where(F.col(type_col) == conversion_type)
    n_all = None
    for t in touch_types:
        n_all = F.col(f"__c_{t}") if n_all is None else n_all + F.col(f"__c_{t}")
    micro = _microcents_checked(value_col, n_all)

    def idiv(a, b):
        # exact integral division of positive int64s without leaving the
        # Column algebra: a - a%b is an exact multiple of b, and the
        # double division of exact integers ≤ 2^53 is exact — a bare
        # a/b could round UP across an integer boundary and disagree
        # with the oracle's `//` by one microcent
        return ((a - a % b) / b).cast("long")

    legs = [
        F.struct(
            F.lit(t).alias("touch"),
            F.when(
                n_all > 0, idiv(micro * F.col(f"__c_{t}"), n_all)
            ).alias("credit"),
            (F.col(f"__c_{t}") > 0).alias("touched"),
        )
        for t in touch_types
    ]
    legs.append(
        F.struct(
            F.lit("direct").alias("touch"),
            F.when(n_all == 0, micro).alias("credit"),
            (n_all == 0).alias("touched"),
        )
    )
    melted = conv.select(F.explode(F.array(*legs)).alias("leg")).select(
        F.col("leg.touch").alias("touch"),
        F.col("leg.credit").alias("credit"),
        F.col("leg.touched").alias("touched"),
    )
    return (
        melted.where(F.col("touched"))
        .groupBy("touch")
        .agg(
            F.count("*").cast("long").alias("n_conversions"),
            F.sum("credit").cast("long").alias("attributed_microcents"),
        )
    )


def position_touch_attribution(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    value_col: str = "value",
    conversion_type: str = "purchase",
    touch_types: tuple[str, ...] = ("click", "view", "signup"),
) -> DataFrame:
    """POSITION-BASED (U-shaped, 40/20/40) attribution — the fourth and
    last standard model (after last/first/linear): the FIRST touch gets
    40% of a conversion's revenue, the LAST 40%, and the middle touches
    split the remaining 20% equally. Standard degenerate conventions:
    one touch takes 100%, two touches split 50/50, none stays 'direct'.

    Exactness (the ``linear_touch_attribution`` discipline): per
    conversion and type, each share is an integral division on the
    micro-cents grid — ``(micro·2) div 5`` per end slot, ``(micro·m_t)
    div (5·(n−2))`` for the middle pool (m_t = middle touches of type t
    = count_t − [first=t] − [last=t]) — via the exact-multiple
    ``(a − a%b)/b`` form, so Spark and the DuckDB ``//`` oracle agree
    to the microcent. Sub-microcent floor remainders are dropped, never
    redistributed (documented, matches the linear model).

    Plan: the SAME single per-user frame as every other model — two
    carried values (first/last ignorenulls) + |touch_types| conditional
    counts; one hash exchange, no joins. Output: ``(touch,
    n_conversions, attributed_microcents)``; ``n_conversions`` counts
    conversions where the type appears anywhere in the history."""
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(F.col(type_col).isin(*touch_types), F.col(type_col))
    first_t = F.first(touch, ignorenulls=True).over(w)
    last_t = F.last(touch, ignorenulls=True).over(w)
    cnts = {
        t: F.count(F.when(F.col(type_col) == t, True)).over(w) for t in touch_types
    }
    conv = (
        events.withColumn("__ft", first_t)
        .withColumn("__lt", last_t)
        .withColumns({f"__c_{t}": c for t, c in cnts.items()})
        .where(F.col(type_col) == conversion_type)
    )
    n_all = None
    for t in touch_types:
        n_all = F.col(f"__c_{t}") if n_all is None else n_all + F.col(f"__c_{t}")
    micro = _microcents_checked(value_col, n_all)

    def idiv(a, b):
        return ((a - a % b) / b).cast("long")

    legs = []
    for t in touch_types:
        is_f = (F.col("__ft") == t).cast("long")
        is_l = (F.col("__lt") == t).cast("long")
        m_t = F.col(f"__c_{t}") - is_f - is_l
        credit = (
            F.when(n_all == 1, micro * is_f)
            .when(n_all == 2, idiv(micro, F.lit(2)) * (is_f + is_l))
            .when(
                n_all >= 3,
                idiv(micro * F.lit(2), F.lit(5)) * (is_f + is_l)
                + idiv(micro * m_t, F.lit(5) * (n_all - 2)),
            )
        )
        legs.append(
            F.struct(
                F.lit(t).alias("touch"),
                credit.alias("credit"),
                (F.col(f"__c_{t}") > 0).alias("touched"),
            )
        )
    legs.append(
        F.struct(
            F.lit("direct").alias("touch"),
            F.when(n_all == 0, micro).alias("credit"),
            (n_all == 0).alias("touched"),
        )
    )
    melted = conv.select(F.explode(F.array(*legs)).alias("leg")).select(
        F.col("leg.touch").alias("touch"),
        F.col("leg.credit").alias("credit"),
        F.col("leg.touched").alias("touched"),
    )
    return (
        melted.where(F.col("touched"))
        .groupBy("touch")
        .agg(
            F.count("*").cast("long").alias("n_conversions"),
            F.sum("credit").cast("long").alias("attributed_microcents"),
        )
    )
