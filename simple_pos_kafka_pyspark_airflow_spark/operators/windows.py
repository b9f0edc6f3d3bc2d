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


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap: str,
    tiebreak: str,
    out: str = "sess_id",
) -> DataFrame:
    """Gap-based sessionization (batch): a new session starts when the gap
    to the previous event of the same key exceeds ``gap`` (SQL interval
    string). Adds an ``out`` column numbering sessions 1..k per key.

    The classic one-shuffle shape: lag over (key, ts) marks session starts,
    a running sum over the same window numbers them — both windows share
    one sort, so the whole op is a single exchange on ``key``. This is the
    batch equivalent of Structured Streaming's ``session_window`` (see
    streaming/windows.session_agg) and scales to any key cardinality;
    a single key's events serialize within its partition, which is
    inherent to the semantics.

    ``tiebreak`` makes the per-key order total when timestamps collide, so
    session numbering is deterministic and oracle-comparable.
    """
    w = Window.partitionBy(key).orderBy(ts, tiebreak)
    gap_expr = F.expr(f"INTERVAL {gap}")
    prev_ts = F.lag(ts).over(w)
    # two steps: a window function can't nest inside another window's
    # aggregate; both windows share (partition, order) → one sort pass
    marked = df.withColumn(
        "__new", (prev_ts.isNull() | (F.col(ts) > prev_ts + gap_expr)).cast("int")
    )
    return marked.withColumn(
        out,
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("int"),
    ).drop("__new")


def event_transitions(
    df,
    key_col: str,
    ts_col: str,
    state_col: str,
    tiebreak_col: str,
):
    """First-order Markov transition matrix over per-key event sequences:
    order each key's events by (ts, tiebreak), pair each event with its
    predecessor's state (``lag``), and count transitions; ``p`` is the
    row-normalized probability (count / out-degree of the source state).

    Output: ``(prev_state, next_state, n, p)`` — the sequence-statistics
    twin of the funnel query (which asks "did A→B→C happen per user";
    this asks "how does the population move between states").

    Scale: one per-key window shuffle for the lag (same exchange any
    sessionization pays), then a partial-aggregable count on the
    (prev, next) pair — state-pair cardinality is |states|², tiny.
    Determinism: ``p`` is ONE division of exact integer counts — a
    correctly-rounded IEEE op, bit-identical across engines, shipped RAW
    (the library never ROUNDs a quotient: Spark's HALF_UP-on-BigDecimal
    vs DuckDB's multiply-then-round diverge exactly there)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    pairs = (
        df.select(
            F.col(key_col),
            F.lag(state_col).over(w).alias("prev_state"),
            F.col(state_col).alias("next_state"),
        )
        .where(F.col("prev_state").isNotNull())
        .groupBy("prev_state", "next_state")
        .agg(F.count("*").cast("long").alias("n"))
    )
    outdeg = pairs.groupBy("prev_state").agg(F.sum("n").alias("_tot"))
    return pairs.join(outdeg, "prev_state").select(
        "prev_state",
        "next_state",
        "n",
        (F.col("n").cast("double") / F.col("_tot").cast("double")).alias("p"),
    )


def rolling_distinct(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    window_days: int = 7,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Rolling N-day distinct-key count per day (the "7-day active users"
    metric): for every day with data, how many distinct keys appeared in
    the trailing ``window_days`` ending that day.

    Distinct counts do NOT decompose over window frames (yesterday's
    window and today's overlap but can't be subtracted), so the exact
    formulation is contribute-then-count: dedup to (day, key) — one
    partial-aggregable shuffle that collapses the fact table to active
    pairs — then each pair contributes to the ≤ ``window_days`` windows
    it falls in (``sequence`` + ``explode``, executor-side) and a second
    distinct count per window day. Cost: O(active pairs × window_days),
    independent of the raw event count — the fact table never explodes,
    only the deduped pair table does. Output days are restricted to days
    that actually have data (calendar densification is ``densify``'s
    job, composable).

    At 100 TB the same shape runs SKETCHED: per-day HLL sketches
    (``hll_sketch_agg``, one row per day) merged across each trailing
    window with ``hll_union_agg`` — q_sketch_shards' discipline; use it
    when pairs×window_days is itself too large. Returns
    (``group_cols...``, day, n_distinct)."""
    gcols = group_cols or []
    day = F.date_trunc("day", F.col(ts_col))
    pairs = df.select(*gcols, day.alias("_day"), F.col(key_col).alias("_k")).distinct()
    days_with_data = pairs.select(*gcols, "_day").distinct()
    contrib = pairs.select(
        *gcols,
        "_k",
        F.explode(
            F.sequence(
                F.col("_day"),
                F.col("_day") + F.expr(f"INTERVAL {int(window_days) - 1} DAYS"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("_wday"),
    )
    dwd = days_with_data.select(
        *[F.col(c).alias(f"__g_{c}") for c in gcols], F.col("_day").alias("__wd")
    )
    cond = contrib["_wday"] == dwd["__wd"]
    for c in gcols:
        cond = cond & (contrib[c] == dwd[f"__g_{c}"])
    counted = (
        contrib.join(dwd, cond)
        .groupBy(*gcols, "_wday")
        .agg(F.count_distinct("_k").alias("n_distinct"))
    )
    return counted.select(*gcols, F.col("_wday").alias("day"), "n_distinct")


def rolling_distinct_sketch(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    window_days: int = 7,
    group_cols: list[str] | None = None,
    lg_k: int = 14,
) -> DataFrame:
    """The 100 TB form of ``rolling_distinct``: per-day HLL sketches
    (``hll_sketch_agg`` — one mergeable byte blob per (group, day))
    union-merged across each trailing window. The fact table is touched
    ONCE to build day sketches; every window after that merges a handful
    of kilobyte sketches — where the exact form's contribution explode
    scales with active (day, key) pairs × window_days, this scales with
    DAYS, full stop. Write-time sketch / query-time merge, exactly the
    q_sketch_shards discipline applied to a sliding frame.

    The trailing-window merge is a RANGE join (sketches × window days),
    so both sides are day-cardinality — bounded by calendar days ×
    groups regardless of corpus size. The day list side carries an
    explicit ``broadcast`` hint: the range condition forces a
    nested-loop join, and broadcasting the provably-bounded side pins
    it to BroadcastNestedLoopJoin (pinned in tests/test_plans.py)
    instead of leaving a statistics-estimated cartesian on the table.

    Returns (``group_cols...``, day, n_est) — estimates carry HLL's
    ~1.04/√2^lg_k relative error (0.8% at lg_k=14); the contract query
    certifies them against the exact form with a bound bit."""
    gcols = group_cols or []
    day = F.date_trunc("day", F.col(ts_col))
    sk = (
        df.select(*gcols, day.alias("_day"), F.col(key_col).alias("_k"))
        .groupBy(*gcols, "_day")
        .agg(F.hll_sketch_agg("_k", F.lit(lg_k)).alias("_sk"))
    )
    days = sk.select(*[F.col(c).alias(f"__g_{c}") for c in gcols], F.col("_day").alias("__wd"))
    cond = (days["__wd"] >= sk["_day"]) & (
        days["__wd"] <= sk["_day"] + F.expr(f"INTERVAL {int(window_days) - 1} DAYS")
    )
    for c in gcols:
        cond = cond & (sk[c] == days[f"__g_{c}"])
    return (
        sk.join(F.broadcast(days), cond)
        .groupBy(*gcols, "__wd")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("_sk")).alias("n_est"))
        .select(*gcols, F.col("__wd").alias("day"), "n_est")
    )


def rolling_corr_exact(
    df: DataFrame,
    order_col: str,
    x_int,
    y_int,
    window_rows: int = 7,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Trailing-window Pearson correlation between two integer-lattice
    series — the co-movement monitor (metric A decoupling from metric B
    is drift no single-series test sees), exact where a float-state
    rolling corr never hash-compares.

    Same discipline as ``grouped_corr_exact``/``grouped_skew_kurt``, per
    WINDOW instead of per group: the five running sums (Σx, Σy, Σxy,
    Σx², Σy²) are exact int64 over a ROWS frame (N−1 PRECEDING ..
    CURRENT — count-based, so both engines agree row-for-row even at
    the series head, where n < N), and

        corr = (n·Sxy − Sx·Sy) / (√(n·Sxx − Sx²)·√(n·Syy − Sy²))

    is evaluated as FIXED double trees over those sums (B-form products
    in DOUBLE, never int64 — the r9 ``grouped_skew_kurt`` overflow
    lesson applied from the start). Zero-variance windows yield NULL.

    One window exchange per group key; all five sums share the frame.
    ``order_col`` must be a total order within each group (one row per
    period — pre-aggregate first; ties would make frames ambiguous).

    int64 bound: the per-row cross products are the binding term —
    window_rows · max|x|·max|y| < 2^63 (daily cent sums of ~10⁵ events
    at ~10³ cents each hold to window 7 with ~100× headroom; widen the
    five sums to DECIMAL(38,0) in both engines past that).

    Output: (group_cols..., order_col, n, corr).
    """
    gcols = group_cols or []
    w = (
        Window.partitionBy(*gcols)
        .orderBy(order_col)
        .rowsBetween(-(int(window_rows) - 1), Window.currentRow)
    )
    d = df.select(
        *gcols,
        F.col(order_col),
        x_int.cast("long").alias("_x"),
        y_int.cast("long").alias("_y"),
    )
    n = F.count("*").over(w).cast("long")
    sx = F.sum("_x").over(w)
    sy = F.sum("_y").over(w)
    sxy = F.sum(F.col("_x") * F.col("_y")).over(w)
    sxx = F.sum(F.col("_x") * F.col("_x")).over(w)
    syy = F.sum(F.col("_y") * F.col("_y")).over(w)
    nd = n.cast("double")
    num = nd * sxy.cast("double") - sx.cast("double") * sy.cast("double")
    vx = nd * sxx.cast("double") - sx.cast("double") * sx.cast("double")
    vy = nd * syy.cast("double") - sy.cast("double") * sy.cast("double")
    return d.select(
        *gcols,
        order_col,
        n.alias("n"),
        (num / F.nullif(F.sqrt(vx) * F.sqrt(vy), F.lit(0.0))).alias("corr"),
    )
