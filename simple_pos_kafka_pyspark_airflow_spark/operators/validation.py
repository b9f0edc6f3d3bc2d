"""Event validation — the reference producer's gate, composed.

The reference validates a POS sale interactively before publishing
(``kafka_producer.py:118-137``): every field present (:120), the product
exists and has sufficient stock (:69-85 via ``out_of_stock``), and edits/
removes must reference an existing sale while adds must not collide
(``is_data``/``is_sales_data``, :41-58). Each rule is a driver-side pandas
scan there; here the whole gate is ONE annotated projection + two keyed
joins, and rejected events keep their per-rule bits and a first-failure
reason — the dead-letter discipline of ``streaming.pipeline.corrupt_events``
applied to semantic validation.

Scale: the product lookup is a broadcast join (dimension-sized); the
duplicate guard is a left-semi-shaped join on the sale id (co-located when
the sales table is bucketed by id). Rule evaluation itself is codegen —
no Python, no per-rule scans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: reference-required sale fields (kafka_producer.py:120)
REQUIRED_SALE_FIELDS = ("customer_id", "product_id", "quantity", "price", "payment_method")


def validate_sale_events(
    events: DataFrame,
    products: DataFrame,
    existing_sales: DataFrame | None = None,
    product_key: str = "product_id",
    stock_col: str = "stock_level",
    sale_key: str = "sale_id",
    required: tuple[str, ...] = REQUIRED_SALE_FIELDS,
) -> DataFrame:
    """Annotate sale events with validation rule bits and a verdict.

    Output adds one boolean per rule, ``valid`` (their conjunction) and
    ``reject_reason`` (first failing rule's name, null when valid):

    - ``has_<field>`` per required field (reference :120);
    - ``known_product`` / ``in_stock`` — product exists and
      ``quantity <= stock_level`` (reference ``out_of_stock``, :69-85);
    - ``fresh_sale_id`` — the sale id is not already taken (reference
      duplicate guard, :41-58); skipped when ``existing_sales`` is None.

    Filter ``valid`` for the accept path and ``~valid`` for the
    quarantine path — both read the same annotated frame.
    """
    dim = (
        products.select(F.col(product_key), F.col(stock_col).alias("__stock"))
        .dropDuplicates([product_key])
        .withColumn("__known", F.lit(True))
    )
    out = events.join(F.broadcast(dim), on=product_key, how="left")

    rules: dict[str, F.Column] = {}
    for c in required:
        rules[f"has_{c}"] = F.col(c).isNotNull()
    # join-presence flag, NOT `__stock IS NOT NULL`: a product that exists
    # with NULL stock_level (nullable per schema) is a KNOWN product with
    # indeterminate stock — the stock probe must not decide existence
    rules["known_product"] = F.coalesce(F.col("__known"), F.lit(False))
    rules["in_stock"] = F.coalesce(F.col("quantity") <= F.col("__stock"), F.lit(False))

    if existing_sales is not None:
        taken = existing_sales.select(
            F.col(sale_key).alias("__taken_id"), F.lit(True).alias("__taken")
        ).dropDuplicates(["__taken_id"])
        out = out.join(taken, out[sale_key] == taken["__taken_id"], "left").drop("__taken_id")
        rules["fresh_sale_id"] = F.col("__taken").isNull()

    for name, cond in rules.items():
        out = out.withColumn(name, cond)
    valid = F.lit(True)
    for name in rules:
        valid = valid & F.col(name)
    reason = F.lit(None).cast("string")
    for name in reversed(list(rules)):  # first failing rule wins
        reason = F.when(~F.col(name), F.lit(name)).otherwise(reason)
    return (
        out.withColumn("valid", valid)
        .withColumn("reject_reason", reason)
        .drop("__stock", "__taken", "__known")
    )


def group_moments(
    df: DataFrame, value_col: str = "value", group_col: str = "event_type"
) -> DataFrame:
    """The (group, _mu, _sd) reference table ``anomaly_gate`` consumes:
    one partial-aggregable shuffle to a group-cardinality-sized result.
    Computed batch-side over the landed corpus; refresh on a maintenance
    cadence, not per event."""
    return df.groupBy(group_col).agg(
        F.avg(value_col).alias("_mu"), F.stddev_pop(value_col).alias("_sd")
    )


def anomaly_gate(
    df: DataFrame,
    moments: DataFrame,
    value_col: str = "value",
    group_col: str = "event_type",
    z_threshold: float = 3.0,
) -> DataFrame:
    """Per-group z-score outlier gate; one implementation for batch sweeps
    (``q_anomaly_zscore``) and live streams alike.

    The moment table broadcasts under the scan (or under every micro-batch
    on a stream — a stateless stream-static join: no aggregation state, no
    watermark, no output-mode conflict with row-level append alerts; the
    batch/stream split IS the production monitoring shape, moments on a
    refresh cadence, the gate at ingest latency). Never a window over the
    group key, which would shuffle every row and serialize each group
    through one reducer.

    Returns the anomalous rows with ``z`` (4 dp — rounded BEFORE the
    threshold compare, so engines agree on the boundary; same
    canonicalization as the contract oracle).
    """
    z = F.round((F.col(value_col) - F.col("_mu")) / F.col("_sd"), 4)
    return (
        df.join(F.broadcast(moments), group_col)
        .where(F.col("_sd") > 0)
        .withColumn("z", z)
        .where(F.abs(F.col("z")) > z_threshold)
        .drop("_mu", "_sd")
    )


def value_histogram(
    df: DataFrame,
    value_col: str = "value",
    group_col: str = "event_type",
    n_bins: int = 10,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Per-group fixed-width histogram: (group, bin, n, frac). The bin
    range defaults to the frame's global [min, max] (one cheap agg);
    pass ``lo``/``hi`` explicitly when histogramming a LIVE batch against
    a reference distribution — both sides must share the bin edges or
    the comparison is meaningless. Values outside [lo, hi] clamp into the
    edge bins so a drifted tail is visible rather than dropped.

    One partial-aggregable shuffle of (group, bin) pairs — group-cardinality
    × n_bins result rows, never a per-row shuffle."""
    if lo is None or hi is None:
        if df.isStreaming:
            raise ValueError(
                "value_histogram on a stream needs explicit lo/hi (the "
                "reference distribution's edges) — a global min/max agg "
                "cannot run inside a micro-batch plan, and per-batch edges "
                "would make histograms incomparable across batches anyway"
            )
        row = df.agg(
            F.min(value_col).alias("_lo"), F.max(value_col).alias("_hi")
        ).first()
        if row["_lo"] is None or row["_hi"] is None:
            raise ValueError(
                f"value_histogram: cannot derive bin edges — {value_col!r} has "
                "no non-null values (empty frame or all-null column); pass "
                "lo/hi explicitly (e.g. the reference distribution's edges)"
            )
        lo = float(row["_lo"]) if lo is None else lo
        hi = float(row["_hi"]) if hi is None else hi
    width = (hi - lo) / n_bins if hi > lo else 1.0
    bin_col = F.least(
        F.lit(n_bins - 1),
        F.greatest(F.lit(0), F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width))),
    ).cast("int")
    counts = (
        df.withColumn("bin", bin_col)
        .groupBy(group_col, "bin")
        .agg(F.count("*").alias("n"))
    )
    totals = counts.groupBy(group_col).agg(F.sum("n").alias("_total"))
    return counts.join(totals, group_col).select(
        group_col, "bin", "n", (F.col("n") / F.col("_total")).alias("frac")
    )


def equidepth_histogram(
    df: DataFrame,
    value_col: Column,
    group_col: str,
    tiebreak_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Per-group EQUI-DEPTH histogram: ``n_bins`` bins of (near-)equal
    row count with their actual value ranges — the summary
    ``value_histogram``'s fixed-width bins cannot give on skewed data
    (one hot bin, nine empty). Equal-depth binning IS ``ntile`` by
    definition, so the operator is the window: ntile over (value,
    tiebreak) per group, then a partial-aggregable (group, bin) rollup
    to (lo, hi, n).

    ``value_col`` should be an integer-grid column (cents) so lo/hi
    hash-compare exactly; ``tiebreak_col`` totalizes the order (ties at
    a bin boundary would otherwise split nondeterministically). Scale:
    one per-group sort exchange (any exact quantile pays this; the
    approx path is approx_percentile — see q_approx_percentile_sketch)
    plus a six-numbers-per-bin rollup. Output: (group, bin 1..n_bins,
    lo, hi, n)."""
    w = Window.partitionBy(group_col).orderBy(value_col, F.col(tiebreak_col))
    binned = df.select(
        F.col(group_col),
        value_col.alias("_v"),
        F.ntile(n_bins).over(w).alias("bin"),
    )
    return binned.groupBy(group_col, "bin").agg(
        F.min("_v").alias("lo"),
        F.max("_v").alias("hi"),
        F.count("*").alias("n"),
    )


def psi_drift(
    reference: DataFrame,
    current: DataFrame,
    group_col: str = "event_type",
    eps: float = 1e-4,
    grid: float | None = None,
) -> DataFrame:
    """Population Stability Index per group between two histograms from
    ``value_histogram`` (MUST share lo/hi/n_bins — pass them explicitly
    when building the current side): PSI = Σ_bins (p - q)·ln(p/q) with
    empty bins floored at ``eps``. Rule of thumb: < 0.1 stable, 0.1-0.25
    drifting, > 0.25 action needed.

    A full-outer join on (group, bin) keeps bins that are empty on either
    side — exactly the bins where drift lives. Output: (group, psi,
    n_bins_compared); cost is group-cardinality × n_bins rows end-to-end,
    so this runs per micro-batch without touching the corpus.

    ``grid`` (e.g. ``1e6``): snap each (non-negative) PSI term to a 1/grid
    integer lattice before summing — the sum becomes exact 64-bit
    arithmetic, order-free and bit-identical across engines and cluster
    sizes (the ``token_entropy`` determinism discipline). Default ``None``
    keeps the plain float sum (fine for monitoring; not for
    hash-compared cross-engine contracts)."""
    p = reference.select(
        group_col, "bin", F.col("frac").alias("_p")
    )
    q = current.select(group_col, "bin", F.col("frac").alias("_q"))
    joined = p.join(q, [group_col, "bin"], "full_outer").select(
        group_col,
        F.coalesce("_p", F.lit(0.0)).alias("_p"),
        F.coalesce("_q", F.lit(0.0)).alias("_q"),
    )
    pe = F.greatest(F.col("_p"), F.lit(eps))
    qe = F.greatest(F.col("_q"), F.lit(eps))
    term = (pe - qe) * F.log(pe / qe)
    if grid is not None:
        # Terms are ≥ 0 ((p−q) and ln(p/q) share sign), so Spark's
        # HALF_UP and DuckDB's round-half-away agree on every snap.
        snapped = F.round(term * F.lit(grid), 0).cast("long")
        return joined.groupBy(group_col).agg(
            (F.sum(snapped).cast("double") / F.lit(grid)).alias("psi"),
            F.count("*").cast("int").alias("n_bins_compared"),
        )
    return joined.groupBy(group_col).agg(
        F.sum(term).alias("psi"), F.count("*").cast("int").alias("n_bins_compared")
    )


def schema_drift(reference: DataFrame, current: DataFrame) -> dict[str, list[str]]:
    """Structural drift between two frames: columns added, removed, or
    type-changed relative to ``reference``. Pure metadata — no job runs —
    so this gates every micro-batch for free (the reference pipeline's
    implicit-pandas-columns equivalent of a CREATE TABLE contract)."""
    ref = {f.name: f.dataType.simpleString() for f in reference.schema.fields}
    cur = {f.name: f.dataType.simpleString() for f in current.schema.fields}
    return {
        "added": sorted(set(cur) - set(ref)),
        "removed": sorted(set(ref) - set(cur)),
        "type_changed": sorted(
            f"{name}: {ref[name]} -> {cur[name]}"
            for name in set(ref) & set(cur)
            if ref[name] != cur[name]
        ),
    }


def embedding_drift(
    reference: DataFrame, current: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Embedding-space drift: per-dimension mean of the reference vs the
    current batch — the encoder-regression / data-shift signal scalar
    monitors can't see (a new encoder version shifts the embedding
    distribution long before any null rate or row count moves).

    Output: (pos, mu_ref, mu_cur, shift) — one row per dimension, means
    rounded to 6 dp (the library's cross-engine float discipline: kills
    summation-order ulps) and shift their exact difference. Deliberately
    NO cross-dimension reduction in the contract surface (an L2 norm
    would re-introduce order-dependent summation); threshold downstream
    with ``max(abs(shift))`` or feed ``psi_drift`` per dimension.

    Scale: posexplode → partial-aggregable groupBy per side — two
    dim-cardinality tables joined on pos; cost is O(rows × dim) map-side
    and O(dim) after the exchange, so it runs per micro-batch."""

    def dim_means(df: DataFrame, out: str) -> DataFrame:
        return (
            df.select(F.posexplode(vec_col).alias("pos", "_v"))
            .groupBy("pos")
            .agg(F.round(F.avg(F.col("_v").cast("double")), 6).alias(out))
        )

    ref = dim_means(reference, "mu_ref")
    cur = dim_means(current, "mu_cur")
    return (
        ref.join(cur, "pos")
        .select(
            F.col("pos").cast("int").alias("pos"),
            "mu_ref",
            "mu_cur",
            (F.col("mu_cur") - F.col("mu_ref")).alias("shift"),
        )
    )


def null_rate_drift(
    reference: DataFrame, current: DataFrame, cols: list[str] | None = None
) -> DataFrame:
    """Per-column null-fraction comparison: (column, ref_rate, cur_rate,
    delta). One single-pass aggregation per frame (every column's rate in
    the same job — never a pass per column); the result is
    n_columns-sized. A jump in a column's null rate is the classic
    silent-upstream-change signal."""
    cols = cols or [c for c in reference.columns if c in set(current.columns)]
    if not cols:
        raise ValueError(
            "null_rate_drift: no columns to compare — reference and current "
            "share no column names (a disjoint rename is schema_drift's job, "
            "not a null-rate question); pass cols explicitly to override"
        )
    missing = [c for c in cols if c not in reference.columns or c not in current.columns]
    if missing:
        raise ValueError(
            f"null_rate_drift: cols {missing} absent from one side — comparing "
            "a column to nothing would read as a 0.0 rate, masking the drift "
            "it was meant to expose"
        )

    def rates(df: DataFrame) -> dict[str, float]:
        row = df.agg(
            *[F.avg(F.col(c).isNull().cast("double")).alias(c) for c in cols]
        ).first()
        return {c: (float(row[c]) if row[c] is not None else 0.0) for c in cols}

    r, c = rates(reference), rates(current)
    rows = [(name, r[name], c[name], c[name] - r[name]) for name in cols]
    return reference.sparkSession.createDataFrame(
        rows, "column string, ref_rate double, cur_rate double, delta double"
    )


def ks_drift(
    df: DataFrame,
    group_col: str,
    value_int: Column,
    is_ref: Column,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic per group — the BINLESS
    drift test: ``KS = max_x |ECDF_ref(x) − ECDF_live(x)|``, sensitive
    to shape changes PSI's fixed bins can wash out (a shift smaller
    than a bin, a variance change inside one bin). Values above ~1.36·
    √((n+m)/(n·m)) reject "same distribution" at α=5%.

    EXACT, no floats until the last step: collapse rows to per-(group,
    value) ref/live counts — one partial-aggregable shuffle, state is
    DISTINCT values per group, not rows — then running sums over the
    value order (one per-group window sort) give the ECDF numerators,
    and the sup-difference cross-multiplies: ``max |cum_ref·n_live −
    cum_live·n_ref|`` over exact int64, with denominator
    ``n_ref·n_live``. Ties are handled structurally (both ECDFs jump at
    the same grouped value row — no tiebreak needed, no order
    ambiguity). ``ks`` ships as ONE raw division of the exact ints.

    int64 bound: ``cum·n`` needs values_per_group · rows_per_side <
    2^63 — 9.2e18 covers any realistic monitoring slice; the output is
    (group, n_ref, n_live, ks_num, ks_den, ks).

    ``value_int`` must be an integer-lattice expression (cents) so
    value equality — which defines the ECDF jump points — is exact."""
    d = df.select(
        F.col(group_col),
        value_int.cast("long").alias("_v"),
        is_ref.cast("int").alias("_r"),
    )
    per_val = d.groupBy(group_col, "_v").agg(
        F.sum("_r").cast("long").alias("_a"),
        F.sum(1 - F.col("_r")).cast("long").alias("_b"),
    )
    return _ks_from_per_value_counts(per_val, group_col)


def ks_drift_counts(
    ref_counts: DataFrame,
    live_counts: DataFrame,
    group_col: str,
    value_col: str = "value",
    n_col: str = "n",
) -> DataFrame:
    """``ks_drift`` over PRE-AGGREGATED per-(group, value) count tables —
    the frozen-reference form: a monitoring reference is stored once as
    its (group, value, n) counts (bounded by DISTINCT values, not rows)
    and every live batch joins against it, so the reference rows are
    never re-shuffled per batch. Exactness and output schema are
    identical to ``ks_drift`` (pinned in tests): the full-outer join on
    (group, value) keeps values seen on only one side — exactly the
    ECDF jump points where drift lives — and the sup-difference runs on
    the same exact int64 cross-multiplication."""
    a = ref_counts.select(
        F.col(group_col),
        F.col(value_col).cast("long").alias("_v"),
        F.col(n_col).cast("long").alias("_a"),
    )
    b = live_counts.select(
        F.col(group_col),
        F.col(value_col).cast("long").alias("_v"),
        F.col(n_col).cast("long").alias("_b"),
    )
    per_val = a.join(b, [group_col, "_v"], "full_outer").select(
        group_col,
        "_v",
        F.coalesce("_a", F.lit(0)).cast("long").alias("_a"),
        F.coalesce("_b", F.lit(0)).cast("long").alias("_b"),
    )
    return _ks_from_per_value_counts(per_val, group_col)


def _ks_from_per_value_counts(per_val: DataFrame, group_col: str) -> DataFrame:
    """Shared KS core over (group, _v, _a, _b) per-value counts: running
    sums over the value order give the ECDF numerators, the sup-difference
    cross-multiplies in exact int64, and ``ks`` ships as one raw
    division."""
    w = (
        Window.partitionBy(group_col)
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(group_col)
    cum = per_val.select(
        F.col(group_col),
        F.sum("_a").over(w).alias("_ca"),
        F.sum("_b").over(w).alias("_cb"),
        F.sum("_a").over(w_all).alias("_na"),
        F.sum("_b").over(w_all).alias("_nb"),
    )
    diff = F.abs(F.col("_ca") * F.col("_nb") - F.col("_cb") * F.col("_na"))
    return (
        cum.groupBy(group_col, "_na", "_nb")
        .agg(F.max(diff).alias("ks_num"))
        .select(
            group_col,
            F.col("_na").alias("n_ref"),
            F.col("_nb").alias("n_live"),
            "ks_num",
            (F.col("_na") * F.col("_nb")).alias("ks_den"),
            # a group with either side empty has no defined KS (one ECDF
            # does not exist): NULL, never an ANSI divide-by-zero — the
            # monitor surfaces such groups via n_ref/n_live = 0
            (
                F.col("ks_num").cast("double")
                / F.nullif((F.col("_na") * F.col("_nb")).cast("double"), F.lit(0.0))
            ).alias("ks"),
        )
    )


def fk_violations(
    child: DataFrame,
    parent: DataFrame,
    fk_col: str,
    pk_col: str | None = None,
) -> DataFrame:
    """Referential-integrity audit: child rows whose foreign key matches
    no parent primary key — the orphan scan every warehouse load should
    gate on (the reference's pipelines assume FK integrity implicitly;
    this makes the check a first-class, pushdown-friendly operator).

    One anti-join on the key (broadcast when the parent's key column is
    small, AQE's call otherwise); NULL foreign keys are reported
    separately from dangling ones — a NULL FK is usually a modeling
    choice while a dangling value is corruption, and an anti-join alone
    would conflate them (NULL never equi-matches). Output: one row per
    violation with ``reason`` ∈ {'null_fk', 'dangling_fk'} plus the
    offending key value; aggregate downstream for counts, keep raw for
    quarantine sinks."""
    pk = pk_col or fk_col
    nulls = child.where(F.col(fk_col).isNull()).select(
        F.col(fk_col).alias("fk_value"), F.lit("null_fk").alias("reason")
    )
    dangling = (
        child.where(F.col(fk_col).isNotNull())
        .join(parent.select(F.col(pk).alias(fk_col)), fk_col, "left_anti")
        .select(F.col(fk_col).alias("fk_value"), F.lit("dangling_fk").alias("reason"))
    )
    return nulls.unionByName(dangling)


def k_anonymity_audit(df: DataFrame, qid_cols: list[str], k: int = 5) -> DataFrame:
    """k-anonymity audit over a quasi-identifier combination (Sweeney
    2002): every row whose QID equivalence class has fewer than ``k``
    members is a re-identification risk — the structural-privacy
    companion of the pattern-level PII scan (``q_text_redact``), and the
    gate a training-data release runs before shipping event/metadata
    tables.

    One partial-aggregable groupBy builds the equivalence classes (state
    = distinct QID combinations, not rows), then a single global
    aggregate folds them to one exact-integer summary row:

    - ``n_classes``      — distinct QID combinations observed
    - ``n_risky_classes``— classes with size < k
    - ``rows_at_risk``   — total rows inside risky classes
    - ``min_class_size`` — the worst class (1 = someone is unique)
    - ``k_anonymous``    — 1 iff min_class_size ≥ k (the release gate)

    All counts are exact int64; no float ever appears, so the audit is
    bit-identical across engines and cluster sizes. At 100 TB the
    second aggregate's input is the class table — bounded by QID
    cardinality — and the summary shape means the operator never ships
    the (potentially sensitive) risky classes themselves; drill-down is
    a deliberate second query."""
    classes = df.groupBy(*[F.col(c) for c in qid_cols]).agg(
        F.count("*").cast("long").alias("class_size")
    )
    return k_anonymity_summary(classes, "class_size", k)


def k_anonymity_summary(classes: DataFrame, size_col: str, k: int) -> DataFrame:
    """Fold a pre-built equivalence-class table ``(..., size_col)`` to the
    one-row k-anonymity summary — shared by the batch operator above and
    the ingest-time ``streaming.corpus.IncrementalQidIndex`` (which
    maintains the class counts incrementally), so the streaming audit is
    pinned to EXACTLY this aggregation."""
    risky = F.col(size_col) < k
    return classes.agg(
        F.count("*").cast("long").alias("n_classes"),
        F.sum(F.when(risky, 1).otherwise(0)).cast("long").alias("n_risky_classes"),
        F.sum(F.when(risky, F.col(size_col)).otherwise(F.lit(0)))
        .cast("long")
        .alias("rows_at_risk"),
        F.min(size_col).cast("long").alias("min_class_size"),
        F.when(F.min(size_col) >= k, F.lit(1)).otherwise(F.lit(0))
        .cast("int")
        .alias("k_anonymous"),
    )


#: Benford first-digit expected shares, scaled by 1e9 and floored to
#: integer LITERALS — floor(1e9·log10(1 + 1/d)) for d = 1..9, precomputed
#: once (per-engine log10 is last-ulp libm; the literal grid is the same
#: discipline as textops.NDCG_WEIGHTS_10).
BENFORD_SHARES_E9: tuple[int, ...] = (
    301_029_995,
    176_091_259,
    124_938_736,
    96_910_013,
    79_181_246,
    66_946_789,
    57_991_946,
    51_152_522,
    45_757_490,
)


def benford_audit(df: DataFrame, amount_cents) -> DataFrame:
    """Benford's-law first-digit audit of a money column — the classic
    fabricated-numbers detector (naturally-occurring multiplicative
    amounts follow P(d) = log10(1 + 1/d); invented ones cluster on 1s,
    5s and round numbers), run as a data-quality gate over any amount
    column before it feeds revenue aggregates.

    ``amount_cents`` must be an integer-lattice Column (cents). The
    first significant digit is taken from the INTEGER'S DECIMAL STRING
    (``substring(cast(x as string), 1, 1)``) — exact on every engine,
    where the arithmetic route (``x / 10^floor(log10 x)``) can misbucket
    a value sitting one ulp under a power of ten differently per libm.
    Zero and NULL amounts are excluded (they have no first digit);
    negatives audit by magnitude.

    One partial-aggregable digit groupBy (9 rows of state), a broadcast
    total, and per-digit deviation against the precomputed
    ``BENFORD_SHARES_E9`` literal grid — ``dev_e9 = n_d·1e9/n − share``
    as ONE fixed IEEE tree per row (no cross-row float sum: the 9 rows
    ship individually, the consumer picks its own distance). Output:
    ``(digit, n_d, n, expected_e9, dev_e9)``."""
    cents = F.abs(amount_cents.cast("long"))
    d = (
        df.select(cents.alias("_c"))
        .where(F.col("_c").isNotNull() & (F.col("_c") > 0))
        .select(F.substring(F.col("_c").cast("string"), 1, 1).cast("int").alias("digit"))
    )
    counts = d.groupBy("digit").agg(F.count("*").cast("long").alias("n_d"))
    tot = counts.agg(F.sum("n_d").cast("long").alias("n"))
    expected = F.element_at(
        F.array(*[F.lit(s) for s in BENFORD_SHARES_E9]), F.col("digit")
    ).cast("long")
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n_d",
            "n",
            expected.alias("expected_e9"),
            (
                F.col("n_d").cast("double") * F.lit(1_000_000_000.0) / F.col("n").cast("double")
                - expected.cast("double")
            ).alias("dev_e9"),
        )
    )


def l_diversity_audit(
    df: DataFrame, qid_cols: list[str], sensitive_col: str, l: int = 3
) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007) — the attack
    k-anonymity misses: a QID class can be large (k-anonymous) yet have
    every member sharing ONE sensitive value, so membership alone
    discloses the attribute. Each class must carry ≥ l DISTINCT
    sensitive values.

    One exact groupBy(QID) with ``count_distinct(sensitive)`` (state =
    distinct sensitive values per class — bounded by the sensitive
    domain, the same envelope as the class count), folded to the same
    never-ship-the-classes one-row summary as ``k_anonymity_audit``:

    ``(n_classes, n_low_diversity, rows_at_risk, min_diversity,
    l_diverse)`` — all exact int64, gate bit 1 iff every class has ≥ l
    distinct sensitive values. Run it WITH the k-audit: the two gates
    bound different attacks and a release needs both."""
    classes = df.groupBy(*[F.col(c) for c in qid_cols]).agg(
        F.count("*").cast("long").alias("class_size"),
        F.count_distinct(F.col(sensitive_col)).cast("long").alias("n_sensitive"),
    )
    low = F.col("n_sensitive") < l
    return classes.agg(
        F.count("*").cast("long").alias("n_classes"),
        F.sum(F.when(low, 1).otherwise(0)).cast("long").alias("n_low_diversity"),
        F.sum(F.when(low, F.col("class_size")).otherwise(F.lit(0)))
        .cast("long")
        .alias("rows_at_risk"),
        F.min("n_sensitive").cast("long").alias("min_diversity"),
        F.when(F.min("n_sensitive") >= l, F.lit(1)).otherwise(F.lit(0))
        .cast("int")
        .alias("l_diverse"),
    )
