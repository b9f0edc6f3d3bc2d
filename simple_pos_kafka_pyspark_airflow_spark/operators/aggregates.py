"""Aggregation operators.

Reference parity (SURVEY.md §2.5): groupBy-sum for lifetime spend
(``POS_spark_dag.py:375-376``), groupBy-count for purchase frequency
(``:405-406``), global counts as emptiness gates (``:369,399``),
``dropna().dropDuplicates()`` cleaning (``:96,310``) and the monotonic
``sale_id`` sequence from a tracker file (``kafka_consumer.py:56-79``).

The reference's ``df.rdd.isEmpty()`` anti-pattern (``POS_spark_dag.py:91``
etc.) is deliberately NOT reproduced: ``DataFrame.isEmpty()`` stays in the
optimized plan and reads at most one row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_sequence(
    df: DataFrame,
    existing: DataFrame,
    existing_id: str,
    order_by: list[str],
    out: str = "new_id",
) -> DataFrame:
    """Monotonic id assignment: new rows get ids continuing after
    ``max(existing[id_col])``.

    The reference keeps the last id in a tracker file and increments it one
    message at a time in a single consumer thread
    (``kafka_consumer.py:56-68,74-79``) — correct only because it is
    single-threaded. Distributed re-expression: one ``max()`` over the
    existing table plus ``row_number()`` over a deterministic order of the
    batch. Ids are dense and unique *per batch*; cross-batch monotonicity
    comes from re-reading the max (streaming: keyed state, see
    ``streaming/state.py``).

    Scale: ``row_number`` over a global order is a single-partition sort in
    the worst case; for 100 TB batches switch the window to a salted
    two-phase ranking or use ``monotonically_increasing_id`` when density
    is not required. Batch CDC inserts are small relative to the warehouse,
    so the global window is acceptable there.
    """
    base = existing.agg(F.coalesce(F.max(existing_id), F.lit(0)).alias("__m"))
    w = Window.orderBy(*[F.col(c) for c in order_by])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .crossJoin(F.broadcast(base))
        .withColumn(out, (F.col("__m") + F.col("__rn")).cast("long"))
        .drop("__rn", "__m")
    )


def clean(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """The reference's pre-load cleaning (``POS_spark_dag.py:96``):
    drop null rows, then exact-duplicate rows. One shuffle (the distinct);
    the na-drop is a pushed filter."""
    return df.na.drop(subset=subset).dropDuplicates()


def grouped_corr_exact(
    df: DataFrame,
    group_col: str,
    x_int,
    y_int,
) -> DataFrame:
    """Per-group Pearson correlation computed from EXACT integer moments —
    the cross-engine-deterministic alternative to ``corr()`` (whose
    streaming float accumulation is summation-order-dependent and can
    never be hash-compared across engines or even across cluster sizes).

    ``x_int`` / ``y_int`` must be integer-valued Column expressions (cast
    them onto a lattice first: quantities are ints; money → cents;
    discounts → hundredths). All five moments (Σx, Σy, Σxy, Σx², Σy²) are
    then exact int64 sums — one partial-aggregable shuffle, order-free —
    and the final

        corr = (n·Σxy − Σx·Σy) / (√(n·Σx²−(Σx)²) · √(n·Σy²−(Σy)²))

    is a fixed tree of correctly-rounded IEEE ops (casts of exact ints,
    two sqrts, one multiply, one divide) — bit-identical in any IEEE-754
    engine evaluating the same tree, so the raw double ships un-ROUNDed.

    Output: ``(group_col, n, sum_x, sum_y, sum_xy, corr)`` — the integer
    moments ride along so the oracle certifies them exactly too.
    Zero-variance groups yield NULL via NULLIF, identically in both
    engines.

    Overflow discipline: int64 holds n·Σx² for |x| ≤ 10³ out to ~10¹²
    rows per group; past that widen the moment sums to DECIMAL(38,0) in
    both engines (values < 2^53 still cast to double exactly)."""
    g = (
        df.select(
            F.col(group_col),
            x_int.cast("long").alias("_x"),
            y_int.cast("long").alias("_y"),
        )
        # pairwise-complete: a NULL in either coordinate would count in n
        # but vanish from the sums, silently corrupting every moment
        .where(F.col("_x").isNotNull() & F.col("_y").isNotNull())
        .groupBy(group_col)
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("_x").alias("sum_x"),
            F.sum("_y").alias("sum_y"),
            F.sum(F.col("_x") * F.col("_y")).alias("sum_xy"),
            F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
            F.sum(F.col("_y") * F.col("_y")).alias("_syy"),
        )
    )
    num = (F.col("n") * F.col("sum_xy") - F.col("sum_x") * F.col("sum_y")).cast("double")
    den = F.sqrt((F.col("n") * F.col("_sxx") - F.col("sum_x") * F.col("sum_x")).cast("double")) * F.sqrt(
        (F.col("n") * F.col("_syy") - F.col("sum_y") * F.col("sum_y")).cast("double")
    )
    return g.select(
        group_col,
        "n",
        "sum_x",
        "sum_y",
        "sum_xy",
        (num / F.nullif(den, F.lit(0.0))).alias("corr"),
    )


# ---------------------------------------------------------------------------
# Count-min sketch as a relational table (mergeable frequency sketch)
# ---------------------------------------------------------------------------

#: Engine-agnostic universal-hash family: h_i(k) = ((k mod P)·A_i + B_i)
#: mod P mod width. P is the classic 1e9+7 prime; multipliers are the
#: public xxHash/MurmurHash diffusion constants. Everything stays under
#: 2^63 for any bigint key ((P−1)·A_max ≈ 3.3e18), so both Spark and any
#: SQL oracle evaluate the identical integer arithmetic.
CMS_PRIME = 1_000_000_007
CMS_HASHES: list[tuple[int, int]] = [
    (2_654_435_761, 1),
    (2_246_822_519, 2),
    (3_266_489_917, 3),
    (668_265_263, 4),
]


def _pmod_col(expr, m: int):
    """Nonnegative modulo ``((x % m) + m) % m`` written as the explicit
    three-op chain (not ``F.pmod``) so generated SQL oracles can emit
    the LITERAL SAME expression on engines that lack pmod — buckets
    then land in [0, m) for ANY key sign on every engine, independent
    of each engine's sign-of-dividend convention for ``%``."""
    return ((expr % F.lit(m)) + F.lit(m)) % F.lit(m)


def _cms_bucket(key, a: int, b: int, width: int):
    k = _pmod_col(key, CMS_PRIME)
    return _pmod_col(_pmod_col(k * F.lit(a) + F.lit(b), CMS_PRIME), width).cast("long")


def count_min_table(
    df: DataFrame, key_col: str, width: int = 1024, depth: int | None = None
) -> DataFrame:
    """Count-min sketch built as a TABLE ``(d, bucket, c)`` — the
    write-time-sketch / query-time-merge discipline (same as the HLL
    shards in q_sketch_shards) for FREQUENCIES instead of cardinality:

    - **build**: one partial-aggregable groupBy over (depth, bucket) —
      the shuffle carries ≤ depth·width rows per shard regardless of
      fact size (the exact groupBy would shuffle the key domain);
    - **merge**: sketches of disjoint shards merge by unioning the
      tables and summing ``c`` (counter matrices add) — no special
      binary format, no UDAF, plain relational algebra;
    - **estimate** (``cms_estimate``): min over the depth rows a key
      hashes to — NEVER an underestimate (hard guarantee: every counter
      a key touches counts at least all its occurrences); overestimates
      are collision noise bounded by ~2·N/width per row with prob.
      1−2^−depth.

    Spark ships a ``count_min_sketch`` binary agg but no SQL merge for
    it; the relational form is mergeable, partition-prunable, and
    oracle-checkable with exact integer arithmetic on any engine."""
    hashes = CMS_HASHES if depth is None else CMS_HASHES[:depth]
    per_depth = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).cast("int").alias("d"),
                    _cms_bucket(F.col(key_col), a, b, width).alias("bucket"),
                )
                for i, (a, b) in enumerate(hashes)
            ]
        )
    ).alias("_h")
    return (
        df.select(per_depth)
        .select("_h.d", "_h.bucket")
        .groupBy("d", "bucket")
        .agg(F.count("*").alias("c"))
    )


def cms_estimate(
    cms: DataFrame, keys: DataFrame, key_col: str, width: int = 1024,
    depth: int | None = None,
) -> DataFrame:
    """Point-frequency estimates for ``keys`` against a ``count_min_table``
    sketch (or a union-sum merge of several): probe the depth buckets per
    key, left-join the sketch rows (missing bucket = 0), take the min.
    The sketch side is ≤ depth·width rows — broadcast-sized by
    construction — so the probe is a broadcast hash join at any scale.

    Returns (key_col, est_n). Guarantee: est_n ≥ the key's true count.

    The never-underestimate guarantee requires the probe depth to be ≤
    the depth the sketch was BUILT with: a deeper probe would left-join
    no sketch rows at the extra depths and coalesce them to 0, silently
    inverting the guarantee. The sketch carries its depth in its own
    rows (max(d)+1), so this is validated with one 1-row aggregate over
    the ≤ depth·width-row sketch (bounded by construction) and fails
    fast on mismatch. An EMPTY sketch (empty corpus) is exempt: every
    true count is 0, so estimate 0 is exact."""
    hashes = CMS_HASHES if depth is None else CMS_HASHES[:depth]
    built = cms.agg(F.max("d").alias("_d")).first()[0]
    if built is not None and len(hashes) > built + 1:
        raise ValueError(
            f"cms_estimate probe depth {len(hashes)} exceeds the sketch's "
            f"built depth {built + 1}; absent depths would coalesce to 0 "
            "and break the never-underestimate guarantee"
        )
    probes = keys.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).cast("int").alias("d"),
                        _cms_bucket(F.col(key_col), a, b, width).alias("bucket"),
                    )
                    for i, (a, b) in enumerate(hashes)
                ]
            )
        ).alias("_h"),
    ).select(key_col, "_h.d", "_h.bucket")
    return (
        probes.join(F.broadcast(cms), ["d", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est_n"))
    )


def grouped_median_mad(df: DataFrame, group_col: str, x_int) -> DataFrame:
    """Per-group median + MAD (median absolute deviation) — the robust
    location/scale pair for monitoring skewed or outlier-ridden metrics
    (mean/stddev move with one bad row; median/MAD need half the data to
    be wrong). Exact, not sketched: ``median`` is Spark's exact
    percentile aggregate (sort-based), which is ORDER-FREE — the same
    rows give the same median on any partitioning, so unlike float sums
    the raw doubles hash-compare across engines.

    ``x_int`` must be an integer-lattice expression (cents): medians of
    an even count interpolate to lattice halves — exact in double — and
    |x − median| stays on the half-cent lattice, so the second median is
    exact too.

    Plan: two partial-sort aggregations over the fact (exact quantiles
    cannot one-pass; the approx path is approx_percentile) with the
    group-cardinality median table broadcast back between them. Output:
    (group, n, med, mad)."""
    d = df.select(F.col(group_col), x_int.cast("long").alias("_x"))
    med = d.groupBy(group_col).agg(
        F.count("*").alias("n"), F.median("_x").alias("med")
    )
    return (
        d.join(F.broadcast(med), group_col)
        .groupBy(group_col, "n", "med")
        .agg(F.median(F.abs(F.col("_x") - F.col("med"))).alias("mad"))
        .select(group_col, "n", "med", "mad")
    )


def grouped_skew_kurt(df: DataFrame, group_col: str, x_int) -> DataFrame:
    """Per-group skewness and excess kurtosis from EXACT integer moments
    — the shape-of-distribution companions to ``grouped_corr_exact``
    (same discipline: one partial-aggregable shuffle of int64 sums,
    order-free; ``skewness()``/``kurtosis()`` built-ins stream float
    accumulators and can never hash-compare across engines or cluster
    sizes).

    With raw power sums S=Σx, S2..S4 (all exact int64), the n-powers
    cancel out of the standardized moments:

        B    = n·S2 − S²                        (= n²·m2)
        A    = n²·S3 − 3n·S·S2 + 2S³            (= n³·m3)
        C    = n³·S4 − 4n²·S·S3 + 6n·S²·S2 − 3S⁴ (= n⁴·m4)
        skew = A / B^(3/2)        kurt = C / B² − 3

    A, B and C all exceed int64 at realistic scales (B = n·S2 − S² has
    both products ~n²·x², which wraps int64 at n ≈ 3e6 per group for
    |x| = 1e3 — smaller than the n·x⁴ bound on the sums themselves), so
    ALL THREE are evaluated in DOUBLE as FIXED left-associated trees
    over the exact sums — every step a correctly-rounded IEEE op on
    identical operands, so both engines produce bit-identical doubles
    (the q_stats_corr recipe). The trade: zero-variance detection is
    inexact once the sums exceed 2^53 (B may round to a tiny nonzero
    instead of exact 0); below 2^53 the double tree is exact and the
    NULLIF guard is sharp.

    ``x_int`` must be a SMALL integer lattice: the exactness of the
    int64 power sums needs n·max|x|⁴ < 2^63 (deci-units with |x| ≤ 1e3
    → n ≤ 9e6 per group; widen to DECIMAL(38,0) sums in both engines
    past that). Zero-variance groups yield NULL via NULLIF. Output:
    (group, n, sum_x..sum_x4, skew, kurt)."""
    g = (
        df.select(F.col(group_col), x_int.cast("long").alias("_x"))
        .groupBy(group_col)
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("_x").alias("sum_x"),
            F.sum(F.col("_x") * F.col("_x")).alias("sum_x2"),
            F.sum(F.col("_x") * F.col("_x") * F.col("_x")).alias("sum_x3"),
            F.sum(F.col("_x") * F.col("_x") * F.col("_x") * F.col("_x")).alias("sum_x4"),
        )
    )
    nd = F.col("n").cast("double")
    sd = F.col("sum_x").cast("double")
    s2 = F.col("sum_x2").cast("double")
    s3 = F.col("sum_x3").cast("double")
    s4 = F.col("sum_x4").cast("double")
    b = nd * s2 - sd * sd
    a = nd * nd * s3 - F.lit(3.0) * nd * sd * s2 + F.lit(2.0) * sd * sd * sd
    c = (
        nd * nd * nd * s4
        - F.lit(4.0) * nd * nd * sd * s3
        + F.lit(6.0) * nd * sd * sd * s2
        - F.lit(3.0) * sd * sd * sd * sd
    )
    return g.select(
        group_col,
        "n",
        "sum_x",
        "sum_x2",
        "sum_x3",
        "sum_x4",
        (a / F.nullif(b * F.sqrt(b), F.lit(0.0))).alias("skew"),
        (c / F.nullif(b * b, F.lit(0.0)) - F.lit(3.0)).alias("kurt"),
    )


def grouped_gini(df: DataFrame, group_col: str, x_int) -> DataFrame:
    """Per-group Gini coefficient of a non-negative integer metric — the
    inequality audit for corpus BALANCE questions ("is one domain's byte
    mass dominating this source?") that means/medians can't answer: G=0
    is perfect equality, G→1 is one-member dominance.

    Exact sorted-rank identity (no pair enumeration):

        G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx)

    with x_(i) the ascending sort and i its 1-based rank. Everything up
    to the final quotient is exact int64 (one row_number window + one
    partial-aggregable agg share the group exchange), and ``gini`` ships
    as ONE raw division — correctly-rounded IEEE on identical operands,
    hash-stable across engines. Ties are rank-order-free: tied values
    contribute the same Σ i·x over any permutation of their ranks
    (i-weights over equal x sum identically), so no tiebreak is needed
    for determinism.

    int64 bound: the largest intermediate is 2·Σi·x ≤ 2·n·Σx, so the
    envelope is n·Σx < 2^62 — at 1e6 rows/group that allows Σx ≈ 4.6e12
    (e.g. 4 GB of per-doc byte counts per group); widen to
    DECIMAL(38,0) in both engines past that. All-zero groups (Σx = 0)
    yield NULL. Output: (group, n, sum_x, gini)."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy("_x")
    d = (
        df.select(F.col(group_col), x_int.cast("long").alias("_x"))
        .withColumn("_i", F.row_number().over(w).cast("long"))
    )
    g = d.groupBy(group_col).agg(
        F.count("*").cast("long").alias("n"),
        F.sum("_x").alias("sum_x"),
        F.sum(F.col("_i") * F.col("_x")).alias("_ix"),
    )
    num = F.lit(2) * F.col("_ix") - (F.col("n") + F.lit(1)) * F.col("sum_x")
    den = F.col("n") * F.col("sum_x")
    return g.select(
        group_col,
        "n",
        "sum_x",
        (num.cast("double") / F.nullif(den.cast("double"), F.lit(0.0))).alias("gini"),
    )


def two_proportion_ztest(
    df: DataFrame,
    variant_col: str,
    converted_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Two-proportion z-test between exactly two variants — the A/B
    readout (is B's conversion rate different from A's?) computed from
    EXACT integer counts with a fixed-order IEEE tail:

        z = (p_a − p_b) / √( p̂·(1−p̂)·(1/n_a + 1/n_b) ),  p̂ pooled

    |z| > 1.96 rejects "same rate" at α=5% (two-sided). One
    partial-aggregable shuffle builds (n, conv) per variant (rows carry
    a 0/1 ``converted_col``); the per-group pivot joins two
    variant-cardinality tables. Every division and the sqrt are
    correctly-rounded IEEE ops evaluated in the SAME left-associated
    order both engines can express, so the raw doubles hash-compare
    (the q_stats_corr recipe). Degenerate splits (either n = 0, or
    pooled p̂ ∈ {0, 1} making the variance 0) yield NULL via NULLIF.

    ``variant_col`` must hold exactly two values per group — validate
    upstream; extra variants silently pivot away. Output: (group_cols…,
    n_a, conv_a, n_b, conv_b, z)."""
    gcols = group_cols or []
    variants = (
        df.select(variant_col).distinct().orderBy(variant_col).limit(2).collect()
    )
    if len(variants) < 2:
        raise ValueError("two_proportion_ztest needs two variants")
    va, vb = variants[0][0], variants[1][0]
    agg = df.groupBy(*gcols, variant_col).agg(
        F.count("*").cast("long").alias("_n"),
        F.sum(F.col(converted_col).cast("long")).cast("long").alias("_c"),
    )
    a = agg.where(F.col(variant_col) == va).select(
        *gcols, F.col("_n").alias("n_a"), F.col("_c").alias("conv_a")
    )
    b = agg.where(F.col(variant_col) == vb).select(
        *gcols, F.col("_n").alias("n_b"), F.col("_c").alias("conv_b")
    )
    j = a.join(b, gcols) if gcols else a.crossJoin(b)
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    ca, cb = F.col("conv_a").cast("double"), F.col("conv_b").cast("double")
    pa, pb = ca / na, cb / nb
    pool = (ca + cb) / (na + nb)
    var = pool * (F.lit(1.0) - pool) * (F.lit(1.0) / na + F.lit(1.0) / nb)
    return j.select(
        *gcols,
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        ((pa - pb) / F.nullif(F.sqrt(var), F.lit(0.0))).alias("z"),
    )


def salted_count_distinct(
    df: DataFrame, key_col: str, value_col: str, salt_buckets: int = 32
) -> DataFrame:
    """EXACT per-key distinct count via salt-partitioned two-phase
    aggregation — the hot-key fix for ``count_distinct``: a plain
    distinct count funnels every one of a hot key's values through ONE
    reducer task (distinct state cannot map-side-combine the way sums
    do), so a power-law key serializes its whole value set. Salting by
    a hash of the VALUE splits that state ``salt_buckets`` ways while
    staying exact — distinct values land in exactly one salt bucket
    (the salt is a function of the value), so per-bucket distinct
    counts are disjoint and SUM to the true distinct count. Two
    partial-aggregable shuffles, the first keyed (key, salt) — the hot
    key's work now spreads across ``salt_buckets`` tasks.

    The salt uses the engine-agnostic CMS hash chain (pure integer mod
    arithmetic), so an oracle can evaluate the identical bucketing —
    though it doesn't need to: bucketing cancels out of the output,
    which equals plain COUNT(DISTINCT) by construction.

    Output: (key, n_distinct). AQE's skew handling does NOT cover this
    case (it splits shuffle partitions, not a single key's aggregation
    state); salting is the standard rewrite."""
    a, b = CMS_HASHES[0]
    salt = _cms_bucket(F.xxhash64(F.col(value_col)), a, b, int(salt_buckets))
    partial = (
        df.select(F.col(key_col), F.col(value_col), salt.alias("_salt"))
        .groupBy(key_col, "_salt")
        .agg(F.count_distinct(value_col).cast("long").alias("_nd"))
    )
    return partial.groupBy(key_col).agg(
        F.sum("_nd").cast("long").alias("n_distinct")
    )


def cms_join_size(cms_a: DataFrame, cms_b: DataFrame) -> DataFrame:
    """Equi-join SIZE estimate from two count-min tables — the AMS/CMS
    inner-product estimator: |A ⋈ B| on a key = Σ_k f_A(k)·f_B(k), and
    each sketch depth's Σ_bucket a[b]·b[b] OVERESTIMATES that sum
    (collision mass is non-negative), so the min over depths is ≥ the
    true join size, always — the same hard one-sided guarantee as
    ``cms_estimate``, lifted from point frequencies to the full join.

    Why it matters at 100 TB: join-size estimation is what decides
    broadcast-vs-shuffle and staging capacity BEFORE running the join;
    the exact answer costs the join itself, while this costs one
    equi-join of two ≤ depth·width-row tables (kilobytes — both sides
    broadcast-trivial) over sketches the ingest indexes already
    maintain (``IncrementalCmsIndex``). Both sketches must share width
    and depth (the hash family is module-constant); mismatched depths
    fail fast like ``cms_estimate``.

    Output: one row, (est_join_size,). Exact int64: the per-depth sum
    Σ a[b]·b[b] is ≤ n_A·n_B (the degenerate one-hot-bucket worst case;
    expected truth + n_A·n_B/width under hashing), so the hard envelope
    is n_A·n_B < 2^63 — ~3e9 × 3e9 rows; widen to DECIMAL(38,0) past
    that."""
    da = cms_a.agg(F.max("d")).first()[0]
    db = cms_b.agg(F.max("d")).first()[0]
    if da is None or db is None:
        # an EMPTY sketch (no rows) means its side has no keys at all, so
        # the true join size is exactly 0 — mirror cms_estimate's
        # documented empty-sketch exemption instead of a misleading
        # depth-mismatch error (empty-vs-nonempty) or a NULL row (both
        # empty)
        return cms_a.sparkSession.range(1).select(
            F.lit(0).cast("long").alias("est_join_size")
        )
    if da != db:
        raise ValueError(
            f"cms_join_size: sketch depths differ ({da} vs {db}) — the "
            "per-depth inner products would not be comparable"
        )
    b = cms_b.select(
        F.col("d").alias("_d"), F.col("bucket").alias("_bucket"), F.col("c").alias("_c")
    )
    per_depth = (
        cms_a.join(
            F.broadcast(b),
            (cms_a["d"] == b["_d"]) & (cms_a["bucket"] == b["_bucket"]),
        )
        .groupBy("d")
        .agg(F.sum(F.col("c") * F.col("_c")).alias("_ip"))
    )
    return per_depth.agg(F.min("_ip").cast("long").alias("est_join_size"))


def decayed_sum_dyadic(
    df: DataFrame,
    group_col: str,
    value_int,
    age_col,
    half_life: int,
    max_age: int | None = None,
) -> DataFrame:
    """Exponentially time-decayed sum with EXACT arithmetic — the
    recency-weighted popularity/engagement score (each value counts
    half as much per ``half_life`` age units), in the DYADIC form that
    makes it cross-engine exact where the textbook ``Σ v·exp(−λt)``
    never is (libm exp differs in last ulps AND float sums are
    order-dependent):

        k        = age / half_life      (integer division — the decay
                                         staircase, halving per bucket)
        score    = Σ v · 2^(k_max − k)  (exact int64)  /  2^k_max

    Every weight is a power of two, so the scaled sum is pure integer
    arithmetic (order-free, partial-aggregable — one groupBy shuffle)
    and the final normalization is ONE exact division by a power of two
    — every intermediate a correctly-rounded IEEE op on identical
    operands. The staircase (per-bucket halving instead of continuous
    decay) is the documented trade for exactness; choose ``half_life``
    at the granularity the ranking needs.

    ``max_age`` (default: 16·half_life) CLAMPS k — ancient rows decay
    to the floor bucket instead of overflowing the scale factor; it
    also bounds the int64 envelope: Σ|v| · 2^(k_max) < 2^63, i.e.
    Σ|v| < 2^(63 − max_age/half_life) — at the default k_max=16 that
    is Σ|v| < 1.4e14; size ``max_age`` to the data's ACTUAL age span
    (a 30-day window at half_life 7 needs k_max=4, leaving 2^59 of
    value headroom). Output: (group, n, scaled_sum, score)."""
    k_max = int((max_age if max_age is not None else 16 * half_life) // half_life)
    if not 0 <= k_max <= 52:
        raise ValueError(
            f"max_age/half_life must land in [0, 52] ({k_max}) — larger "
            "scale factors leave no int64 headroom for the values"
        )
    # k = clamp(age // half_life, 0, k_max) WITHOUT any division: Spark's
    # `/` is double division, whose truncation can disagree with true
    # integer `//` for ages beyond 2^53. Since k is clamped to ≤ 52
    # buckets anyway, count threshold crossings instead — k equals the
    # number of i in [1, k_max] with age ≥ i·half_life, a sum of ≤ 52
    # exact long comparisons (codegen-friendly, order-free). Negative
    # ages land in bucket 0 automatically.
    age_l = age_col.cast("long")
    k = F.lit(0).cast("long")
    for i in range(1, k_max + 1):
        k = k + (age_l >= F.lit(int(i * half_life))).cast("long")
    # weight = 2^(k_max − k) via a literal power table (shiftleft takes a
    # Python int, not a Column; pow() would route through libm) — pure
    # exact integer arithmetic end to end
    powers = F.array(*[F.lit(1 << i).cast("long") for i in range(k_max + 1)])
    scaled = value_int.cast("long") * F.element_at(
        powers, (F.lit(k_max) - k + 1).cast("int")
    )
    g = df.groupBy(group_col).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(scaled).alias("scaled_sum"),
    )
    return g.select(
        group_col,
        "n",
        "scaled_sum",
        (F.col("scaled_sum").cast("double") / F.lit(float(2 ** k_max))).alias("score"),
    )


def kll_sketch_table(
    df: DataFrame, shard_col, value_col: str, k: int = 200
) -> DataFrame:
    """Mergeable QUANTILE sketches as a table ``(shard, n, kll)`` — the
    third leg of the write-time-sketch / query-time-merge family
    (cardinality: ``q_sketch_shards`` HLL; frequency: ``count_min_table``
    CMS; quantiles: this, Datasketches KLL via Spark 4's
    ``kll_sketch_agg_bigint``).

    - **build**: one partial-aggregable groupBy; per-shard state is the
      KLL sketch (~3 KB at k=200), independent of shard row count;
    - **merge**: ``kll_merge_shards`` unions shard rows with
      ``kll_merge_agg_bigint`` — kilobytes move, the fact is never
      re-scanned. Associative and order-free, so per-partition sketches
      maintained at ingest time answer any shard-combination quantile
      query later;
    - **query**: ``kll_quantile_of``/``kll_rank_of`` evaluate the sketch.

    Guarantee (Karnin-Lang-Liberty 2016): the normalized-rank error of
    any returned quantile is ≤ ~1.65% at k=200 with 99% confidence —
    an error on the RANK axis, never the value axis, which is what makes
    it certifiable against an exact rank table (q_sketch_quantile). The
    sketch is randomized (compaction coin flips), so estimates are NOT
    run-deterministic — certification emits exact values + in-plan rank
    bound bits, never raw estimates (the q_sketch_shards discipline).
    ``kll_sketch_get_n`` IS exact and deterministic: stream length
    survives any merge tree bit-for-bit."""
    return df.groupBy(shard_col).agg(
        F.expr(f"kll_sketch_agg_bigint({value_col}, {int(k)})").alias("kll"),
        F.count("*").cast("long").alias("n"),
    )


def kll_merge_shards(sketch_tbl: DataFrame, kll_col: str = "kll") -> DataFrame:
    """Union-merge a sketch table to ONE global sketch row ``(kll, n)``
    (kilobyte shuffle; ``n`` summed exactly)."""
    return sketch_tbl.agg(
        F.expr(f"kll_merge_agg_bigint({kll_col})").alias("kll"),
        F.sum("n").cast("long").alias("n"),
    )


def kll_quantile_of(kll_col, rank: float):
    """Column: sketch value estimate at normalized rank ``rank``."""
    return F.expr(f"kll_sketch_get_quantile_bigint({kll_col}, CAST({rank} AS DOUBLE))")


def kll_rank_of(kll_col, value: int):
    """Column: sketch normalized (inclusive) rank estimate of a LITERAL
    value — Spark's kll_sketch_get_rank_bigint requires a foldable
    argument, so per-row rank probes must go through
    ``kll_quantile_of`` + an exact rank table instead
    (q_sketch_quantile's cert arm)."""
    return F.expr(f"kll_sketch_get_rank_bigint({kll_col}, {int(value)}L)")


def grouped_winsorize(
    df: DataFrame,
    group_col: str,
    x_long,
    lo: tuple[int, int] = (1, 20),
    hi: tuple[int, int] = (19, 20),
) -> DataFrame:
    """Per-group WINSORIZATION: clamp an integer-valued column to its
    group's [lo, hi] ceil-rank quantiles — the standard heavy-tail
    containment before means/regressions (a mean over a power-law column
    is otherwise owned by its top rows). ``lo``/``hi`` are exact
    rationals (num, den), e.g. (1, 20) = the 5th percentile.

    Exact and engine-agnostic: per-(group, value) counts → one window
    cumsum → threshold quantile q_p = MIN(x : cum·den ≥ num·n) (pure
    integer comparison, no percentile dialect) → the kilobyte-per-group
    quantile table broadcasts back over the fact. State scales with
    DISTINCT values per group, not rows; for value domains too wide for
    the exact cum table at 100 TB, the same clamp runs off
    ``kll_sketch_table`` quantile estimates (the KLL rank guarantee
    bounds how much tail mass a clamp can misplace).

    NULL values take no part in the quantiles (they would otherwise
    sort below every real value and drag q_lo to garbage) and pass
    through with ``x_w`` NULL — the aggregate-exclusion convention.

    Returns the input rows + ``x_w`` (clamped), ``q_lo``, ``q_hi``."""
    d = df.withColumn("_x", x_long.cast("long"))
    c = (
        d.where(F.col("_x").isNotNull())
        .groupBy(group_col, "_x")
        .agg(F.count("*").cast("long").alias("_cnt"))
    )
    w = Window.partitionBy(group_col).orderBy("_x")
    cum = c.withColumn("_cum", F.sum("_cnt").over(w))
    n = c.groupBy(group_col).agg(F.sum("_cnt").cast("long").alias("_n"))
    cumn = cum.join(n, group_col)
    q = cumn.groupBy(group_col).agg(
        F.min(
            F.when(F.col("_cum") * lo[1] >= lo[0] * F.col("_n"), F.col("_x"))
        ).alias("q_lo"),
        F.min(
            F.when(F.col("_cum") * hi[1] >= hi[0] * F.col("_n"), F.col("_x"))
        ).alias("q_hi"),
    )
    # left join: a group whose values are ALL NULL has no quantile row
    # and must still pass its rows through (x_w/q_lo/q_hi all NULL).
    # The clamp needs an explicit NULL gate: Spark's greatest/least SKIP
    # nulls (least(q_hi, NULL) = q_hi), which would silently clamp a
    # NULL value to a quantile instead of propagating it.
    clamp = F.when(
        F.col("_x").isNull(), F.lit(None).cast("long")
    ).otherwise(F.greatest(F.col("q_lo"), F.least(F.col("q_hi"), F.col("_x"))))
    return (
        d.join(F.broadcast(q), group_col, "left")
        .withColumn("x_w", clamp)
        .drop("_x")
    )


def grouped_linreg_exact(
    df: DataFrame,
    group_col: str,
    x_int,
    y_int,
) -> DataFrame:
    """Per-group ordinary-least-squares fit (slope, intercept, R²) from
    EXACT integer moments — the deterministic alternative to Spark's
    ``regr_slope``/``regr_intercept``/``regr_r2``, whose streaming float
    accumulation is summation-order-dependent and can never be
    hash-compared across engines or cluster sizes. The regression twin of
    ``grouped_corr_exact`` (same moment shuffle, same fixed-IEEE-tree
    finish).

    ``x_int``/``y_int`` must be integer-valued Column expressions (snap
    to a lattice first). One partial-aggregable shuffle produces the five
    exact int64 moments; the cross-moment products (``n·Σxy − Σx·Σy``
    etc.) are widened through DECIMAL(38,0) — exact out to 38 digits, so
    ``n·Σy²`` survives group sizes the pure-int64 q_stats_corr recipe
    cannot (the q_agg_decimal widening discipline, applied mid-plan; the
    oracle's HUGEINT is its 128-bit twin) — then cast once to double:

        slope     = Sxy⋆ / Sxx⋆          (⋆ = n·Σ·· − Σ·Σ·, exact)
        intercept = (Σy − slope·Σx) / n
        r2        = Sxy⋆² / (Sxx⋆ · Syy⋆)

    each a fixed tree of correctly-rounded IEEE ops over exact integers —
    bit-identical in any IEEE-754 engine, shipped raw. Zero-variance-x
    groups yield NULL slope/intercept/r2 via NULLIF identically in both
    engines.

    Output: ``(group_col, n, sum_x, sum_y, sum_xy, slope, intercept,
    r2)`` — integer moments ride along for exact certification."""
    g = (
        df.select(
            F.col(group_col),
            x_int.cast("long").alias("_x"),
            y_int.cast("long").alias("_y"),
        )
        # pairwise-complete: a NULL in either coordinate would count in n
        # but vanish from the sums, silently corrupting every moment
        .where(F.col("_x").isNotNull() & F.col("_y").isNotNull())
        .groupBy(group_col)
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("_x").alias("sum_x"),
            F.sum("_y").alias("sum_y"),
            F.sum(F.col("_x") * F.col("_y")).alias("sum_xy"),
            F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
            F.sum(F.col("_y") * F.col("_y")).alias("_syy"),
        )
    )
    dec = "decimal(38,0)"
    nd = F.col("n").cast(dec)
    sxy_star = nd * F.col("sum_xy").cast(dec) - F.col("sum_x").cast(dec) * F.col("sum_y").cast(dec)
    sxx_star = nd * F.col("_sxx").cast(dec) - F.col("sum_x").cast(dec) * F.col("sum_x").cast(dec)
    syy_star = nd * F.col("_syy").cast(dec) - F.col("sum_y").cast(dec) * F.col("sum_y").cast(dec)
    slope = sxy_star.cast("double") / F.nullif(sxx_star.cast("double"), F.lit(0.0))
    intercept = (F.col("sum_y").cast("double") - slope * F.col("sum_x").cast("double")) / F.col(
        "n"
    ).cast("double")
    r2 = (sxy_star.cast("double") * sxy_star.cast("double")) / F.nullif(
        sxx_star.cast("double") * syy_star.cast("double"), F.lit(0.0)
    )
    return g.select(
        group_col,
        "n",
        "sum_x",
        "sum_y",
        "sum_xy",
        slope.alias("slope"),
        intercept.alias("intercept"),
        r2.alias("r2"),
    )


def welch_ttest_exact(
    df: DataFrame,
    cohort_col: str,
    cohort_a: str,
    cohort_b: str,
    x_int,
) -> DataFrame:
    """Welch's unequal-variance two-sample t statistic from EXACT integer
    moments — the MEANS companion of ``two_proportion_ztest`` (which
    compares rates). Standard public formulation (Welch 1947):

        t  = (m_a − m_b) / √(v_a/n_a + v_b/n_b)
        df = (v_a/n_a + v_b/n_b)² /
             ((v_a/n_a)²/(n_a−1) + (v_b/n_b)²/(n_b−1))

    with m = Σx/n and the unbiased sample variance
    v = (n·Σx² − (Σx)²)/(n·(n−1)).

    ``x_int`` must be an integer-valued Column (lattice-snapped). The
    whole job is ONE conditional-aggregation pass over the fact (no join,
    no second scan): per-cohort n/Σx/Σx² accumulate as exact int64 sums —
    partial-aggregable, order-free — and every float above is a fixed
    tree of IEEE ops over those exact integers, bit-identical across
    engines and cluster sizes, shipped raw. Degenerate inputs (either
    cohort with n ≤ 1, or both variances zero) yield NULL t/df via NULLIF
    identically in both engines.

    Output: one row ``(n_a, n_b, sum_a, sum_b, t_stat, welch_df)`` —
    exact integers alongside the statistics for certification."""
    is_a = F.col(cohort_col) == F.lit(cohort_a)
    is_b = F.col(cohort_col) == F.lit(cohort_b)
    x = x_int.cast("long")
    # NULL x rows are excluded up front: they would inflate n_a/n_b while
    # contributing nothing to the sums, corrupting mean and variance
    g = df.where((is_a | is_b) & x.isNotNull()).agg(
        F.sum(F.when(is_a, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(is_b, 1).otherwise(0)).cast("long").alias("n_b"),
        F.sum(F.when(is_a, x).otherwise(F.lit(0))).cast("long").alias("sum_a"),
        F.sum(F.when(is_b, x).otherwise(F.lit(0))).cast("long").alias("sum_b"),
        F.sum(F.when(is_a, x * x).otherwise(F.lit(0))).cast("long").alias("_ssa"),
        F.sum(F.when(is_b, x * x).otherwise(F.lit(0))).cast("long").alias("_ssb"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    va = (F.col("n_a") * F.col("_ssa") - F.col("sum_a") * F.col("sum_a")).cast("double") / F.nullif(
        (F.col("n_a") * (F.col("n_a") - 1)).cast("double"), F.lit(0.0)
    )
    vb = (F.col("n_b") * F.col("_ssb") - F.col("sum_b") * F.col("sum_b")).cast("double") / F.nullif(
        (F.col("n_b") * (F.col("n_b") - 1)).cast("double"), F.lit(0.0)
    )
    se2 = va / na + vb / nb
    t = (F.col("sum_a").cast("double") / na - F.col("sum_b").cast("double") / nb) / F.nullif(
        F.sqrt(se2), F.lit(0.0)
    )
    wdf = (se2 * se2) / F.nullif(
        (va / na) * (va / na) / F.nullif(na - F.lit(1.0), F.lit(0.0))
        + (vb / nb) * (vb / nb) / F.nullif(nb - F.lit(1.0), F.lit(0.0)),
        F.lit(0.0),
    )
    return g.select(
        "n_a",
        "n_b",
        "sum_a",
        "sum_b",
        t.alias("t_stat"),
        wdf.alias("welch_df"),
    )


def grouped_weighted_median(
    df: DataFrame,
    group_col: str,
    x_int,
    weight_int,
) -> DataFrame:
    """Exact per-group WEIGHTED lower median: the smallest x whose
    cumulative weight reaches half the group's total weight — the
    importance-aware centre every duplicate-weighted corpus statistic
    needs (a doc that survives dedup carrying weight 10⁶ should move the
    'typical length' like the million docs it stands for; the unweighted
    median, q_stats_mad, treats it as one row).

    ``x_int``/``weight_int`` must be integer-valued Columns (weights > 0
    are the caller's contract; zero-weight rows are harmless — they never
    flip the threshold). The decision ``2·cum ≥ total`` is integer
    cross-multiplied — no float ratio ever decides, so there is no
    rounding boundary to disagree across engines.

    Physical shape (the grouped_winsorize recipe): collapse to per-
    (group, x) weight sums FIRST — one partial-aggregable shuffle whose
    state is the group's distinct-value count, never its row count —
    then one per-group window cumsum over the value order and a MIN over
    the qualifying prefix. At 100 TB the window input is the collapsed
    distinct-value table (bounded by the value lattice), not the fact.

    NULL discipline: rows with NULL value or NULL weight are DROPPED
    before anything else (the standard ignore-nulls median semantics) —
    NULL must never reach the value ordering, where Spark (NULLS FIRST
    on ASC) and SQL oracles (DuckDB: NULLS LAST) would silently cumsum
    in different orders.

    Output: ``(group_col, total_w, wmedian)``; total_w rides along for
    exact certification."""
    c = (
        df.select(
            F.col(group_col),
            x_int.cast("long").alias("_x"),
            weight_int.cast("long").alias("_w"),
        )
        .where(F.col("_x").isNotNull() & F.col("_w").isNotNull())
        .groupBy(group_col, "_x")
        .agg(F.sum("_w").alias("_wsum"))
    )
    w = Window.partitionBy(group_col).orderBy("_x")
    cum = c.withColumn("_cum", F.sum("_wsum").over(w))
    tot = c.groupBy(group_col).agg(F.sum("_wsum").cast("long").alias("total_w"))
    return (
        cum.join(F.broadcast(tot), group_col)
        .groupBy(group_col, "total_w")
        .agg(
            F.min(
                F.when(F.col("_cum") * 2 >= F.col("total_w"), F.col("_x"))
            ).alias("wmedian")
        )
        .select(group_col, "total_w", "wmedian")
    )


def grouped_linreg2_exact(
    df: DataFrame,
    group_col: str,
    x1_int,
    x2_int,
    y_int,
) -> DataFrame:
    """Per-group TWO-FEATURE least squares (y ~ b0 + b1·x1 + b2·x2) with
    the normal equations solved by CRAMER'S RULE over exact integer
    determinants — multiple regression with zero float accumulation
    anywhere: the 3×3 normal matrix and its three column-replaced
    variants are polynomial in the nine exact int64 moments, every
    determinant is evaluated in DECIMAL(38,0) (oracle: HUGEINT) — exact
    out to 38 digits — and each coefficient is ONE IEEE division of two
    exactly-cast integers, bit-identical across engines and cluster
    sizes. (The textbook alternative — distributed QR / gradient — is
    iterative float; for a handful of features the Cramer form is the
    only hash-certifiable one, and the one-shuffle moment pass is the
    same cost.)

    ``x1_int``/``x2_int``/``y_int`` must be integer-valued Columns on
    caller-chosen lattices. One partial-aggregable shuffle computes the
    nine moments; everything after is per-group scalar arithmetic.

    Overflow bound: determinant terms are triple products of moments —
    with per-group rows n and lattice bounds |x|≤X, the largest term is
    ~n³·X⁴ and must stay under 10³⁸; the lineitem fixture peaks ~10²⁷.
    Collinear features (det M = 0) yield NULL coefficients via NULLIF,
    identically in both engines.

    Output: ``(group, n, det_m_str, b0, b1, b2)`` — det M rides along as
    a canonical digit STRING so the oracle certifies the exact integer
    algebra, not just the rounded quotients."""
    g = (
        df.select(
            F.col(group_col),
            x1_int.cast("long").alias("_x1"),
            x2_int.cast("long").alias("_x2"),
            y_int.cast("long").alias("_y"),
        )
        # listwise-complete: a NULL in any coordinate would count in n
        # but vanish from the sums, silently corrupting every moment
        .where(
            F.col("_x1").isNotNull()
            & F.col("_x2").isNotNull()
            & F.col("_y").isNotNull()
        )
        .groupBy(group_col)
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("_x1").alias("_s1"),
            F.sum("_x2").alias("_s2"),
            F.sum("_y").alias("_sy"),
            F.sum(F.col("_x1") * F.col("_x1")).alias("_s11"),
            F.sum(F.col("_x1") * F.col("_x2")).alias("_s12"),
            F.sum(F.col("_x2") * F.col("_x2")).alias("_s22"),
            F.sum(F.col("_x1") * F.col("_y")).alias("_s1y"),
            F.sum(F.col("_x2") * F.col("_y")).alias("_s2y"),
        )
    )
    dec = "decimal(38,0)"
    n_, s1, s2, sy, s11, s12, s22, s1y, s2y = [
        F.col(c).cast(dec)
        for c in ("n", "_s1", "_s2", "_sy", "_s11", "_s12", "_s22", "_s1y", "_s2y")
    ]
    det_m = n_ * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) + s2 * (
        s1 * s12 - s11 * s2
    )
    det_b0 = sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) + s2 * (
        s1y * s12 - s11 * s2y
    )
    det_b1 = n_ * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2) + s2 * (
        s1 * s2y - s1y * s2
    )
    det_b2 = n_ * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) + sy * (
        s1 * s12 - s11 * s2
    )
    den = F.nullif(det_m.cast("double"), F.lit(0.0))
    return g.select(
        group_col,
        "n",
        det_m.cast("string").alias("det_m_str"),
        (det_b0.cast("double") / den).alias("b0"),
        (det_b1.cast("double") / den).alias("b1"),
        (det_b2.cast("double") / den).alias("b2"),
    )


def grouped_spearman_exact(
    df: DataFrame,
    group_col: str,
    x_int,
    y_int,
) -> DataFrame:
    """Per-group SPEARMAN rank correlation, exact — the robust
    (outlier-immune, monotone-invariant) companion of
    ``grouped_corr_exact``: Pearson over average ranks, with ties
    handled by the standard mid-rank convention.

    Exactness trick: the average rank of a tied run is fractional, but
    DOUBLED average ranks are integers — ``2·avgrank = 2·rank() +
    (tie_count − 1)`` with ``rank()`` the SQL gap-rank and tie_count the
    size of the value's tie group, both integer window functions. The
    constant factor 2 cancels in the correlation, so Pearson over the
    doubled ranks IS Spearman, computed entirely on the int64 lattice:
    one moment shuffle, cross-moment products widened through
    DECIMAL(38,0)/HUGEINT (doubled ranks reach 2n, so n·Σr² ~ 4n⁴
    exceeds int64 past ~40k rows/group — the widening is mandatory
    here, not an edge case), fixed IEEE finish shipped raw.

    Physical shape: two rank windows per variable over the SAME group
    partitioning (each variable's order differs, so 4 sorts of the
    group's rows — rank state is O(1) per row), then the single moment
    shuffle. Rows with NULL in either coordinate are dropped first
    (pairwise-complete, the family discipline; mid-rank over a NULL
    would be engine-dependent).

    Output: ``(group, n, sum_rx, sum_ry, sum_rxy, spearman)`` with the
    doubled-rank moments riding along for exact certification.
    Zero-variance (all-tied) sides yield NULL via NULLIF."""
    base = df.select(
        F.col(group_col),
        x_int.cast("long").alias("_x"),
        y_int.cast("long").alias("_y"),
    ).where(F.col("_x").isNotNull() & F.col("_y").isNotNull())
    wx = Window.partitionBy(group_col).orderBy("_x")
    wy = Window.partitionBy(group_col).orderBy("_y")
    tx = Window.partitionBy(group_col, "_x")
    ty = Window.partitionBy(group_col, "_y")
    ranked = base.select(
        group_col,
        (F.rank().over(wx) * 2 + F.count("*").over(tx) - 1).alias("_rx"),
        (F.rank().over(wy) * 2 + F.count("*").over(ty) - 1).alias("_ry"),
    )
    g = ranked.groupBy(group_col).agg(
        F.count("*").cast("long").alias("n"),
        F.sum("_rx").alias("sum_rx"),
        F.sum("_ry").alias("sum_ry"),
        F.sum(F.col("_rx") * F.col("_ry")).alias("sum_rxy"),
        F.sum(F.col("_rx") * F.col("_rx")).alias("_sxx"),
        F.sum(F.col("_ry") * F.col("_ry")).alias("_syy"),
    )
    dec = "decimal(38,0)"
    nd = F.col("n").cast(dec)
    num = nd * F.col("sum_rxy").cast(dec) - F.col("sum_rx").cast(dec) * F.col("sum_ry").cast(dec)
    dxx = nd * F.col("_sxx").cast(dec) - F.col("sum_rx").cast(dec) * F.col("sum_rx").cast(dec)
    dyy = nd * F.col("_syy").cast(dec) - F.col("sum_ry").cast(dec) * F.col("sum_ry").cast(dec)
    rho = num.cast("double") / F.nullif(
        F.sqrt(dxx.cast("double")) * F.sqrt(dyy.cast("double")), F.lit(0.0)
    )
    return g.select(group_col, "n", "sum_rx", "sum_ry", "sum_rxy", rho.alias("spearman"))


def mannwhitney_utest_exact(
    df: DataFrame,
    cohort_col: str,
    cohort_a: str,
    cohort_b: str,
    x_int,
) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) two-sample test with the
    normal approximation and tie correction — the NONPARAMETRIC
    companion of ``welch_ttest_exact``: compares distributions by rank,
    immune to outliers and monotone transforms, the standard A/B test
    when values are skewed (latencies, spend).

    Distributed WITHOUT a global row sort: a rank window over all rows
    with no partition key is a single-partition sort — the classic
    anti-pattern. Instead mid-ranks come from the VALUE-COUNT lattice
    (the grouped_weighted_median shape): one partial-aggregable
    groupBy(value) whose state is the distinct-value count, then a
    window over THAT bounded table. Doubled mid-ranks are integers
    (``2r(v) = 2·cum_before(v) + cnt(v) + 1``), so the rank sum, U, and
    the tie-correction term ``T = Σ(t³ − t)`` are all exact int64:

        2U_A = Σ_v cntA(v)·2r(v) − n_a(n_a + 1)
        z    = (2U_A − n_a·n_b) / √(n_a·n_b·X / (3·n(n−1)))
        X    = (n+1)·n·(n−1) − T            (exact int64)

    with the z finish ONE fixed IEEE tree over exact integers —
    bit-identical across engines. No continuity correction (documented;
    both engines would need the identical branch and large-sample use
    doesn't want it). int64 bound: X ~ n³ holds to n ≈ 2×10⁶ pooled
    rows; beyond that widen X through DECIMAL(38,0)/HUGEINT (the
    q_stats_linreg discipline). Degenerate inputs (either cohort empty,
    or ALL values tied → zero variance) yield NULL z via NULLIF.

    Output: one row ``(n_a, n_b, u2_a, tie_cubes, z_stat)`` — the exact
    integers ride along for certification."""
    is_a = F.col(cohort_col) == F.lit(cohort_a)
    is_b = F.col(cohort_col) == F.lit(cohort_b)
    x = x_int.cast("long")
    d = df.where((is_a | is_b) & x.isNotNull()).select(
        F.when(is_a, 1).otherwise(0).alias("_a"), x.alias("_x")
    )
    c = d.groupBy("_x").agg(
        F.sum("_a").cast("long").alias("_ca"),
        F.count("*").cast("long").alias("_cnt"),
    )
    w = (
        Window.orderBy("_x")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    r2 = 2 * F.coalesce(F.sum("_cnt").over(w), F.lit(0)) + F.col("_cnt") + 1
    g = c.select("_ca", "_cnt", r2.alias("_r2")).agg(
        F.sum("_ca").cast("long").alias("n_a"),
        F.sum(F.col("_cnt") - F.col("_ca")).cast("long").alias("n_b"),
        F.sum(F.col("_ca") * F.col("_r2")).cast("long").alias("_ra2"),
        F.sum(F.col("_cnt") * F.col("_cnt") * F.col("_cnt") - F.col("_cnt"))
        .cast("long")
        .alias("tie_cubes"),
    )
    n = F.col("n_a") + F.col("n_b")
    u2 = (F.col("_ra2") - F.col("n_a") * (F.col("n_a") + 1)).alias("u2_a")
    xterm = ((n + 1) * n * (n - 1) - F.col("tie_cubes")).cast("double")
    den = F.sqrt(
        F.col("n_a").cast("double")
        * F.col("n_b").cast("double")
        * xterm
        / F.nullif((3 * n * (n - 1)).cast("double"), F.lit(0.0))
    )
    z = (F.col("_ra2") - F.col("n_a") * (F.col("n_a") + 1) - F.col("n_a") * F.col("n_b")).cast(
        "double"
    ) / F.nullif(den, F.lit(0.0))
    return g.select("n_a", "n_b", u2, "tie_cubes", z.alias("z_stat"))


def cuped_adjust_exact(
    df: DataFrame,
    cohort_col: str,
    cohort_a: str,
    cohort_b: str,
    x_int,
    y_int,
) -> DataFrame:
    """CUPED variance reduction (Deng, Xu, Kohavi & Walker, WSDM 2013):
    adjust each cohort's metric mean with a pre-experiment covariate —
    the standard experimentation-platform technique that shrinks A/B
    confidence intervals 30-50% when the covariate correlates with the
    metric:

        θ        = cov(X, Y) / var(X)           (POOLED, both cohorts)
        adj_mean = mean(Y|c) − θ·(mean(X|c) − mean(X))

    ``x_int`` (pre-period covariate) and ``y_int`` (experiment metric)
    must be integer-lattice Columns per unit row. The whole job is ONE
    conditional-aggregation pass (the welch_ttest_exact shape): pooled
    and per-cohort n/Σx/Σy plus pooled Σxy/Σx² accumulate as exact
    int64 sums, and θ plus both adjusted means are a fixed IEEE tree
    over those integers — bit-identical across engines, shipped raw
    with the moments alongside. Rows with NULL in either column are
    excluded listwise (the moment-family discipline). Zero covariate
    variance (θ undefined) yields NULL θ and adjusted means via NULLIF
    — never a silent fallback to the raw means, which would misreport
    the variance-reduction claim.

    Output: one row ``(n, n_a, n_b, sum_x, sum_y, theta, adj_mean_a,
    adj_mean_b, adj_diff)``."""
    is_a = F.col(cohort_col) == F.lit(cohort_a)
    is_b = F.col(cohort_col) == F.lit(cohort_b)
    x = x_int.cast("long")
    y = y_int.cast("long")
    g = (
        df.where((is_a | is_b) & x.isNotNull() & y.isNotNull())
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.when(is_a, 1).otherwise(0)).cast("long").alias("n_a"),
            F.sum(F.when(is_b, 1).otherwise(0)).cast("long").alias("n_b"),
            F.sum(x).cast("long").alias("sum_x"),
            F.sum(y).cast("long").alias("sum_y"),
            F.sum(x * y).cast("long").alias("_sxy"),
            F.sum(x * x).cast("long").alias("_sxx"),
            F.sum(F.when(is_a, x).otherwise(F.lit(0))).cast("long").alias("_sxa"),
            F.sum(F.when(is_b, x).otherwise(F.lit(0))).cast("long").alias("_sxb"),
            F.sum(F.when(is_a, y).otherwise(F.lit(0))).cast("long").alias("_sya"),
            F.sum(F.when(is_b, y).otherwise(F.lit(0))).cast("long").alias("_syb"),
        )
    )
    nd = F.col("n").cast("double")
    theta = (F.col("n") * F.col("_sxy") - F.col("sum_x") * F.col("sum_y")).cast(
        "double"
    ) / F.nullif(
        (F.col("n") * F.col("_sxx") - F.col("sum_x") * F.col("sum_x")).cast("double"),
        F.lit(0.0),
    )
    mean_x = F.col("sum_x").cast("double") / nd

    def adj(sy, sx, nc):
        ncd = F.nullif(F.col(nc).cast("double"), F.lit(0.0))
        return F.col(sy).cast("double") / ncd - theta * (
            F.col(sx).cast("double") / ncd - mean_x
        )

    a_mean = adj("_sya", "_sxa", "n_a")
    b_mean = adj("_syb", "_sxb", "n_b")
    return g.select(
        "n",
        "n_a",
        "n_b",
        "sum_x",
        "sum_y",
        theta.alias("theta"),
        a_mean.alias("adj_mean_a"),
        b_mean.alias("adj_mean_b"),
        (a_mean - b_mean).alias("adj_diff"),
    )


def key_skew_report(df: DataFrame, key_col: str) -> DataFrame:
    """Key-skew telemetry: the count-of-counts histogram that DECIDES the
    skew strategy (AQE skew-join thresholds, q_agg_salted's salt count,
    q_join_salted's rewrite) instead of guessing it — "how many keys
    carry how many rows" in log₂ buckets.

    Two partial-aggregable shuffles, both tiny: per-key counts (state =
    key cardinality), then counts-of-counts into ⌊log₂(rows)⌋ buckets
    (≤ 63 rows out, ever). The log₂ bucket is EXACT integer arithmetic —
    63 − nlz(count) via a comparison chain on powers of two in the
    oracle, never a float log that could misbucket a power-of-two
    boundary. Output per bucket: ``(bucket, n_keys, rows, max_rows)``
    where bucket b covers keys with 2^b ≤ rows < 2^(b+1); the top
    occupied bucket's ``max_rows`` vs the median bucket IS the salting
    decision."""
    per_key = df.groupBy(key_col).agg(F.count("*").cast("long").alias("_rows"))
    b = F.lit(0)
    for k in range(1, 63):
        b = F.when(F.col("_rows") >= F.lit(1 << k), F.lit(k)).otherwise(b)
    return (
        per_key.select(b.cast("int").alias("bucket"), "_rows")
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_keys"),
            F.sum("_rows").cast("long").alias("rows"),
            F.max("_rows").cast("long").alias("max_rows"),
        )
    )


def auc_exact(
    df: DataFrame,
    score,
    label,
    key,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Exact ROC AUC (optionally per group) via the Mann-Whitney midrank
    identity, with NO single-partition sort at any size (r11).

    ``AUC = P(score⁺ > score⁻) + ½·P(tie)`` equals ``U₁/(n₁·n₀)`` where
    ``U₁ = R₁ − n₁(n₁+1)/2`` and ``R₁`` is the midrank sum of the
    positives. Computed all-integer on the SCORE LATTICE: per distinct
    score, ``below`` (rows strictly under it, from
    ``order.distributed_total_rank`` — range-bucketed prefix sums, never
    a global sort), ``n`` and positives ``p``; then
    ``2·R₁ = Σ p·(2·below + n + 1)`` — ties exact by construction, no
    float ever decides. The final ``auc`` is ONE division over exact
    int64s (bit-identical across engines per IEEE); ``u2 = 2·U₁`` ships
    beside it as the integer certificate.

    ``score`` must be integer-valued, ``label`` 0/1 integer, ``key`` a
    unique row id (tiebreak only — never affects the statistic).
    Output: ``(*group_cols, n_pos, n_neg, u2, auc)``; ``auc`` is NULL
    for a degenerate group (one class absent) rather than an error.

    This is the model-eval twin of ``mannwhitney_utest_exact`` (same U
    core; that one ships the z-statistic, this one the probability
    form)."""
    from .order import distributed_total_rank

    g = list(group_cols or [])
    unit = df.select(
        *g,
        score.cast("long").alias("__s"),
        label.cast("long").alias("__y"),
        key.alias("__k"),
    )
    ranked = distributed_total_rank(
        unit, F.col("__s"), F.col("__k"), group_cols=g or None
    )
    lat = ranked.groupBy(*g, "__s").agg(
        (F.min("rank") - 1).alias("__below"),
        F.count("*").cast("long").alias("__n"),
        F.sum("__y").cast("long").alias("__p"),
    )
    t = lat.groupBy(*g).agg(
        F.sum(F.col("__p") * (2 * F.col("__below") + F.col("__n") + 1))
        .cast("long")
        .alias("__r2"),
        F.sum("__p").cast("long").alias("n_pos"),
        (F.sum("__n") - F.sum("__p")).cast("long").alias("n_neg"),
    )
    u2 = (F.col("__r2") - F.col("n_pos") * (F.col("n_pos") + 1)).cast("long")
    return t.select(
        *g,
        "n_pos",
        "n_neg",
        u2.alias("u2"),
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            u2.cast("double") / (2 * F.col("n_pos") * F.col("n_neg")).cast("double"),
        ).alias("auc"),
    )
