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


def file_range_stats(spark, path: str, cols: list[str]):
    """Per-file min/max ranges for the given columns — the data-skipping
    audit: parquet prunes row groups by footer min/max statistics, so the
    FRACTION OF FILES a point/range predicate can skip is a direct
    function of how tightly these ranges cluster. Run it before and
    after a layout change (``operators.order.zorder_key`` +
    ``sortWithinPartitions``) to MEASURE the pruning win instead of
    asserting it.

    One scan using ``input_file_name()`` + a partial-aggregable groupBy
    (files × cols result rows). Returns (file, then min_/max_ per col);
    ``range_overlap_score`` condenses it to one number per column: the
    average number of files whose range covers a random in-range point —
    1.0 = perfectly disjoint (ideal pruning), n_files = every file
    covers everything (no pruning possible).
    """
    from pyspark.sql import functions as F

    df = spark.read.parquet(path)
    aggs = []
    for c in cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return (
        df.withColumn("_file", F.input_file_name())
        .groupBy("_file")
        .agg(*aggs)
    )


def range_overlap_score(stats, col: str) -> float:
    """Average file-range overlap for ``col`` from ``file_range_stats``
    output: E[#files whose [min,max] covers a point drawn uniformly from
    the global range] = Σ width_f / global_width. 1.0 is perfectly
    clustered (disjoint ranges — a point predicate reads ONE file);
    n_files means no file can ever be skipped. Driver-side over the
    files×1 stats rows (bounded). Files whose column is entirely NULL
    (min/max both NULL in the footer) carry no range and are excluded
    from the score — they are always prunable for a non-null predicate."""
    rows = stats.select(f"min_{col}", f"max_{col}").collect()
    rows = [r for r in rows if r[0] is not None and r[1] is not None]
    if not rows:
        return 0.0
    lo = min(float(r[0]) for r in rows)
    hi = max(float(r[1]) for r in rows)
    if hi <= lo:
        return float(len(rows))
    return sum((float(r[1]) - float(r[0])) for r in rows) / (hi - lo)


def codec_audit(
    df,
    path: str,
    codecs: tuple[str, ...] = ("snappy", "zstd", "gzip", "none"),
) -> list[tuple[str, int]]:
    """MEASURE parquet size under each compression codec — the storage
    sibling of ``file_range_stats``: at 100 TB the codec choice is a
    30-50% storage/scan-I/O decision that should be measured on a real
    sample of the actual tables, not asserted from folklore (zstd
    usually wins on text-heavy corpora, snappy on already-high-entropy
    columns like embeddings/digests — but 'usually' is what this
    audits). Writes one copy per codec under ``path/<codec>`` and
    returns ``[(codec, bytes)]`` sorted smallest first.

    Run it on a REPRESENTATIVE SAMPLE (a few hundred MB), never the
    corpus: compression ratios are stable under sampling, and the audit
    is a driver-side decision input, not a pipeline stage."""
    from .sources.io import dir_bytes

    out = []
    for codec in codecs:
        p = f"{path.rstrip('/')}/{codec}"
        df.write.mode("overwrite").option("compression", codec).parquet(p)
        out.append((codec, int(dir_bytes(df.sparkSession, p))))
    return sorted(out, key=lambda kv: kv[1])


def compaction_plan(manifest: DataFrame, file_col: str, bytes_col: str, target_bytes: int):
    """Bin small files into compaction groups of ~``target_bytes`` each —
    the maintenance pass that fixes the small-files problem
    (``q_shard_manifest`` prevents it at write time; this repairs tables
    that already have it: a 100 TB table with 10 MB files pays task
    overhead per file and loses row-group-level skipping).

    Deterministic next-fit-by-size: order files (bytes DESC, path ASC —
    the path tiebreak makes equal-sized files stable), take the running
    cumulative size, and assign each file to bucket
    ``floor(cum_before / target)``. Pure relational form — one window
    cumsum + integer division — so the plan is reproducible and
    oracle-certifiable; bucket totals are bounded by
    ``target + max_file_bytes`` (a file never splits), which each output
    row self-certifies with the ``within_bound`` bit.

    Scale note: the window is a GLOBAL cumsum (single-partition sort) —
    correct here because the input is the FILE MANIFEST (metadata: one
    row per file, ~10⁵-10⁶ rows for a 100 TB table), never the data.
    The same op over a data-sized frame would be wrong; that is what
    the per-key windows elsewhere are for.

    Output: ``(bucket, n_files, total_bytes, within_bound)``."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.orderBy(F.col("_b").desc(), F.col("_f"))
    cum = manifest.select(
        F.col(file_col).alias("_f"),
        F.col(bytes_col).cast("long").alias("_b"),
    ).where(
        # a NULL size would skip the cumsum but land in a NULL bucket;
        # a file of unknown size cannot be planned into a group
        F.col("_b").isNotNull()
    ).withColumn(
        "_start", F.sum("_b").over(w) - F.col("_b")
    )
    # `div` is true integer division — `/` is double division whose
    # truncation can misassign a file sitting within half-ulp of a
    # bucket boundary once cumulative bytes exceed 2^53.
    buckets = (
        cum.withColumn("bucket", F.expr(f"_start div {int(target_bytes)}").cast("long"))
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_files"),
            F.sum("_b").cast("long").alias("total_bytes"),
        )
    )
    mx = manifest.agg(F.max(F.col(bytes_col).cast("long")).alias("_mx"))
    return buckets.crossJoin(F.broadcast(mx)).select(
        "bucket",
        "n_files",
        "total_bytes",
        F.when(F.col("total_bytes") <= F.lit(int(target_bytes)) + F.col("_mx"), F.lit(1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("within_bound"),
    )
