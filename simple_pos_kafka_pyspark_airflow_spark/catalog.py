"""Testdata / warehouse catalog.

Replaces the reference's three table-access paths — JDBC scans of Postgres
(``POS_spark_dag.py:43-52``), per-file CSV discovery by mtime
(``POS_spark_dag.py:66-79``), and "today's file" picks
(``POS_spark_dag.py:55-63``) — with one declarative entry point over
columnar parquet. Partition pruning and predicate pushdown make the
reference's manual file games into plain ``WHERE`` clauses.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import schemas

TABLE_NAMES = tuple(schemas.TESTDATA)

#: table → columns that MAY be stored as parquet TIMESTAMP(NANOS),
#: depending on the testdata generation (round 1 shipped ns, round 2 µs).
#: Spark's vectorized reader rejects nanos outright (PARQUET_TYPE_ILLEGAL);
#: with the legacy nanosAsLong conf they read as raw longs, which we
#: floor-divide to microseconds — exactly DuckDB's ns→us truncation, so
#: both engines see identical timestamps. Integer `div`, not `/`: ns
#: epochs (~1.7e18) exceed double's 53-bit mantissa, so float division
#: would corrupt low microseconds. The conversion is applied only when the
#: column actually arrives as a long; µs/ms files are untouched either way
#: (the conf only affects TIMESTAMP(NANOS) columns). NTZ timestamps are
#: cast to the session type (UTC session tz ⇒ identical wall values) so
#: downstream expressions see one timestamp flavor across data vintages.
_NANOS_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def _parquet_field_is_nanos(path: str, col: str) -> bool:
    """True iff the parquet footer declares ``col`` as TIMESTAMP(NANOS).

    The post-read Spark dtype alone can't distinguish a nanos column read
    as long (via the nanosAsLong conf) from a table vintage that ships a
    GENUINE int64 epoch column in some other unit — dividing the latter by
    1000 would silently shift timestamps 1000×. The footer's logical type
    is the ground truth, read via pyarrow without scanning data."""
    try:
        import pyarrow.parquet as pq

        target = path
        if os.path.isdir(path):  # multi-file table: any footer is canonical
            data = [
                os.path.join(path, f)
                for f in sorted(os.listdir(path))
                if f.endswith(".parquet") and not f.startswith(("_", "."))
            ]
            if not data:
                return False
            target = data[0]
        field = pq.read_schema(target).field(col)
        return str(field.type).startswith("timestamp[ns")
    except (ImportError, KeyError, OSError):
        return False


def _is_utc_equivalent(tz: str) -> bool:
    """True iff ``tz`` names a zone with a permanent zero UTC offset.

    The session a caller hands us may legitimately report 'Etc/UTC' or
    'GMT' (a default-built Spark session uses the JVM zone id, 'Etc/UTC'
    on a UTC host) — all instant-preserving for the NTZ cast. Zones are
    resolved via zoneinfo and probed at two opposite-season instants so a
    DST zone can't slip through."""
    if tz in ("UTC", "Etc/UTC", "GMT", "Etc/GMT", "Z", "Zulu", "Universal"):
        return True
    try:
        import datetime as dt
        from zoneinfo import ZoneInfo

        z = ZoneInfo(tz)
        return all(
            dt.datetime(2026, m, 1, tzinfo=z).utcoffset() == dt.timedelta(0)
            for m in (1, 7)
        )
    except Exception:
        return False


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a DataFrame.

    Parquet carries its own (correct) schema; we assert names match the
    registry rather than re-imposing types, so mismatches fail loudly.
    """
    if name not in schemas.TESTDATA:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    nanos_cols = tuple(
        c for c in _NANOS_TS_COLS.get(name, ()) if _parquet_field_is_nanos(path, c)
    )
    if nanos_cols:
        # Runtime-settable SQL conf, but scoped to THIS read and restored:
        # left set on the caller's session, every later TIMESTAMP(NANOS)
        # parquet read anywhere would silently return raw ns bigints
        # (without this function's footer-verified div-1000 fixup) instead
        # of failing loudly. NOTE the restore covers only the eager plan
        # construction here — the conf is also read at execution time, so
        # the read below materializes the schema immediately under the
        # flag via the .schema() probe before restoring.
        prior = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        try:
            df = spark.read.parquet(path)
            df.schema  # force analysis under the flag
        finally:
            if prior is None:
                spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
            else:
                spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prior)
    else:
        df = spark.read.parquet(path)
    fixes = {}
    for c, t in df.dtypes:
        if c in nanos_cols and t == "bigint":
            # footer-verified TIMESTAMP(NANOS) read as raw ns long →
            # truncate to µs exactly like DuckDB (integer div; see above)
            fixes[c] = F.timestamp_micros(F.expr(f"`{c}` div 1000"))
        elif t == "timestamp_ntz":
            # instant-preserving ONLY under a UTC session: fail loudly on
            # any other tz instead of silently shifting wall-clock values
            # (the caller may hand us a session our factory didn't build —
            # e.g. a default session reports 'Etc/UTC', which IS fine)
            tz = spark.conf.get("spark.sql.session.timeZone")
            if not _is_utc_equivalent(tz):
                raise ValueError(
                    f"{name}.{c} is TIMESTAMP_NTZ; casting to TIMESTAMP requires a "
                    f"UTC session (got spark.sql.session.timeZone={tz!r})"
                )
            fixes[c] = F.col(c).cast("timestamp")
    if fixes:
        df = df.withColumns(fixes)
    expected = [f.name for f in schemas.TESTDATA[name].fields]
    if list(df.columns) != expected:
        raise ValueError(f"{name}: columns {df.columns} != expected {expected}")
    return df


def tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Load several tables at once: ``t = tables(spark, sf, 'orders', ...)``."""
    return {n: table(spark, sf_dir, n) for n in (names or TABLE_NAMES)}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> list[str]:
    """Register the star-schema tables as session temp views so the whole
    engine is usable from PURE SQL (``spark.sql("SELECT … FROM
    lineitem")``) — the surface a reference user writing SQL against
    Postgres would reach for first. Uses ``table()`` under the hood, so
    views inherit the same explicit schemas, timestamp normalization,
    and pushdown behavior as the DataFrame path (a view is a named plan,
    not a copy). Defaults to every known table; returns the registered
    names. Idempotent — re-registration replaces."""
    targets = list(names) if names else list(TABLE_NAMES)
    for name in targets:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
    return targets
