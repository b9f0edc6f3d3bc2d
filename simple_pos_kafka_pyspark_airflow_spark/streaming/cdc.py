"""Streaming CDC: add/edit/remove event streams applied to a warehouse.

The reference's consumer applies 9 topics of add/edit/remove events to CSV
state files one message at a time (full-file rewrite per event,
``kafka_consumer.py:96-106,186,280``), then an hourly Airflow DAG diffs
those files against Postgres and replays the diff as driver-side DELETE +
UPSERT (``POS_spark_dag.py:155-193``). Two lossy hops.

Here CDC is one hop: the typed event stream is applied directly to the
warehouse via ``foreachBatch`` over the batch upsert kernel
(``operators/upsert.py``) — the canonical Structured Streaming CDC shape.

Semantics (stronger than the reference, documented per SURVEY.md §7):

- **ordering**: within a micro-batch, the *last* event per key wins
  (event-time order, unique tiebreak) — the reference relies on Kafka
  per-partition order plus single-threaded apply.
- **idempotence**: replaying a batch yields the same table, so
  checkpoint-recovery gives effective exactly-once into the parquet sink.
- **deletes**: an explicit ``op`` column (``upsert``/``delete``), not the
  reference's delete-by-absence heuristic; ``apply_snapshot`` still covers
  the snapshot-diff mode.

Scale: each micro-batch does one pk shuffle (the anti join) + one write.
Warehouse stored bucketed by pk ⇒ the join is co-located. The
read-modify-write of the whole table is the plain-parquet cost (no Delta
in this container); the swap is atomic via staged directory rename.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import upsert as upsert_ops
from ..sources.io import (
    _fs_for,
    fs_dir_has_data,
    fs_recover_tombstone,
    fs_swap_in,
    staging_sibling,
    write_staged,
)

OP_COL = "_op"
OP_UPSERT = "upsert"
OP_DELETE = "delete"


def latest_per_key(
    events: DataFrame, pk: list[str], order_col: str, tiebreak: list[str] | None = None
) -> DataFrame:
    """Collapse a CDC batch to its final event per key: row_number over
    (pk) ordered by ``order_col`` desc — the distributed version of the
    reference's sequential last-write-wins apply loop.

    ``tiebreak`` names extra columns (e.g. Kafka offset, monotonic event
    id) appended desc to the ordering so equal-``order_col`` events within
    a batch resolve deterministically. When absent, ``_tiebreak_all``
    orders by every remaining column as a last resort — deterministic for
    any input, if semantically arbitrary."""
    order = [F.col(order_col).desc()]
    if tiebreak:
        order += [F.col(c).desc() for c in tiebreak]
    else:
        order += [F.col(c).desc() for c in events.columns if c != order_col and c not in pk]
    w = Window.partitionBy(*pk).orderBy(*order)
    return events.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).drop("__rn")


def apply_cdc_batch(
    table: DataFrame,
    events: DataFrame,
    pk: str | list[str],
    order_col: str,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Apply one micro-batch of ``upsert``/``delete`` events to a table
    snapshot, returning the new snapshot. Pure DataFrame logic — unit-
    testable without any stream running."""
    keys = [pk] if isinstance(pk, str) else list(pk)
    final = latest_per_key(events, keys, order_col, tiebreak)
    upserts = final.where(F.col(OP_COL) == OP_UPSERT).drop(OP_COL, order_col)
    deletes = final.where(F.col(OP_COL) == OP_DELETE).select(*keys)
    merged = upsert_ops.merge_delta(table, upserts, pk=keys)
    return merged.join(deletes, on=keys, how="left_anti")


class ParquetCdcSink:
    """Checkpointable CDC target over plain parquet.

    ``foreach_batch`` is handed to ``writeStream.foreachBatch``; each call
    reads the current snapshot, applies the batch, and atomically swaps in
    the new snapshot (write to staging dir, then rename). Idempotent:
    re-running a batch after a crash converges to the same table.

    With Delta/Iceberg available this class collapses to a single
    ``MERGE`` statement; the interface is the stable part.
    """

    def __init__(
        self, spark: SparkSession, path: str, pk: str | list[str], order_col: str, schema: str
    ) -> None:
        self.spark = spark
        self.path = path
        self.pk = [pk] if isinstance(pk, str) else list(pk)
        self.order_col = order_col
        self.schema = schema  # DDL string: snapshot columns (no _op / order col)

    def read(self) -> DataFrame:
        fs_recover_tombstone(self.spark, self.path)
        if fs_dir_has_data(self.spark, self.path):
            return self.spark.read.schema(self.schema).parquet(self.path)
        return self.spark.createDataFrame([], self.schema)

    def foreach_batch(self, events: DataFrame, batch_id: int) -> None:
        if events.isEmpty():
            return
        current = self.read()
        new_snapshot = apply_cdc_batch(current, events, self.pk, self.order_col)
        # Stage as a SIBLING of the live dir (same filesystem, so the
        # promotion is a rename, never a copy), written BEFORE the live
        # dir is touched (the plan reads the live dir). The swap itself
        # (live → tombstone, staging → live, drop tombstone) and its
        # crash-window recovery live in sources.io.fs_swap_in /
        # fs_recover_tombstone — Hadoop-FS surgery, valid on any scheme.
        staging = staging_sibling(self.path)
        write_staged(new_snapshot, staging)
        fs_swap_in(self.spark, staging, self.path)


class ScdParquetCdcSink(ParquetCdcSink):
    """CDC sink that keeps the current snapshot AND an SCD2 version
    history: every net change lands as a closed/open version chain, so the
    warehouse answers as-of queries under the live streaming pipeline.

    Composition per batch (all plain DataFrame ops):

    1. ``apply_cdc_batch`` → the new snapshot (inherited semantics);
    2. ``diff_snapshots(old, new)`` → the batch's NET changelog. Diffing
       snapshots rather than versioning raw events is what makes history
       maintenance idempotent and noise-free: an event that restates the
       current value emits nothing, and a replayed batch (crash between
       the two directory swaps, or checkpoint commit failure) diffs to
       empty or filters to already-present versions — no duplicate chain
       entries either way;
    3. upserts → ``scd2_apply`` (close current version at the event's
       CDC timestamp, open the new one); deletes → ``scd2_close`` (close,
       nothing opens). New versions are keyed (pk, valid_from): an
       incoming version whose key already exists in history is a replay
       and is dropped before apply;
    4. write both staging dirs, then swap HISTORY first, snapshot second.
       Order matters: if the crash lands between the swaps, the replayed
       batch still sees the OLD snapshot, recomputes the same non-empty
       diff, and the (pk, valid_from) filter makes the history update a
       no-op — whereas snapshot-first would replay an empty diff and lose
       the batch's versions forever.

    Scale: everything is pk-shuffled exactly like the base sink plus one
    (pk, valid_from) anti join on the history — co-located when both
    tables are bucketed by pk. With Delta/Iceberg the two swaps become
    one transaction; the composition is the stable part.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        history_path: str,
        pk: str | list[str],
        order_col: str,
        schema: str,
        order_type: str = "timestamp",
    ) -> None:
        super().__init__(spark, path, pk, order_col, schema)
        self.history_path = history_path
        # valid_from/valid_to take the version clock's own type: event-time
        # timestamps and monotonic sequence numbers both work
        self.history_schema = f"{schema}, valid_from {order_type}, valid_to {order_type}"

    def read_history(self) -> DataFrame:
        fs_recover_tombstone(self.spark, self.history_path)
        if fs_dir_has_data(self.spark, self.history_path):
            return self.spark.read.schema(self.history_schema).parquet(self.history_path)
        return self.spark.createDataFrame([], self.history_schema)

    def foreach_batch(self, events: DataFrame, batch_id: int) -> None:
        if events.isEmpty():
            return
        current = self.read()
        new_snapshot = apply_cdc_batch(current, events, self.pk, self.order_col)
        changes = diff_snapshots_with_ts(current, new_snapshot, events, self.pk, self.order_col)
        history = self.read_history()
        upserts = changes.where(F.col(OP_COL) == OP_UPSERT).drop(OP_COL)
        # replay guard: a version is identified by its FULL content (all
        # schema columns, incl. the event timestamp), not just
        # (pk, valid_from) — a legitimate second change that lands with
        # the same coarse-granularity timestamp as the version it
        # supersedes differs in at least one value column and must NOT be
        # classified as a replay (it would silently vanish from history).
        # eqNullSafe per column so a NULL-bearing version still matches
        # its replayed twin. A true same-ts update closes the prior
        # version at its own valid_from (zero-length lifespan recording
        # the superseded value) and opens the new one — deterministic
        # last-writer-wins, consistent with the snapshot's tiebreak.
        hist_versions = history.select(
            *[c for c in upserts.columns if c != self.order_col],
            F.col("valid_from").alias(self.order_col),
        ).alias("h")
        u = upserts.alias("u")
        same = None
        for c in upserts.columns:
            e = F.col(f"u.{c}").eqNullSafe(F.col(f"h.{c}"))
            same = e if same is None else (same & e)
        fresh = u.join(hist_versions, same, "left_anti")
        new_history = upsert_ops.scd2_apply(history, fresh, self.pk, self.order_col)
        deletes = changes.where(F.col(OP_COL) == OP_DELETE).select(*self.pk, self.order_col)
        new_history = upsert_ops.scd2_close(new_history, deletes, self.pk, self.order_col)

        snap_staging = staging_sibling(self.path)
        hist_staging = staging_sibling(self.history_path)
        # materialize BOTH before touching either live dir (plans read them)
        write_staged(new_snapshot, snap_staging)
        try:
            write_staged(new_history, hist_staging)
        except Exception:
            # the snapshot staging already landed — reclaim it too, or the
            # pair of failed stagings leaks per retry
            fs, p = _fs_for(self.spark, snap_staging)
            if fs.exists(p):
                fs.delete(p, True)
            raise
        # swap HISTORY first, snapshot second (see class docstring)
        fs_swap_in(self.spark, hist_staging, self.history_path)
        fs_swap_in(self.spark, snap_staging, self.path)


def diff_snapshots_with_ts(
    old: DataFrame,
    new: DataFrame,
    events: DataFrame,
    pk: list[str],
    order_col: str,
) -> DataFrame:
    """``diff_snapshots`` stamped with each changed key's CDC timestamp
    (the winning event's ``order_col``) — every changed key necessarily
    has an event in the batch, so the join is lossless."""
    changes = upsert_ops.diff_snapshots(old, new, pk, op_col=OP_COL)
    eff = latest_per_key(events, pk, order_col).select(*pk, order_col)
    return changes.join(eff, on=pk, how="inner")
