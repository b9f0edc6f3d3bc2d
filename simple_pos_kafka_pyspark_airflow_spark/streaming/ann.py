"""Ingest-time ANN index: the streaming complement of ``llm.simsearch``.

``cosine_topk_ivf`` builds its IVF index on the fly — right for ad-hoc
queries, wrong for a corpus that arrives as a stream and is probed many
times. ``IncrementalIvfIndex`` moves the index build to ingest, exactly
as ``IncrementalMinhashIndex`` does for text near-dup state:

- **fit once**: centroids come from a bootstrap corpus (``fit``) or,
  unattended, from the first micro-batch; they land as a tiny parquet
  table (cell, pos, value) next to the index via the atomic snapshot
  swap, so every later batch/probe — including after a restart — reads
  the SAME quantizer. Re-fitting per batch would silently shear the
  index (same vector, different cell across batches).
- **per batch** (``ingest_batch`` — plain DataFrames, slots into
  ``foreachBatch`` or a batch backfill identically): assign each vector
  to its ``n_assign`` nearest cells (one Arrow matmul pass,
  ``llm.simsearch.ivf_assign``) and append to the index
  ``partitionBy("cell")`` — the cell id becomes the DIRECTORY layout.
- **probe**: rank cells against the query on the driver
  (O(n_cells × dim)), then read ONLY the probed cells — the cell filter
  is a PartitionFilter on the scan (pinned by
  ``test_incremental_ivf_probe_partition_pruning``), so a probe reads
  ``nprobe·n_assign/n_cells`` of the index no matter how large it grows.
  Scoring is the exact JVM cosine with the library-wide determinism
  discipline (6 dp round, id tiebreak).

Crash/replay: the per-batch append is plain parquet, so a replayed
``foreachBatch`` batch lands its rows twice. Duplicate rows cannot
change probe RESULTS (probes dedup on the vector id before scoring, and
a vector's replicated rows carry the identical embedding) — they only
grow the index; ``compact()`` rewrites it deduplicated per (id, cell)
under the same atomic swap. Back the index with a transactional table
format in production if replays are frequent.

The reference has no similarity surface at all; this extends the north
star (SURVEY.md §2.11) to the streaming half of the ANN story.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..llm import simsearch
from ..sources.io import (
    fs_dir_has_data,
    fs_recover_tombstone,
    fs_swap_in,
    overwrite_atomic,
    staging_sibling,
)


class IncrementalIvfIndex:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        n_cells: int = 16,
        n_assign: int = 1,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
    ) -> None:
        self.spark = spark
        self.path = path.rstrip("/")
        self.centroid_path = self.path + "_centroids"
        self.n_cells = n_cells
        self.n_assign = n_assign
        self.vec_col = vec_col
        self.id_col = id_col

    # -- quantizer ---------------------------------------------------------

    def fit(self, df: DataFrame) -> list[list[float]]:
        """Build the coarse quantizer from ``df`` (deterministic:
        hash-sampled seeds + one Lloyd refinement) and persist it
        atomically. Call once with a representative bootstrap corpus;
        ``ingest_batch`` falls back to fitting on its first batch when
        no quantizer exists — fine for steady streams, but a tiny or
        skewed first batch makes a poor quantizer, so prefer an explicit
        ``fit``."""
        cents = simsearch.ivf_centroids(
            df.select(self.id_col, self.vec_col), self.n_cells, self.vec_col, self.id_col
        )
        if not cents:
            raise ValueError(
                "fit() needs a non-empty bootstrap corpus: zero vectors yield no "
                "quantizer (an empty first micro-batch must not define the index)"
            )
        rows = [
            (int(c), int(p), float(v))
            for c, row in enumerate(cents)
            for p, v in enumerate(row)
        ]
        cdf = self.spark.createDataFrame(rows, "cell INT, pos INT, value DOUBLE")
        overwrite_atomic(cdf.coalesce(1), self.centroid_path)
        return cents

    def _centroids(self) -> list[list[float]] | None:
        """The persisted quantizer, or None when never fit. Discovery goes
        through the Hadoop FS of the path's scheme (object-store safe,
        same discipline as the other incremental indexes)."""
        if not fs_dir_has_data(self.spark, self.centroid_path):
            return None
        by: dict[int, dict[int, float]] = {}
        for r in self.spark.read.parquet(self.centroid_path).collect():
            by.setdefault(r["cell"], {})[r["pos"]] = r["value"]
        if sorted(by) != list(range(len(by))):
            raise ValueError(
                f"corrupt centroid table at {self.centroid_path}: cells {sorted(by)}"
            )
        return [[by[c][p] for p in range(len(by[c]))] for c in sorted(by)]

    # -- ingest ------------------------------------------------------------

    def ingest_batch(self, df: DataFrame) -> None:
        """Assign the batch to cells and append it to the index, laid out
        ``partitionBy(cell)`` so probes partition-prune. An empty batch
        (idle trigger) is a no-op — it must neither crash the Arrow
        assignment nor, worse, bootstrap the quantizer from nothing."""
        if df.isEmpty():
            return
        cents = self._centroids()
        if cents is None:
            cents = self.fit(df)
        assigned = simsearch.ivf_assign(
            df.select(self.id_col, self.vec_col),
            cents,
            self.vec_col,
            out_col="cell",
            n_assign=self.n_assign,
        )
        assigned.write.mode("append").partitionBy("cell").parquet(self.path)

    # -- query -------------------------------------------------------------

    def probe(self, query_vec: list[float], k: int = 10, nprobe: int = 4) -> DataFrame:
        """Exact cosine top-k over the ``nprobe`` cells nearest the query.
        Returns (id, score) with the library determinism discipline; ids
        replicated across cells (``n_assign`` > 1) or by batch replays
        dedup before scoring, so results are independent of both."""
        cents = self._centroids()
        if cents is None:
            raise ValueError(f"no quantizer at {self.centroid_path}: fit() or ingest first")
        if not fs_dir_has_data(self.spark, self.path):
            raise ValueError(
                f"no index rows at {self.path}: the quantizer exists but nothing "
                "was ever ingested (or the first append crashed before commit)"
            )
        c = np.array(cents, dtype="float64")
        c_hat = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)
        q = np.array(query_vec, dtype="float64")
        q_hat = q / max(float(np.linalg.norm(q)), 1e-12)
        cells = [int(x) for x in np.argsort(-(c_hat @ q_hat))[:nprobe]]
        idx = (
            self.spark.read.parquet(self.path)
            .where(F.col("cell").isin(cells))
            .dropDuplicates([self.id_col])
        )
        qcol = F.array(*[F.lit(float(x)) for x in query_vec])
        scored = idx.select(
            F.col(self.id_col),
            F.round(simsearch.cosine(F.col(self.vec_col), qcol), 6).alias("score"),
        )
        return scored.orderBy(F.col("score").desc(), F.col(self.id_col)).limit(k)

    # -- maintenance -------------------------------------------------------

    def compact(self) -> None:
        """Rewrite the index with replay-duplicated rows collapsed per
        (id, cell), keeping the partitioned layout, under the atomic
        snapshot swap (a crash leaves the old or the new index, never a
        half-written one)."""
        if not fs_dir_has_data(self.spark, self.path):
            return
        landed = self.spark.read.parquet(self.path).dropDuplicates([self.id_col, "cell"])
        staging = staging_sibling(self.path)
        try:
            landed.write.mode("overwrite").partitionBy("cell").parquet(staging)
        except Exception:
            from ..sources.io import _fs_for

            fs, p = _fs_for(self.spark, staging)
            if fs.exists(p):
                fs.delete(p, True)
            raise
        fs_recover_tombstone(self.spark, self.path)
        fs_swap_in(self.spark, staging, self.path)
