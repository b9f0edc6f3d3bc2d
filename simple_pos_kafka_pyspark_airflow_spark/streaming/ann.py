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

- **quantized storage** (``store_quantized=True``): index rows carry
  (scale, int8 codes) instead of float32 — ~4× less index on disk and
  ~4× less scan I/O per probe, the dominant probe cost at 100 TB.
  Quantized probes rank on the dequantized form (error ≤ scale/2 per
  element); ``probe(..., rescore_from=corpus)`` re-ranks an over-fetched
  candidate set against the exact vectors (the IVF-PQ re-rank shape) and
  returns exactly the brute-force answer as long as the true top-k
  survives the candidate cut.

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
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# pd is module-level on purpose: pandas_udf resolves the (stringified,
# via __future__ annotations) type hints against this module's globals
# (the operators.joins convention).

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
        store_quantized: bool = False,
        store_pq: bool = False,
        pq_m: int = 8,
        pq_ks: int = 16,
    ) -> None:
        """``store_quantized=True`` stores each vector as (scale, int8
        codes) instead of float32 — the index shrinks ~4× and so does
        every probe's scan I/O, which is the dominant cost of a probe at
        100 TB. Probes score the dequantized form (per-element error ≤
        scale/2); pass ``rescore_from`` to ``probe`` to re-rank an
        over-fetched candidate set against the exact corpus vectors.

        ``store_pq=True`` is the tier BELOW int8 (Jégou et al. 2011,
        ``llm.simsearch.pq_train``): each vector stores as ``pq_m`` small
        ints (~32× lighter than fp32 at m=8/d=64), the per-subspace
        codebooks are trained in ``fit`` and persisted next to the
        centroids (same atomic-swap discipline — every batch and every
        probe, across restarts, reads the SAME codebooks), and probes
        rank candidates by ADC lookup tables. PQ scores are rank-only
        approximations, so PQ probes REQUIRE ``rescore_from`` — the
        exact re-rank is part of the published pipeline, not optional.

        Readers auto-detect the layout from the index schema, so one
        index never mixes forms with another's flag."""
        if store_quantized and store_pq:
            raise ValueError("store_quantized and store_pq are mutually exclusive tiers")
        self.spark = spark
        self.path = path.rstrip("/")
        self.centroid_path = self.path + "_centroids"
        self.pq_path = self.path + "_pq_codebooks"
        self.n_cells = n_cells
        self.n_assign = n_assign
        self.vec_col = vec_col
        self.id_col = id_col
        self.store_quantized = store_quantized
        self.store_pq = store_pq
        self.pq_m = pq_m
        self.pq_ks = pq_ks

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
        if self.store_pq:
            cbs = simsearch.pq_train(
                df.select(self.id_col, self.vec_col),
                m=self.pq_m,
                ks=self.pq_ks,
                vec_col=self.vec_col,
                id_col=self.id_col,
            )
            cb_rows = [
                (int(s), int(c), int(p), float(v))
                for s, book in enumerate(cbs)
                for c, word in enumerate(book)
                for p, v in enumerate(word)
            ]
            cb_df = self.spark.createDataFrame(
                cb_rows, "s INT, c INT, pos INT, value DOUBLE"
            )
            overwrite_atomic(cb_df.coalesce(1), self.pq_path)
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

    def _pq_codebooks(self) -> list[list[list[float]]] | None:
        """The persisted PQ codebooks, or None when never fit with
        ``store_pq`` (same discovery discipline as ``_centroids``)."""
        if not fs_dir_has_data(self.spark, self.pq_path):
            return None
        by: dict[tuple[int, int], dict[int, float]] = {}
        for r in self.spark.read.parquet(self.pq_path).collect():
            by.setdefault((r["s"], r["c"]), {})[r["pos"]] = r["value"]
        n_s = max(k[0] for k in by) + 1
        n_c = max(k[1] for k in by) + 1
        if sorted(by) != [(s, c) for s in range(n_s) for c in range(n_c)]:
            raise ValueError(f"corrupt PQ codebook table at {self.pq_path}")
        return [
            [
                [by[(s, c)][p] for p in range(len(by[(s, c)]))]
                for c in range(n_c)
            ]
            for s in range(n_s)
        ]

    # -- ingest ------------------------------------------------------------

    def ingest_batch(self, df: DataFrame) -> None:
        """Assign the batch to cells and append it to the index, laid out
        ``partitionBy(cell)`` so probes partition-prune. An empty batch
        (idle trigger) is a no-op — it must neither crash the Arrow
        assignment nor, worse, bootstrap the quantizer from nothing."""
        if df.isEmpty():
            return
        my_layout = (
            "pq" if self.store_pq else "int8" if self.store_quantized else "float"
        )
        if fs_dir_has_data(self.spark, self.path):
            cols = self.spark.read.parquet(self.path).columns
            stored = "pq" if "pq_code" in cols else "int8" if "q_codes" in cols else "float"
            if stored != my_layout:
                # Appending another layout would not fail loudly: probes
                # auto-detect the layout from the schema, so the minority
                # layout's rows read as nulls and silently vanish from
                # results. Refuse at ingest instead.
                raise ValueError(
                    f"index at {self.path} stores {stored} rows but this "
                    f"writer would append {my_layout} (store_quantized="
                    f"{self.store_quantized}, store_pq={self.store_pq}); "
                    "reopen with the matching flags (or compact() to a new "
                    "path) — mixing layouts makes one layout's vectors "
                    "invisible to probes"
                )
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
        if self.store_quantized:
            # Arrow form: quantizing every ingested vector through the
            # interpreted Column expression would pay rows × dim lambda
            # dispatches per batch; the numpy pass is bit-identical
            assigned = simsearch.quantize_embeddings_arrow(assigned, self.vec_col).select(
                self.id_col, "cell", "q_scale", "q_codes"
            )
        elif self.store_pq:
            cbs = self._pq_codebooks()
            if cbs is None:
                raise ValueError(
                    f"no PQ codebooks at {self.pq_path}: fit() this store_pq "
                    "index before ingesting (the quantizer fallback fit "
                    "covers them only when fit runs through this writer)"
                )
            assigned = simsearch.pq_encode(assigned, cbs, vec_col=self.vec_col).select(
                self.id_col, "cell", "pq_code"
            )
        assigned.write.mode("append").partitionBy("cell").parquet(self.path)

    def dedup_batch(
        self,
        df: DataFrame,
        threshold: float = 0.95,
        max_cell: int | None = 50_000,
    ) -> DataFrame:
        """Corpus-lifetime SEMANTIC dedup at ingest (r13) — the streaming
        twin of ``llm.simsearch.semdedup_prune``, completing the ingest
        ladder's dedup tiers (exact digest → canonical URL → lexical
        minhash → THIS): a batch vector whose cosine to any LANDED vector
        (or to a lower-id vector of the same batch) reaches ``threshold``
        is rejected; survivors are ingested. Catches the paraphrase /
        template / re-encode duplicates no lexical tier can see.

        Shape: the batch assigns to the SAME cells the index stores
        (``ivf_assign`` with this index's quantizer and ``n_assign``
        replication — the recall lever), so the landed comparison is a
        cell-equi-join against a partition-pruned slice of the index;
        never batch × corpus. Within-batch pairs use the within-cell
        self-join (lower id kept). ``max_cell`` drops cells hotter than
        the cap from BOTH pair searches — their vectors are all kept
        (conservative; the ``semdedup_prune``/minhash cap discipline).

        Layouts: float cells compare exact cosines; int8 cells compare
        against the dequantized form (per-element error ≤ scale/2 — the
        same semantics probes already have). PQ indexes refuse: ADC
        scores are rank-only, not cosines, and the index holds no
        vectors to rescore against.

        Crash/replay: a replayed batch finds its own survivors landed
        under the SAME ids — the landed probe ignores same-id matches,
        so decisions repeat exactly; the duplicate appended rows collapse
        in ``compact()``. Empty batch (idle trigger) is a no-op."""
        if self.store_pq:
            raise ValueError(
                "dedup_batch needs cosines; a PQ index stores rank-only ADC "
                "codes and no vectors to rescore against — use the float or "
                "int8 layout for the ingest-dedup tier"
            )
        if df.isEmpty():
            return df
        from pyspark import StorageLevel

        cents = self._centroids()
        if cents is None:
            cents = self.fit(df)
        assigned = (
            simsearch.ivf_assign(
                df.select(self.id_col, self.vec_col),
                cents,
                self.vec_col,
                out_col="cell",
                n_assign=self.n_assign,
            )
            .select(
                F.col(self.id_col).alias("_id"),
                F.col(self.vec_col).alias("_v"),
                "cell",
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        pair_cos = simsearch.pair_cosine_udf()

        pool = assigned
        if max_cell is not None:
            ok = (
                assigned.groupBy("cell")
                .count()
                .where(F.col("count") <= max_cell)
                .drop("count")
            )
            pool = assigned.join(ok, "cell")
        a = pool.select("cell", F.col("_id").alias("_id_a"), F.col("_v").alias("_v_a"))
        b = pool.select(
            F.col("cell").alias("_cell_b"),
            F.col("_id").alias("_id_b"),
            F.col("_v").alias("_v_b"),
        )
        dropped_within = (
            a.join(b, (a["cell"] == b["_cell_b"]) & (a["_id_a"] < b["_id_b"]))
            .where(pair_cos(F.col("_v_a"), F.col("_v_b")) >= threshold)
            .select(F.col("_id_b").alias("_rej"))
        )

        rejected = dropped_within
        if fs_dir_has_data(self.spark, self.path):
            idx = self.spark.read.parquet(self.path)
            if "q_codes" in idx.columns:
                landed_vec = simsearch.dequantize_embedding(
                    F.col("q_codes"), F.col("q_scale")
                )
            else:
                landed_vec = F.col(self.vec_col)
            landed = idx.select(
                "cell",
                F.col(self.id_col).alias("_lid"),
                landed_vec.alias("_lv"),
            )
            if max_cell is not None:
                lok = (
                    landed.groupBy("cell")
                    .count()
                    .where(F.col("count") <= max_cell)
                    .drop("count")
                )
                landed = landed.join(lok, "cell")
            # batch side uses the CAPPED pool (r14, ADVICE): the
            # docstring's contract is that max_cell exempts over-cap
            # cells from BOTH pair searches — joining the uncapped
            # `assigned` here priced a hot batch cell against landed
            # rows while the within-batch search had already skipped it
            dropped_landed = (
                pool.join(landed, "cell")
                .where(F.col("_id") != F.col("_lid"))  # replay: never self
                .where(pair_cos(F.col("_v"), F.col("_lv")) >= threshold)
                .select(F.col("_id").alias("_rej"))
            )
            rejected = rejected.unionByName(dropped_landed)

        kept = (
            df.join(
                rejected.distinct(),
                F.col(self.id_col) == F.col("_rej"),
                "left_anti",
            )
            .localCheckpoint(eager=True)
        )
        assigned.unpersist()
        self.ingest_batch(kept)
        return kept

    def occupancy_drift(self, df: DataFrame, eps: float = 1e-4) -> DataFrame:
        """PSI between the LANDED index's cell-occupancy distribution and
        a batch's assignments — the embedding-side ingest alarm
        (`CorpusDriftMonitor`'s discipline applied at the ANN front
        door): an encoder swap or upstream dataset shift moves vectors
        to different cells long before probe recall visibly degrades,
        and the quantizer is FROZEN (fit once), so occupancy is a stable
        reference. Both sides are n_cells-row histograms — the landed
        side reads ONLY the `cell` partition column (directory values,
        no vector bytes), the batch side is one Arrow assignment pass —
        so this runs per micro-batch at any index size. Rule of thumb
        per `psi_drift`: < 0.1 stable, > 0.25 investigate the encoder.

        Returns (psi, n_bins_compared); raises if the index is empty or
        unfit (no reference to drift against)."""
        from ..operators.validation import psi_drift

        cents = self._centroids()
        if cents is None or not fs_dir_has_data(self.spark, self.path):
            raise ValueError(
                "occupancy_drift needs a fitted, non-empty index — ingest "
                "at least one batch first"
            )

        def occupancy(cells: DataFrame) -> DataFrame:
            counts = cells.groupBy("cell").agg(F.count("*").alias("n"))
            total = counts.agg(F.sum("n").alias("_t"))
            return counts.crossJoin(F.broadcast(total)).select(
                F.lit("cells").alias("_g"),
                F.col("cell").alias("bin"),
                (F.col("n").cast("double") / F.col("_t").cast("double")).alias("frac"),
            )

        landed = occupancy(self.spark.read.parquet(self.path).select("cell"))
        batch = occupancy(
            simsearch.ivf_assign(
                df.select(self.vec_col),
                cents,
                self.vec_col,
                out_col="cell",
                n_assign=self.n_assign,
            ).select("cell")
        )
        return psi_drift(landed, batch, "_g", eps=eps).select("psi", "n_bins_compared")

    # -- query -------------------------------------------------------------

    def probe(
        self,
        query_vec: list[float],
        k: int = 10,
        nprobe: int = 4,
        rescore_from: DataFrame | None = None,
        overfetch: int = 4,
    ) -> DataFrame:
        """Cosine top-k over the ``nprobe`` cells nearest the query.
        Returns (id, score) with the library determinism discipline; ids
        replicated across cells (``n_assign`` > 1) or by batch replays
        dedup before scoring, so results are independent of both.

        On a float index the scores are exact. On a quantized index
        (``store_quantized`` — detected from the stored schema) candidates
        are scored on the dequantized int8 form: within-``scale/2``
        per element, which preserves ranking unless true scores are
        closer than the quantization noise. ``rescore_from`` (the exact
        corpus, keyed by ``id_col``) upgrades that to exact: the top
        ``overfetch×k`` candidates by quantized score are re-scored
        against their true vectors — a broadcast of a k-sized id set
        against the corpus scan, the IVF-PQ re-rank shape — and the final
        top-k is exact as long as the true top-k survives the candidate
        cut (quantization error would need to demote a true neighbor past
        ``(overfetch-1)·k`` impostors for a miss)."""
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
        if "pq_code" in idx.columns:
            # PQ tier: rank candidates by ADC — the per-subspace lookup
            # tables are literal arrays, so scoring is pure JVM
            # element_at gathers over the m-int code column (no vector
            # bytes read, no Python). ADC is a rank-only approximation:
            # the exact re-rank is mandatory, per the published pipeline.
            if rescore_from is None:
                raise ValueError(
                    "a PQ index probe requires rescore_from: ADC scores "
                    "order candidates but are not cosines — the exact "
                    "re-rank is part of the IVF-PQ pipeline, not optional"
                )
            cbs = self._pq_codebooks()
            if cbs is None:
                raise ValueError(f"no PQ codebooks at {self.pq_path}")
            cb = np.array(cbs, dtype="float64")  # (m, ks, dsub)
            m, _, dsub = cb.shape
            tables = [q_hat[s * dsub : (s + 1) * dsub] @ cb[s].T for s in range(m)]
            adc = None
            for s in range(m):
                t_arr = F.array(*[F.lit(float(v)) for v in tables[s]])
                term = F.element_at(
                    t_arr, (F.element_at("pq_code", s + 1) + 1).cast("int")
                )
                adc = term if adc is None else adc + term
            cand_ids = (
                idx.select(self.id_col, adc.alias("_adc"))
                .orderBy(F.col("_adc").desc(), F.col(self.id_col))
                .limit(overfetch * k)
                .select(self.id_col)
            )
            exact = rescore_from.join(F.broadcast(cand_ids), self.id_col).select(
                F.col(self.id_col),
                F.round(simsearch.cosine(F.col(self.vec_col), qcol), 6).alias("score"),
            )
            return exact.orderBy(F.col("score").desc(), F.col(self.id_col)).limit(k)
        quantized = "q_codes" in idx.columns
        vec = (
            simsearch.dequantize_embedding(F.col("q_codes"), F.col("q_scale"))
            if quantized
            else F.col(self.vec_col)
        )
        scored = idx.select(
            F.col(self.id_col),
            F.round(simsearch.cosine(vec, qcol), 6).alias("score"),
        )
        if rescore_from is None:
            return scored.orderBy(F.col("score").desc(), F.col(self.id_col)).limit(k)
        cand_ids = (
            scored.orderBy(F.col("score").desc(), F.col(self.id_col))
            .limit(overfetch * k)
            .select(self.id_col)
        )
        exact = rescore_from.join(F.broadcast(cand_ids), self.id_col).select(
            F.col(self.id_col),
            F.round(simsearch.cosine(F.col(self.vec_col), qcol), 6).alias("score"),
        )
        return exact.orderBy(F.col("score").desc(), F.col(self.id_col)).limit(k)

    def probe_batch(
        self,
        queries: list[tuple[int, list[float]]],
        k: int = 10,
        nprobe: int = 4,
        rescore_from: DataFrame | None = None,
        overfetch: int = 4,
    ) -> DataFrame:
        """Many probes in ONE index pass — the bulk-decontamination shape.

        Each query still sees only its own ``nprobe`` nearest cells (same
        semantics as N ``probe`` calls, pinned by test): the scan prunes
        to the UNION of probed cells (PartitionFilter), then a broadcast
        (query, cell) pair table restricts each query to its cells, and a
        per-query ``row_number`` window — bounded by the rank-limit
        pushdown exactly as in ``cosine_topk_batch`` — yields the top-k.
        Returns (query_id, id, score, rn)."""
        cents = self._centroids()
        if cents is None:
            raise ValueError(f"no quantizer at {self.centroid_path}: fit() or ingest first")
        if not fs_dir_has_data(self.spark, self.path):
            raise ValueError(f"no index rows at {self.path}: ingest before probing")
        if not queries:
            raise ValueError("probe_batch needs at least one query")
        if len({qid for qid, _ in queries}) != len(queries):
            raise ValueError(
                "duplicate query ids: each id labels one result group, so a "
                "repeat would silently fan out the score join"
            )
        c = np.array(cents, dtype="float64")
        c_hat = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)
        pairs = []
        for qid, qv in queries:
            q = np.array(qv, dtype="float64")
            q_hat = q / max(float(np.linalg.norm(q)), 1e-12)
            for cell in np.argsort(-(c_hat @ q_hat))[:nprobe]:
                pairs.append((int(qid), int(cell)))
        all_cells = sorted({cell for _, cell in pairs})
        pair_df = self.spark.createDataFrame(pairs, "query_id long, cell int")
        qvec_df = self.spark.createDataFrame(
            [(int(qid), [float(x) for x in qv]) for qid, qv in queries],
            "query_id long, query_vec array<double>",
        )

        idx = (
            self.spark.read.parquet(self.path)
            .where(F.col("cell").isin(all_cells))
            .join(F.broadcast(pair_df), "cell")
            .dropDuplicates(["query_id", self.id_col])
        )
        from pyspark.sql.window import Window

        if "pq_code" in idx.columns:
            # PQ tier, batched: per-query ADC tables stacked into one
            # (nq, m, ks) closure-broadcast array; each (query, code) row
            # scores through one Arrow gather. Exact re-rank mandatory.
            if rescore_from is None:
                raise ValueError(
                    "a PQ index probe_batch requires rescore_from: ADC "
                    "scores order candidates but are not cosines"
                )
            cbs = self._pq_codebooks()
            if cbs is None:
                raise ValueError(f"no PQ codebooks at {self.pq_path}")
            cb = np.array(cbs, dtype="float64")
            m, _, dsub = cb.shape
            qid_list = [int(qid) for qid, _ in queries]
            qmat = np.stack([np.asarray(qv, dtype="float64") for _, qv in queries])
            qm_hat = qmat / np.maximum(
                np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12
            )
            tables = np.stack(
                [qm_hat[:, s * dsub : (s + 1) * dsub] @ cb[s].T for s in range(m)],
                axis=1,
            )  # (nq, m, ks)
            qi_map = {qid: i for i, qid in enumerate(qid_list)}
            qi_df = self.spark.createDataFrame(
                list(qi_map.items()), "query_id long, _qi int"
            )

            from pyspark.sql.functions import pandas_udf

            @pandas_udf("double")
            def adc(qi: pd.Series, code: pd.Series) -> pd.Series:
                if qi.empty:
                    return pd.Series([], dtype="float64")
                q_idx = qi.to_numpy().astype("int64")
                codes = np.stack(code.to_numpy()).astype("int64")
                out = np.zeros(len(q_idx), dtype="float64")
                for s in range(m):
                    out += tables[q_idx, s, codes[:, s]]
                return pd.Series(out)

            ranked = (
                idx.join(F.broadcast(qi_df), "query_id")
                .select("query_id", self.id_col, adc("_qi", "pq_code").alias("_adc"))
            )
            wa = Window.partitionBy("query_id").orderBy(
                F.col("_adc").desc(), F.col(self.id_col)
            )
            cand = (
                ranked.withColumn("_rn", F.row_number().over(wa))
                .where(F.col("_rn") <= overfetch * k)
                .select("query_id", self.id_col)
            )
            scored = (
                cand.join(rescore_from.select(self.id_col, self.vec_col), self.id_col)
                .join(F.broadcast(qvec_df), "query_id")
                .select(
                    "query_id",
                    F.col(self.id_col),
                    F.round(
                        simsearch.cosine(F.col(self.vec_col), F.col("query_vec")), 6
                    ).alias("score"),
                )
            )
        else:
            quantized = "q_codes" in idx.columns
            vec = (
                simsearch.dequantize_embedding(F.col("q_codes"), F.col("q_scale"))
                if quantized
                else F.col(self.vec_col)
            )
            scored = idx.join(F.broadcast(qvec_df), "query_id").select(
                "query_id",
                F.col(self.id_col),
                F.round(simsearch.cosine(vec, F.col("query_vec")), 6).alias("score"),
            )
        w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col(self.id_col))
        return (
            scored.withColumn("rn", F.row_number().over(w).cast("int"))
            .where(F.col("rn") <= k)
            .select("query_id", self.id_col, "score", "rn")
        )

    # -- maintenance -------------------------------------------------------

    def rebuild(self, vectors: DataFrame | None = None) -> None:
        """Remediate a fired ``occupancy_drift`` alarm (r14, VERDICT
        task 4) — the tested path from alarm to fix: re-fit the coarse
        quantizer and MIGRATE every index row to its new cell, so cell
        occupancy (and with it probe recall) reflects where the vectors
        actually live again.  An un-actionable alarm is a pager, not a
        pipeline; this is the action.

        Two modes:

        - ``vectors=None`` — corpus-CONTENT drift (the ingest mixture
          moved; the encoder did not): the quantizer re-fits from the
          LANDED vectors and landed rows re-assign in place.  The float
          tier re-assigns exactly; the int8 tier re-assigns from the
          dequantized form (per-element error ≤ scale/2 — the same
          semantics probes already score with) and each row KEEPS its
          original (scale, codes), so migration loses no precision.
          A PQ index REFUSES loudly: it stores rank-only codes and no
          vectors to re-assign from — rebuild it with ``vectors=``.
        - ``vectors=`` an (id, vec) frame — ENCODER swap: the corpus
          re-embedded under the new encoder.  The quantizer, the index
          rows, and (PQ tier) the codebooks are rebuilt wholesale from
          these exact vectors in the index's STORED layout — same ids,
          new geometry.  This is the only rebuild mode a PQ index
          supports, and the int8 tier re-encodes fresh codes here.

        Atomicity: the new index is staged completely first
        (``compact()``'s tombstone discipline — a crash during staging
        leaves the live index untouched), then the index, the centroid
        table, and (PQ) the codebooks swap in sequence.  A crash
        BETWEEN swaps leaves a new layout under the old quantizer (or
        vice versa): probes stay well-formed (scores are real cosines,
        ids dedup) but cell pruning degrades until ``rebuild`` is
        re-run — it is idempotent, re-deriving everything from landed
        rows (or ``vectors``), so re-running converges."""
        if not fs_dir_has_data(self.spark, self.path):
            raise ValueError(
                f"rebuild needs a non-empty index at {self.path}: nothing to migrate"
            )
        idx = self.spark.read.parquet(self.path)
        stored_pq = "pq_code" in idx.columns
        stored_int8 = "q_codes" in idx.columns
        rows = idx.drop("cell").dropDuplicates([self.id_col])
        if vectors is None:
            if stored_pq:
                raise ValueError(
                    "a PQ index stores rank-only codes and no vectors to "
                    "re-assign from — pass vectors= (the exact corpus, "
                    "re-embedded if the encoder moved) to rebuild it"
                )
            if stored_int8:
                src = rows.select(
                    F.col(self.id_col),
                    simsearch.dequantize_embedding(
                        F.col("q_codes"), F.col("q_scale")
                    ).alias(self.vec_col),
                )
            else:
                src = rows.select(self.id_col, self.vec_col)
        else:
            src = vectors.select(self.id_col, self.vec_col)
        cents = simsearch.ivf_centroids(
            src, self.n_cells, self.vec_col, self.id_col
        )
        if not cents:
            raise ValueError("rebuild found zero vectors to re-fit the quantizer from")
        assigned = simsearch.ivf_assign(
            src, cents, self.vec_col, out_col="cell", n_assign=self.n_assign
        )
        cbs = None
        if vectors is None:
            if stored_int8:
                # migrate: new cell, original (scale, codes) — no
                # quantize→dequantize round trip touches the payload
                new_rows = rows.select(self.id_col, "q_scale", "q_codes").join(
                    assigned.select(self.id_col, "cell"), self.id_col
                )
            else:
                new_rows = assigned
        else:
            if stored_int8:
                new_rows = simsearch.quantize_embeddings_arrow(
                    assigned, self.vec_col
                ).select(self.id_col, "cell", "q_scale", "q_codes")
            elif stored_pq:
                cbs = simsearch.pq_train(
                    src, m=self.pq_m, ks=self.pq_ks,
                    vec_col=self.vec_col, id_col=self.id_col,
                )
                new_rows = simsearch.pq_encode(
                    assigned, cbs, vec_col=self.vec_col
                ).select(self.id_col, "cell", "pq_code")
            else:
                new_rows = assigned
        staging = staging_sibling(self.path)
        try:
            new_rows.write.mode("overwrite").partitionBy("cell").parquet(staging)
        except Exception:
            from ..sources.io import _fs_for

            fs, p = _fs_for(self.spark, staging)
            if fs.exists(p):
                fs.delete(p, True)
            raise
        fs_recover_tombstone(self.spark, self.path)
        fs_swap_in(self.spark, staging, self.path)
        cdf = self.spark.createDataFrame(
            [
                (int(c), int(p), float(v))
                for c, row in enumerate(cents)
                for p, v in enumerate(row)
            ],
            "cell INT, pos INT, value DOUBLE",
        )
        overwrite_atomic(cdf.coalesce(1), self.centroid_path)
        if cbs is not None:
            cb_df = self.spark.createDataFrame(
                [
                    (int(s), int(c), int(p), float(v))
                    for s, book in enumerate(cbs)
                    for c, word in enumerate(book)
                    for p, v in enumerate(word)
                ],
                "s INT, c INT, pos INT, value DOUBLE",
            )
            overwrite_atomic(cb_df.coalesce(1), self.pq_path)

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
