"""Streaming corpus ingestion: the LLM-pipeline front door.

Composes the batch text operators (``llm.textops``) with Structured
Streaming so a document firehose (Kafka topic or landing directory) is
quality-gated and exact-deduplicated BEFORE it ever lands in the corpus —
the ingest-time half of the dedup ladder (near-dup passes run as batch
compaction over the landed corpus; see ``llm.dedup``).

Stages (all codegen; the stream never leaves the JVM):

1. quality gate — ``textops.quality_score`` plus a minimum length, as one
   projection; rejects are counted, not silently dropped (route the
   complement to a quarantine sink in production);
2. exact dedup — ``dropDuplicates`` on ``sha2(text)`` bounded by a
   watermark: state holds one 32-byte digest per document seen within the
   lateness horizon, so memory is O(docs/horizon), not O(corpus);
3. typed landing — append sink partitioned however the caller's writer
   chooses (date partitioning composes downstream).

Scale: the dedup state shuffles on the digest — uniformly distributed by
construction, so no skew; the watermark bounds state for an infinite
stream. The reference has no analogue (its dedup guard is a driver-side
``key in df.values`` scan, ``kafka_producer.py:41-58``); this is that
guard made distributed, bounded, and exactly-once.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..llm import dedup as dedup_ops
from ..llm import textops


def corpus_ingest(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    min_quality: float = 0.3,
    min_tokens: int = 3,
    watermark: str = "1 hour",
) -> DataFrame:
    """Quality-gate + watermark-bounded exact dedup over a document stream
    (works identically on a batch frame — same plan, no stream required).

    Returns the surviving documents with ``quality`` and ``text_sha``
    columns attached; duplicates within the watermark horizon keep only
    the first arrival.
    """
    scored = docs.withColumn("quality", textops.quality_score(F.col(text_col))).withColumn(
        "n_tokens", textops.token_count(F.col(text_col))
    )
    kept = scored.where(
        (F.col("quality") >= F.lit(min_quality)) & (F.col("n_tokens") >= F.lit(min_tokens))
    )
    hashed = kept.withColumn("text_sha", F.sha2(F.col(text_col), 256))
    if hashed.isStreaming:
        hashed = hashed.withWatermark(ts_col, watermark)
    return hashed.dropDuplicates(["text_sha"])


def banded_index_rows(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_shingle: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """The storable LSH index form of a document set: one row per
    (doc, band) carrying the band's bucket hash and the doc's shingle-hash
    set — everything a later batch needs to near-dup against this corpus
    WITHOUT re-reading its text. Schema: (doc_id, band, bucket, sh)."""
    rows = num_hashes // bands
    doc_tbl = dedup_ops.minhash_doc_table(docs, text_col, id_col, n_shingle, num_hashes)
    return doc_tbl.select(
        F.col("_id").alias("doc_id"),
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band"),
        F.col("_sig"),
        F.col("_sh").alias("sh"),
    ).select(
        "doc_id",
        "band",
        F.xxhash64(F.array_join(F.slice("_sig", F.col("band") * rows + 1, rows), ",")).alias(
            "bucket"
        ),
        "sh",
    )


class IncrementalMinhashIndex:
    """Near-dup dedup at ingest, incrementally: an LSH band-bucket index of
    everything already landed, appended per micro-batch.

    Per batch (``dedup_batch`` — plain DataFrames, so it slots into
    ``foreachBatch`` or a batch backfill identically):

    1. index the batch (``banded_index_rows``);
    2. candidates = batch ⋈ landed index on (band, bucket) — at 100 TB
       the landed index is stored partitioned/bucketed by (band, bucket),
       so this probe is a co-located join against a table that is orders
       of magnitude smaller than the corpus text (64 longs + shingle
       hashes per doc);
    3. exact-Jaccard verify candidates; batch docs matching a landed doc
       at ≥ threshold are rejected;
    4. within-batch near-dups: any doc appearing as the larger id of a
       pair is dropped, so chains collapse toward their minimum (A~B~C
       drops B and C, keeping A — the cluster-representative policy;
       for exact component semantics over huge batches use
       ``llm.dedup.dedup_clusters`` on the pair list instead);
    5. survivors' index rows append to the landed index.

    The index directory is the only state — no driver memory, no
    streaming state store — so the dedup horizon is the whole corpus
    lifetime, unlike watermark-bounded ``dropDuplicates``.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        text_col: str = "text",
        id_col: str = "doc_id",
        jaccard_threshold: float = 0.8,
        n_shingle: int = 3,
        num_hashes: int = 64,
        bands: int = 16,
    ) -> None:
        self.spark = spark
        self.path = path
        self.text_col = text_col
        self.id_col = id_col
        self.threshold = jaccard_threshold
        self.n_shingle = n_shingle
        self.num_hashes = num_hashes
        self.bands = bands

    def _landed(self) -> DataFrame | None:
        if os.path.isdir(self.path) and any(
            f.endswith(".parquet") for f in os.listdir(self.path)
        ):
            return self.spark.read.parquet(self.path)
        return None

    def dedup_batch(self, docs: DataFrame) -> DataFrame:
        """Return the batch rows that are NOT near-duplicates of landed or
        earlier-in-batch documents, and append their index rows.

        Cache lifetime: this runs once per micro-batch for the lifetime of
        a stream, so every intermediate is either eagerly checkpointed
        (truncating lineage AND bounding what later plans re-derive) or
        explicitly unpersisted before return — per-batch state must not
        accrete in the executor block manager.
        """
        from pyspark import StorageLevel

        jac_ok = F.col("jaccard") >= self.threshold

        # within-batch: greedy min-id keeper over the pair list
        pairs = dedup_ops.near_dup_pairs_minhash(
            docs, self.text_col, self.id_col,
            n_shingle=self.n_shingle, num_hashes=self.num_hashes, bands=self.bands,
            jaccard_threshold=self.threshold,
        )
        batch_drops = pairs.select(F.col("id_b").alias(self.id_col)).distinct()
        kept = docs.join(batch_drops, self.id_col, "left_anti").localCheckpoint(eager=True)

        idx = banded_index_rows(
            kept, self.text_col, self.id_col, self.n_shingle, self.num_hashes, self.bands
        ).persist(StorageLevel.MEMORY_AND_DISK)

        landed = self._landed()
        if landed is not None:
            cand = (
                idx.alias("new")
                .join(landed.alias("old"), ["band", "bucket"])
                .where(F.col("new.doc_id") != F.col("old.doc_id"))
                .select(
                    F.col("new.doc_id").alias("doc_id"),
                    F.col("old.doc_id").alias("old_id"),
                    F.col("new.sh").alias("sh_new"),
                    F.col("old.sh").alias("sh_old"),
                )
                # collapse multi-band hits of the SAME (new, old) pair; every
                # distinct landed witness still gets verified — keeping one
                # arbitrary witness per new doc would miss dups whose kept
                # witness happens to fall below threshold
                .dropDuplicates(["doc_id", "old_id"])
            )
            inter = F.size(F.array_intersect("sh_new", "sh_old"))
            union = F.size("sh_new") + F.size("sh_old") - inter
            dup_ids = (
                cand.withColumn("jaccard", inter / F.greatest(union, F.lit(1)))
                .where(jac_ok)
                .select("doc_id")
                .distinct()
            )
            kept = kept.join(dup_ids, self.id_col, "left_anti").localCheckpoint(eager=True)
            idx_out = idx.join(
                dup_ids.withColumnRenamed(self.id_col, "doc_id"), "doc_id", "left_anti"
            )
        else:
            idx_out = idx
        idx_out.write.mode("append").parquet(self.path)
        idx.unpersist()
        return kept
