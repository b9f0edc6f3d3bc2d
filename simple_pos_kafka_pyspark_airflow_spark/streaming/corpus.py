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
2. exact dedup — ``dropDuplicatesWithinWatermark`` on ``sha2(text)``:
   state holds one 32-byte digest per document until the watermark passes
   its event time + delay, so memory is O(docs/horizon), not O(corpus).
   (Plain ``dropDuplicates`` would NOT evict state on a subset of columns
   that excludes the event-time column — it grows O(all distinct docs)
   on an unbounded stream, which is exactly the bound this stage must
   avoid.);
3. typed landing — append sink partitioned however the caller's writer
   chooses (date partitioning composes downstream).

Scale: the dedup state shuffles on the digest — uniformly distributed by
construction, so no skew; the watermark bounds state for an infinite
stream. The reference has no analogue (its dedup guard is a driver-side
``key in df.values`` scan, ``kafka_producer.py:41-58``); this is that
guard made distributed, bounded, and exactly-once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..llm import dedup as dedup_ops
from ..llm import textops


def _read_landed_index(spark: SparkSession, path: str) -> DataFrame | None:
    """Shared index discovery for the incremental indexes: probe through
    the Hadoop FileSystem of the path's own scheme (works on
    file:/S3A/HDFS/ABFS alike — never a driver-local ``os`` probe, which
    would return "no index" on an object store and silently skip
    landed-corpus dedup). Returns None ONLY for a never-committed index:
    a missing path, an empty directory, or a directory holding nothing
    but hidden entries (parquet's ``_temporary`` from a crashed first
    append, ``_SUCCESS`` markers). An existing committed path that then
    fails to read as parquet is a real error and raises."""
    from ..sources.io import fs_dir_has_data

    if not fs_dir_has_data(spark, path):
        return None
    return spark.read.parquet(path)


def corpus_ingest(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    min_quality: float = 0.3,
    min_tokens: int = 3,
    watermark: str = "1 hour",
) -> DataFrame:
    """Quality-gate + watermark-bounded exact dedup over a document stream
    (a batch frame takes the same gate + ``dropDuplicates`` plan).

    Returns the surviving documents with ``quality`` and ``text_sha``
    columns attached; duplicates arriving within the watermark horizon of
    the first arrival keep only that first arrival. On the streaming path
    this is ``dropDuplicatesWithinWatermark`` (Spark >= 3.5): unlike
    ``dropDuplicates(subset)``, it evicts a key's state once the watermark
    passes its event time + delay, so state is bounded by the horizon —
    the documented O(docs/horizon) memory bound. The trade is the dedup
    guarantee's scope: a duplicate arriving AFTER the horizon is kept
    (re-ingested); the near-dup compaction pass over the landed corpus
    (``llm.dedup`` / ``IncrementalMinhashIndex``) is the corpus-lifetime
    backstop.
    """
    scored = docs.withColumn("quality", textops.quality_score(F.col(text_col))).withColumn(
        "n_tokens", textops.token_count(F.col(text_col))
    )
    kept = scored.where(
        (F.col("quality") >= F.lit(min_quality)) & (F.col("n_tokens") >= F.lit(min_tokens))
    )
    hashed = kept.withColumn("text_sha", F.sha2(F.col(text_col), 256))
    if hashed.isStreaming:
        return hashed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["text_sha"]
        )
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
    return banded_index_rows_from_table(doc_tbl, num_hashes, bands)


def banded_index_rows_from_table(
    doc_tbl: DataFrame, num_hashes: int = 64, bands: int = 16
) -> DataFrame:
    """``banded_index_rows`` over a prebuilt ``minhash_doc_table`` frame
    (r15 ingest fusion — see ``dedup.near_dup_pairs_from_doc_table``):
    the band explode + bucket hash are a cheap projection of the cached
    signature table, so deriving index rows here instead of from text
    skips a second explode→64-agg signature stage per micro-batch."""
    rows = num_hashes // bands
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
    4. within-batch near-dups: the pair list goes through
       ``llm.dedup.dedup_clusters`` (connected components, min-label) and
       each component keeps exactly its minimum id — the
       cluster-representative policy, exact over chains (A~B~C keeps A
       even when A~C never paired, and (1,5)+(2,5) keeps only 1, where a
       greedy drop-every-``id_b`` pass would inconsistently keep 2);
    5. survivors' index rows append to the landed index.

    The index directory is the only state — no driver memory, no
    streaming state store — so the dedup horizon is the whole corpus
    lifetime, unlike watermark-bounded ``dropDuplicatesWithinWatermark``.

    Index discovery goes through the Hadoop FileSystem API of the path's
    own scheme, so the index may live on S3/HDFS/ABFS — never a
    driver-local ``os`` probe (a local-only probe would return "no index"
    on an object store and SILENTLY skip landed-corpus dedup, the worst
    failure mode for this component).

    Crash/replay discipline: the per-batch append is plain parquet, not a
    transactional commit — if ``foreachBatch`` replays a batch after a
    crash between the append and the checkpoint commit, the survivors'
    index rows land twice. Duplicated index rows cannot change dedup
    DECISIONS (a replayed doc never matches itself — the probe join
    excludes ``doc_id`` self-pairs — and duplicate (new, old) witnesses
    collapse via ``dropDuplicates`` before the Jaccard verify); they only
    grow the index. Run ``compact()`` periodically to rewrite the index
    deduplicated (atomic swap), or back the index with a transactional
    table format (Delta/Iceberg) in production.
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
        """The landed index, or None ONLY when no index has ever been
        written. Existence is probed through the Hadoop FileSystem of the
        path's scheme (works on file:/S3A/HDFS/ABFS alike); an existing
        path that then fails to read as parquet is a real error and
        raises — it must never be silently treated as "no index" (that
        would skip landed-corpus dedup while still appending rows).
        A directory holding ONLY hidden entries (``_temporary`` from a
        crashed, never-committed first append; ``_SUCCESS`` markers) is
        "write never committed", not "index unreadable": return None so
        the pipeline proceeds instead of wedging every batch on an
        unreadable-parquet error."""
        landed = _read_landed_index(self.spark, self.path)
        return landed

    def compact(self) -> None:
        """Rewrite the index with replay-duplicated rows collapsed
        (atomic snapshot swap; see the class docstring). One shuffle on
        (doc_id, band) over index rows — tens of bytes per doc-band, not
        corpus text — so this is cheap relative to the corpus it guards."""
        from ..sources.io import overwrite_atomic

        landed = self._landed()
        if landed is None:
            return
        overwrite_atomic(landed.dropDuplicates(["doc_id", "band"]), self.path)

    @staticmethod
    def _landed_matches(idx: DataFrame, landed: DataFrame) -> DataFrame:
        """(doc_id, old_id, jaccard) for every (batch doc, landed doc)
        candidate pair sharing a band bucket, with the exact shingle
        Jaccard computed. Multi-band hits of the SAME pair collapse
        first; every DISTINCT landed witness still gets verified —
        keeping one arbitrary witness per new doc would miss dups whose
        kept witness happens to fall below threshold."""
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
            .dropDuplicates(["doc_id", "old_id"])
        )
        inter = F.size(F.array_intersect("sh_new", "sh_old"))
        union = F.size("sh_new") + F.size("sh_old") - inter
        return cand.select(
            "doc_id", "old_id", (inter / F.greatest(union, F.lit(1))).alias("jaccard")
        )

    def probe(self, docs: DataFrame) -> DataFrame:
        """READ-ONLY near-dup lookup: (doc_id, old_id, jaccard) for every
        batch document matching a LANDED document at ≥ threshold — the
        decontamination question ("is this already in the corpus?")
        without mutating the index and without the within-batch pass.
        Returns an empty frame when no index has been written. ``jaccard``
        is rounded to 4 dp, matching ``near_dup_pairs_minhash``."""
        landed = self._landed()
        if landed is None:
            id_type = docs.schema[self.id_col].dataType.simpleString()
            return self.spark.createDataFrame(
                [], f"doc_id {id_type}, old_id {id_type}, jaccard double"
            )
        idx = banded_index_rows(
            docs, self.text_col, self.id_col, self.n_shingle, self.num_hashes, self.bands
        )
        return (
            self._landed_matches(idx, landed)
            .where(F.col("jaccard") >= self.threshold)
            .select("doc_id", "old_id", F.round("jaccard", 4).alias("jaccard"))
        )

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

        # ONE signature pass per batch (r15 fusion): the explode→64-agg
        # minhash table is computed once over the batch text and persisted;
        # the within-batch pair search AND the landed-index rows both
        # derive from it (signatures are a deterministic function of the
        # text, so filtering the cached table by surviving ids is
        # byte-identical to re-signing the survivors — which is what this
        # used to do, paying the signature stage twice per micro-batch).
        doc_tbl = dedup_ops.minhash_doc_table(
            docs, self.text_col, self.id_col, self.n_shingle, self.num_hashes
        ).persist(StorageLevel.MEMORY_AND_DISK)

        # within-batch: connected components over the pair list; each
        # component keeps its min id (exact cluster-representative policy)
        pairs = dedup_ops.near_dup_pairs_from_doc_table(
            doc_tbl, num_hashes=self.num_hashes, bands=self.bands,
            jaccard_threshold=self.threshold,
        )
        components = dedup_ops.dedup_clusters(pairs, id_col=self.id_col)
        batch_drops = components.where(~F.col("keep")).select(self.id_col)
        kept = docs.join(batch_drops, self.id_col, "left_anti").localCheckpoint(eager=True)

        idx = (
            banded_index_rows_from_table(
                doc_tbl.join(
                    batch_drops.withColumnRenamed(self.id_col, "_id"),
                    "_id",
                    "left_anti",
                ),
                self.num_hashes,
                self.bands,
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )

        landed = self._landed()
        if landed is not None:
            dup_ids = (
                self._landed_matches(idx, landed)
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
        doc_tbl.unpersist()
        return kept


class IncrementalDigestIndex:
    """Corpus-lifetime EXACT dedup at ingest — the tier-1 counterpart of
    ``IncrementalMinhashIndex``: a persistent (digest → doc id) index of
    everything already landed, probed per micro-batch with a plain
    digest equi-join. ``dropDuplicatesWithinWatermark`` (``corpus_ingest``)
    bounds its guarantee to the watermark horizon; the minhash index
    catches landed exact dups too (jaccard 1.0) but at banding+verify
    cost — this index answers the byte-identical question with one
    32-byte-key join, the cheap pre-filter the dedup ladder starts with.

    ``canonical=True`` keys the index on the normalized form
    (``llm.dedup.canonical_text``: lower / punct→space / collapse
    whitespace), catching case/punctuation variants — the incremental
    twin of ``canonical_dup_groups``.

    Per batch (``dedup_batch`` — plain DataFrames, slots into
    ``foreachBatch`` or a batch backfill identically): drop within-batch
    copies keeping each digest's min id, anti-join the landed index on
    the digest, append the survivors' (digest, id) rows.

    Scale: the index holds ~40 bytes per landed document — orders of
    magnitude smaller than the corpus — and every shuffle is keyed by the
    uniformly-distributed digest (no skew by construction). At 100 TB
    store it bucketed by digest so the probe is a co-located join.

    Crash/replay: a replayed batch's append lands its rows twice, which
    cannot change decisions — the probe ignores matches with the SAME doc
    id (a replayed doc must not be rejected against its own landed row),
    and duplicate (digest, id) rows collapse in ``compact()`` under the
    same atomic snapshot swap the other indexes use. Same FileSystem-API
    discovery discipline (object-store safe).
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        text_col: str = "text",
        id_col: str = "doc_id",
        canonical: bool = False,
    ) -> None:
        self.spark = spark
        self.path = path
        self.text_col = text_col
        self.id_col = id_col
        self.canonical = canonical

    def _digest(self) -> F.Column:
        text = F.col(self.text_col)
        if self.canonical:
            text = dedup_ops.canonical_text(text)
        return F.sha2(text, 256)

    def _landed(self) -> DataFrame | None:
        """Landed (digest, id) rows, or None ONLY when no index was ever
        written (an existing-but-unreadable path raises; hidden-entry-only
        debris from a crashed first append counts as never-written)."""
        return _read_landed_index(self.spark, self.path)

    def probe(self, docs: DataFrame) -> DataFrame:
        """READ-ONLY exact-dup lookup: (doc_id, old_id) for every batch
        document whose digest already exists in the landed index under a
        DIFFERENT id. Empty frame when no index has been written."""
        landed = self._landed()
        id_type = docs.schema[self.id_col].dataType.simpleString()
        if landed is None:
            return self.spark.createDataFrame([], f"doc_id {id_type}, old_id {id_type}")
        hashed = docs.select(
            F.col(self.id_col).alias("doc_id"), self._digest().alias("_dig")
        )
        return (
            hashed.join(
                landed.select(F.col(self.id_col).alias("old_id"), "_dig"), "_dig"
            )
            .where(F.col("doc_id") != F.col("old_id"))
            .select("doc_id", "old_id")
            .dropDuplicates(["doc_id", "old_id"])
        )

    def dedup_batch(self, docs: DataFrame) -> DataFrame:
        """Return the batch rows that are NOT byte-identical (or
        canonical-identical) to landed or earlier-in-batch documents, and
        append the survivors' (digest, id) rows to the index."""
        return self._dedup(docs, record=True)

    def filter_batch(self, docs: DataFrame) -> DataFrame:
        """READ-ONLY form of ``dedup_batch``: identical keep decisions
        (within-batch min-id keep + landed anti-join) but NO index
        append.  Pair with ``record_batch`` to defer landing until the
        batch has cleared downstream gates (r14, ADVICE): landing a
        URL's digest for a document a later tier rejects would block
        that URL's recrawls forever even though nothing ever reached
        the corpus."""
        return self._dedup(docs, record=False)

    def record_batch(self, docs: DataFrame) -> None:
        """Append (digest, id) index rows for documents that survived
        the FULL ladder — the deferred-landing half of ``filter_batch``.
        NULL-keyed rows are skipped (they were never dedup candidates).
        Replay-safe like ``dedup_batch``'s append: duplicated rows
        collapse in ``compact()`` and cannot change decisions (the
        landed probe ignores same-id matches).  An all-rejected batch
        writes nothing at all — not even empty part files — so "no doc
        ever claimed this URL" stays observable as an absent index."""
        rows = docs.select(F.col(self.id_col), self._digest().alias("_dig")).where(
            F.col("_dig").isNotNull()
        )
        if rows.isEmpty():
            return
        rows.write.mode("append").parquet(self.path)

    def _dedup(self, docs: DataFrame, record: bool) -> DataFrame:
        # NULL digest = no dedup key (NULL text, or at the URL tier a
        # record with no target URI — a NORMAL input for WARC front
        # doors).  Such rows must pass through untouched rather than
        # silently vanish (r14, ADVICE): an equi-join never matches a
        # NULL key, so routing them through the keep/anti joins dropped
        # every one of them.  They are excluded from the index append —
        # a NULL key can never reject anything.
        hashed = docs.withColumn("_dig", self._digest())
        keyless = hashed.where(F.col("_dig").isNull())
        keyed = hashed.where(F.col("_dig").isNotNull())
        keep_ids = keyed.groupBy("_dig").agg(F.min(self.id_col).alias(self.id_col))
        kept = keyed.join(keep_ids, [self.id_col, "_dig"], "semi")
        landed = self._landed()
        if landed is not None:
            dup_ids = (
                kept.select(self.id_col, "_dig")
                .join(landed.select(F.col(self.id_col).alias("_old"), "_dig"), "_dig")
                .where(F.col(self.id_col) != F.col("_old"))
                .select(self.id_col)
                .distinct()
            )
            kept = kept.join(dup_ids, self.id_col, "left_anti")
        kept = kept.unionByName(keyless).localCheckpoint(eager=True)
        if record:
            kept.select(self.id_col, "_dig").where(
                F.col("_dig").isNotNull()
            ).write.mode("append").parquet(self.path)
        return kept.drop("_dig")

    def compact(self) -> None:
        """Collapse replay-duplicated (digest, id) rows (atomic snapshot
        swap) — one shuffle over 40-byte index rows."""
        from ..sources.io import overwrite_atomic

        landed = self._landed()
        if landed is None:
            return
        overwrite_atomic(landed.dropDuplicates(["_dig", self.id_col]), self.path)


class IncrementalUrlIndex(IncrementalDigestIndex):
    """Corpus-lifetime CANONICAL-URL dedup at ingest (r13) — the recrawl
    gate the web-crawl front door was missing: CommonCrawl-class
    pipelines dedup by canonical URL BEFORE any content hashing (it is
    ~free and removes the bulk of re-crawl duplicates without touching
    text), and the batch ladder has exactly that step
    (``llm.dedup.canonical_url`` → q_dedup_url / q_web_curation_e2e) —
    but ``IncrementalDigestIndex`` keys on TEXT, so a page re-crawled
    with a rotated ad block or a new timestamp sailed past the exact
    gate and had to be caught by the (much costlier) minhash tier.

    This is the digest index with the key swapped to
    ``sha2(canonical_url(url_col))`` — everything else (within-batch
    min-id keep, landed anti-join, replay tolerance via same-id probe
    exclusion, sentinel-free compaction, FileSystem-API discovery)
    inherits unchanged. ~40 bytes per landed URL; uniformly-distributed
    join key by construction. Slots in FRONT of the text gates in
    ``ingest_corpus_batch`` (``url_index=``): a rejected re-crawl never
    pays extraction, quality scoring, or signature costs.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        url_col: str = "url",
        id_col: str = "doc_id",
    ) -> None:
        super().__init__(spark, path, text_col=url_col, id_col=id_col)

    def _digest(self) -> F.Column:
        return F.sha2(dedup_ops.canonical_url(F.col(self.text_col)), 256)


class IncrementalSpanIndex:
    """Boilerplate-span removal at ingest, incrementally: a persistent
    (span-digest → distinct-doc count) index accumulated per micro-batch,
    so a span that repeats ACROSS batches is excised as soon as its
    corpus-lifetime count reaches ``min_docs`` — the streaming half of
    ``llm.dedup.boilerplate_span_dedup`` (which needs the whole corpus in
    one frame and can't see history).

    Per batch (``clean_batch(docs, batch_id)``; plain DataFrames, so it
    slots into ``foreachBatch`` or a batch backfill identically):

    1. segment the batch (``llm.dedup.span_segment_rows`` — identical
       segmentation to the batch operator);
    2. combined count per digest = this batch's distinct-doc count + the
       landed index's count; spans at ``>= min_docs`` are boilerplate;
    3. boilerplate digests broadcast back against the batch's segment
       rows; surviving spans reassemble each document in order;
    4. the batch's per-digest counts append to the index keyed by
       ``batch_id``.

    Exactly-once under replay WITHOUT a transactional store: index rows
    carry the ``foreachBatch`` batch id, and the history probe (a) skips
    rows tagged with the CURRENT batch id — a replayed batch's own landed
    counts would otherwise count every one of its spans against itself —
    and (b) collapses ``dropDuplicates([digest, batch_id])`` so replays
    of earlier batches contribute once. Together a replayed batch sees
    exactly the history its first run saw. This is a stronger requirement
    than the minhash index's (where duplicated rows can't change
    decisions) because counting is threshold-sensitive.

    Semantics note: excision is forward-looking — a span that crosses the
    threshold in batch N is removed from batch N onward; copies already
    landed in batches < N stay until the periodic batch compaction pass
    re-runs ``boilerplate_span_dedup`` over the corpus (same digests, so
    the two passes agree on what is boilerplate).

    Scale: the index shuffles fixed-width digests (32 B) with map-side
    partial aggregation; at 100 TB it lives partitioned by digest prefix
    on the object store and the probe is a broadcast of the batch's
    distinct digests against it (or a co-located join once the index
    outgrows broadcast range). Index discovery uses the Hadoop FileSystem
    API of the path's scheme — same discipline as
    ``IncrementalMinhashIndex``.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        text_col: str = "text",
        id_col: str = "doc_id",
        span_tokens: int = 3,
        min_docs: int = 2,
        delimiter: str | None = None,
    ) -> None:
        self.spark = spark
        self.path = path
        self.text_col = text_col
        self.id_col = id_col
        self.span_tokens = span_tokens
        self.min_docs = min_docs
        self.delimiter = delimiter

    def _landed(self) -> DataFrame | None:
        """Landed per-(digest, batch) counts, or None ONLY when no index
        was ever written (an existing-but-unreadable path raises — it must
        never silently become 'no history'; hidden-entry-only debris from
        a crashed first append counts as never-written)."""
        return _read_landed_index(self.spark, self.path)

    def clean_batch(self, docs: DataFrame, batch_id: int) -> DataFrame:
        """Return the batch with corpus-lifetime boilerplate spans excised
        (``text_clean`` + ``n_dropped`` per doc), and record the batch's
        span counts in the index."""
        from pyspark import StorageLevel

        seg = dedup_ops.span_segment_rows(
            docs, self.text_col, self.id_col, self.span_tokens, self.delimiter
        ).persist(StorageLevel.MEMORY_AND_DISK)

        batch_counts = seg.groupBy("_dig").agg(
            F.count_distinct(F.col(self.id_col)).alias("_n")
        )
        landed = self._landed()
        if landed is not None:
            # exclude THIS batch's id from history: on a replay the landed
            # index already holds this batch's counts, and summing them in
            # would double-count every span against itself — flipping
            # excision decisions the first run didn't make. With the
            # self-id excluded (plus the (digest, batch) collapse for
            # replays of OTHER batches), a replayed batch sees exactly the
            # history the original run saw.
            history = (
                landed.where(F.col("_batch") != F.lit(batch_id))
                .dropDuplicates(["_dig", "_batch"])
                .groupBy("_dig")
                .agg(F.sum("_n").alias("_n"))
            )
            combined = (
                batch_counts.unionByName(history)
                .groupBy("_dig")
                .agg(F.sum("_n").alias("_n"))
            )
        else:
            combined = batch_counts
        boiler = combined.where(F.col("_n") >= self.min_docs).select("_dig")

        flagged = seg.join(F.broadcast(boiler.withColumn("_b", F.lit(True))), "_dig", "left")
        is_boiler = F.coalesce(F.col("_b"), F.lit(False))
        joiner = self.delimiter if self.delimiter is not None else " "
        cleaned = flagged.groupBy(self.id_col).agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(~is_boiler, F.struct(F.col("_i"), F.col("_seg")))
                        )
                    ),
                    lambda s: s["_seg"],
                ),
                joiner,
            ).alias("text_clean"),
            F.sum(is_boiler.cast("int")).cast("int").alias("n_dropped"),
        )
        out = (
            docs.select(self.id_col)
            .join(cleaned, self.id_col, "left")
            .select(
                self.id_col,
                F.coalesce("text_clean", F.lit("")).alias("text_clean"),
                F.coalesce("n_dropped", F.lit(0)).alias("n_dropped"),
            )
            .localCheckpoint(eager=True)
        )
        batch_counts.withColumn("_batch", F.lit(batch_id).cast("long")).write.mode(
            "append"
        ).parquet(self.path)
        seg.unpersist()
        return out

    def compact(self) -> None:
        """Rewrite the index with replayed batch rows collapsed and counts
        pre-aggregated per digest under a single batch key (atomic
        snapshot swap) — probes after compaction read one row per distinct
        span digest.

        Run only at a quiesced point (stream stopped, or last batch's
        checkpoint committed): compaction folds per-batch rows into the
        sentinel batch ``-1``, after which a replay of a pre-compaction
        batch can no longer exclude its own contribution from history."""
        from ..sources.io import overwrite_atomic

        landed = self._landed()
        if landed is None:
            return
        collapsed = (
            landed.dropDuplicates(["_dig", "_batch"])
            .groupBy("_dig")
            .agg(F.sum("_n").alias("_n"))
            .withColumn("_batch", F.lit(-1).cast("long"))
        )
        overwrite_atomic(collapsed, self.path)


class IncrementalLineIndex:
    """Cross-page COMMON-LINE boilerplate removal at ingest,
    incrementally: a persistent (group, line-digest → distinct-doc
    count) index accumulated per micro-batch, so a line that repeats
    across ≥ ``min_docs`` documents of the same group (domain/dump) —
    cookie banners, copyright footers, subscribe prompts — is excised
    as soon as its CORPUS-LIFETIME count crosses the threshold. The
    streaming twin of ``llm.textops.strip_common_lines`` (which counts
    within the frame it is given and cannot see a footer planted across
    micro-batches); r13, VERDICT item 4. Same replay discipline as
    ``IncrementalSpanIndex``: index rows carry the ``foreachBatch``
    batch id, the history probe skips rows tagged with the CURRENT
    batch id and collapses ``(group, digest, batch)`` duplicates, so a
    replayed batch sees exactly the history its first run saw.

    Per batch (``clean_batch(docs, batch_id)``):

    1. line posexplode (identical segmentation to the batch operator),
       digested to a fixed-width ``xxhash64`` keyed WITH the group —
       group-local counting, same rationale as the batch form (a global
       count would strip legitimate cross-domain idioms, and the group
       key keeps the count shuffle partition-pruned per domain);
    2. combined count per (group, digest) = this batch's distinct-doc
       count + the landed history; lines at ``>= min_docs`` are chrome;
    3. chrome digests join back against the batch's line rows (no
       forced broadcast — the chrome set is corpus-lifetime and
       unbounded; AQE broadcasts while it is small); surviving lines
       rebuild each document in ORIGINAL order;
    4. the batch's per-(group, digest) counts append keyed by batch id.

    Forward-looking semantics (the span index's documented contract): a
    line crossing the threshold at batch N is removed from batch N
    onward; copies already landed stay until a compaction-era batch
    rewrite re-runs the batch operator over the corpus. NULL-text docs
    come back as ``('', 0)`` — the batch operator's r13 contract.

    Scale: the index shuffles (group, 8-byte digest) rows with map-side
    partial aggregation; the hot keys ARE the boilerplate, bounded by
    the two-phase distinct agg exactly as in the batch plan.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        text_col: str = "text",
        id_col: str = "doc_id",
        group_col: str = "source",
        min_docs: int = 3,
    ) -> None:
        self.spark = spark
        self.path = path
        self.text_col = text_col
        self.id_col = id_col
        self.group_col = group_col
        self.min_docs = min_docs

    def _landed(self) -> DataFrame | None:
        return _read_landed_index(self.spark, self.path)

    def clean_batch(self, docs: DataFrame, batch_id: int) -> DataFrame:
        """Return ``(id_col, group_col, text_clean, n_dropped)`` with
        corpus-lifetime common lines excised, and record the batch's
        line counts in the index."""
        from pyspark import StorageLevel

        lines = (
            docs.select(
                F.col(self.id_col),
                F.col(self.group_col).alias("_grp"),
                F.posexplode(F.split(F.col(self.text_col), "\n")).alias(
                    "_pos", "_line"
                ),
            )
            .withColumn("_dig", F.xxhash64("_line"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        batch_counts = lines.groupBy("_grp", "_dig").agg(
            F.count_distinct(F.col(self.id_col)).alias("_n")
        )
        landed = self._landed()
        if landed is not None:
            # self-batch exclusion + replay collapse: see the class
            # docstring / IncrementalSpanIndex for the full argument
            history = (
                landed.where(F.col("_batch") != F.lit(batch_id))
                .dropDuplicates(["_grp", "_dig", "_batch"])
                .groupBy("_grp", "_dig")
                .agg(F.sum("_n").alias("_n"))
            )
            combined = (
                batch_counts.unionByName(history)
                .groupBy("_grp", "_dig")
                .agg(F.sum("_n").alias("_n"))
            )
        else:
            combined = batch_counts
        chrome = combined.where(F.col("_n") >= self.min_docs).select("_grp", "_dig")

        # no broadcast hint (r14, ADVICE): the chrome set is CORPUS-
        # LIFETIME and unbounded (every ≥min_docs line per group — huge
        # for real web corpora), so forcing it driver-side would blow the
        # broadcast limit exactly when the index matters most.  AQE picks
        # broadcast on its own while the set is small — the batch twin
        # strip_common_lines uses the same plain join.
        flagged = lines.join(
            chrome.withColumn("_b", F.lit(True)), ["_grp", "_dig"], "left"
        )
        is_chrome = F.coalesce(F.col("_b"), F.lit(False))
        cleaned = flagged.groupBy(self.id_col).agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(~is_chrome, F.struct(F.col("_pos"), F.col("_line")))
                        )
                    ),
                    lambda s: s["_line"],
                ),
                "\n",
            ).alias("text_clean"),
            F.sum(is_chrome.cast("long")).cast("long").alias("n_dropped"),
        )
        out = (
            docs.select(self.id_col, self.group_col)
            .join(cleaned, self.id_col, "left")
            .select(
                self.id_col,
                self.group_col,
                F.coalesce("text_clean", F.lit("")).alias("text_clean"),
                F.coalesce("n_dropped", F.lit(0)).cast("long").alias("n_dropped"),
            )
            .localCheckpoint(eager=True)
        )
        batch_counts.withColumn("_batch", F.lit(batch_id).cast("long")).write.mode(
            "append"
        ).parquet(self.path)
        lines.unpersist()
        return out

    def compact(self) -> None:
        """Collapse replayed rows and pre-aggregate counts per (group,
        digest) under the sentinel batch ``-1`` (atomic snapshot swap).
        Run only at a quiesced point — same contract as
        ``IncrementalSpanIndex.compact``."""
        from ..sources.io import overwrite_atomic

        landed = self._landed()
        if landed is None:
            return
        collapsed = (
            landed.dropDuplicates(["_grp", "_dig", "_batch"])
            .groupBy("_grp", "_dig")
            .agg(F.sum("_n").alias("_n"))
            .withColumn("_batch", F.lit(-1).cast("long"))
        )
        overwrite_atomic(collapsed, self.path)


class IncrementalSubstringIndex:
    """Exact-substring (ExactSubstr, Lee et al. 2021) dedup at ingest,
    incrementally: a persistent (anchor-gram digest → occurrence count)
    index accumulated per micro-batch, so a ≥L-token span shared with
    ANYTHING already landed — at any offset — is excised from the batch
    before it lands. The streaming half of
    ``llm.dedup.exact_substring_spans`` (which needs the whole corpus in
    one frame), and the any-offset upgrade of ``IncrementalSpanIndex``
    (whose fixed segmentation grid misses spans that straddle segment
    boundaries).

    Per batch (``clean_batch(docs, batch_id)``):

    1. anchor-gram digests at every token position
       (``llm.dedup.anchor_gram_rows`` — identical gram definition to
       the batch operator, so the two passes can never disagree);
    2. combined occurrence count per digest = this batch's count + the
       landed history's; digests at ``>= min_count`` are duplicated;
    3. covered positions merge to maximal spans per doc
       (``covered_spans``) and the spans are excised
       (``excise_spans``) — the same removal the batch form applies;
    4. the batch's per-digest counts append to the index keyed by
       ``batch_id``.

    Replay discipline is ``IncrementalSpanIndex``'s, because counting
    is threshold-sensitive: the history probe skips rows tagged with
    the CURRENT batch id (a replayed batch must not count its own
    landed grams against itself) and collapses
    ``dropDuplicates([_g, _batch])`` so replays of earlier batches
    contribute once — a replayed batch sees exactly the history its
    first run saw.

    Scale: the index shuffles 16-byte digests with map-side partial
    aggregation, one row per token position per batch — the anchor-gram
    bound (docs/SCALE.md dedup tier 12): independent of L, occurrence-
    linear, no hot-key cap needed. Index rows accumulate one row per
    DISTINCT batch gram; ``compact()`` folds them to one row per
    distinct digest under the sentinel batch −1.

    Composable from the front door (r14): ``ingest_corpus_batch(...,
    substring_index=)`` runs this tier LAST of the excisions — see the
    order note there (its excision token-normalizes the text, and its
    per-position index rows should only price text the cheaper tiers
    passed).
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        text_col: str = "text",
        id_col: str = "doc_id",
        min_len: int = 50,
        min_count: int = 2,
    ) -> None:
        self.spark = spark
        self.path = path
        self.text_col = text_col
        self.id_col = id_col
        self.min_len = int(min_len)
        self.min_count = int(min_count)

    def _landed(self) -> DataFrame | None:
        return _read_landed_index(self.spark, self.path)

    def clean_batch(self, docs: DataFrame, batch_id: int) -> DataFrame:
        """Return the batch with corpus-lifetime duplicated ≥L-token
        spans excised (``text_clean`` + ``n_removed`` per doc), and
        record the batch's gram counts in the index."""
        from pyspark import StorageLevel

        grams = dedup_ops.anchor_gram_rows(
            docs, self.text_col, self.id_col, self.min_len
        ).persist(StorageLevel.MEMORY_AND_DISK)

        batch_counts = grams.groupBy("_g").agg(F.count("*").alias("_n"))
        landed = self._landed()
        if landed is not None:
            history = (
                landed.where(F.col("_batch") != F.lit(batch_id))
                .dropDuplicates(["_g", "_batch"])
                .groupBy("_g")
                .agg(F.sum("_n").alias("_n"))
            )
            combined = (
                batch_counts.unionByName(history)
                .groupBy("_g")
                .agg(F.sum("_n").alias("_n"))
            )
        else:
            combined = batch_counts
        dup = combined.where(F.col("_n") >= self.min_count).select("_g")
        marks = grams.join(F.broadcast(dup), "_g", "left_semi")
        spans = dedup_ops.covered_spans(marks, self.id_col, self.min_len)
        out = dedup_ops.excise_spans(
            docs, spans, self.text_col, self.id_col
        ).localCheckpoint(eager=True)
        batch_counts.withColumn("_batch", F.lit(batch_id).cast("long")).write.mode(
            "append"
        ).parquet(self.path)
        grams.unpersist()
        return out

    def compact(self) -> None:
        """Fold per-batch gram rows to one row per distinct digest under
        the sentinel batch −1 (atomic snapshot swap); quiesced points
        only — pre-compaction replays lose self-exclusion after."""
        from ..sources.io import overwrite_atomic

        landed = self._landed()
        if landed is None:
            return
        collapsed = (
            landed.dropDuplicates(["_g", "_batch"])
            .groupBy("_g")
            .agg(F.sum("_n").alias("_n"))
            .withColumn("_batch", F.lit(-1).cast("long"))
        )
        overwrite_atomic(collapsed, self.path)


class IncrementalCmsIndex:
    """Corpus-lifetime FREQUENCY tracking at ingest: a persistent
    count-min table (``operators/aggregates.count_min_table``) of a key
    column — token, domain, source — appended per micro-batch. Because a
    counter-matrix sketch merges by ADDITION, append IS merge: each batch
    writes only its own ≤ depth·width sketch rows (kilobytes) and the
    landed index never needs a read-modify-write; estimates groupBy-sum
    the landed rows (bounded by depth·width·batches, and ``compact()``
    folds them back to ≤ depth·width) and probe with ``cms_estimate``'s
    broadcast join.

    The ingest-side answer to "which sources/tokens are flooding the
    corpus" at 100 TB: the exact groupBy alternative shuffles the key
    domain every time someone asks; this index pays ≤ depth·width rows
    per batch, forever, with the sketch's hard never-underestimate
    guarantee (a flood can never hide).

    Crash/replay: batch rows carry ``update_batch``'s ``batch_id``; a
    replayed append lands byte-identical (batch, d, bucket, c) rows,
    which every read collapses with ``dropDuplicates`` before summing —
    so replays change nothing (the span-index discipline). ``compact()``
    folds history into the sentinel batch −1 under the atomic snapshot
    swap; run it only at a quiesced point, since pre-compaction batch ids
    can no longer be distinguished afterwards.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_col: str = "key",
        width: int = 1024,
    ) -> None:
        self.spark = spark
        self.path = path
        self.key_col = key_col
        self.width = width

    def _landed(self) -> DataFrame | None:
        return _read_landed_index(self.spark, self.path)

    def _merged(self) -> DataFrame | None:
        """Replay-collapsed, batch-summed (d, bucket, c) sketch."""
        landed = self._landed()
        if landed is None:
            return None
        return (
            landed.dropDuplicates(["_batch", "d", "bucket", "c"])
            .groupBy("d", "bucket")
            .agg(F.sum("c").alias("c"))
        )

    def update_batch(self, df: DataFrame, batch_id: int) -> None:
        """Append this batch's sketch rows (≤ depth·width, keyed by
        ``batch_id`` for replay collapse)."""
        from ..operators.aggregates import count_min_table

        sketch = count_min_table(df, self.key_col, width=self.width).withColumn(
            "_batch", F.lit(int(batch_id)).cast("long")
        )
        sketch.write.mode("append").parquet(self.path)

    def estimate(self, keys: DataFrame) -> DataFrame:
        """(key, est_n) frequency estimates against the whole landed
        history — est_n ≥ the key's true landed count, always; keys never
        seen estimate ≥ 0 from collision noise. Empty-index → est_n 0."""
        from ..operators.aggregates import cms_estimate

        merged = self._merged()
        if merged is None:
            return keys.select(
                F.col(self.key_col), F.lit(0).cast("long").alias("est_n")
            )
        return cms_estimate(merged, keys, self.key_col, width=self.width)

    def compact(self) -> None:
        """Fold per-batch sketch rows into one ≤ depth·width snapshot
        under the sentinel batch −1 (atomic swap); quiesced points only —
        replayed pre-compaction appends are indistinguishable after."""
        from ..sources.io import overwrite_atomic

        merged = self._merged()
        if merged is None:
            return
        overwrite_atomic(
            merged.withColumn("_batch", F.lit(-1).cast("long")), self.path
        )


class IncrementalWordCountIndex:
    """Corpus-lifetime WORD-FREQUENCY table at ingest — the tokenizer's
    feedstock maintained incrementally: BPE retraining
    (``llm.tokenize.bpe_train_from_counts``) runs off this index's
    merged counts WITHOUT rescanning the corpus (training is
    vocabulary-sized after the word count; the word count is the one
    corpus-sized pass, and this index pays it per batch at ingest
    instead of per retrain over history). Also the exact companion to
    ``IncrementalCmsIndex``'s estimates when the vocabulary fits —
    Zipf makes it a few GB even at web scale.

    Counts merge by ADDITION, so append IS merge (the CMS-index
    discipline): each batch writes its own (word, count) rows keyed by
    ``batch_id``; reads collapse replays with ``dropDuplicates`` on
    (_batch, word) and groupBy-sum; ``compact()`` folds history into
    the sentinel batch −1 under the atomic snapshot swap (quiesced
    points only)."""

    def __init__(self, spark: SparkSession, path: str, text_col: str = "text") -> None:
        self.spark = spark
        self.path = path
        self.text_col = text_col

    def _landed(self) -> DataFrame | None:
        return _read_landed_index(self.spark, self.path)

    def update_batch(self, df: DataFrame, batch_id: int) -> None:
        """Append this batch's (word, count) rows (vocabulary-of-batch
        sized, keyed by ``batch_id`` for replay collapse)."""
        from ..llm.tokenize import word_count_table

        wc = word_count_table(df, self.text_col).withColumn(
            "_batch", F.lit(int(batch_id)).cast("long")
        )
        wc.write.mode("append").parquet(self.path)

    def counts(self) -> DataFrame | None:
        """Replay-collapsed, batch-summed (word, count) over the whole
        landed history; None when nothing has landed."""
        landed = self._landed()
        if landed is None:
            return None
        return (
            landed.dropDuplicates(["_batch", "word"])
            .groupBy("word")
            .agg(F.sum("count").cast("long").alias("count"))
        )

    def train(self, n_merges: int = 50, min_count: int = 2) -> list[tuple[str, str]]:
        """Retrain the BPE merge table from the landed counts — identical
        to training on the full landed corpus (word counts are sufficient
        statistics for BPE), no corpus rescan. Raises on an empty index
        (an empty vocabulary must not define a tokenizer release)."""
        from ..llm.tokenize import bpe_train_from_counts

        wc = self.counts()
        if wc is None:
            raise ValueError(f"no landed word counts at {self.path}: ingest first")
        return bpe_train_from_counts(wc, n_merges=n_merges, min_count=min_count)

    def compact(self) -> None:
        """Fold per-batch rows into one vocabulary-sized snapshot under
        the sentinel batch −1 (atomic swap); quiesced points only."""
        from ..sources.io import overwrite_atomic

        wc = self.counts()
        if wc is None:
            return
        overwrite_atomic(wc.withColumn("_batch", F.lit(-1).cast("long")), self.path)


class PersistentBloomGate:
    """Corpus-lifetime decontamination gate: the eval set's gram Bloom
    bitmap (``llm.bloom``) persisted beside the corpus indexes and applied
    to every ingest micro-batch, so contaminated documents are rejected at
    the front door instead of by a full-corpus sweep later.

    Lifecycle: ``fit(probe)`` once per eval-set release (rebuilds and
    atomically overwrites the stored bitmap); ``flag_batch``/``clean_batch``
    per micro-batch. Unlike the dedup indexes, the gate is READ-ONLY at
    ingest — flagging writes nothing — so micro-batch retries are
    trivially idempotent and no staging/replay protocol is needed.

    Storage: (chunk, bits, m_bits) parquet rows — one 128 KiB-chunk row
    per populated bitmap chunk, so the store is a few MB regardless of
    corpus size and loads with one bounded collect. The loaded bitmap is
    cached on the driver and broadcast per batch by ``bloom_flag``.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        n: int = 5,
        n_hashes: int = 4,
    ) -> None:
        self.spark = spark
        self.path = path
        self.n = n
        self.n_hashes = n_hashes
        self._cache = None

    def fit(
        self,
        probe: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
        m_bits: int = 1 << 24,
    ) -> None:
        """Build the probe set's bitmap and persist it (overwrite —
        an eval-set release replaces the gate wholesale)."""
        from ..llm.bloom import _CHUNK_BITS, bloom_bitmap

        bitmap = bloom_bitmap(
            probe, text_col, id_col, n=self.n, m_bits=m_bits, n_hashes=self.n_hashes
        )
        nbytes = min(_CHUNK_BITS, m_bits) >> 3
        rows = [
            (c // nbytes, bytes(bitmap[c : c + nbytes].tobytes()), m_bits)
            for c in range(0, len(bitmap), nbytes)
            if bitmap[c : c + nbytes].any()  # zero chunks reconstruct from m_bits
        ]
        # an empty-probe gate still commits: (chunk=-1, no bits) carries
        # m_bits so load() distinguishes "fit on empty eval set" (valid,
        # flags nothing) from "never fit" (error)
        if not rows:
            rows = [(-1, b"", m_bits)]
        self.spark.createDataFrame(
            rows, schema="chunk int, bits binary, m_bits long"
        ).write.mode("overwrite").parquet(self.path)
        self._cache = bitmap

    def _bitmap(self):
        import numpy as np

        from ..llm.bloom import _CHUNK_BITS
        from ..sources.io import fs_dir_has_data

        if self._cache is not None:
            return self._cache
        if not fs_dir_has_data(self.spark, self.path):
            raise ValueError(
                f"no Bloom gate at {self.path}: fit() it with the eval set first"
            )
        rows = self.spark.read.parquet(self.path).collect()
        if not rows:
            raise ValueError(
                f"Bloom gate at {self.path} is committed but empty — refit"
            )
        m_bits = int(rows[0]["m_bits"])
        nbytes = min(_CHUNK_BITS, m_bits) >> 3
        bitmap = np.zeros(m_bits >> 3, dtype=np.uint8)
        for r in rows:
            c = int(r["chunk"])
            if c < 0:  # empty-probe sentinel: no bits to place
                continue
            bitmap[c * nbytes : (c + 1) * nbytes] = np.frombuffer(r["bits"], np.uint8)
        self._cache = bitmap
        return bitmap

    def flag_batch(
        self, docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
    ) -> DataFrame:
        """The batch with ``bloom_hit``/``n_bloom_grams`` attached (0 for
        documents too short to carry an n-gram — they cannot leak one)."""
        from ..llm.bloom import bloom_flag

        verdicts = bloom_flag(
            docs, self._bitmap(), text_col, id_col, n=self.n, n_hashes=self.n_hashes
        ).select(id_col, "n_bloom_grams", "bloom_hit")
        return (
            docs.join(verdicts, id_col, "left")
            .withColumn("bloom_hit", F.coalesce("bloom_hit", F.lit(0)))
            .withColumn("n_bloom_grams", F.coalesce("n_bloom_grams", F.lit(0)))
        )

    def clean_batch(
        self, docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
    ) -> DataFrame:
        """The batch minus contaminated documents (columns unchanged)."""
        flagged = self.flag_batch(docs, text_col, id_col)
        return flagged.where(F.col("bloom_hit") == 0).drop(
            "bloom_hit", "n_bloom_grams"
        )


class CorpusDriftMonitor:
    """Per-micro-batch DRIFT GATE against a frozen reference — the
    ingest-time composition of the batch drift operators (r8 verdict
    task: drift monitoring is naturally an ingest concern; the
    reference's closest analog is the consumer's running per-file state,
    ``kafka_consumer.py:111-117``). Three signals per batch, one row per
    group:

    - **KS** (``operators/validation.ks_drift_counts``): exact two-sample
      Kolmogorov–Smirnov on an integer metric (default ``n_tokens``) vs
      the frozen reference — binless, catches shape changes;
    - **PSI** (``operators/validation.psi_drift``): fixed-bin population
      stability on the same metric, binned on the REFERENCE's edges
      (lo/hi frozen with the reference — per-batch edges would make
      batches incomparable);
    - **trailing distinct** (the ``rolling_distinct_sketch`` discipline
      keyed by batch instead of day): per-batch HLL sketches of
      ``text_sha`` appended to the store; the report merges the last
      ``window_batches`` sketches per group — a collapse in unique
      documents (templated spam flood) shows up here before any mean
      moves.

    Scale: the frozen state is per-(group, value) counts (bounded by
    DISTINCT metric values, not reference rows), group×n_bins histogram
    rows, and one kB-sized sketch row per (batch, group) — every
    per-batch job is live-batch-sized plus those bounded tables; the
    reference corpus is read once at ``freeze()`` and never again.

    Crash/replay: ``check_batch`` appends the batch's sketch rows keyed
    by ``batch_id``; reads collapse replays with ``dropDuplicates``
    on (_batch, group) (the CMS-index discipline — a replayed append
    lands identical sketch bytes). Reports are derived, not state:
    replaying a batch reproduces its report rather than corrupting
    anything.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        group_col: str = "source",
        value_col: str = "n_tokens",
        distinct_col: str = "text_sha",
        n_bins: int = 10,
        window_batches: int = 7,
        lg_k: int = 12,
    ) -> None:
        self.spark = spark
        self.path = path.rstrip("/")
        self.group_col = group_col
        self.value_col = value_col
        self.distinct_col = distinct_col
        self.n_bins = int(n_bins)
        self.window_batches = int(window_batches)
        self.lg_k = int(lg_k)

    # -- state paths -------------------------------------------------
    @property
    def _counts_path(self) -> str:
        return f"{self.path}/ref_counts"

    @property
    def _hist_path(self) -> str:
        return f"{self.path}/ref_hist"

    @property
    def _meta_path(self) -> str:
        return f"{self.path}/ref_meta"

    @property
    def _sketch_path(self) -> str:
        return f"{self.path}/sketches"

    def freeze(self, reference: DataFrame) -> None:
        """Compute and persist the reference stats (overwrite — one
        freeze per reference release, like ``PersistentBloomGate.fit``).
        ``reference`` must carry ``group_col`` and an integer-lattice
        ``value_col`` (the ``corpus_ingest`` gated form qualifies)."""
        from ..operators.validation import value_histogram

        g, v = self.group_col, self.value_col
        counts = reference.groupBy(g, F.col(v).cast("long").alias("value")).agg(
            F.count("*").cast("long").alias("n")
        )
        counts.write.mode("overwrite").parquet(self._counts_path)
        row = reference.agg(
            F.min(F.col(v).cast("double")).alias("_lo"),
            F.max(F.col(v).cast("double")).alias("_hi"),
        ).first()
        if row["_lo"] is None:
            raise ValueError(
                f"CorpusDriftMonitor.freeze: reference has no non-null "
                f"{v!r} values — an empty reference cannot define edges"
            )
        lo, hi = float(row["_lo"]), float(row["_hi"])
        hist = value_histogram(reference, v, g, self.n_bins, lo=lo, hi=hi)
        hist.write.mode("overwrite").parquet(self._hist_path)
        self.spark.createDataFrame(
            [(lo, hi, self.n_bins)], "lo double, hi double, n_bins int"
        ).write.mode("overwrite").parquet(self._meta_path)

    def _frozen_meta(self) -> tuple[float, float]:
        row = self.spark.read.parquet(self._meta_path).first()
        return float(row["lo"]), float(row["hi"])

    def check_batch(self, batch: DataFrame, batch_id: int) -> DataFrame:
        """One micro-batch against the frozen reference: append the
        batch's distinct-sketch rows, return the per-group drift report
        ``(group, n_ref, n_live, ks, psi, uniq_trailing_est)``. Groups
        present in only one side still report (full-outer composition):
        a NEW group drifting in, or a frozen group going silent, is
        drift too."""
        from ..operators.validation import ks_drift_counts, psi_drift, value_histogram

        g, v = self.group_col, self.value_col
        live_counts = batch.groupBy(g, F.col(v).cast("long").alias("value")).agg(
            F.count("*").cast("long").alias("n")
        )
        ref_counts = self.spark.read.parquet(self._counts_path)
        ks = ks_drift_counts(ref_counts, live_counts, g).select(
            g, "n_ref", "n_live", "ks"
        )
        lo, hi = self._frozen_meta()
        live_hist = value_histogram(batch, v, g, self.n_bins, lo=lo, hi=hi)
        ref_hist = self.spark.read.parquet(self._hist_path)
        psi = psi_drift(ref_hist, live_hist, g).select(g, "psi")

        sk = batch.groupBy(g).agg(
            F.hll_sketch_agg(self.distinct_col, F.lit(self.lg_k)).alias("_sk")
        ).withColumn("_batch", F.lit(int(batch_id)).cast("long"))
        sk.write.mode("append").parquet(self._sketch_path)
        landed = self.spark.read.parquet(self._sketch_path)
        uniq = (
            landed.where(
                (F.col("_batch") > int(batch_id) - self.window_batches)
                & (F.col("_batch") <= int(batch_id))
            )
            .dropDuplicates(["_batch", g])
            .groupBy(g)
            .agg(
                F.hll_sketch_estimate(F.hll_union_agg("_sk")).alias(
                    "uniq_trailing_est"
                )
            )
        )
        return (
            ks.join(psi, g, "full_outer")
            .join(uniq, g, "full_outer")
            .select(g, "n_ref", "n_live", "ks", "psi", "uniq_trailing_est")
        )


def ingest_corpus_batch(
    docs: DataFrame,
    batch_id: int,
    minhash_index: IncrementalMinhashIndex,
    span_index: IncrementalSpanIndex | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.3,
    min_tokens: int = 3,
    digest_index: IncrementalDigestIndex | None = None,
    bloom_gate: PersistentBloomGate | None = None,
    drift_monitor: CorpusDriftMonitor | None = None,
    html_input: bool = False,
    line_index: "IncrementalLineIndex | None" = None,
    url_index: "IncrementalUrlIndex | None" = None,
    ann_index=None,
    ann_threshold: float = 0.95,
    fertility_monitor: "TokenizerFertilityMonitor | None" = None,
    substring_index: "IncrementalSubstringIndex | None" = None,
) -> DataFrame:
    """The whole corpus front door for one micro-batch, composed in the
    order the batch curation ladder uses (``llm.curation.curate_corpus``)
    but against PERSISTENT cross-batch state:

    -1. optional corpus-lifetime canonical-URL dedup (``url_index=``,
       r13): the recrawl gate, FIRST because it needs only the URL
       column — a rejected re-crawl never pays extraction, quality
       scoring, or signature costs (the order CommonCrawl-class
       pipelines use).  The probe is READ-ONLY (r14): URL index rows
       land in step 5, only for full-ladder survivors, so a document
       rejected downstream never blocks its URL's future recrawls;
       NULL/missing URLs pass through ungated (no key, no claim);
    0. optional HTML extraction (``html_input=True``, r12): ``text_col``
       is raw markup — ``llm.textops.extract_html_text`` replaces it
       with boilerplate-filtered visible text ahead of EVERY gate, so
       quality scores and dedup signatures never see script bodies or
       nav chrome;
    1. quality gate + within-batch exact dedup (``corpus_ingest`` batch
       path — attaches ``quality``/``n_tokens``/``text_sha``);
    1a. optional drift monitoring (``CorpusDriftMonitor.check_batch``
       when ``drift_monitor`` is given): KS + PSI vs the frozen
       reference and the trailing-batches distinct sketch, computed on
       the gated batch and appended to ``<monitor.path>/reports`` —
       an audit trail, never a mutation of the landed rows;
    1a'. optional tokenizer-fertility monitoring (``fertility_monitor=``
       with a frozen ``TokenizerFertilityMonitor``, r13): tokens-per-word
       of the gated batch under the frozen merge table vs the frozen
       reference, per group, appended to ``<monitor.path>/reports`` —
       the tokenizer-side twin of 1a at the same tap point;
    1b. optional corpus-lifetime exact dedup
       (``IncrementalDigestIndex.dedup_batch`` when ``digest_index`` is
       given) — the cheap digest equi-join rejects byte-identical landed
       copies BEFORE the minhash machinery prices them;
    2. near-dup rejection vs everything already landed plus within-batch
       clusters (``IncrementalMinhashIndex.dedup_batch`` — also appends
       the survivors' index rows);
    2b. optional corpus-lifetime SEMANTIC dedup (``ann_index=`` with a
       ``streaming.ann.IncrementalIvfIndex``, r13): embedding-cosine
       rejection vs the landed ANN store, last of the dedup tiers so
       the costliest comparison only prices documents every lexical
       tier already passed — requires the batch to carry the index's
       vector column;
    3. optional corpus-lifetime boilerplate-span excision
       (``IncrementalSpanIndex.clean_batch`` — the surviving documents'
       ``text`` is REPLACED by the cleaned form, and the batch's span
       counts land in the index);
    4. optional corpus-lifetime common-LINE excision (r13,
       ``IncrementalLineIndex.clean_batch`` via ``line_index=`` — runs
       after the span gate on whatever text the ladder produced; its
       drop count lands as ``n_lines_dropped``);
    4b. optional corpus-lifetime EXACT-SUBSTRING excision (r14,
       ``IncrementalSubstringIndex.clean_batch`` via
       ``substring_index=``): the Lee-2021 any-offset tier — ≥L-token
       spans shared with anything already landed are excised; its drop
       count lands as ``n_substr_removed``.  LAST of the excision
       tiers, for two reasons: (a) its excision rebuilds text from the
       token stream (single-space joined), so any tier that reads raw
       line/whitespace structure — the line gate above — must run
       before it; (b) it is the costliest excision (one index row per
       token position), so it should price only text the cheaper
       excisions already passed;
    5. deferred URL landing (r14): the survivors' (canonical-URL
       digest, id) rows append to ``url_index`` — the write half of
       step -1's read-only probe.

    Returns the landed form of the batch: the rows to append to the
    corpus store. Slots directly into ``foreachBatch``:

        stream.writeStream.foreachBatch(
            lambda b, i: sink(ingest_corpus_batch(b, i, mh_idx, span_idx))
        )

    Ordering note: near-dup runs BEFORE span excision (same as the batch
    ladder) so a document is judged on its full text; the span indexes of
    dropped documents never pollute the boilerplate counts because
    ``clean_batch`` only sees survivors.
    """
    if url_index is not None:
        # corpus-lifetime canonical-URL dedup FIRST (r13): the recrawl
        # gate runs before extraction and every text gate — it needs only
        # the URL column, so a rejected re-crawl pays nothing downstream
        # (the order every CommonCrawl-class pipeline uses).  READ-ONLY
        # here (r14, ADVICE): the URL rows land at the END, only for
        # documents that survived the whole ladder — landing them now
        # would permanently block recrawls of URLs whose document a
        # downstream tier rejected, even though nothing ever reached the
        # corpus (the digest/minhash tiers don't have this hazard: their
        # survivors are content-equivalent to something landed).
        docs = url_index.filter_batch(docs)
    if html_input:
        # The web-crawl front door (r12): ``text_col`` carries raw
        # HTML/markup — extract the boilerplate-filtered visible text
        # BEFORE any gate sees it (quality scoring a <script> body or
        # deduping on nav chrome certifies garbage). Scan-fused regex
        # projection (llm.textops.extract_html_text), zero extra
        # shuffle; everything downstream — gates, digests, minhash,
        # span indexes — operates on the extracted text, exactly as if
        # the corpus had arrived pre-extracted (pinned equal in
        # tests/test_streaming.py).
        from ..llm.textops import extract_html_text

        docs = docs.withColumn(
            text_col, extract_html_text(F.col(text_col))["text"]
        )
    gated = corpus_ingest(
        docs, text_col=text_col, min_quality=min_quality, min_tokens=min_tokens
    )
    if drift_monitor is not None:
        # monitoring taps the GATED batch (post quality gate, pre dedup):
        # the accepted distribution is what drifts; floods are still
        # visible because dedup hasn't collapsed them yet. The report
        # lands beside the monitor's state — a small per-batch append —
        # so the gate leaves an audit trail without touching the landed
        # corpus rows.
        report = drift_monitor.check_batch(gated, batch_id).withColumn(
            "_batch", F.lit(int(batch_id)).cast("long")
        )
        report.write.mode("append").parquet(f"{drift_monitor.path}/reports")
    if fertility_monitor is not None:
        # the tokenizer-side drift gate (same tap point and audit-trail
        # discipline as drift_monitor): fertility of the gated batch
        # under the FROZEN merge table vs the frozen reference, one
        # report row per group, appended beside the monitor's state —
        # never a mutation of the landed rows
        frep = fertility_monitor.check_batch(gated).withColumn(
            "_batch", F.lit(int(batch_id)).cast("long")
        )
        frep.write.mode("append").parquet(f"{fertility_monitor.path}/reports")
    if bloom_gate is not None:
        # decontamination ahead of every index: a contaminated document
        # must never land index rows (the batch ladder decontaminates
        # last because its indexes are transient; these persist), and the
        # gate is the cheapest stage after the projection — a read-only
        # broadcast-bitmap gather
        gated = bloom_gate.clean_batch(gated, text_col=text_col, id_col=id_col)
    if digest_index is not None:
        gated = digest_index.dedup_batch(gated)
    kept = minhash_index.dedup_batch(gated)
    if ann_index is not None:
        # semantic tier LAST of the dedup ladder (r13, the batch
        # curation order): the costliest comparison only prices documents
        # every lexical tier already passed. Requires the batch to carry
        # the ann_index's vec_col (the post-encoder pipeline shape);
        # dedup_batch also ingests the survivors' vectors, so the ANN
        # store and the corpus store stay row-aligned.
        kept = ann_index.dedup_batch(kept, threshold=ann_threshold)
    if span_index is not None:
        cleaned = span_index.clean_batch(kept, batch_id)
        kept = (
            kept.drop(text_col)
            .join(cleaned.select(id_col, "text_clean", "n_dropped"), id_col)
            .withColumnRenamed("text_clean", text_col)
        )
    if line_index is not None:
        # cross-batch common-LINE chrome excision (r13) — runs after the
        # span index (spans judge the body; lines catch verbatim per-line
        # chrome like footers) on whatever text the ladder has produced;
        # its drop count lands under its own name so the span index's
        # n_dropped survives when both gates run
        lcleaned = line_index.clean_batch(kept, batch_id)
        kept = (
            kept.drop(text_col)
            .join(
                lcleaned.select(
                    id_col,
                    "text_clean",
                    F.col("n_dropped").alias("n_lines_dropped"),
                ),
                id_col,
            )
            .withColumnRenamed("text_clean", text_col)
        )
    if substring_index is not None:
        # exact-substring excision LAST of the excision tiers (r14):
        # its output is token-normalized (single-space joined), so the
        # structure-reading line gate must have already run, and its
        # per-token-position index rows should only price text the
        # cheaper excisions passed — see the docstring order note
        scleaned = substring_index.clean_batch(kept, batch_id)
        kept = (
            kept.drop(text_col)
            .join(
                scleaned.select(
                    id_col,
                    "text_clean",
                    F.col("n_removed").alias("n_substr_removed"),
                ),
                id_col,
            )
            .withColumnRenamed("text_clean", text_col)
        )
    if url_index is not None:
        # deferred URL landing (r14): only full-ladder survivors claim
        # their canonical URL — see the read-only probe at the top
        url_index.record_batch(kept)
    return kept


class TokenizerFertilityMonitor:
    """Per-micro-batch TOKENIZER drift gate: fertility (BPE tokens per
    word under a FROZEN merge table) of each batch vs a frozen
    reference — the tokenizer-side complement of ``CorpusDriftMonitor``.
    Fertility is the canonical 'the corpus moved out from under the
    tokenizer' signal: a domain/language/encoding shift makes the frozen
    merges stop applying, so tokens-per-word jumps long before
    downstream training metrics notice (and a fertility DROP flags
    templated floods of already-fused words).

    Frozen state: the merge table itself (rank, l, r — persisted at
    ``freeze`` so every batch and restart tokenizes identically; the
    IncrementalIvfIndex centroid discipline) plus one
    (group, n_words, n_tokens) row per group — kilobytes. Per batch:
    one ``bpe_token_stats`` pass (distinct-word Arrow encode, the Zipf
    cache) and a broadcast join against the frozen rows.

    The alarm bit is EXACT integer arithmetic — drift iff
    |f_batch − f_ref| > tol·f_ref, cross-multiplied to
    ``|nt_b·nw_r − nt_r·nw_b|·den > num·nt_r·nw_b`` so no float ratio
    ever decides it (the dyadic-decay discipline). ``tol`` is a
    rational (num, den), default 1/10 = ±10%."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        group_col: str = "source",
        text_col: str = "text",
        id_col: str = "doc_id",
        tol: tuple[int, int] = (1, 10),
    ) -> None:
        self.spark = spark
        self.path = path.rstrip("/")
        self.group_col = group_col
        self.text_col = text_col
        self.id_col = id_col
        self.tol = (int(tol[0]), int(tol[1]))

    @property
    def _merges_path(self) -> str:
        return f"{self.path}/merges"

    @property
    def _ref_path(self) -> str:
        return f"{self.path}/ref_fertility"

    def freeze(self, reference: DataFrame, merges: list[tuple[str, str]]) -> None:
        """Persist the merge table and the reference's per-group token
        stats (overwrite — one freeze per tokenizer/reference release)."""
        if not merges:
            raise ValueError("freeze needs a non-empty merge table")
        mdf = self.spark.createDataFrame(
            [(i, l, r) for i, (l, r) in enumerate(merges)], "rank INT, l STRING, r STRING"
        )
        mdf.coalesce(1).write.mode("overwrite").parquet(self._merges_path)
        self._group_stats(reference).write.mode("overwrite").parquet(self._ref_path)

    def _merges(self) -> list[tuple[str, str]]:
        rows = self.spark.read.parquet(self._merges_path).collect()
        return [(r["l"], r["r"]) for r in sorted(rows, key=lambda r: r["rank"])]

    def _group_stats(self, df: DataFrame) -> DataFrame:
        from ..llm.tokenize import bpe_token_stats
        from ..sources.io import fs_dir_has_data

        merges = self._merges() if fs_dir_has_data(self.spark, self._merges_path) else None
        if merges is None:
            raise ValueError(f"no frozen merge table at {self._merges_path}: freeze() first")
        stats = bpe_token_stats(df, merges, self.text_col, self.id_col)
        docs = df.select(self.id_col, self.group_col)
        return (
            stats.join(docs, self.id_col)
            .groupBy(self.group_col)
            .agg(
                F.sum("n_words").cast("long").alias("n_words"),
                F.sum("n_tokens").cast("long").alias("n_tokens"),
            )
        )

    def check_batch(self, batch: DataFrame) -> DataFrame:
        """(group, n_words, n_tokens, fertility, ref_fertility, drifted)
        — one row per group present in the batch; groups absent from the
        reference report drifted=1 (an unseen source IS the alarm)."""
        from ..sources.io import fs_dir_has_data

        if not fs_dir_has_data(self.spark, self._ref_path):
            raise ValueError(f"no frozen reference at {self._ref_path}: freeze() first")
        # freeze() persists the merge table before the reference stats,
        # so a present ref table implies a present merge table
        b = self._group_stats(batch)
        ref = self.spark.read.parquet(self._ref_path).select(
            self.group_col,
            F.col("n_words").alias("_rw"),
            F.col("n_tokens").alias("_rt"),
        )
        num, den = self.tol
        joined = b.join(F.broadcast(ref), self.group_col, "left")
        # |nt_b·nw_r − nt_r·nw_b|·den > num·nt_r·nw_b  (exact int64)
        diff = F.abs(
            F.col("n_tokens") * F.col("_rw") - F.col("_rt") * F.col("n_words")
        )
        drifted = F.when(F.col("_rw").isNull(), F.lit(True)).otherwise(
            diff * den > num * F.col("_rt") * F.col("n_words")
        )
        return joined.select(
            self.group_col,
            "n_words",
            "n_tokens",
            (F.col("n_tokens").cast("double") / F.col("n_words").cast("double")).alias(
                "fertility"
            ),
            (F.col("_rt").cast("double") / F.col("_rw").cast("double")).alias(
                "ref_fertility"
            ),
            drifted.cast("int").alias("drifted"),
        )

    def remediate(
        self,
        word_index: "IncrementalWordCountIndex",
        reference: DataFrame,
        n_merges: int = 50,
        min_count: int = 2,
    ) -> list[tuple[str, str]]:
        """The alarm→fix runbook (r14, VERDICT task 3) — what to DO when
        ``check_batch`` reports ``drifted=1``: retrain the BPE merge
        table from the LANDED word counts
        (``IncrementalWordCountIndex.train`` — no corpus rescan; word
        counts are sufficient statistics for BPE, pinned equal to
        direct corpus training by test) and REFREEZE this monitor with
        the new merges against ``reference`` — the corpus slice the
        retrained tokenizer should now fit, typically the recent landed
        batches whose arrival fired the alarm (the word index already
        holds their counts if it taps the same ingest).  After this,
        the batches that flagged read back in band: the merges apply to
        the shifted vocabulary again, and the reference fertility
        describes the shifted distribution.

        Run at a quiesced point (stream stopped, or between triggers):
        ``freeze`` overwrites the merge table and the reference stats
        as two separate per-table commits, so a check racing the
        refreeze could mix old merges with new stats.  An un-actionable
        alarm is a pager, not a pipeline — this is the action.

        Returns the new merge table, which is also the production
        tokenizer release to ship alongside the refrozen monitor."""
        merges = word_index.train(n_merges=n_merges, min_count=min_count)
        self.freeze(reference, merges)
        return merges


class IncrementalQidIndex:
    """Corpus-lifetime k-ANONYMITY class counts at ingest — the
    structural-privacy gate (``operators.validation.k_anonymity_audit``)
    maintained incrementally, so the release audit never rescans landed
    history: each micro-batch pays one batch-sized class count, and
    ``audit(k)`` answers from the merged class table.

    Why ingest-time matters for THIS gate: k-anonymity is
    anti-monotone under union — a batch that is k-anonymous on its own
    can still push a LANDED class over the risk threshold or leave a
    new class under it, so the only correct audit is over the merged
    counts, which is exactly what this index keeps. (A per-batch-only
    audit is the classic leak: 4 uniques in 4 batches look fine four
    times and ship a size-4 class at k=5.)

    Counts merge by ADDITION, so append IS merge (the
    ``IncrementalWordCountIndex`` discipline): each batch appends its
    own (qid..., n) rows keyed by ``batch_id``; reads collapse replays
    with ``dropDuplicates`` on (_batch, qid...) and groupBy-sum;
    ``compact()`` folds history into the sentinel batch −1 under the
    atomic snapshot swap (quiesced points only). State is bounded by
    QID-combination cardinality, never corpus rows.

    ``audit(k)`` returns the identical one-row summary as the batch
    operator (both call ``validation.k_anonymity_summary``), which the
    tests pin equal to running the batch audit over the union of all
    ingested batches."""

    def __init__(self, spark: SparkSession, path: str, qid_cols: list[str]) -> None:
        self.spark = spark
        self.path = path
        self.qid_cols = list(qid_cols)

    def _landed(self) -> DataFrame | None:
        return _read_landed_index(self.spark, self.path)

    def update_batch(self, df: DataFrame, batch_id: int) -> None:
        """Append this batch's (qid..., n) class counts (batch-class
        sized, keyed by ``batch_id`` for replay collapse)."""
        counts = (
            df.groupBy(*[F.col(c) for c in self.qid_cols])
            .agg(F.count("*").cast("long").alias("n"))
            .withColumn("_batch", F.lit(int(batch_id)).cast("long"))
        )
        counts.write.mode("append").parquet(self.path)

    def classes(self) -> DataFrame | None:
        """Replay-collapsed, batch-summed class table over the landed
        history; None when nothing has landed."""
        landed = self._landed()
        if landed is None:
            return None
        return (
            landed.dropDuplicates(["_batch", *self.qid_cols])
            .groupBy(*self.qid_cols)
            .agg(F.sum("n").cast("long").alias("class_size"))
        )

    def audit(self, k: int = 5) -> DataFrame:
        """The one-row release-gate summary over everything landed —
        bit-identical to ``k_anonymity_audit`` over the union of the
        ingested batches. Raises on an empty index (an empty table must
        not certify a release)."""
        from ..operators.validation import k_anonymity_summary

        cls = self.classes()
        if cls is None:
            raise ValueError(f"no landed class counts at {self.path}: ingest first")
        return k_anonymity_summary(cls, "class_size", k)

    def compact(self) -> None:
        """Fold per-batch rows into one class-table snapshot under the
        sentinel batch −1 (atomic swap); quiesced points only."""
        from ..sources.io import overwrite_atomic

        cls = self.classes()
        if cls is None:
            return
        overwrite_atomic(
            cls.withColumnRenamed("class_size", "n").withColumn(
                "_batch", F.lit(-1).cast("long")
            ),
            self.path,
        )
