"""The whole reference pipeline, composed: 9 topics → routed CDC → warehouse.

The reference runs three moving parts (SURVEY.md §0): a producer publishing
to 9 Kafka topics — {sale, product, customer} × {add, edit, remove}
(``kafka_producer.py:11-19``), a 9-thread consumer materializing them into
CSV state files (``kafka_consumer.py:379-409``), and an hourly Spark DAG
diffing the CSVs into Postgres (``POS_spark_dag.py:418-465``). This module
is that entire topology as ONE Structured Streaming program:

    raw (topic, value, seq) stream
      └─ per entity: filter topic prefix → from_json(entity schema)
                     → op = topic suffix (add/edit → upsert, remove → delete)
                     → foreachBatch(ParquetCdcSink)  [one query per entity]

The CSV-state-file middle hop disappears: events apply straight to the
warehouse with last-write-wins per key inside each micro-batch, and
``Trigger.AvailableNow`` reproduces the reference's hourly batch-drain
cadence under checkpointed exactly-once instead of the mtime heuristic.

Scale: entities are independent queries (independent checkpoints and
failure domains, like the reference's threads but supervised); each
micro-batch costs one pk shuffle + one snapshot write. Topic partitioning
is the parallelism knob end to end.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .cdc import OP_COL, OP_DELETE, OP_UPSERT, ParquetCdcSink
from .ingest import parse_json_events


@dataclass(frozen=True)
class EntitySpec:
    """One warehouse entity fed by {name}_add / {name}_edit / {name}_remove
    topics. ``schema`` is the snapshot DDL (no op/seq columns); events add
    ``seq`` (the per-event monotonic order, e.g. Kafka offset)."""

    name: str
    schema: str
    pk: str

    @property
    def event_schema(self) -> str:
        return f"{self.schema}, seq long"


#: The reference's three entities over the driver-testdata shapes.
POS_ENTITIES = (
    EntitySpec("sales", "sale_id long, customer_id long, quantity int, price double", "sale_id"),
    EntitySpec("products", "product_id long, category string, stock_level int", "product_id"),
    EntitySpec("customers", "customer_id long, name string, level string", "customer_id"),
)


def entity_events(raw: DataFrame, spec: EntitySpec, topic_col: str = "topic") -> DataFrame:
    """Route one entity's topics out of the combined stream and type them:
    topic prefix selects, JSON parses against the declared schema, the
    topic suffix becomes the CDC op. Corrupt payloads are dropped here
    (count them into a dead-letter sink in production — the _corrupt column
    is already populated)."""
    # a NULL payload (Kafka tombstone, producer bug) parses to all-null
    # fields with _corrupt ALSO null — the corrupt filter alone would
    # wave an all-null row into the warehouse upsert. Gate on the RAW
    # value, not the parsed pk: reference `*_sale` events legitimately
    # carry no pk (the pipeline assigns ids downstream, T2). Null-value
    # rows route to corrupt_events, never silently forward.
    mine = raw.where(
        F.col(topic_col).startswith(f"{spec.name}_") & F.col("value").isNotNull()
    )
    parsed = parse_json_events(mine, spec.event_schema, keep=[topic_col])
    op = F.when(F.col(topic_col).endswith("_remove"), F.lit(OP_DELETE)).otherwise(
        F.lit(OP_UPSERT)
    )
    return (
        parsed.where(F.col("_corrupt").isNull())
        .withColumn(OP_COL, op)
        .drop(topic_col, "_corrupt")
    )


def corrupt_events(raw: DataFrame, spec: EntitySpec, topic_col: str = "topic") -> DataFrame:
    """The dead-letter complement of ``entity_events``: rows of the
    entity's topics whose payload failed the schema parse, with the raw
    payload and routing metadata preserved for replay/alerting. Production
    wiring: a second ``writeStream`` on this frame into a quarantine table
    — corrupt data is never silently dropped, and the partition/offset
    columns (when present) identify the exact source records."""
    mine = raw.where(F.col(topic_col).startswith(f"{spec.name}_"))
    meta = [c for c in ("partition", "offset", "timestamp") if c in raw.columns]
    parsed = parse_json_events(mine, spec.event_schema, keep=[topic_col, *meta, "value"])
    # exact complement of entity_events' gate: schema-corrupt payloads
    # (_corrupt set) AND null-payload tombstones (value null, where
    # _corrupt is null too — the row is preserved with a null payload
    # column; topic/partition/offset identify the source record)
    bad = F.col("_corrupt").isNotNull() | F.col("value").isNull()
    return parsed.where(bad).select(
        topic_col,
        *meta,
        F.coalesce(F.col("_corrupt"), F.col("value").cast("string")).alias("_corrupt"),
    )


def build_sinks(
    spark: SparkSession, warehouse_dir: str, entities: tuple[EntitySpec, ...] = POS_ENTITIES
) -> dict[str, ParquetCdcSink]:
    return {
        spec.name: ParquetCdcSink(
            spark,
            os.path.join(warehouse_dir, spec.name),
            pk=spec.pk,
            order_col="seq",
            schema=spec.schema,
        )
        for spec in entities
    }


def start_pipeline(
    raw_stream: DataFrame,
    sinks: dict[str, ParquetCdcSink],
    checkpoint_dir: str,
    entities: tuple[EntitySpec, ...] = POS_ENTITIES,
    available_now: bool = True,
):
    """Start one streaming query per entity; returns the query handles.
    ``available_now=True`` drains everything pending then stops — the
    reference's hourly batch tick; ``False`` runs continuously."""
    queries = []
    for spec in entities:
        sink = sinks[spec.name]
        writer = (
            entity_events(raw_stream, spec)
            .writeStream.foreachBatch(sink.foreach_batch)
            .option("checkpointLocation", os.path.join(checkpoint_dir, spec.name))
            .queryName(f"pos_cdc_{spec.name}")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        queries.append(writer.start())
    return queries
