"""Batch sources and sinks — see ``io`` for the implementations."""

from .io import (
    append_parquet,
    overwrite_atomic,
    read_csv,
    read_jsonl,
    read_kafka_batch,
    read_parquet,
    to_kafka_payload,
    write_bucketed_table,
    write_kafka,
    write_partitioned,
)

__all__ = [
    "append_parquet",
    "overwrite_atomic",
    "read_csv",
    "read_jsonl",
    "read_kafka_batch",
    "read_parquet",
    "to_kafka_payload",
    "write_bucketed_table",
    "write_kafka",
    "write_partitioned",
]
