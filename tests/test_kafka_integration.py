"""Live-broker Kafka integration test — opt-in, environment-gated.

The dev container ships neither a broker, a Python Kafka client, nor the
Spark Kafka connector jar, so the default suite exercises the Kafka
surface broker-free (value-path tests over Kafka-shaped frames, encode→
decode roundtrip properties, plan-construction tests of the builders —
see docs/STREAMING.md "Kafka without a broker").

This module closes the last gap WHEN an environment provides a broker:

    export SPARK_GRAFT_KAFKA_BROKERS=localhost:9092
    python -m pytest tests/test_kafka_integration.py -q

It builds its own session with the Kafka connector package (downloaded
by Spark at session start — network required) and round-trips a batch
through a real topic: ``write_kafka`` → broker → ``read_kafka_batch`` →
``parse_json_events``, asserting payloads survive bit-exact. The manual
copy-paste variant of the same check lives in docs/STREAMING.md.
"""

from __future__ import annotations

import os
import uuid

import pytest

BROKERS = os.environ.get("SPARK_GRAFT_KAFKA_BROKERS")

pytestmark = pytest.mark.skipif(
    not BROKERS,
    reason="set SPARK_GRAFT_KAFKA_BROKERS=host:port to run the live-broker roundtrip",
)

#: Connector coordinates matching the installed pyspark (4.x / Scala 2.13).
KAFKA_PACKAGE = "org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2"


@pytest.fixture(scope="module")
def kafka_spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.appName("spark_graft_kafka_it")
        .master("local[4]")
        .config("spark.jars.packages", KAFKA_PACKAGE)
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    yield s
    s.stop()


def test_kafka_roundtrip_batch(kafka_spark):
    """write_kafka → broker → read_kafka_batch → parse_json_events is the
    identity on the payload columns (the broker-free roundtrip property
    test, now through a real broker)."""
    from pyspark.sql import functions as F

    from simple_pos_kafka_pyspark_airflow_spark.sources.io import read_kafka_batch, write_kafka
    from simple_pos_kafka_pyspark_airflow_spark.streaming.ingest import parse_json_events

    topic = f"spark_graft_it_{uuid.uuid4().hex[:8]}"
    schema = "sale_id long, customer_id long, quantity int, price double"
    rows = [(1, 7, 2, 9.5), (2, 8, 1, 3.25), (3, 7, 5, 0.99)]
    df = kafka_spark.createDataFrame(rows, schema)

    write_kafka(df, BROKERS, topic, key_col="customer_id")
    raw = read_kafka_batch(kafka_spark, BROKERS, topic)
    parsed = parse_json_events(raw.select(F.col("value").cast("string")), schema)

    good = parsed.where(F.col("_corrupt").isNull())
    got = sorted(
        (r["sale_id"], r["customer_id"], r["quantity"], r["price"]) for r in good.collect()
    )
    assert got == sorted(rows)
    # keys partition by customer: same customer's events share a partition
    by_key = (
        raw.select(F.col("key").cast("string").alias("k"), "partition")
        .groupBy("k")
        .agg(F.countDistinct("partition").alias("nparts"))
    )
    assert by_key.where(F.col("nparts") > 1).count() == 0
