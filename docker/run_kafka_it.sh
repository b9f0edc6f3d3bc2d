#!/usr/bin/env bash
# Spin up the single-node broker, run the live-broker integration test,
# and tear the broker down again — the one-command form of the recipe in
# docs/STREAMING.md ("Verifying against a real broker"). Requires Docker
# and network access (Spark downloads the Kafka connector jar once).
set -euo pipefail
cd "$(dirname "$0")/.."

COMPOSE="docker compose -f docker/kafka-compose.yml"
$COMPOSE up -d --wait
trap '$COMPOSE down -v' EXIT

export SPARK_GRAFT_KAFKA_BROKERS="${SPARK_GRAFT_KAFKA_BROKERS:-localhost:9092}"
python -m pytest tests/test_kafka_integration.py -q
