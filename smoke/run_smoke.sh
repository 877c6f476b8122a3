#!/usr/bin/env bash
# Live smoke for the kafka-source + jdbc-sink + table-log branches
# (graft.tools.LiveSmoke): brings up one Kafka broker + Postgres
# (docker-compose.yml here), publishes a seeded tape to the four reference
# topics, ingests kafka -> postgres through IngestJobs AND kafka ->
# commit-log -> graftlog streaming tail (the exactly-once append +
# versions-as-offsets loop), verifying row counts both ways. Requires
# docker + network
# access (spark-submit resolves the kafka connector and Postgres driver via
# --packages), so it CANNOT run in the zero-egress build sandbox — run it on
# any networked host with the repo's assembled classes.
#
# Usage: smoke/run_smoke.sh [spark-submit]   (default: spark-submit on PATH)
set -euo pipefail
cd "$(dirname "$0")"
SUBMIT="${1:-spark-submit}"

docker compose up -d
trap 'docker compose down -v' EXIT

echo "waiting for kafka + postgres..."
for i in $(seq 1 60); do
  docker compose exec -T kafka /opt/kafka/bin/kafka-broker-api-versions.sh \
    --bootstrap-server localhost:9092 >/dev/null 2>&1 &&
  docker compose exec -T postgres pg_isready -U graft >/dev/null 2>&1 && break
  sleep 2
done

( cd .. && sbt -batch package )
JAR=$(ls ../target/scala-2.13/*.jar | head -1)

GRAFT_SMOKE_BROKER=localhost:9092 \
GRAFT_SMOKE_JDBC=jdbc:postgresql://localhost:5432/graft \
GRAFT_SMOKE_USER=graft GRAFT_SMOKE_PASSWORD=graft \
"$SUBMIT" \
  --master 'local[4]' \
  --packages org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2,org.postgresql:postgresql:42.7.3 \
  --class graft.tools.LiveSmoke \
  "$JAR"
echo "smoke finished"
