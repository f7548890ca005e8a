#!/bin/bash
# Provision the live-PG gate for PagilaLiveSpec in an offline sandbox:
# a throwaway PostgreSQL 15 cluster on localhost:5544 (trust auth, UTC)
# loaded with scripts/pagila_shaped.sql (see that file's header for why
# the data is synthesized rather than the real pagila dump). Then:
#
#   FLACO_PG_URI='jdbc:postgresql://localhost:5544/postgres?user=postgres' \
#     sbt "testOnly graft.jdbc.PagilaLiveSpec"
#
# The JVM side needs no pgjdbc: graft.jdbc.MiniPgDriver (main source)
# serves jdbc:postgresql URLs over its own v3 wire client.
set -euo pipefail
PGBIN=/usr/lib/postgresql/15/bin
DATA=${1:-/tmp/flaco_pg}
PORT=${2:-5544}
if [ "$(id -u)" = 0 ]; then RUN="su postgres -s /bin/bash -c"; else RUN="bash -c"; fi
mkdir -p "$DATA" && chown postgres:postgres "$DATA" 2>/dev/null || true
if [ ! -d "$DATA/data" ]; then
  $RUN "$PGBIN/initdb -D $DATA/data -U postgres --auth=trust -E UTF8" >/dev/null
fi
$RUN "$PGBIN/pg_ctl -D $DATA/data -l $DATA/log -o '-p $PORT -c listen_addresses=localhost -c timezone=UTC -c unix_socket_directories=$DATA' status" >/dev/null 2>&1 || \
  $RUN "$PGBIN/pg_ctl -D $DATA/data -l $DATA/log -o '-p $PORT -c listen_addresses=localhost -c timezone=UTC -c unix_socket_directories=$DATA' start" >/dev/null
psql -h localhost -p "$PORT" -U postgres -v ON_ERROR_STOP=1 \
  -f "$(dirname "$0")/pagila_shaped.sql" >/dev/null
echo "live-PG gate ready: jdbc:postgresql://localhost:$PORT/postgres?user=postgres"
