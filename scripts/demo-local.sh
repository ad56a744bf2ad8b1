#!/bin/sh
# Stand up a local dev server with a throwaway warehouse and open the
# console (role parity with the reference's scripts/demo-local.sh).
# Usage: ./scripts/demo-local.sh [port]
set -e
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
PORT="${1:-8080}"
DATA="$(mktemp -d /tmp/inputlayer-demo-XXXXXX)"
echo "warehouse/WAL: $DATA"
echo "console:       http://127.0.0.1:$PORT/  (front site at /front)"
exec python -m inputlayer_spark.server --host 127.0.0.1 --port "$PORT" \
    --wal-dir "$DATA"
