#!/bin/sh
# One-command compose deployment (role parity with the reference's
# scripts/demo-deploy.sh): builds the image and brings up the TLS
# stack, or the plain-HTTP stack with NO_TLS=1.
# Usage: DOMAIN=example.com ./scripts/demo-deploy.sh
#        NO_TLS=1 PORT=8080 ./scripts/demo-deploy.sh
set -e
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
if [ -n "$NO_TLS" ]; then
    exec docker compose -f docker-compose-no-tls.yml up -d --build
fi
exec docker compose up -d --build
