#!/bin/sh
# Boot the inputlayer-spark server from $SPARK_GRAFT_CONFIG (falling
# back to the config.toml/env layering in the working directory when
# unset or missing). INPUTLAYER_SECTION__KEY env vars override file
# keys either way — the same precedence as a host install. Any extra
# arguments are passed through to the server CLI.
set -e

if [ -n "$SPARK_GRAFT_CONFIG" ] && [ -f "$SPARK_GRAFT_CONFIG" ]; then
    exec python -m inputlayer_spark.server --config "$SPARK_GRAFT_CONFIG" "$@"
fi
exec python -m inputlayer_spark.server "$@"
