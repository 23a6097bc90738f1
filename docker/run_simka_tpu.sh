#!/bin/sh
# Entry point mirroring the reference container's simka|visu|test
# commands (reference docker/run_simka.sh).
cmd="$1"
if [ -n "$1" ]; then shift; fi
case "$cmd" in
  simka) exec simka-tpu "$@" ;;
  min) exec simka-tpu min "$@" ;;
  visu) exec simka-tpu-visualization "$@" ;;
  test) exec python -m pytest /opt/simka-tpu/tests -q "$@" ;;
  *) echo "usage: {simka|min|visu|test} [args...]" >&2; exit 2 ;;
esac
