#!/bin/sh
# Smoke test on the reference's 5-sample example dataset (the
# counterpart of /root/reference/example/simple_test.sh).
set -e
EXAMPLE_INPUT="${1:-/root/reference/example/simka_input.txt}"
OUT="${2:-./simka_example_results}"

python -m simka_tpu.cli \
    -in "$EXAMPLE_INPUT" \
    -out "$OUT" \
    -simple-dist -complex-dist \
    -kmer-size 21 -abundance-min 2

echo
echo "*** simka-tpu example PASSED ***"
echo "matrices in $OUT"
