#!/usr/bin/env bash
# ThreadSanitizer run over the threaded native kernels (SURVEY.md §5 race
# detection row: the reference leans on Rust's compile-time guarantees; our
# threaded hot path is C++, so we check it dynamically).
#
# Builds native/{stripe,chain,sketch}.cpp + dev/tsan_stripe.cpp with
# -fsanitize=thread and runs the batch aligner on a 16-thread worker pool.
# Exit code != 0 on any reported race (TSAN aborts with 66 by default here
# via halt_on_error) or on a wrong alignment status.
set -euo pipefail
cd "$(dirname "$0")/.."
OUT=$(mktemp -d)
trap 'rm -rf "$OUT"' EXIT
g++ -O1 -g -fsanitize=thread -fPIC -pthread \
    pangraph_tpu/native/stripe.cpp pangraph_tpu/native/chain.cpp \
    pangraph_tpu/native/sketch.cpp dev/tsan_stripe.cpp -o "$OUT/tsan_stripe"
TSAN_OPTIONS="halt_on_error=1" "$OUT/tsan_stripe"
echo "TSAN: no data races reported"
