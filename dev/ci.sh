#!/usr/bin/env bash
# CI entry point: editable install, full test suite, smoke runs.
# Mirrors the reference's .github/workflows/cli.yml (build + cargo test +
# smoke tests) for this repo's Python/JAX stack.
set -euo pipefail
cd "$(dirname "$0")/.."

pip install -e . --no-deps --no-build-isolation -q

# unit + integration tests on the virtual 8-device CPU mesh (conftest.py)
python -m pytest tests/ -q -x

# smoke runs over the bundled datasets (skips LFS stubs gracefully)
python dev/smoke.py

echo "CI OK"
