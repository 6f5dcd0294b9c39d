#!/usr/bin/env bash
# CI entry point (SURVEY.md §2.3 — the reference's GitLab CI builds both
# artifacts and runs the Python suite; this is the equivalent one-command
# gate). Run before every round snapshot: a red suite must never ship.
#
#   ./ci.sh          build native artifacts + full test suite
#   ./ci.sh --bench  also run the quick benchmark smoke (needs a device)
set -euo pipefail
cd "$(dirname "$0")"

echo "== build: C++ oracle (golden-parity authority) =="
make -C oracle

echo "== build: native IO runtime =="
make -C native

echo "== tests: full suite (CPU via tests/conftest.py) =="
python -m pytest tests/ -q

if [[ "${1:-}" == "--bench" ]]; then
  echo "== bench: quick smoke =="
  python bench.py --quick
fi

echo "CI OK"
