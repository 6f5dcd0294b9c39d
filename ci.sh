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

echo "== tests: on-TPU lane (skips itself when no TPU is attached) =="
# Runs the Mosaic-compiled Pallas kernels, per-filter TPU-vs-CPU parity
# at A4 shape, compile-time HBM budget guards, and one fused-chain
# execution at the bench shape (A4 x 8). This lane exists because
# round 2 shipped a green CPU suite alongside a bench-scale TPU OOM.
python -m pytest tests_tpu/ -q

if [[ "${1:-}" == "--bench" ]]; then
  echo "== bench: quick smoke =="
  python bench.py --quick
fi

echo "CI OK"
