#!/usr/bin/env bash
# Format the tree (reference scripts/format.sh parity):
# ruff for Python, clang-format for the C++ host library.
set -euo pipefail
cd "$(dirname "$0")/.."
python -m ruff check --fix vptq_tpu/ tests/ examples/ bench.py || true
python -m ruff format vptq_tpu/ tests/ examples/ bench.py 2>/dev/null || true
command -v clang-format >/dev/null && clang-format -i csrc/*.cc || true
