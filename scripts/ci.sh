#!/bin/sh
# One-command verification: unit tests, the full oracle sweep at
# sf0.01 (the driver's correctness gate, run locally), and the
# sf0.1 bench. Each stage fails the script on error.
set -e
cd "$(dirname "$0")/.."
python -m pytest tests/ -q
python scripts/check_oracles.py
python bench.py
