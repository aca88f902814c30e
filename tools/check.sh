#!/bin/sh
# Green-before-snapshot gate: the full test suite, with warnings as
# errors (pyproject filterwarnings), must pass before any commit.
# Usage: tools/check.sh [extra pytest args]
set -e
cd "$(dirname "$0")/.."
exec python -m pytest tests/ -q "$@"
