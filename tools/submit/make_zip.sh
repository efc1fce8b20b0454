#!/usr/bin/env bash
# Package the engine for spark-submit --py-files.
set -euo pipefail
cd "$(dirname "$0")/../.."
mkdir -p dist
rm -f dist/engine.zip
zip -qr dist/engine.zip html_parser_spark -x '*__pycache__*'
echo "dist/engine.zip ($(du -h dist/engine.zip | cut -f1))"
