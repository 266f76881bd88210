#!/usr/bin/env bash
# Launch the KG-construction pipeline on a running Ray cluster via the
# Jobs API (the north-rule launch path: `ray job submit` against a
# fixed-size multi-node cluster).
#
#   RAY_ADDRESS=http://<head>:8265 scripts/submit_kg.sh <sf_or_transcript_dir> <out_dir> [partitions]
#
# With partitions > 0 the run is checkpointed: each partition commits to
# <out_dir>/MANIFEST.jsonl and a resubmit after failure skips completed
# partitions (ntto_ray/state/checkpoint.py).
set -euo pipefail
SF_DIR=${1:?input dir}
OUT=${2:?output dir}
PARTS=${3:-0}
REPO_ROOT="$(cd "$(dirname "$0")/.." && pwd)"
exec ray job submit \
  --working-dir "$REPO_ROOT" \
  -- python -m ntto_ray --kg-sf-dir "$SF_DIR" --kg-out "$OUT" --partitions "$PARTS"
