#!/usr/bin/env bash
# Single-host TPU training runner (the reference's SLURM submit.sh analog,
# /root/reference/submit.sh). Adjust dataset/root and pass through any CLI
# flags: ./scripts/submit_tpu.sh train-step1 --dataset nyu --root /data/nyu
set -euo pipefail
cd "$(dirname "$0")/.."

export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/tmp/jaxcache}"
mkdir -p logs
exec python -m nconv_tpu "$@" 2>&1 | tee "logs/$(date +%Y%m%d_%H%M%S)_$1.log"
