#!/bin/bash
# Apply a per-model overlay: ./deploy_model.sh <model-dir-under-models/>
# (counterpart of the reference's deployment/deploy_model.sh)
set -euo pipefail
cd "$(dirname "$0")"
if [ -z "${1:-}" ] || [ ! -d "models/$1" ]; then
  echo "usage: $0 <model>; available:" >&2
  ls models >&2
  exit 1
fi
kubectl apply -k "models/$1"
