#!/bin/sh
# Pre-training launch (reference: scripts_dws/dws_mvlt_exp21.sh).
# Single-host TPU: one process drives all local chips via the mesh.
# Multi-host: set MVLT_MULTIHOST=1 and launch one process per host.
set -e
cd "$(dirname "$0")/.."
exec python -m mvlt_tpu.cli --config configs/pretrain_exp21.py "$@"
