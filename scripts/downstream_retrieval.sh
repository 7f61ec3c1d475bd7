#!/bin/sh
# Zero-shot ITR + TIR retrieval (reference: downstream_retrieval.sh).
# Usage: scripts/downstream_retrieval.sh --data-path <root> --resume <ckpt>
set -e
cd "$(dirname "$0")/.."
python -m mvlt_tpu.cli --config configs/pretrain_exp21.py --eval-retrieval-itr "$@"
python -m mvlt_tpu.cli --config configs/pretrain_exp21.py --eval-retrieval-tir "$@"
