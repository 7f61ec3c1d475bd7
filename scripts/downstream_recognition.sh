#!/bin/sh
# M-CR/S-CR recognition eval (reference: downstream_recognition.sh).
set -e
cd "$(dirname "$0")/.."
exec python -m mvlt_tpu.cli --config configs/finetune_exp48.py --eval-recognition "$@"
