#!/bin/sh
# Recognition fine-tuning (reference: scripts_dws/dws_mvlt_ft_exp48.sh).
set -e
cd "$(dirname "$0")/.."
exec python -m mvlt_tpu.cli --config configs/finetune_exp48.py "$@"
