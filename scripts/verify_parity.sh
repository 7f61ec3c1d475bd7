#!/bin/sh
# One-command metric-parity check against the reference's published numbers
# (README.md:42-49).  Requires the Google-Drive checkpoints and a real
# Fashion-Gen tree; each check SKIPs with a clear message when its inputs
# are absent.  See mvlt_tpu/eval/parity.py for the tolerance policy.
#
# Usage: scripts/verify_parity.sh --data-path <fashion_gen_root> \
#            [--retrieval-pth <checkpoint_retrieval.pth>] \
#            [--recognition-pth <checkpoint_recognition.pth>]
set -e
cd "$(dirname "$0")/.."
exec python -m mvlt_tpu.eval.parity "$@"
