#!/usr/bin/env bash
# WER-parity protocol wrapper (BASELINE.md quality target: <= 0.1 abs WER).
# Reference protocol: examples/asr_librispeech/run.sh:266-290 (decode +
# score). See run_parity.py --help for all flags.
#
# Usage:
#   run_parity.sh CKPT.pt DATA_DIR SUBSET REF_WER [extra run_parity.py args]
#   run_parity.sh --dry-run
set -euo pipefail
cd "$(dirname "$0")/../.."
if [[ "${1:-}" == "--dry-run" ]]; then
  exec python examples/parity/run_parity.py --dry-run
fi
ckpt=$1; data=$2; subset=$3; ref_wer=$4; shift 4
exec python examples/parity/run_parity.py \
  --ref-checkpoint "$ckpt" --data "$data" --gen-subset "$subset" \
  --ref-wer "$ref_wer" "$@"
