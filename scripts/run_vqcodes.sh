#!/usr/bin/env bash
# VQ-code corpus training + prediction + postprocess launcher
# (reference workflow: run_phn100.sh -> preprocess_vqcodes -> train ->
#  predict_code -> postprocess_vqcodes).
set -euo pipefail

CODES_DIR=${1:?usage: run_vqcodes.sh CODES_DIR WORK_DIR [SPEAKER_INFO]}
WORK_DIR=${2:?usage: run_vqcodes.sh CODES_DIR WORK_DIR [SPEAKER_INFO]}
SPEAKER_INFO=${3:-$CODES_DIR/speaker-info.txt}
REPO=$(cd "$(dirname "$0")/.." && pwd)
DATA_DIR=$WORK_DIR/data
CKPT_DIR=$WORK_DIR/ckpt
PRED_DIR=$WORK_DIR/pred
mkdir -p "$DATA_DIR" "$CKPT_DIR" "$PRED_DIR"
cd "$REPO"
CFG=examples/codes/self-attention-tacotron.json

python -c "from self_attention_tacotron_tpu.cli.preprocess import main_vqcodes; import sys; sys.exit(main_vqcodes())" \
  "$CODES_DIR" "$DATA_DIR" --num-codes 1025 --speaker-info "$SPEAKER_INFO" \
  --hparam-json-file "$CFG" --split 0.95:0.025:0.025

# prefer the reference's canonical splits when the corpus matches
# (examples/codes/*.csv), cross-checked against the processed files
for name in train validation test; do
  python -m self_attention_tacotron_tpu.cli.speaker_selection crosscheck \
    "examples/codes/$name.csv" "$DATA_DIR" --out "$DATA_DIR/$name.canonical.csv" || true
done

python -m self_attention_tacotron_tpu.cli.train \
  --source-data-root="$DATA_DIR" --target-data-root="$DATA_DIR" \
  --checkpoint-dir="$CKPT_DIR" --hparam-json-file="$CFG"

python -c "from self_attention_tacotron_tpu.cli.predict import main_code; import sys; sys.exit(main_code())" \
  --source-data-root="$DATA_DIR" --target-data-root="$DATA_DIR" \
  --checkpoint-dir="$CKPT_DIR" --output-dir="$PRED_DIR" \
  --selected-list-dir="$DATA_DIR" --hparam-json-file="$CFG"

python -m self_attention_tacotron_tpu.cli.postprocess "$PRED_DIR" \
  "$WORK_DIR/synth" --experiment "$(basename "$WORK_DIR")"
