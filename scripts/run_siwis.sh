#!/usr/bin/env bash
# SIWIS bilingual VQ-code end-to-end: preprocess -> train -> predict_code ->
# postprocess (reference workflow: run_siwis.sh -> preprocess_vqcodes
# --siwis -> train -> predict_code -> postprocess_vqcodes, driven by the
# canonical splits in examples/codes_siwis/).
set -euo pipefail

CODES_DIR=${1:?usage: run_siwis.sh CODES_DIR WORK_DIR [SPEAKER_INFO]}
WORK_DIR=${2:?usage: run_siwis.sh CODES_DIR WORK_DIR [SPEAKER_INFO]}
SPEAKER_INFO=${3:-$CODES_DIR/siwis-speaker-info.txt}
REPO=$(cd "$(dirname "$0")/.." && pwd)
DATA_DIR=$WORK_DIR/data
CKPT_DIR=$WORK_DIR/ckpt
PRED_DIR=$WORK_DIR/pred
LIST_DIR=$WORK_DIR/lists
mkdir -p "$DATA_DIR" "$CKPT_DIR" "$PRED_DIR" "$LIST_DIR"
cd "$REPO"
CFG=examples/codes_siwis/self-attention-tacotron.json

python -c "from self_attention_tacotron_tpu.cli.preprocess import main_vqcodes; import sys; sys.exit(main_vqcodes())" \
  "$CODES_DIR" "$DATA_DIR" --siwis --num-codes 1025 \
  --speaker-info "$SPEAKER_INFO" --hparam-json-file "$CFG" \
  --split 0.8:0.17:0.03

for name in train validation test; do
  python -m self_attention_tacotron_tpu.cli.speaker_selection crosscheck \
    "examples/codes_siwis/$name.csv" "$DATA_DIR" --out "$LIST_DIR/$name.csv"
done

python -m self_attention_tacotron_tpu.cli.train \
  --source-data-root="$DATA_DIR" --target-data-root="$DATA_DIR" \
  --checkpoint-dir="$CKPT_DIR" --selected-list-dir="$LIST_DIR" \
  --hparam-json-file="$CFG"

python -c "from self_attention_tacotron_tpu.cli.predict import main_code; import sys; sys.exit(main_code())" \
  --source-data-root="$DATA_DIR" --target-data-root="$DATA_DIR" \
  --checkpoint-dir="$CKPT_DIR" --output-dir="$PRED_DIR" \
  --selected-list-dir="$LIST_DIR" --hparam-json-file="$CFG"

python -m self_attention_tacotron_tpu.cli.postprocess "$PRED_DIR" \
  "$WORK_DIR/synth" --experiment "$(basename "$WORK_DIR")"
