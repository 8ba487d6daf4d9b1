#!/usr/bin/env bash
# VCTK multi-speaker end-to-end: preprocess -> train -> predict_mel
# (reference workflow: run_vctk.sh -> preprocess_vctk.py -> train.py ->
#  predict_mel.py, driven by the canonical splits in examples/vctk/ and the
#  speaker_selection/ accent data).
set -euo pipefail

CORPUS_DIR=${1:?usage: run_vctk.sh CORPUS_DIR WORK_DIR [VCTK_VERSION]}
WORK_DIR=${2:?usage: run_vctk.sh CORPUS_DIR WORK_DIR [VCTK_VERSION]}
VERSION=${3:-0.8}
REPO=$(cd "$(dirname "$0")/.." && pwd)
DATA_DIR=$WORK_DIR/data
CKPT_DIR=$WORK_DIR/ckpt
PRED_DIR=$WORK_DIR/pred
LIST_DIR=$WORK_DIR/lists
mkdir -p "$DATA_DIR" "$CKPT_DIR" "$PRED_DIR" "$LIST_DIR"
cd "$REPO"
CFG=examples/vctk/self-attention-tacotron.json

python -c "from self_attention_tacotron_tpu.cli.preprocess import main_vctk; import sys; sys.exit(main_vctk())" \
  "$CORPUS_DIR" "$DATA_DIR" --version "$VERSION" --hparam-json-file "$CFG" \
  --split 0.95:0.025:0.025

# canonical splits, cross-checked against the processed files; optionally
# filter to the selected accents (speaker_selection/Am_Ca_Au_En.txt)
for name in train validation test; do
  python -m self_attention_tacotron_tpu.cli.speaker_selection crosscheck \
    "examples/vctk/$name.csv" "$DATA_DIR" --out "$LIST_DIR/$name.csv"
done

python - "$DATA_DIR" "$CFG" "$WORK_DIR/config.json" <<'EOF'
import json, os, sys
data_dir, config, out = sys.argv[1:4]
cfg = json.load(open(config))
cfg.update(json.load(open(os.path.join(data_dir, "hparams.json"))))
json.dump(cfg, open(out, "w"), indent=2)
EOF

python -m self_attention_tacotron_tpu.cli.train \
  --source-data-root="$DATA_DIR" --target-data-root="$DATA_DIR" \
  --checkpoint-dir="$CKPT_DIR" --selected-list-dir="$LIST_DIR" \
  --hparam-json-file="$WORK_DIR/config.json"

python -c "from self_attention_tacotron_tpu.cli.predict import main_mel; import sys; sys.exit(main_mel())" \
  --source-data-root="$DATA_DIR" --target-data-root="$DATA_DIR" \
  --checkpoint-dir="$CKPT_DIR" --output-dir="$PRED_DIR" \
  --selected-list-dir="$LIST_DIR" --hparam-json-file="$WORK_DIR/config.json"
