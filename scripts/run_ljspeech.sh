#!/usr/bin/env bash
# LJSpeech training launcher (the reference's run scripts are SLURM wrappers
# setting PYTHONPATH across three repos, reference: run_vctk.sh; here one repo
# and no SLURM dependency — submit this script with sbatch if desired).
set -euo pipefail

CORPUS_DIR=${1:?usage: run_ljspeech.sh CORPUS_DIR WORK_DIR}
WORK_DIR=${2:?usage: run_ljspeech.sh CORPUS_DIR WORK_DIR}
REPO=$(cd "$(dirname "$0")/.." && pwd)
DATA_DIR=$WORK_DIR/data
CKPT_DIR=$WORK_DIR/ckpt
mkdir -p "$DATA_DIR" "$CKPT_DIR"
cd "$REPO"

# 1. preprocess (emits per-utterance tfrecords + hparams.json corpus stats)
python -c "from self_attention_tacotron_tpu.cli.preprocess import main_ljspeech; import sys; sys.exit(main_ljspeech())" \
  "$CORPUS_DIR" "$DATA_DIR" \
  --hparam-json-file examples/ljspeech/self-attention-tacotron.json

# 2. split the key list 95/2.5/2.5
python - "$DATA_DIR" <<'EOF'
import sys, os
d = sys.argv[1]
keys = [k for k in open(os.path.join(d, "list.csv")).read().split() if k]
n = len(keys)
splits = {"train.csv": keys[: int(n * 0.95)],
          "validation.csv": keys[int(n * 0.95): int(n * 0.975)],
          "test.csv": keys[int(n * 0.975):]}
for name, ks in splits.items():
    open(os.path.join(d, name), "w").write("\n".join(ks) + "\n")
EOF

# 3. merge corpus stats into the model config
python - "$DATA_DIR" examples/ljspeech/self-attention-tacotron.json "$WORK_DIR/config.json" <<'EOF'
import json, os, sys
data_dir, config, out = sys.argv[1:4]
cfg = json.load(open(config))
cfg.update(json.load(open(os.path.join(data_dir, "hparams.json"))))
json.dump(cfg, open(out, "w"), indent=2)
EOF

# 4. train
python -m self_attention_tacotron_tpu.cli.train \
  --source-data-root="$DATA_DIR" --target-data-root="$DATA_DIR" \
  --checkpoint-dir="$CKPT_DIR" --hparam-json-file="$WORK_DIR/config.json"
