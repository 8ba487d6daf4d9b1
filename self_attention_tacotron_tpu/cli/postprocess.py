"""VQ-code postprocessing: prediction TFRecords -> code-int text files.

Parity target: reference postprocess_vqcodes.py:54-111 (and the tsu_*
variants): for every prediction record write ``<key>.txt`` (text),
``<key>.preds.txt`` / ``<key>.truth.txt`` (space-joined argmax code ids),
plus corpus-level ``<exp>.txt`` / ``<exp>.hypothesis.txt`` / ``<exp>.true.txt``
lists for the external synthesizer.
"""

from __future__ import annotations

import argparse
import glob
import logging
import os
import sys

import numpy as np


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser()
    p.add_argument("prediction_dir")
    p.add_argument("out_dir")
    p.add_argument("--experiment", default="exp")
    p.add_argument("--list-out-dir", default=None)
    args = p.parse_args(argv)
    log = logging.getLogger("postprocess")

    from ..data.records import parse_prediction_record
    from ..data.tfrecord import read_examples

    os.makedirs(args.out_dir, exist_ok=True)
    list_dir = args.list_out_dir or args.out_dir
    os.makedirs(list_dir, exist_ok=True)

    txtlist, predlist, truthlist = [], [], []
    records = sorted(glob.glob(os.path.join(args.prediction_dir,
                                            "*.tfrecord")))
    for record_file in records:
        for example in read_examples(record_file):
            try:
                result = parse_prediction_record(example)
            except (KeyError, TypeError):
                continue  # not a code prediction record
            codes_pred = np.argmax(result.codes, axis=1)
            codes_truth = (np.argmax(result.ground_truth_codes, axis=1)
                           if result.ground_truth_codes.size else
                           np.zeros(0, np.int64))
            base = os.path.join(args.out_dir, result.key)
            with open(base + ".txt", "w") as f:
                f.write(result.text)
            pred_str = " ".join(str(c) for c in codes_pred)
            with open(base + ".preds.txt", "w") as f:
                f.write(pred_str + "\n")
            truth_str = " ".join(str(c) for c in codes_truth)
            with open(base + ".truth.txt", "w") as f:
                f.write(truth_str + "\n")
            txtlist.append(result.key + ".txt")
            predlist.append(pred_str)
            truthlist.append(truth_str)
            log.info("postprocessed %s (%d codes)", result.key,
                     len(codes_pred))

    exp = args.experiment
    with open(os.path.join(list_dir, f"tacotron_{exp}.txt"), "w") as f:
        f.write("\n".join(txtlist))
    with open(os.path.join(list_dir, f"tacotron_{exp}.hypothesis.txt"),
              "w") as f:
        f.write("\n".join(predlist))
    with open(os.path.join(list_dir, f"tacotron_{exp}.true.txt"), "w") as f:
        f.write("\n".join(truthlist))
    log.info("wrote %d utterances", len(txtlist))
    return 0


if __name__ == "__main__":
    sys.exit(main())
