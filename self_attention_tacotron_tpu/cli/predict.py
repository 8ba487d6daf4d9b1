"""Prediction CLIs: batch inference -> .mfbsp dumps + alignment PNGs +
prediction TFRecords.

Parity targets:
* predict_mel — reference predict_mel.py:28-74: batch-1 free-running decode,
  ``.mfbsp`` float32 dump of the predicted mel, alignment plot PNG,
  prediction-result TFRecord.
* predict_code — reference predict_code.py:28-72: same over VQ-code one-hot
  outputs; the reference stops after 10 utterances (kept behind
  ``--limit``, default 10 for codes).
* forced-alignment prediction mode (``use_forced_alignment_mode``,
  reference models/models.py:118-148) runs inside the predict step.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

import jax
import numpy as np


def build_argparser(kind: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--source-data-root", required=True)
    p.add_argument("--target-data-root", required=True)
    p.add_argument("--checkpoint-dir", required=True)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--selected-list-dir", default=None)
    p.add_argument("--list-filename", default="test.csv")
    p.add_argument("--hparams", default="")
    p.add_argument("--hparam-json-file", default=None)
    p.add_argument("--checkpoint", default=None,
                   help="specific checkpoint step to restore")
    p.add_argument("--limit", type=int, default=10 if kind == "codes" else None)
    return p


def make_alignment_replay(hp, state):
    """Plot-mode replay for the fast serving paths.

    The fused whole-loop kernel and the Pallas attention mode do not
    materialize self-attention probabilities (PERF.md); the reference
    treats alignment PNGs as its primary integration diagnostic
    (reference: modules/metrics.py:13-53), so when plots are requested we
    re-run the decode once through the einsum/scan path on the same
    parameters (bit-near parity is what tests/test_fused_decode.py and
    tests/test_pallas.py establish) and take the alignments from there.

    Returns None when the configured paths already materialize alignments.
    """
    if not (hp.use_pallas_attention or hp.decoder_fused_inference):
        return None
    from ..models import tacotron_model_factory
    from ..parallel import make_predict_step
    hp_plot = hp.replace(use_pallas_attention=False,
                         decoder_fused_inference=False)
    plot_model = tacotron_model_factory(hp_plot)
    replay_step = make_predict_step(plot_model, hp_plot)

    def replay(batch):
        return replay_step(state, batch)

    return replay


def predict(kind: str, argv=None) -> int:
    args = build_argparser(kind).parse_args(argv)
    from .train import load_hparams
    hp = load_hparams(args)
    logging.basicConfig(level=logging.INFO)
    log = logging.getLogger(f"predict_{kind}")

    from ..data.dataset import (dataset_factory, find_dataset_files,
                                load_key_list, to_model_batch)
    from ..data.records import (PredictionRecord, MelPredictionRecord,
                                write_mel_prediction_record,
                                write_prediction_record)
    from ..models import tacotron_model_factory
    from ..parallel import create_train_state, make_predict_step
    from ..utils.checkpoint import CheckpointManager
    from ..utils.metrics import plot_predictions

    os.makedirs(args.output_dir, exist_ok=True)
    list_dir = args.selected_list_dir or args.source_data_root
    keys = load_key_list(os.path.join(list_dir, args.list_filename))
    src = find_dataset_files(args.source_data_root, keys,
                             hp.source_file_extension)
    tgt = find_dataset_files(args.target_data_root, keys,
                             hp.target_file_extension)
    # prediction merges targets into features (reference:
    # predict_mel.py:39-45 merge_target_to_source): targets provide the
    # ground truth for the prediction records
    ds = dataset_factory(src, tgt, hp, batch_size=1, shuffle=False,
                         target_kind=kind if kind != "mel" else "mel")

    model = tacotron_model_factory(hp)
    sample = to_model_batch(next(iter(ds)))
    state = create_train_state(model, hp, sample, jax.random.PRNGKey(hp.seed))
    ckpt = CheckpointManager(args.checkpoint_dir)
    step = int(args.checkpoint) if args.checkpoint else None
    restored = ckpt.restore(state, step=step)
    if restored is None:
        log.error("no checkpoint found in %s", args.checkpoint_dir)
        return 1
    state = restored
    log.info("restored checkpoint step %d", int(state.step))
    predict_step = make_predict_step(model, hp)
    alignment_replay = make_alignment_replay(hp, state)
    if alignment_replay is not None:
        log.info("fast serving path configured; alignment plots come from a "
                 "one-shot einsum-path replay per utterance")

    count = 0
    for nb in ds:
        if args.limit is not None and count >= args.limit:
            break
        mb = to_model_batch(nb)
        infer_mb = mb._replace(done=None) if kind == "mel" else mb
        out = predict_step(state, infer_mb)
        meta = nb.meta[0]
        r = hp.outputs_per_step
        n_steps = int(out.lengths[0])
        n_frames = n_steps * r

        postnet_mel = None
        if kind == "codes":
            codes = np.asarray(out.code_output[0, :n_frames])
            ground_truth = (nb.target[0, :int(nb.target_length[0])]
                            if nb.target is not None else np.zeros((0, hp.num_mels)))
            payload = codes
        else:
            raw_mel = np.asarray(out.outputs[0, :n_frames])
            if hp.use_postnet_v2:
                postnet_mel = np.asarray(out.postnet_outputs[0, :n_frames])
            # the dumped tensor is what the WaveNet vocoder consumes: the
            # PostNet-v2 refinement when enabled (reference:
            # predict_mel.py:61 ``v.predicted_mel_postnet if
            # hparams.use_postnet_v2 else v.predicted_mel``)
            payload = postnet_mel if hp.use_postnet_v2 else raw_mel
            ground_truth = (nb.target[0, :int(nb.target_length[0])]
                            if nb.target is not None else None)

        # .mfbsp float32 dump (reference: predict_mel.py:56-60)
        mfbsp = os.path.join(args.output_dir,
                             f"{meta.key}.{hp.predicted_mel_extension}")
        payload.astype("<f4").tofile(mfbsp, format="<f4")

        # alignment PNG (reference: plot_predictions call predict_mel.py:62)
        plot_src = out
        if alignment_replay is not None:
            plot_src = alignment_replay(infer_mb)
        aligns = [np.asarray(a[0]) for a in plot_src.alignments]
        aligns += [np.asarray(a[0]) for a in
                   plot_src.decoder_self_attention_alignments[:2]]
        png = os.path.join(args.output_dir, f"{meta.key}.png")
        # the plot shows the RAW decoder mel plus the postnet mel when
        # present (reference: predict_mel.py:70 passes both)
        plotted = payload if kind == "codes" else raw_mel
        plot_predictions(aligns, ground_truth, plotted, meta.text, meta.key,
                         png, predicted_postnet=postnet_mel)

        # prediction TFRecord (reference: write_prediction_result)
        rec_path = os.path.join(args.output_dir, f"{meta.key}.tfrecord")
        source = nb.source[0, :int(nb.source_length[0])]
        if kind == "codes":
            write_prediction_record(
                PredictionRecord(id=meta.id, key=meta.key, codes=codes,
                                 ground_truth_codes=ground_truth,
                                 text=meta.text, source=source), rec_path)
        else:
            write_mel_prediction_record(
                MelPredictionRecord(id=meta.id, key=meta.key, mel=payload,
                                    ground_truth_mel=ground_truth,
                                    alignment=aligns[0], text=meta.text,
                                    source=source), rec_path)
        log.info("predicted %s (%d frames)", meta.key, n_frames)
        count += 1
    log.info("wrote %d predictions to %s", count, args.output_dir)
    return 0


def main_mel(argv=None) -> int:
    return predict("mel", argv)


def main_code(argv=None) -> int:
    return predict("codes", argv)


if __name__ == "__main__":
    kind = "codes" if "code" in os.path.basename(sys.argv[0]) else "mel"
    sys.exit(predict(kind))
