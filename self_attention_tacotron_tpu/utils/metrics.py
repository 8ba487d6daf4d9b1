"""Alignment / spectrogram plotting and the periodic metrics saver.

Parity targets:
* ``plot_predictions`` — alignment heatmaps + ground-truth/predicted
  spectrogram panels written as PNG (reference: modules/metrics.py:13-53).
* ``plot_mgc_lf0`` — reference: modules/metrics.py:56-76.
* ``MetricsSaver`` — the SessionRunHook that writes alignment plots and
  prediction records every N steps at train time and every eval step
  (reference: models/models.py:191-199,238-247 consuming @tacotron2's
  MetricsSaver; MgcLf0 flavor modules/metrics.py:79-128).
* scalar metrics logging (TensorBoard scalars in the reference,
  models/models.py:289-302) — emitted as JSONL + optional TensorBoard via
  flax's summary writer when available.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, List, Optional, Sequence

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def plot_alignment(alignment: np.ndarray, path: str,
                   info: Optional[str] = None) -> None:
    """Single alignment heatmap PNG (@tacotron2 plot_alignment equivalent)."""
    fig, ax = plt.subplots(figsize=(8, 6))
    im = ax.imshow(alignment, aspect="auto", origin="lower",
                   interpolation="none")
    fig.colorbar(im, ax=ax)
    ax.set_xlabel("Decoder timestep")
    ax.set_ylabel("Encoder timestep")
    if info:
        ax.set_title(info)
    fig.savefig(path, format="png")
    plt.close(fig)


def plot_predictions(alignments: Sequence[np.ndarray],
                     ground_truth: Optional[np.ndarray],
                     predicted: Optional[np.ndarray], text: str,
                     key: str, path: str,
                     predicted_postnet: Optional[np.ndarray] = None) -> None:
    """Alignment heatmaps + GT/predicted spectrogram panels
    (reference: modules/metrics.py:13-53; the reference reserves a row for
    the PostNet-v2 mel whenever it is present — we render it)."""
    n_align = len(alignments)
    n_spec = (int(ground_truth is not None) + int(predicted is not None)
              + int(predicted_postnet is not None))
    fig = plt.figure(figsize=(12, 3 * (n_align + n_spec)))
    for i, align in enumerate(alignments):
        ax = fig.add_subplot(n_align + n_spec, 1, i + 1)
        im = ax.imshow(np.asarray(align), aspect="auto", origin="lower",
                       interpolation="none")
        fig.colorbar(im, ax=ax)
        ax.set_title(f"alignment {i + 1}")
    row = n_align + 1
    for name, spec in (("ground truth", ground_truth),
                       ("predicted", predicted),
                       ("predicted (postnet)", predicted_postnet)):
        if spec is None:
            continue
        ax = fig.add_subplot(n_align + n_spec, 1, row)
        im = ax.imshow(np.asarray(spec).T, aspect="auto", origin="lower",
                       interpolation="none")
        fig.colorbar(im, ax=ax)
        ax.set_title(name)
        row += 1
    fig.suptitle(f"record: {key}\n{text}"[:400])
    fig.savefig(path, format="png")
    plt.close(fig)


def plot_mgc_lf0(mgc_gt: np.ndarray, mgc_pred: np.ndarray,
                 lf0_gt: np.ndarray, lf0_pred: np.ndarray, key: str,
                 path: str) -> None:
    """Four panels: mgc gt/pred heatmaps (magma, +-4) and lf0 gt/pred —
    2-D probability maps as binary heatmaps in [0, 1], 1-D tracks as lines
    (reference: modules/metrics.py:56-76)."""
    fig = plt.figure(figsize=(12, 14))
    T = np.asarray(mgc_gt).shape[0]
    panels = [("mgc ground truth", mgc_gt, "magma", -4.0, 4.0),
              ("mgc predicted", np.asarray(mgc_pred)[:T], "magma", -4.0, 4.0),
              ("lf0 ground truth", lf0_gt, "binary", 0.0, 1.0),
              ("lf0 predicted", np.asarray(lf0_pred)[:T], "binary", 0.0, 1.0)]
    for i, (name, spec, cmap, vmin, vmax) in enumerate(panels):
        ax = fig.add_subplot(4, 1, i + 1)
        spec = np.asarray(spec)
        if spec.ndim == 1:
            ax.plot(spec)
        else:
            im = ax.imshow(spec.T, aspect="auto", origin="lower",
                           interpolation="none", cmap=cmap, vmin=vmin,
                           vmax=vmax)
            fig.colorbar(im, ax=ax)
        ax.set_title(name)
    fig.suptitle(f"record: {key}")
    fig.savefig(path, format="png")
    plt.close(fig)


class MetricsLogger:
    """Scalar metrics to JSONL + TensorBoard event files.

    The JSONL stream is the machine-readable log; the event file restores the
    reference's operating workflow of watching ``loss_with_teacher`` et al.
    live in TensorBoard (reference: README.md:86-89, models/models.py:289-320).
    """

    def __init__(self, log_dir: str, filename: str = "metrics.jsonl",
                 tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, filename)
        self._f = open(self.path, "a")
        self._tb = None
        if tensorboard:
            from .tb_events import EventWriter
            self._tb = EventWriter(log_dir)

    def log(self, step: int, metrics: Dict[str, float], prefix: str = ""):
        now = time.time()
        entry = {"step": int(step), "time": now}
        for k, v in metrics.items():
            entry[prefix + k] = float(v)
        self._f.write(json.dumps(entry) + "\n")
        self._f.flush()
        if self._tb is not None:
            self._tb.add_scalars(
                int(step), {prefix + k: float(v) for k, v in metrics.items()},
                wall_time=now)

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()


class MetricsSaver:
    """Periodic alignment-plot + prediction-record writer.

    ``save(step, ...)`` is a no-op unless ``step % save_steps == 0`` (train)
    — eval callers pass save_steps=1 (reference: models/models.py:244).
    """

    def __init__(self, out_dir: str, save_steps: int = 50, mode: str = "train",
                 keep_max: Optional[int] = None):
        self.out_dir = out_dir
        self.save_steps = max(save_steps, 1)
        self.mode = mode
        self.keep_max = keep_max
        os.makedirs(out_dir, exist_ok=True)

    def should_save(self, step: int) -> bool:
        return step % self.save_steps == 0

    def save(self, step: int, key: str, text: str,
             alignments: Sequence[np.ndarray],
             ground_truth: Optional[np.ndarray],
             predicted: Optional[np.ndarray],
             prediction_record_writer=None) -> Optional[str]:
        if not self.should_save(step):
            return None
        name = f"{self.mode}_step{step:09d}_{key}"
        png = os.path.join(self.out_dir, name + ".png")
        plot_predictions(alignments, ground_truth, predicted, text, key, png)
        if prediction_record_writer is not None:
            prediction_record_writer(
                os.path.join(self.out_dir, name + ".tfrecord"))
        self._cleanup()
        return png

    def save_mgc_lf0(self, step: int, key: str, text: str,
                     alignments: Sequence[np.ndarray],
                     mgc_gt: np.ndarray, mgc_pred: np.ndarray,
                     lf0_gt: np.ndarray, lf0_pred: np.ndarray,
                     prediction_record_writer=None) -> Optional[str]:
        """MgcLf0MetricsSaver analog: alignment PNG + mgc/lf0 panel PNG +
        prediction record (reference: modules/metrics.py:79-128 writing
        alignment_*/mgc_lf0_* PNGs and a result tfrecord via
        utils/tfrecord.py:160-199)."""
        if not self.should_save(step):
            return None
        name = f"{self.mode}_step{step:09d}_{key}"
        align_png = os.path.join(self.out_dir, "alignment_" + name + ".png")
        plot_predictions(alignments, None, None, text, key, align_png)
        png = os.path.join(self.out_dir, "mgc_lf0_" + name + ".png")
        plot_mgc_lf0(mgc_gt, mgc_pred, lf0_gt, lf0_pred, key, png)
        if prediction_record_writer is not None:
            prediction_record_writer(
                os.path.join(self.out_dir, name + ".tfrecord"))
        self._cleanup()
        return png

    def _cleanup(self):
        if self.keep_max is None:
            return
        pngs = sorted(f for f in os.listdir(self.out_dir)
                      if f.endswith(".png"))
        for f in pngs[:-self.keep_max]:
            try:
                os.remove(os.path.join(self.out_dir, f))
            except OSError:
                pass
