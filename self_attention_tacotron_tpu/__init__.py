"""self_attention_tacotron_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework
with the capabilities of rhoposit/self-attention-tacotron.

Layers:
  config    — typed hparams tree, JSON/CLI layering (reference: hparams.py)
  text      — char/phone frontends, cleaners, flite G2P
  utils     — audio DSP, checkpointing, metrics, logging
  ops       — NN primitives: zoneout LSTM scan, CBHG, MHA, STFT, losses, Pallas kernels
  models    — encoders, attention mechanisms, decoder scan core, model assembly
  data      — TFRecord-compatible IO, corpus preprocessors, bucketed batching
  parallel  — mesh / SPMD data-parallel train & eval steps
  cli       — train / predict / preprocess / postprocess entry points
"""

__version__ = "0.1.0"

from .config import HParams, default_hparams, hparams_debug_string

__all__ = ["HParams", "default_hparams", "hparams_debug_string", "__version__"]
