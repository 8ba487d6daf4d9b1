"""PreNet variants.

Parity targets:
* ``PreNet`` — @tacotron2's prenet as consumed everywhere in the reference
  (reference: modules/module.py:249,310,394,570-576): Dense -> ReLU ->
  dropout, with dropout active in training and — when
  ``apply_dropout_on_inference`` — at inference too.
* ``MultiSpeakerPreNet`` — reference: modules/multi_speaker_modules.py:11-35:
  dense0(x) + softsign(Dense(speaker_embed)) -> dense -> dropout.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

glorot = nn.initializers.glorot_uniform()


class PreNet(nn.Module):
    out_units: int
    drop_rate: float = 0.5
    apply_dropout_on_inference: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, is_training: bool = False):
        h = nn.Dense(self.out_units, kernel_init=glorot, dtype=self.dtype,
                     name="dense")(x)
        h = jax.nn.relu(h)
        use_dropout = is_training or self.apply_dropout_on_inference
        h = nn.Dropout(self.drop_rate, deterministic=not use_dropout)(h)
        return h


class MultiSpeakerPreNet(nn.Module):
    out_units: int
    drop_rate: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, speaker_embed, *, is_training: bool = False):
        h = nn.Dense(self.out_units, kernel_init=glorot, dtype=self.dtype,
                     name="dense0")(x)
        h = jax.nn.relu(h)
        s = nn.Dense(self.out_units, kernel_init=glorot, dtype=self.dtype,
                     name="speaker_projection")(speaker_embed)
        h = h + jax.nn.soft_sign(s)
        h = nn.Dense(self.out_units, kernel_init=glorot, dtype=self.dtype,
                     name="dense")(h)
        h = jax.nn.relu(h)
        h = nn.Dropout(self.drop_rate, deterministic=not is_training)(h)
        return h


class PreNetStack(nn.Module):
    """A stack of prenets; when ``speaker_embed`` is given the first layer is
    a MultiSpeakerPreNet (reference: modules/module.py:1511-1517)."""

    out_units: Tuple[int, ...]
    drop_rate: float = 0.5
    apply_dropout_on_inference: bool = False
    use_speaker_embed: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, speaker_embed: Optional[jax.Array] = None,
                 *, is_training: bool = False):
        for i, units in enumerate(self.out_units):
            if i == 0 and self.use_speaker_embed:
                x = MultiSpeakerPreNet(units, self.drop_rate, self.dtype,
                                       name=f"prenet_{i}")(
                    x, speaker_embed, is_training=is_training)
            else:
                x = PreNet(units, self.drop_rate,
                           self.apply_dropout_on_inference, self.dtype,
                           name=f"prenet_{i}")(x, is_training=is_training)
        return x
