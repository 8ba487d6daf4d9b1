"""Post-processing networks.

Parity targets:
* ``PostNetV2`` — @tacotron2's Tacotron-2 conv-stack postnet (selected by
  ``use_postnet_v2``, reference: hparams.py:146-150, models/models.py:4):
  N x (conv5 -> BN -> tanh -> dropout), last layer linear, then a projection
  back to the mel dim; the caller adds the residual.
* ``MultiSpeakerPostNet`` — multi_speaker_tacotron's speaker-conditioned
  postnet (reference: models/models.py:17, flag ``speaker_embedd_to_postnet``
  hparams.py:135): a speaker projection is added to the first conv input.
* ``PostNetCBHG`` — the original Tacotron post-CBHG that maps mel frames to a
  linear spectrogram (configured by ``post_net_*`` hparams, reference:
  hparams.py:137-143).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.conv import Conv1dBN
from .encoders import CBHG

glorot = nn.initializers.glorot_uniform()


class PostNetV2(nn.Module):
    out_units: int            # mel dim of the residual output
    num_layers: int = 5
    kernel_size: int = 5
    out_channels: int = 512
    drop_rate: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, speaker_embed=None, *, is_training: bool = False):
        h = xs
        if speaker_embed is not None:
            s = nn.Dense(self.out_channels, kernel_init=glorot,
                         dtype=self.dtype, name="speaker_projection")(
                speaker_embed)
            h = jnp.concatenate(
                [h, jnp.tile(s[:, None, :], (1, h.shape[1], 1))], axis=-1)
        for i in range(self.num_layers - 1):
            h = Conv1dBN(self.kernel_size, self.out_channels, jnp.tanh,
                         self.dtype, name=f"conv_{i}")(h, train=is_training)
            h = nn.Dropout(self.drop_rate, deterministic=not is_training)(h)
        h = Conv1dBN(self.kernel_size, self.out_channels, None, self.dtype,
                     name=f"conv_{self.num_layers - 1}")(h, train=is_training)
        h = nn.Dropout(self.drop_rate, deterministic=not is_training)(h)
        residual = nn.Dense(self.out_units, kernel_init=glorot,
                            dtype=self.dtype, name="projection")(h)
        return residual


class MultiSpeakerPostNet(PostNetV2):
    """PostNetV2 used with speaker conditioning (pass ``speaker_embed``)."""


class PostNetCBHG(nn.Module):
    """mel -> CBHG -> Dense -> linear-spectrogram frames."""

    out_dim: int              # num_freq
    cbhg_out_units: int = 256
    conv_channels: int = 128
    max_filter_width: int = 8
    projection1_out_channels: int = 256
    projection2_out_channels: int = 80
    num_highway: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, input_lengths=None, *, is_training: bool = False):
        h = CBHG(self.cbhg_out_units, self.conv_channels,
                 self.max_filter_width, self.projection1_out_channels,
                 self.projection2_out_channels, self.num_highway, self.dtype,
                 name="cbhg")(xs, input_lengths, is_training=is_training)
        return nn.Dense(self.out_dim, kernel_init=glorot, dtype=self.dtype,
                        name="linear_projection")(h)
