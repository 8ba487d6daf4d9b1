"""Convolutional / dense building blocks: Conv1d+BN, HighwayNet, CBHG bank.

Parity targets (all consumed from @tacotron2 by the reference —
reference: modules/module.py:19,46-91):
* ``Conv1dBN`` — 1-D convolution (SAME) -> batch norm -> activation, the
  ``Conv1d`` primitive used by the conv banks and projections.
* ``HighwayNet`` — H=relu(dense), T=sigmoid(dense, bias init -1) gate.
* ``ConvBank`` — K parallel convs of widths 1..K concatenated, then
  width-2 stride-1 SAME max pool.

TPU notes: convolutions lower to MXU matmuls under XLA; batch norm statistics
are batch-reduced on device (psum over the data axis happens in the train step
via the mesh, not here).
"""

from __future__ import annotations

import contextlib
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

glorot = nn.initializers.glorot_uniform()

# Dynamically-scoped (B,) row-validity mask for TRAIN-mode batch-norm
# statistics.  Remainder batches are padded with duplicates of their last
# row so they shard evenly over the device mesh
# (data/dataset.py pad_model_batch_rows); without masking, the duplicated
# rows double-count in every BN batch statistic.  A dynamic scope (set by
# the model around its forward, read here at trace time) avoids threading
# a ``bn_mask`` argument through every encoder/postnet signature for a
# concern that is orthogonal to all of them.
_BN_VALID_ROWS: list = [None]


@contextlib.contextmanager
def bn_valid_rows(mask):
    """Scope a (B,) bool row-validity mask over all Conv1dBN TRAIN-mode
    batch statistics computed inside the context (None = all rows)."""
    _BN_VALID_ROWS.append(mask)
    try:
        yield
    finally:
        _BN_VALID_ROWS.pop()


class Conv1dBN(nn.Module):
    """conv1d (SAME, bias-free) -> batch_normalization -> activation.

    TF parity: tf.layers.conv1d + tf.layers.batch_normalization
    (momentum 0.99, epsilon 1e-3), activation applied after BN.
    """

    kernel_size: int
    out_channels: int
    activation: Optional[Callable] = jax.nn.relu
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, *, train: bool = False):
        h = nn.Conv(self.out_channels, (self.kernel_size,), padding="SAME",
                    use_bias=False, kernel_init=glorot, dtype=self.dtype,
                    name="conv")(xs)
        bn = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                          epsilon=1e-3, dtype=self.dtype, name="bn")
        valid = _BN_VALID_ROWS[-1]
        if train and valid is not None:
            # exclude padded duplicate rows from the batch statistics (the
            # stats then equal the unpadded batch's exactly)
            h = bn(h, mask=valid[:, None, None])
        else:
            h = bn(h)
        if self.activation is not None:
            h = self.activation(h)
        return h


class HighwayNet(nn.Module):
    """Highway layer: T*H + (1-T)*x, transport-gate bias init -1.0."""

    out_units: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs):
        h = nn.Dense(self.out_units, kernel_init=glorot, dtype=self.dtype,
                     name="H")(xs)
        h = jax.nn.relu(h)
        t = nn.Dense(self.out_units, kernel_init=glorot,
                     bias_init=nn.initializers.constant(-1.0),
                     dtype=self.dtype, name="T")(xs)
        t = jax.nn.sigmoid(t)
        return h * t + xs * (1.0 - t)


def max_pool_same(xs: jnp.ndarray, pool_size: int = 2) -> jnp.ndarray:
    """Width-``pool_size`` stride-1 SAME max pool over axis 1 of (B, T, C)."""
    pad_total = pool_size - 1
    lo = pad_total // 2
    hi = pad_total - lo
    neg = jnp.finfo(xs.dtype).min if jnp.issubdtype(xs.dtype, jnp.floating) else jnp.iinfo(xs.dtype).min
    padded = jnp.pad(xs, ((0, 0), (lo, hi), (0, 0)), constant_values=neg)
    windows = [padded[:, i:i + xs.shape[1]] for i in range(pool_size)]
    return jnp.max(jnp.stack(windows, axis=0), axis=0)


class ConvBank(nn.Module):
    """Parallel conv1d bank of kernel widths 1..max_filter_width, channel
    concat, then width-2 stride-1 max pool (the CBHG front end)."""

    max_filter_width: int
    conv_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, *, train: bool = False):
        outs = [
            Conv1dBN(k, self.conv_channels, jax.nn.relu, self.dtype,
                     name=f"conv1d_K{k}")(xs, train=train)
            for k in range(1, self.max_filter_width + 1)
        ]
        banked = jnp.concatenate(outs, axis=-1)
        return max_pool_same(banked, 2)
