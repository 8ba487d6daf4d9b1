"""Recurrent cells and sequence unrolls, TPU-first.

All recurrences are expressed as pure step functions driven by ``jax.lax.scan``
so XLA compiles one fused step kernel; there is no Python-level time loop.

Behavioral parity targets:
* ``ZoneoutLSTMCell`` — the zoneout LSTM used throughout the reference
  (reference: modules/module.py:94-105 uses @tacotron2's ZoneoutLSTMCell).
  Math: standard LSTM (gate order i, g, f, o; forget_bias 1.0) with zoneout
  regularization (Krueger et al. 2017): during training each state unit keeps
  its previous value with probability ``zoneout_factor``; at eval the update is
  the deterministic expectation ``(1-z)*new + z*prev``.
* ``GRUCell`` — for the non-zoneout CBHG variant (TF GRUCell math: gate bias
  init 1.0).
* ``bidirectional`` — matches ``tf.nn.bidirectional_dynamic_rnn`` with
  ``sequence_length``: states freeze and outputs are zero past each
  sequence's length; the backward pass runs over the length-reversed sequence.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array

glorot = nn.initializers.glorot_uniform()


class LSTMState(Tuple):  # (c, h) tuple alias for readability
    pass


class ZoneoutLSTMCell(nn.Module):
    """LSTM step with zoneout on cell and output states.

    Call with carry ``(c, h)`` and input ``x`` of shape (B, D); returns
    ``(new_carry, h)``.
    """

    num_units: int
    zoneout_factor_cell: float = 0.0
    zoneout_factor_output: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, x, *, deterministic: bool = True):
        c_prev, h_prev = carry
        kernel = self.param("kernel", glorot,
                            (x.shape[-1] + self.num_units, 4 * self.num_units),
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (4 * self.num_units,),
                          jnp.float32)
        z = jnp.concatenate([x, h_prev], axis=-1).astype(self.dtype)
        gates = z @ kernel.astype(self.dtype) + bias.astype(self.dtype)
        i, g, f, o = jnp.split(gates, 4, axis=-1)
        new_c = c_prev * jax.nn.sigmoid(f + 1.0) + jax.nn.sigmoid(i) * jnp.tanh(g)
        new_h = jnp.tanh(new_c) * jax.nn.sigmoid(o)

        new_c = self._zoneout(c_prev, new_c, self.zoneout_factor_cell,
                              deterministic, "zoneout_c")
        new_h = self._zoneout(h_prev, new_h, self.zoneout_factor_output,
                              deterministic, "zoneout_h")
        return (new_c, new_h), new_h

    def _zoneout(self, prev, new, factor, deterministic, _name):
        if factor == 0.0:
            return new
        if deterministic:
            return (1.0 - factor) * new + factor * prev
        keep = jax.random.bernoulli(self.make_rng("zoneout"), 1.0 - factor,
                                    new.shape)
        return jnp.where(keep, new, prev)

    @staticmethod
    def initial_state(batch: int, num_units: int, dtype=jnp.float32):
        return (jnp.zeros((batch, num_units), dtype),
                jnp.zeros((batch, num_units), dtype))


class GRUCell(nn.Module):
    """TF-semantics GRU step (gate bias init 1.0)."""

    num_units: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, x):
        h_prev = carry
        in_dim = x.shape[-1] + self.num_units
        gate_kernel = self.param("gates/kernel", glorot,
                                 (in_dim, 2 * self.num_units), jnp.float32)
        gate_bias = self.param("gates/bias", nn.initializers.ones,
                               (2 * self.num_units,), jnp.float32)
        cand_kernel = self.param("candidate/kernel", glorot,
                                 (in_dim, self.num_units), jnp.float32)
        cand_bias = self.param("candidate/bias", nn.initializers.zeros,
                               (self.num_units,), jnp.float32)
        z = jnp.concatenate([x, h_prev], axis=-1).astype(self.dtype)
        gates = jax.nn.sigmoid(z @ gate_kernel.astype(self.dtype)
                               + gate_bias.astype(self.dtype))
        r, u = jnp.split(gates, 2, axis=-1)
        z2 = jnp.concatenate([x, r * h_prev], axis=-1).astype(self.dtype)
        cand = jnp.tanh(z2 @ cand_kernel.astype(self.dtype)
                        + cand_bias.astype(self.dtype))
        new_h = u * h_prev + (1.0 - u) * cand
        return new_h, new_h

    @staticmethod
    def initial_state(batch: int, num_units: int, dtype=jnp.float32):
        return jnp.zeros((batch, num_units), dtype)


def unroll(cell: nn.Module, xs: Array, initial_carry,
           lengths: Optional[Array] = None, reverse: bool = False,
           deterministic: bool = True, rng_collection: str = "zoneout",
           scan_unroll: int = 8):
    """Scan ``cell`` over time axis 1 of ``xs`` (B, T, D).

    With ``lengths``, outputs past each row's length are zeroed and carries
    frozen (tf.nn.dynamic_rnn semantics).  ``reverse=True`` runs over the
    per-row length-reversed sequence (tf.reverse_sequence + scan + reverse),
    matching the backward half of ``bidirectional_dynamic_rnn``.
    """
    B, T = xs.shape[0], xs.shape[1]
    if reverse:
        xs = reverse_sequence(xs, lengths) if lengths is not None else xs[:, ::-1]

    needs_rng = isinstance(cell, ZoneoutLSTMCell) and not deterministic and (
        cell.zoneout_factor_cell > 0 or cell.zoneout_factor_output > 0)

    def step(scope_cell, carry, t):
        x_t = xs[:, t]
        if isinstance(scope_cell, ZoneoutLSTMCell):
            new_carry, y = scope_cell(carry, x_t, deterministic=deterministic)
        else:
            new_carry, y = scope_cell(carry, x_t)
        if lengths is not None:
            valid = (t < lengths)[:, None]
            new_carry = jax.tree_util.tree_map(
                lambda n, p: jnp.where(valid, n, p), new_carry, carry)
            y = jnp.where(valid, y, jnp.zeros_like(y))
        return new_carry, y

    scan = nn.scan(step, variable_broadcast="params",
                   split_rngs={rng_collection: needs_rng, "params": False},
                   in_axes=0, out_axes=0,
                   unroll=min(scan_unroll, T))  # amortize per-iteration
    #                                             loop overhead (B=1 serving
    #                                             is latency-bound on it)
    final_carry, ys = scan(cell, initial_carry, jnp.arange(T))
    ys = jnp.moveaxis(ys, 0, 1)  # (T, B, D) -> (B, T, D)
    if reverse:
        ys = reverse_sequence(ys, lengths) if lengths is not None else ys[:, ::-1]
    return final_carry, ys


def reverse_sequence(xs: Array, lengths: Array) -> Array:
    """tf.reverse_sequence over axis 1 (per-row reversal of the valid prefix)."""
    B, T = xs.shape[0], xs.shape[1]
    idx = jnp.arange(T)[None, :]  # (1, T)
    rev_idx = jnp.where(idx < lengths[:, None], lengths[:, None] - 1 - idx, idx)
    return jnp.take_along_axis(
        xs, rev_idx.reshape(B, T, *([1] * (xs.ndim - 2))), axis=1)


class BiZoneoutLSTM(nn.Module):
    """Bidirectional zoneout-LSTM over (B, T, D) -> (B, T, 2*units).

    Parity: tf.nn.bidirectional_dynamic_rnn(ZoneoutLSTMCell, ZoneoutLSTMCell)
    (reference: modules/module.py:93-110).
    """

    num_units: int
    zoneout_factor_cell: float = 0.0
    zoneout_factor_output: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, lengths=None, deterministic: bool = True):
        B = xs.shape[0]
        fw = ZoneoutLSTMCell(self.num_units, self.zoneout_factor_cell,
                             self.zoneout_factor_output, self.dtype, name="fw")
        bw = ZoneoutLSTMCell(self.num_units, self.zoneout_factor_cell,
                             self.zoneout_factor_output, self.dtype, name="bw")
        init = ZoneoutLSTMCell.initial_state(B, self.num_units, self.dtype)
        _, ys_f = unroll(fw, xs, init, lengths, reverse=False,
                         deterministic=deterministic)
        _, ys_b = unroll(bw, xs, init, lengths, reverse=True,
                         deterministic=deterministic)
        return jnp.concatenate([ys_f, ys_b], axis=-1)


class BiGRU(nn.Module):
    """Bidirectional GRU (the non-zoneout CBHG recurrence, original Tacotron)."""

    num_units: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, lengths=None):
        B = xs.shape[0]
        fw = GRUCell(self.num_units, self.dtype, name="fw")
        bw = GRUCell(self.num_units, self.dtype, name="bw")
        init = GRUCell.initial_state(B, self.num_units, self.dtype)
        _, ys_f = unroll(fw, xs, init, lengths, reverse=False)
        _, ys_b = unroll(bw, xs, init, lengths, reverse=True)
        return jnp.concatenate([ys_f, ys_b], axis=-1)


class LSTMCellPlain(ZoneoutLSTMCell):
    """Plain LSTM (zoneout factors 0) — DecoderRNNV1's stack cells."""
