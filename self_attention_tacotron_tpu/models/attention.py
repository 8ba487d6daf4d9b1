"""Sequence-to-sequence attention mechanisms as scan-ready step functions.

Each mechanism is a flax module with three phases:

* ``precompute(memory, lengths)`` — applied ONCE outside the decoder scan:
  projects the memory to keys and builds the padding mask (a large matmul on
  the MXU instead of per-step recomputation).
* ``initial_state(batch, max_time)`` — the recurrent attention state pytree.
* ``step(query, state, pack)`` — inside the ``lax.scan`` decoder: returns
  ``(alignments (B, T_mem), new_state)``.

Parity targets:
* additive — tf.contrib.seq2seq.BahdanauAttention (reference:
  modules/attentions.py:53-57): keys = Dense_nobias(memory),
  energy = sum(v * tanh(keys + Dense_nobias(query))), masked softmax.
* location_sensitive — @tacotron2 LocationSensitiveAttention (reference:
  modules/attentions.py:36-42): adds conv location features over the previous
  (or cumulative) alignments and a shared bias inside tanh; optional
  "smoothing" sigmoid normalization; optional cumulative alignment state.
* forward — reference: modules/forward_attention.py:48-136: the
  location-sensitive energy plus the forward-attention recursion
  ``alpha_t = ((1-u)*alpha + u*shift(alpha) + 1e-7) * align`` normalized,
  with optional transition agent u = sigmoid(Dense([context, query])).
* teacher_forcing_{additive,forward} — reference:
  modules/teacher_forcing_attention.py:13-78: replays supplied alignments
  step-by-step, ignoring the query.

Masking uses -1e9 rather than -inf (see ops/attention_core.py rationale).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

glorot = nn.initializers.glorot_uniform()

NEG_INF = -1e9


class MemoryPack(NamedTuple):
    """Precomputed per-utterance attention tensors."""

    keys: jax.Array            # (B, T_mem, num_units)
    values: jax.Array          # (B, T_mem, C_mem)
    mask: jax.Array            # (B, T_mem) bool
    teacher_alignments: Optional[jax.Array] = None  # (B, T_steps, T_mem)


def compute_context(alignments: jax.Array, values: jax.Array) -> jax.Array:
    """(B, T_mem) x (B, T_mem, C) -> (B, C) expected context vector."""
    return jnp.einsum("bt,btc->bc", alignments, values)


def _masked_softmax(energy: jax.Array, mask: jax.Array) -> jax.Array:
    return jax.nn.softmax(jnp.where(mask, energy, NEG_INF), axis=-1)


class AdditiveAttention(nn.Module):
    """Bahdanau content-based attention.  State: previous alignments."""

    num_units: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.memory_layer = nn.Dense(self.num_units, use_bias=False,
                                     kernel_init=glorot, dtype=self.dtype)
        self.query_layer = nn.Dense(self.num_units, use_bias=False,
                                    kernel_init=glorot, dtype=self.dtype)
        self.attention_v = self.param("attention_v", glorot,
                                      (1, self.num_units), jnp.float32)

    def precompute(self, memory, lengths):
        keys = self.memory_layer(memory)
        mask = jnp.arange(memory.shape[1])[None, :] < lengths[:, None]
        return MemoryPack(keys, memory, mask)

    def initial_state(self, batch: int, max_time: int):
        return jnp.zeros((batch, max_time), self.dtype)

    def step(self, query, state, pack: MemoryPack):
        pq = self.query_layer(query)[:, None, :]
        v = self.attention_v[0].astype(self.dtype)
        energy = jnp.sum(v * jnp.tanh(pack.keys + pq), axis=-1)
        alignments = _masked_softmax(energy, pack.mask)
        return alignments, alignments


class LocationSensitiveAttention(nn.Module):
    """Tacotron-2 location-sensitive attention.

    State: (alignments, accumulation) where accumulation is the cumulative
    alignment sum fed to the location conv when ``cumulative_weights``.
    """

    num_units: int
    attention_kernel: int = 31
    attention_filters: int = 32
    smoothing: bool = False
    cumulative_weights: bool = True
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.memory_layer = nn.Dense(self.num_units, use_bias=False,
                                     kernel_init=glorot, dtype=self.dtype)
        self.query_layer = nn.Dense(self.num_units, use_bias=False,
                                    kernel_init=glorot, dtype=self.dtype)
        self.location_convolution = nn.Conv(
            self.attention_filters, (self.attention_kernel,), padding="SAME",
            use_bias=True, bias_init=nn.initializers.zeros,
            kernel_init=glorot, dtype=self.dtype)
        self.location_layer = nn.Dense(self.num_units, use_bias=False,
                                       kernel_init=glorot, dtype=self.dtype)
        self.attention_v = self.param("attention_variable", glorot,
                                      (1, self.num_units), jnp.float32)
        self.attention_b = self.param("attention_bias", nn.initializers.zeros,
                                      (self.num_units,), jnp.float32)

    def precompute(self, memory, lengths):
        keys = self.memory_layer(memory)
        mask = jnp.arange(memory.shape[1])[None, :] < lengths[:, None]
        return MemoryPack(keys, memory, mask)

    def initial_state(self, batch: int, max_time: int):
        zeros = jnp.zeros((batch, max_time), self.dtype)
        return (zeros, zeros)

    def _energy(self, query, conv_input, pack: MemoryPack):
        pq = self.query_layer(query)[:, None, :]
        f = self.location_convolution(conv_input[:, :, None])
        loc = self.location_layer(f)
        v = self.attention_v[0].astype(self.dtype)
        b = self.attention_b.astype(self.dtype)
        return jnp.sum(v * jnp.tanh(pack.keys + pq + loc + b), axis=-1)

    def step(self, query, state, pack: MemoryPack):
        prev_alignments, accumulation = state
        conv_input = accumulation if self.cumulative_weights else prev_alignments
        energy = self._energy(query, conv_input, pack)
        if self.smoothing:
            sig = jax.nn.sigmoid(energy) * pack.mask
            alignments = sig / jnp.maximum(jnp.sum(sig, -1, keepdims=True), 1e-8)
        else:
            alignments = _masked_softmax(energy, pack.mask)
        new_state = (alignments, accumulation + alignments)
        return alignments, new_state


class ForwardAttentionState(NamedTuple):
    alignments: jax.Array  # (B, T_mem)
    alpha: jax.Array       # (B, T_mem)
    u: jax.Array           # (B, 1) transition factor


class ForwardAttention(nn.Module):
    """Forward attention with optional transition agent.

    Parity: reference modules/forward_attention.py:88-136 including the 1e-7
    floor, normalization, the alpha init [1, 0, ...], u init 0.5 and the
    ``cumulative_weights`` alignment-state accumulation.
    """

    num_units: int
    attention_kernel: int = 31
    attention_filters: int = 32
    use_transition_agent: bool = False
    cumulative_weights: bool = True
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.memory_layer = nn.Dense(self.num_units, use_bias=False,
                                     kernel_init=glorot, dtype=self.dtype)
        self.query_layer = nn.Dense(self.num_units, use_bias=False,
                                    kernel_init=glorot, dtype=self.dtype)
        self.location_convolution = nn.Conv(
            self.attention_filters, (self.attention_kernel,), padding="SAME",
            use_bias=True, bias_init=nn.initializers.zeros,
            kernel_init=glorot, dtype=self.dtype)
        self.location_layer = nn.Dense(self.num_units, use_bias=False,
                                       kernel_init=glorot, dtype=self.dtype)
        # xavier init explicit in the reference (forward_attention.py:17-24)
        self.attention_v = self.param("attention_variable", glorot,
                                      (1, self.num_units), jnp.float32)
        self.attention_b = self.param("attention_bias", nn.initializers.zeros,
                                      (self.num_units,), jnp.float32)
        if self.use_transition_agent:
            self.transition_factor_projection = nn.Dense(
                1, use_bias=True, kernel_init=glorot, dtype=self.dtype)

    def precompute(self, memory, lengths):
        keys = self.memory_layer(memory)
        mask = jnp.arange(memory.shape[1])[None, :] < lengths[:, None]
        return MemoryPack(keys, memory, mask)

    def initial_state(self, batch: int, max_time: int) -> ForwardAttentionState:
        alignments = jnp.zeros((batch, max_time), self.dtype)
        alpha = jnp.concatenate([jnp.ones((batch, 1), self.dtype),
                                 jnp.zeros((batch, max_time - 1), self.dtype)],
                                axis=1)
        u = 0.5 * jnp.ones((batch, 1), self.dtype)
        return ForwardAttentionState(alignments, alpha, u)

    def step(self, query, state: ForwardAttentionState, pack: MemoryPack):
        prev_alignments, prev_alpha, prev_u = state
        pq = self.query_layer(query)
        f = self.location_convolution(prev_alignments[:, :, None])
        loc = self.location_layer(f)
        v = self.attention_v[0].astype(self.dtype)
        b = self.attention_b.astype(self.dtype)
        energy = jnp.sum(v * jnp.tanh(pack.keys + pq[:, None, :] + loc + b), axis=-1)
        alignments = _masked_softmax(energy, pack.mask)

        # forward recursion: shift alpha one position to the right
        prev_alpha_shifted = jnp.pad(prev_alpha[:, :-1], ((0, 0), (1, 0)))
        alpha = ((1.0 - prev_u) * prev_alpha + prev_u * prev_alpha_shifted
                 + 1e-7) * alignments
        alpha_normalized = alpha / jnp.sum(alpha, axis=1, keepdims=True)

        if self.use_transition_agent:
            context = compute_context(alpha_normalized, pack.values)
            u = self.transition_factor_projection(
                jnp.concatenate([context, pq], axis=-1))
            u = jax.nn.sigmoid(u)
        else:
            u = prev_u

        next_alignments = (alignments + prev_alignments
                           if self.cumulative_weights else alignments)
        return alpha_normalized, ForwardAttentionState(next_alignments,
                                                       alpha_normalized, u)


class TeacherForcingState(NamedTuple):
    alignments: jax.Array  # (B, T_mem)
    index: jax.Array       # () int32


class TeacherForcingAttention(nn.Module):
    """Replays supplied alignments step-by-step, ignoring the query.

    Covers both teacher_forcing_additive and teacher_forcing_forward
    (identical bodies in the reference: modules/teacher_forcing_attention.py).
    """

    num_units: int
    dtype: jnp.dtype = jnp.float32

    def precompute(self, memory, lengths, teacher_alignments=None):
        mask = jnp.arange(memory.shape[1])[None, :] < lengths[:, None]
        keys = jnp.zeros_like(memory[..., :1])  # unused
        return MemoryPack(keys, memory, mask, teacher_alignments)

    def initial_state(self, batch: int, max_time: int) -> TeacherForcingState:
        return TeacherForcingState(jnp.zeros((batch, max_time), self.dtype),
                                   jnp.asarray(-1, jnp.int32))

    def step(self, query, state: TeacherForcingState, pack: MemoryPack):
        index = state.index + 1
        T = pack.teacher_alignments.shape[1]
        alignments = jax.lax.dynamic_index_in_dim(
            pack.teacher_alignments, jnp.clip(index, 0, T - 1), axis=1,
            keepdims=False)
        return alignments, TeacherForcingState(alignments, index)


class AttentionOptions(NamedTuple):
    """reference: modules/attentions.py:15-22."""

    attention: str
    num_units: int
    attention_kernel: int = 31
    attention_filters: int = 32
    smoothing: bool = False
    cumulative_weights: bool = False
    use_transition_agent: bool = False


def attention_mechanism_factory(options: AttentionOptions,
                                dtype=jnp.float32, name: str = None):
    """reference: modules/attentions.py:25-62."""
    kind = options.attention
    if kind == "forward":
        return ForwardAttention(options.num_units, options.attention_kernel,
                                options.attention_filters,
                                options.use_transition_agent,
                                options.cumulative_weights, dtype, name=name)
    if kind == "location_sensitive":
        return LocationSensitiveAttention(options.num_units,
                                          options.attention_kernel,
                                          options.attention_filters,
                                          options.smoothing,
                                          options.cumulative_weights, dtype,
                                          name=name)
    if kind == "additive":
        return AdditiveAttention(options.num_units, dtype, name=name)
    if kind in ("teacher_forcing_forward", "teacher_forcing_additive"):
        return TeacherForcingAttention(options.num_units, dtype, name=name)
    raise ValueError(f"Unknown attention mechanism: {kind}")
