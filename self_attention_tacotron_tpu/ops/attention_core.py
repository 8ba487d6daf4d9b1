"""Scaled dot-product multi-head attention with an incremental (KV-cache) step.

Parity target: the reference's self-attention stack
(reference: modules/self_attention.py:13-144):
* scores = Q K^T / sqrt(head_dim), optional padding mask (both query and key
  rows) and causal "subsequent" mask, softmax, dropout on the probabilities,
  then @ V.  Like the reference, padding masking defaults to OFF — the
  reference constructs ``SelfAttention`` without ``use_padding_mask`` at every
  call site (reference: modules/module.py:174-175,353-356), so sequence
  lengths are threaded but unused.
* 4 biased dense projections (K, V, Q, output) and per-head alignments.

TPU-first difference: at autoregressive decode time the reference re-runs the
full self-attention over a growing history each step, O(T^2) per step
(reference: modules/rnn_wrappers.py:111-124).  Here ``MultiHeadAttention.step``
maintains K/V caches of static shape (max_len) and computes one query row per
step — the same math (softmax over the causal prefix), linear cost per step,
and static shapes for XLA.

Masking uses a large negative finite value rather than -inf so fully-masked
rows produce a uniform distribution instead of NaN (the row outputs are
discarded by downstream loss masks either way).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

glorot = nn.initializers.glorot_uniform()

NEG_INF = -1e9


class AttentionCache(NamedTuple):
    key: jax.Array    # (B, H, max_len, head_dim)
    value: jax.Array  # (B, H, max_len, head_dim)


def positional_encoding(length: int, dim: int, dtype=jnp.float32) -> jax.Array:
    """Sinusoidal positions (length, dim), interleaved sin/cos pairs."""
    pos = jnp.arange(length, dtype=jnp.float32)[:, None]
    i = jnp.arange(dim // 2, dtype=jnp.float32)[None, :]
    angle = pos / jnp.power(10000.0, 2.0 * i / dim)
    pe = jnp.concatenate([jnp.sin(angle), jnp.cos(angle)], axis=-1)
    return pe.astype(dtype)


def _masked_softmax(scores: jax.Array, mask: Optional[jax.Array]) -> jax.Array:
    if mask is not None:
        scores = jnp.where(mask, scores, NEG_INF)
    return jax.nn.softmax(scores, axis=-1)


class MultiHeadAttention(nn.Module):
    model_dim: int
    num_heads: int
    drop_rate: float = 0.0
    use_padding_mask: bool = False
    use_subsequent_mask: bool = False
    use_pallas: bool = False  # fused TPU kernel; engages when no dropout /
    #                           padding mask is needed (alignments come back
    #                           zeroed — probabilities never hit HBM)
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        assert self.model_dim % self.num_heads == 0
        d = dict(kernel_init=glorot, dtype=self.dtype)
        self.key_projection = nn.Dense(self.model_dim, **d)
        self.value_projection = nn.Dense(self.model_dim, **d)
        self.query_projection = nn.Dense(self.model_dim, **d)
        self.output_projection = nn.Dense(self.model_dim, **d)
        self.dropout = nn.Dropout(self.drop_rate)

    @property
    def head_dim(self) -> int:
        return self.model_dim // self.num_heads

    def _split_heads(self, x: jax.Array) -> jax.Array:
        B, T, _ = x.shape
        return x.reshape(B, T, self.num_heads, self.head_dim).transpose(0, 2, 1, 3)

    def _merge_heads(self, x: jax.Array) -> jax.Array:
        B, H, T, D = x.shape
        return x.transpose(0, 2, 1, 3).reshape(B, T, H * D)

    def __call__(self, key, value, query, memory_sequence_length=None,
                 deterministic: bool = True):
        """Full-sequence attention.

        Returns (output (B, Tq, model_dim), alignments (B, H, Tq, Tk)).
        """
        k = self._split_heads(self.key_projection(key))
        v = self._split_heads(self.value_projection(value))
        q = self._split_heads(self.query_projection(query))

        dropout_active = self.drop_rate > 0.0 and not deterministic
        if (self.use_pallas and not dropout_active
                and not self.use_padding_mask):
            from .pallas_attention import fused_self_attention
            context = fused_self_attention(q, k, v,
                                           causal=self.use_subsequent_mask)
            output = self.output_projection(self._merge_heads(context))
            Tq, Tk = q.shape[2], k.shape[2]
            alignments = jnp.zeros((q.shape[0], self.num_heads, Tq, Tk),
                                   self.dtype)
            return output, alignments

        scale = 1.0 / jnp.sqrt(jnp.asarray(self.head_dim, dtype=q.dtype))
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale

        mask = None
        Tq, Tk = q.shape[2], k.shape[2]
        if self.use_padding_mask and memory_sequence_length is not None:
            seq_mask = jnp.arange(Tk)[None, :] < memory_sequence_length[:, None]
            pair = seq_mask[:, None, :] & seq_mask[:, :, None]  # (B, Tq, Tk)
            mask = pair[:, None, :, :]
        if self.use_subsequent_mask:
            causal = jnp.tril(jnp.ones((Tq, Tk), dtype=bool))[None, None]
            mask = causal if mask is None else (mask & causal)

        probs = _masked_softmax(scores, mask)
        alignments = probs
        if self.drop_rate > 0.0 and not deterministic:
            probs = self.dropout(probs, deterministic=False)
        context = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        output = self.output_projection(self._merge_heads(context))
        return output, alignments

    def init_cache(self, batch: int, max_len: int) -> AttentionCache:
        shape = (batch, self.num_heads, max_len, self.head_dim)
        return AttentionCache(jnp.zeros(shape, self.dtype),
                              jnp.zeros(shape, self.dtype))

    def step(self, x_t: jax.Array, t: jax.Array, cache: AttentionCache,
             deterministic: bool = True):
        """Incremental causal self-attention for one new element ``x_t`` (B, D)
        at position ``t``.  Returns (out_t (B, D), new_cache,
        align_row (B, H, max_len)).  Equivalent to column ``t`` of the
        full-sequence causal ``__call__`` (train/infer parity invariant)."""
        B = x_t.shape[0]
        k_t = self.key_projection(x_t).reshape(B, self.num_heads, self.head_dim)
        v_t = self.value_projection(x_t).reshape(B, self.num_heads, self.head_dim)
        q_t = self.query_projection(x_t).reshape(B, self.num_heads, self.head_dim)

        key_cache = jax.lax.dynamic_update_slice_in_dim(
            cache.key, k_t[:, :, None, :], t, axis=2)
        value_cache = jax.lax.dynamic_update_slice_in_dim(
            cache.value, v_t[:, :, None, :], t, axis=2)

        dropout_active = self.drop_rate > 0.0 and not deterministic
        if self.use_pallas and not dropout_active:
            from .pallas_attention import incremental_attention_step
            context = incremental_attention_step(q_t, key_cache, value_cache,
                                                 t)
            out = self.output_projection(context.reshape(B, self.model_dim))
            max_len = key_cache.shape[2]
            align_row = jnp.zeros((B, self.num_heads, max_len), self.dtype)
            return out, AttentionCache(key_cache, value_cache), align_row

        scale = 1.0 / jnp.sqrt(jnp.asarray(self.head_dim, dtype=q_t.dtype))
        scores = jnp.einsum("bhd,bhkd->bhk", q_t, key_cache) * scale
        max_len = key_cache.shape[2]
        valid = jnp.arange(max_len)[None, None, :] <= t
        probs = _masked_softmax(scores, valid)
        align_row = probs
        if self.drop_rate > 0.0 and not deterministic:
            probs = self.dropout(probs, deterministic=False)
        context = jnp.einsum("bhk,bhkd->bhd", probs, value_cache)
        out = self.output_projection(context.reshape(B, self.model_dim))
        return out, AttentionCache(key_cache, value_cache), align_row


class SelfAttention(nn.Module):
    """K = V = Q = inputs (reference: modules/self_attention.py:131-144)."""

    model_dim: int
    num_heads: int
    drop_rate: float = 0.0
    use_padding_mask: bool = False
    use_subsequent_mask: bool = False
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.attention = MultiHeadAttention(
            self.model_dim, self.num_heads, self.drop_rate,
            self.use_padding_mask, self.use_subsequent_mask,
            self.use_pallas, self.dtype)

    def __call__(self, inputs, memory_sequence_length=None,
                 deterministic: bool = True):
        return self.attention(inputs, inputs, inputs,
                              memory_sequence_length=memory_sequence_length,
                              deterministic=deterministic)

    def init_cache(self, batch: int, max_len: int) -> AttentionCache:
        return self.attention.init_cache(batch, max_len)

    def step(self, x_t, t, cache, deterministic: bool = True):
        return self.attention.step(x_t, t, cache, deterministic=deterministic)
