"""Pallas TPU kernels for the attention hot paths.

Two kernels:
* ``fused_self_attention`` — blockwise fused softmax(QK^T/sqrt(d))V for the
  full-sequence multi-head attention (encoder self-attention hops and the
  decoder's train-path causal hops).  One kernel per (batch*head, q-block)
  keeps scores in VMEM — no (B, H, T, T) probability tensor ever hits HBM.
* ``incremental_attention_step`` — the single-query decode step against a
  KV cache (the per-frame hot op of autoregressive inference).

Both compute the same math as ``ops/attention_core.py`` (verified in
tests/test_pallas.py via interpret mode on CPU and on the real chip by
scripts/check_pallas.py) and are selected by ``hp.use_pallas_attention``.

Layout notes (pallas_guide.md): last dim padded to 128 lanes; f32 tiles
(8, 128); the sequence axis is blocked at 128; masking uses a large negative
finite value.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9

_LANES = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attention_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                      causal: bool, seq_len: int, block_q: int):
    """One (batch*head, q-block) program: out = softmax(qK^T)V."""
    qi = pl.program_id(1)
    q = q_ref[0]                          # (block_q, Dp)
    k = k_ref[0]                          # (Tp, Dp)
    v = v_ref[0]                          # (Tp, Dp)
    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # (block_q, Tp)

    key_pos = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    mask = key_pos < seq_len
    if causal:
        q_pos = (jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0)
                 + qi * block_q)
        mask = mask & (key_pos <= q_pos)
    scores = jnp.where(mask, scores, NEG_INF)

    m = jnp.max(scores, axis=1, keepdims=True)
    e = jnp.exp(scores - m)
    denom = jnp.sum(e, axis=1, keepdims=True)
    probs = e / denom
    o_ref[0] = jax.lax.dot_general(
        probs, v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def fused_self_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                         causal: bool = False, block_q: int = 128,
                         interpret: bool = None) -> jax.Array:
    """softmax(q k^T / sqrt(d)) v over (B, H, T, D) tensors.

    Equivalent to the einsum path in ops/attention_core.MultiHeadAttention
    (without dropout); alignments are not materialized.
    ``interpret=None`` auto-selects interpret mode off-TPU (same policy as
    ops/fused_decode.py) so Pallas-configured models run anywhere.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, H, T, D = q.shape
    scale = 1.0 / (D ** 0.5)
    Tp = _round_up(T, block_q)
    Dp = _round_up(D, _LANES)
    pad = [(0, 0), (0, 0), (0, Tp - T), (0, Dp - D)]
    qp = jnp.pad(q, pad).reshape(B * H, Tp, Dp)
    kp = jnp.pad(k, pad).reshape(B * H, Tp, Dp)
    vp = jnp.pad(v, pad).reshape(B * H, Tp, Dp)

    grid = (B * H, Tp // block_q)
    out = pl.pallas_call(
        functools.partial(_attention_kernel, scale=scale, causal=causal,
                          seq_len=T, block_q=block_q),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, Dp), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tp, Dp), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tp, Dp), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, Dp), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, Tp, Dp), q.dtype),
        interpret=interpret,
    )(qp, kp, vp)
    return out.reshape(B, H, Tp, Dp)[:, :, :T, :D]


def _incremental_kernel(q_ref, k_ref, v_ref, t_ref, o_ref, *, scale: float):
    """Single query against the KV cache, masked to positions <= t."""
    q = q_ref[0]                          # (1, Dp)
    k = k_ref[0]                          # (Tp, Dp)
    v = v_ref[0]
    t = t_ref[0]
    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # (1, Tp)
    pos = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    scores = jnp.where(pos <= t, scores, NEG_INF)
    m = jnp.max(scores, axis=1, keepdims=True)
    e = jnp.exp(scores - m)
    probs = e / jnp.sum(e, axis=1, keepdims=True)
    o_ref[0] = jax.lax.dot_general(
        probs, v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def incremental_attention_step(q_t: jax.Array, key_cache: jax.Array,
                               value_cache: jax.Array, t: jax.Array,
                               interpret: bool = None) -> jax.Array:
    """(B, H, D) query vs (B, H, T, D) caches -> (B, H, D) context.

    Same math as MultiHeadAttention.step's einsum path (causal prefix mask).
    ``interpret=None`` auto-selects interpret mode off-TPU.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, H, T, D = key_cache.shape
    scale = 1.0 / (D ** 0.5)
    Tp = _round_up(T, 8)
    Dp = _round_up(D, _LANES)
    kp = jnp.pad(key_cache, [(0, 0), (0, 0), (0, Tp - T), (0, Dp - D)])
    vp = jnp.pad(value_cache, [(0, 0), (0, 0), (0, Tp - T), (0, Dp - D)])
    qp = jnp.pad(q_t, [(0, 0), (0, 0), (0, Dp - D)])
    kp = kp.reshape(B * H, Tp, Dp)
    vp = vp.reshape(B * H, Tp, Dp)
    qp = qp.reshape(B * H, 1, Dp)
    t_arr = jnp.broadcast_to(jnp.asarray(t, jnp.int32), (1,))

    out = pl.pallas_call(
        functools.partial(_incremental_kernel, scale=scale),
        grid=(B * H,),
        in_specs=[
            pl.BlockSpec((1, 1, Dp), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tp, Dp), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tp, Dp), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, Dp), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, 1, Dp), q_t.dtype),
        interpret=interpret,
    )(qp, kp, vp, t_arr)
    return out.reshape(B, H, Dp)[:, :, :D]
