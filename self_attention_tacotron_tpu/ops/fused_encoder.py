"""Whole-encoder fused Pallas kernel for batch-1 inference.

Why: at serving batch 1 the SelfAttentionCBHG encoder costs ~0.23 ms of
which almost none is compute — it is per-op launch overhead across ~150
small XLA ops (fixed-cost bisection in scripts/ab_decode.py: ablating
the conv bank, highway stack, or T_in barely moves it).  This kernel
runs the ENTIRE encoder — prenet -> conv bank -> maxpool -> conv
projections -> residual -> highway stacks -> bidirectional zoneout-LSTM
-> self-attention hops — as ONE ``pallas_call``.

Op-count engineering (all weight reshapes precomputed at call time):

* the K=1..16 conv bank is ONE matmul: an im2col window matrix
  (T, K_max*E) against a stacked weight whose per-width blocks sit at
  their SAME-padding tap offsets; inference batch-norm (running stats)
  folds into the weights and bias;
* width-2 max pool and the width-3 projection convs are a roll + max and
  two more window matmuls (BN folded likewise);
* each highway layer is ONE (T, C) @ (C, 2C) matmul (H and T gates
  side by side);
* the forward and backward LSTMs run in the SAME loop iteration (the
  backward direction walks the per-row length-reversed sequence,
  tf.reverse_sequence semantics), so one pass over time covers both;
* each self-attention hop fuses K|V|Q into one projection and collapses
  the output and transform denses into one (no nonlinearity between
  them, like the decoder hops).

Parity: identical math to models/encoders.SelfAttentionCBHGEncoder at
inference (tests/test_fused_encoder.py); self-attention probabilities
are not materialized (the alignment-replay path covers plots, as for
the fused decoder).

Reference provenance: the encoder structure is the reference's
SelfAttentionCBHGEncoder (reference: modules/module.py:374-441) built
from @tacotron2 CBHG/HighwayNet/ZoneoutLSTMCell primitives.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

NEG_INF = -1e9


class FusedEncoderParams(NamedTuple):
    """Pre-merged weights (biases as (1, N) rows; BN folded)."""

    prenet: Tuple[Tuple[Array, Array], ...]   # (W, b) per layer
    w_bank: Tuple[Array, Array]               # (K_max*E, K_max*C), bias
    w_proj1: Tuple[Array, Array]              # (3*K_max*C, P1), bias
    w_proj2: Tuple[Array, Array]              # (3*P1, P2), bias
    w_adjust: Optional[Tuple[Array, Array]]   # residual dim adjust or None
    highway: Tuple[Tuple[Array, Array], ...]  # (C, 2C) [H | T] per layer
    lstm: Tuple[Array, Array]                 # (2*(C+H), 4H) stacked fw/bw,
    #                                           bias (2, 4H) (forget folded)
    sa_proj: Tuple[Array, Array]              # (2H, SA)
    hops: Tuple[Tuple[Array, ...], ...]       # (W_kvq, b_kvq, W_ot, b_ot)


def _mm(a: Array, w: Array) -> Array:
    return jax.lax.dot_general(
        a.astype(w.dtype), w, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _roll_rows(x: Array, d: int):
    """out[r] = x[(r + d) mod n] (sublane rotate; callers mask edges)."""
    if d == 0:
        return x
    return pltpu.roll(x, (-d) % x.shape[0], 0)


def _windows(x: Array, K: int, pad_left: int, T: int):
    """(T, K*E) im2col rows: block k of row t = x[t + k - pad_left]
    (zero outside [0, T))."""
    cols = []
    iota = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)
    for k in range(K):
        d = k - pad_left
        valid = ((iota + d >= 0) & (iota + d < T)).astype(x.dtype)
        cols.append(_roll_rows(x, d) * valid)
    return jnp.concatenate(cols, axis=1)


def _kernel(spec: dict, *refs):
    T = spec["T"]
    E = spec["E"]              # prenet output width (conv-bank input)
    C = spec["C"]              # conv channels per bank width
    K = spec["K"]              # max filter width
    P1, P2 = spec["P1"], spec["P2"]
    half = spec["half"]        # highway width = cbhg_out/2 = LSTM units
    SA = spec["SA"]
    n_heads = spec["n_heads"]
    f32 = jnp.float32

    it = iter(refs)
    x_in = next(it)            # (T, E_in) prenet input
    len_ref = next(it)         # (1,) int32 in SMEM
    pe = next(it)              # (T, SA) positional encoding
    prenet = [(next(it), next(it)) for _ in spec["p_sizes"]]
    w_bank = (next(it), next(it))
    w_proj1 = (next(it), next(it))
    w_proj2 = (next(it), next(it))
    w_adj = (next(it), next(it)) if spec["has_adjust"] else None
    highway = [(next(it), next(it)) for _ in range(spec["n_highway"])]
    lstm = (next(it), next(it))
    sa_proj = (next(it), next(it))
    hops = [tuple(next(it) for _ in range(4)) for _ in range(spec["n_hops"])]
    ys_f_ref = next(it)        # (T, half) forward-LSTM output
    ys_b_ref = next(it)        # (T, half) backward-LSTM output (unreversed)
    sa_out_ref = next(it)      # (T, SA) output
    hw_scr = next(it)          # (T, half) scratch: highway out, read row-wise
    #                            by the LSTM loop (dynamic VALUE indexing is
    #                            not a Mosaic thing; refs are)
    assert next(it, None) is None

    L = len_ref[0]

    # ---- prenet (Dense + ReLU; inference: no dropout)
    h = x_in[...].astype(f32)
    for w, b in prenet:
        h = jax.nn.relu(_mm(h, w[...]) + b[...].astype(f32))

    # ---- conv bank as ONE windows matmul (BN folded), then ReLU
    win = _windows(h, K, (K - 1) // 2 if K > 1 else 0, T)
    # NOTE: per-width SAME offsets are baked into w_bank's row blocks
    banked = jax.nn.relu(_mm(win, w_bank[0][...])
                         + w_bank[1][...].astype(f32))    # (T, K*C)

    # ---- width-2 stride-1 SAME max pool along time (windows t, t+1)
    iota = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)
    nxt = jnp.where((iota + 1 < T).astype(f32) > 0.5,
                    _roll_rows(banked, 1), NEG_INF)
    pooled = jnp.maximum(banked, nxt)

    # ---- two width-3 projection convs (BN folded; relu on the first)
    p1 = jax.nn.relu(_mm(_windows(pooled, 3, 1, T), w_proj1[0][...])
                     + w_proj1[1][...].astype(f32))
    p2 = _mm(_windows(p1, 3, 1, T), w_proj2[0][...]) \
        + w_proj2[1][...].astype(f32)

    hw_in = p2 + h
    if w_adj is not None:
        hw_in = _mm(hw_in, w_adj[0][...]) + w_adj[1][...].astype(f32)

    for w, b in highway:
        ht = _mm(hw_in, w[...]) + b[...].astype(f32)      # (T, 2C): [H | T]
        width = hw_in.shape[1]
        hh = jax.nn.relu(ht[:, :width])
        tt = jax.nn.sigmoid(ht[:, width:])
        hw_in = hh * tt + hw_in * (1.0 - tt)
    hw_scr[...] = hw_in.astype(f32)

    # ---- bidirectional zoneout-LSTM: forward at t and backward at
    # (L-1-t) run in the same iteration (separate (1, .) rows — Mosaic
    # cannot concat sublane-offset slices, so no (2, .) packing)
    # outputs default zero: rows at/after each row's length stay zero.
    # Two separate refs: Mosaic cannot do dynamic-row stores into a lane
    # SLICE, so each direction gets its own full-row buffer (the caller
    # lane-concatenates them)
    ys_f_ref[...] = jnp.zeros_like(ys_f_ref)
    ys_b_ref[...] = jnp.zeros_like(ys_b_ref)

    def cell(z, c, h_prev, w_ref, b_row):
        gates = _mm(z, w_ref) + b_row
        a = gates.shape[1] // 4
        i, g = gates[:, :a], gates[:, a:2 * a]
        fgate, o = gates[:, 2 * a:3 * a], gates[:, 3 * a:]
        c_new = c * jax.nn.sigmoid(fgate) \
            + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jnp.tanh(c_new) * jax.nn.sigmoid(o)
        if spec["zc"] > 0.0:
            c_new = (1.0 - spec["zc"]) * c_new + spec["zc"] * c
        if spec["zo"] > 0.0:
            h_new = (1.0 - spec["zo"]) * h_new + spec["zo"] * h_prev
        return c_new, h_new

    Zin = half + hw_in.shape[1]
    w_fw = lstm[0][:Zin, :]
    w_bw = lstm[0][Zin:, :]
    b_fw = lstm[1][0:1, :].astype(f32)
    b_bw = lstm[1][1:2, :].astype(f32)

    def lstm_body(t, carry):
        c_f, h_f, c_b, h_b = carry                        # (1, half) each
        bw_t = jnp.maximum(L - 1 - t, 0)
        x_fw = hw_scr[pl.ds(t, 1), :]
        x_bw = hw_scr[pl.ds(bw_t, 1), :]
        cf_new, hf_new = cell(jnp.concatenate([x_fw, h_f], axis=1),
                              c_f, h_f, w_fw, b_fw)
        cb_new, hb_new = cell(jnp.concatenate([x_bw, h_b], axis=1),
                              c_b, h_b, w_bw, b_bw)

        @pl.when(t < L)
        def _():
            ys_f_ref[pl.ds(t, 1), :] = hf_new
            ys_b_ref[pl.ds(bw_t, 1), :] = hb_new

        # freeze carries past the valid length (dynamic_rnn semantics)
        keep = (t < L)
        return (jnp.where(keep, cf_new, c_f), jnp.where(keep, hf_new, h_f),
                jnp.where(keep, cb_new, c_b), jnp.where(keep, hb_new, h_b))

    z1 = jnp.zeros((1, half), f32)
    jax.lax.fori_loop(0, T, lstm_body, (z1, z1, z1, z1))
    lstm_out = jnp.concatenate([ys_f_ref[...], ys_b_ref[...]],
                               axis=1).astype(f32)

    # ---- self-attention branch: projection of the LSTM output, then the
    # SelfAttentionTransformer hops (reference: modules/module.py:425-438);
    # the positional-encoding operand is unused here but kept for the
    # SelfAttentionCBHG variant
    del pe
    sa = _mm(lstm_out, sa_proj[0][...]) + sa_proj[1][...].astype(f32)
    head_dim = SA // n_heads
    scale = 1.0 / (head_dim ** 0.5)
    for w_kvq, b_kvq, w_ot, b_ot in hops:
        kvq = _mm(sa, w_kvq[...]) + b_kvq[...].astype(f32)  # (T, 3SA)
        ctxs = []
        for hh in range(n_heads):
            sl_k = slice(hh * head_dim, (hh + 1) * head_dim)
            k = kvq[:, hh * head_dim:(hh + 1) * head_dim]
            v = kvq[:, SA + hh * head_dim:SA + (hh + 1) * head_dim]
            q = kvq[:, 2 * SA + hh * head_dim:2 * SA + (hh + 1) * head_dim]
            s = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=f32) * scale         # (T, T)
            m = jnp.max(s, axis=1, keepdims=True)
            ex = jnp.exp(s - m)
            p = ex / jnp.sum(ex, axis=1, keepdims=True)
            ctxs.append(_mm(p, v))
        ctx = jnp.concatenate(ctxs, axis=1)
        sa = sa + jnp.tanh(_mm(ctx, w_ot[...]) + b_ot[...].astype(f32))
    sa_out_ref[...] = sa.astype(sa_out_ref.dtype)


def fused_encode(params: FusedEncoderParams, x: Array, length,
                 pe: Array, *, max_filter_width: int, conv_channels: int,
                 half: int, sa_units: int, num_heads: int,
                 zoneout_cell: float = 0.0, zoneout_output: float = 0.0,
                 interpret: bool = None) -> Tuple[Array, Array]:
    """Run the whole inference encoder as one kernel.

    ``x`` is the (1, T, E) prenet input (embedded characters); returns
    (lstm_out (1, T, 2*half), sa_out (1, T, SA)).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert x.shape[0] == 1, "fused encoder is the batch-1 serving path"
    T = int(x.shape[1])
    spec = dict(T=T, E=int(x.shape[2]), C=conv_channels,
                K=max_filter_width,
                P1=int(params.w_proj1[1].shape[1]),
                P2=int(params.w_proj2[1].shape[1]),
                half=half, SA=sa_units, n_heads=num_heads,
                p_sizes=tuple(int(b.shape[1]) for _, b in params.prenet),
                has_adjust=params.w_adjust is not None,
                n_highway=len(params.highway),
                n_hops=len(params.hops),
                zc=float(zoneout_cell), zo=float(zoneout_output))

    ins = [jnp.asarray(x[0], jnp.float32),
           jnp.asarray(length, jnp.int32).reshape(1),
           jnp.asarray(pe, jnp.float32)]
    for w, b in params.prenet:
        ins += [w, b]
    ins += [*params.w_bank, *params.w_proj1, *params.w_proj2]
    if params.w_adjust is not None:
        ins += [*params.w_adjust]
    for w, b in params.highway:
        ins += [w, b]
    ins += [*params.lstm, *params.sa_proj]
    for hop in params.hops:
        ins += list(hop)
    ins = [ins[0], ins[1], ins[2]] + [jnp.asarray(v, jnp.float32)
                                      for v in ins[3:]]

    in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM)]
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * (len(ins) - 2)
    out_shapes = (jax.ShapeDtypeStruct((T, half), jnp.float32),
                  jax.ShapeDtypeStruct((T, half), jnp.float32),
                  jax.ShapeDtypeStruct((T, sa_units), jnp.float32))
    hw_width = int(params.highway[0][0].shape[0]) if params.highway \
        else half
    ys_f, ys_b, sa_out = pl.pallas_call(
        functools.partial(_kernel, spec),
        in_specs=in_specs,
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in range(3)),
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((T, hw_width), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
        interpret=interpret,
    )(*ins)
    lstm_out = jnp.concatenate([ys_f, ys_b], axis=1)
    return lstm_out[None], sa_out[None]
