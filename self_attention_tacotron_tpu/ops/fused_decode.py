"""Whole-loop fused Pallas kernel for autoregressive decoder inference.

The scan-path decoder (models/decoder.py) executes ~20 small XLA kernels per
step and re-streams every weight matrix from HBM on every one of the
``max_iters`` iterations (~11 MB/step for the flagship configuration — the
loop is weight-bandwidth/latency bound, not FLOP bound).  This kernel instead
runs the ENTIRE decode loop inside ONE ``pallas_call``:

* all weights are loaded HBM -> VMEM once and stay resident across all steps;
* the per-step state (LSTM carries, attention state, feedback frame) lives
  in registers/VMEM as a loop carry;
* the decoder self-attention KV caches are VMEM scratch;
* outputs (code/mel rows, stop logits, alignments) are written row-by-row
  into VMEM output buffers;
* with ``decoder_early_stop``, the loop is a ``while_loop`` that exits as
  soon as every batch row's stop token has fired.

Batching: the batch dimension is flattened into rows — memories are
``(B*T, U)``, per-utterance softmax statistics are computed with
block-indicator matmuls (``ind (B*T, B)``: broadcast = ``ind @ x``; reduce =
contract dim 0 of both).  Hop KV caches are ``(S, B*D)`` concatenated-block
buffers and ALL (batch row, head) scores run as one block-diagonal matmul
against them (round 5 — the previous per-column VPU reductions grew
linearly in B and capped fused serving at B~4).  Dense/LSTM/projection
matmuls batch naturally as ``(B, K) @ (K, N)``, so a batch of 8 costs
nearly the same MXU time as batch 1.

Supported subset (the reference's serving configuration — everything else
falls back to the scan path, see models/decoder.py):
  output_kind "single"; additive, location-sensitive, or forward attention
  mechanisms (1 or 2 sources, any batch — location/forward state runs on
  flattened (B*T, 1) columns exactly like the fused training kernel);
  MultiSpeakerPreNet speaker rows; no inference dropout; optional causal
  self-attention hops; batch small enough for VMEM (see
  ``fused_vmem_bytes``).  Source-attention alignments are materialized for
  batch 1 only (serving batches skip the plots).

Math parity (same ops as the scan path, verified in
tests/test_fused_decode.py):
  prenet (Dense+ReLU stack)                  models/prenet.py
  zoneout LSTM (i,g,f,o, forget bias 1,
    deterministic zoneout mix)               ops/rnn.py:49-76
  additive attention                         models/attention.py:62-89
  causal KV-cache self-attention hop         ops/attention_core.py:138-174,
                                             models/encoders.py:146-150
  output/stop heads (fused into one matmul)  models/decoder.py:335-344
  raw-frame feedback (last n_feed_frame
    frames of the r-frame output row)        models/decoder.py:346-370

Reference provenance: this replaces the TF1 reference's per-frame
``dynamic_decode`` loop with O(T^2)-per-step self-attention over a growing
history (reference: modules/rnn_wrappers.py:87-124, modules/module.py:767-784)
with a linear-cost, single-kernel loop.
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


class FusedDecodeParams(NamedTuple):
    """Weights, pre-shaped for the kernel (biases as (1, N) rows)."""

    prenet: Tuple[Tuple[Array, Array], ...]   # per layer (W (in,out), b (1,out))
    att_lstm: Tuple[Array, Array]             # (Zin, 4A), (1, 4A)
    query: Tuple[Tuple[Array, Array], ...]    # per source (Wq (A,U), v (U,1))
    outproj: Tuple[Array, Array]              # (A+Cctx, D), (1, D)
    lstm1: Tuple[Array, Array]                # (2D, 4D), (1, 4D)
    lstm2: Tuple[Array, Array]
    hops: Tuple[Tuple[Array, ...], ...]       # per hop (Wk,bk,Wv,bv,Wq,bq,
    #                                           Wo,bo,Wt,bt)
    head: Tuple[Array, Array]                 # (D, Cr+1), (1, Cr+1)
    # per source: merged location weights (K, U_i) = conv_kernel @ loc_dense
    # for location_sensitive / forward attention, else None.  The attention
    # bias and conv-bias*loc_dense rows are folded into the KEYS by the
    # caller (they are constant over decode steps).
    loc: Tuple[Optional[Array], ...] = ()


class FusedDecodeMemory(NamedTuple):
    """Precomputed encoder-side tensors, batch-major (B, T_i, ...)."""

    keys: Tuple[Array, ...]    # per source (B, T_i, U_i)
    values: Tuple[Array, ...]  # per source (B, T_i, C_i)
    masks: Tuple[Array, ...]   # per source (B, T_i) float {1, 0}


def _pos_col(B, T):
    """(B*T, 1) int32: within-block position of each flattened row."""
    return jax.lax.broadcasted_iota(jnp.int32, (B * T, 1), 0) % T


def _shift_col(x, d: int):
    """out[r] = x[(r + d) mod n] over the flattened rows, as a sublane
    ROTATE (Mosaic cannot concatenate sublane slices at non-tile offsets).

    The wrap-around rows are exactly the rows every caller masks with
    ``_shift_mask`` (a wrapped source row always crosses its utterance's
    block boundary), so rotate+mask equals shift-with-zero-fill."""
    if d == 0:
        return x
    n = x.shape[0]
    if abs(d) >= n:  # conv kernel wider than the whole flattened column
        return jnp.zeros_like(x)
    return pltpu.roll(x, (-d) % n, 0)


def _shift_mask(pos, d: int, T: int):
    """1.0 where row r's within-block source position r+d stays inside
    its utterance block."""
    q = pos + d
    return ((q >= 0) & (q < T)).astype(jnp.float32)


def _tap_masks(pos, K: int, T: int):
    """Per-tap block-boundary masks for the conv-window build/gather —
    hoisted out of the step loops (they depend only on the static position
    column, not on the step)."""
    pad = (K - 1) // 2
    return tuple(_shift_mask(pos, k - pad, T) for k in range(K))


def _taps_nat_mat(taps):
    """(B*T, K) lane matrix of the tap masks (for ``_win_build`` /
    ``_win_gather``); hoist once per kernel.

    A strided ``pltpu.roll`` (one skewed rotate for all K taps) would
    collapse the per-tap loops below entirely, but this chip's Mosaic
    cannot lower ``tpu.dynamic_rotate`` with a stride — the portable form
    keeps per-tap rolls and batches all K mask multiplies into one."""
    return jnp.concatenate(list(taps), axis=1)


def _win_build(cv, K: int, taps_nat):
    """(B*T, K) conv-input windows: column k holds cv shifted by k - pad
    within utterance blocks (one roll per tap, ONE batched mask multiply
    instead of K column multiplies)."""
    pad = (K - 1) // 2
    cols = [_shift_col(cv, k - pad) for k in range(K)]
    return jnp.concatenate(cols, axis=1) * taps_nat


def _win_gather(d_win_masked, K: int):
    """Adjoint of the window build: g[r] = sum_k d_win[r - (k-pad), k]
    with d_win already tap-masked (one batched multiply upstream)."""
    pad = (K - 1) // 2
    g = None
    for k in range(K):
        col = _shift_col(d_win_masked[:, k:k + 1], -(k - pad))
        g = col if g is None else g + col
    return g




def _mm(a: Array, w: Array) -> Array:
    """(B, K) @ (K, N) -> (B, N), f32 accumulation on the MXU."""
    return jax.lax.dot_general(
        a.astype(w.dtype), w, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _block_reduce(ind: Array, y: Array) -> Array:
    """(B*T, B)^T @ (B*T, N) -> (B, N): per-utterance sums."""
    return jax.lax.dot_general(
        ind, y.astype(ind.dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _bcast(x: Array, T: int) -> Array:
    """Per-utterance broadcast (B, N) -> (B*T, N) on b-major flattened rows
    as a sublane broadcast+reshape — replaces the MXU-hostile K=B indicator
    matmul ``_mm(ind, x)`` with pure data movement."""
    B, N = x.shape
    return jnp.broadcast_to(x[:, None, :], (B, T, N)).reshape(B * T, N)


def _block_softmax(e_col: Array, ind: Array, B: int, T: int) -> Array:
    """Per-utterance softmax over the (B*T, 1) column of block energies.
    Each utterance shifts by its OWN max (a global shift can underflow a
    whole row's exps); broadcasts ride ``_bcast``, reductions the deep-K
    indicator contraction."""
    if B == 1:  # plain column softmax, no indicator matmuls
        m = jnp.max(e_col, axis=0, keepdims=True)
        ex = jnp.exp(e_col - m)
        return ex / jnp.sum(ex, axis=0, keepdims=True)
    em = jnp.where(ind > 0.5, e_col, NEG_INF)            # (B*T, B)
    maxes = jnp.max(em, axis=0, keepdims=True)           # (1, B)
    ex = jnp.sum(jnp.exp(em - maxes), axis=1, keepdims=True)
    sums = _block_reduce(ind, ex)                        # (B, 1)
    return ex * _bcast(1.0 / sums, T)


def _lstm_gates(gates: Array, c_prev: Array, h_prev: Array,
                zc: float, zo: float) -> Tuple[Array, Array]:
    """ZoneoutLSTMCell step from precomputed gate pre-activations
    (ops/rnn.py:49-76), deterministic zoneout.  The +1.0 forget bias is
    FOLDED INTO the bias row at wiring time (_fold_forget_bias), and the
    gate columns are PERMUTED to [g | i f o] (_reorder_gifo) so the three
    sigmoids issue as ONE VPU op on the serial chain."""
    a = gates.shape[1] // 4
    g = gates[:, :a]
    ifo = jax.nn.sigmoid(gates[:, a:])
    i, f, o = ifo[:, :a], ifo[:, a:2 * a], ifo[:, 2 * a:]
    c_new = c_prev * f + i * jnp.tanh(g)
    h_new = jnp.tanh(c_new) * o
    if zc > 0.0:
        c_new = (1.0 - zc) * c_new + zc * c_prev
    if zo > 0.0:
        h_new = (1.0 - zo) * h_new + zo * h_prev
    return c_new, h_new


def _reorder_gifo(x: Array) -> Array:
    """Permute LSTM gate columns [i g f o] -> [g i f o] (weights or bias
    rows), matching ``_lstm_gates``'s fused-sigmoid layout."""
    a = x.shape[-1] // 4
    return jnp.concatenate([x[..., a:2 * a], x[..., :a], x[..., 2 * a:]],
                           axis=-1)


def _lstm(z: Array, w_ref, b_ref, c_prev: Array, h_prev: Array,
          zc: float, zo: float) -> Tuple[Array, Array]:
    """ZoneoutLSTMCell step (ops/rnn.py:49-76), deterministic zoneout."""
    gates = _mm(z, w_ref[...]) + b_ref[...].astype(jnp.float32)
    return _lstm_gates(gates, c_prev, h_prev, zc, zo)


def _fold_forget_bias(b: Array) -> Array:
    """Add the LSTM +1.0 forget bias into the (1, 4A) bias row, removing a
    VPU add from the kernel's serial chain."""
    a = b.shape[1] // 4
    return b + jnp.concatenate(
        [jnp.zeros((1, 2 * a), b.dtype), jnp.ones((1, a), b.dtype),
         jnp.zeros((1, a), b.dtype)], axis=1)


def _kernel(spec: dict, *refs):
    """The whole decode loop.  ``refs`` order mirrors fused_decode()."""
    ns = spec["num_sources"]
    n_pre = spec["num_prenet"]
    n_hops = spec["num_hops"]
    n_heads = spec["num_heads"]
    S = spec["num_steps"]
    B = spec["batch"]
    cr = spec["cr"]          # num_mels * r (output row, without stop column)
    cf = spec["cf"]          # num_mels * n_feed_frame (feedback width)
    mat_aligns = spec["materialize_aligns"]
    row_mode = spec["row_mode"]       # B == 1 latency path (see below)

    it = iter(refs)
    if row_mode:
        # B=1 row-oriented layout: every softmax reduction runs along the
        # lane axis (rows), and both sources' energies/contexts fuse into
        # single matmuls via block-diagonal packing
        keys_T = next(it)             # (sum U_i, T) transposed keys
        v_bd = next(it)               # (sum U_i, ns) block-diag energy vecs
        values_cat = next(it)         # (T, sum C_i)
        mask_rows = next(it)          # (ns, T) float {1, 0}
        ctx_mask = next(it)           # (ns, sum C_i) block-i-on-row-i {1, 0}
        # location-based sources (location_sensitive / forward): the merged
        # conv*location-dense product (K, U_i); biases are folded into keys
        loc_ws = [next(it) if k != 0 else None for k in spec["src_kinds"]]
        mem = []
    else:
        # keys (B*T,U), values (B*T,C), mask (B*T,1), indicator (B*T,B)
        mem = [(next(it), next(it), next(it), next(it)) for _ in range(ns)]
        # location-based sources in flattened-row form (same math as the
        # fused training kernel): merged (K, U_i) conv*loc-dense products
        loc_ws = [next(it) if k != 0 else None for k in spec["src_kinds"]]
    p0_init = next(it)                # (1, P0): first-prenet bias = step-0
    #                                   pre-activation (GO frame is zeros)
    # (B, P0) per-utterance speaker row added after the first layer's ReLU
    # (MultiSpeakerPreNet, reference: modules/multi_speaker_modules.py:11-35)
    spk = next(it) if spec["use_spk"] else None
    prenet = [(next(it), next(it)) for _ in range(n_pre - 1)]  # layers 1..
    att_lstm = (next(it), next(it))
    query_all = next(it)              # (A, sum U_i): all query projections
    vs = [] if row_mode else [next(it) for _ in range(ns)]  # (U_i, 1) vecs
    # output projection + lstm1 gates merged into ONE matmul over
    # [h_att | ctx | h1]: cols 0:4D = lstm1 gate pre-activations (through
    # the precomputed Wop @ W1_x product), cols 4D:5D = proj itself
    big = (next(it), next(it))        # ((A+sumC+D), 5D), (1, 5D)
    lstm2 = (next(it), next(it))
    # per hop: fused (D, 3D) K|V|Q projection + the merged out*transform
    # dense (Wo @ Wt — no nonlinearity sits between them)
    hops = [tuple(next(it) for _ in range(4)) for _ in range(n_hops)]
    head = (next(it), next(it))       # (D, head_pad + P0) extended head:
    #                                   [out+stop | pad | feedback@prenet0]
    out_ref = next(it)
    if mat_aligns:
        # row_mode: ONE (ns*S, T) buffer, one store/step; otherwise (B=1
        # with per-source memory lengths) one (S, T_i) buffer per source
        align_refs = [next(it)] if row_mode else [next(it)
                                                  for _ in range(ns)]
    else:
        align_refs = []
    caches = [(next(it), next(it)) for _ in range(n_hops)]
    assert next(it, None) is None

    # zero the KV caches: masked-out rows are still multiplied by exactly-0
    # probabilities, and 0 * garbage would poison the context sums
    for kc, vc in caches:
        kc[...] = jnp.zeros_like(kc)
        vc[...] = jnp.zeros_like(vc)
    if spec["early_stop"]:
        # rows past the exit step are never written; they must read as zero
        # (parity with the while-path buffers)
        out_ref[...] = jnp.zeros_like(out_ref)
        for a_ref in align_refs:
            a_ref[...] = jnp.zeros_like(a_ref)

    f32 = jnp.float32
    A = att_lstm[1].shape[1] // 4            # attention RNN units
    D = lstm2[1].shape[1] // 4               # decoder RNN units
    head_dim = D // n_heads
    sa_scale = 1.0 / (head_dim ** 0.5)
    head_pad = spec["head_pad"]              # 128-aligned offset of the
    #                                          feedback block in the head row
    if n_hops:
        # (n_heads, D) block-diagonal head selector: lane d belongs to head
        # d // head_dim.  Lets ALL heads' scores run as one matmul.
        hmask = (jax.lax.broadcasted_iota(jnp.int32, (n_heads, D), 1)
                 // head_dim) == jax.lax.broadcasted_iota(
                     jnp.int32, (n_heads, D), 0)
    if n_hops and not row_mode:
        # batched (b, head) selector over the (S, B*D) concatenated caches:
        # row r = b*n_heads + head owns lanes [b*D + head*head_dim, ...).
        # All rows' scores then run as ONE matmul against the cache — the
        # row_mode block-diagonal trick generalized over the batch.  (The
        # old per-column VPU reductions grew linearly in B*S and set the
        # B~4 serving crossover.)
        BH, BD = B * n_heads, B * D
        row_i = jax.lax.broadcasted_iota(jnp.int32, (BH, BD), 0)
        lane_i = jax.lax.broadcasted_iota(jnp.int32, (BH, BD), 1)
        bh_mask = ((row_i // n_heads == lane_i // D)
                   & (row_i % n_heads == (lane_i % D) // head_dim))

    kinds = spec["src_kinds"]
    if row_mode:
        # loop-invariant softmax shift: sum_u |v| bounds every energy
        e_bound = jnp.transpose(jnp.sum(jnp.abs(v_bd[...].astype(f32)),
                                        axis=0, keepdims=True))  # (ns, 1)
    has_loc = any(k != 0 for k in kinds)
    u_sizes = spec["u_sizes"]
    loc_k = spec["loc_kernel"]
    loc_pad = (loc_k - 1) // 2           # flax Conv SAME, cross-correlation
    if has_loc and not row_mode:
        # hoisted loop-invariant conv tap-mask matrices per source
        pos_mem = [
            _pos_col(B, keys_ref.shape[0] // B) if k != 0 else None
            for k, (keys_ref, _, _, _) in zip(kinds, mem)]
        taps_mem = [
            _taps_nat_mat(_tap_masks(pos_mem[i], loc_k,
                                     keys_ref.shape[0] // B))
            if k != 0 else None
            for i, (k, (keys_ref, _, _, _)) in enumerate(zip(kinds, mem))]

    def _shift_row(a, d, T):
        """a (n, T) shifted so out[:, t] = a[:, t + d], zero-filled edges."""
        if d == 0:
            return a
        if abs(d) >= T:  # conv kernel wider than the memory
            return jnp.zeros_like(a)
        if d > 0:
            return jnp.concatenate(
                [a[:, d:], jnp.zeros((a.shape[0], d), a.dtype)], axis=1)
        return jnp.concatenate(
            [jnp.zeros((a.shape[0], -d), a.dtype), a[:, :T + d]], axis=1)

    def body(t, carry):
        if has_loc:
            (p0_pre, prev_ctx, h_att, c_att, h1, c1, h2, c2,
             conv_rows, alpha_rows) = carry
        else:
            (p0_pre, prev_ctx, h_att, c_att, h1, c1, h2, c2) = carry

        # prenet stack: Dense + ReLU (inference: no dropout).  The FIRST
        # layer's matmul was merged into the previous step's head matmul
        # (feedback @ W0 rides the head weight product), so the carry holds
        # its pre-activation
        p = jax.nn.relu(p0_pre)
        if spk is not None:
            p = p + spk[...].astype(f32)
        for w, b in prenet:
            p = jax.nn.relu(_mm(p, w[...]) + b[...].astype(f32))

        # attention LSTM over [prenet, prev_context]
        z = jnp.concatenate([p, prev_ctx, h_att], axis=1)
        c_att, h_att = _lstm(z, att_lstm[0], att_lstm[1], c_att, h_att,
                             spec["zc_att"], spec["zo_att"])

        # additive attention (models/attention.py:84-89)
        if row_mode:
            # B=1 fused path: all sources' energies in ONE matmul pair, all
            # reductions along lanes.
            #   pq^T  (sumU, 1) = query_all (A, sumU) ^T h_att (1, A)
            #   e^T   (sumU, T) = tanh(keys^T + pq^T)
            #   e_rows (ns, T)  = v_bd^T (ns, sumU) @ e^T
            pq_T = jax.lax.dot_general(
                query_all[...].astype(f32), h_att,
                dimension_numbers=(((0,), (1,)), ((), ())),
                preferred_element_type=f32)                # (sumU, 1)
            pre_T = keys_T[...].astype(f32) + pq_T          # (sumU, T)
            if has_loc:
                # location features: conv(prev alignments) * location dense
                # collapses to ONE (U_i, T) matmul against K statically
                # shifted copies of the (1, T) conv-input row
                T = pre_T.shape[1]
                blocks = []
                for i, kind in enumerate(kinds):
                    if kind == 0:
                        blocks.append(jnp.zeros((u_sizes[i], T), f32))
                        continue
                    a_row = conv_rows[i:i + 1]              # (1, T)
                    win = jnp.concatenate(
                        [_shift_row(a_row, k - loc_pad, T)
                         for k in range(loc_k)], axis=0)    # (K, T)
                    blocks.append(jax.lax.dot_general(
                        loc_ws[i][...].astype(f32), win,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=f32))        # (U_i, T)
                pre_T = pre_T + jnp.concatenate(blocks, axis=0)
            e_T = jnp.tanh(pre_T)                           # (sumU, T)
            e_rows = jax.lax.dot_general(
                v_bd[...].astype(f32), e_T,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=f32)                # (ns, T)
            e_rows = jnp.where(mask_rows[...] > 0.5, e_rows, NEG_INF)
            # softmax is shift-invariant: shift by the STATIC energy bound
            # sum_u |v| >= max|e| instead of a per-step max reduction —
            # exp(e - bound) <= 1 can never overflow, and the per-row max
            # leaves the serial chain (e_bound is loop-invariant)
            ex = jnp.exp(e_rows - e_bound)
            recip = 1.0 / jnp.sum(ex, axis=1, keepdims=True)   # (ns, 1)
            if not has_loc:
                # additive-only: defer the normalization PAST the context
                # matmul — the per-row scale cancels into a tiny (ns, sumC)
                # multiply, and the (ns, T) divide leaves the serial chain
                # (the alignment store's normalize is a dead-end branch the
                # scheduler overlaps with the matmul)
                if mat_aligns:
                    align_refs[0][pl.ds(t * ns, ns), :] = \
                        (ex * recip).astype(align_refs[0].dtype)
                ctx_all = jax.lax.dot_general(
                    ex, values_cat[...].astype(f32),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=f32)                # (ns, sumC)
                ctx = jnp.sum(ctx_all * ctx_mask[...].astype(f32) * recip,
                              axis=0, keepdims=True)           # (1, sumC)
            if has_loc:
                a_rows = ex * recip                            # (ns, T)
                # forward-attention recursion (reference:
                # modules/forward_attention.py:105-122) and per-source
                # conv-input/alignment state updates.  The transition agent
                # is gated out, so u is the 0.5 initial value forever.
                T = a_rows.shape[1]
                out_rows, new_alpha, new_conv = [], [], []
                for i, kind in enumerate(kinds):
                    a_i = a_rows[i:i + 1]
                    if kind == 2:
                        ap = alpha_rows[i:i + 1]
                        sh = _shift_row(ap, -1, T)          # alpha[t-1]
                        al = (0.5 * ap + 0.5 * sh + 1e-7) * a_i
                        al = al / jnp.sum(al, axis=1, keepdims=True)
                        out_rows.append(al)
                        new_alpha.append(al)
                    else:
                        out_rows.append(a_i)
                        new_alpha.append(a_i)
                    new_conv.append((conv_rows[i:i + 1] + a_i)
                                    if spec["cumulative"][i] else a_i)
                a_rows = jnp.concatenate(out_rows, axis=0)
                conv_rows = jnp.concatenate(new_conv, axis=0)
                alpha_rows = jnp.concatenate(new_alpha, axis=0)
                if mat_aligns:
                    # both sources' rows land in ONE store
                    align_refs[0][pl.ds(t * ns, ns), :] = \
                        a_rows.astype(align_refs[0].dtype)
                # per-source contexts in ONE matmul: row i of
                # a_rows @ values_cat holds [a_i . V_1 | a_i . V_2 | ...];
                # the wanted context is block i of row i — selected by
                # mask+sum (lane-offset slices + concat are not
                # Mosaic-layout-friendly)
                ctx_all = jax.lax.dot_general(
                    a_rows, values_cat[...].astype(f32),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=f32)            # (ns, sumC)
                ctx = jnp.sum(ctx_all * ctx_mask[...].astype(f32),
                              axis=0, keepdims=True)       # (1, sumC)
        else:
            # batched path: block-indicator matmuls over flattened rows; the
            # per-source query projections run as one fused matmul.
            # Location/forward sources run the SAME flattened-row math as
            # the fused training kernel (ops/fused_train.py _fwd_kernel):
            # conv windows as one (B*T, K) @ (K, U) matmul, the forward
            # recursion on (B*T, 1) columns with block-masked shifts.
            pq_all = _mm(h_att, query_all[...])            # (B, sum U_i)
            ctxs = []
            u_off = 0
            if has_loc:
                new_cv, new_alpha = list(conv_rows), list(alpha_rows)
            for i, ((keys_ref, values_ref, mask_ref, ind_ref), v_ref) in \
                    enumerate(zip(mem, vs)):
                u = int(v_ref.shape[1])   # v rides as a (1, U) row
                T = keys_ref.shape[0] // B
                ind = ind_ref[...].astype(f32)
                pq_b = pq_all[:, u_off:u_off + u]          # (B, U)
                pq = _bcast(pq_b, T)                       # (B*T, U)
                u_off += u
                pre = keys_ref[...].astype(f32) + pq       # (B*T, U)
                if kinds[i] != 0:
                    win = _win_build(conv_rows[i], loc_k, taps_mem[i])
                    pre = pre + _mm(win, loc_ws[i][...])
                e = jnp.tanh(pre)
                # v rides as a (1, U) row: lane reduction, not an N=1 matmul
                e_col = jnp.sum(e * v_ref[...].astype(f32), axis=1,
                                keepdims=True)             # (B*T, 1)
                e_col = jnp.where(mask_ref[...] > 0.5, e_col, NEG_INF)
                a_col = _block_softmax(e_col, ind, B, T)
                if kinds[i] == 2:
                    # forward recursion (reference:
                    # modules/forward_attention.py:105-122), u fixed at 0.5
                    ap = alpha_rows[i]
                    sh = _shift_col(ap, -1) * _shift_mask(pos_mem[i], -1, T)
                    z_col = (0.5 * ap + 0.5 * sh + 1e-7) * a_col
                    w_col = z_col * _bcast(
                        1.0 / _block_reduce(ind, z_col), T)
                else:
                    w_col = a_col
                if kinds[i] != 0:
                    new_cv[i] = (a_col + conv_rows[i]
                                 if spec["cumulative"][i] else a_col)
                    new_alpha[i] = w_col
                if mat_aligns:
                    align_refs[i][pl.ds(t, 1), :] = \
                        jnp.transpose(w_col).astype(align_refs[i].dtype)
                # ctx_b = sum_t a[b,t] * values[b,t,:]
                ctxs.append(_block_reduce(
                    ind, w_col * values_ref[...].astype(f32)))  # (B, C_i)
            if has_loc:
                conv_rows, alpha_rows = tuple(new_cv), tuple(new_alpha)
            ctx = jnp.concatenate(ctxs, axis=1) if ns > 1 else ctxs[0]

        # DecoderRNNV1/V2: projection + two residual LSTMs.  The projection
        # and the first LSTM's gates come out of ONE matmul (the outproj
        # weights were premultiplied into the lstm1 gate weights)
        bigrow = _mm(jnp.concatenate([h_att, ctx, h1], axis=1), big[0][...]) \
            + big[1][...].astype(f32)                      # (B, 5D)
        c1, l1 = _lstm_gates(bigrow[:, :4 * D], c1, h1,
                             spec["zc_dec"], spec["zo_dec"])
        proj = bigrow[:, 4 * D:]
        h1 = l1
        o1 = proj + l1
        c2, l2 = _lstm(jnp.concatenate([o1, h2], axis=1), lstm2[0],
                       lstm2[1], c2, h2, spec["zc_dec"], spec["zo_dec"])
        h2 = l2
        y = o1 + l2

        # causal self-attention hops with flat (B*S, D) VMEM KV caches;
        # K|V|Q projections fused into one (D, 3D) matmul
        if n_hops:
            # (1, S) score/probability ROWS: masks and softmaxes reduce
            # along lanes instead of across 450 sublanes
            valid_row = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1) <= t
        for (wkvq, bkvq, wot, bot), (kc, vc) in zip(hops, caches):
            kvq = _mm(y, wkvq[...]) + bkvq[...].astype(f32)  # (B, 3D)
            q_t = kvq[:, 2 * D:]
            for b in range(B):
                kc[pl.ds(t, 1), b * D:(b + 1) * D] = \
                    kvq[b:b + 1, :D].astype(kc.dtype)
                vc[pl.ds(t, 1), b * D:(b + 1) * D] = \
                    kvq[b:b + 1, D:2 * D].astype(vc.dtype)
            k_all = kc[...].astype(f32)                    # (S, B*D)
            v_all = vc[...].astype(f32)
            if row_mode:
                # ALL heads in one matmul pair: scores (n_heads, S) from a
                # block-diagonal query, one joint softmax along lanes, and
                # the per-head context blocks selected from the (n_heads, D)
                # probe-times-values product by the same head selector.
                # Normalization happens AFTER the context matmul ((h, D)
                # multiply instead of an (h, S) divide on the serial chain).
                qb = jnp.where(hmask, jnp.broadcast_to(q_t, (n_heads, D)),
                               0.0)
                s = jax.lax.dot_general(
                    qb, k_all, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=f32) * sa_scale  # (n_heads, S)
                s = jnp.where(valid_row, s, NEG_INF)
                m_r = jnp.max(s, axis=1, keepdims=True)
                ex_r = jnp.exp(s - m_r)
                pv = jax.lax.dot_general(
                    ex_r, v_all, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=f32)             # (n_heads, D)
                recip = 1.0 / jnp.sum(ex_r, axis=1, keepdims=True)
                hctx_cat = jnp.sum(jnp.where(hmask, pv * recip, 0.0),
                                   axis=0, keepdims=True)   # (1, D)
            else:
                # all (b, head) scores as ONE matmul via the block-diagonal
                # query rows; joint per-row softmax along lanes; per-head
                # context blocks selected from the probe-times-values
                # product.  Normalization after the context matmul.
                q_bh = jnp.broadcast_to(
                    q_t[:, None, :], (B, n_heads, D)).reshape(B * n_heads, D)
                q_bd = jnp.where(
                    bh_mask, jnp.concatenate([q_bh] * B, axis=1), 0.0)
                s = jax.lax.dot_general(
                    q_bd, k_all, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=f32) * sa_scale  # (B*h, S)
                s = jnp.where(valid_row, s, NEG_INF)
                m_r = jnp.max(s, axis=1, keepdims=True)
                ex_r = jnp.exp(s - m_r)
                pv = jax.lax.dot_general(
                    ex_r, v_all, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=f32)             # (B*h, B*D)
                recip = 1.0 / jnp.sum(ex_r, axis=1, keepdims=True)
                rows = []
                for b in range(B):
                    blk = pv[b * n_heads:(b + 1) * n_heads,
                             b * D:(b + 1) * D]             # (h, D)
                    blk = blk * recip[b * n_heads:(b + 1) * n_heads]
                    rows.append(jnp.sum(jnp.where(hmask, blk, 0.0),
                                        axis=0, keepdims=True))
                hctx_cat = jnp.concatenate(rows, axis=0)    # (B, D)
            # merged out*transform dense (Wo @ Wt precomputed)
            y = y + jnp.tanh(_mm(hctx_cat, wot[...]) + bot[...].astype(f32))

        # fused output + stop + NEXT-STEP-prenet heads: one matmul.  Columns
        # [0, cr] hold the output row and stop logit; columns [head_pad,
        # head_pad+P0) hold the next step's first-prenet pre-activation
        # (feedback slice premultiplied through W0)
        row = _mm(y, head[0][...]) + head[1][...].astype(f32)
        for b in range(B):
            out_ref[pl.ds(t + b * S, 1), :] = \
                row[b:b + 1, :cr + 1].astype(out_ref.dtype)

        p0_next = row[:, head_pad:]
        stop_col = row[:, cr:cr + 1]
        if has_loc:
            return (p0_next, ctx, h_att, c_att, h1, c1, h2, c2,
                    conv_rows, alpha_rows), stop_col
        return (p0_next, ctx, h_att, c_att, h1, c1, h2, c2), stop_col

    zeros = lambda n: jnp.zeros((B, n), f32)
    cctx = (sum(spec["c_sizes"]) if row_mode
            else sum(int(v.shape[1]) for _, v, _, _ in mem))
    # step-0 prenet pre-activation: GO frame is zeros, so it is just b0
    p0_0 = jnp.broadcast_to(p0_init[...].astype(f32),
                            (B, p0_init.shape[1]))
    carry0 = (p0_0, zeros(cctx), zeros(A), zeros(A),
              zeros(D), zeros(D), zeros(D), zeros(D))
    if has_loc and row_mode:
        T0 = keys_T.shape[1]
        # alpha init [1, 0, ...] for forward sources (reference:
        # forward_attention.py initial_alignments); conv input starts zero
        onehot0 = (jax.lax.broadcasted_iota(jnp.int32, (1, T0), 1)
                   == 0).astype(f32)
        alpha0 = jnp.concatenate(
            [onehot0 if k == 2 else jnp.zeros((1, T0), f32)
             for k in kinds], axis=0)
        carry0 = carry0 + (jnp.zeros((ns, T0), f32), alpha0)
    elif has_loc:
        # batched flattened-row state: per-source (B*T, 1) columns
        cv0 = tuple(
            jnp.zeros((mem[i][0].shape[0], 1), f32) if k != 0
            else jnp.zeros((1, 1), f32) for i, k in enumerate(kinds))
        alpha0 = tuple(
            (pos_mem[i] == 0).astype(f32) if k == 2
            else jnp.zeros((mem[i][0].shape[0], 1), f32) if k != 0
            else jnp.zeros((1, 1), f32) for i, k in enumerate(kinds))
        carry0 = carry0 + (cv0, alpha0)
    if spec["early_stop"]:
        # dynamic_decode-style early exit: a while_loop that stops once
        # EVERY batch row's stop token has fired (sigmoid > 0.5 past
        # min_iters), matching the scan path's while_loop
        # (models/decoder.py:_decode_path_while)
        min_iters = spec["min_iters"]

        def cond(state):
            t, fired, _ = state
            return (t < S) & ~jnp.all(fired)

        def wbody(state):
            t, fired, carry = state
            carry, stop_col = body(t, carry)
            # sigmoid(x) > 0.5  <=>  x > 0: the sigmoid leaves the chain
            fired = fired | ((stop_col > 0.0) & (t > min_iters))
            return (t + 1, fired, carry)

        jax.lax.while_loop(cond, wbody,
                           (jnp.asarray(0, jnp.int32),
                            jnp.zeros((B, 1), bool), carry0))
    else:
        jax.lax.fori_loop(0, S, lambda t, c: body(t, c)[0], carry0)


def _nbytes(shape, dtype) -> int:
    # lane padding to 128 and sublane padding to 8 dominate small arrays
    rows = max(int(shape[0]), 8) if len(shape) == 2 else 8
    cols = ((int(shape[-1]) + 127) // 128) * 128
    return rows * cols * jnp.dtype(dtype).itemsize


def fused_vmem_bytes(params: FusedDecodeParams, memory: FusedDecodeMemory,
                     num_steps: int, num_mels: int, outputs_per_step: int,
                     compute_dtype=jnp.float32) -> int:
    """Estimated VMEM working set of the fused kernel (for dispatch gates)."""
    cdt = jnp.dtype(compute_dtype)
    B = int(memory.keys[0].shape[0])
    S = num_steps
    cr = num_mels * outputs_per_step
    total = 0
    for k, v in zip(memory.keys, memory.values):
        bt = B * int(k.shape[1])
        total += _nbytes((bt, int(k.shape[2])), cdt)
        total += _nbytes((bt, int(v.shape[2])), cdt)
        total += 2 * _nbytes((bt, 8), jnp.float32)  # mask + indicator
    flat = lambda p: sum(_nbytes(x.shape, cdt) for pair in p for x in pair)
    total += flat(params.prenet) + flat([params.att_lstm, params.outproj,
                                         params.lstm1, params.lstm2,
                                         params.head, *params.query])
    total += sum(_nbytes(x.shape, cdt) for hop in params.hops for x in hop)
    D = params.lstm1[1].shape[1] // 4
    total += _nbytes((B * S, cr + 1), jnp.float32)              # out buffer
    total += len(params.hops) * 2 * _nbytes((S, B * D), jnp.float32)
    return total


def fused_decode(params: FusedDecodeParams, memory: FusedDecodeMemory, *,
                 num_steps: int, num_mels: int, outputs_per_step: int = 1,
                 n_feed_frame: int = 1, num_heads: int = 2,
                 zoneout_cell: float = 0.0, zoneout_output: float = 0.0,
                 dec_zoneout_cell: float = 0.0, dec_zoneout_output: float = 0.0,
                 early_stop: bool = False, min_iters: int = 10,
                 compute_dtype=jnp.float32, interpret: bool = None,
                 speaker_row=None, src_kinds: Tuple[str, ...] = None,
                 cumulative: Tuple[bool, ...] = None,
                 loc_kernel: int = 31):
    """Run the whole inference loop in one kernel.

    Returns (out (B, S, num_mels*r), stop (B, S), aligns tuple of
    (B, S, T_i) — zeros unless B == 1) in float32.  ``compute_dtype``
    selects the storage dtype of weights and memories inside the kernel
    (bfloat16 halves their VMEM; row-store buffers and softmax math stay
    float32 either way).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    cdt = jnp.dtype(compute_dtype)
    S = num_steps
    B = int(memory.keys[0].shape[0])
    cr = num_mels * outputs_per_step
    cf = num_mels * n_feed_frame
    mat_aligns = B == 1
    kind_ids = {"additive": 0, "location_sensitive": 1, "forward": 2}
    src_kinds = tuple(kind_ids[k] for k in
                      (src_kinds or ("additive",) * len(memory.keys)))
    cumulative = tuple(cumulative or (False,) * len(memory.keys))
    u_sizes = tuple(int(vq.shape[0]) for _, vq in params.query)

    # B == 1 runs the row-oriented latency path (see _kernel): requires all
    # sources to share one memory length (always true — dual-source
    # attention attends to two views of the SAME encoder sequence)
    row_mode = B == 1 and len({int(k.shape[1]) for k in memory.keys}) == 1

    spec = dict(num_sources=len(memory.keys), num_prenet=len(params.prenet),
                num_hops=len(params.hops), num_heads=num_heads,
                num_steps=S, cr=cr, cf=cf, batch=B,
                materialize_aligns=mat_aligns, row_mode=row_mode,
                c_sizes=tuple(int(v.shape[2]) for v in memory.values),
                zc_att=float(zoneout_cell), zo_att=float(zoneout_output),
                zc_dec=float(dec_zoneout_cell),
                zo_dec=float(dec_zoneout_output),
                early_stop=bool(early_stop), min_iters=int(min_iters),
                use_spk=speaker_row is not None,
                src_kinds=src_kinds, cumulative=cumulative,
                loc_kernel=int(loc_kernel), u_sizes=u_sizes)

    def w(x):
        return jnp.asarray(x, cdt)

    def flat(x):  # (B, T, C) -> (B*T, C)
        return x.reshape(B * x.shape[1], x.shape[2])

    ins = []
    t_lens = [int(k.shape[1]) for k in memory.keys]
    if row_mode:
        # transposed concatenated keys, block-diag energy vectors,
        # concatenated values, stacked mask rows
        keys_T = jnp.concatenate(
            [jnp.transpose(k[0]) for k in memory.keys], axis=0)  # (sumU, T)
        v_bd = np.zeros((sum(u_sizes), len(u_sizes)), np.float32)
        off = 0
        v_bd = jnp.asarray(v_bd)
        for i, (_, vq) in enumerate(params.query):
            v_bd = v_bd.at[off:off + u_sizes[i], i:i + 1].set(
                jnp.asarray(vq, jnp.float32))
            off += u_sizes[i]
        values_cat = jnp.concatenate([v[0] for v in memory.values], axis=1)
        mask_rows = jnp.concatenate(
            [m.reshape(1, -1) for m in memory.masks], axis=0)
        c_sizes = [int(v.shape[2]) for v in memory.values]
        ctx_mask = np.zeros((len(c_sizes), sum(c_sizes)), np.float32)
        c_off = 0
        for i, c in enumerate(c_sizes):
            ctx_mask[i, c_off:c_off + c] = 1.0
            c_off += c
        ins += [w(keys_T), w(v_bd), w(values_cat),
                jnp.asarray(mask_rows, jnp.float32), jnp.asarray(ctx_mask)]
        for i, k in enumerate(src_kinds):
            if k != 0:
                ins += [w(params.loc[i])]
    else:
        for k, v, m in zip(memory.keys, memory.values, memory.masks):
            T = int(k.shape[1])
            ind = jnp.asarray(np.kron(np.eye(B, dtype=np.float32),
                                      np.ones((T, 1), np.float32)))
            ins += [w(flat(k)), w(flat(v)),
                    jnp.asarray(m.reshape(B * T, 1), jnp.float32), ind]
    D = params.lstm1[1].shape[1] // 4
    W0, b0 = params.prenet[0]
    P0 = int(b0.shape[1])
    # serial-chain merges (all pure weight preproducts — one-time cost):
    #  * outproj premultiplied into the lstm1 gate weights -> ONE matmul
    #    emits [gates1 | proj]
    #  * each hop's out & transform denses collapse (no nonlinearity
    #    between them): W_ot = Wo @ Wt
    #  * the head matmul also emits the NEXT step's first-prenet
    #    pre-activation: feedback slice times W0, premultiplied
    Wop, bop = params.outproj
    W1 = _reorder_gifo(params.lstm1[0])
    b1 = _reorder_gifo(_fold_forget_bias(params.lstm1[1]))
    w_big = jnp.concatenate([
        jnp.concatenate([Wop @ W1[:D], Wop], axis=1),
        jnp.concatenate([W1[D:], jnp.zeros((D, D), W1.dtype)], axis=1),
    ], axis=0)                                       # (A+sumC+D, 5D)
    b_big = jnp.concatenate([b1 + bop @ W1[:D], bop], axis=1)
    head_pad = ((cr + 1 + 127) // 128) * 128         # 128-aligned fb offset
    Wh, bh = params.head
    w_fb = Wh[:, cr - cf:cr] @ W0                    # (D, P0)
    b_fb = bh[:, cr - cf:cr] @ W0 + b0
    zpad = head_pad - (cr + 1)
    w_head = jnp.concatenate(
        [Wh, jnp.zeros((Wh.shape[0], zpad), Wh.dtype), w_fb], axis=1)
    b_head = jnp.concatenate(
        [bh, jnp.zeros((1, zpad), bh.dtype), b_fb], axis=1)

    if not row_mode:
        for i, k in enumerate(src_kinds):
            if k != 0:
                ins += [w(params.loc[i])]
    ins += [w(b0)]
    if speaker_row is not None:
        ins += [jnp.asarray(speaker_row, jnp.float32)]
    for wt, b in params.prenet[1:]:
        ins += [w(wt), w(b)]
    ins += [w(_reorder_gifo(params.att_lstm[0])),
            w(_reorder_gifo(_fold_forget_bias(params.att_lstm[1])))]
    # all source query projections fused into one matmul
    ins += [w(jnp.concatenate([wq for wq, _ in params.query], axis=1))]
    if not row_mode:
        # energy vectors as (1, U) rows: in-kernel lane reductions
        ins += [w(jnp.transpose(v)) for _, v in params.query]
    ins += [w(w_big), w(b_big),
            w(_reorder_gifo(params.lstm2[0])),
            w(_reorder_gifo(_fold_forget_bias(params.lstm2[1])))]
    for wk, bk, wv, bv, wq, bq, wo, bo, wt, bt in params.hops:
        # K|V|Q fused into one (D, 3D) projection
        ins += [w(jnp.concatenate([wk, wv, wq], axis=1)),
                w(jnp.concatenate([bk, bv, bq], axis=1)),
                w(wo @ wt), w(bo @ wt + bt)]
    ins += [w(w_head), w(b_head)]

    spec["head_pad"] = head_pad

    # row-store buffers stay f32: Mosaic cannot prove dynamic single-row
    # stores tile-aligned for 16-sublane (bf16) tiles; bf16 mode narrows
    # only the weights/memories (the dominant VMEM + bandwidth term)
    out_shapes = [jax.ShapeDtypeStruct((B * S, cr + 1), jnp.float32)]
    ns = len(memory.keys)
    if mat_aligns and row_mode:
        out_shapes += [jax.ShapeDtypeStruct((ns * S, t_lens[0]),
                                            jnp.float32)]
    elif mat_aligns:
        out_shapes += [jax.ShapeDtypeStruct((S, T), jnp.float32)
                       for T in t_lens]
    scratch = []
    for _ in params.hops:
        # concatenated-block layout (S, B*D): row t holds every batch row's
        # step-t key/value at lane block b*D — what the batched hop matmuls
        # contract against (row_mode B=1 degenerates to (S, D))
        scratch += [pltpu.VMEM((S, B * D), jnp.float32),
                    pltpu.VMEM((S, B * D), jnp.float32)]

    vmem_bytes = sum(_nbytes(x.shape, x.dtype) for x in ins)
    vmem_bytes += sum(_nbytes(o.shape, o.dtype) for o in out_shapes)
    vmem_bytes += len(params.hops) * 2 * _nbytes((S, B * D), jnp.float32)
    vmem_limit = min(int(vmem_bytes * 1.3) + (4 << 20), 128 << 20)

    outs = pl.pallas_call(
        functools.partial(_kernel, spec),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(ins),
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in out_shapes),
        out_shape=tuple(out_shapes),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(*ins)

    out_rows = outs[0].astype(jnp.float32).reshape(B, S, cr + 1)
    if mat_aligns and row_mode:
        # unpack the single (ns*S, T) buffer: row t*ns + i = step t, source i
        a_all = outs[1].astype(jnp.float32).reshape(S, ns, t_lens[0])
        aligns = tuple(a_all[None, :, i, :] for i in range(ns))
    elif mat_aligns:
        aligns = tuple(a.astype(jnp.float32)[None] for a in outs[1:])
    else:
        aligns = tuple(jnp.zeros((B, S, T), jnp.float32) for T in t_lens)
    return out_rows[..., :cr], out_rows[..., cr], aligns
