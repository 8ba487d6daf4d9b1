"""Fused Pallas kernels for the TEACHER-FORCED training scan (fwd + bwd).

Why: the training step is weight-bandwidth bound and far from its roofline
(PERF.md round-2 analysis: <=15-22 % of even a conservative bound).  XLA
re-streams every decoder-trunk weight from HBM on each of the T scan
iterations, forward and again backward.  These kernels run the whole
teacher-forced RNN trunk — prenet -> attention LSTM -> additive
attention(s) -> projection -> two residual LSTMs (models/decoder.py
``_rnn_step``) — as ONE forward kernel and ONE backward kernel with all
trunk weights resident in VMEM across every step, wrapped in a
``jax.custom_vjp``.  The causal self-attention hops and output heads stay
in XLA: they are already parallel, MXU-shaped batched matmuls.

Memory plan: per-step activations needed by the backward pass are packed
into one lane-aligned row block and DMA'd to an HBM save buffer each
forward step (~tens of KB/step; HBM has GBs, VMEM does not).  The backward
kernel walks time in reverse, DMA-ing each step's block (and its
predecessor's, for the recurrent states) back into VMEM, and accumulates
weight/key/value gradients in VMEM output buffers.

Stochasticity: prenet dropout and zoneout masks are generated in-kernel
with the TPU PRNG, seeded per (seed, step) in a fixed order, so the
backward kernel REGENERATES the exact forward masks instead of saving
them.  The mask streams differ from the XLA path's threefry streams —
different but equally valid randomness; numerical parity with the XLA
path is therefore asserted with dropout/zoneout disabled
(tests/test_fused_train.py) and the stochastic pieces are tested
statistically and via gradient checks.

Reference provenance: the math is the reference decoder wrapper stack
(reference: modules/module.py:1017-1048 DualSourceAttentionRNN,
@tacotron2 DecoderRNNV1/V2, modules/rnn_wrappers.py prenet wrappers),
identical to models/decoder.py ``_rnn_step``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_decode import (_mm, _pos_col, _shift_col, _shift_mask,
                           _tap_masks, _taps_nat_mat, _win_build,
                           _win_gather, NEG_INF)

Array = jax.Array


class FusedTrainParams(NamedTuple):
    """Trunk weights, pre-shaped for the kernels (biases as (1, N) rows)."""

    prenet: Tuple[Tuple[Array, Array], ...]  # per layer (W (in,out), b)
    att_lstm: Tuple[Array, Array]            # (Zin, 4A), (1, 4A)
    query: Tuple[Tuple[Array, Array], ...]   # per source (Wq (A,U), v (U,1))
    outproj: Tuple[Array, Array]             # (A+sumC, D), (1, D)
    lstm1: Tuple[Array, Array]               # (2D, 4D), (1, 4D)
    lstm2: Tuple[Array, Array]


class TrainSpec(NamedTuple):
    """Hashable static configuration (nondiff argument of the custom_vjp)."""

    batch: int
    num_steps: int
    cf: int                       # feedback width (num_mels * n_feed_frame)
    num_sources: int
    t_mem: int                    # shared memory length T_in
    u_sizes: Tuple[int, ...]      # attention units per source
    c_sizes: Tuple[int, ...]      # value widths per source
    p_sizes: Tuple[int, ...]      # prenet layer widths
    p_dropout: Tuple[bool, ...]   # dropout-after flag per prenet layer
    #                               (MultiSpeakerPreNet's dense0 has none)
    use_spk: bool                 # add a (B, P0) speaker row after layer 0
    src_kinds: Tuple[int, ...]    # 0 additive | 1 location_sensitive |
    #                               2 forward, per source
    cumulative: Tuple[bool, ...]  # cumulative-weights conv input per source
    loc_kernel: int               # location conv taps K
    a_units: int                  # attention-RNN units A
    d_units: int                  # decoder-RNN units D
    drop_rate: float
    zc_att: float
    zo_att: float
    zc_dec: float
    zo_dec: float
    deterministic: bool           # True: no dropout, expectation zoneout
    compute_dtype: str            # float32 | bfloat16 weight/matmul storage
    interpret: bool
    dw_block: int = 1             # backward: batch weight-grad matmuls over
    #                               this many steps (contraction depth
    #                               dw_block*B instead of B — amortizes the
    #                               MXU K-dim and deletes per-step bias sums)
    save_align: bool = False      # materialize per-step source alignments in
    #                               the aux buffer for EVERY source (loc/fwd
    #                               sources already stream theirs for the
    #                               backward, so this is free there)
    ablate: Tuple[str, ...] = ()  # TIMING DIAGNOSIS ONLY — names of kernel
    #                               pieces to skip (results become WRONG).
    #                               Used by scripts/ablate_probe.py to budget
    #                               the location/forward attention cost:
    #                               fwd_win fwd_rec bwd_win bwd_loc_mm
    #                               bwd_rec bwd_dwin bwd_dloc


def _pad128(n: int) -> int:
    return ((n + 127) // 128) * 128


def _save_layout(spec: TrainSpec):
    """(name, width) fields of the per-step save row, each lane-aligned."""
    fields = []
    for i, p in enumerate(spec.p_sizes):
        fields.append((f"p{i}", p))
    A, D = spec.a_units, spec.d_units
    fields += [("gates_att", 4 * A), ("c_att", A), ("h_att", A),
               ("ctx", sum(spec.c_sizes)), ("proj", D),
               ("gates1", 4 * D), ("c1", D), ("h1", D),
               ("gates2", 4 * D), ("c2", D), ("h2", D)]
    offsets = {}
    off = 0
    for name, w in fields:
        offsets[name] = (off, w)
        off += _pad128(w)
    return offsets, off


def _dw_stash_layout(spec: TrainSpec):
    """Column layouts of the backward's two dW stash buffers.

    Per step the backward stashes the LEFT operands (activations) and RIGHT
    operands (cotangents) of every B-row weight-gradient matmul; every
    ``dw_block`` steps ONE matmul per pair contracts the whole stash.  The
    query pair reuses ``zop``'s first A columns (h_att), so it needs no
    left field of its own.

    The prenet backward is DEFERRED to the flush (round 5): the serial loop
    stashes only the combined dropout*relu' masks (``mr{i}``) and the
    hidden-layer inputs (``pin{i}``, i>0); the flush recovers the prenet
    input cotangents from the stashed ``d_gatt`` at M = dw_block*B — the
    per-step prenet input-gradient matmuls and the x-row stash leave the
    serial chain (layer-0 inputs DMA straight into a dedicated teacher
    stash).  Returns (offsets_L, width_L, offsets_R, width_R).
    """
    A, D = spec.a_units, spec.d_units
    sumC, sumU = sum(spec.c_sizes), sum(spec.u_sizes)
    P_last = spec.p_sizes[-1]
    l_fields = [("z_att", P_last + sumC + A), ("z1", 2 * D), ("z2", 2 * D),
                ("zop", A + sumC)]
    r_fields = [("d_gatt", 4 * A), ("d_g1", 4 * D), ("d_g2", 4 * D),
                ("d_proj", D), ("d_pq", sumU)]
    for i, p in enumerate(spec.p_sizes):
        if i > 0:
            l_fields.append((f"pin{i}", spec.p_sizes[i - 1]))
        l_fields.append((f"mr{i}", p))

    def lay(fields):
        offsets, off = {}, 0
        for name, w in fields:
            offsets[name] = (off, w)
            off += _pad128(w)
        return offsets, off

    off_l, w_l = lay(l_fields)
    off_r, w_r = lay(r_fields)
    return off_l, w_l, off_r, w_r


def _aux_lanes(spec: TrainSpec):
    """Lane map of the per-step aux rows: location/forward sources hold
    [alignment w_col, conv input] pairs plus their K conv-window lanes
    (so the backward reads the windows back instead of re-running K
    rolls+masks+concat per step); with ``save_align`` every additive
    source appends a w_col lane too.  All lanes are assigned contiguously
    from 0 so the forward can emit them as ONE wide store per step
    (separate per-lane column stores are ~1 us read-modify-writes).
    Returns (lane_w, lane_cv, lane_win, n_lanes)."""
    lane_w, lane_cv, lane_win = {}, {}, {}
    nxt = 0
    for si, k in enumerate(spec.src_kinds):
        if k != 0:
            lane_w[si] = nxt
            lane_cv[si] = nxt + 1
            nxt += 2
    if spec.save_align:
        for si, k in enumerate(spec.src_kinds):
            if k == 0:
                lane_w[si] = nxt
                nxt += 1
    for si, k in enumerate(spec.src_kinds):
        if k != 0 and nxt + spec.loc_kernel <= AUX_W:
            lane_win[si] = nxt
            nxt += spec.loc_kernel
    return lane_w, lane_cv, lane_win, nxt


def _dw_block_for(batch: int, num_steps: int) -> int:
    """Contraction-depth target ~256 rows: full MXU K-tiles with one level
    of pipelining, without outsized stash buffers."""
    return max(1, min(256 // max(batch, 1), num_steps))


VMEM_LIMIT_BYTES = 100 << 20   # compiler limit passed to both pallas_calls


def estimate_vmem_bytes(*, batch: int, num_steps: int, t_mem: int, cf: int,
                        u_sizes, c_sizes, p_sizes, a_units: int,
                        d_units: int, compute_dtype: str = "float32") -> int:
    """Conservative VMEM residency estimate for the larger (backward) kernel.

    Mirrors the buffer lists of ``_bwd_call``: memory operands, weights,
    save-row scratch, gradient accumulators, plus a temporaries allowance
    for the in-step (B*T, B) block-softmax matrices.  Callers gate on this
    against ``VMEM_LIMIT_BYTES`` so oversized configurations fall back to
    the XLA scan with a logged reason instead of failing at compile time."""
    B, S, T = batch, num_steps, t_mem
    dt = jnp.dtype(compute_dtype).itemsize
    cfp = _pad128(cf)
    up = [_pad128(u) for u in u_sizes]
    cp = [_pad128(c) for c in c_sizes]
    sumU, sumC = sum(up), sum(cp)
    A, D = a_units, d_units
    p_last = p_sizes[-1]

    spec = TrainSpec(batch=B, num_steps=S, cf=cfp, num_sources=len(up),
                     t_mem=T, u_sizes=tuple(up), c_sizes=tuple(cp),
                     p_sizes=tuple(p_sizes),
                     p_dropout=(True,) * len(p_sizes), use_spk=False,
                     src_kinds=(0,) * len(up), cumulative=(False,) * len(up),
                     loc_kernel=31, a_units=A, d_units=D,
                     drop_rate=0.0, zc_att=0.0, zo_att=0.0, zc_dec=0.0,
                     zo_dec=0.0, deterministic=True,
                     compute_dtype=compute_dtype, interpret=False)
    _, w_save = _save_layout(spec)

    mem = sum(B * T * (u + c + 1 + B) * 4 for u, c in zip(up, cp))
    mem += sum(B * T * (u + c) * (dt - 4) for u, c in zip(up, cp))  # cdt k/v
    w_elems = cfp * p_sizes[0]
    for i in range(1, len(p_sizes)):
        w_elems += p_sizes[i - 1] * p_sizes[i]
    w_elems += (p_last + sumC + A) * 4 * A + A * sumU + sumU
    w_elems += (A + sumC) * D + 2 * (2 * D * 4 * D)
    w_elems += 4 * A + D + 8 * D + sum(p_sizes)          # biases
    weights = w_elems * dt
    grads = w_elems * 4 + sum(B * T * (u + c) * 4 for u, c in zip(up, cp))
    bwd = (mem + weights + grads
           + S * B * D * 4                                # g_y input
           + 3 * B * w_save * 4)                          # rows3
    temps = B * T * (max(up) + max(cp) + 2 * B + 8) * 4   # softmax matrices
    _, w_l, _, w_r = _dw_stash_layout(spec)
    kb = _dw_block_for(B, S)
    stash = kb * B * (w_l + w_r + cfp) * dt  # dW stashes + teacher x_stash
    return bwd + temps + stash

def _seed_step(seed_ref, t):
    # distinct, deterministic stream per step; fwd and bwd call this with
    # identical arguments so the masks regenerate exactly
    pltpu.prng_seed(seed_ref[0] + t * jnp.int32(-1640531527))


def _unit_uniform(shape):
    """uint32 bits -> [0, 1) floats."""
    bits = pltpu.prng_random_bits(shape)
    return bits.astype(jnp.float32) * jnp.float32(2.3283064365386963e-10)


def _dropout_mask(shape, rate: float):
    """flax nn.Dropout semantics: keep with prob 1-rate, scale kept by
    1/(1-rate).  Returns the multiplicative mask."""
    keep = (_unit_uniform(shape) >= jnp.float32(rate)).astype(jnp.float32)
    return keep * jnp.float32(1.0 / (1.0 - rate))


def _zoneout_keep(shape, factor: float):
    """ops/rnn.py ZoneoutLSTMCell training semantics: keep NEW with prob
    1-factor (keep==1 -> new value, keep==0 -> previous value)."""
    return (_unit_uniform(shape) >= jnp.float32(factor)).astype(jnp.float32)


def _step_masks(spec: TrainSpec, seed_ref, t):
    """All of one step's masks, in a FIXED generation order."""
    B, A, D = spec.batch, spec.a_units, spec.d_units
    stochastic = (spec.drop_rate > 0 or spec.zc_att > 0 or spec.zo_att > 0
                  or spec.zc_dec > 0 or spec.zo_dec > 0)
    if spec.deterministic or not stochastic:
        return None
    _seed_step(seed_ref, t)
    m = {}
    for i, p in enumerate(spec.p_sizes):
        m[f"p{i}"] = (_dropout_mask((B, p), spec.drop_rate)
                      if spec.drop_rate > 0 and spec.p_dropout[i] else None)
    m["zc_att"] = (_zoneout_keep((B, A), spec.zc_att)
                   if spec.zc_att > 0 else None)
    m["zo_att"] = (_zoneout_keep((B, A), spec.zo_att)
                   if spec.zo_att > 0 else None)
    for l in ("1", "2"):
        m[f"zc{l}"] = (_zoneout_keep((B, D), spec.zc_dec)
                       if spec.zc_dec > 0 else None)
        m[f"zo{l}"] = (_zoneout_keep((B, D), spec.zo_dec)
                       if spec.zo_dec > 0 else None)
    return m


def _apply_zoneout(new, prev, keep_mask, factor: float, deterministic: bool):
    if factor <= 0.0:
        return new
    if deterministic:
        return (1.0 - factor) * new + factor * prev
    return keep_mask * new + (1.0 - keep_mask) * prev


def _lstm_fwd(z, w_ref, b_ref):
    """Gate pre-activations + raw cell/hidden (zoneout applied by caller)."""
    gates = _mm(z, w_ref[...]) + b_ref[...].astype(jnp.float32)
    return gates


def _lstm_raw(gates, c_prev):
    a = gates.shape[1] // 4
    i, g = gates[:, :a], gates[:, a:2 * a]
    f, o = gates[:, 2 * a:3 * a], gates[:, 3 * a:]
    c_raw = c_prev * jax.nn.sigmoid(f + 1.0) \
        + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_raw = jnp.tanh(c_raw) * jax.nn.sigmoid(o)
    return c_raw, h_raw


def _mm_tA(a: Array, b: Array) -> Array:
    """a^T @ b: (B, M)x(B, N) -> (M, N) — weight-gradient accumulation."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _bcast(x, T: int):
    """Per-utterance broadcast (B, N) -> (B*T, N) on b-major flattened rows
    as a sublane broadcast+reshape — replaces the MXU-hostile K=B indicator
    matmul ``_mm(ind, x)`` with pure data movement.  (``pltpu.repeat``
    TILES [a,b,a,b]; block layout needs consecutive repeats [a,a,b,b].)"""
    B, N = x.shape
    return jnp.broadcast_to(x[:, None, :], (B, T, N)).reshape(B * T, N)


def _block_softmax_col(e_col, ind, T: int):
    """Per-UTTERANCE softmax over block rows.

    ``e_col`` is the (B*T, 1) masked energy column (NEG_INF at invalid
    positions); ``ind`` the (B*T, B) block-indicator.  Each utterance is
    shifted by its OWN max: a single global shift would underflow an entire
    row's exps to zero (sum 0 -> NaN) whenever one batch row's max energy
    sits ~88 below the global max — reachable once ||v||_1 exceeds ~44
    during training, since additive energies span +-||v||_1."""
    em = jnp.where(ind > 0.5, e_col, NEG_INF)
    maxes = jnp.max(em, axis=0, keepdims=True)                # (1, B)
    # exp of the blocked matrix is zero outside each block, so the lane
    # reduction recovers the per-row shifted exp without any transpose
    ex = jnp.sum(jnp.exp(em - maxes), axis=1, keepdims=True)  # (B*T, 1)
    sums = _mm_tA(ind, ex)                                    # (B, 1)
    return ex * _bcast(1.0 / sums, T)


def _mm_tB(a: Array, w: Array) -> Array:
    """a @ w^T: (B, N)x(M, N) -> (B, M) — input-gradient matmuls
    (f32 accumulation; ``a`` is cast to ``w``'s storage dtype)."""
    return jax.lax.dot_general(
        a.astype(w.dtype), w, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


# ============================================================= forward kernel

def _fwd_kernel(spec: TrainSpec, layout, *refs):
    offsets, w_save = layout
    B, T, S = spec.batch, spec.t_mem, spec.num_steps
    A, D = spec.a_units, spec.d_units
    ns = spec.num_sources
    sumC = sum(spec.c_sizes)
    f32 = jnp.float32
    kinds = spec.src_kinds
    n_loc = sum(1 for k in kinds if k != 0)
    lane_w, lane_cv, lane_win, n_aux = _aux_lanes(spec)

    it = iter(refs)
    mem = [(next(it), next(it), next(it), next(it)) for _ in range(ns)]
    seed_ref = next(it)
    teacher_hbm = next(it)                       # (S*B, cf) in HBM
    spk = next(it)                               # (B, P0) speaker row
    loc_ws = [next(it) if k != 0 else None for k in kinds]  # (K, U_i)
    prenet = [(next(it), next(it)) for _ in spec.p_sizes]
    att_lstm = (next(it), next(it))
    query_all = next(it)
    vs = [next(it) for _ in range(ns)]
    outproj = (next(it), next(it))
    lstm1 = (next(it), next(it))
    lstm2 = (next(it), next(it))
    y_out = next(it)                             # (S*B, D) VMEM output
    save_hbm = next(it)                          # (S*B, w_save) HBM output
    aux_hbm = next(it) if n_aux else None        # (S*B*T, aux_w) HBM output:
    #                                              per-step [alpha | conv-in]
    #                                              columns per loc source
    #                                              (+ alignment lanes when
    #                                              save_align)
    x_scr = next(it)                             # (B, cf) VMEM scratch
    save_scr = next(it)                          # (2*B, w_save) VMEM scratch,
    #                                              double-buffered save slots
    aux_scr = next(it) if n_aux else None        # (2*B*T, aux_w)
    sem_in = next(it)
    sem_out = next(it)                           # DMA sems, one per slot
    sem_aux = next(it) if n_aux else None
    assert next(it, None) is None

    BT = B * T
    pos = _pos_col(B, T) if n_loc else None
    # loop-invariant location-conv tap-mask matrix (one batched multiply
    # per window build instead of K column multiplies)
    taps_nat = (_taps_nat_mat(_tap_masks(pos, spec.loc_kernel, T))
                if n_loc else None)
    m_sh1 = (_shift_mask(pos, -1, T) if any(k == 2 for k in kinds)
             else None)

    def _save_dma(t, slot_rows):
        return pltpu.make_async_copy(
            save_scr.at[pl.ds(slot_rows, B), :],
            save_hbm.at[pl.ds(t * B, B), :], sem_out.at[t % 2])

    def _aux_dma(t, slot_rows):
        return pltpu.make_async_copy(
            aux_scr.at[pl.ds(slot_rows, BT), :],
            aux_hbm.at[pl.ds(t * BT, BT), :], sem_aux.at[t % 2])

    def body(t, carry):
        c_att, h_att, c1, h1, c2, h2, prev_ctx, cv_st, alpha_st = carry
        slot_rows = (t % 2) * B

        # the DMA that used this save slot (step t-2) must have drained
        # before we overwrite it; its copy runs overlapped with step t-1
        @pl.when(t >= 2)
        def _():
            _save_dma(t - 2, slot_rows).wait()
            if n_aux:
                _aux_dma(t - 2, (t % 2) * BT).wait()

        def put(name, value):
            off, w = offsets[name]
            save_scr[pl.ds(slot_rows, B), off:off + w] = \
                value.astype(save_scr.dtype)

        # aux lanes are COLLECTED during the source loop and emitted as
        # ONE contiguous wide store per step — separate per-lane column
        # stores are ~1 us read-modify-write passes each (measured,
        # scripts/colop_probe.py)
        aux_parts: dict = {}

        def put_aux(lane, value):
            aux_parts[lane] = value.astype(f32)

        def flush_aux():
            if not aux_parts:
                return
            lanes = sorted(aux_parts)
            vals, w = [], 0
            for ln in lanes:
                assert ln == lanes[0] + w, "aux lanes must be contiguous"
                v = aux_parts[ln]
                vals.append(v)
                w += v.shape[1]
            row = vals[0] if len(vals) == 1 else jnp.concatenate(vals, 1)
            aux_scr[pl.ds((t % 2) * BT, BT), lanes[0]:lanes[0] + w] = row

        # teacher input for this step: HBM -> VMEM
        cp_in = pltpu.make_async_copy(
            teacher_hbm.at[pl.ds(t * B, B), :], x_scr, sem_in)
        cp_in.start()
        masks = _step_masks(spec, seed_ref, t)
        cp_in.wait()
        x = x_scr[...].astype(f32)

        # prenet stack (Dense -> ReLU -> dropout), acts saved pre-dropout;
        # with speaker conditioning layer 0 is MultiSpeakerPreNet's dense0:
        # no dropout, and the softsign speaker row adds after its ReLU
        p = x
        for i, (w, b) in enumerate(prenet):
            a_act = jax.nn.relu(_mm(p, w[...]) + b[...].astype(f32))
            put(f"p{i}", a_act)
            if (spec.drop_rate > 0 and not spec.deterministic
                    and spec.p_dropout[i]):
                p = a_act * masks[f"p{i}"]
            else:
                p = a_act
            if spec.use_spk and i == 0:
                p = p + spk[...].astype(f32)

        # attention LSTM over [prenet, prev_context]
        z_att = jnp.concatenate([p, prev_ctx, h_att], axis=1)
        gates_att = _lstm_fwd(z_att, att_lstm[0], att_lstm[1])
        c_raw, h_raw = _lstm_raw(gates_att, c_att)
        c_att_new = _apply_zoneout(c_raw, c_att,
                                   None if masks is None else masks["zc_att"],
                                   spec.zc_att, spec.deterministic)
        h_att_new = _apply_zoneout(h_raw, h_att,
                                   None if masks is None else masks["zo_att"],
                                   spec.zo_att, spec.deterministic)
        put("gates_att", gates_att)
        put("c_att", c_att_new)
        put("h_att", h_att_new)

        # attention per source (batched indicator form, identical math to
        # the inference kernel's B>1 path).  Location-based sources add the
        # conv*location-dense matmul; forward sources run the forward
        # recursion (reference: modules/forward_attention.py:105-122) with
        # u fixed at its 0.5 init (transition agent gated out)
        pq_all = _mm(h_att_new, query_all[...])
        ctxs = []
        new_cv, new_alpha = list(cv_st), list(alpha_st)
        u_off = 0
        for si_, ((keys_ref, values_ref, mask_ref, ind_ref), v_ref, u) in \
                enumerate(zip(mem, vs, spec.u_sizes)):
            kind = kinds[si_]
            ind = ind_ref[...].astype(f32)
            pq = _bcast(pq_all[:, u_off:u_off + u], T)
            u_off += u
            pre = keys_ref[...].astype(f32) + pq
            if kind != 0 and "fwd_win" not in spec.ablate:
                cv = cv_st[si_]
                win = _win_build(cv, spec.loc_kernel, taps_nat)
                if si_ in lane_win:
                    put_aux(lane_win[si_], win)   # all K lanes at once
                pre = pre + _mm(win, loc_ws[si_][...])
            e = jnp.tanh(pre)
            # v rides as a (1, U) row: the energy column is a lane
            # reduction, not an N=1 matmul
            e_col = jnp.sum(e * v_ref[...].astype(f32), axis=1,
                            keepdims=True)
            e_col = jnp.where(mask_ref[...] > 0.5, e_col, NEG_INF)
            a_col = _block_softmax_col(e_col, ind, T)
            if kind == 2 and "fwd_rec" not in spec.ablate:
                ap = alpha_st[si_]
                sh = _shift_col(ap, -1) * m_sh1
                z = (0.5 * ap + 0.5 * sh + 1e-7) * a_col
                w_col = z * _bcast(1.0 / _mm_tA(ind, z), T)
            else:
                w_col = a_col
            ctxs.append(_mm_tA(ind, w_col * values_ref[...].astype(f32)))
            if kind != 0:
                put_aux(lane_w[si_], w_col)
                put_aux(lane_cv[si_], cv_st[si_])
                new_cv[si_] = (a_col + cv_st[si_]
                               if spec.cumulative[si_] else a_col)
                new_alpha[si_] = w_col
            elif spec.save_align:
                put_aux(lane_w[si_], w_col)
        flush_aux()
        ctx = jnp.concatenate(ctxs, axis=1) if ns > 1 else ctxs[0]
        put("ctx", ctx)

        # projection + two residual LSTMs
        proj = _mm(jnp.concatenate([h_att_new, ctx], axis=1),
                   outproj[0][...]) + outproj[1][...].astype(f32)
        put("proj", proj)
        gates1 = _lstm_fwd(jnp.concatenate([proj, h1], axis=1),
                           lstm1[0], lstm1[1])
        c1_raw, h1_raw = _lstm_raw(gates1, c1)
        c1_new = _apply_zoneout(c1_raw, c1,
                                None if masks is None else masks["zc1"],
                                spec.zc_dec, spec.deterministic)
        h1_new = _apply_zoneout(h1_raw, h1,
                                None if masks is None else masks["zo1"],
                                spec.zo_dec, spec.deterministic)
        put("gates1", gates1)
        put("c1", c1_new)
        put("h1", h1_new)
        o1 = proj + h1_new
        gates2 = _lstm_fwd(jnp.concatenate([o1, h2], axis=1),
                           lstm2[0], lstm2[1])
        c2_raw, h2_raw = _lstm_raw(gates2, c2)
        c2_new = _apply_zoneout(c2_raw, c2,
                                None if masks is None else masks["zc2"],
                                spec.zc_dec, spec.deterministic)
        h2_new = _apply_zoneout(h2_raw, h2,
                                None if masks is None else masks["zo2"],
                                spec.zo_dec, spec.deterministic)
        put("gates2", gates2)
        put("c2", c2_new)
        put("h2", h2_new)
        y = o1 + h2_new

        y_out[pl.ds(t * B, B), :] = y.astype(y_out.dtype)
        # fire-and-continue: the copy overlaps the next step's compute
        _save_dma(t, slot_rows).start()
        if n_aux:
            _aux_dma(t, (t % 2) * BT).start()
        return (c_att_new, h_att_new, c1_new, h1_new, c2_new, h2_new, ctx,
                tuple(new_cv), tuple(new_alpha))

    zeros = lambda n: jnp.zeros((B, n), f32)
    # conv input starts zero; forward-source alpha starts [1, 0, ...] per
    # utterance block (reference: forward_attention.py initial state)
    cv0 = tuple(jnp.zeros((B * T, 1), f32) if k != 0 else jnp.zeros((1, 1), f32)
                for k in kinds)
    alpha0 = tuple(
        (_pos_col(B, T) == 0).astype(f32) if k == 2
        else jnp.zeros((B * T, 1), f32) if k != 0
        else jnp.zeros((1, 1), f32)
        for k in kinds)
    carry0 = (zeros(A), zeros(A), zeros(D), zeros(D), zeros(D), zeros(D),
              zeros(sumC), cv0, alpha0)
    jax.lax.fori_loop(0, S, body, carry0)
    # drain the last (up to two) in-flight save copies before kernel exit
    for t in range(max(S - 2, 0), S):
        _save_dma(t, (t % 2) * B).wait()
        if n_aux:
            _aux_dma(t, (t % 2) * BT).wait()


# ============================================================ backward kernel

def _lstm_bwd(gates, c_prev, d_h_total, d_c_total, m_zc, m_zo,
              zc: float, zo: float, deterministic: bool):
    """Exact VJP of one ZoneoutLSTMCell step (ops/rnn.py:49-76).

    Returns (d_gates_pre, d_c_prev, d_h_prev) — d_h_prev only from the
    zoneout passthrough; the contribution through z=[x, h_prev] is added by
    the caller after the d_gates matmul."""
    a = gates.shape[1] // 4
    i, g = gates[:, :a], gates[:, a:2 * a]
    f, o = gates[:, 2 * a:3 * a], gates[:, 3 * a:]
    si, tg = jax.nn.sigmoid(i), jnp.tanh(g)
    sf, so = jax.nn.sigmoid(f + 1.0), jax.nn.sigmoid(o)
    c_raw = c_prev * sf + si * tg
    tc = jnp.tanh(c_raw)

    if zo > 0.0:
        if deterministic:
            d_h_raw = d_h_total * (1.0 - zo)
            d_h_prev = d_h_total * zo
        else:
            d_h_raw = d_h_total * m_zo
            d_h_prev = d_h_total * (1.0 - m_zo)
    else:
        d_h_raw, d_h_prev = d_h_total, jnp.zeros_like(d_h_total)

    d_c_from_h = d_h_raw * so * (1.0 - tc * tc)
    d_o_pre = d_h_raw * tc * so * (1.0 - so)

    if zc > 0.0:
        if deterministic:
            d_c_raw = d_c_total * (1.0 - zc) + d_c_from_h
            d_c_prev = d_c_total * zc
        else:
            d_c_raw = d_c_total * m_zc + d_c_from_h
            d_c_prev = d_c_total * (1.0 - m_zc)
    else:
        d_c_raw = d_c_total + d_c_from_h
        d_c_prev = jnp.zeros_like(d_c_total)

    d_c_prev = d_c_prev + d_c_raw * sf
    d_f_pre = d_c_raw * c_prev * sf * (1.0 - sf)
    d_i_pre = d_c_raw * tg * si * (1.0 - si)
    d_g_pre = d_c_raw * si * (1.0 - tg * tg)
    d_gates = jnp.concatenate([d_i_pre, d_g_pre, d_f_pre, d_o_pre], axis=1)
    return d_gates, d_c_prev, d_h_prev


def _bwd_kernel(spec: TrainSpec, layout, *refs):
    offsets, w_save = layout
    cdt = jnp.dtype(spec.compute_dtype)
    B, T, S = spec.batch, spec.t_mem, spec.num_steps
    A, D = spec.a_units, spec.d_units
    ns = spec.num_sources
    sumC = sum(spec.c_sizes)
    P_last = spec.p_sizes[-1]
    n_pre = len(spec.p_sizes)
    f32 = jnp.float32
    det = spec.deterministic
    kinds = spec.src_kinds
    n_loc = sum(1 for k in kinds if k != 0)
    lane_w, lane_cv, lane_win, _ = _aux_lanes(spec)
    BT = B * T

    it = iter(refs)
    mem = [(next(it), next(it), next(it), next(it)) for _ in range(ns)]
    seed_ref = next(it)
    teacher_hbm = next(it)
    spk = next(it)
    loc_ws = [next(it) if k != 0 else None for k in kinds]
    prenet = [(next(it), next(it)) for _ in spec.p_sizes]
    att_lstm = (next(it), next(it))
    query_all = next(it)
    vs = [next(it) for _ in range(ns)]
    outproj = (next(it), next(it))
    lstm1 = (next(it), next(it))
    lstm2 = (next(it), next(it))
    g_y = next(it)                                # (S*B, D) VMEM input
    save_hbm = next(it)                           # (S*B, w_save) HBM input
    aux_hbm = next(it) if n_loc else None         # (S*B*T, aux_w) HBM input
    # gradient outputs (VMEM accumulators)
    d_prenet = [(next(it), next(it)) for _ in spec.p_sizes]
    d_att = (next(it), next(it))
    d_query_all = next(it)
    d_vs = [next(it) for _ in range(ns)]
    d_outproj = (next(it), next(it))
    d_lstm1 = (next(it), next(it))
    d_lstm2 = (next(it), next(it))
    d_keys_out = [next(it) for _ in range(ns)]    # (B*T, U_i)
    d_values_out = [next(it) for _ in range(ns)]  # (B*T, C_i)
    d_spk_out = next(it)                          # (B, P0)
    d_loc_out = [next(it) if k != 0 else None for k in kinds]  # (K, U_i)
    x_stash = next(it)                            # (dw_block*B, cf) teacher
    #       rows of the current flush window (deferred prenet dW0 operand)
    rows3 = next(it)                              # (3*B, w_save) VMEM: three
    #       rotating save-row slots — each saved row is consumed twice (as
    #       step t, then as step t+1's predecessor), so steady state needs
    #       ONE new DMA per step, prefetched a full step ahead
    aux3 = next(it) if n_loc else None            # (3*B*T, aux_w), same
    #                                               rotation for the
    #                                               alignment/conv-in columns
    stash_l = next(it)                            # (dw_block*B, W_L) cdt
    stash_r = next(it)                            # (dw_block*B, W_R) cdt
    sem_x = next(it)
    sem_rows = next(it)                           # DMA sems, one per slot
    sem_aux3 = next(it) if n_loc else None
    assert next(it, None) is None

    kblk = spec.dw_block
    off_l, _, off_r, _ = _dw_stash_layout(spec)

    pos = _pos_col(B, T) if n_loc else None
    # loop-invariant location-conv tap-mask matrix (see _fwd_kernel)
    taps_nat = (_taps_nat_mat(_tap_masks(pos, spec.loc_kernel, T))
                if n_loc else None)
    m_sh1 = (_shift_mask(pos, -1, T) if any(k == 2 for k in kinds)
             else None)
    onehot0 = (pos == 0).astype(f32) if n_loc else None

    def _row_dma(row_idx, slot):
        return pltpu.make_async_copy(
            save_hbm.at[pl.ds(row_idx * B, B), :],
            rows3.at[pl.ds(slot * B, B), :], sem_rows.at[slot])

    def _aux3_dma(row_idx, slot):
        return pltpu.make_async_copy(
            aux_hbm.at[pl.ds(row_idx * BT, BT), :],
            aux3.at[pl.ds(slot * BT, BT), :], sem_aux3.at[slot])

    for w_ref, b_ref in (*d_prenet, d_att, d_outproj, d_lstm1, d_lstm2):
        w_ref[...] = jnp.zeros_like(w_ref)
        b_ref[...] = jnp.zeros_like(b_ref)
    d_query_all[...] = jnp.zeros_like(d_query_all)
    for r in (*d_vs, *d_keys_out, *d_values_out, d_spk_out):
        r[...] = jnp.zeros_like(r)
    for r in d_loc_out:
        if r is not None:
            r[...] = jnp.zeros_like(r)
    if S % kblk:
        # a partial final stash window reads rows the last full window (or
        # nothing, when S < kblk) wrote — keep stale cotangent rows zero so
        # they contribute nothing to the flush matmuls
        stash_r[...] = jnp.zeros_like(stash_r)

    def get(row, name):
        off, w = offsets[name]
        return row[:, off:off + w]

    def mm_dw(a, b):
        # weight-gradient accumulation matmul in the storage dtype: on the
        # MXU a bf16xbf16 (f32-accumulate) pass costs ~1/3 of f32xf32
        return _mm_tA(a.astype(cdt), b.astype(cdt))

    # prologue: fetch the last step's row (and its predecessor) so the
    # steady-state loop only prefetches one row per iteration
    _row_dma(S - 1, 0).start()
    if S >= 2:
        _row_dma(S - 2, 1).start()
    if n_loc:
        _aux3_dma(S - 1, 0).start()
        if S >= 2:
            _aux3_dma(S - 2, 1).start()
        _aux3_dma(S - 1, 0).wait()
    _row_dma(S - 1, 0).wait()

    def body(k, carry):
        t = S - 1 - k
        (d_c_att, d_h_att_c, d_c1, d_h1_c, d_c2, d_h2_c, d_ctx_c,
         dA_st, dCV_st) = carry

        srow = (k % kblk) * B
        # the layer-0 prenet input (teacher row) DMAs STRAIGHT into its
        # flush-window stash slot — the serial loop never touches it (the
        # prenet backward is deferred to the flush); the flush waits on
        # the window's copies
        cp_x = pltpu.make_async_copy(
            teacher_hbm.at[pl.ds(t * B, B), :],
            x_stash.at[pl.ds(srow, B), :], sem_x.at[k % kblk])
        cp_x.start()

        # prefetch step t-2's row into the slot step t+1 vacated; it is
        # consumed one full iteration later (as step t-1's predecessor)
        @pl.when(t >= 2)
        def _():
            _row_dma(t - 2, (k + 2) % 3).start()
            if n_loc:
                _aux3_dma(t - 2, (k + 2) % 3).start()
        masks = _step_masks(spec, seed_ref, t)
        # row t-1 (started one iteration ago, or in the prologue)
        @pl.when(t >= 1)
        def _():
            _row_dma(t - 1, (k + 1) % 3).wait()
            if n_loc:
                _aux3_dma(t - 1, (k + 1) % 3).wait()

        first = (t == 0)
        rt = rows3[pl.ds((k % 3) * B, B), :].astype(f32)
        rp_raw = rows3[pl.ds(((k + 1) % 3) * B, B), :]
        rp = jnp.where(first, jnp.zeros_like(rp_raw), rp_raw).astype(f32)
        g = g_y[pl.ds(t * B, B), :].astype(f32)

        def put_l(name, value):
            o, w = off_l[name]
            stash_l[pl.ds(srow, B), o:o + w] = value.astype(stash_l.dtype)

        def put_r(name, value):
            o, w = off_r[name]
            stash_r[pl.ds(srow, B), o:o + w] = value.astype(stash_r.dtype)

        h_att_t = get(rt, "h_att")
        ctx_t = get(rt, "ctx")
        proj_t = get(rt, "proj")
        h1_t = get(rt, "h1")
        gates_att = get(rt, "gates_att")
        gates1 = get(rt, "gates1")
        gates2 = get(rt, "gates2")
        c_att_prev = get(rp, "c_att")
        h_att_prev = get(rp, "h_att")
        c1_prev, h1_prev = get(rp, "c1"), get(rp, "h1")
        c2_prev, h2_prev = get(rp, "c2"), get(rp, "h2")
        ctx_prev = get(rp, "ctx")

        # ---- y = o1 + h2 ; lstm2 over z2 = [o1, h2_prev]
        o1_t = proj_t + h1_t
        d_o1 = g
        d_h2_total = g + d_h2_c
        d_gates2, d_c2_prev, d_h2_prev = _lstm_bwd(
            gates2, c2_prev, d_h2_total, d_c2,
            None if det or spec.zc_dec == 0 else masks["zc2"],
            None if det or spec.zo_dec == 0 else masks["zo2"],
            spec.zc_dec, spec.zo_dec, det)
        put_l("z2", jnp.concatenate([o1_t, h2_prev], axis=1))
        put_r("d_g2", d_gates2)
        d_z2 = _mm_tB(d_gates2, lstm2[0][...])
        d_o1 = d_o1 + d_z2[:, :D]
        new_d_h2 = d_h2_prev + d_z2[:, D:]
        new_d_c2 = d_c2_prev

        # ---- o1 = proj + h1 ; lstm1 over z1 = [proj, h1_prev]
        d_proj = d_o1
        d_h1_total = d_o1 + d_h1_c
        d_gates1, d_c1_prev, d_h1_prev = _lstm_bwd(
            gates1, c1_prev, d_h1_total, d_c1,
            None if det or spec.zc_dec == 0 else masks["zc1"],
            None if det or spec.zo_dec == 0 else masks["zo1"],
            spec.zc_dec, spec.zo_dec, det)
        put_l("z1", jnp.concatenate([proj_t, h1_prev], axis=1))
        put_r("d_g1", d_gates1)
        d_z1 = _mm_tB(d_gates1, lstm1[0][...])
        d_proj = d_proj + d_z1[:, :D]
        new_d_h1 = d_h1_prev + d_z1[:, D:]
        new_d_c1 = d_c1_prev

        # ---- proj = [h_att, ctx] @ Wop + bop
        put_l("zop", jnp.concatenate([h_att_t, ctx_t], axis=1))
        put_r("d_proj", d_proj)
        d_zop = _mm_tB(d_proj, outproj[0][...])
        d_h_att = d_zop[:, :A]
        d_ctx_total = d_zop[:, A:] + d_ctx_c

        # ---- attention backward (recompute e and a per source); location
        # sources restore their conv input (and forward sources the alpha
        # recursion chain) from the aux save rows
        if n_loc:
            aux_t = aux3[pl.ds((k % 3) * BT, BT), :].astype(f32)
            # the predecessor row is only consumed one LANE at a time (the
            # forward-source alpha); slice before the t=0 select so the
            # where runs on a (B*T, 1) column, not the full 128-lane row
            aux_p_raw = aux3[pl.ds(((k + 1) % 3) * BT, BT), :]
        pq_all = _mm(h_att_t, query_all[...])
        d_pq_parts = []
        new_dA, new_dCV = list(dA_st), list(dCV_st)
        u_off = 0
        c_off = 0
        for si_, ((keys_ref, values_ref, mask_ref, ind_ref), v_ref) in \
                enumerate(zip(mem, vs)):
            kind = kinds[si_]
            u = spec.u_sizes[si_]
            c = spec.c_sizes[si_]
            ind = ind_ref[...].astype(f32)
            values = values_ref[...].astype(f32)
            pq = _bcast(pq_all[:, u_off:u_off + u], T)
            pre = keys_ref[...].astype(f32) + pq
            if kind != 0:
                if "bwd_win" in spec.ablate:
                    win = jnp.zeros((BT, spec.loc_kernel), f32)
                elif si_ in lane_win:
                    lw0 = lane_win[si_]
                    win = aux_t[:, lw0:lw0 + spec.loc_kernel]
                else:
                    lane_c = lane_cv[si_]
                    win = _win_build(aux_t[:, lane_c:lane_c + 1],
                                     spec.loc_kernel, taps_nat)
                if "bwd_loc_mm" not in spec.ablate:
                    pre = pre + _mm(win, loc_ws[si_][...])
            e = jnp.tanh(pre)
            # v rides as a (1, U) row: lane reduction, not an N=1 matmul
            v_row = v_ref[...].astype(f32)
            e_col = jnp.sum(e * v_row, axis=1, keepdims=True)
            e_col = jnp.where(mask_ref[...] > 0.5, e_col, NEG_INF)
            a_col = _block_softmax_col(e_col, ind, T)
            rec = kind == 2 and "bwd_rec" not in spec.ablate
            if rec:
                # restore the recursion pieces: alpha_t from this step's
                # aux row, alpha_{t-1} from the predecessor (the [1,0,...]
                # init at t=0)
                lane = lane_w[si_]
                alpha_t = aux_t[:, lane:lane + 1]
                ap = jnp.where(first, onehot0,
                               aux_p_raw[:, lane:lane + 1].astype(f32))
                sh = _shift_col(ap, -1) * m_sh1
                s_t = 0.5 * ap + 0.5 * sh + 1e-7
                z_col = s_t * a_col
                z_sum = _mm_tA(ind, z_col)               # (B, 1)
                w_col = alpha_t
            else:
                w_col = a_col

            d_ctx_b = d_ctx_total[:, c_off:c_off + c]
            dav = _bcast(d_ctx_b, T)                     # (B*T, C)
            d_values_out[si_][...] += (w_col * dav).astype(
                d_values_out[si_].dtype)
            d_w = jnp.sum(dav * values, axis=1, keepdims=True)  # (B*T, 1)
            if rec:
                # normalize + recursion VJP: alpha = z / blocksum(z),
                # z = s * a, s = 0.5*ap + 0.5*shift(ap) + 1e-7
                d_alpha = d_w + dA_st[si_]
                sa = _mm_tA(ind, d_alpha * alpha_t)      # (B, 1)
                d_z = (d_alpha - _bcast(sa, T)) * _bcast(1.0 / z_sum, T)
                d_s = d_z * a_col
                d_a = d_z * s_t + dCV_st[si_]
                # adjoint of the one-step alpha shift (block-masked)
                new_dA[si_] = 0.5 * d_s + 0.5 * _shift_col(
                    d_s * m_sh1, 1)
            elif kind == 1:
                d_a = d_w + dCV_st[si_]
            else:
                d_a = d_w
            s_b = _mm_tA(ind, a_col * d_a)               # (B, 1)
            d_e_col = a_col * (d_a - _bcast(s_b, T))
            d_e = d_e_col * v_row                        # broadcast outer
            d_pre = d_e * (1.0 - e * e)
            d_keys_out[si_][...] += d_pre.astype(d_keys_out[si_].dtype)
            # (1, U) sublane reduction replaces the N=1 dW matmul
            d_vs[si_][...] += jnp.sum(e * d_e_col, axis=0,
                                      keepdims=True).astype(d_vs[si_].dtype)
            d_pq_parts.append(_mm_tA(ind, d_pre))        # (B, U)
            if kind != 0 and "bwd_dloc" not in spec.ablate:
                # conv adjoint: d_loc_w += win^T d_pre (a second K=B*T
                # contraction is cheaper than materializing an [ind | win]
                # concat — row-streaming matmuls cost ~0.15 us, column
                # concats ~0.3 us/lane: scripts/colop_probe.py)
                d_loc_out[si_][...] += _mm_tA(win, d_pre).astype(
                    d_loc_out[si_].dtype)
            if kind != 0:
                # conv-input gradient: mask in natural order, then ONE
                # strided rotate + lane reduction (the gather adjoint)
                if "bwd_dwin" not in spec.ablate:
                    d_win = _mm_tB(d_pre, loc_ws[si_][...])  # (B*T, K)
                    g = _win_gather(d_win * taps_nat, spec.loc_kernel)
                else:
                    g = jnp.zeros((BT, 1), f32)
                new_dCV[si_] = g + (dCV_st[si_]
                                    if spec.cumulative[si_] else 0.0)
            u_off += u
            c_off += c
        d_pq_all = (jnp.concatenate(d_pq_parts, axis=1) if ns > 1
                    else d_pq_parts[0])
        put_r("d_pq", d_pq_all)   # left operand: zop's first A cols (h_att)
        d_h_att = d_h_att + _mm_tB(d_pq_all, query_all[...])

        # ---- attention LSTM over z_att = [p_drop, ctx_prev, h_att_prev]
        d_h_att_total = d_h_att + d_h_att_c
        d_gates_att, d_c_att_prev, d_h_att_prev = _lstm_bwd(
            gates_att, c_att_prev, d_h_att_total, d_c_att,
            None if det or spec.zc_att == 0 else masks["zc_att"],
            None if det or spec.zo_att == 0 else masks["zo_att"],
            spec.zc_att, spec.zo_att, det)
        # reconstruct the dropped prenet output (input of the att LSTM)
        a_last = get(rt, f"p{n_pre - 1}")
        if spec.drop_rate > 0 and not det and spec.p_dropout[n_pre - 1]:
            p_drop = a_last * masks[f"p{n_pre - 1}"]
        else:
            p_drop = a_last
        if spec.use_spk and n_pre == 1:
            p_drop = p_drop + spk[...].astype(f32)
        put_l("z_att", jnp.concatenate([p_drop, ctx_prev, h_att_prev],
                                       axis=1))
        put_r("d_gatt", d_gates_att)
        # the prenet-input part of d_z_att is NOT on the recurrent chain:
        # the serial matmul contracts only the [ctx | h_att] weight rows
        # and the prenet backward is deferred to the flush (below), which
        # recovers d_p from the stashed d_gatt at M = dw_block*B
        d_z_att = _mm_tB(d_gates_att, att_lstm[0][...][P_last:, :])
        new_d_ctx = d_z_att[:, :sumC]
        new_d_h_att = d_h_att_prev + d_z_att[:, sumC:]
        new_d_c_att = d_c_att_prev

        # ---- stash the prenet pieces the deferred flush needs: combined
        # dropout*relu' masks per layer and the hidden-layer inputs (the
        # layer-0 input DMA'd into x_stash above); the speaker row adds
        # AFTER layer 0's (mask-free) output, handled at the flush
        for li in range(n_pre):
            a_act = get(rt, f"p{li}")
            relu_m = (a_act > 0).astype(f32)
            if spec.drop_rate > 0 and not det and spec.p_dropout[li]:
                put_l(f"mr{li}", relu_m * masks[f"p{li}"])
            else:
                put_l(f"mr{li}", relu_m)
            if li > 0:
                a_in = get(rt, f"p{li - 1}")
                if spec.drop_rate > 0 and not det and spec.p_dropout[li - 1]:
                    inp = a_in * masks[f"p{li - 1}"]
                else:
                    inp = a_in
                if spec.use_spk and li - 1 == 0:
                    inp = inp + spk[...].astype(f32)
                put_l(f"pin{li}", inp)

        # ---- batched dW flush: one contraction of depth dw_block*B per
        # weight pair every dw_block steps (sum over steps is order-free)
        @pl.when((k % kblk == kblk - 1) | (t == 0))
        def _():
            def col_l(name):
                o, w = off_l[name]
                return stash_l[:, o:o + w]

            def col_r(name):
                o, w = off_r[name]
                return stash_r[:, o:o + w]

            def acc(w_ref, ln, rn):
                w_ref[...] += _mm_tA(col_l(ln), col_r(rn)).astype(w_ref.dtype)

            def acc_b(b_ref, rn):
                b_ref[...] += jnp.sum(col_r(rn).astype(f32), axis=0,
                                      keepdims=True).astype(b_ref.dtype)

            acc(d_att[0], "z_att", "d_gatt")
            acc_b(d_att[1], "d_gatt")
            acc(d_lstm1[0], "z1", "d_g1")
            acc_b(d_lstm1[1], "d_g1")
            acc(d_lstm2[0], "z2", "d_g2")
            acc_b(d_lstm2[1], "d_g2")
            acc(d_outproj[0], "zop", "d_proj")
            acc_b(d_outproj[1], "d_proj")
            o_z, _ = off_l["zop"]
            d_query_all[...] += _mm_tA(
                stash_l[:, o_z:o_z + A], col_r("d_pq")
            ).astype(d_query_all.dtype)

            # ---- deferred prenet backward over the whole window: recover
            # d_p from the stashed att-LSTM gate cotangents at M = kblk*B
            # (the per-step serial loop skipped the prenet weight rows),
            # then walk the layers with the stashed mr/pin operands.
            # Stale rows of a partial window carry zero d_gatt, so every
            # downstream term is exactly zero.
            for j in range(kblk):
                @pl.when(j <= (k % kblk))
                def _(j=j):
                    pltpu.make_async_copy(
                        teacher_hbm.at[pl.ds(0, B), :],
                        x_stash.at[pl.ds(j * B, B), :],
                        sem_x.at[j]).wait()
            d_p = _mm_tB(col_r("d_gatt").astype(f32),
                         att_lstm[0][...][:P_last, :])
            for li in range(n_pre - 1, -1, -1):
                if spec.use_spk and li == 0:
                    d_spk_out[...] += jnp.sum(
                        d_p.reshape(kblk, B, d_p.shape[1]),
                        axis=0).astype(d_spk_out.dtype)
                d_pre_l = d_p * col_l(f"mr{li}").astype(f32)
                if li > 0:
                    d_prenet[li][0][...] += _mm_tA(
                        col_l(f"pin{li}").astype(cdt),
                        d_pre_l.astype(cdt)).astype(d_prenet[li][0].dtype)
                else:
                    d_prenet[0][0][...] += _mm_tA(
                        x_stash[...], d_pre_l.astype(cdt)
                    ).astype(d_prenet[0][0].dtype)
                d_prenet[li][1][...] += jnp.sum(
                    d_pre_l, axis=0, keepdims=True
                ).astype(d_prenet[li][1].dtype)
                if li > 0:
                    d_p = _mm_tB(d_pre_l, prenet[li][0][...])
            if S % kblk:
                stash_r[...] = jnp.zeros_like(stash_r)

        return (new_d_c_att, new_d_h_att, new_d_c1, new_d_h1,
                new_d_c2, new_d_h2, new_d_ctx,
                tuple(new_dA), tuple(new_dCV))

    zeros = lambda n: jnp.zeros((B, n), f32)
    dloc0 = tuple(jnp.zeros((B * T, 1), f32) if k != 0
                  else jnp.zeros((1, 1), f32) for k in kinds)
    carry0 = (zeros(A), zeros(A), zeros(D), zeros(D), zeros(D), zeros(D),
              zeros(sumC), dloc0, dloc0)
    jax.lax.fori_loop(0, S, body, carry0)


# ========================================================= pallas_call wiring

def _weight_ins(params: FusedTrainParams):
    ins = []
    for w, b in params.prenet:
        ins += [w, b]
    ins += [params.att_lstm[0], params.att_lstm[1]]
    ins += [jnp.concatenate([wq for wq, _ in params.query], axis=1)]
    # energy vectors as (1, U) rows: in-kernel lane/sublane reductions
    ins += [jnp.transpose(v) for _, v in params.query]
    ins += [params.outproj[0], params.outproj[1],
            params.lstm1[0], params.lstm1[1],
            params.lstm2[0], params.lstm2[1]]
    return ins


def _mem_ins(spec: TrainSpec, keys, values, masks):
    B, T = spec.batch, spec.t_mem
    ins = []
    ind = jnp.asarray(np.kron(np.eye(B, dtype=np.float32),
                              np.ones((T, 1), np.float32)))
    for k, v, m in zip(keys, values, masks):
        ins += [k, v, m, ind]
    return ins


AUX_W = 128     # lane width of the per-step [alpha | conv-in] aux rows


def _fwd_call(spec: TrainSpec, params, keys, values, masks, teacher_flat,
              seed_i, spk, loc_ws):
    layout = _save_layout(spec)
    _, w_save = layout
    B, S, D = spec.batch, spec.num_steps, spec.d_units
    T = spec.t_mem
    _, _, _, n_aux = _aux_lanes(spec)
    ins = _mem_ins(spec, keys, values, masks)
    ins += [seed_i.reshape(1), teacher_flat, spk]
    ins += [lw for lw in loc_ws if lw is not None]
    ins += _weight_ins(params)
    n_mem = 4 * spec.num_sources

    in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_mem
    in_specs += [pl.BlockSpec(memory_space=pltpu.SMEM),
                 pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)]
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * (len(ins) - n_mem
                                                           - 2)
    sdt = jnp.dtype(spec.compute_dtype)   # bf16 halves save-buffer traffic
    out_shapes = [jax.ShapeDtypeStruct((S * B, D), jnp.float32),
                  jax.ShapeDtypeStruct((S * B, w_save), sdt)]
    out_specs = [pl.BlockSpec(memory_space=pltpu.VMEM),
                 pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)]
    scratch = [pltpu.VMEM((B, spec.cf), teacher_flat.dtype),
               pltpu.VMEM((2 * B, w_save), sdt)]
    if n_aux:
        out_shapes += [jax.ShapeDtypeStruct((S * B * T, AUX_W), jnp.float32)]
        out_specs += [pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)]
        scratch += [pltpu.VMEM((2 * B * T, AUX_W), jnp.float32)]
    scratch += [pltpu.SemaphoreType.DMA(()), pltpu.SemaphoreType.DMA((2,))]
    if n_aux:
        scratch += [pltpu.SemaphoreType.DMA((2,))]
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, spec, layout),
        in_specs=in_specs, out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 << 20),
        interpret=spec.interpret,
    )(*ins)
    if n_aux:
        y_flat, save, aux = outs
    else:
        (y_flat, save), aux = outs, None
    return y_flat, save, aux


def _bwd_call(spec: TrainSpec, params, keys, values, masks, teacher_flat,
              seed_i, spk, loc_ws, g_flat, save, aux):
    layout = _save_layout(spec)
    _, w_save = layout
    B, S = spec.batch, spec.num_steps
    T = spec.t_mem
    n_loc = sum(1 for k in spec.src_kinds if k != 0)
    loc_live = [lw for lw in loc_ws if lw is not None]
    ins = _mem_ins(spec, keys, values, masks)
    ins += [seed_i.reshape(1), teacher_flat, spk]
    ins += loc_live
    ins += _weight_ins(params)
    ins += [g_flat, save]
    if n_loc:
        ins += [aux]
    n_mem = 4 * spec.num_sources
    n_w = len(_weight_ins(params))

    in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_mem
    in_specs += [pl.BlockSpec(memory_space=pltpu.SMEM),
                 pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                 pl.BlockSpec(memory_space=pltpu.VMEM)]
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(loc_live)
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_w
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM),
                 pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)]
    if n_loc:
        in_specs += [pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)]

    # gradient outputs mirror the weight inputs, then
    # d_keys/d_values/d_spk/d_loc
    w_ins = _weight_ins(params)
    out_shapes = [jax.ShapeDtypeStruct(x.shape, jnp.float32) for x in w_ins]
    out_shapes += [jax.ShapeDtypeStruct(k.shape, jnp.float32) for k in keys]
    out_shapes += [jax.ShapeDtypeStruct(v.shape, jnp.float32) for v in values]
    out_shapes += [jax.ShapeDtypeStruct(spk.shape, jnp.float32)]
    out_shapes += [jax.ShapeDtypeStruct(lw.shape, jnp.float32)
                   for lw in loc_live]
    sdt = jnp.dtype(spec.compute_dtype)
    # x_stash: the flush window's teacher rows (layer-0 prenet inputs),
    # DMA'd straight from HBM — the deferred prenet backward contracts
    # against it at M = dw_block*B
    scratch = [pltpu.VMEM((spec.dw_block * B, spec.cf),
                          teacher_flat.dtype),
               pltpu.VMEM((3 * B, w_save), sdt)]
    if n_loc:
        scratch += [pltpu.VMEM((3 * B * T, AUX_W), jnp.float32)]
    _, w_l, _, w_r = _dw_stash_layout(spec)
    cdt = jnp.dtype(spec.compute_dtype)
    scratch += [pltpu.VMEM((spec.dw_block * B, w_l), cdt),
                pltpu.VMEM((spec.dw_block * B, w_r), cdt)]
    scratch += [pltpu.SemaphoreType.DMA((spec.dw_block,)),
                pltpu.SemaphoreType.DMA((3,))]
    if n_loc:
        scratch += [pltpu.SemaphoreType.DMA((3,))]
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, spec, layout),
        in_specs=in_specs,
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in out_shapes),
        out_shape=tuple(out_shapes),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 << 20),
        interpret=spec.interpret,
    )(*ins)

    it = iter(outs)
    d_prenet = tuple((next(it), next(it)) for _ in spec.p_sizes)
    d_att = (next(it), next(it))
    d_query_all = next(it)
    d_vs = [next(it) for _ in range(spec.num_sources)]
    d_outproj = (next(it), next(it))
    d_lstm1 = (next(it), next(it))
    d_lstm2 = (next(it), next(it))
    d_keys = tuple(next(it) for _ in range(spec.num_sources))
    d_values = tuple(next(it) for _ in range(spec.num_sources))
    d_spk = next(it)
    d_loc_live = [next(it) for _ in range(n_loc)]
    assert next(it, None) is None
    d_loc = []
    for k in spec.src_kinds:
        d_loc.append(d_loc_live.pop(0) if k != 0 else None)

    # split the fused query-projection gradient back per source
    d_query = []
    u_off = 0
    for i, u in enumerate(spec.u_sizes):
        d_query.append((d_query_all[:, u_off:u_off + u],
                        jnp.transpose(d_vs[i])))
        u_off += u
    d_params = FusedTrainParams(prenet=d_prenet, att_lstm=d_att,
                                query=tuple(d_query), outproj=d_outproj,
                                lstm1=d_lstm1, lstm2=d_lstm2)
    return d_params, d_keys, d_values, d_spk, tuple(d_loc)


# =============================================================== custom VJP

@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_scan_core(spec: TrainSpec, params, keys, values, masks,
                     teacher_flat, seed_f, spk, loc_ws):
    """Returns (y, aux) — aux carries the per-step alignment/conv-input
    columns (dummy (1, 1) zeros when no source writes aux rows).  The aux
    output is observational (plots): its cotangent is discarded by the VJP,
    so consumers must not differentiate through it (the caller wraps it in
    ``stop_gradient``)."""
    y, _, aux = _fwd_call(spec, params, keys, values, masks, teacher_flat,
                          seed_f.astype(jnp.int32), spk, loc_ws)
    return y, (aux if aux is not None
               else jnp.zeros((1, 1), jnp.float32))


def _core_fwd(spec, params, keys, values, masks, teacher_flat, seed_f, spk,
              loc_ws):
    y, save, aux = _fwd_call(spec, params, keys, values, masks, teacher_flat,
                             seed_f.astype(jnp.int32), spk, loc_ws)
    aux_out = aux if aux is not None else jnp.zeros((1, 1), jnp.float32)
    return (y, aux_out), (params, keys, values, masks, teacher_flat, seed_f,
                          spk, loc_ws, save, aux)


def _core_bwd(spec, res, g):
    (params, keys, values, masks, teacher_flat, seed_f, spk, loc_ws,
     save, aux) = res
    g_flat = g[0]   # aux output is observational; its cotangent is dropped
    d_params, d_keys, d_values, d_spk, d_loc = _bwd_call(
        spec, params, keys, values, masks, teacher_flat,
        seed_f.astype(jnp.int32), spk, loc_ws,
        g_flat.astype(jnp.float32), save, aux)
    # accumulators run in f32; cotangent dtypes must match the primals
    # (bf16 storage mode casts here, and back to f32 outside the core)
    d_params = jax.tree_util.tree_map(lambda g, pr: g.astype(pr.dtype),
                                      d_params, params)
    d_keys = tuple(g.astype(k.dtype) for g, k in zip(d_keys, keys))
    d_values = tuple(g.astype(v.dtype) for g, v in zip(d_values, values))
    d_masks = tuple(jnp.zeros_like(m) for m in masks)
    d_loc = tuple(None if lw is None else g.astype(lw.dtype)
                  for g, lw in zip(d_loc, loc_ws))
    return (d_params, d_keys, d_values, d_masks,
            jnp.zeros_like(teacher_flat), jnp.zeros_like(seed_f),
            d_spk.astype(spk.dtype), d_loc)


_fused_scan_core.defvjp(_core_fwd, _core_bwd)


# ============================================================== public entry

def _pad_cols(x, to: int):
    return x if x.shape[-1] == to else jnp.pad(
        x, [(0, 0)] * (x.ndim - 1) + [(0, to - x.shape[-1])])


def fused_teacher_scan(params: FusedTrainParams, keys, values, masks,
                       teacher_xs, seed, *, drop_rate: float,
                       zc_att: float, zo_att: float,
                       zc_dec: float, zo_dec: float,
                       deterministic: bool,
                       compute_dtype: str = "float32",
                       p_dropout=None, speaker_row=None,
                       src_kinds=None, cumulative=None, loc_kernel: int = 31,
                       loc_ws=None, save_align: bool = False,
                       dw_block: int = None, interpret: bool = None,
                       ablate=()):
    """Run the teacher-forced RNN trunk as fused fwd/bwd kernels.

    Args: keys/values (B, T_mem, U/C) per source, masks (B, T_mem) float,
    teacher_xs (B, T_steps, cf), seed int32 scalar.  Returns the trunk
    output o2 as (B, T_steps, D).  Differentiable w.r.t. params, keys and
    values (the causal hops + output heads downstream stay in XLA).

    Lane alignment is handled here by zero-padding the feedback width and
    each source's U/C to multiples of 128 (zero weight rows/columns make
    the padding exact, and gradients flow back through the pads).

    ``compute_dtype="bfloat16"`` stores weights/keys/values (and runs the
    matmuls) in bfloat16 with float32 accumulation — the same tradeoff as
    ``hp.compute_dtype`` on the XLA path; saves, softmax math, and gradient
    accumulators stay float32.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T_steps, cf = teacher_xs.shape
    T_mem = int(keys[0].shape[1])
    u_sizes = tuple(int(k.shape[2]) for k in keys)
    c_sizes = tuple(int(v.shape[2]) for v in values)
    p_sizes = tuple(int(b.shape[1]) for _, b in params.prenet)
    A = int(params.att_lstm[1].shape[1]) // 4
    D = int(params.lstm1[1].shape[1]) // 4

    cfp = _pad128(cf)
    up = tuple(_pad128(u) for u in u_sizes)
    cp = tuple(_pad128(c) for c in c_sizes)

    # pad widths with zero weight rows/columns — exact, differentiable
    prenet = list(params.prenet)
    w0, b0 = prenet[0]
    prenet[0] = (jnp.pad(w0, [(0, cfp - cf), (0, 0)]), b0)
    query = tuple(
        (jnp.pad(wq, [(0, 0), (0, u2 - u)]),
         jnp.pad(vq, [(0, u2 - u), (0, 0)]))
        for (wq, vq), u, u2 in zip(params.query, u_sizes, up))
    # outproj rows: [A | C_0 | C_1 | ...] -> [A | Cp_0 | Cp_1 | ...]
    wop = params.outproj[0]
    blocks = [wop[:A]]
    r_off = A
    for c, c2 in zip(c_sizes, cp):
        blocks.append(jnp.pad(wop[r_off:r_off + c], [(0, c2 - c), (0, 0)]))
        r_off += c
    wop_p = jnp.concatenate(blocks, axis=0)
    # att_lstm rows: [P_last | sumC | A] -> [P_last | sumCp | A]
    watt = params.att_lstm[0]
    p_last = p_sizes[-1]
    blocks = [watt[:p_last]]
    r_off = p_last
    for c, c2 in zip(c_sizes, cp):
        blocks.append(jnp.pad(watt[r_off:r_off + c], [(0, c2 - c), (0, 0)]))
        r_off += c
    blocks.append(watt[r_off:])
    watt_p = jnp.concatenate(blocks, axis=0)

    cdt = jnp.dtype(compute_dtype)
    params_p = FusedTrainParams(
        prenet=tuple(prenet), att_lstm=(watt_p, params.att_lstm[1]),
        query=query, outproj=(wop_p, params.outproj[1]),
        lstm1=params.lstm1, lstm2=params.lstm2)
    params_p = jax.tree_util.tree_map(lambda x: x.astype(cdt), params_p)

    keys_p = tuple(_pad_cols(k, u2).reshape(B * T_mem, u2).astype(cdt)
                   for k, u2 in zip(keys, up))
    values_p = tuple(_pad_cols(v, c2).reshape(B * T_mem, c2).astype(cdt)
                     for v, c2 in zip(values, cp))
    masks_p = tuple(jnp.asarray(m, jnp.float32).reshape(B * T_mem, 1)
                    for m in masks)
    teacher_flat = _pad_cols(
        jnp.moveaxis(teacher_xs, 0, 1).astype(cdt), cfp
    ).reshape(T_steps * B, cfp)

    if p_dropout is None:
        p_dropout = (True,) * len(p_sizes)
    kind_ids = {"additive": 0, "location_sensitive": 1, "forward": 2}
    src_kinds = tuple(kind_ids[k] for k in
                      (src_kinds or ("additive",) * len(keys)))
    cumulative = tuple(bool(c) for c in
                       (cumulative or (False,) * len(keys)))
    if loc_ws is None:
        loc_ws = (None,) * len(keys)
    # pad the (K, U) location products to the padded attention widths
    # (zero columns are exact and keep gradients aligned)
    loc_ws_p = tuple(
        None if lw is None else _pad_cols(jnp.asarray(lw, jnp.float32), u2)
        for lw, u2 in zip(loc_ws, up))
    spec = TrainSpec(batch=B, num_steps=T_steps, cf=cfp,
                     num_sources=len(keys), t_mem=T_mem,
                     u_sizes=up, c_sizes=cp, p_sizes=p_sizes,
                     p_dropout=tuple(bool(f) for f in p_dropout),
                     use_spk=speaker_row is not None,
                     src_kinds=src_kinds, cumulative=cumulative,
                     loc_kernel=int(loc_kernel),
                     a_units=A, d_units=D, drop_rate=float(drop_rate),
                     zc_att=float(zc_att), zo_att=float(zo_att),
                     zc_dec=float(zc_dec), zo_dec=float(zo_dec),
                     deterministic=bool(deterministic),
                     compute_dtype=str(compute_dtype),
                     interpret=bool(interpret),
                     dw_block=(int(dw_block) if dw_block
                               else _dw_block_for(B, T_steps)),
                     save_align=bool(save_align),
                     ablate=tuple(ablate))
    seed_f = (jnp.asarray(seed, jnp.int32) % jnp.int32(1 << 23)
              ).astype(jnp.float32)
    spk = (jnp.zeros((B, p_sizes[0]), jnp.float32) if speaker_row is None
           else jnp.asarray(speaker_row, jnp.float32))
    y_flat, aux_flat = _fused_scan_core(spec, params_p, keys_p, values_p,
                                        masks_p, teacher_flat, seed_f, spk,
                                        loc_ws_p)
    out = jnp.moveaxis(y_flat.reshape(T_steps, B, D), 0, 1)
    if not save_align:
        return out
    # alignment lanes -> per-source (B, T_steps, T_mem); observational only
    # (the aux cotangent is dropped by the VJP), hence stop_gradient
    lane_w, _, _, _ = _aux_lanes(spec)
    aux_flat = jax.lax.stop_gradient(aux_flat)
    aligns = tuple(
        jnp.moveaxis(
            aux_flat[:, lane_w[si]].reshape(T_steps, B, T_mem), 0, 1)
        for si in range(len(keys)))
    return out, aligns
