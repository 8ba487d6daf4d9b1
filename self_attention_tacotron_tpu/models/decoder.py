"""The autoregressive decoder as a single ``jax.lax.scan`` core.

This is the TPU-native re-design of the reference's decoder zoo
(reference: modules/module.py:530-1686).  The reference composes TF RNNCell
wrappers (prenet -> AttentionWrapper -> DecoderRNN stack -> output wrappers)
and drives them with ``tf.contrib.seq2seq.dynamic_decode`` plus mode-specific
``Helper`` objects (reference: modules/helpers.py).  Here one fused step
function is scanned over time; modes differ only in (a) where the next input
frame comes from and (b) whether output heads run inside the step.

Step structure (parity with the reference wrapper stack):
    x      = prenet(next_input)                       # DecoderPreNetWrapper
    h      = attention_LSTM([x, prev_context])        # AttentionWrapper cell
    align_i, att_state_i = mechanism_i(h, state_i)    # 1 or 2 sources
    ctx    = concat(align_i @ values_i)               # dual-source context
    cell_out = concat([h, ctx])                       # ConcatOutputAndAttention
    proj   = Dense(cell_out)                          # OutputProjectionWrapper
    o1     = proj + LSTM_1(proj)                      # DecoderRNNV1/V2 residual
    o2     = o1 + LSTM_2(o1)
    [transformer decoders]
      y    = hops(o2)  # causal self-attention over the history:
                       # - train: post-hoc over the whole sequence (parallel)
                       # - decode: incremental KV-cache step (linear per step,
                       #   replacing the reference's O(T^2) TransformerWrapper,
                       #   reference: modules/rnn_wrappers.py:87-124)
    out, stop = heads(y)

Decode modes (parity with reference helpers, modules/helpers.py):
  TRAIN              teacher-forced inputs, full target length
  VALIDATION         free-running (softmax or raw feedback) or teacher-forced
  INFERENCE          stop-token based with min/max iteration caps

The train-path and decode-path must produce identical outputs under teacher
forcing — the central invariant of the reference's only test
(reference: modules/transformer_test.py:44-90) — verified in
tests/test_decoder_parity.py.
"""

from __future__ import annotations

import enum
from typing import Any, Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.rnn import ZoneoutLSTMCell
from .attention import (AttentionOptions, MemoryPack, attention_mechanism_factory,
                        compute_context)
from .encoders import SelfAttentionTransformer
from .prenet import PreNetStack

glorot = nn.initializers.glorot_uniform()

_logger = __import__("logging").getLogger(__name__)
_warned_fused_fallback: set = set()


def _warn_fused_fallback(reason: str) -> None:
    """Log (once per distinct reason) when decoder_fused_inference=True falls
    back to the scan path, so the dispatch gate is never config-silent."""
    if reason not in _warned_fused_fallback:
        _warned_fused_fallback.add(reason)
        _logger.warning(
            "decoder_fused_inference=True but the fused kernel does not "
            "cover this configuration — using the scan path: %s", reason)


class DecoderMode(enum.Enum):
    TRAIN = "train"
    VALIDATION = "validation"
    INFERENCE = "inference"


class DecoderOutput(NamedTuple):
    outputs: jax.Array                 # (B, T_frames, C) main output
    stop_token: jax.Array              # (B, T_steps, 1) logits
    predicted_samples: jax.Array       # (B, T_steps, r) argmax ids
    alignments: Tuple[jax.Array, ...]  # per source (B, T_mem, T_steps)
    self_attention_alignments: List[jax.Array]  # per hop*head (B, T_k, T_q)
    lengths: jax.Array                 # (B,) decoded steps (reduced frames)
    outputs2: Optional[jax.Array] = None  # (B, T_frames, num_lf0s) for MgcLf0


class TacotronDecoder(nn.Module):
    """Unified decoder covering the reference's eight decoder classes.

    num_sources=1, use_transformer=False  -> ExtendedDecoder
    num_sources=1, use_transformer=True   -> TransformerDecoder
    num_sources=2, use_transformer=False  -> DualSourceDecoder
    num_sources=2, use_transformer=True   -> DualSourceTransformerDecoder
    output_kind="mgclf0" variants         -> MgcLf0{,DualSource,Transformer}Decoder
    """

    attention_options: Tuple[AttentionOptions, ...]
    num_sources: int = 2
    use_transformer: bool = True
    output_kind: str = "single"  # single | mgclf0
    prenet_out_units: Tuple[int, ...] = (256, 128)
    drop_rate: float = 0.5
    apply_dropout_on_inference: bool = False
    attention_rnn_out_units: int = 256
    decoder_version: str = "v1"
    decoder_out_units: int = 256
    num_mels: int = 80               # output channels C (or num codes)
    num_mgcs: int = 60
    num_lf0s: int = 256
    outputs_per_step: int = 2        # r
    n_feed_frame: int = 1
    max_iters: int = 500
    min_iters: int = 10
    zoneout_factor_cell: float = 0.0
    zoneout_factor_output: float = 0.0
    self_attention_out_units: int = 256
    self_attention_num_heads: int = 2
    self_attention_num_hop: int = 1
    self_attention_drop_rate: float = 0.05
    use_speaker_embed: bool = False
    feedback_softmax: bool = False   # one-hot code models feed softmax probs
    use_pallas: bool = False
    early_stop: bool = False         # while_loop inference: stop when every
    #                                  row's stop token fired (dynamic_decode
    #                                  early-exit semantics); scan otherwise
    fused_inference: bool = False    # whole-loop Pallas decode kernel
    #                                  (ops/fused_decode.py); falls back to
    #                                  the scan path outside its subset
    fused_train: bool = False        # fused Pallas teacher-forced training
    #                                  scan, fwd + custom-VJP bwd with
    #                                  VMEM-resident trunk weights
    #                                  (ops/fused_train.py)
    fused_train_dtype: str = "float32"  # float32 | bfloat16 in-kernel
    #                                  weight/matmul storage for the
    #                                  fused training scan
    fused_mesh: Optional[Any] = None  # jax.sharding.Mesh: when set (>1
    #                                  device), the fused training trunk runs
    #                                  under shard_map over the mesh's first
    #                                  axis (batch-sharded operands, weights
    #                                  replicated) — GSPMD cannot partition a
    #                                  pallas_call, so without this the
    #                                  sharded train step would all-gather
    #                                  the batch and run the kernel
    #                                  replicated on every device
    fused_dtype: str = "float32"     # float32 | bfloat16 in-kernel storage
    scan_unroll: int = 4             # lax.scan unroll for the decode loops
    #                                  (~10% train-step win on v5e)
    dtype: jnp.dtype = jnp.float32

    # ------------------------------------------------------------- submodules
    def setup(self):
        assert len(self.attention_options) == self.num_sources
        if self.output_kind == "mgclf0":
            self.mgc_prenets = PreNetStack(
                self.prenet_out_units, self.drop_rate,
                self.apply_dropout_on_inference, self.use_speaker_embed,
                self.dtype)
            self.lf0_prenets = PreNetStack(
                self.prenet_out_units, self.drop_rate,
                self.apply_dropout_on_inference, self.use_speaker_embed,
                self.dtype)
        else:
            self.prenets = PreNetStack(
                self.prenet_out_units, self.drop_rate,
                self.apply_dropout_on_inference, self.use_speaker_embed,
                self.dtype)

        self.attention_mechanisms = tuple(
            attention_mechanism_factory(opt, self.dtype,
                                        name=f"attention_mechanism_{i}")
            for i, opt in enumerate(self.attention_options))

        self.attention_lstm = ZoneoutLSTMCell(
            self.attention_rnn_out_units, self.zoneout_factor_cell,
            self.zoneout_factor_output, self.dtype)

        # DecoderRNNV1/V2: input projection + 2 residual LSTMs
        self.output_projection_wrapper = nn.Dense(
            self.decoder_out_units, kernel_init=glorot, dtype=self.dtype)
        zc = self.zoneout_factor_cell if self.decoder_version == "v2" else 0.0
        zo = self.zoneout_factor_output if self.decoder_version == "v2" else 0.0
        self.decoder_lstm1 = ZoneoutLSTMCell(self.decoder_out_units, zc, zo,
                                             self.dtype)
        self.decoder_lstm2 = ZoneoutLSTMCell(self.decoder_out_units, zc, zo,
                                             self.dtype)

        if self.use_transformer:
            self.transformers = tuple(
                SelfAttentionTransformer(
                    self.self_attention_out_units,
                    self.self_attention_out_units,
                    self.self_attention_num_heads,
                    self.self_attention_drop_rate,
                    use_subsequent_mask=True, use_pallas=self.use_pallas,
                    dtype=self.dtype,
                    name=f"transformer_{i}")
                for i in range(self.self_attention_num_hop))

        out_dim = self.num_mels * self.outputs_per_step
        if self.output_kind == "mgclf0":
            # MGCProjection: dense(tanh) -> dense; Projection for lf0/stop
            # (reference: modules/module.py:646-675)
            head_in = (self.self_attention_out_units if self.use_transformer
                       else self.decoder_out_units)
            self.mgc_out_projection1 = nn.Dense(head_in, kernel_init=glorot,
                                                dtype=self.dtype)
            self.mgc_out_projection2 = nn.Dense(
                self.num_mgcs * self.outputs_per_step, kernel_init=glorot,
                dtype=self.dtype)
            self.lf0_out_projection = nn.Dense(
                self.num_lf0s * self.outputs_per_step, kernel_init=glorot,
                dtype=self.dtype)
        else:
            self.out_projection = nn.Dense(out_dim, kernel_init=glorot,
                                           dtype=self.dtype)
        self.stop_token_projection = nn.Dense(1, kernel_init=glorot,
                                              dtype=self.dtype)

    # ------------------------------------------------------------ public API
    def __call__(self, sources: Sequence[jax.Array],
                 memory_lengths: Sequence[jax.Array],
                 target: Optional[Any] = None,
                 mode: DecoderMode = DecoderMode.TRAIN,
                 teacher_forcing: bool = False,
                 speaker_embed: Optional[jax.Array] = None,
                 teacher_alignments: Optional[Sequence[jax.Array]] = None,
                 want_alignments: bool = False,
                 ) -> DecoderOutput:
        assert len(sources) == self.num_sources
        is_training = mode == DecoderMode.TRAIN
        B = sources[0].shape[0]
        r = self.outputs_per_step

        packs = []
        for i, mech in enumerate(self.attention_mechanisms):
            ta = None if teacher_alignments is None else teacher_alignments[i]
            from .attention import TeacherForcingAttention
            if isinstance(mech, TeacherForcingAttention):
                packs.append(mech.precompute(sources[i], memory_lengths[i],
                                             teacher_alignments=ta))
            else:
                pack = mech.precompute(sources[i], memory_lengths[i])
                # forced-alignment replay: any mechanism can be overridden by
                # supplied alignments (reference: models/models.py:118-134
                # swaps to teacher_forcing_* mechanisms; replay is paramless
                # so we reuse the same decoder instance)
                if ta is not None:
                    pack = pack._replace(teacher_alignments=ta)
                packs.append(pack)
        packs = tuple(packs)

        if mode == DecoderMode.INFERENCE:
            num_steps = self.max_iters
            teacher_xs = None
        else:
            t_frames = (target[0] if self.output_kind == "mgclf0"
                        else target).shape[1]
            num_steps = t_frames // r
            teacher_xs = self._teacher_inputs(target, num_steps)

        if is_training and self.use_transformer:
            return self._train_transformer_path(packs, B, num_steps,
                                                teacher_xs, speaker_embed,
                                                memory_lengths,
                                                want_alignments)
        if (mode == DecoderMode.INFERENCE and self.fused_inference
                and not self.is_initializing()
                and self._fused_supported(B, teacher_alignments)):
            return self._decode_path_fused(packs, B, num_steps,
                                           speaker_embed)
        if (mode == DecoderMode.INFERENCE and self.early_stop
                and not self.apply_dropout_on_inference
                and not self.is_initializing()):  # while_loop bodies cannot
            #                                       create params at init time
            return self._decode_path_while(packs, B, num_steps, speaker_embed)
        return self._decode_path(packs, B, num_steps, teacher_xs, mode,
                                 teacher_forcing, speaker_embed)

    # ------------------------------------------------------- teacher inputs
    def _frame_dims(self) -> Tuple[int, ...]:
        if self.output_kind == "mgclf0":
            return (self.num_mgcs, self.num_lf0s)
        return (self.num_mels,)

    def _teacher_inputs(self, target, num_steps):
        """Shifted, r-reduced teacher inputs: [GO, tgt_0, ..., tgt_{T-2}],
        keeping the last n_feed_frame frames of each reduced step
        (reference: modules/helpers.py:44-58)."""
        r = self.outputs_per_step
        targets = target if self.output_kind == "mgclf0" else (target,)
        xs = []
        for tgt, C in zip(targets, self._frame_dims()):
            B = tgt.shape[0]
            reduced = tgt.reshape(B, num_steps, C * r)
            feed = reduced[:, :-1, -C * self.n_feed_frame:]
            go = jnp.zeros((B, 1, C * self.n_feed_frame), tgt.dtype)
            xs.append(jnp.concatenate([go, feed], axis=1))
        return tuple(xs) if self.output_kind == "mgclf0" else xs[0]

    # ----------------------------------------------------------- scan pieces
    def _initial_rnn_carry(self, B, packs):
        ctx_dim = sum(int(p.values.shape[-1]) for p in packs)
        return dict(
            att_lstm=ZoneoutLSTMCell.initial_state(
                B, self.attention_rnn_out_units, self.dtype),
            lstm1=ZoneoutLSTMCell.initial_state(B, self.decoder_out_units,
                                                self.dtype),
            lstm2=ZoneoutLSTMCell.initial_state(B, self.decoder_out_units,
                                                self.dtype),
            att_states=tuple(
                mech.initial_state(B, p.values.shape[1])
                for mech, p in zip(self.attention_mechanisms, packs)),
            prev_context=jnp.zeros((B, ctx_dim), self.dtype),
            time=jnp.asarray(0, jnp.int32),
        )

    def _rnn_step(self, carry, x, packs, speaker_embed, is_training):
        """One step of the recurrent trunk; returns (carry, (o2, aligns))."""
        if self.output_kind == "mgclf0":
            mgc_in, lf0_in = x
            if self.use_speaker_embed:
                pm = self.mgc_prenets(mgc_in, speaker_embed,
                                      is_training=is_training)
                pl = self.lf0_prenets(lf0_in, speaker_embed,
                                      is_training=is_training)
            else:
                pm = self.mgc_prenets(mgc_in, is_training=is_training)
                pl = self.lf0_prenets(lf0_in, is_training=is_training)
            prenet_out = jnp.concatenate([pm, pl], axis=-1)
        else:
            if self.use_speaker_embed:
                prenet_out = self.prenets(x, speaker_embed,
                                          is_training=is_training)
            else:
                prenet_out = self.prenets(x, is_training=is_training)

        cell_in = jnp.concatenate([prenet_out, carry["prev_context"]], axis=-1)
        att_lstm_state, h = self.attention_lstm(
            carry["att_lstm"], cell_in, deterministic=not is_training)

        aligns = []
        contexts = []
        new_att_states = []
        from .attention import TeacherForcingAttention
        for mech, state, pack in zip(self.attention_mechanisms,
                                     carry["att_states"], packs):
            if (pack.teacher_alignments is not None
                    and not isinstance(mech, TeacherForcingAttention)):
                T_steps = pack.teacher_alignments.shape[1]
                alignment = jax.lax.dynamic_index_in_dim(
                    pack.teacher_alignments,
                    jnp.clip(carry["time"], 0, T_steps - 1), axis=1,
                    keepdims=False)
                new_state = state
            else:
                alignment, new_state = mech.step(h, state, pack)
            aligns.append(alignment)
            contexts.append(compute_context(alignment, pack.values))
            new_att_states.append(new_state)
        context = jnp.concatenate(contexts, axis=-1)

        cell_out = jnp.concatenate([h, context], axis=-1)
        proj = self.output_projection_wrapper(cell_out)
        lstm1_state, l1 = self.decoder_lstm1(carry["lstm1"], proj,
                                             deterministic=not is_training)
        o1 = proj + l1
        lstm2_state, l2 = self.decoder_lstm2(carry["lstm2"], o1,
                                             deterministic=not is_training)
        o2 = o1 + l2

        new_carry = dict(carry, time=carry["time"] + 1,
                         att_lstm=att_lstm_state, lstm1=lstm1_state,
                         lstm2=lstm2_state, att_states=tuple(new_att_states),
                         prev_context=context)
        return new_carry, (o2, tuple(aligns))

    # ----------------------------------------------------- head computations
    def _heads_full(self, y):
        """Output heads over a full (B, T, D) sequence."""
        if self.output_kind == "mgclf0":
            mgc = self.mgc_out_projection2(jnp.tanh(self.mgc_out_projection1(y)))
            lf0 = self.lf0_out_projection(y)
            stop = self.stop_token_projection(y)
            return (mgc, lf0), stop
        out = self.out_projection(y)
        stop = self.stop_token_projection(y)
        return (out,), stop

    def _next_input_from_output(self, outs, mode, teacher_forcing,
                                teacher_x_t):
        """Helper semantics: what to feed at the next step
        (reference: modules/helpers.py)."""
        r = self.outputs_per_step
        if mode != DecoderMode.INFERENCE and teacher_forcing:
            # cast keeps the scan carry dtype stable under bf16 compute
            return jax.tree_util.tree_map(
                lambda x: x.astype(self.dtype), teacher_x_t)
        feeds = []
        dims = self._frame_dims()
        for idx, (o, C) in enumerate(zip(outs, dims)):
            B = o.shape[0]
            softmax_this = (
                (self.output_kind == "single" and self.feedback_softmax
                 and mode == DecoderMode.VALIDATION) or
                (self.output_kind == "mgclf0" and idx == 1))
            if softmax_this:
                probs = jax.nn.softmax(o.reshape(B, r, C), axis=-1)
                feeds.append(probs[:, -self.n_feed_frame:, :].reshape(
                    B, C * self.n_feed_frame))
            else:
                feeds.append(o[:, -C * self.n_feed_frame:])
        feeds = [f.astype(self.dtype) for f in feeds]
        return tuple(feeds) if self.output_kind == "mgclf0" else feeds[0]

    # ------------------------------------------------- train path (parallel)
    def _train_transformer_path(self, packs, B, num_steps, teacher_xs,
                                speaker_embed, memory_lengths,
                                want_alignments: bool = False):
        """Teacher-forced RNN scan, then parallel causal hops + heads
        (reference: modules/module.py:743-765)."""
        if (self.fused_train and not self.is_initializing()
                and self._fused_train_supported(B, packs, teacher_xs)):
            rnn_out, aligns = self._train_scan_fused(packs, B, teacher_xs,
                                                     speaker_embed,
                                                     want_alignments)
        else:
            carry = self._initial_rnn_carry(B, packs)

            def step(mdl, c, x_t):
                return mdl._rnn_step(c, x_t, packs, speaker_embed,
                                     is_training=True)

            scan = nn.scan(step, variable_broadcast="params",
                           split_rngs={"params": False, "dropout": True,
                                       "zoneout": True},
                           in_axes=1, out_axes=1, unroll=self.scan_unroll)
            _, (rnn_out, aligns) = scan(self, carry, teacher_xs)
            # rnn_out: (B, T, D); aligns: tuple of (B, T, T_mem)

        y = rnn_out
        sa_aligns: List[jax.Array] = []
        for hop in self.transformers:
            y, heads = hop(y, deterministic=False)
            sa_aligns.extend(heads)
        outs, stop = self._heads_full(y)
        return self._package(outs, stop, aligns, sa_aligns,
                             jnp.full((B,), num_steps, jnp.int32), num_steps)

    # --------------------------------- fused teacher-forced training scan
    def _fused_train_supported(self, B, packs, teacher_xs) -> bool:
        """Gate for ops/fused_train.py; outside the subset the XLA scan
        runs, with the reason logged once (never config-silent)."""
        from .attention import AdditiveAttention
        from ..ops import fused_train as ft
        reason = None
        on_tpu = jax.default_backend() == "tpu"
        # Under a >1-device mesh the trunk runs inside shard_map: every
        # per-batch constraint below applies to the PER-DEVICE batch.
        shards = self._fused_mesh_shards()
        if shards > 1 and B % shards != 0:
            reason = (f"batch {B} does not divide over the {shards}-device "
                      "mesh data axis")
        B_local = B // shards if B % shards == 0 else B
        if reason is not None:
            pass
        elif self.output_kind != "single":
            reason = f"output_kind={self.output_kind!r} is not fused"
        elif any(p.teacher_alignments is not None for p in packs):
            reason = "forced-alignment replay is not fused"
        elif not on_tpu and (
                self.drop_rate > 0 or self.zoneout_factor_cell > 0
                or self.zoneout_factor_output > 0):
            reason = ("in-kernel PRNG dropout/zoneout masks need the TPU "
                      "backend (interpret mode cannot lower prng_seed)")
        elif len({int(p.values.shape[1]) for p in packs}) != 1:
            reason = "sources with different memory lengths"

        elif on_tpu and B_local % 8 != 0:
            reason = (f"per-device batch {B_local} is not a multiple of 8 "
                      "(sublane tiling)" if shards > 1 else
                      f"batch {B} is not a multiple of 8 (sublane tiling)")
        elif (on_tpu and self.fused_train_dtype == "bfloat16"
              and B_local % 16 != 0):
            reason = (f"per-device batch {B_local} is not a multiple of 16 "
                      "(bfloat16 save-row sublane tiling)")
        elif on_tpu and any(
                d % 128 for d in (self.attention_rnn_out_units,
                                  self.decoder_out_units,
                                  *self.prenet_out_units)):
            reason = ("attention/decoder/prenet units must be multiples of "
                      "128 on TPU (the flagship's 256/256/(256,128) are)")
        if reason is None:
            reason = self._fused_attention_unsupported_reason()
        if reason is None:
            xs = (teacher_xs[0] if isinstance(teacher_xs, (tuple, list))
                  else teacher_xs)
            need = ft.estimate_vmem_bytes(
                batch=B_local, num_steps=int(xs.shape[1]),
                t_mem=int(packs[0].values.shape[1]), cf=int(xs.shape[2]),
                u_sizes=[int(p.keys.shape[2]) for p in packs],
                c_sizes=[int(p.values.shape[2]) for p in packs],
                p_sizes=((self.prenet_out_units[0],) + self.prenet_out_units
                         if self.use_speaker_embed
                         else self.prenet_out_units),
                a_units=self.attention_rnn_out_units,
                d_units=self.decoder_out_units,
                compute_dtype=self.fused_train_dtype)
            if need > ft.VMEM_LIMIT_BYTES:
                reason = (f"estimated VMEM residency {need >> 20} MiB "
                          f"exceeds the {ft.VMEM_LIMIT_BYTES >> 20} MiB "
                          "kernel limit")
        if reason is not None:
            _warn_fused_fallback("[train] " + reason)
        return reason is None

    def _train_scan_fused(self, packs, B, teacher_xs, speaker_embed=None,
                          want_alignments: bool = False):
        """Run ops/fused_train.fused_teacher_scan on this module's bound
        params.  Identical math to the nn.scan over ``_rnn_step`` (verified
        in tests/test_fused_train.py: forward AND gradients); the in-kernel
        dropout/zoneout PRNG streams differ from XLA's threefry — different
        but equally valid randomness.  TRAIN-mode source alignments are
        materialized from the kernel's aux save buffer when
        ``want_alignments`` (or for free whenever a location/forward source
        already streams them for the backward pass); they are
        stop_gradient'ed observational outputs for the train-time plots
        (reference: MetricsSaver on the training graph,
        models/models.py:191-199).  Otherwise alignments return as zeros."""
        from ..ops import fused_train as ft

        def p(module):
            return module.variables["params"]

        prenet_p = p(self.prenets)
        prenet, speaker_row = self._fused_prenet_params(prenet_p,
                                                        speaker_embed)
        al = p(self.attention_lstm)
        query, src_kinds, cumulative, loc_ws, key_folds = \
            self._fused_attention_params()
        op = p(self.output_projection_wrapper)
        l1, l2 = p(self.decoder_lstm1), p(self.decoder_lstm2)
        params = ft.FusedTrainParams(
            prenet=prenet,
            att_lstm=(al["kernel"], al["bias"].reshape(1, -1)),
            query=query,
            outproj=(op["kernel"], op["bias"].reshape(1, -1)),
            lstm1=(l1["kernel"], l1["bias"].reshape(1, -1)),
            lstm2=(l2["kernel"], l2["bias"].reshape(1, -1)))
        keys = tuple(pk.keys if fold is None else pk.keys + fold
                     for pk, fold in zip(packs, key_folds))
        values = tuple(pk.values for pk in packs)
        masks = tuple(pk.mask.astype(jnp.float32) for pk in packs)
        seed = jax.random.randint(self.make_rng("dropout"), (), 0, 1 << 23,
                                  jnp.int32)
        zc_dec = (self.zoneout_factor_cell if self.decoder_version == "v2"
                  else 0.0)
        zo_dec = (self.zoneout_factor_output if self.decoder_version == "v2"
                  else 0.0)
        # alignments are free whenever a location/forward source already
        # streams its aux rows for the backward; additive-only configs only
        # pay the aux DMA when the caller asks for plots
        save_align = want_alignments or any(k != "additive"
                                            for k in src_kinds)
        kw = dict(
            drop_rate=self.drop_rate,
            zc_att=self.zoneout_factor_cell,
            zo_att=self.zoneout_factor_output,
            zc_dec=zc_dec, zo_dec=zo_dec, deterministic=False,
            compute_dtype=self.fused_train_dtype,
            p_dropout=self._fused_prenet_dropout(),
            src_kinds=src_kinds, cumulative=cumulative,
            loc_kernel=max([getattr(m, "attention_kernel", 1)
                            for m in self.attention_mechanisms]),
            save_align=save_align)
        teacher_f = teacher_xs.astype(jnp.float32)
        if self._fused_mesh_shards() > 1:
            out = self._shard_mapped_fused_scan(
                params, keys, values, masks, teacher_f, seed, speaker_row,
                tuple(loc_ws), kw)
        else:
            out = ft.fused_teacher_scan(
                params, keys, values, masks, teacher_f, seed,
                speaker_row=speaker_row, loc_ws=tuple(loc_ws), **kw)
        T_steps = teacher_xs.shape[1]
        if save_align:
            rnn_out, aligns = out
            aligns = tuple(a.astype(self.dtype) for a in aligns)
        else:
            rnn_out = out
            aligns = tuple(
                jnp.zeros((B, T_steps, pk.values.shape[1]), self.dtype)
                for pk in packs)
        return rnn_out.astype(self.dtype), aligns

    def _fused_mesh_shards(self) -> int:
        m = self.fused_mesh
        return 1 if m is None else int(m.devices.size)

    def _shard_mapped_fused_scan(self, params, keys, values, masks,
                                 teacher_f, seed, speaker_row, loc_ws, kw):
        """Run the fused trunk under ``shard_map`` over the mesh batch axis.

        A ``pallas_call`` is an opaque custom call to GSPMD: left alone, the
        sharded train step would all-gather the batch-sharded operands and
        run the full-batch kernel replicated on every device.  shard_map
        instead hands each device its LOCAL batch shard (weights replicated);
        the gradient psum over the mesh axis is inserted by shard_map's
        transpose for the replicated weight operands — the same collective
        GSPMD emits for the XLA scan path (reference behavior preserved:
        train.py:67 MirroredStrategy data parallelism).  The in-kernel PRNG
        seed is decorrelated per device via ``axis_index`` so dropout and
        zoneout masks differ across shards like they do across rows of a
        single-device batch."""
        from jax.sharding import PartitionSpec as P

        from ..ops import fused_train as ft
        mesh = self.fused_mesh
        axis = mesh.axis_names[0]
        assert all(int(mesh.shape[a]) == 1 for a in mesh.axis_names[1:]), (
            "fused trunk shards over the first mesh axis only")
        b = P(axis)

        def local(params, keys, values, masks, teacher, seed, spk, loc_ws):
            seed = seed + jax.lax.axis_index(axis).astype(jnp.int32) \
                * jnp.int32(40507)
            return ft.fused_teacher_scan(params, keys, values, masks,
                                         teacher, seed, speaker_row=spk,
                                         loc_ws=loc_ws, **kw)

        in_specs = (P(), b, b, b, b, P(),
                    b if speaker_row is not None else P(), P())
        out_specs = (b, b) if kw["save_align"] else b
        return jax.shard_map(local, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)(
            params, keys, values, masks, teacher_f, seed, speaker_row,
            loc_ws)

    # -------------------------------------------------- decode path (serial)
    def _decode_path(self, packs, B, num_steps, teacher_xs, mode,
                     teacher_forcing, speaker_embed):
        is_training = mode == DecoderMode.TRAIN
        carry = self._initial_rnn_carry(B, packs)

        go = self._go_frame(B)
        carry["next_input"] = go
        carry["finished"] = jnp.zeros((B, 1), bool)
        if self.use_transformer:
            carry["caches"] = tuple(hop.init_cache(B, num_steps)
                                    for hop in self.transformers)

        if teacher_xs is None:
            dims = self._frame_dims()
            zeros = tuple(jnp.zeros((B, num_steps, C * self.n_feed_frame),
                                    self.dtype) for C in dims)
            teacher_xs = zeros if self.output_kind == "mgclf0" else zeros[0]
        # Helper semantics: next_inputs(time=t) feeds target step t itself
        # (reference: modules/helpers.py:54-58,98-108), i.e. the GO-shifted
        # teacher sequence advanced by one: feed[t] = shifted[t+1].
        teacher_feed = jax.tree_util.tree_map(
            lambda xs: jnp.concatenate(
                [xs[:, 1:], jnp.zeros_like(xs[:, :1])], axis=1), teacher_xs)

        def step(mdl, c, t, teacher_x_t):
            c2, (o2, aligns) = mdl._rnn_step(c, c["next_input"], packs,
                                             speaker_embed,
                                             is_training=is_training)
            y_t = o2
            sa_rows = []
            if mdl.use_transformer:
                new_caches = []
                for hop, cache in zip(mdl.transformers, c2["caches"]):
                    y_t, cache, row = hop.step(y_t, t, cache,
                                               deterministic=not is_training)
                    new_caches.append(cache)
                    sa_rows.append(row)
                c2["caches"] = tuple(new_caches)
            outs_t, stop_t = mdl._heads_full(y_t[:, None, :])
            outs_t = tuple(o[:, 0] for o in outs_t)
            stop_t = stop_t[:, 0]

            finished = c["finished"] | (
                (jax.nn.sigmoid(stop_t) > 0.5) & (t > mdl.min_iters))
            c2["finished"] = finished
            c2["next_input"] = mdl._next_input_from_output(
                outs_t, mode, teacher_forcing, teacher_x_t)
            ys = (outs_t, stop_t, aligns, tuple(sa_rows),
                  jnp.all(finished), finished[:, 0])
            return c2, ys

        scan = nn.scan(step, variable_broadcast="params",
                       split_rngs={"params": False, "dropout": True, "zoneout": True},
                       in_axes=(0, 1), out_axes=0, unroll=self.scan_unroll)
        ts = jnp.arange(num_steps)
        _, (outs_seq, stop_seq, aligns_seq, sa_rows_seq, all_finished_seq,
            row_finished_seq) = scan(self, carry, ts, teacher_feed)

        # stacked on axis 0 = time; move to batch-major
        outs_seq = tuple(jnp.moveaxis(o, 0, 1) for o in outs_seq)
        stop_seq = jnp.moveaxis(stop_seq, 0, 1)
        aligns_seq = tuple(jnp.moveaxis(a, 0, 1) for a in aligns_seq)

        if mode == DecoderMode.INFERENCE:
            any_finish = jnp.any(all_finished_seq)
            first = jnp.argmax(all_finished_seq)
            steps_taken = jnp.where(any_finish, first + 1, num_steps)
            # per-row lengths: the step each row's stop token first fired
            # (inclusive), dynamic_decode's final_sequence_lengths semantics
            # (reference: modules/module.py:777-783); rows that never fire
            # run to the batch-wide stop point
            row_fin = jnp.moveaxis(row_finished_seq, 0, 1)  # (B, T) cumulative
            row_fired = row_fin[:, -1]
            row_first = jnp.argmax(row_fin, axis=1).astype(jnp.int32)
            lengths = jnp.where(row_fired, row_first + 1,
                                steps_taken).astype(jnp.int32)
        else:
            lengths = jnp.full((B,), num_steps, jnp.int32)

        sa_aligns: List[jax.Array] = []
        for hop_rows in sa_rows_seq:  # (T, B, H, max_len) per hop
            rows = jnp.moveaxis(hop_rows, 0, 1)  # (B, T, H, max_len)
            for head in range(rows.shape[2]):
                sa_aligns.append(rows[:, :, head, :])  # (B, T_q, T_k)
        return self._package(outs_seq, stop_seq, aligns_seq, sa_aligns,
                             lengths, num_steps,
                             mask_by_lengths=mode == DecoderMode.INFERENCE)

    # ------------------------------- whole-loop fused Pallas inference
    def _fused_supported(self, B, teacher_alignments) -> bool:
        """The fused kernel covers the serving configuration (see
        ops/fused_decode.py docstring); anything else uses the scan path.
        Falling back with ``fused_inference=True`` logs the reason once so
        the dispatch gate is never config-silent."""
        reason = self._fused_unsupported_reason(B, teacher_alignments)
        if reason is not None:
            _warn_fused_fallback(reason)
        return reason is None

    def _fused_unsupported_reason(self, B, teacher_alignments
                                  ) -> Optional[str]:
        from .attention import AdditiveAttention
        n_hops = (self.self_attention_num_hop if self.use_transformer else 0)
        # VMEM gate: f32 out buffer + KV caches must fit comfortably
        buf_bytes = B * self.max_iters * 4 * (
            self.num_mels * self.outputs_per_step + 1
            + 2 * n_hops * self.self_attention_out_units)
        # batched hop attention runs as block-diagonal matmuls over
        # (S, B*D) concatenated caches (round 5) — the old per-column VPU
        # math grew linearly in B and set a B~4 crossover; the matmul form
        # stays fused at any VMEM-fitting batch (measured: PERF.md batched
        # serving table)
        if buf_bytes > (64 << 20):
            return (f"output/KV buffers need {buf_bytes >> 20} MiB VMEM "
                    "(> 64 MiB gate)")
        if self.output_kind != "single":
            return f"output_kind={self.output_kind!r} (mgclf0 not fused)"
        if self.apply_dropout_on_inference:
            return "inference-time prenet dropout is not fused"
        if teacher_alignments is not None:
            return "forced-alignment replay is not fused"
        return self._fused_attention_unsupported_reason()

    def _fused_prenet_params(self, prenet_p, speaker_embed):
        """Flatten the prenet stack into dense (W, b-row) pairs for the
        fused kernels.

        With speaker conditioning the first stack entry is a
        MultiSpeakerPreNet (dense0 -> ReLU -> +softsign(speaker proj) ->
        dense -> ReLU -> dropout, reference:
        modules/multi_speaker_modules.py:11-35): it contributes TWO dense
        layers plus a per-utterance speaker ROW added after the first ReLU
        — constant across decode steps, so the kernels take it as one
        (B, P0) operand and the softsign projection stays in XLA (keeping
        it differentiable for the training kernel's custom VJP)."""
        def row(b):
            return jnp.asarray(b).reshape(1, -1)
        layers = []
        speaker_row = None
        for i in range(len(self.prenet_out_units)):
            lp = prenet_p[f"prenet_{i}"]
            if i == 0 and self.use_speaker_embed:
                layers.append((lp["dense0"]["kernel"],
                               row(lp["dense0"]["bias"])))
                sp = lp["speaker_projection"]
                s = (jnp.asarray(speaker_embed, jnp.float32)
                     @ jnp.asarray(sp["kernel"], jnp.float32)
                     + jnp.asarray(sp["bias"], jnp.float32))
                speaker_row = jax.nn.soft_sign(s)
            layers.append((lp["dense"]["kernel"], row(lp["dense"]["bias"])))
        return tuple(layers), speaker_row

    def _fused_attention_unsupported_reason(self):
        """Mechanism checks shared by the fused train and (batched-batch
        aside) inference gates."""
        from .attention import (AdditiveAttention, ForwardAttention,
                                LocationSensitiveAttention)
        for m in self.attention_mechanisms:
            if isinstance(m, AdditiveAttention):
                continue
            if isinstance(m, (ForwardAttention, LocationSensitiveAttention)):
                if getattr(m, "smoothing", False):
                    return "sigmoid-smoothing attention is not fused"
                if getattr(m, "use_transition_agent", False):
                    return ("the forward-attention transition agent is "
                            "not fused")
                continue
            return "unsupported attention mechanism: " + type(m).__name__
        loc_kernels = {m.attention_kernel for m in self.attention_mechanisms
                       if isinstance(m, (ForwardAttention,
                                         LocationSensitiveAttention))}
        if len(loc_kernels) > 1:
            return "mixed location-conv kernel sizes are not fused"
        return None

    def _fused_attention_params(self):
        """Per-source attention weights for the fused decode kernel.

        Returns (query, kinds, cumulative, loc_ws, key_folds): the
        (Wq, v) pairs; the kind string per source; the cumulative-weights
        flags; the merged (K, U) conv*location-dense products for
        location-based sources; and the constant (U,) rows — attention
        bias plus conv-bias*location-dense — to fold into the KEYS
        (reference: modules/forward_attention.py:48-86 location-sensitive
        energy)."""
        from .attention import (AdditiveAttention, ForwardAttention,
                                LocationSensitiveAttention)

        def p(module):
            return module.variables["params"]

        query, kinds, cum, loc_ws, folds = [], [], [], [], []
        for m in self.attention_mechanisms:
            mp = p(m)
            if isinstance(m, AdditiveAttention):
                query.append((mp["query_layer"]["kernel"],
                              jnp.transpose(mp["attention_v"])))
                kinds.append("additive")
                cum.append(False)
                loc_ws.append(None)
                folds.append(None)
                continue
            assert isinstance(m, (ForwardAttention,
                                  LocationSensitiveAttention)), type(m)
            query.append((mp["query_layer"]["kernel"],
                          jnp.transpose(mp["attention_variable"])))
            kinds.append("forward" if isinstance(m, ForwardAttention)
                         else "location_sensitive")
            cum.append(bool(m.cumulative_weights))
            conv_k = mp["location_convolution"]["kernel"]   # (K, 1, F)
            conv_b = mp["location_convolution"]["bias"]     # (F,)
            w_loc = mp["location_layer"]["kernel"]          # (F, U)
            K = conv_k.shape[0]
            loc_ws.append(conv_k.reshape(K, -1) @ w_loc)    # (K, U)
            folds.append(mp["attention_bias"] + conv_b @ w_loc)
        return tuple(query), tuple(kinds), tuple(cum), loc_ws, folds

    def _fused_prenet_dropout(self):
        """Per-flattened-layer dropout flags: MultiSpeakerPreNet's dense0
        has NO dropout; every other dense is followed by one."""
        if self.use_speaker_embed:
            return (False,) + (True,) * len(self.prenet_out_units)
        return (True,) * len(self.prenet_out_units)

    def _decode_path_fused(self, packs, B, num_steps, speaker_embed=None):
        """Run ops/fused_decode.fused_decode on this module's bound params.

        Identical math to ``_decode_path`` in INFERENCE mode (verified in
        tests/test_fused_decode.py); decoder self-attention alignment
        probabilities are not materialized (returned as zeros), like the
        ``use_pallas`` attention mode.
        """
        from ..ops import fused_decode as fd

        def p(module):
            return module.variables["params"]

        def row(b):
            return jnp.asarray(b).reshape(1, -1)

        prenet_p = p(self.prenets)
        prenet, speaker_row = self._fused_prenet_params(prenet_p,
                                                        speaker_embed)
        al = p(self.attention_lstm)
        query, src_kinds, cumulative, loc_ws, key_folds = \
            self._fused_attention_params()
        op = p(self.output_projection_wrapper)
        l1, l2 = p(self.decoder_lstm1), p(self.decoder_lstm2)
        hops = []
        for hop in (self.transformers if self.use_transformer else ()):
            att = p(hop)["self_attention"]["attention"]
            flat = []
            for name in ("key_projection", "value_projection",
                         "query_projection", "output_projection"):
                flat += [att[name]["kernel"], row(att[name]["bias"])]
            flat += [p(hop)["transform"]["kernel"],
                     row(p(hop)["transform"]["bias"])]
            hops.append(tuple(flat))
        out_p, stop_p = p(self.out_projection), p(self.stop_token_projection)
        w_os = jnp.concatenate([out_p["kernel"], stop_p["kernel"]], axis=1)
        b_os = row(jnp.concatenate([out_p["bias"], stop_p["bias"]]))
        params = fd.FusedDecodeParams(
            prenet=prenet, att_lstm=(al["kernel"], row(al["bias"])),
            query=query, outproj=(op["kernel"], row(op["bias"])),
            lstm1=(l1["kernel"], row(l1["bias"])),
            lstm2=(l2["kernel"], row(l2["bias"])),
            hops=tuple(hops), head=(w_os, b_os), loc=tuple(loc_ws))
        memory = fd.FusedDecodeMemory(
            keys=tuple(pk.keys if fold is None else pk.keys + fold
                       for pk, fold in zip(packs, key_folds)),
            values=tuple(pk.values for pk in packs),
            masks=tuple(pk.mask.astype(jnp.float32) for pk in packs))
        zc_dec = (self.zoneout_factor_cell if self.decoder_version == "v2"
                  else 0.0)
        zo_dec = (self.zoneout_factor_output if self.decoder_version == "v2"
                  else 0.0)
        out, stop, aligns = fd.fused_decode(
            params, memory, num_steps=num_steps, num_mels=self.num_mels,
            outputs_per_step=self.outputs_per_step,
            n_feed_frame=self.n_feed_frame,
            num_heads=self.self_attention_num_heads,
            zoneout_cell=self.zoneout_factor_cell,
            zoneout_output=self.zoneout_factor_output,
            dec_zoneout_cell=zc_dec, dec_zoneout_output=zo_dec,
            early_stop=self.early_stop, min_iters=self.min_iters,
            compute_dtype=(jnp.bfloat16 if self.fused_dtype == "bfloat16"
                           else jnp.float32),
            speaker_row=speaker_row, src_kinds=src_kinds,
            cumulative=cumulative,
            loc_kernel=max([getattr(m, "attention_kernel", 1)
                            for m in self.attention_mechanisms]))

        # lengths: same stop-token semantics as the scan path, recovered
        # post-hoc from the emitted stop logits — per-row first-fire step
        # (inclusive); rows that never fire run to the batch-wide stop point
        S = num_steps
        fired = ((jax.nn.sigmoid(stop) > 0.5)
                 & (jnp.arange(S)[None, :] > self.min_iters))   # (B, S)
        row_fin = jnp.cumsum(fired.astype(jnp.int32), axis=1) > 0
        all_fin = jnp.all(row_fin, axis=0)                      # (S,)
        steps_taken = jnp.where(jnp.any(all_fin),
                                jnp.argmax(all_fin) + 1, S).astype(jnp.int32)
        row_first = jnp.argmax(row_fin, axis=1).astype(jnp.int32)
        lengths = jnp.where(row_fin[:, -1], row_first + 1,
                            steps_taken).astype(jnp.int32)

        n_hops = len(self.transformers) if self.use_transformer else 0
        sa_aligns = [jnp.zeros((B, S, S), self.dtype)
                     for _ in range(n_hops * self.self_attention_num_heads)]
        return self._package(
            (out.astype(self.dtype),),
            stop[..., None].astype(self.dtype),
            tuple(a.astype(self.dtype) for a in aligns),
            sa_aligns, lengths, num_steps, mask_by_lengths=True)

    # -------------------------------------- inference with early exit
    def _decode_path_while(self, packs, B, num_steps, speaker_embed):
        """dynamic_decode-style early exit: a ``while_loop`` that stops as
        soon as every batch row's stop token has fired (and t > min_iters),
        instead of always scanning to max_iters.  Buffer prefixes match the
        scan path exactly; entries past ``lengths`` stay zero."""
        mode = DecoderMode.INFERENCE
        carry = self._initial_rnn_carry(B, packs)
        carry["next_input"] = self._go_frame(B)
        carry["finished"] = jnp.zeros((B, 1), bool)
        carry["row_lengths"] = jnp.zeros((B,), jnp.int32)
        if self.use_transformer:
            carry["caches"] = tuple(hop.init_cache(B, num_steps)
                                    for hop in self.transformers)
        r = self.outputs_per_step
        dims = self._frame_dims()
        carry["buf_outs"] = tuple(
            jnp.zeros((B, num_steps, C * r), self.dtype) for C in dims)
        carry["buf_stop"] = jnp.zeros((B, num_steps, 1), self.dtype)
        carry["buf_aligns"] = tuple(
            jnp.zeros((B, num_steps, p.values.shape[1]), self.dtype)
            for p in packs)
        n_hops = len(self.transformers) if self.use_transformer else 0
        carry["buf_sa"] = tuple(
            jnp.zeros((B, num_steps, self.self_attention_num_heads,
                       num_steps), self.dtype) for _ in range(n_hops))

        def cond(mdl, c):
            return (~jnp.all(c["finished"])) & (c["time"] < num_steps)

        def body(mdl, c):
            t = c["time"]
            c2, (o2, aligns) = mdl._rnn_step(c, c["next_input"], packs,
                                             speaker_embed, is_training=False)
            y_t = o2
            sa_rows = []
            if mdl.use_transformer:
                new_caches = []
                for hop, cache in zip(mdl.transformers, c2["caches"]):
                    y_t, cache, row = hop.step(y_t, t, cache,
                                               deterministic=True)
                    new_caches.append(cache)
                    sa_rows.append(row)
                c2["caches"] = tuple(new_caches)
            outs_t, stop_t = mdl._heads_full(y_t[:, None, :])
            outs_t = tuple(o[:, 0] for o in outs_t)
            stop_t = stop_t[:, 0]

            c2["finished"] = c["finished"] | (
                (jax.nn.sigmoid(stop_t) > 0.5) & (t > mdl.min_iters))
            # a row's length counts every step up to and including the one
            # where its stop token fired (dynamic_decode semantics)
            c2["row_lengths"] = c["row_lengths"] + (
                ~c["finished"][:, 0]).astype(jnp.int32)
            c2["next_input"] = mdl._next_input_from_output(
                outs_t, mode, False, None)
            c2["buf_outs"] = tuple(
                jax.lax.dynamic_update_slice_in_dim(buf, o[:, None, :], t,
                                                    axis=1)
                for buf, o in zip(c["buf_outs"], outs_t))
            c2["buf_stop"] = jax.lax.dynamic_update_slice_in_dim(
                c["buf_stop"], stop_t[:, None, :], t, axis=1)
            c2["buf_aligns"] = tuple(
                jax.lax.dynamic_update_slice_in_dim(buf, a[:, None, :], t,
                                                    axis=1)
                for buf, a in zip(c["buf_aligns"], aligns))
            c2["buf_sa"] = tuple(
                jax.lax.dynamic_update_slice_in_dim(buf, row[:, None], t,
                                                    axis=1)
                for buf, row in zip(c["buf_sa"], sa_rows))
            return c2

        final = nn.while_loop(cond, body, self, carry)
        lengths = final["row_lengths"]
        sa_aligns: List[jax.Array] = []
        for rows in final["buf_sa"]:  # (B, T_q, H, T_k)
            for head in range(rows.shape[2]):
                sa_aligns.append(rows[:, :, head, :])
        return self._package(final["buf_outs"], final["buf_stop"],
                             final["buf_aligns"], sa_aligns, lengths,
                             num_steps, mask_by_lengths=True)

    def _go_frame(self, B):
        dims = self._frame_dims()
        gos = tuple(jnp.zeros((B, C * self.n_feed_frame), self.dtype)
                    for C in dims)
        return gos if self.output_kind == "mgclf0" else gos[0]

    # ---------------------------------------------------------- packaging
    def _package(self, outs, stop, aligns, sa_aligns, lengths, num_steps,
                 mask_by_lengths: bool = False):
        r = self.outputs_per_step
        dims = self._frame_dims()
        B = outs[0].shape[0]
        if mask_by_lengths:
            # dynamic_decode zeroes emissions at every step after a row's
            # stop token fired; the firing step's emission is kept
            # (reference: tf.contrib.seq2seq.dynamic_decode body)
            valid = (jnp.arange(num_steps)[None, :]
                     < lengths[:, None])                       # (B, S)
            outs = tuple(o * valid[..., None].astype(o.dtype) for o in outs)
            stop = stop * valid[..., None].astype(stop.dtype) \
                if stop.ndim == 3 else stop * valid.astype(stop.dtype)
        main = outs[0].reshape(B, num_steps * r, dims[0])
        second = (outs[1].reshape(B, num_steps * r, dims[1])
                  if self.output_kind == "mgclf0" else None)
        # predicted samples: per reduced step, per frame argmax over channels
        samples = jnp.argmax(
            outs[0].reshape(B, num_steps, r, dims[0]), axis=-1).astype(jnp.int32)
        if stop.ndim == 2:
            stop = stop[..., None]
        # alignment histories to (B, T_mem, T_steps) (reference:
        # models/models.py:108-109 transpose of stacked history)
        alignments = tuple(jnp.swapaxes(a, 1, 2) for a in aligns)
        # decoder self-attention alignments to (B, T_k, T_q)
        sa_aligns = [jnp.swapaxes(a, 1, 2) for a in sa_aligns]
        return DecoderOutput(outputs=main, stop_token=stop,
                             predicted_samples=samples, alignments=alignments,
                             self_attention_alignments=sa_aligns,
                             lengths=lengths, outputs2=second)
