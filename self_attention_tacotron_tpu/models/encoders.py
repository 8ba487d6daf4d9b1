"""Encoder stacks.

Parity targets (reference: modules/module.py:30-527 and @tacotron2 EncoderV2):
* ``ZoneoutCBHG``  — conv bank K=1..16 -> maxpool -> 2 conv projections ->
  residual -> (dim-adjust dense) -> 4 highway -> bi-ZoneoutLSTM
  (reference: modules/module.py:30-113).
* ``CBHG`` — same trunk with a bi-GRU (the non-zoneout @tacotron2 variant
  selected by ``use_zoneout_at_encoder=False``, reference:
  modules/module.py:263-270).
* ``SelfAttentionCBHG`` — adds the parallel self-attention branch fed by a
  positional encoding (reference: modules/module.py:116-227).
* ``SelfAttentionTransformer`` — self-attention hop: x + tanh(Dense(MHA(x)))
  (reference: modules/module.py:345-371).
* ``ZoneoutEncoderV1`` / ``EncoderV1WithAccentType`` /
  ``SelfAttentionCBHGEncoder`` / ``SelfAttentionCBHGEncoderWithAccentType``
  (reference: modules/module.py:230-527).
* ``EncoderV2`` — Tacotron-2 conv-stack encoder (@tacotron2, selected by
  hparams ``encoder_v2_*``, reference: hparams.py:77-81).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention_core import SelfAttention, positional_encoding
from ..ops.conv import Conv1dBN, ConvBank, HighwayNet
from ..ops.rnn import BiGRU, BiZoneoutLSTM

glorot = nn.initializers.glorot_uniform()


class _CBHGTrunk(nn.Module):
    """Conv bank -> projections -> residual -> highway stack (shared trunk)."""

    out_units: int
    conv_channels: int
    max_filter_width: int
    projection1_out_channels: int
    projection2_out_channels: int
    num_highway: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, *, train: bool = False):
        half = self.out_units // 2
        banked = ConvBank(self.max_filter_width, self.conv_channels,
                          self.dtype, name="conv_bank")(xs, train=train)
        proj1 = Conv1dBN(3, self.projection1_out_channels, jax.nn.relu,
                         self.dtype, name="proj1")(banked, train=train)
        proj2 = Conv1dBN(3, self.projection2_out_channels, None,
                         self.dtype, name="proj2")(proj1, train=train)
        highway_input = proj2 + xs
        if highway_input.shape[-1] != half:
            highway_input = nn.Dense(half, kernel_init=glorot,
                                     dtype=self.dtype,
                                     name="adjustment_layer")(highway_input)
        h = highway_input
        for i in range(self.num_highway):
            h = HighwayNet(half, self.dtype, name=f"highway_{i}")(h)
        return h


class ZoneoutCBHG(nn.Module):
    out_units: int
    conv_channels: int = 128
    max_filter_width: int = 16
    projection1_out_channels: int = 128
    projection2_out_channels: int = 128
    num_highway: int = 4
    zoneout_factor_cell: float = 0.0
    zoneout_factor_output: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, input_lengths=None, *, is_training: bool = False):
        h = _CBHGTrunk(self.out_units, self.conv_channels,
                       self.max_filter_width, self.projection1_out_channels,
                       self.projection2_out_channels, self.num_highway,
                       self.dtype, name="trunk")(xs, train=is_training)
        return BiZoneoutLSTM(self.out_units // 2, self.zoneout_factor_cell,
                             self.zoneout_factor_output, self.dtype,
                             name="bilstm")(h, input_lengths,
                                            deterministic=not is_training)


class CBHG(nn.Module):
    """Non-zoneout CBHG with bi-GRU recurrence (original Tacotron)."""

    out_units: int
    conv_channels: int = 128
    max_filter_width: int = 16
    projection1_out_channels: int = 128
    projection2_out_channels: int = 128
    num_highway: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, input_lengths=None, *, is_training: bool = False):
        h = _CBHGTrunk(self.out_units, self.conv_channels,
                       self.max_filter_width, self.projection1_out_channels,
                       self.projection2_out_channels, self.num_highway,
                       self.dtype, name="trunk")(xs, train=is_training)
        return BiGRU(self.out_units // 2, self.dtype, name="bigru")(
            h, input_lengths)


class SelfAttentionTransformer(nn.Module):
    """One self-attention hop: x + tanh(Dense(MHA(x)))."""

    out_units: int = 32
    self_attention_out_units: int = 256
    self_attention_num_heads: int = 2
    self_attention_drop_rate: float = 0.05
    use_subsequent_mask: bool = False
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.self_attention = SelfAttention(
            self.self_attention_out_units, self.self_attention_num_heads,
            self.self_attention_drop_rate,
            use_subsequent_mask=self.use_subsequent_mask,
            use_pallas=self.use_pallas, dtype=self.dtype)
        self.transform = nn.Dense(self.out_units, kernel_init=glorot,
                                  dtype=self.dtype)

    def __call__(self, inputs, memory_sequence_length=None,
                 deterministic: bool = True):
        attn_out, alignment = self.self_attention(
            inputs, memory_sequence_length=memory_sequence_length,
            deterministic=deterministic)
        transformed = jnp.tanh(self.transform(attn_out))
        residual = inputs + transformed
        # per-head alignment list (reference returns a python list per head)
        heads = [alignment[:, i] for i in range(alignment.shape[1])]
        return residual, heads

    # --- incremental decode path (decoder hops) -------------------------
    def init_cache(self, batch: int, max_len: int):
        return self.self_attention.init_cache(batch, max_len)

    def step(self, x_t, t, cache, deterministic: bool = True):
        attn_t, new_cache, align_row = self.self_attention.step(
            x_t, t, cache, deterministic=deterministic)
        out_t = x_t + jnp.tanh(self.transform(attn_t))
        return out_t, new_cache, align_row


class SelfAttentionCBHG(nn.Module):
    """CBHG trunk with a parallel positional-encoded self-attention branch.

    Returns (bilstm_out (B,T,out_units), self_attn_out (B,T,sa_units),
    per-head alignments).
    """

    out_units: int
    conv_channels: int = 128
    max_filter_width: int = 16
    projection1_out_channels: int = 128
    projection2_out_channels: int = 128
    num_highway: int = 4
    self_attention_out_units: int = 32
    self_attention_num_heads: int = 2
    zoneout_factor_cell: float = 0.0
    zoneout_factor_output: float = 0.0
    self_attention_drop_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, input_lengths=None, positional_encoding_input=None,
                 *, is_training: bool = False):
        # the highway input feeds both branches (bilstm + self-attention),
        # each with its own highway stack (reference: modules/module.py:194-205)
        half = self.out_units // 2
        banked = ConvBank(self.max_filter_width, self.conv_channels,
                          self.dtype, name="conv_bank")(xs, train=is_training)
        proj1 = Conv1dBN(3, self.projection1_out_channels, jax.nn.relu,
                         self.dtype, name="proj1")(banked, train=is_training)
        proj2 = Conv1dBN(3, self.projection2_out_channels, None, self.dtype,
                         name="proj2")(proj1, train=is_training)
        highway_input = proj2 + xs
        if highway_input.shape[-1] != half:
            highway_input = nn.Dense(half, kernel_init=glorot, dtype=self.dtype,
                                     name="adjustment_layer")(highway_input)
        h = highway_input
        for i in range(self.num_highway):
            h = HighwayNet(half, self.dtype, name=f"highway_{i}")(h)

        sa_in = nn.Dense(self.self_attention_out_units, kernel_init=glorot,
                         dtype=self.dtype,
                         name="self_attention_adjustment_layer")(highway_input)
        for i in range(self.num_highway):
            sa_in = HighwayNet(self.self_attention_out_units, self.dtype,
                               name=f"self_attention_highway_{i}")(sa_in)
        if positional_encoding_input is None:
            positional_encoding_input = positional_encoding(
                xs.shape[1], self.self_attention_out_units, self.dtype)[None]
        sa_with_pe = sa_in + positional_encoding_input
        sa_out, alignment = SelfAttention(
            self.self_attention_out_units, self.self_attention_num_heads,
            self.self_attention_drop_rate, dtype=self.dtype,
            name="self_attention")(sa_with_pe,
                                   memory_sequence_length=input_lengths,
                                   deterministic=not is_training)
        sa_out = sa_out + sa_in

        bilstm_out = BiZoneoutLSTM(half, self.zoneout_factor_cell,
                                   self.zoneout_factor_output, self.dtype,
                                   name="bilstm")(h, input_lengths,
                                                  deterministic=not is_training)
        heads = [alignment[:, i] for i in range(alignment.shape[1])]
        return bilstm_out, sa_out, heads


class ZoneoutEncoderV1(nn.Module):
    """PreNet stack -> (Zoneout)CBHG (reference: modules/module.py:293-342)."""

    cbhg_out_units: int = 256
    conv_channels: int = 128
    max_filter_width: int = 16
    projection1_out_channels: int = 128
    projection2_out_channels: int = 128
    num_highway: int = 4
    prenet_out_units: Tuple[int, ...] = (256, 128)
    drop_rate: float = 0.5
    use_zoneout: bool = False
    zoneout_factor_cell: float = 0.0
    zoneout_factor_output: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, input_lengths=None, *, is_training: bool = False):
        from .prenet import PreNetStack
        h = PreNetStack(self.prenet_out_units, self.drop_rate,
                        dtype=self.dtype, name="prenets")(
            inputs, is_training=is_training)
        if self.use_zoneout:
            return ZoneoutCBHG(self.cbhg_out_units, self.conv_channels,
                               self.max_filter_width,
                               self.projection1_out_channels,
                               self.projection2_out_channels, self.num_highway,
                               self.zoneout_factor_cell,
                               self.zoneout_factor_output, self.dtype,
                               name="cbhg")(h, input_lengths,
                                            is_training=is_training)
        return CBHG(self.cbhg_out_units, self.conv_channels,
                    self.max_filter_width, self.projection1_out_channels,
                    self.projection2_out_channels, self.num_highway,
                    self.dtype, name="cbhg")(h, input_lengths,
                                             is_training=is_training)


class EncoderV1WithAccentType(nn.Module):
    """Dual prenet streams (phoneme + accent type) -> concat -> CBHG
    (reference: modules/module.py:230-290)."""

    cbhg_out_units: int = 256
    conv_channels: int = 128
    max_filter_width: int = 16
    projection1_out_channels: int = 128
    projection2_out_channels: int = 128
    num_highway: int = 4
    prenet_out_units: Tuple[int, ...] = (224, 112)
    accent_type_prenet_out_units: Tuple[int, ...] = (32, 16)
    drop_rate: float = 0.5
    use_zoneout: bool = False
    zoneout_factor_cell: float = 0.0
    zoneout_factor_output: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, accent_type, input_lengths=None,
                 *, is_training: bool = False):
        from .prenet import PreNetStack
        h = PreNetStack(self.prenet_out_units, self.drop_rate,
                        dtype=self.dtype, name="prenets")(
            inputs, is_training=is_training)
        a = PreNetStack(self.accent_type_prenet_out_units, self.drop_rate,
                        dtype=self.dtype, name="accent_type_prenets")(
            accent_type, is_training=is_training)
        concat = jnp.concatenate([h, a], axis=-1)
        cbhg_cls = ZoneoutCBHG if self.use_zoneout else CBHG
        kwargs = dict(zoneout_factor_cell=self.zoneout_factor_cell,
                      zoneout_factor_output=self.zoneout_factor_output
                      ) if self.use_zoneout else {}
        return cbhg_cls(self.cbhg_out_units, self.conv_channels,
                        self.max_filter_width, self.projection1_out_channels,
                        self.projection2_out_channels, self.num_highway,
                        dtype=self.dtype, name="cbhg", **kwargs)(
            concat, input_lengths, is_training=is_training)


class SelfAttentionCBHGEncoder(nn.Module):
    """PreNet -> ZoneoutCBHG -> projection -> N self-attention hops.

    Returns (lstm_out, self_attention_out, alignments)
    (reference: modules/module.py:374-441).
    """

    cbhg_out_units: int = 224
    conv_channels: int = 128
    max_filter_width: int = 16
    projection1_out_channels: int = 128
    projection2_out_channels: int = 128
    num_highway: int = 4
    self_attention_out_units: int = 32
    self_attention_num_heads: int = 2
    self_attention_num_hop: int = 1
    prenet_out_units: Tuple[int, ...] = (256, 128)
    drop_rate: float = 0.5
    zoneout_factor_cell: float = 0.0
    zoneout_factor_output: float = 0.0
    self_attention_drop_rate: float = 0.1
    use_pallas: bool = False
    fused_inference: bool = False  # whole-encoder Pallas kernel at batch 1
    #                                (ops/fused_encoder.py); falls back to
    #                                the XLA path outside its subset
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, input_lengths=None, *, is_training: bool = False):
        from .prenet import PreNetStack
        if (self.fused_inference and not is_training
                and not self.is_initializing() and inputs.shape[0] == 1):
            return self._fused_call(inputs, input_lengths)
        h = PreNetStack(self.prenet_out_units, self.drop_rate,
                        dtype=self.dtype, name="prenets")(
            inputs, is_training=is_training)
        lstm_output = ZoneoutCBHG(self.cbhg_out_units, self.conv_channels,
                                  self.max_filter_width,
                                  self.projection1_out_channels,
                                  self.projection2_out_channels,
                                  self.num_highway, self.zoneout_factor_cell,
                                  self.zoneout_factor_output, self.dtype,
                                  name="cbhg")(h, input_lengths,
                                               is_training=is_training)
        sa = nn.Dense(self.self_attention_out_units, kernel_init=glorot,
                      dtype=self.dtype,
                      name="self_attention_projection_layer")(lstm_output)
        alignments: List[jax.Array] = []
        for i in range(self.self_attention_num_hop):
            sa, heads = SelfAttentionTransformer(
                self.self_attention_out_units, self.self_attention_out_units,
                self.self_attention_num_heads, self.self_attention_drop_rate,
                use_subsequent_mask=False, use_pallas=self.use_pallas,
                dtype=self.dtype,
                name=f"self_attention_{i}")(
                sa, memory_sequence_length=input_lengths,
                deterministic=not is_training)
            alignments.extend(heads)
        return lstm_output, sa, alignments

    def _fused_call(self, inputs, input_lengths):
        """Batch-1 inference through ops/fused_encoder.fused_encode.

        One pallas_call instead of ~150 small XLA ops (weight merges and
        inference-BN folding documented in the kernel module).  Encoder
        self-attention probabilities are not materialized (zeros) — the
        alignment-replay path covers plots, as for the fused decoder."""
        from ..ops import fused_encoder as fe
        from ..ops.attention_core import positional_encoding

        p = self.variables["params"]
        stats = self.variables.get("batch_stats", {})
        row = lambda b: jnp.asarray(b, jnp.float32).reshape(1, -1)

        def bn_fold(conv_p, bn_p, bn_s):
            eps = 1e-3
            scale = (jnp.asarray(bn_p["scale"], jnp.float32)
                     / jnp.sqrt(jnp.asarray(bn_s["var"], jnp.float32) + eps))
            shift = (jnp.asarray(bn_p["bias"], jnp.float32)
                     - jnp.asarray(bn_s["mean"], jnp.float32) * scale)
            w = jnp.asarray(conv_p["kernel"], jnp.float32) * scale
            return w, shift

        prenet = tuple(
            (p["prenets"][f"prenet_{i}"]["dense"]["kernel"],
             row(p["prenets"][f"prenet_{i}"]["dense"]["bias"]))
            for i in range(len(self.prenet_out_units)))

        trunk_p = p["cbhg"]["trunk"]
        trunk_s = stats["cbhg"]["trunk"]
        K = self.max_filter_width
        C = self.conv_channels
        E = int(prenet[-1][1].shape[1])
        pad_g = (K - 1) // 2 if K > 1 else 0
        w_bank = jnp.zeros((K * E, K * C), jnp.float32)
        b_bank = jnp.zeros((1, K * C), jnp.float32)
        for k in range(1, K + 1):
            cp = trunk_p["conv_bank"][f"conv1d_K{k}"]
            cs = trunk_s["conv_bank"][f"conv1d_K{k}"]
            wk, sk = bn_fold(cp["conv"], cp["bn"], cs["bn"])   # (k, E, C)
            b_bank = b_bank.at[0, (k - 1) * C:k * C].set(sk)
            for j in range(k):
                kk = j - (k - 1) // 2 + pad_g
                w_bank = w_bank.at[kk * E:(kk + 1) * E,
                                   (k - 1) * C:k * C].set(wk[j])

        def proj_fold(name, taps):
            cp, cs = trunk_p[name], trunk_s[name]
            w, sh = bn_fold(cp["conv"], cp["bn"], cs["bn"])   # (taps, In, O)
            return (w.reshape(taps * w.shape[1], w.shape[2]), row(sh))

        w_proj1 = proj_fold("proj1", 3)
        w_proj2 = proj_fold("proj2", 3)
        w_adj = None
        if "adjustment_layer" in trunk_p:
            w_adj = (trunk_p["adjustment_layer"]["kernel"],
                     row(trunk_p["adjustment_layer"]["bias"]))
        highway = tuple(
            (jnp.concatenate([trunk_p[f"highway_{i}"]["H"]["kernel"],
                              trunk_p[f"highway_{i}"]["T"]["kernel"]],
                             axis=1),
             row(jnp.concatenate([trunk_p[f"highway_{i}"]["H"]["bias"],
                                  trunk_p[f"highway_{i}"]["T"]["bias"]])))
            for i in range(self.num_highway))

        def fold_forget(b):
            q = b.shape[0] // 4
            return jnp.asarray(b, jnp.float32).at[2 * q:3 * q].add(1.0)

        bl = p["cbhg"]["bilstm"]
        w_lstm = jnp.concatenate([bl["fw"]["kernel"], bl["bw"]["kernel"]],
                                 axis=0)
        b_lstm = jnp.stack([fold_forget(bl["fw"]["bias"]),
                            fold_forget(bl["bw"]["bias"])], axis=0)

        sa_proj = (p["self_attention_projection_layer"]["kernel"],
                   row(p["self_attention_projection_layer"]["bias"]))
        hops = []
        for i in range(self.self_attention_num_hop):
            hp_ = p[f"self_attention_{i}"]
            att = hp_["self_attention"]["attention"]
            w_kvq = jnp.concatenate(
                [att["key_projection"]["kernel"],
                 att["value_projection"]["kernel"],
                 att["query_projection"]["kernel"]], axis=1)
            b_kvq = row(jnp.concatenate(
                [att["key_projection"]["bias"],
                 att["value_projection"]["bias"],
                 att["query_projection"]["bias"]]))
            wo, bo = (att["output_projection"]["kernel"],
                      att["output_projection"]["bias"])
            wt, bt = hp_["transform"]["kernel"], hp_["transform"]["bias"]
            hops.append((w_kvq, b_kvq, wo @ wt, row(bo @ wt + bt)))

        params = fe.FusedEncoderParams(
            prenet=prenet, w_bank=(w_bank, b_bank), w_proj1=w_proj1,
            w_proj2=w_proj2, w_adjust=w_adj, highway=highway,
            lstm=(w_lstm, b_lstm), sa_proj=sa_proj, hops=tuple(hops))

        T = inputs.shape[1]
        half = self.cbhg_out_units // 2
        L = (input_lengths[0] if input_lengths is not None
             else jnp.asarray(T, jnp.int32))
        pe = positional_encoding(T, self.self_attention_out_units,
                                 jnp.float32)
        lstm_out, sa = fe.fused_encode(
            params, inputs, L, pe, max_filter_width=K, conv_channels=C,
            half=half, sa_units=self.self_attention_out_units,
            num_heads=self.self_attention_num_heads,
            zoneout_cell=self.zoneout_factor_cell,
            zoneout_output=self.zoneout_factor_output)
        aligns = [jnp.zeros((1, T, T), self.dtype)
                  for _ in range(self.self_attention_num_hop
                                 * self.self_attention_num_heads)]
        return (lstm_out.astype(self.dtype), sa.astype(self.dtype), aligns)


class SelfAttentionCBHGEncoderWithAccentType(nn.Module):
    """Accent-type variant of SelfAttentionCBHGEncoder
    (reference: modules/module.py:444-527)."""

    cbhg_out_units: int = 224
    conv_channels: int = 128
    max_filter_width: int = 16
    projection1_out_channels: int = 128
    projection2_out_channels: int = 128
    num_highway: int = 4
    self_attention_out_units: int = 32
    self_attention_num_heads: int = 2
    self_attention_num_hop: int = 1
    prenet_out_units: Tuple[int, ...] = (224, 112)
    accent_type_prenet_out_units: Tuple[int, ...] = (32, 16)
    drop_rate: float = 0.5
    zoneout_factor_cell: float = 0.0
    zoneout_factor_output: float = 0.0
    self_attention_drop_rate: float = 0.1
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, accent_type, input_lengths=None,
                 *, is_training: bool = False):
        from .prenet import PreNetStack
        h = PreNetStack(self.prenet_out_units, self.drop_rate,
                        dtype=self.dtype, name="prenets")(
            inputs, is_training=is_training)
        a = PreNetStack(self.accent_type_prenet_out_units, self.drop_rate,
                        dtype=self.dtype, name="accent_type_prenets")(
            accent_type, is_training=is_training)
        concat = jnp.concatenate([h, a], axis=-1)
        lstm_output = ZoneoutCBHG(self.cbhg_out_units, self.conv_channels,
                                  self.max_filter_width,
                                  self.projection1_out_channels,
                                  self.projection2_out_channels,
                                  self.num_highway, self.zoneout_factor_cell,
                                  self.zoneout_factor_output, self.dtype,
                                  name="cbhg")(concat, input_lengths,
                                               is_training=is_training)
        sa = nn.Dense(self.self_attention_out_units, kernel_init=glorot,
                      dtype=self.dtype,
                      name="self_attention_projection_layer")(lstm_output)
        alignments: List[jax.Array] = []
        for i in range(self.self_attention_num_hop):
            sa, heads = SelfAttentionTransformer(
                self.self_attention_out_units, self.self_attention_out_units,
                self.self_attention_num_heads, self.self_attention_drop_rate,
                use_subsequent_mask=False, use_pallas=self.use_pallas,
                dtype=self.dtype,
                name=f"self_attention_{i}")(
                sa, memory_sequence_length=input_lengths,
                deterministic=not is_training)
            alignments.extend(heads)
        return lstm_output, sa, alignments


class EncoderV2(nn.Module):
    """Tacotron-2 encoder: N x (conv5 -> BN -> relu -> dropout) -> biLSTM."""

    num_conv_layers: int = 3
    kernel_size: int = 5
    out_units: int = 512
    drop_rate: float = 0.5
    zoneout_factor_cell: float = 0.0
    zoneout_factor_output: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, input_lengths=None, *, is_training: bool = False):
        h = inputs
        for i in range(self.num_conv_layers):
            h = Conv1dBN(self.kernel_size, self.out_units, jax.nn.relu,
                         self.dtype, name=f"conv_{i}")(h, train=is_training)
            h = nn.Dropout(self.drop_rate, deterministic=not is_training)(h)
        return BiZoneoutLSTM(self.out_units // 2, self.zoneout_factor_cell,
                             self.zoneout_factor_output, self.dtype,
                             name="bilstm")(h, input_lengths,
                                            deterministic=not is_training)
