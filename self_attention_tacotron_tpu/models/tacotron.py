"""Model assembly: embedding -> encoder -> speaker routing -> decoder (+postnet).

Parity target: the reference's Estimator ``model_fn``
(reference: models/models.py:20-378) and its factories
(``encoder_factory`` :325-346, ``decoder_factory`` :349-368,
``tacotron_model_factory`` :371-378, ``attention factories``
models/attention_factories.py:11-66).

Three model kinds cover the reference's capability surface:
* ``DualSourceSelfAttentionTacotronModel`` — the fork's active model:
  SelfAttentionCBHG encoder (dual outputs) + dual-source transformer decoder
  predicting VQ-code logits (or mel frames).
* ``ExtendedTacotronV1Model`` — the upstream baseline Tacotron (single-source
  additive attention, ExtendedDecoder); the fork's factory raises on it
  (models/models.py:377) but its modules remain, and the reference example
  config examples/ljspeech/tacotron.json requests it, so it is first-class
  here.
* ``DualSourceSelfAttentionMgcLf0TacotronModel`` — the MGC+LF0 dual-stream
  variant (reference: modules/module.py:1565-1686).

The TF Estimator mode-juggling (train op / double eval pass / forced
alignment double decode) lives in ``parallel/train_step.py`` and the CLIs;
this module is the pure model.
"""

from __future__ import annotations

from typing import Any, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import HParams
from ..ops import losses as L
from ..ops.conv import bn_valid_rows
from .attention import AttentionOptions
from .decoder import DecoderMode, DecoderOutput, TacotronDecoder
from .embedding import Embedding, ExternalEmbedding
from .encoders import (EncoderV1WithAccentType, EncoderV2,
                       SelfAttentionCBHGEncoder,
                       SelfAttentionCBHGEncoderWithAccentType,
                       ZoneoutEncoderV1)
from .postnet import PostNetV2

glorot = nn.initializers.glorot_uniform()

MODEL_KINDS = (
    "DualSourceSelfAttentionTacotronModel",
    "ExtendedTacotronV1Model",
    "DualSourceSelfAttentionMgcLf0TacotronModel",
)


class Batch(NamedTuple):
    """Device-side features+labels (host metadata like id/key/text stays in
    the data layer).  Mirrors SourceData/CodeData/MelData
    (reference: datasets/codes/dataset.py:33-63)."""

    source: jax.Array                    # (B, T_in) int32
    source_length: jax.Array             # (B,)
    target: Any = None                   # (B, T, C) or (mgc, lf0) tuple
    target_length: Optional[jax.Array] = None
    done: Optional[jax.Array] = None     # (B, T_steps)
    spec_loss_mask: Optional[jax.Array] = None
    binary_loss_mask: Optional[jax.Array] = None
    speaker_id: Optional[jax.Array] = None
    accent_type: Optional[jax.Array] = None


class TacotronOutput(NamedTuple):
    outputs: jax.Array                       # (B, T, C) raw frames / logits
    stop_token: jax.Array                    # (B, T_steps, 1)
    code_output: Optional[jax.Array]         # (B, T, C) one-hot argmax (codes)
    postnet_outputs: Optional[jax.Array]
    alignments: Tuple[jax.Array, ...]        # per source (B, T_mem, T_steps)
    encoder_self_attention_alignments: List[jax.Array]
    decoder_self_attention_alignments: List[jax.Array]
    lengths: jax.Array
    outputs2: Optional[jax.Array] = None     # lf0 logits (mgclf0)
    predicted_samples: Optional[jax.Array] = None


def attention_options_from_hparams(hp: HParams, dual: bool,
                                   forced: bool = False
                                   ) -> Tuple[AttentionOptions, ...]:
    """reference: models/attention_factories.py:11-66."""
    def mk(attention: str, units: int) -> AttentionOptions:
        return AttentionOptions(
            attention=attention, num_units=units,
            attention_kernel=hp.attention_kernel,
            attention_filters=hp.attention_filters, smoothing=False,
            cumulative_weights=hp.cumulative_weights,
            use_transition_agent=hp.use_forward_attention_transition_agent)
    if dual:
        a1 = hp.forced_alignment_attention if forced else hp.attention
        a2 = hp.forced_alignment_attention2 if forced else hp.attention2
        return (mk(a1, hp.attention1_out_units), mk(a2, hp.attention2_out_units))
    a = hp.forced_alignment_attention if forced else hp.attention
    return (mk(a, hp.attention_out_units),)


def decoder_config_from_hparams(hp: HParams) -> dict:
    """Map the reference decoder name to TacotronDecoder flags
    (reference: models/models.py:349-368 and modules/module.py:530-1686)."""
    name = hp.decoder
    table = {
        "ExtendedDecoder": dict(num_sources=1, use_transformer=False,
                                output_kind="single"),
        "TransformerDecoder": dict(num_sources=1, use_transformer=True,
                                   output_kind="single"),
        "DualSourceDecoder": dict(num_sources=2, use_transformer=False,
                                  output_kind="single"),
        "DualSourceTransformerDecoder": dict(num_sources=2,
                                             use_transformer=True,
                                             output_kind="single"),
        "MgcLf0Decoder": dict(num_sources=1, use_transformer=False,
                              output_kind="mgclf0"),
        "MgcLf0DualSourceDecoder": dict(num_sources=2, use_transformer=False,
                                        output_kind="mgclf0"),
        "DualSourceMgcLf0TransformerDecoder": dict(num_sources=2,
                                                   use_transformer=True,
                                                   output_kind="mgclf0"),
    }
    if name not in table:
        raise ValueError(f"Unknown decoder: {name}")
    return table[name]


class TacotronModel(nn.Module):
    """The unified model; ``hp.tacotron_model`` selects semantics."""

    hp: HParams
    fused_mesh: Any = None  # jax.sharding.Mesh for the fused training trunk
    #                         (shard_map over the batch axis; see
    #                         TacotronDecoder.fused_mesh)

    @property
    def is_mgclf0(self) -> bool:
        return self.hp.tacotron_model == "DualSourceSelfAttentionMgcLf0TacotronModel"

    @property
    def is_code_model(self) -> bool:
        return self.hp.tacotron_model == "DualSourceSelfAttentionTacotronModel"

    @property
    def dual_source(self) -> bool:
        return decoder_config_from_hparams(self.hp)["num_sources"] == 2

    def setup(self):
        hp = self.hp
        assert hp.tacotron_model in MODEL_KINDS, hp.tacotron_model
        dtype = jnp.bfloat16 if hp.compute_dtype == "bfloat16" else jnp.float32
        self._dtype = dtype

        self.embedding = Embedding(hp.num_symbols, hp.embedding_dim,
                                   dtype=dtype)
        if hp.use_accent_type:
            self.accent_embedding = Embedding(hp.num_accent_type,
                                              hp.accent_type_embedding_dim,
                                              index_offset=hp.accent_type_offset,
                                              dtype=dtype)

        # ----- speaker embedding (reference: models/models.py:40-50)
        assert not (hp.use_speaker_embedding and hp.use_external_speaker_embedding)
        if hp.use_speaker_embedding:
            self.speaker_embedding = Embedding(
                hp.num_speakers, hp.speaker_embedding_dim,
                index_offset=hp.speaker_embedding_offset, dtype=dtype)
        elif hp.use_external_speaker_embedding:
            self.speaker_embedding = ExternalEmbedding(
                hp.embedding_file, hp.num_speakers, hp.speaker_embedding_dim,
                index_offset=hp.speaker_embedding_offset, dtype=dtype)
        if hp.speaker_embedding_projection_out_dim > -1:
            self.speaker_projection = nn.Dense(
                hp.speaker_embedding_projection_out_dim, kernel_init=glorot,
                dtype=dtype)

        # ----- encoder (reference: models/models.py:325-346)
        enc = hp.encoder
        common = dict(cbhg_out_units=hp.cbhg_out_units,
                      conv_channels=hp.conv_channels,
                      max_filter_width=hp.max_filter_width,
                      projection1_out_channels=hp.projection1_out_channels,
                      projection2_out_channels=hp.projection2_out_channels,
                      num_highway=hp.num_highway,
                      drop_rate=hp.encoder_prenet_drop_rate,
                      zoneout_factor_cell=hp.zoneout_factor_cell,
                      zoneout_factor_output=hp.zoneout_factor_output,
                      dtype=dtype)
        if enc == "SelfAttentionCBHGEncoder":
            self.encoder = SelfAttentionCBHGEncoder(
                self_attention_out_units=hp.self_attention_out_units,
                self_attention_num_heads=hp.self_attention_num_heads,
                self_attention_num_hop=hp.self_attention_num_hop,
                prenet_out_units=hp.encoder_prenet_out_units,
                self_attention_drop_rate=hp.self_attention_drop_rate,
                use_pallas=hp.use_pallas_attention,
                fused_inference=hp.encoder_fused_inference,
                **common)
        elif enc == "SelfAttentionCBHGEncoderWithAccentType":
            self.encoder = SelfAttentionCBHGEncoderWithAccentType(
                self_attention_out_units=hp.self_attention_out_units,
                self_attention_num_heads=hp.self_attention_num_heads,
                self_attention_num_hop=hp.self_attention_num_hop,
                prenet_out_units=hp.encoder_prenet_out_units_if_accent,
                accent_type_prenet_out_units=hp.accent_type_prenet_out_units,
                self_attention_drop_rate=hp.self_attention_drop_rate,
                use_pallas=hp.use_pallas_attention,
                **common)
        elif enc == "ZoneoutEncoderV1":
            self.encoder = ZoneoutEncoderV1(
                prenet_out_units=hp.encoder_prenet_out_units,
                use_zoneout=hp.use_zoneout_at_encoder, **common)
        elif enc == "EncoderV1WithAccentType":
            self.encoder = EncoderV1WithAccentType(
                prenet_out_units=hp.encoder_prenet_out_units_if_accent,
                accent_type_prenet_out_units=hp.accent_type_prenet_out_units,
                use_zoneout=hp.use_zoneout_at_encoder, **common)
        elif enc == "EncoderV2":
            self.encoder = EncoderV2(
                num_conv_layers=hp.encoder_v2_num_conv_layers,
                kernel_size=hp.encoder_v2_kernel_size,
                out_units=hp.encoder_v2_out_units,
                drop_rate=hp.encoder_v2_drop_rate,
                zoneout_factor_cell=hp.zoneout_factor_cell,
                zoneout_factor_output=hp.zoneout_factor_output, dtype=dtype)
        else:
            raise ValueError(f"Unknown encoder: {enc}")

        # ----- decoder
        cfg = decoder_config_from_hparams(hp)
        self.decoder = TacotronDecoder(
            attention_options=attention_options_from_hparams(
                hp, dual=cfg["num_sources"] == 2),
            prenet_out_units=hp.decoder_prenet_out_units,
            drop_rate=hp.decoder_prenet_drop_rate,
            apply_dropout_on_inference=hp.apply_dropout_on_inference,
            attention_rnn_out_units=hp.attention_out_units,
            decoder_version=hp.decoder_version,
            decoder_out_units=hp.decoder_out_units,
            num_mels=hp.num_mels, num_mgcs=hp.num_mgcs, num_lf0s=hp.num_lf0s,
            outputs_per_step=hp.outputs_per_step,
            n_feed_frame=hp.n_feed_frame, max_iters=hp.max_iters,
            min_iters=hp.decoder_min_iters,
            zoneout_factor_cell=hp.zoneout_factor_cell,
            zoneout_factor_output=hp.zoneout_factor_output,
            self_attention_out_units=hp.decoder_self_attention_out_units,
            self_attention_num_heads=hp.decoder_self_attention_num_heads,
            self_attention_num_hop=hp.decoder_self_attention_num_hop,
            self_attention_drop_rate=hp.decoder_self_attention_drop_rate,
            use_speaker_embed=self._speaker_to_prenet(),
            feedback_softmax=self.is_code_model,
            use_pallas=hp.use_pallas_attention,
            early_stop=hp.decoder_early_stop,
            fused_inference=hp.decoder_fused_inference,
            fused_dtype=hp.decoder_fused_dtype,
            fused_train=hp.decoder_fused_train,
            fused_train_dtype=hp.decoder_fused_train_dtype,
            fused_mesh=self.fused_mesh,
            scan_unroll=hp.decoder_scan_unroll,
            dtype=dtype, **cfg)

        if hp.use_postnet_v2:
            self.postnet = PostNetV2(hp.num_mels, hp.num_postnet_v2_layers,
                                     hp.postnet_v2_kernel_size,
                                     hp.postnet_v2_out_channels,
                                     hp.postnet_v2_drop_rate, dtype=dtype)

    def _speaker_to_prenet(self) -> bool:
        hp = self.hp
        has_speaker = hp.use_speaker_embedding or hp.use_external_speaker_embedding
        return has_speaker and hp.speaker_embedd_to_prenet

    # -------------------------------------------------------------- __call__
    def __call__(self, batch: Batch, mode: DecoderMode = DecoderMode.TRAIN,
                 teacher_forcing: bool = False,
                 teacher_alignments: Optional[Sequence[jax.Array]] = None,
                 want_alignments: bool = False,
                 ) -> TacotronOutput:
        # Remainder batches arrive padded with duplicate rows whose loss
        # masks are zeroed (data/dataset.py pad_model_batch_rows).  Scope a
        # row-validity mask over the forward so TRAIN-mode batch-norm
        # statistics exclude the duplicates — the padded step then equals
        # the unpadded step exactly (loss AND batch_stats).
        valid = None
        if mode == DecoderMode.TRAIN and batch.spec_loss_mask is not None:
            m = batch.spec_loss_mask
            valid = jnp.max(m, axis=tuple(range(1, m.ndim))) > 0
        with bn_valid_rows(valid):
            return self._forward(batch, mode, teacher_forcing,
                                 teacher_alignments, want_alignments)

    def _forward(self, batch: Batch, mode: DecoderMode,
                 teacher_forcing: bool,
                 teacher_alignments: Optional[Sequence[jax.Array]],
                 want_alignments: bool) -> TacotronOutput:
        hp = self.hp
        is_training = mode == DecoderMode.TRAIN

        embedding_output = self.embedding(batch.source)

        # ----- encode (reference: models/models.py:59-62)
        if hp.use_accent_type:
            accent = self.accent_embedding(batch.accent_type)
            enc_out = self.encoder(embedding_output, accent,
                                   input_lengths=batch.source_length,
                                   is_training=is_training)
        else:
            enc_out = self.encoder(embedding_output,
                                   input_lengths=batch.source_length,
                                   is_training=is_training)
        if isinstance(enc_out, tuple):
            encoder_lstm_output, encoder_sa_output, enc_sa_alignments = enc_out
        else:
            encoder_lstm_output, encoder_sa_output = enc_out, None
            enc_sa_alignments = []

        # ----- speaker embedding routing (reference: models/models.py:64-83)
        speaker_embedding_output = None
        if hp.use_speaker_embedding or hp.use_external_speaker_embedding:
            if hp.speaker_for_synthesis > -1:
                sid = jnp.full_like(batch.speaker_id, hp.speaker_for_synthesis)
            else:
                sid = batch.speaker_id
            speaker_embedding_output = self.speaker_embedding(sid)
            if hp.speaker_embedding_projection_out_dim > -1:
                speaker_embedding_output = jax.nn.relu(
                    self.speaker_projection(speaker_embedding_output))
            if hp.speaker_embedd_to_decoder:
                tile = jnp.tile(speaker_embedding_output[:, None, :],
                                (1, encoder_lstm_output.shape[1], 1))
                encoder_lstm_output = jnp.concatenate(
                    [encoder_lstm_output, tile], axis=-1)
                if encoder_sa_output is not None:
                    encoder_sa_output = jnp.concatenate(
                        [encoder_sa_output, tile], axis=-1)

        # ----- decode
        if self.dual_source:
            sources = (encoder_lstm_output, encoder_sa_output)
            lengths = (batch.source_length, batch.source_length)
        else:
            sources = (encoder_lstm_output,)
            lengths = (batch.source_length,)

        dec: DecoderOutput = self.decoder(
            sources, lengths, batch.target, mode=mode,
            teacher_forcing=teacher_forcing,
            speaker_embed=(speaker_embedding_output
                           if self._speaker_to_prenet() else None),
            teacher_alignments=teacher_alignments,
            want_alignments=want_alignments)

        # ----- postnet (residual refinement of mel frames)
        postnet_outputs = None
        if hp.use_postnet_v2:
            postnet_speaker = (speaker_embedding_output
                               if hp.speaker_embedd_to_postnet else None)
            postnet_outputs = dec.outputs + self.postnet(
                dec.outputs, postnet_speaker, is_training=is_training)

        # ----- code one-hot output (reference: models/models.py:101)
        code_output = None
        if self.is_code_model:
            code_output = jax.nn.one_hot(
                jnp.argmax(dec.outputs, axis=-1), hp.num_mels,
                dtype=dec.outputs.dtype)

        # encoder self-attention alignments arranged (B, T_mem, T_q)
        # (reference: models/models.py:105)
        enc_sa_alignments = [jnp.swapaxes(a, 1, 2) for a in enc_sa_alignments]

        return TacotronOutput(
            outputs=dec.outputs, stop_token=dec.stop_token,
            code_output=code_output, postnet_outputs=postnet_outputs,
            alignments=dec.alignments,
            encoder_self_attention_alignments=enc_sa_alignments,
            decoder_self_attention_alignments=dec.self_attention_alignments,
            lengths=dec.lengths, outputs2=dec.outputs2,
            predicted_samples=dec.predicted_samples)


# ------------------------------------------------------------------- losses

def compute_loss(hp: HParams, out: TacotronOutput, batch: Batch,
                 params=None) -> dict:
    """Loss dictionary (reference: models/models.py:153-173).

    Code model:  0.1 * codes_loss + binary done loss (+ optional L2)
    Mel model:   spec_loss (+ postnet spec_loss) + binary done loss (+ L2)
    MgcLf0:      mgc spec_loss + lf0_loss_factor * lf0 classification
                 + binary done loss (+ L2)
    """
    losses = {}
    if hp.tacotron_model == "DualSourceSelfAttentionMgcLf0TacotronModel":
        mgc_target, lf0_target = batch.target
        losses["mgc_loss"] = L.spec_loss(out.outputs, mgc_target,
                                         batch.spec_loss_mask,
                                         hp.code_loss_type)
        losses["lf0_loss"] = hp.lf0_loss_factor * L.classification_loss(
            out.outputs2, lf0_target, batch.spec_loss_mask)
        main = losses["mgc_loss"] + losses["lf0_loss"]
    elif hp.tacotron_model == "DualSourceSelfAttentionTacotronModel":
        losses["code_loss"] = 0.1 * L.codes_loss(
            out.outputs, batch.target, batch.spec_loss_mask, hp.code_loss_type)
        main = losses["code_loss"]
    else:
        losses["mel_loss"] = L.spec_loss(out.outputs, batch.target,
                                         batch.spec_loss_mask,
                                         hp.spec_loss_type)
        main = losses["mel_loss"]
        if out.postnet_outputs is not None:
            losses["postnet_loss"] = L.spec_loss(
                out.postnet_outputs, batch.target, batch.spec_loss_mask,
                hp.spec_loss_type)
            main = main + losses["postnet_loss"]

    losses["done_loss"] = L.binary_loss(out.stop_token, batch.done,
                                        batch.binary_loss_mask)

    reg = 0.0
    if hp.use_l2_regularization and params is not None:
        reg = L.l2_regularization_loss(params, hp.l2_regularization_weight,
                                       L.DEFAULT_L2_BLACKLIST)
    losses["l2_regularization_loss"] = reg
    losses["loss"] = main + losses["done_loss"] + reg
    return losses


# ----------------------------------------------------------------- factories

def tacotron_model_factory(hp: HParams, mesh=None) -> TacotronModel:
    """reference: models/models.py:371-378 (extended to all three kinds).

    ``mesh`` (a jax.sharding.Mesh, >1 device) routes the fused training
    trunk through shard_map over the mesh batch axis; without it a
    batch-sharded train step would replicate the pallas_call per device."""
    if hp.tacotron_model not in MODEL_KINDS:
        raise ValueError(f"Unknown Tacotron model: {hp.tacotron_model}")
    return TacotronModel(hp=hp, fused_mesh=mesh)


def DualSourceSelfAttentionTacotronModel(hp: HParams) -> TacotronModel:
    return TacotronModel(hp=hp.replace(
        tacotron_model="DualSourceSelfAttentionTacotronModel"))


def ExtendedTacotronV1Model(hp: HParams) -> TacotronModel:
    return TacotronModel(hp=hp.replace(
        tacotron_model="ExtendedTacotronV1Model"))


def DualSourceSelfAttentionMgcLf0TacotronModel(hp: HParams) -> TacotronModel:
    return TacotronModel(hp=hp.replace(
        tacotron_model="DualSourceSelfAttentionMgcLf0TacotronModel"))
