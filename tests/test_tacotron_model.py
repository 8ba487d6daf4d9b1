import jax
import jax.numpy as jnp
import numpy as np
import pytest

from self_attention_tacotron_tpu.config import default_hparams
from self_attention_tacotron_tpu.models import (
    Batch, DecoderMode, TacotronModel, compute_loss, tacotron_model_factory,
)


def tiny_hp(**kw):
    hp = default_hparams()
    hp.num_symbols = 30
    hp.embedding_dim = 16
    hp.num_mels = 10
    hp.cbhg_out_units = 16
    hp.conv_channels = 8
    hp.max_filter_width = 4
    hp.projection1_out_channels = 8
    hp.projection2_out_channels = 8
    hp.encoder_prenet_out_units = (16, 8)
    hp.self_attention_out_units = 8
    hp.self_attention_num_heads = 2
    hp.attention1_out_units = 8
    hp.attention2_out_units = 8
    hp.attention_out_units = 12
    hp.decoder_prenet_out_units = (8, 4)
    hp.decoder_out_units = 16
    hp.decoder_self_attention_out_units = 16
    hp.max_iters = 6
    hp.decoder_min_iters = 1
    hp.outputs_per_step = 1
    hp.n_feed_frame = 1
    for k, v in kw.items():
        hp.set_hparam(k, v)
    return hp


def make_batch(hp, B=2, T_in=7, T_out=6, mgclf0=False, seed=0):
    k = jax.random.PRNGKey(seed)
    source = jax.random.randint(k, (B, T_in), 1, hp.num_symbols)
    if mgclf0:
        mgc = jax.random.normal(jax.random.PRNGKey(1), (B, T_out, hp.num_mgcs))
        lf0 = jax.nn.one_hot(
            jax.random.randint(jax.random.PRNGKey(2), (B, T_out), 0, hp.num_lf0s),
            hp.num_lf0s)
        target = (mgc, lf0)
    else:
        target = jax.nn.one_hot(
            jax.random.randint(jax.random.PRNGKey(2), (B, T_out), 0, hp.num_mels),
            hp.num_mels)
    r = hp.outputs_per_step
    steps = T_out // r
    done = jnp.concatenate([jnp.zeros((B, steps - 1)), jnp.ones((B, 1))], 1)
    return Batch(
        source=source, source_length=jnp.array([T_in] * B),
        target=target, target_length=jnp.array([T_out] * B),
        done=done, spec_loss_mask=jnp.ones((B, T_out)),
        binary_loss_mask=jnp.ones((B, steps)),
        speaker_id=jnp.zeros((B,), jnp.int32),
        accent_type=jnp.zeros((B, T_in), jnp.int32))


def init_and_run(hp, batch, mode=DecoderMode.TRAIN, **call_kw):
    model = tacotron_model_factory(hp)
    rngs = {"params": jax.random.PRNGKey(0)}
    variables = model.init(rngs, batch, DecoderMode.VALIDATION, True)
    run_rngs = {"dropout": jax.random.PRNGKey(1),
                "zoneout": jax.random.PRNGKey(2)}
    mutable = ["batch_stats"] if mode == DecoderMode.TRAIN else []
    out = model.apply(variables, batch, mode, rngs=run_rngs, mutable=mutable,
                      **call_kw)
    if mutable:
        out = out[0]
    return model, variables, out


def test_flagship_dual_source_code_model_train():
    hp = tiny_hp()
    batch = make_batch(hp)
    model, variables, out = init_and_run(hp, batch)
    B, T, C = 2, 6, hp.num_mels
    assert out.outputs.shape == (B, T, C)
    assert out.code_output.shape == (B, T, C)
    # one-hot rows
    np.testing.assert_allclose(np.asarray(out.code_output.sum(-1)), 1.0)
    assert out.alignments[0].shape == (B, 7, T)
    assert out.alignments[1].shape == (B, 7, T)
    assert len(out.encoder_self_attention_alignments) == 2  # 1 hop x 2 heads
    losses = compute_loss(hp, out, batch, variables["params"])
    assert float(losses["loss"]) > 0
    assert "code_loss" in losses and "done_loss" in losses


def test_flagship_inference_runs_without_target():
    hp = tiny_hp()
    batch = make_batch(hp)._replace(target=None, done=None)
    model = tacotron_model_factory(hp)
    train_batch = make_batch(hp)
    variables = TacotronModel(hp=hp).init(
        {"params": jax.random.PRNGKey(0)}, train_batch,
        DecoderMode.VALIDATION, True)
    out = TacotronModel(hp=hp).apply(variables, batch, DecoderMode.INFERENCE)
    assert out.outputs.shape == (2, hp.max_iters, hp.num_mels)
    assert len(out.decoder_self_attention_alignments) == 2


def test_forced_alignment_double_pass():
    """Forced-alignment mode: pass 1 free-run, pass 2 replays alignments
    (reference: models/models.py:118-148)."""
    hp = tiny_hp(use_forced_alignment_mode=True)
    batch = make_batch(hp)
    model = tacotron_model_factory(hp)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                           DecoderMode.VALIDATION, True)
    out1 = model.apply(variables, batch, DecoderMode.VALIDATION, True)
    teacher = tuple(jnp.swapaxes(a, 1, 2) for a in out1.alignments)
    out2 = model.apply(variables, batch, DecoderMode.VALIDATION, False,
                       teacher)
    # replayed alignments equal the first pass alignments
    for a1, a2 in zip(out1.alignments, out2.alignments):
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-6)


def test_extended_tacotron_v1_mel_model():
    hp = tiny_hp(tacotron_model="ExtendedTacotronV1Model",
                 encoder="ZoneoutEncoderV1", decoder="ExtendedDecoder",
                 num_mels=8, outputs_per_step=2, n_feed_frame=2)
    batch = make_batch(hp, T_out=6)
    model, variables, out = init_and_run(hp, batch)
    assert out.outputs.shape == (2, 6, 8)
    assert out.code_output is None
    losses = compute_loss(hp, out, batch, variables["params"])
    assert "mel_loss" in losses


def test_extended_tacotron_v1_with_postnet():
    hp = tiny_hp(tacotron_model="ExtendedTacotronV1Model",
                 encoder="ZoneoutEncoderV1", decoder="ExtendedDecoder",
                 num_mels=8, use_postnet_v2=True, num_postnet_v2_layers=2,
                 postnet_v2_out_channels=8)
    batch = make_batch(hp, T_out=6)
    model, variables, out = init_and_run(hp, batch)
    assert out.postnet_outputs is not None
    losses = compute_loss(hp, out, batch, variables["params"])
    assert "postnet_loss" in losses


def test_mgclf0_model():
    hp = tiny_hp(tacotron_model="DualSourceSelfAttentionMgcLf0TacotronModel",
                 decoder="DualSourceMgcLf0TransformerDecoder",
                 num_mgcs=6, num_lf0s=8)
    batch = make_batch(hp, mgclf0=True)
    model, variables, out = init_and_run(hp, batch)
    assert out.outputs.shape == (2, 6, 6)
    assert out.outputs2.shape == (2, 6, 8)
    losses = compute_loss(hp, out, batch, variables["params"])
    assert "mgc_loss" in losses and "lf0_loss" in losses


def test_multi_speaker_routing():
    hp = tiny_hp(use_speaker_embedding=True, num_speakers=3,
                 speaker_embedding_dim=4, speaker_embedd_to_decoder=True,
                 speaker_embedding_projection_out_dim=6)
    batch = make_batch(hp)
    model, variables, out = init_and_run(hp, batch)
    assert out.outputs.shape == (2, 6, hp.num_mels)


def test_accent_type_encoder():
    hp = tiny_hp(use_accent_type=True,
                 encoder="SelfAttentionCBHGEncoderWithAccentType",
                 encoder_prenet_out_units_if_accent=(12, 6),
                 accent_type_prenet_out_units=(4, 2),
                 accent_type_embedding_dim=4, num_accent_type=5,
                 accent_type_offset=0)
    batch = make_batch(hp)
    model, variables, out = init_and_run(hp, batch)
    assert out.outputs.shape == (2, 6, hp.num_mels)


def test_l2_regularization_toggles():
    hp = tiny_hp(use_l2_regularization=True, l2_regularization_weight=1e-3)
    batch = make_batch(hp)
    model, variables, out = init_and_run(hp, batch)
    losses = compute_loss(hp, out, batch, variables["params"])
    assert float(losses["l2_regularization_loss"]) > 0
