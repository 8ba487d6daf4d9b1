"""Parity of the whole-encoder fused Pallas kernel vs the XLA encoder.

The fused kernel (ops/fused_encoder.py) must reproduce
SelfAttentionCBHGEncoder's inference outputs on the same parameters —
including the folded inference batch-norm, the stacked conv bank, the
per-row length-reversed backward LSTM, and the self-attention hops.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from self_attention_tacotron_tpu.models.encoders import SelfAttentionCBHGEncoder


def _pair(T=13, B=1, length=None, **kw):
    cfg = dict(cbhg_out_units=16, conv_channels=8, max_filter_width=5,
               projection1_out_channels=8, projection2_out_channels=8,
               num_highway=2, self_attention_out_units=8,
               self_attention_num_heads=2, self_attention_num_hop=1,
               prenet_out_units=(16, 8), drop_rate=0.5,
               zoneout_factor_cell=0.1, zoneout_factor_output=0.1)
    cfg.update(kw)
    enc = SelfAttentionCBHGEncoder(**cfg)
    enc_f = SelfAttentionCBHGEncoder(fused_inference=True, **cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, 12))
    lengths = jnp.full((B,), length if length is not None else T, jnp.int32)
    variables = enc.init({"params": jax.random.PRNGKey(0)}, x, lengths,
                         is_training=True)
    ref = enc.apply(variables, x, lengths, is_training=False)
    fused = enc_f.apply(variables, x, lengths, is_training=False)
    return ref, fused


def _check(ref, fused, tol=2e-4):
    np.testing.assert_allclose(np.asarray(fused[0]), np.asarray(ref[0]),
                               rtol=tol, atol=tol, err_msg="lstm_out")
    np.testing.assert_allclose(np.asarray(fused[1]), np.asarray(ref[1]),
                               rtol=tol, atol=tol, err_msg="sa_out")


def test_fused_encoder_matches_xla():
    _check(*_pair())


def test_fused_encoder_short_length():
    """Per-row length semantics: outputs zero past L, backward LSTM walks
    the reversed VALID prefix."""
    ref, fused = _pair(T=13, length=9)
    _check(ref, fused)
    assert np.all(np.asarray(fused[0][:, 9:]) == 0)


def test_fused_encoder_projection_residual_adjust():
    """cbhg_out/2 != residual width exercises the adjustment dense."""
    _check(*_pair(cbhg_out_units=24))


def test_fused_encoder_two_hops_wide_bank():
    _check(*_pair(T=21, max_filter_width=8, self_attention_num_hop=2))


def test_fused_encoder_batched_falls_back():
    """B > 1 uses the XLA path (bit-identical by construction)."""
    ref, fused = _pair(B=2)
    np.testing.assert_array_equal(np.asarray(fused[0]), np.asarray(ref[0]))
