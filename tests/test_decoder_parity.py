"""The central correctness invariant, ported from the reference's only test
(reference: modules/transformer_test.py:44-90): the transformer decoder's
teacher-forced TRAIN path (one RNN scan + post-hoc parallel causal
self-attention) must produce exactly the same outputs, stop tokens, and
sampled ids as the teacher-forced VALIDATION decode path (incremental
KV-cache self-attention inside the scan)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from self_attention_tacotron_tpu.models.attention import AttentionOptions
from self_attention_tacotron_tpu.models.decoder import (
    DecoderMode, TacotronDecoder,
)


def make_decoder(r, C, num_sources=2, use_transformer=True, attention="additive",
                 output_kind="single", **kw):
    opts = tuple(
        AttentionOptions(attention=attention, num_units=16)
        for _ in range(num_sources))
    return TacotronDecoder(
        attention_options=opts, num_sources=num_sources,
        use_transformer=use_transformer, output_kind=output_kind,
        prenet_out_units=(16, 8), attention_rnn_out_units=16,
        decoder_out_units=24, num_mels=C, num_mgcs=C, num_lf0s=C,
        outputs_per_step=r, n_feed_frame=kw.pop("n_feed_frame", r),
        max_iters=20, min_iters=2, self_attention_out_units=24,
        self_attention_num_heads=2, self_attention_num_hop=kw.pop("hops", 1),
        # parity comparisons need determinism: no dropout/zoneout (the
        # reference test also runs with dropout off, transformer_test.py:61)
        drop_rate=kw.pop("drop_rate", 0.0),
        self_attention_drop_rate=kw.pop("self_attention_drop_rate", 0.0),
        **kw)


def random_onehot_target(key, B, T, C):
    ids = jax.random.randint(key, (B, T), 0, C)
    return jax.nn.one_hot(ids, C, dtype=jnp.float32)


@pytest.mark.parametrize("r,B,T_factor,C,hops", [
    (1, 2, 6, 6, 1),
    (2, 1, 4, 4, 2),
    (2, 3, 5, 8, 1),
])
def test_train_path_equals_teacher_forced_decode_path(r, B, T_factor, C, hops):
    T = T_factor * r
    dec = make_decoder(r, C, hops=hops)
    key = jax.random.PRNGKey(12345)
    target = random_onehot_target(key, B, T, C)
    sources = (jax.random.normal(jax.random.PRNGKey(1), (B, 7, 12)),
               jax.random.normal(jax.random.PRNGKey(2), (B, 7, 10)))
    lengths = (jnp.array([7] * B), jnp.array([7] * B))

    variables = dec.init(jax.random.PRNGKey(0), sources, lengths, target,
                         DecoderMode.VALIDATION, True)

    # train path (dropout/zoneout disabled via factors=0 and drop handling)
    out_train = dec.apply(variables, sources, lengths, target,
                          DecoderMode.TRAIN,
                          rngs={"dropout": jax.random.PRNGKey(9),
                                "zoneout": jax.random.PRNGKey(10)})
    # teacher-forced validation decode path
    out_val = dec.apply(variables, sources, lengths, target,
                        DecoderMode.VALIDATION, True)

    np.testing.assert_allclose(np.asarray(out_train.outputs),
                               np.asarray(out_val.outputs),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_train.stop_token),
                               np.asarray(out_val.stop_token),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out_train.predicted_samples),
                                  np.asarray(out_val.predicted_samples))
    # attention alignment histories agree too
    for a_t, a_v in zip(out_train.alignments, out_val.alignments):
        np.testing.assert_allclose(np.asarray(a_t), np.asarray(a_v),
                                   rtol=1e-5, atol=1e-6)


def test_mgclf0_train_equals_teacher_forced_decode():
    r, B, T, C = 2, 2, 8, 6
    dec = make_decoder(r, C, output_kind="mgclf0")
    key = jax.random.PRNGKey(7)
    mgc = jax.random.normal(key, (B, T, C))
    lf0 = random_onehot_target(jax.random.PRNGKey(8), B, T, C)
    sources = (jax.random.normal(jax.random.PRNGKey(1), (B, 5, 12)),
               jax.random.normal(jax.random.PRNGKey(2), (B, 5, 10)))
    lengths = (jnp.array([5] * B), jnp.array([5] * B))
    variables = dec.init(jax.random.PRNGKey(0), sources, lengths, (mgc, lf0),
                         DecoderMode.VALIDATION, True)
    out_train = dec.apply(variables, sources, lengths, (mgc, lf0),
                          DecoderMode.TRAIN,
                          rngs={"dropout": jax.random.PRNGKey(9),
                                "zoneout": jax.random.PRNGKey(10)})
    out_val = dec.apply(variables, sources, lengths, (mgc, lf0),
                        DecoderMode.VALIDATION, True)
    np.testing.assert_allclose(np.asarray(out_train.outputs),
                               np.asarray(out_val.outputs), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_train.outputs2),
                               np.asarray(out_val.outputs2), rtol=1e-5,
                               atol=1e-5)


@pytest.mark.parametrize("attention", ["additive", "location_sensitive", "forward"])
def test_attention_mechanisms_run_in_decoder(attention):
    r, B, T, C = 1, 2, 6, 5
    dec = make_decoder(r, C, num_sources=1, use_transformer=False,
                       attention=attention)
    target = random_onehot_target(jax.random.PRNGKey(3), B, T, C)
    sources = (jax.random.normal(jax.random.PRNGKey(1), (B, 9, 12)),)
    lengths = (jnp.array([9, 6]),)
    variables = dec.init(jax.random.PRNGKey(0), sources, lengths, target,
                         DecoderMode.TRAIN)
    out = dec.apply(variables, sources, lengths, target, DecoderMode.TRAIN,
                    rngs={"dropout": jax.random.PRNGKey(9),
                          "zoneout": jax.random.PRNGKey(10)})
    assert out.outputs.shape == (B, T, C)
    assert out.alignments[0].shape == (B, 9, T)
    a = np.asarray(out.alignments[0])
    # alignments are distributions over memory, masked to length
    np.testing.assert_allclose(a.sum(axis=1), 1.0, rtol=1e-4)
    assert np.all(a[1, 6:, :] < 1e-6)


def test_inference_stops_and_reports_lengths():
    r, B, C = 1, 2, 5
    dec = make_decoder(r, C, num_sources=2, use_transformer=True)
    sources = (jax.random.normal(jax.random.PRNGKey(1), (B, 6, 12)),
               jax.random.normal(jax.random.PRNGKey(2), (B, 6, 10)))
    lengths = (jnp.array([6] * B), jnp.array([6] * B))
    variables = dec.init(jax.random.PRNGKey(0), sources, lengths, None,
                         DecoderMode.INFERENCE)
    out = dec.apply(variables, sources, lengths, None, DecoderMode.INFERENCE)
    # runs up to max_iters without target
    assert out.outputs.shape == (B, 20 * r, C)
    assert int(out.lengths[0]) <= 20


def test_forced_alignment_replay():
    """Teacher alignment replay reproduces the supplied alignment exactly
    (reference: modules/teacher_forcing_attention.py:29-35)."""
    r, B, T, C, M = 1, 1, 4, 5, 6
    opts = (AttentionOptions(attention="teacher_forcing_additive", num_units=16),
            AttentionOptions(attention="teacher_forcing_additive", num_units=16))
    dec = TacotronDecoder(
        attention_options=opts, num_sources=2, use_transformer=True,
        prenet_out_units=(16, 8), attention_rnn_out_units=16,
        decoder_out_units=24, num_mels=C, outputs_per_step=r, n_feed_frame=1,
        max_iters=T, min_iters=1, self_attention_out_units=24,
        self_attention_num_heads=2, self_attention_num_hop=1)
    target = random_onehot_target(jax.random.PRNGKey(3), B, T, C)
    sources = (jax.random.normal(jax.random.PRNGKey(1), (B, M, 12)),
               jax.random.normal(jax.random.PRNGKey(2), (B, M, 10)))
    lengths = (jnp.array([M] * B), jnp.array([M] * B))
    ta = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(5), (B, T, M)))
    variables = dec.init(jax.random.PRNGKey(0), sources, lengths, target,
                         DecoderMode.VALIDATION, False, None, (ta, ta))
    out = dec.apply(variables, sources, lengths, target,
                    DecoderMode.VALIDATION, False, None, (ta, ta))
    np.testing.assert_allclose(np.asarray(out.alignments[0]),
                               np.asarray(jnp.swapaxes(ta, 1, 2)),
                               rtol=1e-6)
