"""while_loop early-exit inference == scan inference on the decoded prefix."""

import jax
import jax.numpy as jnp
import numpy as np

from self_attention_tacotron_tpu.models.attention import AttentionOptions
from self_attention_tacotron_tpu.models.decoder import (
    DecoderMode, TacotronDecoder,
)


def build(early_stop, min_iters=2, max_iters=24):
    opts = tuple(AttentionOptions(attention="additive", num_units=16)
                 for _ in range(2))
    return TacotronDecoder(
        attention_options=opts, num_sources=2, use_transformer=True,
        prenet_out_units=(16, 8), attention_rnn_out_units=16,
        decoder_out_units=24, num_mels=6, outputs_per_step=1, n_feed_frame=1,
        max_iters=max_iters, min_iters=min_iters, self_attention_out_units=24,
        self_attention_num_heads=2, self_attention_num_hop=1,
        drop_rate=0.0, self_attention_drop_rate=0.0, early_stop=early_stop)


def test_early_stop_prefix_matches_scan():
    B = 2
    sources = (jax.random.normal(jax.random.PRNGKey(1), (B, 7, 12)),
               jax.random.normal(jax.random.PRNGKey(2), (B, 7, 10)))
    lengths = (jnp.array([7] * B), jnp.array([7] * B))
    dec_scan = build(early_stop=False)
    dec_while = build(early_stop=True)
    variables = dec_scan.init(jax.random.PRNGKey(0), sources, lengths, None,
                              DecoderMode.INFERENCE)

    out_scan = dec_scan.apply(variables, sources, lengths, None,
                              DecoderMode.INFERENCE)
    out_while = dec_while.apply(variables, sources, lengths, None,
                                DecoderMode.INFERENCE)

    n = int(out_scan.lengths[0])
    assert int(out_while.lengths[0]) == n
    np.testing.assert_allclose(np.asarray(out_while.outputs[:, :n]),
                               np.asarray(out_scan.outputs[:, :n]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_while.stop_token[:, :n]),
                               np.asarray(out_scan.stop_token[:, :n]),
                               rtol=1e-5, atol=1e-6)
    for a_w, a_s in zip(out_while.alignments, out_scan.alignments):
        np.testing.assert_allclose(np.asarray(a_w[:, :, :n]),
                                   np.asarray(a_s[:, :, :n]),
                                   rtol=1e-5, atol=1e-6)
    # entries past the stop point are zero in the while path
    if n < out_while.outputs.shape[1]:
        assert np.all(np.asarray(out_while.outputs[:, n:]) == 0.0)


def test_early_stop_honors_max_iters():
    """With min_iters >= max_iters the loop must run to the cap."""
    B = 1
    sources = (jax.random.normal(jax.random.PRNGKey(1), (B, 5, 12)),
               jax.random.normal(jax.random.PRNGKey(2), (B, 5, 10)))
    lengths = (jnp.array([5]), jnp.array([5]))
    dec = build(early_stop=True, min_iters=100, max_iters=8)
    variables = dec.init(jax.random.PRNGKey(0), sources, lengths, None,
                         DecoderMode.INFERENCE)
    out = dec.apply(variables, sources, lengths, None, DecoderMode.INFERENCE)
    assert int(out.lengths[0]) == 8
