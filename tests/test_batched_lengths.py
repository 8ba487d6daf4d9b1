"""Per-utterance decode lengths in batched inference.

The reference's ``dynamic_decode`` yields per-row sequence lengths and zeroes
emissions after each row's stop token fires
(reference: modules/module.py:777-783, tf.contrib.seq2seq.dynamic_decode).
A batch of utterances stopping at different steps must therefore come back
with different ``lengths`` and zero tails — for the scan path, the
while_loop early-exit path, and the fused kernel alike.

Rows are independent through the decoder (no cross-batch ops), so each row
of a B=3 decode must match its own B=1 decode exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from self_attention_tacotron_tpu.models.attention import AttentionOptions
from self_attention_tacotron_tpu.models.decoder import (
    DecoderMode, TacotronDecoder,
)

MAX_ITERS = 24
MIN_ITERS = 2


def build(early_stop=False):
    opts = tuple(AttentionOptions(attention="additive", num_units=16)
                 for _ in range(2))
    return TacotronDecoder(
        attention_options=opts, num_sources=2, use_transformer=True,
        prenet_out_units=(16, 8), attention_rnn_out_units=16,
        decoder_out_units=24, num_mels=6, outputs_per_step=1, n_feed_frame=1,
        max_iters=MAX_ITERS, min_iters=MIN_ITERS, self_attention_out_units=24,
        self_attention_num_heads=2, self_attention_num_hop=1,
        drop_rate=0.0, self_attention_drop_rate=0.0, early_stop=early_stop)


def _make_inputs(B, seed=27):
    sources = (jax.random.normal(jax.random.PRNGKey(seed), (B, 7, 12)),
               jax.random.normal(jax.random.PRNGKey(seed + 1), (B, 7, 10)))
    lengths = (jnp.array([7] * B), jnp.array([7] * B))
    return sources, lengths


@pytest.fixture(scope="module")
def batch3():
    """B=3 decode + the three matching B=1 decodes on shared params."""
    dec = build()
    sources, lengths = _make_inputs(3)
    variables = dec.init(jax.random.PRNGKey(0), sources, lengths, None,
                         DecoderMode.INFERENCE)
    out = dec.apply(variables, sources, lengths, None, DecoderMode.INFERENCE)
    singles = []
    for b in range(3):
        src_b = tuple(s[b:b + 1] for s in sources)
        len_b = tuple(l[b:b + 1] for l in lengths)
        singles.append(dec.apply(variables, src_b, len_b, None,
                                 DecoderMode.INFERENCE))
    return dec, variables, sources, lengths, out, singles


def test_rows_stop_at_different_steps(batch3):
    _, _, _, _, out, singles = batch3
    lens = np.asarray(out.lengths)
    # the fixed seed yields three genuinely different per-row lengths
    # (seed 27: [24, 4, 9] — one row never fires and is capped at the
    # batch-wide stop point, two fire at distinct steps)
    assert len(set(lens.tolist())) == 3, lens
    assert sum(int(l) < MAX_ITERS for l in lens) >= 2, lens


def test_per_row_lengths_match_single_runs(batch3):
    _, _, _, _, out, singles = batch3
    for b, single in enumerate(singles):
        assert int(out.lengths[b]) == int(single.lengths[0]), b


def test_per_row_outputs_match_single_runs(batch3):
    _, _, _, _, out, singles = batch3
    for b, single in enumerate(singles):
        n = int(out.lengths[b])
        np.testing.assert_allclose(np.asarray(out.outputs[b, :n]),
                                   np.asarray(single.outputs[0, :n]),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out.stop_token[b, :n]),
                                   np.asarray(single.stop_token[0, :n]),
                                   rtol=1e-5, atol=1e-6)


def test_post_stop_frames_are_zero(batch3):
    _, _, _, _, out, _ = batch3
    for b in range(3):
        n = int(out.lengths[b])
        assert np.all(np.asarray(out.outputs[b, n:]) == 0.0)
        assert np.all(np.asarray(out.stop_token[b, n:]) == 0.0)
        assert np.all(np.asarray(out.predicted_samples[b, n:]) == 0)


def test_while_path_matches_scan_per_row(batch3):
    _, variables, sources, lengths, out_scan, _ = batch3
    dec_while = build(early_stop=True)
    out_while = dec_while.apply(variables, sources, lengths, None,
                                DecoderMode.INFERENCE)
    np.testing.assert_array_equal(np.asarray(out_while.lengths),
                                  np.asarray(out_scan.lengths))
    for b in range(3):
        n = int(out_scan.lengths[b])
        np.testing.assert_allclose(np.asarray(out_while.outputs[b, :n]),
                                   np.asarray(out_scan.outputs[b, :n]),
                                   rtol=1e-5, atol=1e-6)
        assert np.all(np.asarray(out_while.outputs[b, n:]) == 0.0)


def test_unfired_rows_run_to_batch_stop_point():
    """A row whose stop never fires gets the batch-wide stop step, not
    max_iters (dynamic_decode: unfinished rows get the executed iteration
    count when the loop exits)."""
    dec = build(early_stop=True)
    sources, lengths = _make_inputs(3)
    variables = dec.init(jax.random.PRNGKey(0), sources, lengths, None,
                         DecoderMode.INFERENCE)
    out = dec.apply(variables, sources, lengths, None, DecoderMode.INFERENCE)
    # every length is bounded by the executed step count (max of lengths)
    assert int(np.max(np.asarray(out.lengths))) <= MAX_ITERS
