"""Plot-mode alignment replay for the fast serving paths.

The fused whole-loop kernel and Pallas attention mode skip materializing
self-attention probabilities; the predict CLI must still emit the
reference's primary diagnostic (alignment plots, reference:
modules/metrics.py:13-53) via a one-shot einsum-path replay.
"""

import jax
import numpy as np

from self_attention_tacotron_tpu.cli.predict import make_alignment_replay
from self_attention_tacotron_tpu.models import (DecoderMode,
                                                tacotron_model_factory)
from self_attention_tacotron_tpu.parallel import (create_train_state,
                                                  make_predict_step)

from test_tacotron_model import make_batch, tiny_hp


def _state_and_batch(hp):
    model = tacotron_model_factory(hp)
    full = make_batch(hp, B=1, T_in=7, T_out=6)
    state = create_train_state(model, hp, full, jax.random.PRNGKey(0))
    return model, state, full._replace(target=None, done=None)


def test_replay_not_built_for_plain_config():
    hp = tiny_hp()
    model, state, batch = _state_and_batch(hp)
    assert make_alignment_replay(hp, state) is None


def test_replay_fused_decode_alignments():
    hp = tiny_hp(decoder_early_stop=False, decoder_fused_inference=True)
    model, state, batch = _state_and_batch(hp)
    out = make_predict_step(model, hp)(state, batch)
    # the fast path does not materialize hop probabilities
    assert all(np.all(np.asarray(a) == 0)
               for a in out.decoder_self_attention_alignments)

    replay = make_alignment_replay(hp, state)
    assert replay is not None
    plot = replay(batch)
    assert any(np.any(np.asarray(a) != 0)
               for a in plot.decoder_self_attention_alignments)
    # the replay decodes the same utterance (bit-near parity of the paths)
    np.testing.assert_allclose(np.asarray(plot.outputs),
                               np.asarray(out.outputs), rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(plot.lengths),
                                  np.asarray(out.lengths))


def test_replay_pallas_attention_alignments():
    hp = tiny_hp(decoder_early_stop=False, use_pallas_attention=True)
    model, state, batch = _state_and_batch(hp)
    replay = make_alignment_replay(hp, state)
    assert replay is not None
    plot = replay(batch)
    assert any(np.any(np.asarray(a) != 0)
               for a in plot.decoder_self_attention_alignments)
    assert any(np.any(np.asarray(a) != 0)
               for a in plot.encoder_self_attention_alignments)
