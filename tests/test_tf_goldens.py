"""Cross-implementation goldens: our trunk primitives vs TensorFlow/Keras.

``tests/make_tf_golden_fixtures.py`` (run against the in-env TF 2.21) drove
Keras ``LSTMCell``/``GRUCell``/``Conv1D``+``BatchNormalization`` and a
hand-built Bahdanau energy with fixed weights and stored the outputs.
These tests feed the SAME weights into ``ops/rnn.py``, ``ops/conv.py`` and
``models/attention.py`` — upgrading the trunk's parity story from
"by construction" to "checked against a second independent implementation"
(the same scheme tests/test_audio_golden.py uses for the DSP chain).

Reference math being pinned: @tacotron2 ZoneoutLSTMCell / CBHG GRU / Conv1d
batch norm (SURVEY.md §2.2) and the TF BahdanauAttention energy used by
modules/attentions.py:15-62.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "tf_golden.npz")


@pytest.fixture(scope="module")
def gold():
    assert os.path.exists(FIXTURE), (
        "run tests/make_tf_golden_fixtures.py to (re)generate")
    return np.load(FIXTURE)


def test_zoneout_lstm_cell_matches_keras(gold):
    from self_attention_tacotron_tpu.ops.rnn import ZoneoutLSTMCell

    U = gold["lstm_bias"].shape[0] // 4
    cell = ZoneoutLSTMCell(U)
    variables = {"params": {"kernel": jnp.asarray(gold["lstm_kernel"]),
                            "bias": jnp.asarray(gold["lstm_bias"])}}
    B = gold["lstm_xs"].shape[1]
    carry = ZoneoutLSTMCell.initial_state(B, U)
    hs = []
    for x_t in gold["lstm_xs"]:
        carry, h = cell.apply(variables, carry, jnp.asarray(x_t))
        hs.append(np.asarray(h))
    np.testing.assert_allclose(np.stack(hs), gold["lstm_hs"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(carry[0]), gold["lstm_c"],
                               rtol=1e-5, atol=1e-6)


def test_gru_cell_matches_keras(gold):
    from self_attention_tacotron_tpu.ops.rnn import GRUCell

    U = gold["gru_cand_bias"].shape[0]
    cell = GRUCell(U)
    variables = {"params": {
        "gates/kernel": jnp.asarray(gold["gru_gate_kernel"]),
        "gates/bias": jnp.asarray(gold["gru_gate_bias"]),
        "candidate/kernel": jnp.asarray(gold["gru_cand_kernel"]),
        "candidate/bias": jnp.asarray(gold["gru_cand_bias"])}}
    B = gold["gru_xs"].shape[1]
    h = GRUCell.initial_state(B, U)
    hs = []
    for x_t in gold["gru_xs"]:
        h, _ = cell.apply(variables, h, jnp.asarray(x_t))
        hs.append(np.asarray(h))
    np.testing.assert_allclose(np.stack(hs), gold["gru_hs"],
                               rtol=1e-5, atol=1e-6)


def test_conv1d_batchnorm_matches_keras(gold):
    from self_attention_tacotron_tpu.ops.conv import Conv1dBN

    cout = gold["conv_kernel"].shape[-1]
    k = gold["conv_kernel"].shape[0]
    mod = Conv1dBN(k, cout, activation=None)
    variables = {
        "params": {"conv": {"kernel": jnp.asarray(gold["conv_kernel"])},
                   "bn": {"scale": jnp.asarray(gold["bn_gamma"]),
                          "bias": jnp.asarray(gold["bn_beta"])}},
        "batch_stats": {"bn": {"mean": jnp.asarray(gold["bn_mov_mean"]),
                               "var": jnp.asarray(gold["bn_mov_var"])}}}
    xs = jnp.asarray(gold["conv_xs"])

    train_out, mutated = mod.apply(variables, xs, train=True,
                                   mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(train_out),
                               gold["convbn_train_out"],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mutated["batch_stats"]["bn"]["mean"]),
                               gold["convbn_new_mean"], rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(mutated["batch_stats"]["bn"]["var"]),
                               gold["convbn_new_var"], rtol=1e-5, atol=1e-7)

    infer_out = mod.apply(variables, xs, train=False)
    np.testing.assert_allclose(np.asarray(infer_out),
                               gold["convbn_infer_out"],
                               rtol=1e-4, atol=1e-5)


def test_additive_attention_matches_tf_bahdanau(gold):
    from self_attention_tacotron_tpu.models.attention import AdditiveAttention

    U = gold["bah_v"].shape[0]
    mech = AdditiveAttention(U)
    variables = {"params": {
        "memory_layer": {"kernel": jnp.asarray(gold["bah_wk"])},
        "query_layer": {"kernel": jnp.asarray(gold["bah_wq"])},
        "attention_v": jnp.asarray(gold["bah_v"])[None, :]}}

    def run(v):
        bound = mech.bind(v)
        pack = bound.precompute(jnp.asarray(gold["bah_memory"]),
                                jnp.asarray(gold["bah_lengths"]))
        state = bound.initial_state(gold["bah_memory"].shape[0],
                                    gold["bah_memory"].shape[1])
        probs, _ = bound.step(jnp.asarray(gold["bah_query"]), state, pack)
        return probs

    probs = run(variables)
    np.testing.assert_allclose(np.asarray(probs), gold["bah_probs"],
                               rtol=1e-5, atol=1e-6)
    # masked positions carry exactly zero probability
    lengths = gold["bah_lengths"]
    for b, L in enumerate(lengths):
        assert np.all(np.asarray(probs)[b, L:] == 0.0)
