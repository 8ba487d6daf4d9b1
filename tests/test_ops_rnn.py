import jax
import jax.numpy as jnp
import numpy as np

from self_attention_tacotron_tpu.ops.rnn import (
    BiGRU, BiZoneoutLSTM, GRUCell, ZoneoutLSTMCell, reverse_sequence, unroll,
)


def test_lstm_cell_matches_manual_math():
    cell = ZoneoutLSTMCell(num_units=4)
    x = jnp.ones((2, 3))
    carry = ZoneoutLSTMCell.initial_state(2, 4)
    params = cell.init(jax.random.PRNGKey(0), carry, x)
    (c, h), y = cell.apply(params, carry, x)
    # manual recompute
    W = params["params"]["kernel"]
    b = params["params"]["bias"]
    z = jnp.concatenate([x, jnp.zeros((2, 4))], axis=-1)
    gates = z @ W + b
    i, g, f, o = jnp.split(gates, 4, axis=-1)
    exp_c = jax.nn.sigmoid(i) * jnp.tanh(g)  # prev_c = 0
    exp_h = jnp.tanh(exp_c) * jax.nn.sigmoid(o)
    np.testing.assert_allclose(c, exp_c, rtol=1e-6)
    np.testing.assert_allclose(h, exp_h, rtol=1e-6)
    np.testing.assert_allclose(y, exp_h, rtol=1e-6)


def test_zoneout_eval_is_deterministic_expectation():
    cell = ZoneoutLSTMCell(num_units=4, zoneout_factor_cell=0.5,
                           zoneout_factor_output=0.5)
    plain = ZoneoutLSTMCell(num_units=4)
    x = jnp.ones((1, 2))
    carry = ZoneoutLSTMCell.initial_state(1, 4)
    params = cell.init(jax.random.PRNGKey(0), carry, x)
    (c_z, h_z), _ = cell.apply(params, carry, x, deterministic=True)
    (c_p, h_p), _ = plain.apply(params, carry, x)
    # prev state is zero, so eval zoneout halves the update
    np.testing.assert_allclose(c_z, 0.5 * c_p, rtol=1e-6)
    np.testing.assert_allclose(h_z, 0.5 * h_p, rtol=1e-6)


def test_zoneout_train_mixes_old_and_new():
    cell = ZoneoutLSTMCell(num_units=64, zoneout_factor_cell=0.5,
                           zoneout_factor_output=0.5)
    x = jnp.ones((1, 8))
    carry = (jnp.full((1, 64), 7.0), jnp.full((1, 64), -7.0))
    params = cell.init(jax.random.PRNGKey(0), carry, x)
    (c, h), _ = cell.apply(params, carry, x, deterministic=False,
                           rngs={"zoneout": jax.random.PRNGKey(1)})
    # each unit is either the previous value or the fresh value
    kept_prev = np.isclose(np.asarray(c), 7.0).mean()
    assert 0.2 < kept_prev < 0.8


def test_unroll_length_masking_freezes_state():
    B, T, D = 2, 5, 2
    xs = jnp.ones((B, T, D))
    lengths = jnp.array([5, 2])
    from flax import linen as nn

    class Runner(nn.Module):
        @nn.compact
        def __call__(self, xs, lengths):
            c = ZoneoutLSTMCell(num_units=3, name="cell")
            init = ZoneoutLSTMCell.initial_state(xs.shape[0], 3)
            return unroll(c, xs, init, lengths)

    runner = Runner()
    variables = runner.init(jax.random.PRNGKey(0), xs, lengths)
    (final_c, final_h), ys = runner.apply(variables, xs, lengths)
    # outputs past length are zero
    assert np.all(np.asarray(ys[1, 2:]) == 0.0)
    assert np.any(np.asarray(ys[1, :2]) != 0.0)
    # frozen state equals state at t = length
    (_, _), ys_full = runner.apply(variables, xs, jnp.array([5, 5]))
    np.testing.assert_allclose(ys[0], ys_full[0], rtol=1e-6)


def test_reverse_sequence():
    xs = jnp.arange(12, dtype=jnp.float32).reshape(2, 6, 1)
    lengths = jnp.array([3, 6])
    rev = reverse_sequence(xs, lengths)
    np.testing.assert_array_equal(
        np.asarray(rev[0, :, 0]), [2, 1, 0, 3, 4, 5])
    np.testing.assert_array_equal(
        np.asarray(rev[1, :, 0]), [11, 10, 9, 8, 7, 6])


def test_bidirectional_shapes_and_masking():
    model = BiZoneoutLSTM(num_units=4)
    xs = jnp.ones((2, 6, 3))
    lengths = jnp.array([6, 3])
    variables = model.init(jax.random.PRNGKey(0), xs, lengths)
    ys = model.apply(variables, xs, lengths)
    assert ys.shape == (2, 6, 8)
    assert np.all(np.asarray(ys[1, 3:]) == 0.0)
    assert np.any(np.asarray(ys[1, :3]) != 0.0)


def test_gru_cell_gate_bias_ones():
    cell = GRUCell(num_units=4)
    x = jnp.zeros((1, 2))
    carry = GRUCell.initial_state(1, 4)
    params = cell.init(jax.random.PRNGKey(0), carry, x)
    assert np.all(np.asarray(params["params"]["gates/bias"]) == 1.0)
    h, _ = cell.apply(params, carry, x)
    # zero input, zero state: r=u=sigmoid(1), cand=tanh(0)=0 -> h = (1-u)*0 = 0
    np.testing.assert_allclose(h, np.zeros((1, 4)), atol=1e-7)


def test_bigru_runs():
    model = BiGRU(num_units=5)
    xs = jnp.ones((2, 4, 3))
    variables = model.init(jax.random.PRNGKey(0), xs)
    ys = model.apply(variables, xs)
    assert ys.shape == (2, 4, 10)
