import jax
import jax.numpy as jnp
import numpy as np

from self_attention_tacotron_tpu.ops.attention_core import (
    MultiHeadAttention, SelfAttention, positional_encoding,
)


def test_mha_output_shapes_and_alignments():
    mha = MultiHeadAttention(model_dim=8, num_heads=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 5, 8))
    variables = mha.init(jax.random.PRNGKey(1), x, x, x)
    out, align = mha.apply(variables, x, x, x)
    assert out.shape == (3, 5, 8)
    assert align.shape == (3, 2, 5, 5)
    np.testing.assert_allclose(np.asarray(align.sum(-1)), 1.0, rtol=1e-5)


def test_causal_mask_blocks_future():
    sa = SelfAttention(model_dim=8, num_heads=2, use_subsequent_mask=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 6, 8))
    variables = sa.init(jax.random.PRNGKey(1), x)
    out_full, align = sa.apply(variables, x)
    # alignment rows must be lower-triangular
    a = np.asarray(align[0, 0])
    assert np.allclose(a[np.triu_indices(6, k=1)], 0.0, atol=1e-6)
    # prefix invariance: output at position t must not depend on x[t+1:]
    x2 = x.at[:, 4:].set(99.0)
    out_prefix, _ = sa.apply(variables, x2)
    np.testing.assert_allclose(np.asarray(out_full[:, :4]),
                               np.asarray(out_prefix[:, :4]), rtol=1e-5)


def test_padding_mask_zeroes_padded_keys():
    mha = MultiHeadAttention(model_dim=8, num_heads=2, use_padding_mask=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 8))
    variables = mha.init(jax.random.PRNGKey(1), x, x, x)
    _, align = mha.apply(variables, x, x, x,
                         memory_sequence_length=jnp.array([5, 3]))
    a = np.asarray(align[1, 0])
    assert np.allclose(a[:3, 3:], 0.0, atol=1e-6)


def test_incremental_step_equals_full_causal():
    """The train/infer parity invariant at the attention level: cached
    step-by-step decode == full-sequence causal attention (the reference
    asserts this at the decoder level, reference: modules/transformer_test.py)."""
    T, B, D = 7, 2, 8
    sa = SelfAttention(model_dim=D, num_heads=2, use_subsequent_mask=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, D))
    variables = sa.init(jax.random.PRNGKey(1), x)
    out_full, _ = sa.apply(variables, x)

    cache = sa.apply(variables, B, T, method=SelfAttention.init_cache)
    outs = []
    for t in range(T):
        out_t, cache, _ = sa.apply(variables, x[:, t], jnp.asarray(t), cache,
                                   method=SelfAttention.step)
        outs.append(out_t)
    out_inc = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(out_full), np.asarray(out_inc),
                               rtol=1e-5, atol=1e-6)


def test_positional_encoding():
    pe = positional_encoding(10, 8)
    assert pe.shape == (10, 8)
    np.testing.assert_allclose(np.asarray(pe[0, :4]), 0.0, atol=1e-7)  # sin(0)
    np.testing.assert_allclose(np.asarray(pe[0, 4:]), 1.0, atol=1e-7)  # cos(0)
