"""Unit tests for the location-conv window primitives in ops/fused_decode.

``_win_build`` / ``_win_gather`` implement the conv-as-matmul window
matrix and its adjoint on (B*T, 1) flattened columns with block-boundary
masking; both kernels (train fwd/bwd, batched decode) consume them.  The
full-kernel parity tests cover them end-to-end; these pin the primitives
directly against a plain-jnp reference across batch/length/kernel-parity
combinations (even K has an asymmetric tap range — a bug class this
round actually hit)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from self_attention_tacotron_tpu.ops.fused_decode import (_pos_col,
                                                          _tap_masks,
                                                          _taps_nat_mat,
                                                          _win_build,
                                                          _win_gather)


def _ref_shift(x, d):
    n = x.shape[0]
    if abs(d) >= n:
        return jnp.zeros_like(x)
    return jnp.roll(x, -d, axis=0)


@pytest.mark.parametrize("B,T,K", [(2, 7, 10), (2, 7, 31), (3, 5, 1),
                                   (2, 16, 5), (4, 8, 4)])
def test_win_build_and_gather_match_reference(B, T, K):
    n = B * T
    pad = (K - 1) // 2
    pos = _pos_col(B, T)
    taps = _tap_masks(pos, K, T)
    tm = _taps_nat_mat(taps)
    cv = jax.random.normal(jax.random.PRNGKey(B * 100 + K), (n, 1))
    dwin = jax.random.normal(jax.random.PRNGKey(7), (n, K))

    def kernel(cv_ref, tm_ref, dwin_ref, o1_ref, o2_ref):
        o1_ref[...] = _win_build(cv_ref[...], K, tm_ref[...])
        o2_ref[...] = _win_gather(dwin_ref[...] * tm_ref[...], K)

    win, g = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((n, K), jnp.float32),
                   jax.ShapeDtypeStruct((n, 1), jnp.float32)),
        interpret=True)(cv, tm, dwin)

    win_ref = jnp.concatenate(
        [_ref_shift(cv, k - pad) * taps[k] for k in range(K)], axis=1)
    np.testing.assert_allclose(np.asarray(win), np.asarray(win_ref),
                               rtol=1e-6, atol=1e-7)
    g_ref = jnp.zeros((n, 1))
    for k in range(K):
        g_ref = g_ref + _ref_shift(dwin[:, k:k + 1] * taps[k], -(k - pad))
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-6, atol=1e-7)


def test_gather_is_adjoint_of_build():
    """<W(cv), D> == <cv, gather(D_masked)> — the gather IS the transpose
    of the masked window operator (what the training backward relies on)."""
    B, T, K = 3, 11, 7
    n = B * T
    pos = _pos_col(B, T)
    tm = _taps_nat_mat(_tap_masks(pos, K, T))
    cv = jax.random.normal(jax.random.PRNGKey(0), (n, 1))
    d = jax.random.normal(jax.random.PRNGKey(1), (n, K))

    def kernel(cv_ref, tm_ref, d_ref, lhs_ref, rhs_ref):
        win = _win_build(cv_ref[...], K, tm_ref[...])
        lhs_ref[0, 0] = jnp.sum(win * d_ref[...])
        g = _win_gather(d_ref[...] * tm_ref[...], K)
        rhs_ref[0, 0] = jnp.sum(cv_ref[...] * g)

    lhs, rhs = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((1, 1), jnp.float32),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32)),
        interpret=True)(cv, tm, d)
    np.testing.assert_allclose(float(lhs[0, 0]), float(rhs[0, 0]),
                               rtol=1e-5)
