"""Pallas kernels vs pure-JAX reference math (interpret mode on CPU;
scripts/check_pallas.py runs the same checks compiled on the real chip)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from self_attention_tacotron_tpu.ops.pallas_attention import (
    fused_self_attention, incremental_attention_step,
)


def reference_attention(q, k, v, causal):
    D = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(jnp.float32(D))
    if causal:
        T = q.shape[2]
        mask = jnp.tril(jnp.ones((T, T), bool))[None, None]
        scores = jnp.where(mask, scores, -1e9)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("B,H,T,D", [(2, 2, 37, 16), (1, 4, 128, 64),
                                     (1, 2, 200, 16)])
def test_fused_attention_matches_reference(causal, B, H, T, D):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, H, T, D))
    k = jax.random.normal(ks[1], (B, H, T, D))
    v = jax.random.normal(ks[2], (B, H, T, D))
    ref = reference_attention(q, k, v, causal)
    out = fused_self_attention(q, k, v, causal=causal, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_incremental_step_matches_reference():
    B, H, T, D = 2, 2, 24, 16
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    kc = jax.random.normal(ks[0], (B, H, T, D))
    vc = jax.random.normal(ks[1], (B, H, T, D))
    for t in [0, 5, T - 1]:
        q = jax.random.normal(jax.random.fold_in(ks[2], t), (B, H, D))
        scores = jnp.einsum("bhd,bhkd->bhk", q, kc) / jnp.sqrt(jnp.float32(D))
        valid = jnp.arange(T)[None, None, :] <= t
        probs = jax.nn.softmax(jnp.where(valid, scores, -1e9), axis=-1)
        ref = jnp.einsum("bhk,bhkd->bhd", probs, vc)
        out = incremental_attention_step(q, kc, vc, jnp.asarray(t),
                                         interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
