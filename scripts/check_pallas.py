"""Compile-and-verify the Pallas kernels on the real TPU chip.

Run directly (no pytest env forcing CPU): python scripts/check_pallas.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from self_attention_tacotron_tpu.ops.pallas_attention import (  # noqa: E402
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


def main():
    print("devices:", jax.devices())
    ok = True
    for causal in (False, True):
        for (B, H, T, D) in [(2, 2, 200, 16), (1, 2, 450, 128)]:
            ks = jax.random.split(jax.random.PRNGKey(0), 3)
            q = jax.random.normal(ks[0], (B, H, T, D))
            k = jax.random.normal(ks[1], (B, H, T, D))
            v = jax.random.normal(ks[2], (B, H, T, D))
            ref = np.asarray(reference_attention(q, k, v, causal))
            out = np.asarray(jax.jit(
                lambda q, k, v: fused_self_attention(q, k, v, causal=causal)
            )(q, k, v))
            err = np.abs(out - ref).max()
            print(f"fused causal={causal} {(B,H,T,D)}: max err {err:.2e}")
            ok &= err < 5e-3  # TPU matmul default precision

    B, H, T, D = 1, 2, 450, 128
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    kc = jax.random.normal(ks[0], (B, H, T, D))
    vc = jax.random.normal(ks[1], (B, H, T, D))
    q = jax.random.normal(ks[2], (B, H, D))
    t = jnp.asarray(17)
    scores = jnp.einsum("bhd,bhkd->bhk", q, kc) / jnp.sqrt(jnp.float32(D))
    valid = jnp.arange(T)[None, None, :] <= t
    probs = jax.nn.softmax(jnp.where(valid, scores, -1e9), axis=-1)
    ref = np.asarray(jnp.einsum("bhk,bhkd->bhd", probs, vc))
    step = jax.jit(incremental_attention_step)
    out = np.asarray(step(q, kc, vc, t))
    err = np.abs(out - ref).max()
    print(f"incremental: max err {err:.2e}")
    ok &= err < 5e-3

    # micro-bench the incremental step
    out = step(q, kc, vc, t)
    jax.block_until_ready(out)
    times = []
    for i in range(20):
        t0 = time.perf_counter()
        out = step(q * (1 + i * 1e-6), kc, vc, t)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    print(f"incremental step latency: {min(times) * 1e6:.1f} us")

    print("OK" if ok else "MISMATCH")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
