"""Microbenchmark the (B*T, 1)-column primitives inside a pallas loop.

The fused training kernels' location/forward machinery runs on (B*T, 1)
columns; the ablations say those sections cost ~5-7 us/step.  This probe
times a tight S-iteration in-kernel loop around each primitive to get a
per-op cost table: elementwise column ops, lane-slice reads/writes of a
(B*T, 128) buffer, pltpu.roll, reshape relayouts (2048,1)<->(32,64), and
an indicator matmul.  Numbers feed the layout decisions in
ops/fused_train.py.

Usage: python scripts/colop_probe.py [rounds]
"""

import functools
import statistics
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, T, S = 32, 64, 256
N = B * T


def make_dma_kernel(K=10):
    """Per iteration: store the column, issue K row-shifted column DMAs
    into a (N, K) scratch, wait, lane-reduce back to a column — the
    DMA-engine alternative to K pltpu.rolls."""

    def kernel(x_ref, aux_ref, o_ref, src, dst, sems):
        pad = (K - 1) // 2

        def it(t, c):
            src[...] = c
            for k in range(K):
                d = k - pad
                ln = N - abs(d)
                s0, d0 = max(0, d), max(0, -d)
                pltpu.make_async_copy(
                    src.at[pl.ds(s0, ln), :],
                    dst.at[pl.ds(d0, ln), k:k + 1], sems.at[k]).start()
            for k in range(K):
                d = k - pad
                ln = N - abs(d)
                s0, d0 = max(0, d), max(0, -d)
                pltpu.make_async_copy(
                    src.at[pl.ds(s0, ln), :],
                    dst.at[pl.ds(d0, ln), k:k + 1], sems.at[k]).wait()
            return jnp.sum(dst[...], axis=1, keepdims=True) * 0.1

        out = jax.lax.fori_loop(0, S, it, x_ref[...])
        o_ref[...] = out

    return kernel


def make_roll_kernel(K=10):
    def kernel(x_ref, aux_ref, o_ref):
        pad = (K - 1) // 2

        def it(t, c):
            cols = [pltpu.roll(c, (-(k - pad)) % N, 0) for k in range(K)]
            return jnp.sum(jnp.concatenate(cols, axis=1), axis=1,
                           keepdims=True) * 0.1

        out = jax.lax.fori_loop(0, S, it, x_ref[...])
        o_ref[...] = out

    return kernel


def make_kernel(body10):
    """Kernel: S iterations, each running ``body10(col, aux) -> col``;
    the carry keeps it serial."""

    def kernel(x_ref, aux_ref, o_ref):
        def it(t, c):
            for _ in range(16):   # amplify: kernel time >> dispatch time
                c = body10(c, aux_ref, t)
            return c

        out = jax.lax.fori_loop(0, S, it, x_ref[...])
        o_ref[...] = out

    return kernel


def run_variant(name, body10, rounds, results):
    x = jax.random.normal(jax.random.PRNGKey(0), (N, 1))
    aux = jax.random.normal(jax.random.PRNGKey(1), (N, 128))
    f = jax.jit(lambda x, a: pl.pallas_call(
        make_kernel(body10),
        out_shape=jax.ShapeDtypeStruct((N, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
    )(x, a))
    y = f(x, aux)
    float(jnp.sum(y))  # compile+sync

    def chain(n):
        z = x
        t0 = time.perf_counter()
        for _ in range(n):
            z = f(z, aux)
        float(jnp.sum(z))
        return time.perf_counter() - t0

    results[name] = (chain, [])


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    results = {}

    def mul10(c, aux, t):
        for _ in range(10):
            c = c * 1.0001 + 0.0001
        return c

    def baseline(c, aux, t):
        return c * 1.0001

    def lane_read4(c, aux, t):
        s = c
        for i in range(4):
            s = s + aux[:, 7 + 13 * i:8 + 13 * i]
        return s * 1.0001

    def roll4(c, aux, t):
        s = c
        for i in range(4):
            s = s + pltpu.roll(c, 1 + i, 0)
        return s * 1.0001

    def reshape_rt(c, aux, t):
        row = c.reshape(B, T)
        row = row * 1.0001 + 0.0001
        return row.reshape(N, 1)

    def row10(c, aux, t):
        row = c.reshape(B, T)
        for _ in range(10):
            row = row * 1.0001 + 0.0001
        return row.reshape(N, 1)

    def ind_mm(c, aux, t):
        # build the block indicator from iotas (constants must not be
        # captured by the kernel)
        r = jax.lax.broadcasted_iota(jnp.int32, (N, B), 0) // T
        cc = jax.lax.broadcasted_iota(jnp.int32, (N, B), 1)
        ind = (r == cc).astype(jnp.float32)
        s = jax.lax.dot_general(
            ind, c, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)         # (B, 1)
        return c + jnp.broadcast_to(s[:, None, :], (B, T, 1)).reshape(N, 1)

    variants = {
        "baseline 1 op": baseline,
        "10 col ops": mul10,
        "4 lane reads": lane_read4,
        "4 rolls": roll4,
        "reshape (B,T) 1 op": reshape_rt,
        "reshape (B,T) 10 ops": row10,
        "ind matmul+bcast": ind_mm,
    }
    for name, b in variants.items():
        t0 = time.time()
        run_variant(name, b, rounds, results)
        print(f"compiled {name} in {time.time()-t0:.0f}s", flush=True)

    # DMA-shift vs roll-based K-tap window (NOT 16x-amplified: these use
    # scratch state; per-body numbers below are comparable to each other
    # and ~16x the table scale above)
    for name, mk in (("dma 10-shift window", make_dma_kernel),
                     ("roll 10-shift window", make_roll_kernel)):
        x = jax.random.normal(jax.random.PRNGKey(0), (N, 1))
        aux = jax.random.normal(jax.random.PRNGKey(1), (N, 128))
        if "dma" in name:
            f = jax.jit(lambda x, a: pl.pallas_call(
                mk(), out_shape=jax.ShapeDtypeStruct((N, 1), jnp.float32),
                scratch_shapes=[pltpu.VMEM((N, 1), jnp.float32),
                                pltpu.VMEM((N, 10), jnp.float32),
                                pltpu.SemaphoreType.DMA((10,))],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 << 20))(x, a))
        else:
            f = jax.jit(lambda x, a: pl.pallas_call(
                mk(), out_shape=jax.ShapeDtypeStruct((N, 1), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 << 20))(x, a))
        try:
            y = f(x, aux); float(jnp.sum(y))
        except Exception as e:
            print(name, "FAIL:", str(e).splitlines()[0][:100])
            continue

        def chain(n, f=f, x=x):
            z = x
            t0 = time.perf_counter()
            for _ in range(n):
                z = f(z, aux)
            float(jnp.sum(z))
            return time.perf_counter() - t0
        accs = []
        for r in range(rounds):
            t2, t6 = chain(2), chain(6)
            accs.append((t6 - t2) / 4 / S * 1e9)
        print(f"{name:22s} {statistics.median(accs):8.0f} ns/step")

    for r in range(rounds):
        for name, (chain, acc) in results.items():
            t2, t6 = chain(2), chain(6)
            acc.append((t6 - t2) / 4 / S / 16 * 1e9)  # ns per body
    for name, (_, acc) in results.items():
        med = statistics.median(acc)
        print(f"{name:22s} {med:8.0f} ns/step")


if __name__ == "__main__":
    main()
