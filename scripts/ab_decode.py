"""Interleaved A/B timing of fused-decode variants in ONE process.

Cross-invocation timings on the tunneled chip drift (clock states): the
HBM-bound scan path repeats to ~2 % while the latency-bound fused kernel
moves ~20 % between runs.  This harness compiles every variant up front,
then times them in interleaved rounds so all variants see the same chip
state; per-variant result is the median over rounds of the chained-
dispatch estimate (see bench.py docstring).

Usage: python scripts/ab_decode.py [rounds]
"""

import os
import statistics
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def build(hp_kw=None, env=None, patch_old=None):
    from __graft_entry__ import _flagship_hparams, _make_batch
    from self_attention_tacotron_tpu.models import (DecoderMode,
                                                    tacotron_model_factory)
    if patch_old:
        # round-2 kernel loaded side-by-side for a true same-process A/B
        import importlib.util
        from self_attention_tacotron_tpu.ops import fused_decode as fd_mod
        spec_ = importlib.util.spec_from_file_location("fd_old", patch_old)
        old = importlib.util.module_from_spec(spec_)
        spec_.loader.exec_module(old)
        fd_mod.fused_decode = old.fused_decode
    hp = _flagship_hparams(tiny=False)
    hp.max_iters = 450
    hp.decoder_early_stop = False
    hp.decoder_fused_inference = True
    for k, v in (hp_kw or {}).items():
        hp.set_hparam(k, v)
    batch = _make_batch(hp, B=1,
                        T_in=int(os.environ.get("SAT_TIN", "64")),
                        T_out=32)
    model = tacotron_model_factory(hp)
    variables = jax.jit(lambda k, b: model.init(
        {"params": k}, b, DecoderMode.VALIDATION, True))(
        jax.random.PRNGKey(0), batch)
    b = batch._replace(target=None, done=None)

    old = {}
    for k, v in (env or {}).items():
        old[k] = os.environ.get(k)
        os.environ[k] = v

    def step(salt):
        bb = b._replace(source=(b.source + salt) % (hp.num_symbols - 1) + 1)
        out = model.apply(variables, bb, DecoderMode.INFERENCE)
        return (jnp.abs(out.outputs).sum().astype(jnp.int32) % 7)

    if os.environ.get("SAT_DEVICE_CHAIN", "0") == "1":
        # whole chain in ONE dispatch: measures the chip, not the tunnel's
        # per-call dispatch cost
        chains = {}
        for n in (2, 16):
            chains[n] = jax.jit(
                lambda s, n=n: jax.lax.fori_loop(0, n,
                                                 lambda i, c: step(c), s))
            int(chains[n](jnp.asarray(0, jnp.int32)))  # compile now

        def run(n, seed):
            salt = jnp.asarray(seed, jnp.int32)
            t0 = time.perf_counter()
            out = chains[n](salt)
            int(out)
            return time.perf_counter() - t0
    else:
        chain = jax.jit(lambda s: step(s))

        def run(n, seed):
            salt = jnp.asarray(seed, jnp.int32)
            t0 = time.perf_counter()
            for _ in range(n):
                salt = chain(salt)
            int(salt)
            return time.perf_counter() - t0

    if os.environ.get("SAT_DEVICE_CHAIN", "0") != "1":
        run(2, 0)  # compile while env (and any kernel patch) is active
    for k, v in old.items():
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v
    if patch_old:
        import importlib
        from self_attention_tacotron_tpu.ops import fused_decode as fd_mod
        importlib.reload(fd_mod)
    return run


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    variants = [
        ("fused-f32", {}, {}, None),
        ("fused+enc", {"encoder_fused_inference": True}, {}, None),
        ("fc+enc", {"max_iters": 2, "encoder_fused_inference": True},
         {}, None),
    ]
    runners = [(name, build(kw, env, patch))
               for name, kw, env, patch in variants
               if patch is None or os.path.exists(patch)]
    results = {name: [] for name, _ in runners}
    for r in range(rounds):
        for name, run in runners:
            t2 = run(2, 100 * r)
            t16 = run(16, 100 * r + 50)
            results[name].append((t16 - t2) / 14)
    for name, ts in results.items():
        med = statistics.median(ts)
        print(f"{name:16s} {med*1e3:7.3f} ms/decode  "
              f"{450 / med:9.0f} frames/s   all={[f'{t*1e3:.2f}' for t in ts]}")


if __name__ == "__main__":
    main()
