"""Interleaved probe of the fused training kernel's backward budget.

Times value_and_grad of the trunk loss at the flagship training shape for
several kernel variants in ONE process (trustworthy relative numbers, see
PERF.md pitfalls): forward-only, fwd+bwd at dw_block 1 / auto, and bf16
in-kernel storage.  Answers (a) what the batched dW accumulation buys and
(b) what bf16 save/weight storage buys.

Usage: python scripts/bwd_probe.py [rounds]
"""

import statistics
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import jax
import jax.numpy as jnp

from check_fused_train import FLAG, make
from self_attention_tacotron_tpu.ops.fused_train import fused_teacher_scan

B, T_STEPS, T_MEM = 32, 256, 64


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    params, keys, values, masks, teacher = make(
        jax.random.PRNGKey(2), B=B, T_steps=T_STEPS, T_mem=T_MEM,
        cf=FLAG["CF"], u_sizes=FLAG["U"], c_sizes=FLAG["C"],
        p_sizes=FLAG["P"], A=FLAG["A"], D=FLAG["D"])
    kw = dict(drop_rate=0.5, zc_att=0.1, zo_att=0.1, zc_dec=0.1,
              zo_dec=0.1, deterministic=False)

    def loss(p, seed, **extra):
        return jnp.sum(fused_teacher_scan(p, keys, values, masks, teacher,
                                          seed, **kw, **extra) ** 2)

    variants = {
        "fwd only f32": jax.jit(lambda p, s: loss(p, s)),
        "fwd+bwd dw_block=1": jax.jit(jax.value_and_grad(
            lambda p, s: loss(p, s, dw_block=1))),
        "fwd+bwd dw_block=auto": jax.jit(jax.value_and_grad(
            lambda p, s: loss(p, s))),
        "fwd+bwd auto bf16": jax.jit(jax.value_and_grad(
            lambda p, s: loss(p, s, compute_dtype="bfloat16"))),
        "fwd only bf16": jax.jit(
            lambda p, s: loss(p, s, compute_dtype="bfloat16")),
    }
    for name, fn in variants.items():
        t0 = time.time()
        jax.tree_util.tree_map(
            lambda x: None, jax.device_get(fn(params, jnp.int32(0))))
        print(f"compiled {name} in {time.time()-t0:.0f}s", flush=True)

    def run(fn, n):
        seed = jnp.int32(1)
        out = None
        t0 = time.perf_counter()
        for i in range(n):
            out = fn(params, seed + i)
        jax.device_get(out if not isinstance(out, tuple) else out[0])
        return time.perf_counter() - t0

    results = {name: [] for name in variants}
    for r in range(rounds):
        for name, fn in variants.items():
            t2, t6 = run(fn, 2), run(fn, 6)
            results[name].append((t6 - t2) / 4)
    for name, ts in results.items():
        med = statistics.median(ts) * 1000
        print(f"{name:24s} {med:8.2f} ms/step  "
              f"all={['%.1f' % (t*1000) for t in ts]}")


if __name__ == "__main__":
    main()
