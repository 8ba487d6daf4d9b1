"""Budget the location/forward-attention cost inside the fused train kernel.

Uses TrainSpec.ablate (TIMING ONLY — ablated variants compute wrong
numbers) to remove one conv/recursion piece at a time from the recipe
trunk (forward K=10 + additive) and time fwd+bwd interleaved in one
process.  The deltas tell which piece of the ~4 ms recipe-vs-additive gap
(scripts/recipe_probe.py) to attack.

Usage: python scripts/ablate_probe.py [rounds]
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
K_LOC = 10


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    params, keys, values, masks, teacher = make(
        jax.random.PRNGKey(2), B=B, T_steps=T_STEPS, T_mem=T_MEM,
        cf=FLAG["CF"], u_sizes=FLAG["U"], c_sizes=FLAG["C"],
        p_sizes=FLAG["P"], A=FLAG["A"], D=FLAG["D"])
    loc_w = jax.random.normal(jax.random.PRNGKey(5),
                              (K_LOC, FLAG["U"][0])) * 0.3
    base = dict(drop_rate=0.5, zc_att=0.1, zo_att=0.1, zc_dec=0.1,
                zo_dec=0.1, deterministic=False,
                src_kinds=("forward", "additive"), loc_ws=(loc_w, None),
                loc_kernel=K_LOC, save_align=True)

    def loss(p, seed, **extra):
        out = fused_teacher_scan(p, keys, values, masks, teacher, seed,
                                 **base, **extra)
        if isinstance(out, tuple):
            out = out[0]
        return jnp.sum(out ** 2)

    vg = jax.value_and_grad
    variants = {
        "full recipe": (),
        "-fwd_win": ("fwd_win",),
        "-fwd_rec": ("fwd_rec",),
        "-bwd_win": ("bwd_win",),
        "-bwd_loc_mm": ("bwd_loc_mm",),
        "-bwd_rec": ("bwd_rec",),
        "-bwd_dwin": ("bwd_dwin",),
        "-bwd_dloc": ("bwd_dloc",),
        "-all conv/rec": ("fwd_win", "fwd_rec", "bwd_win", "bwd_loc_mm",
                          "bwd_rec", "bwd_dwin", "bwd_dloc"),
    }
    fns = {}
    for name, ab in variants.items():
        fns[name] = jax.jit(vg(lambda p, s, ab=ab: loss(p, s, ablate=ab)))
        t0 = time.time()
        jax.tree_util.tree_map(
            lambda x: None, jax.device_get(fns[name](params, jnp.int32(0))))
        print(f"compiled {name} in {time.time()-t0:.0f}s", flush=True)

    def run(fn, n):
        seed = jnp.int32(1)
        out = None
        t0 = time.perf_counter()
        for i in range(n):
            out = fn(params, seed + i)
        jax.device_get(out[0])
        return time.perf_counter() - t0

    results = {name: [] for name in fns}
    for r in range(rounds):
        for name, fn in fns.items():
            t2, t6 = run(fn, 2), run(fn, 6)
            results[name].append((t6 - t2) / 4)
    for name, ts in results.items():
        med = statistics.median(ts) * 1000
        print(f"{name:16s} {med:8.2f} ms/step  "
              f"all={['%.1f' % (t*1000) for t in ts]}")


if __name__ == "__main__":
    main()
