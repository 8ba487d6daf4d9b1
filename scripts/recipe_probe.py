"""Decompose the recipe-vs-additive fused-train gap (trunk level).

The shipped recipes run forward attention (+speaker on VCTK); PERF.md r4
put the fused recipe trunk ~4.8 ms behind the additive flagship and named
three suspects: the location conv, the forward-recursion chain, and the
aux save stream.  This probe times trunk fwd+bwd for a ladder of configs
that adds one suspect at a time, interleaved in ONE process (see PERF.md
measurement pitfalls):

  additive                    baseline
  additive+save_align         + aux stream (alignment lanes only)
  location (K=10)             + conv windows + [w|cv] lanes
  forward (K=10)              + recursion chain
  forward+speaker             the recipe trunk
  fwd-only additive/forward   forward-pass split of the gap

Usage: python scripts/recipe_probe.py [rounds]
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
    spk_row = jax.random.normal(jax.random.PRNGKey(6),
                                (B, FLAG["P"][0])) * 0.3
    base = dict(drop_rate=0.5, zc_att=0.1, zo_att=0.1, zc_dec=0.1,
                zo_dec=0.1, deterministic=False)
    loc_kw = dict(src_kinds=("location_sensitive", "additive"),
                  loc_ws=(loc_w, None), loc_kernel=K_LOC, save_align=True)
    fwd_kw = dict(src_kinds=("forward", "additive"),
                  loc_ws=(loc_w, None), loc_kernel=K_LOC, save_align=True)

    def loss(p, seed, **extra):
        out = fused_teacher_scan(p, keys, values, masks, teacher, seed,
                                 **base, **extra)
        if isinstance(out, tuple):   # save_align returns (y, aligns)
            out = out[0]
        return jnp.sum(out ** 2)

    vg = jax.value_and_grad
    variants = {
        "bwd additive": jax.jit(vg(lambda p, s: loss(p, s))),
        "bwd additive+align": jax.jit(vg(
            lambda p, s: loss(p, s, save_align=True))),
        "bwd location K=10": jax.jit(vg(lambda p, s: loss(p, s, **loc_kw))),
        "bwd forward K=10": jax.jit(vg(lambda p, s: loss(p, s, **fwd_kw))),
        "bwd forward+spk": jax.jit(vg(
            lambda p, s: loss(p, s, speaker_row=spk_row, **fwd_kw))),
        "fwd additive": jax.jit(lambda p, s: loss(p, s)),
        "fwd forward+spk": jax.jit(
            lambda p, s: loss(p, s, speaker_row=spk_row, **fwd_kw)),
        "bwd recipe bf16": jax.jit(vg(
            lambda p, s: loss(p, s, speaker_row=spk_row,
                              compute_dtype="bfloat16", **fwd_kw))),
        "bwd additive bf16": jax.jit(vg(
            lambda p, s: loss(p, s, compute_dtype="bfloat16"))),
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
        print(f"{name:22s} {med:8.2f} ms/step  "
              f"all={['%.1f' % (t*1000) for t in ts]}")


if __name__ == "__main__":
    main()
