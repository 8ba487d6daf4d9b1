"""Same-process A/B of the round-4 vs current fused training kernels.

Cross-invocation chip drift makes round-over-round headline comparisons
untrustworthy (PERF.md pitfalls); this loads the round-4
``ops/fused_train.py`` from git side-by-side (shimming the helper it
imported that no longer exists) and interleaves trunk fwd+bwd timings of
both kernels at the additive and recipe configurations.

Usage: python scripts/ab_oldnew_train.py [rounds] [commit]
       (commit defaults to the round-4 commit; pass any rev to compare
       the current kernel against that revision's kernel)
"""

import importlib.util
import statistics
import subprocess
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import jax
import jax.numpy as jnp

from check_fused_train import FLAG, make

B, T_STEPS, T_MEM = 32, 256, 64
K_LOC = 10
R4_COMMIT = "3f97672"   # default baseline (round 4)


def load_old(commit):
    src = subprocess.run(
        ["git", "show", f"{commit}:self_attention_tacotron_tpu/ops/"
         "fused_train.py"], capture_output=True, text=True, check=True
    ).stdout
    path = "/tmp/ft_r4.py"
    open(path, "w").write(src)
    # the r4 module did ``from .fused_decode import _loc_windows ...``;
    # recreate the deleted helper on the current module for the shim
    from self_attention_tacotron_tpu.ops import fused_decode as fd
    if not hasattr(fd, "_loc_windows"):
        def _loc_windows(cv, pos, K, T):
            pad = (K - 1) // 2
            cols = [fd._shift_col(cv, k - pad) * fd._shift_mask(pos, k - pad, T)
                    for k in range(K)]
            return jnp.concatenate(cols, axis=1)
        fd._loc_windows = _loc_windows
    spec = importlib.util.spec_from_file_location("ft_r4", path)
    mod = importlib.util.module_from_spec(spec)
    # satisfy the old module's relative import
    import self_attention_tacotron_tpu.ops as ops_pkg
    mod.__package__ = ops_pkg.__name__
    sys.modules["ft_r4"] = mod
    spec.loader.exec_module(mod)
    return mod


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    commit = sys.argv[2] if len(sys.argv) > 2 else R4_COMMIT
    from self_attention_tacotron_tpu.ops import fused_train as new_mod
    old_mod = load_old(commit)

    params, keys, values, masks, teacher = make(
        jax.random.PRNGKey(2), B=B, T_steps=T_STEPS, T_mem=T_MEM,
        cf=FLAG["CF"], u_sizes=FLAG["U"], c_sizes=FLAG["C"],
        p_sizes=FLAG["P"], A=FLAG["A"], D=FLAG["D"])
    loc_w = jax.random.normal(jax.random.PRNGKey(5),
                              (K_LOC, FLAG["U"][0])) * 0.3
    spk = jax.random.normal(jax.random.PRNGKey(6), (B, FLAG["P"][0])) * 0.3
    base = dict(drop_rate=0.5, zc_att=0.1, zo_att=0.1, zc_dec=0.1,
                zo_dec=0.1, deterministic=False)
    fwd_kw = dict(src_kinds=("forward", "additive"), loc_ws=(loc_w, None),
                  loc_kernel=K_LOC, save_align=True, speaker_row=spk)

    def loss(mod, p, seed, **extra):
        out = mod.fused_teacher_scan(p, keys, values, masks, teacher,
                                     seed, **base, **extra)
        if isinstance(out, tuple):
            out = out[0]
        return jnp.sum(out ** 2)

    vg = jax.value_and_grad
    variants = {}
    for tag, mod in (("old", old_mod), ("new", new_mod)):
        variants[f"{tag} additive"] = jax.jit(vg(
            lambda p, s, m=mod: loss(m, p, s)))
        variants[f"{tag} recipe"] = jax.jit(vg(
            lambda p, s, m=mod: loss(m, p, s, **fwd_kw)))
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
        jax.device_get(out[0])
        return time.perf_counter() - t0

    results = {name: [] for name in variants}
    for r in range(rounds):
        for name, fn in variants.items():
            t2, t6 = run(fn, 2), run(fn, 6)
            results[name].append((t6 - t2) / 4)
    for name, ts in results.items():
        med = statistics.median(ts) * 1000
        print(f"{name:14s} {med:8.2f} ms/step  "
              f"all={['%.1f' % (t*1000) for t in ts]}")


if __name__ == "__main__":
    main()
