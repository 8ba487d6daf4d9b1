"""Roofline analysis: measured vs speed-of-light for the three hot paths.

VERDICT round 1 asked for the bound math behind the "speed-of-light"
claims.  This script computes, on the real chip:

1. **Scan decode path** — the per-step bound is weight+memory traffic
   divided by HBM bandwidth (the loop is bandwidth-bound: ~6 MFLOP/step at
   batch 1 is noise next to re-reading every weight each step).  Traffic
   comes from XLA's own compiled cost analysis (bytes accessed), not hand
   counting.
2. **Fused decode kernel** — weights are VMEM-resident, so the bound is
   the serial issue latency of the step's dependency chain of small
   matmuls.  The floor is measured empirically: a Pallas kernel running a
   chain of K dependent (1,D)x(D,D) matmuls, slope between two chain
   lengths, times the ~15-matmul chain of the real step.
3. **Train step** — MFU: XLA-counted FLOPs / (measured time * peak), plus
   the HBM-traffic floor, whichever is larger is the roofline.

v5e (lite) peaks used: 197 TFLOP/s bf16 (MXU), 819 GB/s HBM.
(Source: public TPU v5e specs; the "How to Scale Your Model" numbers.)

Usage: python scripts/roofline.py [--quick]
Prints a JSON report and a human table; PERF.md records the results.
"""

import argparse
import json
import statistics
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

PEAK_BF16_FLOPS = 197e12
PEAK_F32_FLOPS = PEAK_BF16_FLOPS / 4  # f32 matmul = multi-pass on the MXU
HBM_BW = 819e9


def _sync(x):
    """Real synchronization.  Through the axon tunnel,
    ``jax.block_until_ready`` returns without waiting for device
    completion — only an actual readback (``device_get``) synchronizes."""
    jax.device_get(jax.tree_util.tree_leaves(x)[0])


def _chain_time(fn, state0, n_short, n_long, reps=5):
    """Steady-state per-call time from the slope of chained dispatches
    (bench.py methodology: the tunnel RTT is paid once per chain)."""
    def run(n, salt):
        s = state0
        t0 = time.perf_counter()
        for i in range(n):
            s = fn(s, salt + i)
        _sync(s)
        return time.perf_counter() - t0
    run(2, 0)  # warmup
    ts = statistics.median(run(n_short, r) for r in range(reps))
    tl = statistics.median(run(n_long, r + 10) for r in range(reps))
    return (tl - ts) / (n_long - n_short)


# ------------------------------------------------------------ 1. scan decode

def _tree_bytes(tree):
    import numpy as np
    return sum(int(np.prod(x.shape)) * x.dtype.itemsize
               for x in jax.tree_util.tree_leaves(tree))


def scan_decode(report):
    """Per-step traffic is hand-computed (XLA's cost analysis counts a scan
    body ONCE, not per iteration): every step re-reads all decoder weights,
    both attention memories' keys/values, and the full KV cache buffers."""
    from __graft_entry__ import _flagship_hparams, _make_batch
    from self_attention_tacotron_tpu.models import (DecoderMode,
                                                    tacotron_model_factory)
    hp = _flagship_hparams(tiny=False)
    hp.max_iters = 450
    hp.decoder_early_stop = False
    hp.decoder_fused_inference = False
    T_in = 64
    batch = _make_batch(hp, B=1, T_in=T_in, T_out=32)
    model = tacotron_model_factory(hp)
    variables = jax.jit(lambda k, b: model.init(
        {"params": k}, b, DecoderMode.VALIDATION, True))(
        jax.random.PRNGKey(0), batch)
    jax.block_until_ready(variables)
    b = batch._replace(target=None, done=None)

    @jax.jit
    def chainfn(v, bb, salt):
        b2 = bb._replace(source=(bb.source + salt) % (hp.num_symbols - 1) + 1)
        o = model.apply(v, b2, DecoderMode.INFERENCE)
        return (jnp.abs(o.outputs).sum().astype(jnp.int32) % 7)

    def run(n, seed):
        salt = jnp.asarray(seed, jnp.int32)
        t0 = time.perf_counter()
        for _ in range(n):
            salt = chainfn(variables, b, salt)
        int(salt)
        return time.perf_counter() - t0

    run(2, 0)
    ts = statistics.median(run(4, r) for r in range(5))
    tl = statistics.median(run(24, r + 10) for r in range(5))
    per_decode = (tl - ts) / 20
    per_step = per_decode / hp.max_iters

    # per-step HBM traffic, hand-counted:
    w_dec = _tree_bytes(variables["params"]["decoder"])
    # encoder memories: keys+values per source, re-read every step
    units = (hp.attention1_out_units + hp.attention2_out_units)
    mem = 2 * T_in * (hp.cbhg_out_units + hp.self_attention_out_units) * 4 \
        + T_in * units * 4
    # decoder self-attention KV caches: full (max_iters, D) K and V per hop
    kv = 2 * hp.self_attention_num_hop * hp.max_iters \
        * hp.decoder_self_attention_out_units * 4
    bytes_per_step = w_dec + mem + kv
    bound = bytes_per_step / HBM_BW
    report["scan_decode"] = {
        "measured_us_per_step": per_step * 1e6,
        "weight_bytes": w_dec, "memory_bytes": mem, "kv_cache_bytes": kv,
        "bytes_per_step": bytes_per_step,
        "hbm_bound_us_per_step": bound * 1e6,
        "pct_of_bound": 100.0 * bound / per_step,
    }


# ----------------------------------------------- 2. fused serial-chain floor

def fused_floor(report, d=256, n_chain=15):
    """Empirical serial floor: K dependent (8,d)x(d,d) VMEM matmuls per
    kernel; per-matmul latency from the slope between two chain lengths."""
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(w_ref, x_ref, s_ref, o_ref, *, iters):
        # the per-call salt keeps every pallas_call's inputs distinct: the
        # device tunnel memoizes byte-identical executions, which silently
        # zeroes out naive repeat-timing (bench.py learned this the hard way)
        def body(i, x):
            y = jax.lax.dot_general(
                x, w_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return jnp.tanh(y) * 0.5  # keep values bounded, stay serial
        o_ref[...] = jax.lax.fori_loop(
            0, iters, body, x_ref[...] + s_ref[0].astype(jnp.float32))

    def make(iters):
        return jax.jit(lambda w, x, s: pl.pallas_call(
            functools.partial(kernel, iters=iters),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, d), jnp.float32),
            interpret=jax.default_backend() != "tpu",
        )(w, x, s))

    w = jax.random.normal(jax.random.PRNGKey(0), (d, d)) * (1.0 / d ** 0.5)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, d))
    # chains long enough (ms-scale kernels) that the slope dwarfs the
    # ~25 ms tunnel RTT noise
    short, long_ = 100_000, 1_000_000
    fs, fl = make(short), make(long_)
    counter = [0]

    def timed(fn):
        import numpy as np
        counter[0] += 1
        _sync(fn(w, x, np.asarray([counter[0]], np.int32)))  # compile+warm
        times = []
        for _ in range(5):
            counter[0] += 1
            t0 = time.perf_counter()
            _sync(fn(w, x, np.asarray([counter[0]], np.int32)))
            times.append(time.perf_counter() - t0)
        return statistics.median(times)

    ts, tl = timed(fs), timed(fl)
    per_matmul = (tl - ts) / (long_ - short)
    floor = per_matmul * n_chain
    report["fused_decode"] = {
        "serial_matmul_ns": per_matmul * 1e9,
        "chain_matmuls_per_step": n_chain,
        "floor_us_per_step": floor * 1e6,
        "measured_us_per_step": None,  # filled from bench.py's run
    }


# ------------------------------------------------------------- 3. train MFU

def train_step_mfu(report, compute_dtype="bfloat16", B=32, T_out=256):
    from __graft_entry__ import _flagship_hparams, _make_batch
    from self_attention_tacotron_tpu.models import tacotron_model_factory
    from self_attention_tacotron_tpu.parallel import (create_train_state,
                                                      make_train_step)
    hp = _flagship_hparams(tiny=False)
    hp.compute_dtype = compute_dtype
    hp.batch_size = B
    batch = _make_batch(hp, B=B, T_in=64, T_out=T_out)
    model = tacotron_model_factory(hp)
    state = create_train_state(model, hp, batch, jax.random.PRNGKey(0))
    step = make_train_step(model, hp, donate=False)

    lowered = jax.jit(lambda s, b, r: step(s, b, r)).lower(
        state, batch, jax.random.PRNGKey(7))
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, list) else cost
    flops = float(cost.get("flops", 0.0))
    total_bytes = float(cost.get("bytes accessed", 0.0))

    def chained(s, i):
        new_state, m = step(s[0], batch, jax.random.PRNGKey(i))
        return (new_state,)

    per_step = _chain_time(chained, (jax.device_put(state),), 2, 8, reps=3)
    peak = PEAK_BF16_FLOPS if compute_dtype == "bfloat16" else PEAK_F32_FLOPS
    t_compute = flops / peak
    t_memory = total_bytes / HBM_BW
    bound = max(t_compute, t_memory)
    report[f"train_step_{compute_dtype}"] = {
        "measured_ms_per_step": per_step * 1e3,
        "xla_tflops": flops / 1e12,
        "xla_gbytes": total_bytes / 1e9,
        "mfu_pct": 100.0 * flops / (per_step * peak),
        "compute_floor_ms": t_compute * 1e3,
        "hbm_floor_ms": t_memory * 1e3,
        "bound_ms": bound * 1e3,
        "pct_of_bound": 100.0 * bound / per_step,
        "bound_kind": "compute" if t_compute >= t_memory else "hbm",
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="skip the train-step measurements")
    args = ap.parse_args()
    report = {}
    fused_floor(report)
    scan_decode(report)
    if not args.quick:
        train_step_mfu(report, "bfloat16")
        train_step_mfu(report, "float32")
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
