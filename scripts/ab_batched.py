"""Interleaved A/B of batched fused serving vs the scan path (with hops).

Round 5 replaced the batched hop attention's per-column VPU math with
block-diagonal matmuls over (S, B*D) caches; this measures the fused
kernel against the batched scan path at serving batch sizes, updating the
old "scan wins past B~4" crossover (PERF.md batched serving).

Usage: python scripts/ab_batched.py [rounds] [batches...]
"""

import statistics
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def build(B, fused):
    from __graft_entry__ import _flagship_hparams, _make_batch
    from self_attention_tacotron_tpu.models import (DecoderMode,
                                                    tacotron_model_factory)
    hp = _flagship_hparams(tiny=False)
    hp.max_iters = 450
    hp.decoder_early_stop = False
    hp.decoder_fused_inference = fused
    hp.encoder_fused_inference = False   # B>1 encoder runs XLA either way
    batch = _make_batch(hp, B=B, T_in=64, T_out=32)
    model = tacotron_model_factory(hp)
    variables = jax.jit(lambda k, b: model.init(
        {"params": k}, b, DecoderMode.VALIDATION, True))(
        jax.random.PRNGKey(0), batch)
    b = batch._replace(target=None, done=None)

    def step(salt):
        bb = b._replace(source=(b.source + salt) % (hp.num_symbols - 1) + 1)
        out = model.apply(variables, bb, DecoderMode.INFERENCE)
        return (jnp.abs(out.outputs).sum().astype(jnp.int32) % 7)

    chain = jax.jit(step)
    int(chain(jnp.asarray(0, jnp.int32)))  # compile + sync

    def run(n, seed):
        salt = jnp.asarray(seed, jnp.int32)
        t0 = time.perf_counter()
        for _ in range(n):
            salt = chain(salt)
        int(salt)
        return time.perf_counter() - t0

    return run


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    batches = [int(x) for x in sys.argv[2:]] or [4, 8, 16]
    runners = []
    for B in batches:
        for fused in (False, True):
            name = f"B={B} {'fused' if fused else 'scan '}"
            t0 = time.time()
            runners.append((name, B, build(B, fused)))
            print(f"built {name} in {time.time()-t0:.0f}s", flush=True)
    results = {name: [] for name, _, _ in runners}
    for r in range(rounds):
        for name, B, run in runners:
            t2 = run(2, 100 * r)
            t8 = run(8, 100 * r + 50)
            results[name].append((t8 - t2) / 6)
    for name, B, _ in runners:
        med = statistics.median(results[name])
        fps = 450 * B / med
        print(f"{name:12s} {med*1e3:8.2f} ms/decode  {fps:10.0f} agg frames/s"
              f"  all={[f'{t*1e3:.1f}' for t in results[name]]}")


if __name__ == "__main__":
    main()
