"""Interleaved A/B timing of full train-step variants in ONE process.

Cross-invocation micro-timings on the tunneled chip drift badly (the
same script has reported 0.95x-2.2x for the same pair); this harness
compiles every variant up front and times them in interleaved rounds so
all variants see the same chip state.  Median over rounds of the
chained-dispatch estimate (one readback per chain; block_until_ready
does NOT sync through the tunnel — see PERF.md pitfalls).

Usage: python scripts/ab_train.py [rounds]
"""

import statistics
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

B, T_IN, T_OUT = 32, 64, 256


def build(hp_kw):
    from __graft_entry__ import _flagship_hparams, _make_batch
    from self_attention_tacotron_tpu.models import tacotron_model_factory
    from self_attention_tacotron_tpu.parallel import (create_mesh,
                                                      create_train_state,
                                                      make_train_step)
    from self_attention_tacotron_tpu.parallel.mesh import (
        replicated_sharding, shard_batch)
    hp = _flagship_hparams(tiny=False)
    hp.batch_size = B
    for k, v in hp_kw.items():
        hp.set_hparam(k, v)
    batch = _make_batch(hp, B=B, T_in=T_IN, T_out=T_OUT)
    mesh = create_mesh(devices=jax.devices()[:1])
    model = tacotron_model_factory(hp)
    state = create_train_state(model, hp, batch, jax.random.PRNGKey(0))
    state = jax.device_put(state, replicated_sharding(mesh))
    sb = shard_batch(batch, mesh)
    step = make_train_step(model, hp, mesh=mesh, donate=False)
    s, m = step(state, sb, jax.random.PRNGKey(7))
    float(m["loss"])  # compile + sync

    def run(n):
        s = state
        m = None
        t0 = time.perf_counter()
        for i in range(n):
            s, m = step(s, sb, jax.random.PRNGKey(i))
        float(m["loss"])
        return time.perf_counter() - t0

    return run


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    fwd_kw = dict(attention="forward", cumulative_weights=False,
                  attention_kernel=10, attention_filters=5)
    spk_kw = dict(use_speaker_embedding=True, num_speakers=152,
                  speaker_embedding_offset=0)
    variants = [
        ("scan additive", {}),
        ("fused additive", {"decoder_fused_train": True}),
        ("scan forward+spk", {**fwd_kw, **spk_kw}),
        ("fused forward+spk", {**fwd_kw, **spk_kw,
                               "decoder_fused_train": True}),
    ]
    runners = []
    for name, kw in variants:
        t0 = time.time()
        runners.append((name, build(kw)))
        print(f"built {name} in {time.time()-t0:.0f}s", flush=True)
    results = {name: [] for name, _ in runners}
    for r in range(rounds):
        for name, run in runners:
            t2 = run(2)
            t8 = run(8)
            results[name].append((t8 - t2) / 6)
    for name, ts in results.items():
        med = statistics.median(ts)
        fps = B * T_OUT / med
        print(f"{name:20s} {med*1e3:8.2f} ms/step  {fps:9.0f} frames/s  "
              f"all={[f'{t*1e3:.1f}' for t in ts]}")


if __name__ == "__main__":
    main()
