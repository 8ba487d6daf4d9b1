"""Flagship train-step throughput on the current chip.

Chained dispatch with one readback per chain (see bench.py docstring for
why per-call timing measures the device tunnel, not the chip).  Usage:
python scripts/bench_train.py
"""
import sys, time, statistics
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
from __graft_entry__ import _flagship_hparams, _make_batch
from self_attention_tacotron_tpu.models import tacotron_model_factory
from self_attention_tacotron_tpu.parallel import (create_mesh, create_train_state,
                                                  make_train_step)
from self_attention_tacotron_tpu.parallel.mesh import replicated_sharding, shard_batch

def bench(compute_dtype, B, T_out, label):
    hp = _flagship_hparams(tiny=False)
    hp.compute_dtype = compute_dtype
    hp.batch_size = B
    batch = _make_batch(hp, B=B, T_in=64, T_out=T_out)
    mesh = create_mesh(devices=jax.devices()[:1])
    model = tacotron_model_factory(hp)
    state = create_train_state(model, hp, batch, jax.random.PRNGKey(0))
    state = jax.device_put(state, replicated_sharding(mesh))
    sb = shard_batch(batch, mesh)
    step = make_train_step(model, hp, mesh=mesh, donate=False)
    state, m = step(state, sb, jax.random.PRNGKey(7))
    jax.block_until_ready(m["loss"])
    def run(n):
        s = state
        t0 = time.perf_counter()
        for i in range(n):
            s, m = step(s, sb, jax.random.PRNGKey(i))
        float(m["loss"])
        return time.perf_counter() - t0
    run(2)
    t2 = statistics.median(run(2) for _ in range(3))
    t8 = statistics.median(run(8) for _ in range(3))
    per = (t8 - t2) / 6
    fps = B * T_out / per
    print(f"{label:36s} {per*1e3:8.2f} ms/step  {fps:9.0f} target-frames/s")

bench("float32", 32, 256, "f32 B=32 T=256")
bench("bfloat16", 32, 256, "bf16 B=32 T=256")
bench("float32", 32, 512, "f32 B=32 T=512")

print("--- decoder_fused_train=True (ops/fused_train.py) ---")
def bench_fused(compute_dtype, B, T_out, label):
    hp = _flagship_hparams(tiny=False)
    hp.compute_dtype = compute_dtype
    hp.batch_size = B
    hp.decoder_fused_train = True
    batch = _make_batch(hp, B=B, T_in=64, T_out=T_out)
    mesh = create_mesh(devices=jax.devices()[:1])
    model = tacotron_model_factory(hp)
    state = create_train_state(model, hp, batch, jax.random.PRNGKey(0))
    state = jax.device_put(state, replicated_sharding(mesh))
    sb = shard_batch(batch, mesh)
    step = make_train_step(model, hp, mesh=mesh, donate=False)
    state, m = step(state, sb, jax.random.PRNGKey(7))
    jax.block_until_ready(m["loss"])
    def run(n):
        s = state
        t0 = time.perf_counter()
        for i in range(n):
            s, m = step(s, sb, jax.random.PRNGKey(i))
        float(m["loss"])
        return time.perf_counter() - t0
    run(2)
    t2 = statistics.median(run(2) for _ in range(3))
    t8 = statistics.median(run(8) for _ in range(3))
    per = (t8 - t2) / 6
    fps = B * T_out / per
    print(f"{label:36s} {per*1e3:8.2f} ms/step  {fps:9.0f} target-frames/s")

if __name__ == "__main__" or True:
    bench_fused("float32", 32, 256, "fused-train f32 B=32 T=256")
