"""Weak-scaling measurement of multi-host data-parallel training,
CPU-simulated (no multi-host TPU hardware is available to this repo).

Spawns itself as N jax.distributed processes (gloo collectives over
localhost), each feeding a fixed per-host batch, and times the steady-state
global train step.  Weak-scaling efficiency = throughput(N hosts) /
(N * throughput(1 host)).

Run: python scripts/bench_multihost_cpu.py [--steps 20] [--local-batch 4]

Caveat: all simulated hosts share one machine's cores, so the absolute
numbers measure the wiring + gloo collective overhead, not ICI scaling —
on real TPU hosts the gradient all-reduce (~9 MB of grads for the tiny
config; ~50 MB flagship) rides ICI at ~100 GB/s and is negligible next to
the ~20 ms step (PERF.md).
"""

import argparse
import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def child(args) -> int:
    from self_attention_tacotron_tpu.parallel.multihost import (
        assemble_global_batch, initialize_distributed, replicate)
    initialize_distributed()
    import jax

    from __graft_entry__ import _flagship_hparams, _make_batch
    from self_attention_tacotron_tpu.models import tacotron_model_factory
    from self_attention_tacotron_tpu.parallel import (create_mesh,
                                                      create_train_state,
                                                      make_train_step)

    pid = jax.process_index()
    hp = _flagship_hparams(tiny=True)
    model = tacotron_model_factory(hp)
    mesh = create_mesh()
    B, T_out = args.local_batch, 8
    sample = _make_batch(hp, B=B, T_in=10, T_out=T_out, seed=pid)
    state = create_train_state(model, hp, sample, jax.random.PRNGKey(0))
    state = replicate(state, mesh)
    step_fn = make_train_step(model, hp, mesh=mesh, donate=False)
    rng = jax.random.PRNGKey(7)
    gb = assemble_global_batch(sample, mesh)

    for _ in range(3):  # compile + warmup
        state, metrics = step_fn(state, gb, rng)
    jax.block_until_ready(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = step_fn(state, gb, rng)
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0
    if pid == 0:
        result = {"processes": jax.process_count(),
                  "global_devices": jax.device_count(),
                  "steps_per_sec": args.steps / dt,
                  "global_frames_per_sec":
                      args.steps * B * jax.process_count() * T_out / dt}
        with open(args.out, "w") as f:
            json.dump(result, f)
    return 0


def spawn(n_procs, args, out_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    procs = []
    for pid in range(n_procs):
        env = dict(os.environ)
        env.update({"JAX_PLATFORMS": "cpu",
                    "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
                    "JAX_NUM_PROCESSES": str(n_procs),
                    "JAX_PROCESS_ID": str(pid),
                    "JAX_NUM_CPU_DEVICES": "2"})
        env.pop("XLA_FLAGS", None)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--child",
             "--steps", str(args.steps), "--local-batch",
             str(args.local_batch), "--out", out_path],
            env=env, cwd=REPO))
    for p in procs:
        assert p.wait(timeout=600) == 0
    with open(out_path) as f:
        return json.load(f)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--local-batch", type=int, default=4)
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    if args.child:
        return child(args)

    import tempfile
    with tempfile.TemporaryDirectory() as td:
        r1 = spawn(1, args, os.path.join(td, "r1.json"))
        r2 = spawn(2, args, os.path.join(td, "r2.json"))
    eff = r2["global_frames_per_sec"] / (2 * r1["global_frames_per_sec"])
    print(json.dumps({
        "one_host": r1, "two_hosts": r2,
        "weak_scaling_efficiency": round(eff, 3),
        "note": "CPU-simulated hosts share one machine's cores; see "
                "docstring for why this bounds below real multi-host TPU",
    }, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
