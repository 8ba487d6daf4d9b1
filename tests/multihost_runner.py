"""Subprocess runner for the CPU-simulated multi-host tests.

Launched (never imported by pytest) once per simulated host with
JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID /
JAX_NUM_CPU_DEVICES / JAX_PLATFORMS=cpu in the environment.

Mode ``lib``: library-level training — initialize jax.distributed, build
the tiny flagship model, run a few data-parallel steps on global batches
assembled from per-host synthetic local batches, dump the per-step losses
(and the final first param leaf) as JSON so the pytest process can compare
them with its single-process run over the concatenated batches.
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    mode, outdir = sys.argv[1], sys.argv[2]
    n_steps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from self_attention_tacotron_tpu.parallel.multihost import (
        assemble_global_batch, initialize_distributed, is_coordinator,
        replicate)
    assert initialize_distributed(), "env did not configure multi-host"

    import jax
    import numpy as np

    from __graft_entry__ import _flagship_hparams, _make_batch
    from self_attention_tacotron_tpu.models import tacotron_model_factory
    from self_attention_tacotron_tpu.parallel import (create_mesh,
                                                      create_train_state,
                                                      make_train_step)

    pid = jax.process_index()
    assert mode == "lib", mode
    hp = _flagship_hparams(tiny=True)
    model = tacotron_model_factory(hp)
    mesh = create_mesh()
    local_B = 2
    sample = _make_batch(hp, B=local_B, T_in=10, T_out=8, seed=0)
    # identical init seed on every process -> identical replicated params
    state = create_train_state(model, hp, sample, jax.random.PRNGKey(0))
    state = replicate(state, mesh)
    step_fn = make_train_step(model, hp, mesh=mesh, donate=False)
    rng = jax.random.PRNGKey(7)

    losses = []
    for k in range(n_steps):
        # each host contributes its own rows (seed folds in the process id)
        local = _make_batch(hp, B=local_B, T_in=10, T_out=8,
                            seed=100 + 10 * k + pid)
        gb = assemble_global_batch(local, mesh)
        state, metrics = step_fn(state, gb, rng)
        losses.append(float(metrics["loss"]))

    leaf = np.asarray(
        jax.device_get(jax.tree_util.tree_leaves(state.params)[0]))
    out = {
        "process_index": pid,
        "process_count": jax.process_count(),
        "global_devices": jax.device_count(),
        "is_coordinator": is_coordinator(),
        "losses": losses,
        "param_leaf_sum": float(leaf.sum()),
    }
    with open(os.path.join(outdir, f"lib_{pid}.json"), "w") as f:
        json.dump(out, f)
    return 0


if __name__ == "__main__":
    sys.exit(main())
