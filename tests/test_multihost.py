"""Multi-host data-parallel training, CPU-simulated with two real
``jax.distributed`` processes (gloo CPU collectives over localhost).

Extends the reference's single-host MirroredStrategy (reference:
train.py:67) the TPU-native way: jax.distributed.initialize, per-host
input sharding, global-batch assembly via
jax.make_array_from_process_local_data, coordinator-only metrics/plots.

The central correctness claim: a 2-process run whose hosts each feed their
own local rows computes EXACTLY the same global training step as a single
process fed the concatenated rows.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNNER = os.path.join(REPO, "tests", "multihost_runner.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _spawn_processes(n_procs, argv, extra_env=None, timeout=420):
    """Run ``argv`` once per simulated host with the multi-host env set."""
    port = _free_port()
    procs = []
    for pid in range(n_procs):
        env = dict(os.environ)
        env.update({
            "JAX_PLATFORMS": "cpu",
            "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
            "JAX_NUM_PROCESSES": str(n_procs),
            "JAX_PROCESS_ID": str(pid),
            "JAX_NUM_CPU_DEVICES": "2",
        })
        env.update(extra_env or {})
        env.pop("XLA_FLAGS", None)  # no virtual-device override in children
        procs.append(subprocess.Popen(
            [sys.executable] + argv, env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode(errors="replace"))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"exit {p.returncode}:\n{out[-4000:]}"
    return outs


# --------------------------------------------------------------- unit pieces

def test_shard_files_round_robin():
    from self_attention_tacotron_tpu.parallel.multihost import shard_files
    files = [f"f{i}" for i in range(11)]
    shards = [shard_files(files, pid, 3) for pid in range(3)]
    assert shards[0] == ["f0", "f3", "f6", "f9"]
    assert shards[1] == ["f1", "f4", "f7", "f10"]
    # disjoint cover
    merged = sorted(sum(shards, []))
    assert merged == sorted(files)


def test_local_batch_size_divisibility():
    from self_attention_tacotron_tpu.parallel.multihost import \
        local_batch_size
    assert local_batch_size(32, 4) == 8
    with pytest.raises(ValueError):
        local_batch_size(10, 4)


def test_initialize_noop_without_coordinator(monkeypatch):
    from self_attention_tacotron_tpu.parallel import multihost
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert multihost.initialize_distributed() is False


def test_assemble_global_batch_single_process():
    """With one process the assembly is a plain shard over the local mesh."""
    import jax
    from self_attention_tacotron_tpu.parallel import create_mesh
    from self_attention_tacotron_tpu.parallel.multihost import \
        assemble_global_batch
    mesh = create_mesh()
    batch = {"x": np.arange(16, dtype=np.float32).reshape(8, 2),
             "none": None, "scalar": np.float32(3.0)}
    g = assemble_global_batch(batch, mesh)
    assert g["none"] is None
    np.testing.assert_array_equal(np.asarray(g["x"]), batch["x"])
    assert float(g["scalar"]) == 3.0
    assert len(g["x"].sharding.device_set) == len(jax.devices())


# ------------------------------------------------- 2-process numeric parity

@pytest.mark.slow
def test_two_process_training_matches_single_process(tmp_path):
    """Two jax.distributed processes (2 CPU devices each, global mesh of 4)
    must produce the same per-step losses and final params as one process
    training on the concatenated global batches."""
    n_steps = 3
    _spawn_processes(2, [RUNNER, "lib", str(tmp_path), str(n_steps)])

    results = []
    for pid in range(2):
        with open(tmp_path / f"lib_{pid}.json") as f:
            results.append(json.load(f))
    assert results[0]["process_count"] == 2
    assert results[0]["global_devices"] == 4
    assert results[0]["is_coordinator"] and not results[1]["is_coordinator"]
    # both processes observe the same replicated loss
    np.testing.assert_allclose(results[0]["losses"], results[1]["losses"],
                               rtol=1e-6)

    # single-process reference over the concatenated global batches
    import jax
    from __graft_entry__ import _flagship_hparams, _make_batch
    from self_attention_tacotron_tpu.models import tacotron_model_factory
    from self_attention_tacotron_tpu.parallel import (create_train_state,
                                                      make_train_step)

    hp = _flagship_hparams(tiny=True)
    model = tacotron_model_factory(hp)
    sample = _make_batch(hp, B=2, T_in=10, T_out=8, seed=0)
    state = create_train_state(model, hp, sample, jax.random.PRNGKey(0))
    step_fn = make_train_step(model, hp, donate=False)
    rng = jax.random.PRNGKey(7)

    def concat(a, b):
        if a is None:
            return None
        return np.concatenate([np.asarray(a), np.asarray(b)], axis=0)

    losses = []
    for k in range(n_steps):
        local0 = _make_batch(hp, B=2, T_in=10, T_out=8, seed=100 + 10 * k)
        local1 = _make_batch(hp, B=2, T_in=10, T_out=8, seed=100 + 10 * k + 1)
        gb = jax.tree_util.tree_map(concat, local0, local1,
                                    is_leaf=lambda x: x is None)
        state, metrics = step_fn(state, gb, rng)
        losses.append(float(metrics["loss"]))

    np.testing.assert_allclose(results[0]["losses"], losses, rtol=2e-4)
    leaf = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    np.testing.assert_allclose(results[0]["param_leaf_sum"],
                               float(leaf.sum()), rtol=2e-4)


# ------------------------------------------------------- 2-process CLI smoke

@pytest.mark.slow
def test_two_process_train_cli(tmp_path):
    """The real train CLI in 2-process mode on a synthetic corpus:
    both exit 0, the coordinator alone writes metrics/checkpoints, and the
    checkpoint is restorable."""
    from test_e2e_cli import TINY_HPARAMS

    root = tmp_path / "corpus"
    root.mkdir()
    rng = np.random.RandomState(0)
    keys = []
    for spk in (225, 226):
        for i in range(6):
            key = f"p{spk}_{i:03d}"
            codes = " ".join(str(int(c))
                             for c in rng.randint(0, 12, rng.randint(4, 14)))
            (root / f"{key}.txt").write_text(f"hi there {i}\t{codes}\n")
            keys.append(key)
    (root / "speaker-info.txt").write_text(
        "ID AGE GENDER\n225 23 F\n226 22 M\n")

    data_dir = tmp_path / "data"
    ckpt_dir = tmp_path / "ckpt"
    hp = dict(TINY_HPARAMS)
    hp["batch_size"] = 4            # 2 rows per host, 1 per global device
    hp["multihost_source_pad_length"] = 32
    hp_json = tmp_path / "hparams.json"
    hp_json.write_text(json.dumps(hp))

    from self_attention_tacotron_tpu.cli.preprocess import main_vqcodes
    rc = main_vqcodes([str(root), str(data_dir), "--version", "0",
                       "--num-codes", "12",
                       "--speaker-info", str(root / "speaker-info.txt"),
                       "--hparam-json-file", str(hp_json),
                       "--num-workers", "1"])
    assert rc == 0
    (data_dir / "train.csv").write_text("\n".join(keys[:10]) + "\n")
    (data_dir / "validation.csv").write_text("\n".join(keys[10:11]) + "\n")

    argv = ["-m", "self_attention_tacotron_tpu.cli.train",
            "--source-data-root", str(data_dir),
            "--target-data-root", str(data_dir),
            "--checkpoint-dir", str(ckpt_dir),
            "--hparam-json-file", str(hp_json),
            "--max-steps", "3"]
    _spawn_processes(2, argv)

    # metrics written exactly once (coordinator only)
    metrics = (ckpt_dir / "metrics.jsonl").read_text().strip().splitlines()
    steps = [json.loads(line)["step"] for line in metrics]
    assert len(steps) == len(set(steps)), "duplicate metric rows"
    # checkpoint restorable and at the final step
    from self_attention_tacotron_tpu.utils.checkpoint import CheckpointManager
    mgr = CheckpointManager(str(ckpt_dir))
    assert mgr.latest_step() == 3
    restored = mgr.restore(None)
    mgr.close()
    assert restored is not None
