"""Training CLI: train + periodic evaluation + checkpointing.

Parity target: reference train.py — flags, hparams layering
(defaults -> --hparam-json-file -> --hparams, train.py:110-115), key-list
driven datasets (train.py:117-123), periodic checkpoint+eval
(RunConfig(save_checkpoints_steps) + eval hooks, train.py:69-87), warm start
(train.py:75-77), file logging (train.py:128-135), profiler flag
(models/models.py:201-204).

Usage:
  python -m self_attention_tacotron_tpu.cli.train --source-data-root=<dir>
      --target-data-root=<dir> --checkpoint-dir=<dir>
      [--selected-list-dir=<dir>] [--hparams=<parmas>]
      [--hparam-json-file=<path>] [--dataset-kind=<kind>]
      [--max-steps=<n>] [--multi-gpus]
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
import time
from typing import Optional

import jax
import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--source-data-root", required=True)
    p.add_argument("--target-data-root", required=True)
    p.add_argument("--checkpoint-dir", required=True)
    p.add_argument("--selected-list-dir", default=None)
    p.add_argument("--hparams", default="")
    p.add_argument("--hparam-json-file", default=None)
    p.add_argument("--dataset-kind", default=None,
                   help="codes|mel|mgclf0 (default: derived from hp.dataset)")
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--multi-gpus", action="store_true",
                   help="accepted for reference-CLI parity; SPMD data "
                        "parallelism engages automatically on multi-device "
                        "meshes")
    # multi-host data parallelism (extends the reference's single-host
    # MirroredStrategy, reference train.py:67): every process runs this CLI
    # with the same coordinator address and its own process id; env vars
    # JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID work too
    p.add_argument("--coordinator-address", default=None,
                   help="host:port of process 0 (enables multi-host mode)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    return p


def load_hparams(args):
    from ..config import default_hparams
    hp = default_hparams()
    if args.hparam_json_file:
        hp.parse_json_file(args.hparam_json_file)
    hp.parse(args.hparams)
    return hp


class EvalThrottle:
    """EvalSpec cadence (reference: train.py:82-85, hparams.py:193-197).

    Evaluation is checkpoint-driven, but skipped until
    ``eval_start_delay_secs`` after training start and rate-limited to at
    most one evaluation per ``eval_throttle_secs`` (tf.estimator
    ``EvalSpec(start_delay_secs, throttle_secs)`` semantics).
    """

    def __init__(self, start_delay_secs: float, throttle_secs: float,
                 now: Optional[float] = None):
        self.start_delay_secs = float(start_delay_secs)
        self.throttle_secs = float(throttle_secs)
        self.start_time = time.time() if now is None else now
        self.last_eval_time: Optional[float] = None

    def should_eval(self, now: Optional[float] = None) -> bool:
        """True if an eval is due now; records the eval time when True."""
        now = time.time() if now is None else now
        if now - self.start_time < self.start_delay_secs:
            return False
        if (self.last_eval_time is not None
                and now - self.last_eval_time < self.throttle_secs):
            return False
        self.last_eval_time = now
        return True


def setup_logging(hp, checkpoint_dir, process_index: int = 0):
    os.makedirs(checkpoint_dir, exist_ok=True)
    name = os.path.basename(hp.logfile)
    if process_index:  # per-host log files under a shared checkpoint dir
        name = f"{name}.p{process_index}"
    logfile = os.path.join(checkpoint_dir, name)
    logging.basicConfig(
        level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s",
        handlers=[logging.StreamHandler(sys.stdout),
                  logging.FileHandler(logfile)])
    return logging.getLogger("train")


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)
    hp = load_hparams(args)

    # multi-host wiring must precede any JAX backend use
    from ..parallel.multihost import (assemble_global_batch, host_local_copy,
                                      initialize_distributed, is_coordinator,
                                      local_batch_size, shard_files)
    multihost = initialize_distributed(args.coordinator_address,
                                       args.num_processes, args.process_id)
    coordinator = is_coordinator()

    log = setup_logging(hp, args.checkpoint_dir,
                        process_index=jax.process_index())
    from ..config import hparams_debug_string
    log.info(hparams_debug_string(hp))
    if multihost:
        log.info("multi-host: process %d/%d, %d local / %d global devices",
                 jax.process_index(), jax.process_count(),
                 jax.local_device_count(), jax.device_count())

    from ..data.dataset import (dataset_factory, find_dataset_files,
                                load_key_list, pad_model_batch_rows,
                                to_model_batch)
    from ..models import tacotron_model_factory, compute_loss
    from ..parallel import (create_mesh, create_train_state, make_eval_step,
                            make_train_step)
    from ..parallel.mesh import replicated_sharding, shard_batch
    from ..utils.checkpoint import CheckpointManager, warm_start
    from ..utils.metrics import MetricsLogger, MetricsSaver

    list_dir = args.selected_list_dir or args.source_data_root
    train_keys = load_key_list(os.path.join(list_dir, "train.csv"))
    val_keys = load_key_list(os.path.join(list_dir, "validation.csv"))
    log.info("train %d validation %d", len(train_keys), len(val_keys))
    if multihost:
        # per-host input sharding: this host reads only its slice of the
        # corpus (replaces MirroredStrategy's in-graph batch splitting)
        train_keys = shard_files(train_keys)
        log.info("host shard: %d train keys", len(train_keys))

    def files(keys):
        return (find_dataset_files(args.source_data_root, keys,
                                   hp.source_file_extension),
                find_dataset_files(args.target_data_root, keys,
                                   hp.target_file_extension))

    train_src, train_tgt = files(train_keys)
    val_src, val_tgt = files(val_keys)
    kind_kw = {"target_kind": args.dataset_kind} if args.dataset_kind else {}
    if multihost:
        # lockstep shapes: each host emits identical local batch shapes
        # every step so the per-host shards glue into one global array.
        # Default: a deterministic shared bucket schedule (all hosts draw
        # the same per-step pad from the COMMON seed, each fills from its
        # shard) — per-bucket static shapes instead of worst-case padding
        # on every batch.  An explicit multihost_target_pad_length (or
        # multihost_bucket_schedule=false) selects the single fixed pad.
        kind_kw["fixed_source_pad"] = hp.multihost_source_pad_length
        if hp.multihost_bucket_schedule and not hp.multihost_target_pad_length:
            kind_kw["bucket_schedule_seed"] = hp.seed
            if hp.multihost_bucket_weights:
                kind_kw["bucket_weights"] = hp.multihost_bucket_weights
            kind_kw["bucket_buffer_cap"] = hp.multihost_bucket_buffer_cap
        else:
            kind_kw["fixed_target_pad"] = (hp.multihost_target_pad_length
                                           or hp.max_iters
                                           * hp.outputs_per_step)
        train_bs = local_batch_size(hp.batch_size)
        data_seed = hp.seed + jax.process_index()  # per-host shuffle only;
        #          the model/step RNG stays identical on every process
    else:
        train_bs = hp.batch_size
        data_seed = hp.seed
    train_ds = dataset_factory(train_src, train_tgt, hp, shuffle=True,
                               repeat=True, drop_remainder=True,
                               batch_size=train_bs, seed=data_seed, **kind_kw)
    val_kw = dict(kind_kw)
    for k in ("fixed_target_pad", "fixed_source_pad", "bucket_schedule_seed",
              "bucket_weights", "bucket_buffer_cap"):
        val_kw.pop(k, None)
    val_ds_factory = lambda: dataset_factory(
        val_src, val_tgt, hp, batch_size=1, shuffle=False, **val_kw)

    mesh = create_mesh(hp.mesh_shape, hp.mesh_axis_names)
    n_dev = int(mesh.devices.size)
    if hp.batch_size % n_dev != 0:
        if multihost:
            raise ValueError(f"batch_size {hp.batch_size} must divide over "
                             f"{n_dev} global devices in multi-host mode")
        # batch must shard evenly over the data axis; shrink the mesh to the
        # largest divisor of batch_size (1 in the worst case)
        divisor = max(d for d in range(1, n_dev + 1)
                      if hp.batch_size % d == 0)
        log.warning("batch_size %d not divisible by %d devices; using %d",
                    hp.batch_size, n_dev, divisor)
        n_dev = divisor
        mesh = create_mesh(devices=jax.devices()[:n_dev])
    log.info("mesh: %s devices", n_dev)
    # mesh-aware model: the fused training trunk shard_maps over the batch
    # axis when the mesh has >1 device (pallas_call is opaque to GSPMD)
    model = tacotron_model_factory(hp, mesh=mesh if n_dev > 1 else None)

    sample = to_model_batch(next(iter(train_ds)))
    state = create_train_state(model, hp, sample, jax.random.PRNGKey(hp.seed))
    if hp.warm_start and hp.ckpt_to_initialize_from:
        log.info("warm starting from %s", hp.ckpt_to_initialize_from)
        new_params = warm_start(state.params, hp.ckpt_to_initialize_from,
                                hp.vars_to_warm_start)
        state = state._replace(params=new_params)

    ckpt = CheckpointManager(args.checkpoint_dir,
                             save_interval_steps=hp.save_checkpoints_steps,
                             max_to_keep=hp.keep_checkpoint_max,
                             async_save=hp.checkpoint_async)
    restored = ckpt.restore(state)
    if restored is not None:
        state = restored
        log.info("resumed from step %d", int(state.step))

    if n_dev > 1:
        state = jax.device_put(state, replicated_sharding(mesh))

    train_step = make_train_step(model, hp, mesh=mesh if n_dev > 1 else None)
    # plot-step variant: same update, but the TRAIN-mode forward also
    # returns row-0 alignments/outputs (replicated), so train-time plots
    # come from the training graph itself — no extra VALIDATION probe pass
    # (reference: MetricsSaver on the train graph, models/models.py:191-199)
    train_step_plot = make_train_step(model, hp,
                                      mesh=mesh if n_dev > 1 else None,
                                      with_alignments=True)
    eval_step = make_eval_step(model, hp)
    # metrics/plots are written by the coordinator only (the analog of the
    # reference's single chief worker); other hosts train silently
    metrics_log = MetricsLogger(args.checkpoint_dir) if coordinator else None
    eval_saver = MetricsSaver(os.path.join(args.checkpoint_dir, "eval"),
                              save_steps=1, mode="eval",
                              keep_max=hp.keep_eval_results_max_epoch) \
        if coordinator else None
    # train-time alignment plots every alignment_save_steps
    # (reference: MetricsSaver hook, models/models.py:191-199)
    train_saver = MetricsSaver(os.path.join(args.checkpoint_dir, "alignments"),
                               save_steps=hp.alignment_save_steps,
                               mode="train") if coordinator else None

    rng = jax.random.PRNGKey(hp.seed)
    t_last = time.time()
    profiling = False
    eval_throttle = EvalThrottle(hp.eval_start_delay_secs,
                                 hp.eval_throttle_secs)

    def run_eval(step_no, eval_state):
        n = 0
        acc = {}
        for nb in val_ds_factory():
            if n >= hp.num_evaluation_steps:
                break
            mb = to_model_batch(nb)
            metrics, out_free, out_teacher = eval_step(eval_state, mb)
            for k, v in metrics.items():
                acc[k] = acc.get(k, 0.0) + float(v)
            if n == 0:
                aligns = [np.asarray(a[0]) for a in out_free.alignments]
                pred = np.asarray(out_free.outputs[0])
                if model.is_mgclf0:
                    # mgc/lf0 artifact path: panel plots + prediction record
                    # (reference: modules/metrics.py:79-128 MgcLf0MetricsSaver,
                    # utils/tfrecord.py:160-199)
                    from ..data.records import (MgcLf0PredictionRecord,
                                                write_mgc_lf0_prediction_record)
                    lf0_pred = np.asarray(jax.nn.softmax(
                        out_free.outputs2[0], axis=-1))
                    meta = nb.meta[0]
                    src = nb.source[0][:int(nb.source_length[0])]
                    rec = MgcLf0PredictionRecord(
                        id=meta.id, key=meta.key, mgc=pred,
                        ground_truth_mgc=nb.target[0], lf0=lf0_pred,
                        ground_truth_lf0=nb.target2[0], alignments=aligns,
                        text=meta.text, source=src)
                    eval_saver.save_mgc_lf0(
                        step_no, meta.key, meta.text, aligns, nb.target[0],
                        pred, nb.target2[0], lf0_pred,
                        prediction_record_writer=lambda p: (
                            write_mgc_lf0_prediction_record(rec, p)))
                else:
                    gt = nb.target[0] if nb.target is not None else None
                    eval_saver.save(step_no, nb.meta[0].key, nb.meta[0].text,
                                    aligns, gt, pred)
            n += 1
        if n:
            acc = {k: v / n for k, v in acc.items()}
            metrics_log.log(step_no, acc, prefix="eval/")
            log.info("eval @%d: %s", step_no,
                     {k: round(v, 5) for k, v in acc.items()})

    for nb in train_ds.prefetch():
        step_no = int(state.step)
        if args.max_steps is not None and step_no >= args.max_steps:
            break
        mb_local = to_model_batch(nb)
        if multihost:
            # per-host local rows -> one global array over the mesh; the
            # jitted step is a single SPMD program across all hosts
            mb = assemble_global_batch(mb_local, mesh)
        elif n_dev > 1:
            if nb.source.shape[0] % n_dev != 0:
                # remainder batch: pad with loss-neutral rows (masks zeroed)
                # instead of dropping data — see data.dataset.pad_model_batch_rows
                mb_local, n_padded = pad_model_batch_rows(mb_local, n_dev)
                log.info("padded remainder batch %d -> %d rows",
                         nb.source.shape[0], nb.source.shape[0] + n_padded)
            mb = shard_batch(mb_local, mesh)
        else:
            mb = mb_local
        if (coordinator and hp.record_profile and not profiling
                and step_no == hp.profile_steps):
            jax.profiler.start_trace(os.path.join(args.checkpoint_dir,
                                                  "profile"))
            profiling = True
        # the plot-variant decision must be identical on every host (driven
        # by the shared step counter, never by coordinator-only state)
        will_plot = (hp.alignment_save_steps > 0
                     and (step_no + 1) % hp.alignment_save_steps == 0)
        plot_payload = None
        if will_plot:
            state, metrics, plot_payload = train_step_plot(state, mb, rng)
        else:
            state, metrics = train_step(state, mb, rng)
        step_no = int(state.step)
        if profiling and step_no >= hp.profile_steps + 5:
            jax.profiler.stop_trace()
            profiling = False
        if step_no % hp.log_step_count_steps == 0:
            dt = time.time() - t_last
            t_last = time.time()
            scalars = {k: float(v) for k, v in metrics.items()}
            scalars["sec_per_step"] = dt / hp.log_step_count_steps
            if metrics_log:
                metrics_log.log(step_no, scalars)
            log.info("step %d loss %.5f (%.3fs)", step_no, scalars["loss"],
                     scalars["sec_per_step"])
        if train_saver and plot_payload is not None:
            try:
                aligns0, out0 = plot_payload
                gt = nb.target if nb.target is not None else None
                train_saver.save(step_no, nb.meta[0].key, nb.meta[0].text,
                                 [np.asarray(a) for a in aligns0],
                                 gt[0] if gt is not None else None,
                                 np.asarray(out0))
            except Exception as e:  # plots must never kill training
                log.warning("alignment save failed: %s", e)
        # every process calls save (orbax coordinates; the primary writes)
        if ckpt.save(step_no, jax.device_get(state)):
            log.info("checkpoint @%d", step_no)
            if coordinator and eval_throttle.should_eval():
                run_eval(step_no,
                         host_local_copy(state) if multihost else state)

    ckpt.save(int(state.step), jax.device_get(state), force=True)
    ckpt.wait()
    ckpt.close()
    if metrics_log:
        metrics_log.close()
    log.info("done at step %d", int(state.step))
    return 0


if __name__ == "__main__":
    sys.exit(main())
