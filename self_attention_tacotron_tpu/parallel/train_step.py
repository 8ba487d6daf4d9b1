"""Jitted train / eval / predict steps with SPMD data parallelism.

Parity targets:
* optimizer — Adam with noam warmup decay and global-norm-1.0 gradient
  clipping (reference: models/models.py:175-189).
* eval — the reference's double evaluation pass: free-running losses plus the
  reliable ``*_with_teacher`` metrics from a second teacher-forced decode
  (reference: models/models.py:208-235, README.md:86-89).
* predict — free-running (or forced-alignment double-pass) decode producing
  the prediction dictionary tensors (reference: models/models.py:252-277).

TPU notes: the functions are jitted with sharding annotations — batch sharded
over the mesh 'data' axis, state replicated — so XLA emits the gradient
all-reduce over ICI itself (no explicit psum needed, GSPMD inserts it).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from ..config import HParams
from ..models.decoder import DecoderMode
from ..models.tacotron import Batch, TacotronModel, compute_loss
from ..ops.losses import noam_learning_rate
from .mesh import batch_sharding, replicated_sharding


class TrainState(NamedTuple):
    step: jax.Array
    params: Any
    batch_stats: Any
    constants: Any
    opt_state: Any


def make_optimizer(hp: HParams) -> optax.GradientTransformation:
    """clip_by_global_norm(1.0) -> Adam(noam decay)
    (reference: models/models.py:176-189)."""
    if hp.decay_learning_rate:
        schedule = lambda step: noam_learning_rate(
            hp.initial_learning_rate, step, hp.learning_rate_step_factor)
    else:
        schedule = hp.initial_learning_rate
    return optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adam(learning_rate=schedule, b1=hp.adam_beta1, b2=hp.adam_beta2,
                   eps=hp.adam_eps),
    )


def create_train_state(model: TacotronModel, hp: HParams, sample_batch: Batch,
                       rng: jax.Array) -> TrainState:
    variables = model.init({"params": rng}, sample_batch,
                           DecoderMode.VALIDATION, True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    constants = variables.get("constants", {})
    tx = make_optimizer(hp)
    opt_state = tx.init(params)
    return TrainState(step=jnp.asarray(0, jnp.int32), params=params,
                      batch_stats=batch_stats, constants=constants,
                      opt_state=opt_state)


def _model_variables(state: TrainState) -> dict:
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    if state.constants:
        variables["constants"] = state.constants
    return variables


def make_train_step(model: TacotronModel, hp: HParams,
                    mesh: Optional[Mesh] = None,
                    donate: bool = True,
                    with_alignments: bool = False) -> Callable:
    """Returns jitted ``train_step(state, batch, rng) -> (state, metrics)``.

    With ``with_alignments`` the step additionally returns
    ``(alignments_row0, outputs_row0)`` from the TRAIN-mode forward — the
    teacher-forced training-graph artifacts the reference's train-time
    MetricsSaver plots (reference: models/models.py:191-199) — replicated
    over the mesh so every host can read them.  Callers jit this variant
    only for plot steps; the plain variant stays free of the alignment
    materialization cost on additive configs."""
    tx = make_optimizer(hp)

    def loss_fn(params, state: TrainState, batch: Batch, rng):
        variables = {"params": params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        if state.constants:
            variables["constants"] = state.constants
        rngs = {"dropout": jax.random.fold_in(rng, 0),
                "zoneout": jax.random.fold_in(rng, 1)}
        mutable = ["batch_stats"] if state.batch_stats else []
        kw = dict(want_alignments=True) if with_alignments else {}
        out, mutated = model.apply(variables, batch, DecoderMode.TRAIN,
                                   rngs=rngs, mutable=mutable, **kw) \
            if mutable else (model.apply(variables, batch, DecoderMode.TRAIN,
                                         rngs=rngs, **kw), {})
        losses = compute_loss(hp, out, batch, params)
        new_batch_stats = mutated.get("batch_stats", state.batch_stats)
        return losses["loss"], (losses, new_batch_stats, out)

    def train_step(state: TrainState, batch: Batch, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, (losses, new_batch_stats, out)), grads = grad_fn(
            state.params, state, batch, rng)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {k: v for k, v in losses.items()}
        metrics["learning_rate"] = (
            noam_learning_rate(hp.initial_learning_rate, state.step,
                               hp.learning_rate_step_factor)
            if hp.decay_learning_rate else
            jnp.asarray(hp.initial_learning_rate))
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = TrainState(step=state.step + 1, params=new_params,
                               batch_stats=new_batch_stats,
                               constants=state.constants,
                               opt_state=new_opt_state)
        if with_alignments:
            plot = (tuple(jax.lax.stop_gradient(a[0])
                          for a in out.alignments),
                    jax.lax.stop_gradient(out.outputs[0]))
            if mesh is not None:
                plot = jax.lax.with_sharding_constraint(
                    plot, replicated_sharding(mesh))
            return new_state, metrics, plot
        return new_state, metrics

    # Sharding is carried by input placement: callers put the batch through
    # ``mesh.shard_batch`` (leading dim over 'data') and keep state
    # replicated; GSPMD propagates and inserts the gradient all-reduce.
    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(model: TacotronModel, hp: HParams) -> Callable:
    """Returns jitted ``eval_step(state, batch) -> metrics`` implementing the
    reference's two-pass evaluation (reference: models/models.py:208-235)."""

    def eval_step(state: TrainState, batch: Batch):
        variables = _model_variables(state)
        # pass 1: free-running decode
        out_free = model.apply(variables, batch, DecoderMode.VALIDATION, False)
        losses_free = compute_loss(hp, out_free, batch, state.params)
        # pass 2: teacher forcing — the reliable metrics
        out_teacher = model.apply(variables, batch, DecoderMode.VALIDATION,
                                  True)
        losses_teacher = compute_loss(hp, out_teacher, batch, state.params)
        main_key = ("code_loss" if "code_loss" in losses_free
                    else "mel_loss" if "mel_loss" in losses_free
                    else "mgc_loss")
        metrics = {
            main_key: losses_free[main_key],
            "done_loss": losses_free["done_loss"],
            "loss": losses_free["loss"],
            "loss_with_teacher": losses_teacher["loss"],
            f"{main_key}_with_teacher": losses_teacher[main_key],
            "done_loss_with_teacher": losses_teacher["done_loss"],
            "l2_regularization_loss": losses_free["l2_regularization_loss"],
        }
        return metrics, out_free, out_teacher

    return jax.jit(eval_step)


def make_predict_step(model: TacotronModel, hp: HParams) -> Callable:
    """Returns jitted ``predict_step(state, batch) -> TacotronOutput``.

    With ``hp.use_forced_alignment_mode`` the decode runs twice: the second
    pass replays the first pass's alignments through teacher-forcing
    attention (reference: models/models.py:118-148).
    """

    def predict_step(state: TrainState, batch: Batch):
        variables = _model_variables(state)
        out = model.apply(variables, batch, DecoderMode.INFERENCE)
        if hp.use_forced_alignment_mode:
            teacher = tuple(jnp.swapaxes(a, 1, 2) for a in out.alignments)
            out = model.apply(variables, batch, DecoderMode.VALIDATION, False,
                              teacher)
        return out

    return jax.jit(predict_step)
