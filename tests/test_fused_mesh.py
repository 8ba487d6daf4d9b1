"""Fused training kernels under a multi-device mesh.

Every shipped recipe turns ``decoder_fused_train`` on AND trains data
parallel (reference: train.py:67 MirroredStrategy).  A ``pallas_call`` is
opaque to GSPMD, so the fused trunk runs under ``shard_map`` over the mesh
batch axis (models/decoder.py ``_shard_mapped_fused_scan``).  These tests
run the 8-virtual-CPU-device mesh deterministically (dropout/zoneout zero —
the in-kernel PRNG gate allows interpret mode then) and assert the meshed
step reproduces the single-device fused step: loss, outputs, and the full
gradient pytree (the shard_map transpose must psum the replicated-weight
cotangents over the mesh axis).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from self_attention_tacotron_tpu.models import (DecoderMode, compute_loss,
                                                tacotron_model_factory)
from self_attention_tacotron_tpu.parallel.mesh import (create_mesh,
                                                       replicated_sharding,
                                                       shard_batch)
from test_tacotron_model import make_batch, tiny_hp

DET = dict(encoder_prenet_drop_rate=0.0, decoder_prenet_drop_rate=0.0,
           self_attention_drop_rate=0.0,
           decoder_self_attention_drop_rate=0.0,
           zoneout_factor_cell=0.0, zoneout_factor_output=0.0)


def _loss_and_grads(model, variables, batch, hp):
    def loss(v):
        rngs = {"dropout": jax.random.PRNGKey(1),
                "zoneout": jax.random.PRNGKey(2)}
        out, _ = model.apply(v, batch, DecoderMode.TRAIN, rngs=rngs,
                             mutable=["batch_stats"])
        return compute_loss(hp, out, batch, v["params"])["loss"], out

    return jax.value_and_grad(loss, has_aux=True)(variables)


def _assert_tree_close(a, b, rtol, atol):
    for x, y in zip(jax.tree_util.tree_leaves(a),
                    jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=rtol, atol=atol)


def _count_fused_calls(monkeypatch):
    """Patch fused_teacher_scan with a call counter (trace-time count)."""
    from self_attention_tacotron_tpu.ops import fused_train as ft
    calls = []
    orig = ft.fused_teacher_scan

    def counted(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(ft, "fused_teacher_scan", counted)
    return calls


@pytest.mark.parametrize("recipe", [False, True],
                         ids=["additive", "forward_speaker"])
def test_fused_train_mesh_matches_single_device(monkeypatch, recipe):
    """8-device meshed fused train == single-device fused train (loss,
    outputs, gradients).  ``recipe=True`` runs the shipped-recipe feature
    set: forward attention (location conv + recursion, save_align aux
    stream) + speaker conditioning (batch-sharded speaker row)."""
    kw = dict(DET, decoder_fused_train=True)
    if recipe:
        kw.update(attention="forward", use_speaker_embedding=True,
                  num_speakers=4, speaker_embedding_dim=8,
                  speaker_embedd_to_prenet=True)
    hp = tiny_hp(**kw)
    B = 8
    batch = make_batch(hp, B=B, T_in=7, T_out=6)
    if recipe:
        batch = batch._replace(
            speaker_id=jnp.arange(B, dtype=jnp.int32) % 4)

    single = tacotron_model_factory(hp)
    variables = single.init({"params": jax.random.PRNGKey(0)}, batch,
                            DecoderMode.VALIDATION, True)
    (l_ref, out_ref), g_ref = _loss_and_grads(single, variables, batch, hp)

    mesh = create_mesh(devices=jax.devices()[:8])
    meshed = tacotron_model_factory(hp, mesh=mesh)
    calls = _count_fused_calls(monkeypatch)
    v_rep = jax.device_put(variables, replicated_sharding(mesh))
    b_sh = shard_batch(batch, mesh)
    (l_m, out_m), g_m = _loss_and_grads(meshed, v_rep, b_sh, hp)
    assert calls, "meshed TRAIN did not route through the fused trunk"

    np.testing.assert_allclose(float(l_m), float(l_ref), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(out_m.outputs),
                               np.asarray(out_ref.outputs),
                               rtol=2e-4, atol=2e-5)
    # gradient parity: the replicated-weight cotangents must be psum'd
    # across the mesh axis — any missing reduction shows up here as a
    # factor-of-n or single-shard gradient
    _assert_tree_close(g_m, g_ref, rtol=2e-3, atol=2e-5)
    if recipe:
        # forward sources stream their alignments for the backward; the
        # meshed run must materialize the same ones
        for a_m, a_r in zip(out_m.alignments, out_ref.alignments):
            assert float(np.abs(np.asarray(a_m)).max()) > 0
            np.testing.assert_allclose(np.asarray(a_m), np.asarray(a_r),
                                       rtol=2e-4, atol=2e-5)


def test_fused_train_mesh_indivisible_batch_falls_back(monkeypatch):
    """A batch that does not divide over the mesh falls back to the XLA
    scan with a logged reason (never a wrong-shape crash or silent
    replication)."""
    import logging

    from self_attention_tacotron_tpu.models import decoder as decoder_mod

    decoder_mod._warned_fused_fallback.clear()
    hp = tiny_hp(decoder_fused_train=True, **DET)
    batch = make_batch(hp, B=6, T_in=7, T_out=6)
    mesh = create_mesh(devices=jax.devices()[:4])
    model = tacotron_model_factory(hp, mesh=mesh)
    calls = _count_fused_calls(monkeypatch)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                           DecoderMode.VALIDATION, True)
    logger = logging.getLogger("self_attention_tacotron_tpu.models.decoder")
    records = []
    handler = logging.Handler()
    handler.emit = records.append
    logger.addHandler(handler)
    try:
        (l, _), _ = _loss_and_grads(model, variables, batch, hp)
    finally:
        logger.removeHandler(handler)
    assert np.isfinite(float(l))
    assert not calls, "indivisible batch must not reach the fused trunk"
    msgs = [r.getMessage() for r in records]
    assert any("does not divide over the 4-device mesh" in m for m in msgs), msgs


def test_fused_train_mesh_local_batch_gate_is_per_device():
    """The TPU sublane gate must evaluate the PER-DEVICE batch: global 32
    over 8 devices is 4 rows/device, which the fused kernel cannot tile.
    (Exercised directly on the gate — the TPU branch is not reachable on
    the CPU test backend.)"""
    from self_attention_tacotron_tpu.models import decoder as decoder_mod

    hp = tiny_hp(decoder_fused_train=True, **DET)
    mesh = create_mesh(devices=jax.devices()[:8])
    model = tacotron_model_factory(hp, mesh=mesh)
    batch = make_batch(hp, B=8, T_in=7, T_out=6)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                           DecoderMode.VALIDATION, True)
    bound = model.bind(variables)
    dec = bound.decoder
    assert dec._fused_mesh_shards() == 8
    # emulate the TPU branch of the gate arithmetic
    shards = dec._fused_mesh_shards()
    for B, ok in ((32, False), (64, True), (128, True), (72, False)):
        b_local = B // shards if B % shards == 0 else B
        assert (b_local % 8 == 0) is ok, (B, b_local)
