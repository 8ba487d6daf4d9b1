import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from self_attention_tacotron_tpu.models import tacotron_model_factory
from self_attention_tacotron_tpu.parallel import create_train_state
from self_attention_tacotron_tpu.utils.checkpoint import (
    CheckpointManager, warm_start,
)
from tests.test_tacotron_model import make_batch, tiny_hp


def test_checkpoint_save_restore_roundtrip(tmp_path):
    hp = tiny_hp(checkpoint_async=False)
    batch = make_batch(hp)
    model = tacotron_model_factory(hp)
    state = create_train_state(model, hp, batch, jax.random.PRNGKey(0))
    mgr = CheckpointManager(str(tmp_path / "ckpt"), save_interval_steps=1)
    assert mgr.save(0, jax.device_get(state))
    mgr.wait()
    restored = mgr.restore(state)
    mgr.close()
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_warm_start_regex_filter(tmp_path):
    hp = tiny_hp(checkpoint_async=False)
    batch = make_batch(hp)
    model = tacotron_model_factory(hp)
    state = create_train_state(model, hp, batch, jax.random.PRNGKey(0))
    ckpt_dir = str(tmp_path / "ckpt")
    mgr = CheckpointManager(ckpt_dir, save_interval_steps=1)
    mgr.save(3, jax.device_get(state))
    mgr.wait()
    mgr.close()

    fresh = create_train_state(model, hp, batch, jax.random.PRNGKey(99))
    # restore only embedding params (reference: vars_to_warm_start regexes)
    merged = warm_start(fresh.params, ckpt_dir, ["embedding"])
    flat_old = {"/".join(str(getattr(k, "key", k)) for k in p): v
                for p, v in jax.tree_util.tree_flatten_with_path(state.params)[0]}
    flat_new = {"/".join(str(getattr(k, "key", k)) for k in p): v
                for p, v in jax.tree_util.tree_flatten_with_path(merged)[0]}
    flat_fresh = {"/".join(str(getattr(k, "key", k)) for k in p): v
                  for p, v in jax.tree_util.tree_flatten_with_path(fresh.params)[0]}
    hit = miss = 0
    for name in flat_new:
        if "embedding" in name.lower():
            np.testing.assert_array_equal(np.asarray(flat_new[name]),
                                          np.asarray(flat_old[name]))
            hit += 1
        else:
            np.testing.assert_array_equal(np.asarray(flat_new[name]),
                                          np.asarray(flat_fresh[name]))
            miss += 1
    assert hit > 0 and miss > 0

    # full warm start (default [".*"]) restores everything
    merged_all = warm_start(fresh.params, ckpt_dir, [".*"])
    for p, v in jax.tree_util.tree_flatten_with_path(merged_all)[0]:
        name = "/".join(str(getattr(k, "key", k)) for k in p)
        np.testing.assert_array_equal(np.asarray(v),
                                      np.asarray(flat_old[name]))


def test_bfloat16_compute_path():
    hp = tiny_hp(compute_dtype="bfloat16")
    batch = make_batch(hp)
    model = tacotron_model_factory(hp)
    from self_attention_tacotron_tpu.models import DecoderMode
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                           DecoderMode.VALIDATION, True)
    # params stay float32
    for leaf in jax.tree_util.tree_leaves(variables["params"]):
        assert leaf.dtype == jnp.float32
    out = model.apply(variables, batch, DecoderMode.VALIDATION, True)
    assert np.isfinite(np.asarray(out.outputs, dtype=np.float32)).all()


def test_mgclf0_prediction_record_roundtrip(tmp_path):
    from self_attention_tacotron_tpu.data.records import (
        MgcLf0PredictionRecord, write_mgc_lf0_prediction_record,
    )
    from self_attention_tacotron_tpu.data.tfrecord import read_examples
    rec = MgcLf0PredictionRecord(
        id=1, key="k", mgc=np.ones((4, 3), np.float32),
        ground_truth_mgc=np.zeros((4, 3), np.float32),
        lf0=np.ones((4,), np.float32),
        ground_truth_lf0=np.zeros((4,), np.float32),
        alignments=[np.ones((2, 2), np.float32)], text="t",
        source=np.array([1, 2], np.int64))
    path = str(tmp_path / "p.tfrecord")
    write_mgc_lf0_prediction_record(rec, path)
    parsed = next(iter(read_examples(path)))
    assert parsed["mgc_width"] == ("int64", [3])
    assert parsed["target_length"] == ("int64", [4])
    mgc = np.frombuffer(parsed["mgc"][1][0], np.float32).reshape(4, 3)
    np.testing.assert_array_equal(mgc, rec.mgc)
