"""Accent-type end-to-end: real accent ids from preprocessing through the
dataset into SelfAttentionCBHGEncoderWithAccentType training.

Round-1 gap: the accent encoders only ever saw the constant unknown fill
(reference capability: hparams.py:55-62, modules/module.py:444-527).  Here
a synthetic corpus with an accents.txt table is preprocessed with
--accent-file, the source records carry per-token accent ids, the dataset
threads them into the batch, and a train step runs on them.
"""

import json
import os

import numpy as np
import pytest

from test_e2e_cli import TINY_HPARAMS

ACCENT_HPARAMS = dict(
    TINY_HPARAMS,
    use_accent_type=True,
    encoder="SelfAttentionCBHGEncoderWithAccentType",
    accent_type_embedding_dim=8,
    num_accent_type=4,
    accent_type_offset=100,
    accent_type_unknown=103,
    # CBHG residual: last prenet dims must sum to projection2_out_channels
    # (6 + 2 == 8, mirroring the reference's 112 + 16 == 128)
    accent_type_prenet_out_units=[8, 2],
    encoder_prenet_out_units_if_accent=[12, 6],
)


@pytest.fixture(scope="module")
def accent_corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("accent_corpus")
    rng = np.random.RandomState(0)
    keys = []
    for spk in (225, 234, 238):  # English, Scottish, NorthernIrish
        for i in range(3):
            key = f"p{spk}_{i:03d}"
            codes = " ".join(str(int(c))
                             for c in rng.randint(0, 12, rng.randint(4, 14)))
            (root / f"{key}.txt").write_text(f"accent test {i}\t{codes}\n")
            keys.append(key)
    (root / "speaker-info.txt").write_text(
        "ID AGE GENDER\n225 23 F\n234 22 M\n238 24 F\n")
    (root / "accents.txt").write_text(
        "ID ACCENTS\n225 English\n234 Scottish\n238 NorthernIrish\n")
    return root, keys


@pytest.fixture(scope="module")
def processed(accent_corpus, tmp_path_factory):
    root, keys = accent_corpus
    data_dir = tmp_path_factory.mktemp("accent_data")
    hp_json = data_dir / "hparams.json"
    hp_json.write_text(json.dumps(ACCENT_HPARAMS))
    from self_attention_tacotron_tpu.cli.preprocess import main_vqcodes
    rc = main_vqcodes([str(root), str(data_dir), "--version", "0",
                       "--num-codes", "12",
                       "--speaker-info", str(root / "speaker-info.txt"),
                       "--accent-file", str(root / "accents.txt"),
                       "--hparam-json-file", str(hp_json),
                       "--num-workers", "1"])
    assert rc == 0
    return data_dir, keys


def _hp():
    from self_attention_tacotron_tpu.config import default_hparams
    hp = default_hparams()
    for k, v in ACCENT_HPARAMS.items():
        hp.set_hparam(k, v)
    return hp


def test_source_records_carry_accent_ids(processed):
    from self_attention_tacotron_tpu.data.dataset import load_utterance
    data_dir, keys = processed
    hp = _hp()
    by_speaker = {}
    for key in keys:
        u = load_utterance(os.path.join(data_dir, f"{key}.source.tfrecord"),
                           None, hp, "codes")
        assert u.accent_type is not None
        ids = set(np.asarray(u.accent_type).tolist())
        assert len(ids) == 1  # per-speaker accent broadcast over tokens
        by_speaker.setdefault(key.split("_")[0], set()).update(ids)
    # three speakers -> three DIFFERENT real accent ids, none unknown
    all_ids = sorted(set().union(*by_speaker.values()))
    assert len(all_ids) == 3, by_speaker
    assert all(100 <= i < 103 for i in all_ids), all_ids


def test_batch_threads_real_accent_ids(processed):
    from self_attention_tacotron_tpu.data.dataset import (dataset_factory,
                                                          find_dataset_files,
                                                          to_model_batch)
    data_dir, keys = processed
    hp = _hp()
    src = find_dataset_files(str(data_dir), keys, hp.source_file_extension)
    tgt = find_dataset_files(str(data_dir), keys, hp.target_file_extension)
    ds = dataset_factory(src, tgt, hp, target_kind="codes", shuffle=False)
    nb = next(iter(ds))
    mb = to_model_batch(nb)
    assert mb.accent_type is not None
    # real rows carry the speaker's accent id; padding carries unknown
    for row, length in zip(np.asarray(mb.accent_type),
                            np.asarray(mb.source_length)):
        assert np.all((row[:length] >= 100) & (row[:length] < 103))
        assert np.all(row[length:] == 103)


def test_train_step_on_real_accent_ids(processed):
    import jax
    from self_attention_tacotron_tpu.data.dataset import (dataset_factory,
                                                          find_dataset_files,
                                                          to_model_batch)
    from self_attention_tacotron_tpu.models import tacotron_model_factory
    from self_attention_tacotron_tpu.parallel import (create_train_state,
                                                      make_train_step)
    data_dir, keys = processed
    hp = _hp()
    src = find_dataset_files(str(data_dir), keys, hp.source_file_extension)
    tgt = find_dataset_files(str(data_dir), keys, hp.target_file_extension)
    ds = dataset_factory(src, tgt, hp, target_kind="codes", shuffle=False)
    mb = to_model_batch(next(iter(ds)))
    assert len(set(np.asarray(mb.accent_type)[:, 0].tolist())) >= 1

    model = tacotron_model_factory(hp)
    state = create_train_state(model, hp, mb, jax.random.PRNGKey(0))
    assert "accent_embedding" in state.params  # accent path really built
    step = make_train_step(model, hp, donate=False)
    state, metrics = step(state, mb, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))

    # the accent ids influence the computation: zeroing the accent embedding
    # table changes the loss
    import flax
    variables = flax.core.unfreeze({"params": state.params})
    emb_path = variables["params"]["accent_embedding"]
    key = list(emb_path.keys())[0]
    emb_path[key] = emb_path[key] * 0.0
    from self_attention_tacotron_tpu.parallel.train_step import TrainState
    state2 = TrainState(state.step, variables["params"], state.batch_stats,
                        state.constants, state.opt_state)
    _, metrics2 = step(state2, mb, jax.random.PRNGKey(1))
    assert not np.isclose(float(metrics["loss"]), float(metrics2["loss"]))
