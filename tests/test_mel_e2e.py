"""End-to-end mel-spectrogram pipeline on synthetic wav corpora:
wav corpus -> preprocess (ljspeech / vctk) -> train -> predict_mel
(with and without PostNet-v2) -> .mfbsp / PNG / prediction record.

This covers the wav-corpus preprocessors (data/preprocess/{ljspeech,vctk}.py)
that no other test imports, and pins the PostNet-v2 prediction-output switch
(reference: predict_mel.py:61 writes ``predicted_mel_postnet`` to the
``.mfbsp`` when ``use_postnet_v2``).
"""

import json
import os

import numpy as np
import pytest
import scipy.io.wavfile


SR = 8000

MEL_HPARAMS = dict(
    tacotron_model="ExtendedTacotronV1Model",
    encoder="ZoneoutEncoderV1", decoder="ExtendedDecoder",
    dataset="ljspeech.dataset.DatasetSource",
    attention="additive",
    # audio: 8 kHz, n_fft=(num_freq-1)*2=128, 16 ms window, 8 ms hop
    sample_rate=SR, num_freq=65, num_mels=8,
    frame_length_ms=16.0, frame_shift_ms=8.0,
    trim_frame_length=256, trim_hop_length=64,
    num_symbols=80, embedding_dim=16, cbhg_out_units=16, conv_channels=8,
    max_filter_width=4, projection1_out_channels=8,
    projection2_out_channels=8, encoder_prenet_out_units=[16, 8],
    attention_out_units=12, decoder_prenet_out_units=[8, 4],
    decoder_out_units=16, max_iters=30, decoder_min_iters=1,
    outputs_per_step=2, n_feed_frame=1, batch_size=2,
    # dropout off so a library-level re-run of predict reproduces the CLI
    encoder_prenet_drop_rate=0.0, decoder_prenet_drop_rate=0.0,
    zoneout_factor_cell=0.0, zoneout_factor_output=0.0,
    save_checkpoints_steps=3, keep_checkpoint_max=2, num_evaluation_steps=1,
    approx_min_target_length=0, batch_bucket_width=64, phoneme="none",
    source="character", checkpoint_async=False, suffle_buffer_size=4,
    log_step_count_steps=2, eval_start_delay_secs=0, eval_throttle_secs=0,
)


def _tone(rng, seconds):
    t = np.arange(int(seconds * SR)) / SR
    f = rng.uniform(150.0, 900.0)
    wav = 0.4 * np.sin(2 * np.pi * f * t) * (0.6 + 0.4 * np.sin(2 * np.pi * 3 * t))
    return (wav * 32767).astype(np.int16)


@pytest.fixture(scope="module")
def ljspeech_corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("lj")
    (root / "wavs").mkdir()
    rng = np.random.RandomState(0)
    keys, lines = [], []
    for i in range(6):
        key = f"LJ001-{i:04d}"
        scipy.io.wavfile.write(root / "wavs" / f"{key}.wav", SR,
                               _tone(rng, rng.uniform(0.18, 0.3)))
        lines.append(f"{key}|Printing {i}|printing number {i}")
        keys.append(key)
    (root / "metadata.csv").write_text("\n".join(lines) + "\n")
    return root, keys


@pytest.fixture(scope="module")
def vctk_corpus(tmp_path_factory):
    """VCTK 0.8 layout: wav48/pNNN/*.wav + txt/pNNN/*.txt + speaker-info."""
    root = tmp_path_factory.mktemp("vctk")
    rng = np.random.RandomState(1)
    keys = []
    for spk in (225, 226):
        (root / "wav48" / f"p{spk}").mkdir(parents=True)
        (root / "txt" / f"p{spk}").mkdir(parents=True)
        for i in range(1, 4):
            key = f"p{spk}_{i:03d}"
            scipy.io.wavfile.write(root / "wav48" / f"p{spk}" / f"{key}.wav",
                                   SR, _tone(rng, rng.uniform(0.18, 0.3)))
            (root / "txt" / f"p{spk}" / f"{key}.txt").write_text(
                f"sentence number {i}.\n")
            keys.append(key)
    (root / "speaker-info.txt").write_text(
        "ID  AGE  GENDER  ACCENTS  REGION\n"
        "225  23  F    English    Southern  England\n"
        "226  22  M    English    Surrey\n")
    return root, keys


def _write_hp(tmp_path, data_dir, extra):
    """Merge the preprocess-emitted corpus statistics into the model config
    (the reference workflow: README.md tells users to merge the emitted
    hparams.json; reference preprocess_vctk.py:77-89)."""
    hp = dict(MEL_HPARAMS)
    stats_path = data_dir / "hparams.json"
    assert stats_path.exists(), "preprocess must emit corpus statistics"
    stats = json.loads(stats_path.read_text())
    assert len(stats["average_mel_level_db"]) == hp["num_mels"]
    assert np.all(np.isfinite(stats["average_mel_level_db"]))
    hp.update(stats)
    hp.update(extra)
    path = tmp_path / "hp.json"
    path.write_text(json.dumps(hp))
    return path


def _train(data_dir, ckpt_dir, hp_json, steps=4):
    from self_attention_tacotron_tpu.cli.train import main as train_main
    rc = train_main(["--source-data-root", str(data_dir),
                     "--target-data-root", str(data_dir),
                     "--checkpoint-dir", str(ckpt_dir),
                     "--hparam-json-file", str(hp_json),
                     "--max-steps", str(steps)])
    assert rc == 0


def _predict(data_dir, ckpt_dir, pred_dir, hp_json):
    from self_attention_tacotron_tpu.cli.predict import main_mel
    rc = main_mel(["--source-data-root", str(data_dir),
                   "--target-data-root", str(data_dir),
                   "--checkpoint-dir", str(ckpt_dir),
                   "--output-dir", str(pred_dir),
                   "--selected-list-dir", str(data_dir),
                   "--hparam-json-file", str(hp_json)])
    assert rc == 0


def test_ljspeech_mel_pipeline(ljspeech_corpus, tmp_path):
    root, keys = ljspeech_corpus
    data_dir, ckpt_dir, pred_dir = (tmp_path / d
                                    for d in ("data", "ckpt", "pred"))

    from self_attention_tacotron_tpu.cli.preprocess import main_ljspeech
    hp0 = tmp_path / "hp0.json"
    hp0.write_text(json.dumps(MEL_HPARAMS))
    rc = main_ljspeech([str(root), str(data_dir),
                        "--hparam-json-file", str(hp0),
                        "--num-workers", "1"])
    assert rc == 0
    assert (data_dir / f"{keys[0]}.source.tfrecord").exists()
    assert (data_dir / f"{keys[0]}.target.tfrecord").exists()

    hp_json = _write_hp(tmp_path, data_dir, {})
    (data_dir / "train.csv").write_text("\n".join(keys[:4]) + "\n")
    (data_dir / "validation.csv").write_text(keys[4] + "\n")
    (data_dir / "test.csv").write_text(keys[5] + "\n")

    _train(data_dir, ckpt_dir, hp_json)
    _predict(data_dir, ckpt_dir, pred_dir, hp_json)

    key = keys[5]
    dump = np.fromfile(pred_dir / f"{key}.mfbsp", "<f4")
    assert len(dump) > 0 and len(dump) % MEL_HPARAMS["num_mels"] == 0
    assert np.all(np.isfinite(dump))
    assert (pred_dir / f"{key}.png").exists()
    assert (pred_dir / f"{key}.tfrecord").exists()

    from self_attention_tacotron_tpu.data.records import (
        parse_mel_prediction_record, read_first_example)
    rec = parse_mel_prediction_record(
        read_first_example(str(pred_dir / f"{key}.tfrecord")))
    np.testing.assert_array_equal(
        np.asarray(rec.mel, "<f4").reshape(-1),
        dump)  # the record carries the tensor the .mfbsp dump holds


def test_vctk_mel_pipeline_postnet_v2(vctk_corpus, tmp_path):
    """VCTK 0.8 preprocess + PostNet-v2 training and prediction: the
    ``.mfbsp``/record payload must be the POSTNET mel, not the raw decoder
    mel (reference: predict_mel.py:61)."""
    root, keys = vctk_corpus
    data_dir, ckpt_dir, pred_dir = (tmp_path / d
                                    for d in ("data", "ckpt", "pred"))

    from self_attention_tacotron_tpu.cli.preprocess import main_vctk
    hp0 = tmp_path / "hp0.json"
    hp0.write_text(json.dumps(MEL_HPARAMS))
    rc = main_vctk([str(root), str(data_dir), "--version", "0.8",
                    "--hparam-json-file", str(hp0), "--num-workers", "1"])
    assert rc == 0
    assert (data_dir / f"{keys[0]}.source.tfrecord").exists()

    postnet_kw = dict(dataset="vctk.dataset.DatasetSource",
                      use_postnet_v2=True, num_postnet_v2_layers=2,
                      postnet_v2_kernel_size=3, postnet_v2_out_channels=8,
                      postnet_v2_drop_rate=0.0)
    hp_json = _write_hp(tmp_path, data_dir, postnet_kw)
    (data_dir / "train.csv").write_text("\n".join(keys[:4]) + "\n")
    (data_dir / "validation.csv").write_text(keys[4] + "\n")
    (data_dir / "test.csv").write_text(keys[5] + "\n")

    _train(data_dir, ckpt_dir, hp_json)
    _predict(data_dir, ckpt_dir, pred_dir, hp_json)

    key = keys[5]
    dump = np.fromfile(pred_dir / f"{key}.mfbsp",
                       "<f4").reshape(-1, MEL_HPARAMS["num_mels"])
    assert (pred_dir / f"{key}.png").exists()

    # library-level replay of the same prediction: the dump must equal the
    # POSTNET output and differ from the raw decoder output
    import jax
    from self_attention_tacotron_tpu.cli.train import load_hparams
    from self_attention_tacotron_tpu.data.dataset import (
        dataset_factory, find_dataset_files, load_key_list, to_model_batch)
    from self_attention_tacotron_tpu.models import tacotron_model_factory
    from self_attention_tacotron_tpu.parallel import (create_train_state,
                                                      make_predict_step)
    from self_attention_tacotron_tpu.utils.checkpoint import CheckpointManager

    class A:
        hparam_json_file = str(hp_json)
        hparams = ""
    hp = load_hparams(A())
    src = find_dataset_files(str(data_dir), [key], hp.source_file_extension)
    tgt = find_dataset_files(str(data_dir), [key], hp.target_file_extension)
    ds = dataset_factory(src, tgt, hp, batch_size=1, shuffle=False,
                         target_kind="mel")
    mb = to_model_batch(next(iter(ds)))._replace(done=None)
    model = tacotron_model_factory(hp)
    state = create_train_state(model, hp, mb, jax.random.PRNGKey(hp.seed))
    state = CheckpointManager(str(ckpt_dir)).restore(state)
    assert state is not None
    out = make_predict_step(model, hp)(state, mb)
    n = dump.shape[0]
    postnet = np.asarray(out.postnet_outputs[0, :n])
    raw = np.asarray(out.outputs[0, :n])
    np.testing.assert_allclose(dump, postnet, rtol=1e-5, atol=1e-5)
    assert not np.allclose(dump, raw, rtol=1e-3, atol=1e-3)
