"""End-to-end CLI pipeline on a synthetic VQ-code corpus:
preprocess_vqcodes -> train (few steps) -> predict_code -> postprocess.
Mirrors the reference workflow §3.5 of SURVEY.md."""

import json
import os

import numpy as np
import pytest


TINY_HPARAMS = dict(
    num_symbols=80, embedding_dim=16, num_mels=12, cbhg_out_units=16,
    conv_channels=8, max_filter_width=4, projection1_out_channels=8,
    projection2_out_channels=8, encoder_prenet_out_units=[16, 8],
    self_attention_out_units=8, self_attention_num_heads=2,
    attention1_out_units=8, attention2_out_units=8, attention_out_units=12,
    decoder_prenet_out_units=[8, 4], decoder_out_units=16,
    decoder_self_attention_out_units=16, max_iters=16, decoder_min_iters=1,
    outputs_per_step=1, n_feed_frame=1, batch_size=2,
    save_checkpoints_steps=4, keep_checkpoint_max=3, num_evaluation_steps=1,
    approx_min_target_length=0, batch_bucket_width=64, phoneme="none",
    source="character", checkpoint_async=False, suffle_buffer_size=4,
    log_step_count_steps=2,
    # eval at every checkpoint in the test (the reference-default cadence of
    # start_delay=120s/throttle=600s would skip eval entirely in a short run)
    eval_start_delay_secs=0, eval_throttle_secs=0,
)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """Synthetic flat code corpus: pNNN_XXX.txt with 'text \\t code ints'."""
    root = tmp_path_factory.mktemp("corpus")
    rng = np.random.RandomState(0)
    keys = []
    for spk in (225, 226):
        for i in range(4):
            key = f"p{spk}_{i:03d}"
            codes = " ".join(str(int(c)) for c in rng.randint(0, 12, rng.randint(4, 14)))
            (root / f"{key}.txt").write_text(f"hello world {i}\t{codes}\n")
            keys.append(key)
    (root / "speaker-info.txt").write_text(
        "ID AGE GENDER\n225 23 F\n226 22 M\n")
    return root, keys


def test_full_pipeline(corpus, tmp_path):
    root, keys = corpus
    data_dir = tmp_path / "data"
    ckpt_dir = tmp_path / "ckpt"
    pred_dir = tmp_path / "pred"
    post_dir = tmp_path / "post"
    hp_json = tmp_path / "hparams.json"
    hp_json.write_text(json.dumps(TINY_HPARAMS))

    # ---- preprocess
    from self_attention_tacotron_tpu.cli.preprocess import main_vqcodes
    rc = main_vqcodes([str(root), str(data_dir), "--version", "0",
                       "--num-codes", "12",
                       "--speaker-info", str(root / "speaker-info.txt"),
                       "--hparam-json-file", str(hp_json),
                       "--num-workers", "1"])
    assert rc == 0
    produced = sorted(os.listdir(data_dir))
    assert f"{keys[0]}.source.tfrecord" in produced
    assert f"{keys[0]}.target.tfrecord" in produced

    # key lists
    (data_dir / "train.csv").write_text("\n".join(keys[:6]) + "\n")
    (data_dir / "validation.csv").write_text("\n".join(keys[6:7]) + "\n")
    (data_dir / "test.csv").write_text("\n".join(keys[7:]) + "\n")

    # ---- train a few steps
    from self_attention_tacotron_tpu.cli.train import main as train_main
    rc = train_main(["--source-data-root", str(data_dir),
                     "--target-data-root", str(data_dir),
                     "--checkpoint-dir", str(ckpt_dir),
                     "--hparam-json-file", str(hp_json),
                     "--max-steps", "5"])
    assert rc == 0
    from self_attention_tacotron_tpu.utils.checkpoint import CheckpointManager
    mgr = CheckpointManager(str(ckpt_dir))
    assert mgr.latest_step() is not None and mgr.latest_step() >= 4
    mgr.close()
    # metrics were logged
    metrics_lines = (ckpt_dir / "metrics.jsonl").read_text().strip().split("\n")
    assert len(metrics_lines) >= 2
    # eval alignment plot got written
    eval_pngs = [f for f in os.listdir(ckpt_dir / "eval") if f.endswith(".png")]
    assert eval_pngs

    # ---- resume training continues from the checkpoint
    rc = train_main(["--source-data-root", str(data_dir),
                     "--target-data-root", str(data_dir),
                     "--checkpoint-dir", str(ckpt_dir),
                     "--hparam-json-file", str(hp_json),
                     "--max-steps", "7"])
    assert rc == 0

    # ---- predict codes
    from self_attention_tacotron_tpu.cli.predict import main_code
    rc = main_code(["--source-data-root", str(data_dir),
                    "--target-data-root", str(data_dir),
                    "--checkpoint-dir", str(ckpt_dir),
                    "--output-dir", str(pred_dir),
                    "--selected-list-dir", str(data_dir),
                    "--hparam-json-file", str(hp_json)])
    assert rc == 0
    test_key = keys[7]
    assert (pred_dir / f"{test_key}.mfbsp").exists()
    assert (pred_dir / f"{test_key}.png").exists()
    assert (pred_dir / f"{test_key}.tfrecord").exists()
    # the .mfbsp dump is a float32 one-hot matrix
    dump = np.fromfile(pred_dir / f"{test_key}.mfbsp", "<f4")
    assert len(dump) % 12 == 0

    # ---- postprocess
    from self_attention_tacotron_tpu.cli.postprocess import main as post_main
    rc = post_main([str(pred_dir), str(post_dir), "--experiment", "t"])
    assert rc == 0
    assert (post_dir / f"{test_key}.preds.txt").exists()
    assert (post_dir / f"{test_key}.truth.txt").exists()
    hyp = (post_dir / "tacotron_t.hypothesis.txt").read_text().strip()
    assert hyp  # code ids present
    truth_ids = (post_dir / f"{test_key}.truth.txt").read_text().split()
    # ground truth roundtrips exactly through the whole pipeline
    orig = (root / f"{test_key}.txt").read_text().split("\t")[1].split()
    assert truth_ids == orig


def test_debug_tfrecord_cli(corpus, tmp_path, capsys):
    root, keys = corpus
    data_dir = tmp_path / "dbg"
    hp_json = tmp_path / "hp.json"
    hp_json.write_text(json.dumps(TINY_HPARAMS))
    from self_attention_tacotron_tpu.cli.preprocess import main_vqcodes
    main_vqcodes([str(root), str(data_dir), "--version", "0",
                  "--num-codes", "12",
                  "--speaker-info", str(root / "speaker-info.txt"),
                  "--hparam-json-file", str(hp_json), "--num-workers", "1"])
    from self_attention_tacotron_tpu.cli.debug_tfrecord import main as dbg
    rc = dbg([str(data_dir / f"{keys[0]}.source.tfrecord"),
              str(data_dir / f"{keys[0]}.target.tfrecord")])
    assert rc == 0
    out = capsys.readouterr().out
    assert "source view" in out and "codes view" in out
