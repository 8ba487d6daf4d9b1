"""Observability + batch-integrity round-4 additions:

* TensorBoard event files written natively (utils/tb_events.py) — the
  reference workflow is watching ``*_with_teacher`` scalars in TensorBoard
  (reference: README.md:86-89, models/models.py:289-320).
* MetricsLogger dual JSONL + event output and the jsonl->TB backfill script.
* pad_model_batch_rows: remainder batches shard loss-neutrally instead of
  being dropped.
* The MgcLf0 eval artifact path: panel plots + prediction record
  (reference: modules/metrics.py:79-128, utils/tfrecord.py:160-199).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest


# ------------------------------------------------------------------ tb events

def test_event_writer_roundtrip(tmp_path):
    from self_attention_tacotron_tpu.utils.tb_events import (EventWriter,
                                                             read_events)
    w = EventWriter(str(tmp_path))
    w.add_scalars(3, {"loss": 1.5, "eval/loss_with_teacher": 0.25})
    w.add_scalars(4, {"loss": 1.25})
    w.close()
    events = list(read_events(w.path))
    assert events[0]["file_version"] == "brain.Event:2"
    assert events[1]["step"] == 3
    assert events[1]["scalars"]["loss"] == pytest.approx(1.5)
    assert events[1]["scalars"]["eval/loss_with_teacher"] == pytest.approx(0.25)
    assert events[2]["step"] == 4
    assert events[1]["wall_time"] > 0
    assert os.path.basename(w.path).startswith("events.out.tfevents.")


def test_metrics_logger_writes_both_streams(tmp_path):
    from self_attention_tacotron_tpu.utils.metrics import MetricsLogger
    from self_attention_tacotron_tpu.utils.tb_events import read_events
    log = MetricsLogger(str(tmp_path))
    log.log(1, {"loss": 2.0}, prefix="eval/")
    log.close()
    lines = open(log.path).read().strip().split("\n")
    assert json.loads(lines[0])["eval/loss"] == 2.0
    event_files = [f for f in os.listdir(tmp_path) if "tfevents" in f]
    assert len(event_files) == 1
    events = list(read_events(os.path.join(tmp_path, event_files[0])))
    assert events[1]["scalars"]["eval/loss"] == pytest.approx(2.0)


def test_jsonl_to_tb_script(tmp_path):
    ckpt = tmp_path / "run"
    ckpt.mkdir()
    with open(ckpt / "metrics.jsonl", "w") as f:
        f.write(json.dumps({"step": 5, "time": 123.0, "loss": 0.5}) + "\n")
        f.write(json.dumps({"step": 10, "time": 124.0, "loss": 0.4,
                            "eval/loss": 0.6}) + "\n")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "jsonl_to_tb.py"),
         str(ckpt)], capture_output=True, text=True, cwd=repo)
    assert out.returncode == 0, out.stderr
    from self_attention_tacotron_tpu.utils.tb_events import read_events
    event_files = [f for f in os.listdir(ckpt) if "tfevents" in f]
    assert event_files
    events = list(read_events(str(ckpt / event_files[0])))
    steps = [e.get("step") for e in events if e["scalars"]]
    assert steps == [5, 10]
    assert events[-1]["scalars"]["eval/loss"] == pytest.approx(0.6)


# ----------------------------------------------------- remainder-batch padding

def _tiny_hp(**kw):
    from self_attention_tacotron_tpu.config import default_hparams
    hp = default_hparams()
    return hp.replace(**kw) if kw else hp


def test_pad_model_batch_rows_is_loss_neutral():
    """Padded rows (zeroed masks) change neither row count divisibility nor
    any loss value — so remainder batches shard instead of being dropped."""
    from self_attention_tacotron_tpu.data.dataset import pad_model_batch_rows
    from self_attention_tacotron_tpu.models.tacotron import Batch
    from self_attention_tacotron_tpu.ops import losses as L

    rng = np.random.RandomState(0)
    B, T, C = 3, 8, 5
    out = rng.randn(B, T, C).astype(np.float32)
    tgt = rng.randn(B, T, C).astype(np.float32)
    stop = rng.randn(B, T).astype(np.float32)
    done = (rng.rand(B, T) > 0.5).astype(np.float32)
    mb = Batch(source=rng.randint(0, 10, (B, 6)).astype(np.int32),
               source_length=np.full((B,), 6, np.int32),
               target=tgt, target_length=np.full((B,), T, np.int32),
               done=done, spec_loss_mask=np.ones((B, T), np.float32),
               binary_loss_mask=np.ones((B, T), np.float32),
               speaker_id=np.zeros((B,), np.int32))

    padded, n_pad = pad_model_batch_rows(mb, 4)
    assert n_pad == 1
    assert padded.source.shape[0] == 4
    assert padded.spec_loss_mask[B:].sum() == 0.0
    assert padded.binary_loss_mask[B:].sum() == 0.0
    # model outputs on the padded rows are arbitrary — repeat the last row
    out_p = np.concatenate([out, out[-1:]], axis=0)
    stop_p = np.concatenate([stop, stop[-1:]], axis=0)
    np.testing.assert_allclose(
        L.spec_loss(out_p, padded.target, padded.spec_loss_mask),
        L.spec_loss(out, tgt, mb.spec_loss_mask), rtol=1e-6)
    np.testing.assert_allclose(
        L.binary_loss(stop_p, padded.done, padded.binary_loss_mask),
        L.binary_loss(stop, done, mb.binary_loss_mask), rtol=1e-6)


def test_pad_model_batch_rows_is_batch_stats_neutral():
    """Padded duplicate rows must not leak into TRAIN-mode batch-norm
    statistics: the padded step's loss AND mutated batch_stats equal the
    unpadded step's (Conv1dBN masks invalid rows via bn_valid_rows)."""
    import jax

    from self_attention_tacotron_tpu.data.dataset import pad_model_batch_rows
    from self_attention_tacotron_tpu.models import (DecoderMode, compute_loss,
                                                    tacotron_model_factory)
    from test_tacotron_model import make_batch, tiny_hp

    hp = tiny_hp(encoder_prenet_drop_rate=0.0, decoder_prenet_drop_rate=0.0,
                 self_attention_drop_rate=0.0,
                 decoder_self_attention_drop_rate=0.0,
                 zoneout_factor_cell=0.0, zoneout_factor_output=0.0)
    mb = make_batch(hp, B=3, T_in=7, T_out=6)
    padded, n_pad = pad_model_batch_rows(
        jax.tree_util.tree_map(np.asarray, mb), 4)
    assert n_pad == 1
    model = tacotron_model_factory(hp)
    variables = model.init({"params": jax.random.PRNGKey(0)}, mb,
                           DecoderMode.VALIDATION, True)
    rngs = {"dropout": jax.random.PRNGKey(1),
            "zoneout": jax.random.PRNGKey(2)}

    def run(b):
        out, mut = model.apply(variables, b, DecoderMode.TRAIN, rngs=rngs,
                               mutable=["batch_stats"])
        return compute_loss(hp, out, b, variables["params"]), mut

    losses_u, mut_u = run(mb)
    losses_p, mut_p = run(padded)
    np.testing.assert_allclose(float(losses_p["loss"]),
                               float(losses_u["loss"]), rtol=1e-6)
    flat_u = jax.tree_util.tree_leaves_with_path(mut_u["batch_stats"])
    flat_p = dict(jax.tree_util.tree_leaves_with_path(
        mut_p["batch_stats"]))
    assert flat_u and len(flat_u) == len(flat_p)
    for path, leaf_u in flat_u:
        np.testing.assert_allclose(np.asarray(flat_p[path]),
                                   np.asarray(leaf_u), rtol=1e-5,
                                   atol=1e-6, err_msg=str(path))


def test_pad_model_batch_rows_noop_when_divisible():
    from self_attention_tacotron_tpu.data.dataset import pad_model_batch_rows
    from self_attention_tacotron_tpu.models.tacotron import Batch
    mb = Batch(source=np.zeros((4, 3), np.int32),
               source_length=np.full((4,), 3, np.int32))
    same, n_pad = pad_model_batch_rows(mb, 2)
    assert n_pad == 0 and same is mb


# -------------------------------------------------------- mgclf0 eval e2e path

MGCLF0_HPARAMS = dict(
    tacotron_model="DualSourceSelfAttentionMgcLf0TacotronModel",
    decoder="DualSourceMgcLf0TransformerDecoder",
    dataset="mgclf0.dataset.DatasetSource",
    num_symbols=80, embedding_dim=16, num_mgcs=6, num_lf0s=8, num_mels=12,
    cbhg_out_units=16, conv_channels=8, max_filter_width=4,
    projection1_out_channels=8, projection2_out_channels=8,
    encoder_prenet_out_units=[16, 8], self_attention_out_units=8,
    self_attention_num_heads=2, attention1_out_units=8,
    attention2_out_units=8, attention_out_units=12,
    decoder_prenet_out_units=[8, 4], decoder_out_units=16,
    decoder_self_attention_out_units=16, max_iters=16, decoder_min_iters=1,
    outputs_per_step=1, n_feed_frame=1, batch_size=2,
    save_checkpoints_steps=2, keep_checkpoint_max=2, num_evaluation_steps=1,
    approx_min_target_length=0, batch_bucket_width=64,
    checkpoint_async=False, log_step_count_steps=1,
    eval_start_delay_secs=0, eval_throttle_secs=0, alignment_save_steps=2,
)


def test_mgclf0_train_eval_artifacts(tmp_path):
    """Train 3 steps on a synthetic mgc/lf0 corpus; eval must produce the
    mgc_lf0_* panel PNG, the alignment PNG, and a prediction record with the
    reference's field layout."""
    from self_attention_tacotron_tpu.data.records import (
        MgcLf0TargetRecord, SourceRecord, write_mgc_lf0_target_record,
        write_source_record)

    data_dir = tmp_path / "data"
    data_dir.mkdir()
    rng = np.random.RandomState(0)
    keys = []
    for i in range(5):
        key = f"utt_{i:03d}"
        T_in, T = 6 + i, 8 + i
        src = SourceRecord(id=i, key=key,
                           source=rng.randint(1, 70, T_in).astype(np.int64),
                           source_length=T_in, text=f"synthetic {i}")
        write_source_record(src, str(data_dir / f"{key}.source.tfrecord"))
        mgc = rng.randn(T, 6).astype(np.float32)
        lf0 = np.where(rng.rand(T) > 0.3,
                       rng.uniform(80, 400, T), 0.0).astype(np.float32)
        write_mgc_lf0_target_record(
            MgcLf0TargetRecord(id=i, key=key, mgc=mgc, mgc_width=6, lf0=lf0,
                               target_length=T),
            str(data_dir / f"{key}.target.tfrecord"))
        keys.append(key)
    (data_dir / "train.csv").write_text("\n".join(keys[:4]) + "\n")
    (data_dir / "validation.csv").write_text(keys[4] + "\n")

    hp_json = tmp_path / "hp.json"
    hp_json.write_text(json.dumps(MGCLF0_HPARAMS))
    ckpt_dir = tmp_path / "ckpt"
    from self_attention_tacotron_tpu.cli.train import main as train_main
    rc = train_main(["--source-data-root", str(data_dir),
                     "--target-data-root", str(data_dir),
                     "--checkpoint-dir", str(ckpt_dir),
                     "--hparam-json-file", str(hp_json),
                     "--dataset-kind", "mgclf0",
                     "--max-steps", "3"])
    assert rc == 0

    eval_dir = ckpt_dir / "eval"
    files = os.listdir(eval_dir)
    assert any(f.startswith("mgc_lf0_") and f.endswith(".png")
               for f in files), files
    assert any(f.startswith("alignment_") and f.endswith(".png")
               for f in files), files
    records = [f for f in files if f.endswith(".tfrecord")]
    assert records, files

    # the record parses with the reference's mgc/lf0 prediction layout
    from self_attention_tacotron_tpu.data.records import read_first_example
    ex = read_first_example(str(eval_dir / records[0]))
    for field in ("mgc", "ground_truth_mgc", "lf0", "ground_truth_lf0",
                  "alignment", "text", "source", "accent_type"):
        assert field in ex, field
    width = ex["mgc_width"][1][0]
    assert width == 6
    mgc = np.frombuffer(ex["mgc"][1][0], np.float32)
    assert mgc.size % 6 == 0
    lf0 = np.frombuffer(ex["lf0"][1][0], np.float32)
    assert lf0.size % 8 == 0  # predicted probability map over num_lf0s
