import json

from self_attention_tacotron_tpu.config import HParams, default_hparams


def test_defaults_match_reference():
    hp = default_hparams()
    # spot-check reference defaults (reference: hparams.py:11-225)
    assert hp.num_mels == 1025
    assert hp.sample_rate == 48000
    assert hp.outputs_per_step == 1
    assert hp.encoder == "SelfAttentionCBHGEncoder"
    assert hp.decoder == "DualSourceTransformerDecoder"
    assert hp.attention == "additive"
    assert hp.attention1_out_units == 224
    assert hp.attention2_out_units == 32
    assert hp.batch_size == 32
    assert hp.max_iters == 450
    assert hp.zoneout_factor_cell == 0.1
    assert hp.vars_to_warm_start == [".*"]


def test_json_override_layering():
    hp = default_hparams()
    hp.parse_json(json.dumps({
        "num_mels": 80,
        "outputs_per_step": 2,
        "decay_learning_rate": False,
        "average_mel_level_db": [1.0, 2.0],
        "encoder_prenet_out_units": [224, 112],
    }))
    assert hp.num_mels == 80
    assert hp.outputs_per_step == 2
    assert hp.decay_learning_rate is False
    assert hp.average_mel_level_db == [1.0, 2.0]
    assert hp.encoder_prenet_out_units == (224, 112)


def test_comma_string_override():
    hp = default_hparams()
    hp.parse("batch_size=8,use_forced_alignment_mode=True,dataset=vctk.dataset.DatasetSource")
    assert hp.batch_size == 8
    assert hp.use_forced_alignment_mode is True
    assert hp.dataset == "vctk.dataset.DatasetSource"
    # bracketed list values
    hp.parse("average_mel_level_db=[1.5,2.5],initial_learning_rate=0.0005")
    assert hp.average_mel_level_db == [1.5, 2.5]
    assert hp.initial_learning_rate == 0.0005


def test_reference_example_config_loads():
    """The reference's example JSONs must load unchanged (key-name parity)."""
    example = {
        "num_symbols": 128, "num_mels": 80, "num_freq": 1025,
        "sample_rate": 22050, "source_file_extension": "source.tfrecord",
        "target_file_extension": "target.tfrecord",
        "batch_size": 32, "initial_learning_rate": 0.0005,
        "decay_learning_rate": True, "use_l2_regularization": True,
        "l2_regularization_weight": 1e-7, "save_summary_steps": 100,
        "save_checkpoints_steps": 500, "keep_checkpoint_max": 200,
        "log_step_count_steps": 1, "alignment_save_steps": 10000,
        "approx_min_target_length": 100, "suffle_buffer_size": 64,
        "batch_bucket_width": 50, "batch_num_buckets": 50,
        "eval_throttle_secs": 1200, "num_evaluation_steps": 64,
        "max_iters": 500, "outputs_per_step": 2, "n_feed_frame": 2,
    }
    hp = default_hparams()
    hp.parse_json(json.dumps(example))
    assert hp.n_feed_frame == 2
    assert hp.max_iters == 500


def test_unknown_key_raises():
    hp = default_hparams()
    try:
        hp.set_hparam("not_a_real_key", 1)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_debug_string_sorted():
    s = default_hparams().debug_string()
    assert s.startswith("Hyperparameters:")
    assert "num_mels" in s
