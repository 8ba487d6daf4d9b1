"""Parity of the whole-loop fused Pallas decode vs the lax.scan decode path.

The fused kernel (ops/fused_decode.py) must reproduce the scan path's
inference outputs exactly (same math, same step order) — the same kind of
invariant as the reference's only test (train path == inference path,
reference: modules/transformer_test.py:44-90), one level further down: one
fused kernel == the multi-kernel scan.

Runs in Pallas interpret mode on CPU; scripts/check_fused_decode.py runs the
same comparison compiled on a real TPU chip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from self_attention_tacotron_tpu.models import DecoderMode, tacotron_model_factory

from test_tacotron_model import make_batch, tiny_hp


def _infer_pair(hp_kw, seed=0, B=1):
    """Run INFERENCE with the scan path and the fused path on shared params."""
    hp = tiny_hp(decoder_early_stop=False, **hp_kw)
    batch = make_batch(hp, B=B, T_in=7, T_out=6, seed=seed)
    batch = batch._replace(target=None, done=None)
    model = tacotron_model_factory(hp)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           make_batch(hp, B=B), DecoderMode.VALIDATION, True)

    ref = model.apply(variables, batch, DecoderMode.INFERENCE)

    hp_fused = hp.replace(decoder_fused_inference=True)
    fused_model = tacotron_model_factory(hp_fused)
    fused = fused_model.apply(variables, batch, DecoderMode.INFERENCE)
    return ref, fused


def _assert_close(ref, fused, tol=2e-4, check_aligns=True):
    np.testing.assert_allclose(np.asarray(fused.outputs),
                               np.asarray(ref.outputs), rtol=tol, atol=tol)
    np.testing.assert_allclose(np.asarray(fused.stop_token),
                               np.asarray(ref.stop_token), rtol=tol, atol=tol)
    if check_aligns:  # B > 1 fused mode does not materialize alignments
        for a, b in zip(fused.alignments, ref.alignments):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=tol, atol=tol)
    np.testing.assert_array_equal(np.asarray(fused.predicted_samples),
                                  np.asarray(ref.predicted_samples))
    np.testing.assert_array_equal(np.asarray(fused.lengths),
                                  np.asarray(ref.lengths))


def test_fused_matches_scan_flagship():
    """Dual-source + decoder self-attention hop (the flagship serving path)."""
    ref, fused = _infer_pair({})
    _assert_close(ref, fused)
    # fused mode does not materialize self-attention probabilities
    assert all(np.all(np.asarray(a) == 0)
               for a in fused.decoder_self_attention_alignments)


def test_fused_matches_scan_no_transformer():
    ref, fused = _infer_pair({"decoder": "DualSourceDecoder"})
    _assert_close(ref, fused)


def test_fused_matches_scan_single_source():
    ref, fused = _infer_pair({
        "tacotron_model": "ExtendedTacotronV1Model",
        "encoder": "ZoneoutEncoderV1", "decoder": "ExtendedDecoder"})
    _assert_close(ref, fused)


def test_fused_matches_scan_r2_feed():
    """outputs_per_step=2 exercises the r-frame row + feedback slice."""
    ref, fused = _infer_pair({"outputs_per_step": 2, "max_iters": 4})
    _assert_close(ref, fused)


def test_fused_bf16_close_to_scan():
    hp = tiny_hp(decoder_early_stop=False)
    batch = make_batch(hp, B=1, T_in=7, T_out=6)._replace(target=None,
                                                          done=None)
    model = tacotron_model_factory(hp)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           make_batch(hp, B=1), DecoderMode.VALIDATION, True)
    ref = model.apply(variables, batch, DecoderMode.INFERENCE)
    hp_b = hp.replace(decoder_fused_inference=True,
                      decoder_fused_dtype="bfloat16")
    fused = tacotron_model_factory(hp_b).apply(variables, batch,
                                               DecoderMode.INFERENCE)
    np.testing.assert_allclose(np.asarray(fused.outputs),
                               np.asarray(ref.outputs), rtol=0.1, atol=0.1)


def test_fused_early_stop_matches_while_path():
    """Fused in-kernel while_loop == the scan path's while_loop early exit,
    with a stop token biased to fire a few steps in (zeros past the exit)."""
    hp = tiny_hp(decoder_early_stop=True, max_iters=8, decoder_min_iters=2)
    batch = make_batch(hp, B=1, T_in=7, T_out=6)._replace(target=None,
                                                          done=None)
    model = tacotron_model_factory(hp)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           make_batch(hp, B=1), DecoderMode.VALIDATION, True)
    variables = jax.tree_util.tree_map(lambda x: x, variables)  # to dict
    import flax
    variables = flax.core.unfreeze(variables)
    variables["params"]["decoder"]["stop_token_projection"]["bias"] = (
        jnp.full((1,), 5.0))  # sigmoid ~1 -> fires at min_iters+1

    ref = model.apply(variables, batch, DecoderMode.INFERENCE)
    fused = tacotron_model_factory(
        hp.replace(decoder_fused_inference=True)).apply(
        variables, batch, DecoderMode.INFERENCE)
    assert int(ref.lengths[0]) < hp.max_iters  # early exit actually happened
    _assert_close(ref, fused)


def test_fused_matches_scan_batch3():
    """Batched serving: B=3 through the flat-row kernel (block-indicator
    softmax, per-row KV cache blocks); alignments are not materialized."""
    ref, fused = _infer_pair({}, B=3)
    _assert_close(ref, fused, check_aligns=False)
    assert all(np.all(np.asarray(a) == 0) for a in fused.alignments)


def test_fused_fallback_unsupported():
    """Inference dropout is outside the fused subset -> scan path silently
    (outputs well-formed, dropout active so no numeric comparison)."""
    hp = tiny_hp(decoder_early_stop=False, decoder_fused_inference=True,
                 apply_dropout_on_inference=True)
    batch = make_batch(hp, B=2, T_in=7, T_out=6)._replace(target=None,
                                                          done=None)
    model = tacotron_model_factory(hp)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           make_batch(hp, B=2), DecoderMode.VALIDATION, True)
    out = model.apply(variables, batch, DecoderMode.INFERENCE,
                      rngs={"dropout": jax.random.PRNGKey(3)})
    assert out.outputs.shape[0] == 2
    assert np.isfinite(np.asarray(out.outputs)).all()


def test_fused_matches_scan_speaker_prenet():
    """MultiSpeakerPreNet conditioning (reference:
    modules/multi_speaker_modules.py:11-35): the per-utterance softsign
    speaker row rides the fused kernel as one operand."""
    ref, fused = _infer_pair({"use_speaker_embedding": True,
                              "num_speakers": 3})
    _assert_close(ref, fused)


def test_fused_matches_scan_speaker_prenet_batched():
    ref, fused = _infer_pair({"use_speaker_embedding": True,
                              "num_speakers": 3}, B=3)
    _assert_close(ref, fused, check_aligns=False)


def test_fused_matches_scan_forward_attention():
    """ForwardAttention source (the shipped flagship recipes' setting,
    reference: examples/*/self-attention-tacotron.json attention=forward):
    location conv + forward recursion fused in row mode."""
    ref, fused = _infer_pair({"attention": "forward",
                              "cumulative_weights": False,
                              "attention_kernel": 10,
                              "attention_filters": 5})
    _assert_close(ref, fused)


def test_fused_matches_scan_location_sensitive_cumulative():
    ref, fused = _infer_pair({"attention": "location_sensitive",
                              "cumulative_weights": True,
                              "attention_kernel": 7,
                              "attention_filters": 4})
    _assert_close(ref, fused)


def test_fused_matches_scan_forward_attention_batched():
    """Batched (B=3) forward attention runs fused: the recursion state
    lives on flattened (B*T, 1) columns with block-masked shifts, same as
    the fused training kernel."""
    ref, fused = _infer_pair({"attention": "forward",
                              "cumulative_weights": False,
                              "attention_kernel": 10,
                              "attention_filters": 5}, B=3)
    _assert_close(ref, fused, check_aligns=False)


def test_fused_matches_scan_location_sensitive_batched():
    ref, fused = _infer_pair({"attention": "location_sensitive",
                              "cumulative_weights": True,
                              "attention_kernel": 7,
                              "attention_filters": 4}, B=3)
    _assert_close(ref, fused, check_aligns=False)


def test_fused_matches_scan_recipe_batched():
    """The shipped recipe feature set (forward attention + speaker prenet)
    serving at B=2 — previously a logged fallback, now fused."""
    ref, fused = _infer_pair({
        "attention": "forward", "cumulative_weights": False,
        "attention_kernel": 10, "attention_filters": 5,
        "use_speaker_embedding": True, "num_speakers": 3}, B=2)
    _assert_close(ref, fused, check_aligns=False)


def test_fused_matches_scan_vctk_flagship_shape():
    """The full VCTK recipe feature set at tiny dims: forward attention +
    speaker-conditioned prenet + zoneout decoder v2 + r=2."""
    ref, fused = _infer_pair({
        "attention": "forward", "cumulative_weights": False,
        "attention_kernel": 10, "attention_filters": 5,
        "use_speaker_embedding": True, "num_speakers": 3,
        "decoder_version": "v2", "zoneout_factor_cell": 0.1,
        "zoneout_factor_output": 0.1, "outputs_per_step": 2,
        "max_iters": 4})
    _assert_close(ref, fused)


def test_fused_matches_scan_batch8_hops():
    """B=8 with decoder self-attention hops — above the old B~4 crossover.
    Round 5's block-diagonal batched hop attention ((S, B*D) concatenated
    caches, one matmul for all (row, head) scores) must keep parity with
    the scan path at serving batches."""
    ref, fused = _infer_pair({}, B=8)
    _assert_close(ref, fused, check_aligns=False)
