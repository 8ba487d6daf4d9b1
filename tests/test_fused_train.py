"""Fused teacher-forced training scan: forward parity and exact gradients.

The custom-VJP pair in ops/fused_train.py must match a pure-JAX
implementation of the same trunk (the decoder ``_rnn_step`` math) in both
the forward outputs and the gradients w.r.t. every weight and the
attention memories.  Deterministic mode here (dropout/zoneout off or
expectation form) — the in-kernel PRNG streams intentionally differ from
XLA's threefry, see the module docstring.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from self_attention_tacotron_tpu.ops.fused_train import (FusedTrainParams,
                                                         fused_teacher_scan)

B, T_STEPS, T_MEM = 2, 5, 7
CF = 37                       # deliberately lane-unaligned everywhere
U_SIZES, C_SIZES = (24, 16), (20, 28)
P_SIZES = (32, 16)
A, D = 32, 24


def make_params(key):
    ks = jax.random.split(key, 16)
    g = lambda k, s: jax.random.normal(k, s) * 0.3
    sumc = sum(C_SIZES)
    prenet = ((g(ks[0], (CF, P_SIZES[0])), g(ks[1], (1, P_SIZES[0]))),
              (g(ks[2], (P_SIZES[0], P_SIZES[1])), g(ks[3], (1, P_SIZES[1]))))
    att = (g(ks[4], (P_SIZES[1] + sumc + A, 4 * A)), g(ks[5], (1, 4 * A)))
    query = tuple((g(ks[6 + i], (A, u)), g(ks[8 + i], (u, 1)))
                  for i, u in enumerate(U_SIZES))
    outproj = (g(ks[10], (A + sumc, D)), g(ks[11], (1, D)))
    lstm1 = (g(ks[12], (2 * D, 4 * D)), g(ks[13], (1, 4 * D)))
    lstm2 = (g(ks[14], (2 * D, 4 * D)), g(ks[15], (1, 4 * D)))
    return FusedTrainParams(prenet=prenet, att_lstm=att, query=query,
                            outproj=outproj, lstm1=lstm1, lstm2=lstm2)


def make_inputs(key):
    ks = jax.random.split(key, 6)
    keys = tuple(jax.random.normal(ks[i], (B, T_MEM, u)) * 0.5
                 for i, u in enumerate(U_SIZES))
    values = tuple(jax.random.normal(ks[2 + i], (B, T_MEM, c)) * 0.5
                   for i, c in enumerate(C_SIZES))
    lengths = jnp.array([T_MEM, T_MEM - 2])
    masks = tuple(
        (jnp.arange(T_MEM)[None, :] < lengths[:, None]).astype(jnp.float32)
        for _ in U_SIZES)
    teacher = jax.random.normal(ks[4], (B, T_STEPS, CF)) * 0.5
    return keys, values, masks, teacher


def reference_scan(p: FusedTrainParams, keys, values, masks, teacher,
                   zc_att=0.0, zo_att=0.0, zc_dec=0.0, zo_dec=0.0):
    """Pure-JAX deterministic replica of models/decoder.py _rnn_step."""
    sig, tanh = jax.nn.sigmoid, jnp.tanh

    def lstm(z, W, b, c, h, zc, zo):
        gates = z @ W + b[0]
        i, g, f, o = jnp.split(gates, 4, axis=1)
        c_new = c * sig(f + 1.0) + sig(i) * tanh(g)
        h_new = tanh(c_new) * sig(o)
        if zc > 0:
            c_new = (1 - zc) * c_new + zc * c
        if zo > 0:
            h_new = (1 - zo) * h_new + zo * h
        return c_new, h_new

    batch = teacher.shape[0]
    a_units = p.att_lstm[1].shape[1] // 4
    d_units = p.lstm1[1].shape[1] // 4
    sumc = p.outproj[0].shape[0] - a_units

    def step(carry, x):
        c_att, h_att, c1, h1, c2, h2, ctx = carry
        h = x
        for W, b in p.prenet:
            h = jax.nn.relu(h @ W + b[0])
        z = jnp.concatenate([h, ctx, h_att], axis=1)
        c_att, h_att = lstm(z, *p.att_lstm, c_att, h_att, zc_att, zo_att)
        ctxs = []
        for (Wq, v), k, vv, m in zip(p.query, keys, values, masks):
            pq = h_att @ Wq
            e = tanh(k + pq[:, None, :])
            ec = jnp.einsum("btu,u->bt", e, v[:, 0])
            ec = jnp.where(m > 0.5, ec, -1e9)
            a = jax.nn.softmax(ec, axis=1)
            ctxs.append(jnp.einsum("bt,btc->bc", a, vv))
        ctx = jnp.concatenate(ctxs, axis=1)
        proj = jnp.concatenate([h_att, ctx], 1) @ p.outproj[0] \
            + p.outproj[1][0]
        c1, l1 = lstm(jnp.concatenate([proj, h1], 1), *p.lstm1, c1, h1,
                      zc_dec, zo_dec)
        h1 = l1
        o1 = proj + l1
        c2, l2 = lstm(jnp.concatenate([o1, h2], 1), *p.lstm2, c2, h2,
                      zc_dec, zo_dec)
        h2 = l2
        return (c_att, h_att, c1, h1, c2, h2, ctx), o1 + l2

    z = lambda n: jnp.zeros((batch, n))
    carry0 = (z(a_units), z(a_units), z(d_units), z(d_units), z(d_units),
              z(d_units), z(sumc))
    _, ys = jax.lax.scan(step, carry0, jnp.moveaxis(teacher, 0, 1))
    return jnp.moveaxis(ys, 0, 1)


FUSED_KW = dict(drop_rate=0.0, zc_att=0.0, zo_att=0.0, zc_dec=0.0,
                zo_dec=0.0, deterministic=True)


def test_forward_matches_reference():
    p = make_params(jax.random.PRNGKey(0))
    keys, values, masks, teacher = make_inputs(jax.random.PRNGKey(1))
    y_ref = reference_scan(p, keys, values, masks, teacher)
    y = fused_teacher_scan(p, keys, values, masks, teacher,
                           jnp.int32(0), **FUSED_KW)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-5)


def test_forward_deterministic_zoneout_matches_reference():
    """Eval-style expectation zoneout (deterministic=True, factors > 0)."""
    p = make_params(jax.random.PRNGKey(0))
    keys, values, masks, teacher = make_inputs(jax.random.PRNGKey(1))
    zk = dict(zc_att=0.1, zo_att=0.1, zc_dec=0.1, zo_dec=0.1)
    y_ref = reference_scan(p, keys, values, masks, teacher, **zk)
    y = fused_teacher_scan(p, keys, values, masks, teacher, jnp.int32(0),
                           drop_rate=0.0, deterministic=True, **zk)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-5)


def _loss_fused(p, keys, values, masks, teacher):
    y = fused_teacher_scan(p, keys, values, masks, teacher,
                           jnp.int32(0), **FUSED_KW)
    return jnp.sum(y * jnp.cos(jnp.arange(y.size).reshape(y.shape) * 0.1))


def _loss_ref(p, keys, values, masks, teacher):
    y = reference_scan(p, keys, values, masks, teacher)
    return jnp.sum(y * jnp.cos(jnp.arange(y.size).reshape(y.shape) * 0.1))


def test_gradients_match_reference():
    """The hand-derived backward kernel == jax.grad of the replica, for
    every weight AND the attention keys/values (encoder gradients)."""
    p = make_params(jax.random.PRNGKey(0))
    keys, values, masks, teacher = make_inputs(jax.random.PRNGKey(1))

    g_fused = jax.grad(_loss_fused, argnums=(0, 1, 2))(
        p, keys, values, masks, teacher)
    g_ref = jax.grad(_loss_ref, argnums=(0, 1, 2))(
        p, keys, values, masks, teacher)

    flat_f, _ = jax.tree_util.tree_flatten(g_fused)
    flat_r, _ = jax.tree_util.tree_flatten(g_ref)
    assert len(flat_f) == len(flat_r)
    for i, (a, b) in enumerate(zip(flat_f, flat_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5, err_msg=f"leaf {i}")


def test_gradients_match_with_partial_dw_window():
    """dw_block=2 over S=5 steps leaves a 1-step tail window: the stash's
    stale cotangent rows must be zeroed so the final flush adds nothing
    spurious (the batched weight-gradient accumulation's edge case)."""
    p = make_params(jax.random.PRNGKey(0))
    keys, values, masks, teacher = make_inputs(jax.random.PRNGKey(1))

    def lf(p_):
        y = fused_teacher_scan(p_, keys, values, masks, teacher,
                               jnp.int32(0), dw_block=2, **FUSED_KW)
        return jnp.sum(y ** 2)

    g_f = jax.grad(lf)(p)
    g_r = jax.grad(lambda p_: jnp.sum(reference_scan(
        p_, keys, values, masks, teacher) ** 2))(p)
    for a, b in zip(jax.tree_util.tree_leaves(g_f),
                    jax.tree_util.tree_leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)


def test_gradients_match_with_deterministic_zoneout():
    zk = dict(zc_att=0.1, zo_att=0.1, zc_dec=0.1, zo_dec=0.1)

    def lf(p, keys, values, masks, teacher):
        y = fused_teacher_scan(p, keys, values, masks, teacher, jnp.int32(0),
                               drop_rate=0.0, deterministic=True, **zk)
        return jnp.sum(y ** 2)

    def lr(p, keys, values, masks, teacher):
        y = reference_scan(p, keys, values, masks, teacher, **zk)
        return jnp.sum(y ** 2)

    p = make_params(jax.random.PRNGKey(2))
    keys, values, masks, teacher = make_inputs(jax.random.PRNGKey(3))
    g_f = jax.grad(lf)(p, keys, values, masks, teacher)
    g_r = jax.grad(lr)(p, keys, values, masks, teacher)
    for a, b in zip(jax.tree_util.tree_leaves(g_f),
                    jax.tree_util.tree_leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)


def test_stochastic_masks_reproduce_between_fwd_and_bwd():
    """With dropout+zoneout ON, grad(loss) must be computed with the SAME
    masks the forward pass used: check via finite differences along one
    weight direction with a FIXED seed (the kernel regenerates masks from
    (seed, step), so fwd replays identically)."""
    p = make_params(jax.random.PRNGKey(4))
    keys, values, masks, teacher = make_inputs(jax.random.PRNGKey(5))
    kw = dict(drop_rate=0.5, zc_att=0.1, zo_att=0.1, zc_dec=0.1, zo_dec=0.1,
              deterministic=False)
    seed = jnp.int32(123)

    def loss(p_):
        y = fused_teacher_scan(p_, keys, values, masks, teacher, seed, **kw)
        return jnp.sum(y ** 2)

    try:
        l0 = float(loss(p))
    except Exception as e:  # in-kernel PRNG unsupported in interpret mode
        pytest.skip(f"kernel PRNG unavailable on this backend: {e}")
    assert float(loss(p)) == l0  # same seed -> identical stochastic fwd

    g = jax.grad(loss)(p)
    direction = jax.tree_util.tree_map(jnp.ones_like, p)
    eps = 1e-3
    shift = lambda s: jax.tree_util.tree_map(lambda x, d: x + s * d, p,
                                             direction)
    fd = (float(loss(shift(eps))) - float(loss(shift(-eps)))) / (2 * eps)
    dot = sum(float(jnp.vdot(a, b)) for a, b in
              zip(jax.tree_util.tree_leaves(g),
                  jax.tree_util.tree_leaves(direction)))
    np.testing.assert_allclose(dot, fd, rtol=2e-2)


# ----------------------------------------------- decoder-level integration

def test_decoder_fused_train_matches_scan():
    """decoder_fused_train=True: TacotronDecoder TRAIN outputs and train-step
    gradients equal the nn.scan path (dropout/zoneout zero so both paths are
    deterministic; stochastic streams intentionally differ, see module
    docstring)."""
    from self_attention_tacotron_tpu.models import (DecoderMode,
                                                    tacotron_model_factory,
                                                    compute_loss)
    from test_tacotron_model import make_batch, tiny_hp

    kw = dict(encoder_prenet_drop_rate=0.0, decoder_prenet_drop_rate=0.0,
              self_attention_drop_rate=0.0,
              decoder_self_attention_drop_rate=0.0,
              zoneout_factor_cell=0.0, zoneout_factor_output=0.0)
    hp = tiny_hp(**kw)
    hp_f = tiny_hp(decoder_fused_train=True, **kw)
    batch = make_batch(hp, B=2, T_in=7, T_out=6)
    model = tacotron_model_factory(hp)
    model_f = tacotron_model_factory(hp_f)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                           DecoderMode.VALIDATION, True)

    def loss(m, v):
        rngs = {"dropout": jax.random.PRNGKey(1),
                "zoneout": jax.random.PRNGKey(2)}
        out, _ = m.apply(v, batch, DecoderMode.TRAIN, rngs=rngs,
                         mutable=["batch_stats"])
        return compute_loss(hp, out, batch, v["params"])["loss"], out

    (l_ref, out_ref), g_ref = jax.value_and_grad(
        lambda v: loss(model, v), has_aux=True)(variables)
    (l_f, out_f), g_f = jax.value_and_grad(
        lambda v: loss(model_f, v), has_aux=True)(variables)

    np.testing.assert_allclose(float(l_f), float(l_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out_f.outputs),
                               np.asarray(out_ref.outputs),
                               rtol=2e-4, atol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_f),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-5)
    # additive-only fused TRAIN skips alignment materialization unless asked
    assert all(np.all(np.asarray(a) == 0) for a in out_f.alignments)


def test_decoder_fused_train_want_alignments_matches_scan():
    """want_alignments=True materializes TRAIN-mode source alignments from
    the fused kernel's aux buffer; they must equal the nn.scan path's
    (additive config, deterministic)."""
    from self_attention_tacotron_tpu.models import (DecoderMode,
                                                    tacotron_model_factory)
    from test_tacotron_model import make_batch, tiny_hp

    kw = dict(encoder_prenet_drop_rate=0.0, decoder_prenet_drop_rate=0.0,
              self_attention_drop_rate=0.0,
              decoder_self_attention_drop_rate=0.0,
              zoneout_factor_cell=0.0, zoneout_factor_output=0.0)
    hp = tiny_hp(**kw)
    hp_f = tiny_hp(decoder_fused_train=True, **kw)
    batch = make_batch(hp, B=2, T_in=7, T_out=6)
    model = tacotron_model_factory(hp)
    model_f = tacotron_model_factory(hp_f)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                           DecoderMode.VALIDATION, True)
    rngs = {"dropout": jax.random.PRNGKey(1),
            "zoneout": jax.random.PRNGKey(2)}
    out_ref, _ = model.apply(variables, batch, DecoderMode.TRAIN, rngs=rngs,
                             mutable=["batch_stats"], want_alignments=True)
    out_f, _ = model_f.apply(variables, batch, DecoderMode.TRAIN, rngs=rngs,
                             mutable=["batch_stats"], want_alignments=True)
    assert len(out_f.alignments) == len(out_ref.alignments)
    for a_f, a_r in zip(out_f.alignments, out_ref.alignments):
        assert float(np.abs(np.asarray(a_f)).max()) > 0
        np.testing.assert_allclose(np.asarray(a_f), np.asarray(a_r),
                                   rtol=2e-4, atol=2e-5)


def test_decoder_fused_train_fallback_logs(caplog):
    import logging
    from self_attention_tacotron_tpu.models import (DecoderMode,
                                                    tacotron_model_factory)
    from self_attention_tacotron_tpu.models import decoder as decoder_mod
    from test_tacotron_model import make_batch, tiny_hp

    decoder_mod._warned_fused_fallback.clear()
    # forward attention itself is fused now; the transition agent is not.
    # Dropout/zoneout must be off: on non-TPU backends the in-kernel-PRNG
    # gate would fire first and log a different reason.
    hp = tiny_hp(decoder_fused_train=True, attention="forward",
                 use_forward_attention_transition_agent=True,
                 decoder_prenet_drop_rate=0.0, zoneout_factor_cell=0.0,
                 zoneout_factor_output=0.0)
    batch = make_batch(hp, B=2, T_in=7, T_out=6)
    model = tacotron_model_factory(hp)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                           DecoderMode.VALIDATION, True)
    with caplog.at_level(logging.WARNING,
                         logger="self_attention_tacotron_tpu.models.decoder"):
        out, _ = model.apply(variables, batch, DecoderMode.TRAIN,
                             rngs={"dropout": jax.random.PRNGKey(1),
                                   "zoneout": jax.random.PRNGKey(2)},
                             mutable=["batch_stats"])
    assert np.isfinite(np.asarray(out.outputs)).all()
    msgs = [r.getMessage() for r in caplog.records]
    assert any("[train]" in m and "transition agent" in m
               for m in msgs), msgs


def test_bf16_storage_close_to_f32():
    """compute_dtype='bfloat16' keeps weights/matmuls in bf16 with f32
    accumulation — outputs and gradients track the f32 path loosely."""
    p = make_params(jax.random.PRNGKey(0))
    keys, values, masks, teacher = make_inputs(jax.random.PRNGKey(1))
    y32 = fused_teacher_scan(p, keys, values, masks, teacher, jnp.int32(0),
                             **FUSED_KW)
    y16 = fused_teacher_scan(p, keys, values, masks, teacher, jnp.int32(0),
                             compute_dtype="bfloat16", **FUSED_KW)
    np.testing.assert_allclose(np.asarray(y16), np.asarray(y32),
                               rtol=0.1, atol=0.1)

    def l16(p_):
        y = fused_teacher_scan(p_, keys, values, masks, teacher,
                               jnp.int32(0), compute_dtype="bfloat16",
                               **FUSED_KW)
        return jnp.sum(y ** 2)

    g16 = jax.grad(l16)(p)
    g32 = jax.grad(lambda p_: jnp.sum(reference_scan(
        p_, keys, values, masks, teacher) ** 2))(p)
    for a, b in zip(jax.tree_util.tree_leaves(g16),
                    jax.tree_util.tree_leaves(g32)):
        scale = float(np.max(np.abs(np.asarray(b)))) + 1e-3
        assert float(np.max(np.abs(np.asarray(a) - np.asarray(b)))) / scale \
            < 0.15


def test_divergent_row_energies_stay_finite():
    """Regression: the kernel softmax must shift by each utterance's OWN
    max.  With all-positive large ||v||_1 and keys pushing one batch row's
    energies to ~+||v||_1 and the other's to ~-||v||_1, a single global max
    shift underflows the low row's exps to zero (sum 0 -> NaN).  Advisor
    finding, round 2."""
    p = make_params(jax.random.PRNGKey(0))
    # all-positive v with ||v||_1 = 4*U (96 / 64): row gap ~2*||v||_1 > 88
    query = tuple((wq, jnp.abs(vq) * 0.0 + 4.0) for wq, vq in p.query)
    p = p._replace(query=query)
    keys, values, masks, teacher = make_inputs(jax.random.PRNGKey(1))
    # row 0 saturates tanh at +1, row 1 at -1 -> energies +-||v||_1
    sign = jnp.array([5.0, -5.0])[:, None, None]
    keys = tuple(jnp.ones_like(k) * sign for k in keys)

    y_ref = reference_scan(p, keys, values, masks, teacher)
    y = fused_teacher_scan(p, keys, values, masks, teacher,
                           jnp.int32(0), **FUSED_KW)
    assert np.all(np.isfinite(np.asarray(y)))
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-4)

    g = jax.grad(lambda p_: jnp.sum(fused_teacher_scan(
        p_, keys, values, masks, teacher, jnp.int32(0), **FUSED_KW) ** 2))(p)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_decoder_fused_train_speaker_matches_scan():
    """Speaker-conditioned (MultiSpeakerPreNet) fused training: forward,
    loss, and every gradient — including the speaker projection and the
    speaker embedding, which flow through the kernel's d_speaker_row
    cotangent — equal the nn.scan path."""
    from self_attention_tacotron_tpu.models import (DecoderMode,
                                                    tacotron_model_factory,
                                                    compute_loss)
    from test_tacotron_model import make_batch, tiny_hp

    kw = dict(encoder_prenet_drop_rate=0.0, decoder_prenet_drop_rate=0.0,
              self_attention_drop_rate=0.0,
              decoder_self_attention_drop_rate=0.0,
              zoneout_factor_cell=0.0, zoneout_factor_output=0.0,
              use_speaker_embedding=True, num_speakers=3)
    hp = tiny_hp(**kw)
    hp_f = tiny_hp(decoder_fused_train=True, **kw)
    batch = make_batch(hp, B=2, T_in=7, T_out=6)
    batch = batch._replace(speaker_id=jnp.array([0, 2], jnp.int32))
    model = tacotron_model_factory(hp)
    model_f = tacotron_model_factory(hp_f)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                           DecoderMode.VALIDATION, True)

    def loss(m, v):
        rngs = {"dropout": jax.random.PRNGKey(1),
                "zoneout": jax.random.PRNGKey(2)}
        out, _ = m.apply(v, batch, DecoderMode.TRAIN, rngs=rngs,
                         mutable=["batch_stats"])
        return compute_loss(hp, out, batch, v["params"])["loss"], out

    (l_ref, out_ref), g_ref = jax.value_and_grad(
        lambda v: loss(model, v), has_aux=True)(variables)
    (l_f, out_f), g_f = jax.value_and_grad(
        lambda v: loss(model_f, v), has_aux=True)(variables)

    np.testing.assert_allclose(float(l_f), float(l_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out_f.outputs),
                               np.asarray(out_ref.outputs),
                               rtol=2e-4, atol=2e-5)
    leaves_f = jax.tree_util.tree_leaves_with_path(g_f)
    leaves_r = dict(jax.tree_util.tree_leaves_with_path(g_ref))
    assert leaves_r, "no reference gradient leaves"
    spk_leaves = 0
    for path, a in leaves_f:
        b = leaves_r[path]
        name = jax.tree_util.keystr(path)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-5, err_msg=name)
        if "speaker" in name:
            spk_leaves += 1
            assert float(np.max(np.abs(np.asarray(b)))) > 0, name
    # the speaker embedding AND the prenet speaker projection got gradients
    assert spk_leaves >= 3


def test_decoder_fused_train_forward_attention_matches_scan():
    """The shipped flagship setting (attention=forward): location conv +
    forward recursion inside the fused training kernels, gradients equal
    the nn.scan path — including the location conv/dense weights, which
    flow through the kernel's d_loc cotangent."""
    from self_attention_tacotron_tpu.models import (DecoderMode,
                                                    tacotron_model_factory,
                                                    compute_loss)
    from test_tacotron_model import make_batch, tiny_hp

    kw = dict(encoder_prenet_drop_rate=0.0, decoder_prenet_drop_rate=0.0,
              self_attention_drop_rate=0.0,
              decoder_self_attention_drop_rate=0.0,
              zoneout_factor_cell=0.0, zoneout_factor_output=0.0,
              attention="forward", cumulative_weights=False,
              attention_kernel=10, attention_filters=5,
              use_speaker_embedding=True, num_speakers=3)
    hp = tiny_hp(**kw)
    hp_f = tiny_hp(decoder_fused_train=True, **kw)
    batch = make_batch(hp, B=2, T_in=7, T_out=6)
    batch = batch._replace(speaker_id=jnp.array([1, 2], jnp.int32))
    model = tacotron_model_factory(hp)
    model_f = tacotron_model_factory(hp_f)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                           DecoderMode.VALIDATION, True)

    def loss(m, v):
        rngs = {"dropout": jax.random.PRNGKey(1),
                "zoneout": jax.random.PRNGKey(2)}
        out, _ = m.apply(v, batch, DecoderMode.TRAIN, rngs=rngs,
                         mutable=["batch_stats"])
        return compute_loss(hp, out, batch, v["params"])["loss"], out

    (l_ref, out_ref), g_ref = jax.value_and_grad(
        lambda v: loss(model, v), has_aux=True)(variables)
    (l_f, out_f), g_f = jax.value_and_grad(
        lambda v: loss(model_f, v), has_aux=True)(variables)

    np.testing.assert_allclose(float(l_f), float(l_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out_f.outputs),
                               np.asarray(out_ref.outputs),
                               rtol=2e-4, atol=2e-5)
    leaves_r = dict(jax.tree_util.tree_leaves_with_path(g_ref))
    loc_leaves = 0
    for path, a in jax.tree_util.tree_leaves_with_path(g_f):
        name = jax.tree_util.keystr(path)
        np.testing.assert_allclose(np.asarray(a),
                                   np.asarray(leaves_r[path]),
                                   rtol=2e-3, atol=2e-5, err_msg=name)
        if "location" in name:
            loc_leaves += 1
            assert float(np.max(np.abs(np.asarray(leaves_r[path])))) > 0, name
    assert loc_leaves >= 3  # conv kernel + conv bias + location dense
    # location/forward configs stream their alignments anyway, so TRAIN-mode
    # alignments materialize for free and must match the scan path's
    for a_f, a_r in zip(out_f.alignments, out_ref.alignments):
        assert float(np.abs(np.asarray(a_f)).max()) > 0
        np.testing.assert_allclose(np.asarray(a_f), np.asarray(a_r),
                                   rtol=2e-4, atol=2e-5)
