"""On-chip validation + timing of the fused teacher-forced training scan.

1. parity: fwd + grads vs the pure-JAX replica at small flagship-shaped
   dims (f32, deterministic).
2. stochastic: same seed -> identical loss; finite-difference check that
   bwd regenerates the forward's dropout/zoneout masks.
3. timing: value_and_grad of a trunk loss, fused vs XLA scan, at the
   flagship's B=32 / T=256 training shape (chained dispatch, device_get
   sync — see PERF.md pitfalls).
"""

import statistics
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import jax
import jax.numpy as jnp
import numpy as np

from self_attention_tacotron_tpu.ops.fused_train import (FusedTrainParams,
                                                         fused_teacher_scan)

FLAG = dict(CF=1025, U=(128, 128), C=(224, 256), P=(256, 128), A=256, D=256)


def make(key, B, T_steps, T_mem, cf, u_sizes, c_sizes, p_sizes, A, D):
    ks = jax.random.split(key, 24)
    g = lambda k, s, sc=0.3: jax.random.normal(k, s) * sc
    sumc = sum(c_sizes)
    params = FusedTrainParams(
        prenet=((g(ks[0], (cf, p_sizes[0])), g(ks[1], (1, p_sizes[0]))),
                (g(ks[2], (p_sizes[0], p_sizes[1])),
                 g(ks[3], (1, p_sizes[1])))),
        att_lstm=(g(ks[4], (p_sizes[1] + sumc + A, 4 * A), 0.1),
                  g(ks[5], (1, 4 * A), 0.1)),
        query=tuple((g(ks[6 + i], (A, u)), g(ks[8 + i], (u, 1)))
                    for i, u in enumerate(u_sizes)),
        outproj=(g(ks[10], (A + sumc, D), 0.1), g(ks[11], (1, D), 0.1)),
        lstm1=(g(ks[12], (2 * D, 4 * D), 0.1), g(ks[13], (1, 4 * D), 0.1)),
        lstm2=(g(ks[14], (2 * D, 4 * D), 0.1), g(ks[15], (1, 4 * D), 0.1)))
    keys = tuple(g(ks[16 + i], (B, T_mem, u), 0.5)
                 for i, u in enumerate(u_sizes))
    values = tuple(g(ks[18 + i], (B, T_mem, c), 0.5)
                   for i, c in enumerate(c_sizes))
    masks = tuple(jnp.ones((B, T_mem), jnp.float32) for _ in u_sizes)
    teacher = g(ks[22], (B, T_steps, cf), 0.5)
    return params, keys, values, masks, teacher


def parity():
    from test_fused_train import reference_scan
    params, keys, values, masks, teacher = make(
        jax.random.PRNGKey(0), B=8, T_steps=12, T_mem=16, cf=FLAG["CF"],
        u_sizes=FLAG["U"], c_sizes=FLAG["C"], p_sizes=FLAG["P"],
        A=FLAG["A"], D=FLAG["D"])
    kw = dict(drop_rate=0.0, zc_att=0.0, zo_att=0.0, zc_dec=0.0,
              zo_dec=0.0, deterministic=True)

    def lf(p, k, v):
        return jnp.sum(fused_teacher_scan(p, k, v, masks, teacher,
                                          jnp.int32(0), **kw) ** 2)

    def lr(p, k, v):
        return jnp.sum(reference_scan(p, k, v, masks, teacher) ** 2)

    y = fused_teacher_scan(params, keys, values, masks, teacher,
                           jnp.int32(0), **kw)
    y_ref = reference_scan(params, keys, values, masks, teacher)
    err = float(jnp.max(jnp.abs(y - y_ref)))
    rel = err / float(jnp.max(jnp.abs(y_ref)))
    print(f"fwd parity   max|diff|={err:.3e} rel={rel:.3e}")

    gf = jax.grad(lf, argnums=(0, 1, 2))(params, keys, values)
    gr = jax.grad(lr, argnums=(0, 1, 2))(params, keys, values)
    worst = 0.0
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gr)):
        scale = float(jnp.max(jnp.abs(b))) + 1e-6
        worst = max(worst, float(jnp.max(jnp.abs(a - b))) / scale)
    print(f"grad parity  worst rel={worst:.3e}")
    assert rel < 2e-4 and worst < 5e-3, "parity failure"


def stochastic():
    params, keys, values, masks, teacher = make(
        jax.random.PRNGKey(1), B=8, T_steps=12, T_mem=16, cf=FLAG["CF"],
        u_sizes=FLAG["U"], c_sizes=FLAG["C"], p_sizes=FLAG["P"],
        A=FLAG["A"], D=FLAG["D"])
    kw = dict(drop_rate=0.5, zc_att=0.1, zo_att=0.1, zc_dec=0.1,
              zo_dec=0.1, deterministic=False)

    def loss(p, seed):
        return jnp.sum(fused_teacher_scan(p, keys, values, masks, teacher,
                                          seed, **kw) ** 2)

    l1 = float(loss(params, jnp.int32(7)))
    l2 = float(loss(params, jnp.int32(7)))
    l3 = float(loss(params, jnp.int32(8)))
    print(f"stochastic   replay={l1 == l2} (l={l1:.4f}), "
          f"new seed differs={l1 != l3}")
    assert l1 == l2 and l1 != l3

    g = jax.grad(loss)(params, jnp.int32(7))
    d = jax.tree_util.tree_map(jnp.ones_like, params)
    eps = 1e-3
    move = lambda s: jax.tree_util.tree_map(lambda x, dd: x + s * dd,
                                            params, d)
    fd = (float(loss(move(eps), jnp.int32(7)))
          - float(loss(move(-eps), jnp.int32(7)))) / (2 * eps)
    dot = sum(float(jnp.vdot(a, b)) for a, b in
              zip(jax.tree_util.tree_leaves(g), jax.tree_util.tree_leaves(d)))
    print(f"stochastic   grad.dir={dot:.4f} fd={fd:.4f} "
          f"rel={abs(dot - fd) / (abs(fd) + 1e-9):.3e}")
    assert abs(dot - fd) / (abs(fd) + 1e-9) < 3e-2


def parity_recipe():
    """On-chip fused-vs-scan parity at the SHIPPED recipe shape (forward
    attention + speaker prenet) through the real decoder module — the
    additive ``parity()`` does not exercise the location-conv window
    build, the forward recursion, or their backward."""
    import numpy as np

    from self_attention_tacotron_tpu.config import default_hparams
    from self_attention_tacotron_tpu.models import (DecoderMode,
                                                    compute_loss,
                                                    tacotron_model_factory)

    hp = default_hparams()
    hp.tacotron_model = "DualSourceSelfAttentionTacotronModel"
    hp.encoder = "SelfAttentionCBHGEncoder"
    hp.decoder = "DualSourceTransformerDecoder"
    hp.num_symbols = 40
    hp.num_mels = 64
    hp.outputs_per_step = 1
    hp.n_feed_frame = 1
    hp.attention = "forward"
    hp.attention_kernel = 10
    hp.attention_filters = 5
    hp.use_speaker_embedding = True
    hp.num_speakers = 4
    hp.encoder_prenet_drop_rate = 0.0
    hp.decoder_prenet_drop_rate = 0.0
    hp.self_attention_drop_rate = 0.0
    hp.decoder_self_attention_drop_rate = 0.0
    hp.zoneout_factor_cell = 0.0
    hp.zoneout_factor_output = 0.0

    from __graft_entry__ import _make_batch
    batch = _make_batch(hp, B=8, T_in=12, T_out=16)
    batch = batch._replace(
        speaker_id=jnp.arange(8, dtype=jnp.int32) % 4)
    model = tacotron_model_factory(hp)
    model_f = tacotron_model_factory(hp.replace(decoder_fused_train=True))
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                           DecoderMode.VALIDATION, True)

    def loss(m, v):
        rngs = {"dropout": jax.random.PRNGKey(1),
                "zoneout": jax.random.PRNGKey(2)}
        out, _ = m.apply(v, batch, DecoderMode.TRAIN, rngs=rngs,
                         mutable=["batch_stats"])
        return compute_loss(hp, out, batch, v["params"])["loss"]

    from self_attention_tacotron_tpu.ops import fused_train as ft
    calls = []
    orig = ft.fused_teacher_scan
    ft.fused_teacher_scan = lambda *a, **k: (calls.append(1),
                                             orig(*a, **k))[1]
    try:
        (l_ref, g_ref) = jax.value_and_grad(
            lambda v: loss(model, v))(variables)
        (l_f, g_f) = jax.value_and_grad(
            lambda v: loss(model_f, v))(variables)
    finally:
        ft.fused_teacher_scan = orig
    assert calls, "recipe config fell back to the scan path (gate tripped)"
    rel_l = abs(float(l_f) - float(l_ref)) / (abs(float(l_ref)) + 1e-9)
    worst = 0.0
    for a, b in zip(jax.tree_util.tree_leaves(g_f),
                    jax.tree_util.tree_leaves(g_ref)):
        scale = float(jnp.max(jnp.abs(b))) + 1e-6
        worst = max(worst, float(jnp.max(jnp.abs(a - b))) / scale)
    print(f"recipe parity  loss rel={rel_l:.3e}  grad worst rel={worst:.3e}")
    assert rel_l < 2e-4 and worst < 5e-3, "recipe on-chip parity failure"


def timing(B=32, T_steps=256, T_mem=64):
    from test_fused_train import reference_scan
    params, keys, values, masks, teacher = make(
        jax.random.PRNGKey(2), B=B, T_steps=T_steps, T_mem=T_mem,
        cf=FLAG["CF"], u_sizes=FLAG["U"], c_sizes=FLAG["C"],
        p_sizes=FLAG["P"], A=FLAG["A"], D=FLAG["D"])
    kw = dict(drop_rate=0.5, zc_att=0.1, zo_att=0.1, zc_dec=0.1,
              zo_dec=0.1, deterministic=False)

    def fused_loss(p, seed):
        return jnp.sum(fused_teacher_scan(p, keys, values, masks, teacher,
                                          seed, **kw) ** 2)

    def xla_loss(p, seed):
        # XLA baseline: deterministic replica (no dropout) — conservative:
        # the real XLA train path also pays dropout mask generation
        return jnp.sum(reference_scan(p, keys, values, masks, teacher) ** 2)

    def bench(loss_fn, label):
        vg = jax.jit(jax.value_and_grad(loss_fn))

        def chain(n, seed0):
            p = params
            t0 = time.perf_counter()
            for i in range(n):
                l, g = vg(p, jnp.int32(seed0 + i))
                p = jax.tree_util.tree_map(
                    lambda x, gg: x - jnp.float32(1e-9) * gg, p, g)
            jax.device_get(l)
            return time.perf_counter() - t0

        chain(1, 0)
        ts = statistics.median(chain(2, s) for s in range(3))
        tl = statistics.median(chain(8, 10 + s) for s in range(3))
        per = (tl - ts) / 6
        print(f"{label:24s} {per * 1e3:8.2f} ms per fwd+bwd "
              f"({per / T_steps * 1e6:.2f} us/step)")
        return per

    def bench_fwd(loss_fn, label):
        f = jax.jit(loss_fn)

        def chain(n, seed0):
            acc = jnp.float32(0)
            t0 = time.perf_counter()
            for i in range(n):
                acc = acc + f(jax.tree_util.tree_map(
                    lambda x: x + acc * 1e-12, params), jnp.int32(seed0 + i))
            jax.device_get(acc)
            return time.perf_counter() - t0

        chain(1, 0)
        ts = statistics.median(chain(2, s) for s in range(3))
        tl = statistics.median(chain(8, 10 + s) for s in range(3))
        per = (tl - ts) / 6
        print(f"{label:24s} {per * 1e3:8.2f} ms fwd only "
              f"({per / T_steps * 1e6:.2f} us/step)")
        return per

    bench_fwd(fused_loss, "fused trunk")
    bench_fwd(xla_loss, "XLA scan")
    t_fused = bench(fused_loss, "fused trunk fwd+bwd")
    t_xla = bench(xla_loss, "XLA scan fwd+bwd")
    print(f"speedup: {t_xla / t_fused:.2f}x")


if __name__ == "__main__":
    # parity runs at highest matmul precision: XLA's DEFAULT f32 matmuls
    # are bf16 multi-pass on TPU and drift ~5e-3 over the recurrence, which
    # would mask kernel bugs; the kernel itself is precision-stable
    jax.config.update("jax_default_matmul_precision", "highest")
    parity()
    parity_recipe()
    stochastic()
    jax.config.update("jax_default_matmul_precision", "default")
    timing()
    print("OK")
