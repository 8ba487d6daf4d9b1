"""Benchmark: autoregressive decoder throughput on the flagship model.

Primary metric: decoder output frames/sec/chip for the free-running
(stop-token) decode of the flagship DualSourceSelfAttentionTacotron
configuration (1025-way code vocabulary, 450-step cap, batch 1 — the
reference's predict configuration) — the hot loop of the whole system.
The reference's inference re-runs self-attention over the full growing
output history each frame, O(T^2) per step
(reference: modules/rnn_wrappers.py:87-124, modules/module.py:767-784);
ours is a KV-cache linear-cost ``lax.scan``.

vs_baseline: the reference publishes no numbers (BASELINE.md).  We use an
estimated 500 frames/sec for the TF1 reference's single-GPU batch-1 decode
(typical for graph-mode TF1 seq2seq with per-step host dispatch and the
growing-history attention) purely to provide a stable denominator across
rounds; the absolute frames/sec is the number that matters.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import statistics
import sys
import time

import jax
import jax.numpy as jnp

REFERENCE_ESTIMATE_FPS = 500.0


def main():
    from __graft_entry__ import _flagship_hparams, _make_batch
    from self_attention_tacotron_tpu.models import (DecoderMode,
                                                    tacotron_model_factory)

    hp = _flagship_hparams(tiny=False)
    hp.max_iters = 450
    # measure the full 450-step decode, not the early-exit path (randomly
    # initialized stop tokens fire after ~min_iters steps)
    hp.decoder_early_stop = False
    B, T_in = 1, 64
    batch = _make_batch(hp, B=B, T_in=T_in, T_out=32)
    model = tacotron_model_factory(hp)
    init_fn = jax.jit(lambda k, b: model.init({"params": k}, b,
                                              DecoderMode.VALIDATION, True))
    variables = init_fn(jax.random.PRNGKey(0), batch)
    jax.block_until_ready(variables)

    @jax.jit
    def decode(variables, b):
        out = model.apply(variables, b, DecoderMode.INFERENCE)
        # returning a scalar too lets timing sync via host readback
        # (block_until_ready alone can under-report through device tunnels)
        return out.outputs, jnp.abs(out.outputs).sum()

    def make_infer(seed):
        src = jax.random.randint(jax.random.PRNGKey(100 + seed),
                                 (B, T_in), 1, hp.num_symbols)
        return batch._replace(target=None, done=None, source=src)

    import numpy as np

    # compile + warmup (synced through a host scalar readback)
    _, s = decode(variables, make_infer(0))
    float(s)

    # vary the input each call (a tunnelled backend may short-circuit
    # repeated identical executions); sync each call via scalar readback
    n_iters = 10
    times = []
    for i in range(n_iters):
        b = make_infer(i + 1)
        np.asarray(b.source)
        t0 = time.perf_counter()
        _, s = decode(variables, b)
        float(s)
        times.append(time.perf_counter() - t0)
    dt = statistics.median(times)

    frames = hp.max_iters * hp.outputs_per_step * B
    fps = frames / dt

    print(json.dumps({
        "metric": "decoder_frames_per_sec_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / REFERENCE_ESTIMATE_FPS, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
