"""Benchmark: autoregressive decoder throughput on the flagship model.

Primary metric: decoder output frames/sec/chip for the free-running
(stop-token) decode of the flagship DualSourceSelfAttentionTacotron
configuration (1025-way code vocabulary, 450-step cap, batch 1 — the
reference's predict configuration) — the hot loop of the whole system.
The reference's inference re-runs self-attention over the full growing
output history each frame, O(T^2) per step
(reference: modules/rnn_wrappers.py:87-124, modules/module.py:767-784);
ours is a KV-cache linear-cost ``lax.scan``.

Methodology: the TPU here sits behind a device tunnel whose blocking
host<->device round-trip is ~25 ms — larger than the decode itself — so
per-call wall timing measures the tunnel, not the chip.  We instead time
chains of N back-to-back decodes whose inputs are data-dependent on the
previous decode's output (so they serialize on device and cannot be
memoized), sync once at the end, and take the slope between a short and a
long chain.  That is the steady-state per-decode device time, which is the
number that matters for production serving (requests are pipelined; the
round-trip is paid once, not per utterance).

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
    # production serving path: the whole decode loop as one Pallas kernel
    # with VMEM-resident weights (ops/fused_decode.py; parity vs the scan
    # path in tests/test_fused_decode.py + scripts/check_fused_decode.py)
    hp.decoder_fused_inference = True
    # the whole-encoder kernel removes the ~0.2 ms of per-op launch
    # overhead that dominated the serving chain's fixed cost
    hp.encoder_fused_inference = True
    B, T_in = 1, 64
    batch = _make_batch(hp, B=B, T_in=T_in, T_out=32)
    model = tacotron_model_factory(hp)
    init_fn = jax.jit(lambda k, b: model.init({"params": k}, b,
                                              DecoderMode.VALIDATION, True))
    variables = init_fn(jax.random.PRNGKey(0), batch)
    jax.block_until_ready(variables)

    @jax.jit
    def decode_chain(variables, b, salt):
        # the salt is derived from the previous decode's outputs, so chained
        # calls serialize on device, see different source ids each link, and
        # cannot be short-circuited by any caching layer in the tunnel
        b = b._replace(source=(b.source + salt) % (hp.num_symbols - 1) + 1)
        out = model.apply(variables, b, DecoderMode.INFERENCE)
        return (jnp.abs(out.outputs).sum().astype(jnp.int32) % 7)

    b = batch._replace(target=None, done=None)

    def run_chain(n, seed):
        salt = jnp.asarray(seed, jnp.int32)
        t0 = time.perf_counter()
        for _ in range(n):
            salt = decode_chain(variables, b, salt)
        int(salt)  # one blocking sync at the end of the chain
        return time.perf_counter() - t0

    run_chain(2, 0)  # compile + warmup
    # longer chains + more reps: run-to-run tunnel variance is ~15%, and
    # each decode is ~1.3 ms, so a 36-call chain still costs under 50 ms.
    # The tunnel occasionally degrades an entire measurement by 10-30x
    # (observed: a whole run at 1/25th speed, bracketed by normal ones);
    # per-rep estimates expose that as huge relative spread, so retry the
    # measurement until the reps agree and keep the tightest attempt.
    n_short, n_long, reps = 4, 36, 7

    def measure():
        t_short = statistics.median(run_chain(n_short, r)
                                    for r in range(reps))
        ests = []
        for r in range(reps):
            t_long = run_chain(n_long, r + 10)
            ests.append((t_long - t_short) / (n_long - n_short))
        med = statistics.median(ests)
        spread = (statistics.median(abs(e - med) for e in ests)
                  / max(med, 1e-9))
        return med, spread

    best = None
    for attempt in range(3):
        med, spread = measure()
        if best is None or spread < best[1]:
            best = (med, spread)
        if spread < 0.08:
            break
    per_decode = best[0]

    frames = hp.max_iters * hp.outputs_per_step * B
    fps = frames / per_decode

    print(json.dumps({
        "metric": "decoder_frames_per_sec_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / REFERENCE_ESTIMATE_FPS, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
