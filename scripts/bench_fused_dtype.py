"""Time the fused decode kernel at f32 vs bf16 in-kernel storage.

The fused kernel keeps all weights VMEM-resident; per step it streams the
full weight set (~15 MB f32) from VMEM through the MXU.  If the kernel is
weight-bandwidth bound, bf16 storage (decoder_fused_dtype="bfloat16")
should approach a 2x speedup.  This script measures both and reports the
argmax-code-id agreement of bf16 vs the f32 scan reference.

Usage: python scripts/bench_fused_dtype.py
"""

import statistics
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from __graft_entry__ import _flagship_hparams, _make_batch
from self_attention_tacotron_tpu.models import DecoderMode, tacotron_model_factory


def time_decode(hp, label, B=1, T_in=64):
    batch = _make_batch(hp, B=B, T_in=T_in, T_out=32)
    b = batch._replace(target=None, done=None)
    model = tacotron_model_factory(hp)
    variables = jax.jit(lambda k, bb: model.init({"params": k}, bb,
                                                 DecoderMode.VALIDATION, True))(
        jax.random.PRNGKey(0), batch)
    jax.block_until_ready(variables)

    @jax.jit
    def decode_chain(v, bb, salt):
        bb = bb._replace(source=(bb.source + salt) % (hp.num_symbols - 1) + 1)
        out = model.apply(v, bb, DecoderMode.INFERENCE)
        return (jnp.abs(out.outputs).sum().astype(jnp.int32) % 7)

    def run_chain(n, seed):
        salt = jnp.asarray(seed, jnp.int32)
        t0 = time.perf_counter()
        for _ in range(n):
            salt = decode_chain(variables, b, salt)
        int(salt)
        return time.perf_counter() - t0

    run_chain(2, 0)
    n_short, n_long, reps = 4, 32, 5
    ts = statistics.median(run_chain(n_short, r) for r in range(reps))
    tl = statistics.median(run_chain(n_long, r + 10) for r in range(reps))
    per = (tl - ts) / (n_long - n_short)
    fps = hp.max_iters * hp.outputs_per_step * B / per
    print(f"{label:36s} {per*1e3:8.3f} ms/decode  {fps:10.0f} frames/s")
    return per


def id_agreement(hp_fused):
    batch = _make_batch(hp_fused, B=1, T_in=64, T_out=32)
    b = batch._replace(target=None, done=None)
    ref_model = tacotron_model_factory(hp_fused.replace(
        decoder_fused_inference=False))
    model = tacotron_model_factory(hp_fused)
    variables = jax.jit(lambda k, bb: ref_model.init(
        {"params": k}, bb, DecoderMode.VALIDATION, True))(
        jax.random.PRNGKey(0), batch)
    ref = jax.jit(lambda v, bb: ref_model.apply(v, bb, DecoderMode.INFERENCE))(
        variables, b)
    fused = jax.jit(lambda v, bb: model.apply(v, bb, DecoderMode.INFERENCE))(
        variables, b)
    mism = float(jnp.mean(
        (fused.predicted_samples != ref.predicted_samples).astype(jnp.float32)))
    rel = float(jnp.max(jnp.abs(fused.outputs - ref.outputs))
                / jnp.max(jnp.abs(ref.outputs)))
    print(f"  vs f32 scan: rel_err={rel:.3e} argmax_id_mismatch={mism:.3f} "
          f"len {int(fused.lengths[0])}=={int(ref.lengths[0])}")


def main():
    hp = _flagship_hparams(tiny=False)
    hp.max_iters = 450
    hp.decoder_early_stop = False
    hp.decoder_fused_inference = True

    time_decode(hp, "fused f32")
    t_bf = time_decode(hp.replace(decoder_fused_dtype="bfloat16"),
                       "fused bf16 weights")
    id_agreement(hp.replace(decoder_fused_dtype="bfloat16"))
    return 0


if __name__ == "__main__":
    sys.exit(main())
