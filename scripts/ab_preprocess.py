"""A/B: multi-process NumPy preprocessing vs the on-device Pallas STFT.

``preprocess --on-device`` routes the spectrogram chain through the fused
matmul-DFT kernel (ops/stft.py) but forces ONE worker (a single
accelerator context), while the NumPy path fans out over a process pool.
This measures wall-clock for a synthetic batch of utterances through
``Audio.melspectrogram`` + ``Audio.spectrogram`` both ways, answering
whether --on-device is an end-to-end win on this host (2 CPUs) and
documenting when it is worth it (PERF.md).

Usage: python scripts/ab_preprocess.py [n_utts] [rounds]
"""

import multiprocessing as mp
import statistics
import sys
import time

sys.path.insert(0, ".")

import numpy as np

SR = 24000
SECONDS = 5.0


def make_hp(on_device):
    from self_attention_tacotron_tpu.config import default_hparams
    hp = default_hparams()
    hp.sample_rate = SR
    hp.num_freq = 1025
    hp.num_mels = 80
    hp.frame_length_ms = 50.0
    hp.frame_shift_ms = 12.5
    if on_device:
        hp = hp.replace(preprocess_on_device=True)
    return hp


def _one(args):
    seed, on_device = args
    from self_attention_tacotron_tpu.utils.audio import Audio
    audio = Audio(make_hp(on_device))
    rng = np.random.RandomState(seed)
    wav = (rng.randn(int(SR * SECONDS)) * 0.1).astype(np.float32)
    mel = audio.melspectrogram(wav)
    spec = audio.spectrogram(wav)
    return float(mel.sum()) + float(spec.sum())


def run_pool(n_utts, workers):
    with mp.get_context("spawn").Pool(workers) as pool:
        t0 = time.perf_counter()
        list(pool.map(_one, [(i, False) for i in range(n_utts)]))
        return time.perf_counter() - t0


def run_device(n_utts):
    from self_attention_tacotron_tpu.utils.audio import Audio
    audio = Audio(make_hp(True))
    rng = np.random.RandomState(0)
    wavs = [(rng.randn(int(SR * SECONDS)) * 0.1).astype(np.float32)
            for _ in range(n_utts)]
    # warm the kernel compile outside the timing
    audio.melspectrogram(wavs[0])
    audio.spectrogram(wavs[0])
    t0 = time.perf_counter()
    for w in wavs:
        audio.melspectrogram(w)
        audio.spectrogram(w)
    return time.perf_counter() - t0


def main():
    n_utts = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    workers = mp.cpu_count()
    res = {f"numpy pool x{workers}": [], "numpy 1 worker": [],
           "on-device (1 ctx)": []}
    for _ in range(rounds):
        res[f"numpy pool x{workers}"].append(run_pool(n_utts, workers))
        res["numpy 1 worker"].append(run_pool(n_utts, 1))
        res["on-device (1 ctx)"].append(run_device(n_utts))
    for name, ts in res.items():
        med = statistics.median(ts)
        per = med / n_utts * 1000
        print(f"{name:18s} {med:7.2f} s / {n_utts} utts "
              f"({per:6.1f} ms/utt)  all={[f'{t:.1f}' for t in ts]}")


if __name__ == "__main__":
    main()
