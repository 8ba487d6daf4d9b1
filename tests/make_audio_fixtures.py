"""Golden-fixture generator for the audio DSP chain.

librosa/TF1 cannot run in this environment, so parity with the reference's
DSP (reference: utils/audio.py:51-73, which wraps librosa) is pinned by
double-entry bookkeeping: this file re-implements the librosa-documented
algorithms INDEPENDENTLY of ``utils/audio.py`` — explicit DFT matrix
instead of np.fft, per-filter triangle loop instead of vectorized ramps,
scipy's hann instead of the cosine formula — computes golden arrays once,
and stores them in ``tests/fixtures/audio_golden.npz``.

``tests/test_audio_golden.py`` then asserts (a) the production code in
``utils/audio.py`` matches the stored goldens bit-near, and (b) re-running
this generator reproduces the stored file, so neither side can drift
silently.

Run: python tests/make_audio_fixtures.py  (rewrites the .npz)
"""

import os

import numpy as np
import scipy.signal

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "audio_golden.npz")

# the reference VCTK configuration (reference: examples/vctk/*.json):
# 24 kHz, num_freq=1025 -> n_fft=2048, 50 ms window, 12.5 ms hop
SR = 24000
N_FFT = 2048
WIN = int(50.0 / 1000 * SR)    # 1200
HOP = int(12.5 / 1000 * SR)    # 300
N_MELS = 80
REF_DB = 20.0


# ---------------------------------------------------- independent primitives

def _mel_scale(f):
    """Slaney mel: linear below 1 kHz, logarithmic above (librosa htk=False,
    documented in librosa.hz_to_mel)."""
    f = np.asarray(f, dtype=np.float64)
    out = f / (200.0 / 3.0)
    brk = 1000.0 / (200.0 / 3.0)
    step = np.log(6.4) / 27.0
    hi = f >= 1000.0
    out = np.where(hi, brk + np.log(np.where(hi, f, 1000.0) / 1000.0) / step,
                   out)
    return out


def _mel_to_hz(m):
    m = np.asarray(m, dtype=np.float64)
    brk = 1000.0 / (200.0 / 3.0)
    step = np.log(6.4) / 27.0
    hi = m >= brk
    return np.where(hi, 1000.0 * np.exp(step * (np.where(hi, m, brk) - brk)),
                    m * (200.0 / 3.0))


def golden_mel_filterbank(sr=SR, n_fft=N_FFT, n_mels=N_MELS):
    """Per-filter triangle construction with Slaney area normalization."""
    fft_freqs = np.arange(1 + n_fft // 2) * (sr / n_fft)
    mel_edges = _mel_to_hz(np.linspace(_mel_scale(0.0), _mel_scale(sr / 2.0),
                                       n_mels + 2))
    fb = np.zeros((n_mels, 1 + n_fft // 2))
    for i in range(n_mels):
        lo, ctr, hi = mel_edges[i], mel_edges[i + 1], mel_edges[i + 2]
        for k, f in enumerate(fft_freqs):
            if lo <= f <= ctr and ctr > lo:
                fb[i, k] = (f - lo) / (ctr - lo)
            elif ctr < f <= hi and hi > ctr:
                fb[i, k] = (hi - f) / (hi - ctr)
        fb[i] *= 2.0 / (hi - lo)  # Slaney: area-normalize each triangle
    return fb.astype(np.float32)


def golden_stft(y, n_fft=N_FFT, hop=HOP, win=WIN):
    """Centered reflect-padded STFT via an explicit DFT matrix."""
    window = np.zeros(n_fft)
    pad = (n_fft - win) // 2
    window[pad:pad + win] = scipy.signal.get_window("hann", win, fftbins=True)
    y = np.pad(y, n_fft // 2, mode="reflect")
    n_frames = 1 + (len(y) - n_fft) // hop
    k = np.arange(1 + n_fft // 2)
    n = np.arange(n_fft)
    dft = np.exp(-2j * np.pi * np.outer(k, n) / n_fft)
    frames = np.stack([y[t * hop:t * hop + n_fft] * window
                       for t in range(n_frames)], axis=1)
    return dft @ frames


def golden_signal():
    """Deterministic 0.5 s test waveform: three tones + seeded noise, with
    silent head/tail for the trim fixture."""
    t = np.arange(int(0.5 * SR)) / SR
    tone = (0.5 * np.sin(2 * np.pi * 440.0 * t)
            + 0.25 * np.sin(2 * np.pi * 1320.0 * t + 0.1)
            + 0.1 * np.sin(2 * np.pi * 6000.0 * t + 0.7))
    rng = np.random.RandomState(1234)
    tone = tone + 0.01 * rng.randn(len(t))
    sil = np.zeros(int(0.1 * SR))
    return np.concatenate([sil, tone, sil]).astype(np.float64)


def golden_trim_interval(y, top_db=30.0, frame_length=1024, hop_length=256):
    """librosa.effects.trim: RMS per centered frame, dB re signal peak."""
    ypad = np.concatenate([np.zeros(frame_length // 2), y,
                           np.zeros(frame_length // 2)])
    n_frames = 1 + (len(ypad) - frame_length) // hop_length
    rms = np.array([np.sqrt(np.mean(ypad[i * hop_length:
                                         i * hop_length + frame_length] ** 2))
                    for i in range(n_frames)])
    db = 20.0 * np.log10(np.maximum(rms, 1e-10) / max(rms.max(), 1e-10))
    idx = np.flatnonzero(db > -top_db)
    if len(idx) == 0:
        return 0, 0
    return int(idx[0]) * hop_length, min(len(y), (int(idx[-1]) + 1) * hop_length)


def build_fixtures():
    y = golden_signal()
    fb = golden_mel_filterbank()
    S = golden_stft(y)
    mag = np.abs(S)
    mel_db = 20.0 * np.log10(np.maximum(1e-5, fb @ mag)) - REF_DB
    # deterministic pseudo corpus statistics for the normalization fixture
    avg = (-45.0 + 5.0 * np.sin(np.arange(N_MELS) / 7.0)).astype(np.float32)
    std = (10.0 + 2.0 * np.cos(np.arange(N_MELS) / 11.0)).astype(np.float32)
    norm = (mel_db - avg[:, None]) / std[:, None]
    start, end = golden_trim_interval(y)
    return {
        "signal": y.astype(np.float32),
        "mel_filterbank_24k": fb,
        "mel_filterbank_22k": golden_mel_filterbank(sr=22050),
        "stft_real": S.real.astype(np.float32),
        "stft_imag": S.imag.astype(np.float32),
        "mel_db": mel_db.astype(np.float32),
        "norm_avg": avg, "norm_std": std,
        "mel_normalized": norm.astype(np.float32),
        "trim_interval": np.array([start, end], np.int64),
    }


if __name__ == "__main__":
    os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
    np.savez_compressed(FIXTURE, **build_fixtures())
    print(f"wrote {FIXTURE}")
