"""On-device (JAX) STFT and mel-spectrogram extraction.

Same math as the NumPy path in ``utils/audio.py`` (which defines parity with
the reference's librosa pipeline, reference: utils/audio.py:51-73), expressed
in jnp so feature extraction can run jitted on TPU — e.g. to fold
preprocessing into the input pipeline or compute spectral losses on device.

The mel projection is a (n_mels, n_bins) x (n_bins, T) matmul -> MXU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.audio import hann_window, mel_filterbank


@partial(jax.jit, static_argnums=(1, 2, 3))
def stft(y: jax.Array, n_fft: int, hop_length: int, win_length: int) -> jax.Array:
    """Complex STFT (1 + n_fft//2, n_frames); centered, reflect-padded."""
    window = jnp.asarray(hann_window(win_length, n_fft), dtype=y.dtype)
    y = jnp.pad(y, n_fft // 2, mode="reflect")
    n_frames = 1 + (y.shape[0] - n_fft) // hop_length
    idx = jnp.arange(n_frames)[:, None] * hop_length + jnp.arange(n_fft)[None, :]
    frames = y[idx] * window[None, :]  # (n_frames, n_fft)
    return jnp.fft.rfft(frames, axis=1).T


def amp_to_db(x: jax.Array) -> jax.Array:
    return 20.0 * jnp.log10(jnp.maximum(1e-5, x))


class MelExtractor:
    """Jitted wav -> log-mel pipeline with a cached filterbank."""

    def __init__(self, sample_rate: int, num_freq: int, num_mels: int,
                 frame_length_ms: float, frame_shift_ms: float,
                 ref_level_db: float):
        self.n_fft = (num_freq - 1) * 2
        self.hop_length = int(frame_shift_ms / 1000 * sample_rate)
        self.win_length = int(frame_length_ms / 1000 * sample_rate)
        self.ref_level_db = ref_level_db
        self.mel_basis = jnp.asarray(
            mel_filterbank(sample_rate, self.n_fft, num_mels))

    def __call__(self, y: jax.Array) -> jax.Array:
        """(T_samples,) -> (num_mels, n_frames) log-mel in dB."""
        D = stft(y, self.n_fft, self.hop_length, self.win_length)
        mel = self.mel_basis @ jnp.abs(D)
        return amp_to_db(mel) - self.ref_level_db

    def linear(self, y: jax.Array) -> jax.Array:
        """(T_samples,) -> (num_freq, n_frames) linear log-spectrogram."""
        D = stft(y, self.n_fft, self.hop_length, self.win_length)
        return amp_to_db(jnp.abs(D)) - self.ref_level_db


def mel_statistics_update(carry, mel_frames: np.ndarray):
    """Streaming per-bin corpus statistics (count, sum, sumsq, min, max).

    Used by the preprocessors for average/stddev_mel_level_db
    (reference: preprocess_vctk.py:70-89 Spark reduction).
    """
    count, s, ss, mn, mx = carry
    return (count + mel_frames.shape[0],
            s + mel_frames.sum(axis=0),
            ss + np.square(mel_frames).sum(axis=0),
            np.minimum(mn, mel_frames.min(axis=0)),
            np.maximum(mx, mel_frames.max(axis=0)))


def mel_statistics_init(num_mels: int):
    return (0, np.zeros(num_mels), np.zeros(num_mels),
            np.full(num_mels, np.inf), np.full(num_mels, -np.inf))


def mel_statistics_finalize(carry):
    count, s, ss, mn, mx = carry
    mean = s / count
    var = ss / count - mean ** 2
    return {
        "average_mel_level_db": mean.tolist(),
        "stddev_mel_level_db": np.sqrt(np.maximum(var, 0.0)).tolist(),
        "min_mel_level_db": mn.tolist(),
        "max_mel_level_db": mx.tolist(),
    }
