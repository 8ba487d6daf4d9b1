"""On-device STFT and mel-spectrogram extraction (Pallas on TPU).

Same math as the NumPy path in ``utils/audio.py`` (which defines parity with
the reference's librosa pipeline, reference: utils/audio.py:51-73), designed
TPU-first: the STFT is a matmul-form DFT — windowed frames against
(n_fft, n_bins) cos/sin matrices — which lands on the MXU, and the whole
frames -> magnitude -> linear-dB + mel-dB chain runs as ONE Pallas kernel
(``pallas_spectrograms``) with the DFT/mel weights VMEM-resident across all
frame chunks, so the magnitude matrix never round-trips HBM.  Preprocessing
wires this behind ``--on-device`` (cli/preprocess.py); the jnp fallback
(`stft`, identical math via rfft) serves CPU/interpret runs and spectral
losses.

The mel projection is a (T, n_bins) x (n_bins, n_mels) matmul -> MXU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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


# ------------------------------------------------- Pallas matmul-DFT kernel

def _pad128(n: int) -> int:
    return ((n + 127) // 128) * 128


def dft_matrices(n_fft: int) -> tuple:
    """Real-input DFT as two (n_fft, 1 + n_fft//2) matmul operands:
    Re X[k] = frames @ cos, Im X[k] = -(frames @ sin) — magnitude only
    needs the squares, so the Im sign is immaterial."""
    n_bins = 1 + n_fft // 2
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_bins)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    return (np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32))


_LOG10_INV = float(1.0 / np.log(10.0))


def _spectrogram_kernel(frames_ref, wr_ref, wi_ref, melt_ref,
                        lin_ref, mel_ref):
    f = frames_ref[...]
    re = jnp.dot(f, wr_ref[...], preferred_element_type=jnp.float32)
    im = jnp.dot(f, wi_ref[...], preferred_element_type=jnp.float32)
    mag = jnp.sqrt(re * re + im * im)
    db = lambda x: 20.0 * _LOG10_INV * jnp.log(jnp.maximum(1e-5, x))
    lin_ref[...] = db(mag)
    mel = jnp.dot(mag, melt_ref[...], preferred_element_type=jnp.float32)
    mel_ref[...] = db(mel)


def pallas_spectrograms(frames: jax.Array, wr: jax.Array, wi: jax.Array,
                        mel_t: jax.Array, chunk: int = 128,
                        interpret: bool = None) -> tuple:
    """(F, n_fft) windowed frames -> (linear_db (F, n_bins_padded),
    mel_db (F, n_mels_padded)), one fused kernel, chunked over frames.

    ``wr``/``wi`` are zero-column-padded to a lane multiple; the padded
    magnitude columns come out as the -100 dB floor and ``mel_t``'s matching
    zero rows keep them out of the mel sums — callers slice the pads off.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    F, n_fft = frames.shape
    bins_p = wr.shape[1]
    mels_p = mel_t.shape[1]
    Fp = ((F + chunk - 1) // chunk) * chunk
    if Fp != F:
        frames = jnp.pad(frames, ((0, Fp - F), (0, 0)))
    grid = (Fp // chunk,)
    lin, mel = pl.pallas_call(
        _spectrogram_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((chunk, n_fft), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, bins_p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, bins_p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bins_p, mels_p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((chunk, bins_p), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, mels_p), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((Fp, bins_p), jnp.float32),
                   jax.ShapeDtypeStruct((Fp, mels_p), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 << 20),
        interpret=interpret,
    )(frames, wr, wi, mel_t)
    return lin[:F], mel[:F]


class MelExtractor:
    """Wav -> (linear dB, mel dB) pipeline on device.

    On TPU the whole frames -> magnitude -> dB chain runs as the fused
    Pallas kernel above; elsewhere the identical matmul-DFT math runs under
    the Pallas interpreter, so outputs are backend-independent.  Orientation
    matches ``utils/audio.Audio``: (num_freq, n_frames) / (num_mels,
    n_frames)."""

    def __init__(self, sample_rate: int, num_freq: int, num_mels: int,
                 frame_length_ms: float, frame_shift_ms: float,
                 ref_level_db: float):
        self.n_fft = (num_freq - 1) * 2
        self.num_freq = num_freq
        self.num_mels = num_mels
        self.hop_length = int(frame_shift_ms / 1000 * sample_rate)
        self.win_length = int(frame_length_ms / 1000 * sample_rate)
        self.ref_level_db = ref_level_db
        self.mel_basis = jnp.asarray(
            mel_filterbank(sample_rate, self.n_fft, num_mels))
        self.window = jnp.asarray(hann_window(self.win_length, self.n_fft),
                                  jnp.float32)
        wr, wi = dft_matrices(self.n_fft)
        bins_p = _pad128(self.num_freq)
        mels_p = _pad128(num_mels)
        pad_b = [(0, 0), (0, bins_p - self.num_freq)]
        self._wr = jnp.asarray(np.pad(wr, pad_b))
        self._wi = jnp.asarray(np.pad(wi, pad_b))
        melt = np.asarray(self.mel_basis).T   # (n_bins, n_mels)
        self._mel_t = jnp.asarray(np.pad(
            melt, [(0, bins_p - self.num_freq), (0, mels_p - num_mels)]))

    def _frames(self, y: jax.Array) -> jax.Array:
        y = jnp.asarray(y, jnp.float32)
        y = jnp.pad(y, self.n_fft // 2, mode="reflect")
        n_frames = 1 + (y.shape[0] - self.n_fft) // self.hop_length
        idx = (jnp.arange(n_frames)[:, None] * self.hop_length
               + jnp.arange(self.n_fft)[None, :])
        return y[idx] * self.window[None, :]

    def spectrograms(self, y: jax.Array) -> tuple:
        """(T_samples,) -> (linear (num_freq, F), mel (num_mels, F)) dB."""
        lin, mel = pallas_spectrograms(self._frames(y), self._wr, self._wi,
                                       self._mel_t)
        lin = lin[:, :self.num_freq].T - self.ref_level_db
        mel = mel[:, :self.num_mels].T - self.ref_level_db
        return lin, mel

    def __call__(self, y: jax.Array) -> jax.Array:
        """(T_samples,) -> (num_mels, n_frames) log-mel in dB."""
        return self.spectrograms(y)[1]

    def linear(self, y: jax.Array) -> jax.Array:
        """(T_samples,) -> (num_freq, n_frames) linear log-spectrogram."""
        return self.spectrograms(y)[0]


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
