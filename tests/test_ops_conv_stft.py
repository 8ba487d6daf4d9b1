import jax
import jax.numpy as jnp
import numpy as np

from self_attention_tacotron_tpu.config import default_hparams
from self_attention_tacotron_tpu.ops.conv import (
    Conv1dBN, ConvBank, HighwayNet, max_pool_same,
)
from self_attention_tacotron_tpu.ops.stft import (
    MelExtractor, mel_statistics_finalize, mel_statistics_init,
    mel_statistics_update, stft as jstft,
)
from self_attention_tacotron_tpu.utils import audio as A


def test_conv1d_bn_shapes():
    m = Conv1dBN(kernel_size=3, out_channels=8)
    x = jnp.ones((2, 5, 4))
    variables = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(variables, x)
    assert y.shape == (2, 5, 8)
    assert np.all(np.asarray(y) >= 0)  # relu
    # train mode mutates batch stats
    y2, mutated = m.apply(variables, x, train=True, mutable=["batch_stats"])
    assert "batch_stats" in mutated


def test_highway_identity_when_gate_closed():
    m = HighwayNet(out_units=4)
    x = jnp.ones((1, 3, 4)) * 0.5
    variables = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(variables, x)
    assert y.shape == x.shape
    # transport bias -1 biases toward carrying input through
    # (gate sigma(-1)=0.27 with zero-ish H at init)


def test_max_pool_same():
    x = jnp.array([[[1.0], [3.0], [2.0], [5.0]]])
    y = max_pool_same(x, 2)
    np.testing.assert_array_equal(np.asarray(y[0, :, 0]), [3, 3, 5, 5])


def test_conv_bank():
    m = ConvBank(max_filter_width=4, conv_channels=8)
    x = jnp.ones((2, 6, 4))
    variables = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(variables, x)
    assert y.shape == (2, 6, 32)


def test_jax_stft_matches_numpy():
    sr = 16000
    y = (0.3 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)).astype(np.float32)
    n_fft, hop, win = 1024, 200, 800
    D_np = A.stft(y, n_fft, hop, win)
    D_jax = np.asarray(jstft(jnp.asarray(y), n_fft, hop, win))
    np.testing.assert_allclose(np.abs(D_jax), np.abs(D_np), atol=2e-3)


def test_mel_extractor_matches_audio_facade():
    hp = default_hparams().replace(
        num_mels=80, num_freq=513, sample_rate=16000,
        frame_length_ms=50.0, frame_shift_ms=12.5,
        average_mel_level_db=[0.0] * 80, stddev_mel_level_db=[1.0] * 80)
    au = A.Audio(hp)
    ex = MelExtractor(16000, 513, 80, 50.0, 12.5, hp.ref_level_db)
    y = (0.3 * np.sin(2 * np.pi * 440 * np.arange(16000) / 16000)).astype(np.float32)
    S_np = au.melspectrogram(y)
    S_jax = np.asarray(ex(jnp.asarray(y)))
    assert S_np.shape == S_jax.shape
    np.testing.assert_allclose(S_jax, S_np, atol=0.1)  # db-domain tolerance


def test_on_device_audio_facade_parity():
    """preprocess_on_device routes Audio.spectrogram/melspectrogram through
    the fused Pallas matmul-DFT kernel; outputs must match the NumPy path
    in the dB domain (cli/preprocess.py --on-device)."""
    hp = default_hparams().replace(
        num_mels=80, num_freq=513, sample_rate=16000,
        frame_length_ms=50.0, frame_shift_ms=12.5,
        average_mel_level_db=[0.0] * 80, stddev_mel_level_db=[1.0] * 80)
    au_np = A.Audio(hp)
    au_dev = A.Audio(hp.replace(preprocess_on_device=True))
    rng = np.random.RandomState(0)
    y = (0.1 * rng.randn(20000)).astype(np.float32)
    for name in ("spectrogram", "melspectrogram"):
        S_np = getattr(au_np, name)(y)
        S_dev = getattr(au_dev, name)(y)
        assert S_np.shape == S_dev.shape, name
        np.testing.assert_allclose(S_dev, S_np, atol=0.15, err_msg=name)


def test_mel_statistics_stream():
    rng = np.random.RandomState(0)
    frames = rng.randn(1000, 8).astype(np.float32) * 3 + 5
    carry = mel_statistics_init(8)
    for chunk in np.array_split(frames, 7):
        carry = mel_statistics_update(carry, chunk)
    stats = mel_statistics_finalize(carry)
    np.testing.assert_allclose(stats["average_mel_level_db"],
                               frames.mean(axis=0), rtol=1e-5)
    np.testing.assert_allclose(stats["stddev_mel_level_db"],
                               frames.std(axis=0), rtol=1e-4)
