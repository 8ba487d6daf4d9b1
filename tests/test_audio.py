import numpy as np

from self_attention_tacotron_tpu.config import default_hparams
from self_attention_tacotron_tpu.utils import audio as A


def test_hz_mel_roundtrip():
    f = np.array([0.0, 250.0, 999.0, 1000.0, 4000.0, 11025.0])
    np.testing.assert_allclose(A.mel_to_hz(A.hz_to_mel(f)), f, rtol=1e-10)


def test_mel_filterbank_properties():
    fb = A.mel_filterbank(22050, 2048, 80)
    assert fb.shape == (80, 1025)
    assert fb.dtype == np.float32
    # every filter has some mass, filters tile the spectrum
    assert (fb.sum(axis=1) > 0).all()
    # slaney normalization: each triangle integrates to ~1 over Hz
    bin_width = (22050 / 2) / (2048 // 2)
    areas = fb.sum(axis=1) * bin_width
    assert np.all(areas[5:-5] > 0.8) and np.all(areas[5:-5] < 1.2)


def test_stft_shape_and_parseval():
    sr = 22050
    t = np.arange(sr) / sr
    y = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    n_fft, hop, win = 2048, 275, 1102
    D = A.stft(y, n_fft, hop, win)
    assert D.shape[0] == 1 + n_fft // 2
    expected_frames = 1 + len(y) // hop
    assert abs(D.shape[1] - expected_frames) <= 1
    # a 440 Hz tone peaks at bin 440/ (sr/n_fft) ~= 40.9
    mag = np.abs(D).mean(axis=1)
    assert abs(int(np.argmax(mag)) - round(440 * n_fft / sr)) <= 1


def test_stft_istft_roundtrip():
    rng = np.random.RandomState(0)
    y = rng.randn(8000).astype(np.float32) * 0.1
    n_fft, hop, win = 1024, 256, 1024
    D = A.stft(y, n_fft, hop, win)
    y2 = A.istft(D, hop, win, n_fft, length=len(y))
    np.testing.assert_allclose(y2[512:-512], y[512:-512], atol=1e-5)


def test_trim_removes_silence():
    sr = 16000
    silence = np.zeros(sr // 2, dtype=np.float32)
    tone = 0.5 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr).astype(np.float32)
    y = np.concatenate([silence, tone, silence])
    start, end = A.trim_interval(y, top_db=30, frame_length=1024, hop_length=256)
    assert start <= len(silence) + 256
    assert abs(start - len(silence)) < 2048
    assert abs(end - (len(silence) + len(tone))) < 2048


def test_audio_facade_melspectrogram():
    hp = default_hparams().replace(
        num_mels=80, num_freq=1025, sample_rate=22050,
        frame_length_ms=50.0, frame_shift_ms=12.5,
        average_mel_level_db=[-30.0] * 80, stddev_mel_level_db=[10.0] * 80)
    au = A.Audio(hp)
    y = np.sin(2 * np.pi * 440 * np.arange(22050) / 22050).astype(np.float32)
    S = au.melspectrogram(y)
    assert S.shape[0] == 80
    # db scale: silence floor is 20*log10(1e-5) - ref = -120 - 20
    assert S.min() >= -140.0 - 1e-3
    # normalization operates on (T, num_mels) matrices (reference:
    # preprocess/vctk.py:132 transposes before normalize_mel)
    S = S.astype(np.float32).T
    norm = au.normalize_mel(S)
    np.testing.assert_allclose(au.denormalize_mel(norm), S, rtol=1e-5)


def test_wav_io_roundtrip(tmp_path):
    sr = 16000
    y = (0.3 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr)).astype(np.float32)
    path = str(tmp_path / "t.wav")
    A.save_wav(y, path, sr)
    y2 = A.load_wav(path, sr)
    np.testing.assert_allclose(y2, y, atol=1e-4)
    # resampled load
    y3 = A.load_wav(path, 8000)
    assert abs(len(y3) - 8000) < 10
