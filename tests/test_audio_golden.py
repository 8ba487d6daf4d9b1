"""Golden-fixture parity for the audio DSP chain.

Double-entry bookkeeping against drift (see tests/make_audio_fixtures.py):
the stored goldens were computed by an INDEPENDENT re-implementation of the
librosa-documented algorithms (explicit DFT matrix, per-filter triangle
loops, scipy hann); here the production code in ``utils/audio.py`` must
reproduce them bit-near, and the generator must reproduce the stored file.

Reference DSP being pinned: utils/audio.py:51-73 (librosa STFT -> Slaney
mel -> 20*log10 - ref_level_db -> (mel-avg)/std).
"""

import os

import numpy as np
import pytest

from self_attention_tacotron_tpu.utils import audio as A

import make_audio_fixtures as G

FIXTURE = G.FIXTURE


@pytest.fixture(scope="module")
def golden():
    assert os.path.exists(FIXTURE), "run tests/make_audio_fixtures.py"
    return dict(np.load(FIXTURE))


def test_generator_reproduces_stored_fixture(golden):
    """The checked-in .npz must be exactly what the generator produces —
    neither the goldens nor the generator can drift silently."""
    fresh = G.build_fixtures()
    assert set(fresh) == set(golden)
    for k, v in fresh.items():
        np.testing.assert_array_equal(np.asarray(v), golden[k], err_msg=k)


def test_mel_filterbank_matches_golden(golden):
    for key, sr in (("mel_filterbank_24k", 24000),
                    ("mel_filterbank_22k", 22050)):
        fb = A.mel_filterbank(sr, G.N_FFT, G.N_MELS)
        np.testing.assert_allclose(fb, golden[key], rtol=1e-6, atol=1e-8,
                                   err_msg=key)


def test_stft_matches_golden(golden):
    S = A.stft(golden["signal"].astype(np.float64), G.N_FFT, G.HOP, G.WIN)
    np.testing.assert_allclose(S.real, golden["stft_real"],
                               rtol=1e-4, atol=2e-3)
    np.testing.assert_allclose(S.imag, golden["stft_imag"],
                               rtol=1e-4, atol=2e-3)


def test_melspectrogram_matches_golden(golden):
    """The full chain the corpus statistics depend on: STFT -> |.| -> mel ->
    dB -> ref_level_db shift -> normalization."""
    class HP:
        num_freq = 1 + G.N_FFT // 2
        sample_rate = G.SR
        frame_shift_ms = 12.5
        frame_length_ms = 50.0
        num_mels = G.N_MELS
        ref_level_db = G.REF_DB
        average_mel_level_db = golden["norm_avg"].tolist()
        stddev_mel_level_db = golden["norm_std"].tolist()

    audio = A.Audio(HP())
    mel = audio.melspectrogram(golden["signal"].astype(np.float64))
    np.testing.assert_allclose(mel, golden["mel_db"], rtol=1e-5, atol=2e-4)
    # the preprocessors feed (T, n_mels) into normalize_mel (mel.T)
    norm = audio.normalize_mel(mel.T)
    np.testing.assert_allclose(norm, golden["mel_normalized"].T,
                               rtol=1e-5, atol=2e-4)


def test_trim_matches_golden(golden):
    start, end = A.trim_interval(golden["signal"].astype(np.float64),
                                 top_db=30.0, frame_length=1024,
                                 hop_length=256)
    np.testing.assert_array_equal([start, end], golden["trim_interval"])
