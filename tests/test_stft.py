"""Spectrogram kernel vs scipy.signal.spectrogram oracle (and mlab cross
check), per SURVEY.md section 4 item 1."""

import numpy as np
import pytest
import scipy.signal as sps

from audian_tpu.ops import (
    spectrogram,
    spectrogram_frequencies,
    num_frames,
    decibel,
    inverse_decibel,
)


RATE = 44100.0


@pytest.fixture(scope="module")
def signal(rng):
    n = 40000
    t = np.arange(n) / RATE
    return np.sin(2 * np.pi * 5000.0 * t) + 0.1 * rng.standard_normal(n)


def _oracle(x, nfft, hop):
    f, t, sxx = sps.spectrogram(
        x, fs=RATE, window="hann", nperseg=nfft, noverlap=nfft - hop,
        detrend=False, scaling="density", mode="psd", axis=0,
    )
    return f, t, sxx


@pytest.mark.parametrize("nfft,hop", [(256, 128), (256, 256), (1024, 256),
                                      (64, 16), (509, 100)])
def test_spectrogram_matches_scipy(signal, nfft, hop):
    got = np.asarray(spectrogram(signal, RATE, nfft, hop))
    f, t, want = _oracle(signal, nfft, hop)
    assert got.shape == (want.shape[1], want.shape[0])
    np.testing.assert_allclose(got, want.T, rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(spectrogram_frequencies(RATE, nfft), f)


def test_spectrogram_multichannel(signal):
    x = np.stack([signal, 0.5 * signal], axis=1)
    got = np.asarray(spectrogram(x, RATE, 256, 128))
    _, _, want = _oracle(x, 256, 128)  # scipy: (freq, chan, time)
    assert got.shape == (want.shape[2], want.shape[1], want.shape[0])
    np.testing.assert_allclose(got, want.transpose(2, 1, 0), rtol=1e-8,
                               atol=1e-12)


def test_spectrogram_f32(signal):
    got = np.asarray(spectrogram(signal.astype(np.float32), RATE, 256, 128))
    _, _, want = _oracle(signal, 256, 128)
    assert got.dtype == np.float32
    # power ~ 1e-2 scale; relative agreement at f32 precision
    np.testing.assert_allclose(got, want.T, rtol=2e-3, atol=1e-8)


def test_spectrogram_matches_mlab(signal):
    """Cross-check against matplotlib.mlab (the API family thunderlab's
    spectrogram derives from) — same PSD convention up to its default
    symmetric-vs-periodic window choice, so compare with an explicit
    window."""
    from matplotlib import mlab

    nfft, hop = 512, 256
    win = np.asarray(0.5 - 0.5 * np.cos(2 * np.pi * np.arange(nfft) / nfft))
    want, f, t = mlab.specgram(signal, NFFT=nfft, Fs=RATE,
                               noverlap=nfft - hop, window=win,
                               detrend="none", mode="psd", sides="onesided")
    got = np.asarray(spectrogram(signal, RATE, nfft, hop))
    np.testing.assert_allclose(got, want.T, rtol=1e-8, atol=1e-12)


def test_num_frames_matches_reference_sizing():
    # reference: nsource = (ndest - 1)*hop + nfft  (bufferedspectrogram.py:46)
    for n, nfft, hop in [(1000, 256, 128), (255, 256, 128), (256, 256, 128)]:
        nf = num_frames(n, nfft, hop)
        if nf:
            assert (nf - 1) * hop + nfft <= n
            assert nf * hop + nfft > n


def test_decibel_semantics():
    p = np.array([1.0, 0.1, 1e-30, 0.0])
    db = np.asarray(decibel(p))
    assert db[0] == 0.0
    np.testing.assert_allclose(db[1], -10.0)
    assert np.isneginf(db[2]) and np.isneginf(db[3])
    np.testing.assert_allclose(
        np.asarray(inverse_decibel(db[:2])), p[:2], rtol=1e-12
    )


def test_decibel_peak_reference():
    p = np.array([4.0, 2.0, 1.0])
    db = np.asarray(decibel(p, ref_power=None))
    np.testing.assert_allclose(db[0], 0.0, atol=1e-12)
