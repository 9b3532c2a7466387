"""Playback mix-down pipeline vs the reference's play_region math
(`src/audian/databrowser.py:1702-1742`)."""

import numpy as np
import scipy.signal as sps

from audian_tpu.ops import stereo_mixdown, heterodyne, fade, prepare_playback


RATE = 96000.0


def _signal(rng, nch=4, n=48000):
    return rng.standard_normal((n, nch)) * 0.1


def test_stereo_mixdown_split(rng):
    x = _signal(rng)
    got = np.asarray(stereo_mixdown(x, channels=[0, 1, 2, 3]))
    n2 = (4 + 1) // 2
    np.testing.assert_allclose(got[:, 0], x[:, :n2].mean(axis=1), atol=1e-12)
    np.testing.assert_allclose(got[:, 1], x[:, n2:].mean(axis=1), atol=1e-12)


def test_stereo_mixdown_mono(rng):
    x = _signal(rng, nch=1)
    got = np.asarray(stereo_mixdown(x))
    assert got.shape == (len(x), 1)
    np.testing.assert_allclose(got[:, 0], x[:, 0])


def test_stereo_mixdown_odd_channels(rng):
    x = _signal(rng, nch=3)
    got = np.asarray(stereo_mixdown(x))
    np.testing.assert_allclose(got[:, 0], x[:, :2].mean(axis=1), atol=1e-12)
    np.testing.assert_allclose(got[:, 1], x[:, 2], atol=1e-12)


def test_heterodyne_matches_reference(rng):
    x = _signal(rng, nch=2)
    f = 40000.0
    got = np.asarray(heterodyne(x, RATE, f))
    het = np.sin(2 * np.pi * f * np.arange(len(x)) / RATE)
    want = (x.T * het).T
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_fade_ramps(rng):
    x = np.ones((1000, 2))
    got = np.asarray(fade(x, rate=1000.0, fade_time=0.1))
    assert got[0, 0] == 0.0
    np.testing.assert_allclose(got[100:900], 1.0)
    np.testing.assert_allclose(got[-1], got[0])
    assert np.all(np.diff(got[:100, 0]) >= 0)


def test_heterodyne_and_fade_dequantize_int16(rng):
    """int16 input (the loader's raw device mirror) must be dequantized
    to f32, not used as the carrier/ramp dtype — an int16 carrier
    truncates the [-1, 1] sine to zeros and silently corrupts the mix."""
    from audian_tpu.ops.raw16 import RAW16_SCALE

    xf = _signal(rng, nch=2)
    q = np.clip(np.round(xf / RAW16_SCALE), -32768, 32767).astype(np.int16)
    f = 40000.0
    got = np.asarray(heterodyne(q, RATE, f))
    assert got.dtype == np.float32
    het = np.sin(2 * np.pi * f * np.arange(len(q)) / RATE)
    want = ((q.astype(np.float64) * RAW16_SCALE).T * het).T
    np.testing.assert_allclose(got, want, atol=1e-6)

    ones = np.full((1000, 2), 16384, np.int16)  # 0.5 in raw16 codes
    faded = np.asarray(fade(ones, rate=1000.0, fade_time=0.1))
    assert faded.dtype == np.float32
    np.testing.assert_allclose(faded[100:900], 0.5, atol=1e-7)
    assert faded[0, 0] == 0.0 and np.all(np.diff(faded[:100, 0]) >= 0)


def test_prepare_playback_heterodyne_pipeline(rng):
    """Full pipeline: mix, heterodyne, 20 kHz zero-phase lowpass, decimate,
    fade — against a numpy/scipy transcription of the reference."""
    x = _signal(rng, nch=2, n=96000)
    f = 52000.0
    got, got_rate = prepare_playback(
        x, RATE, use_heterodyne=True, heterodyne_freq=f
    )
    # oracle
    play = x.copy()
    n2 = 1
    ref = np.stack([play[:, :n2].mean(1), play[:, n2:].mean(1)], axis=1)
    het = np.sin(2 * np.pi * f * np.arange(len(ref)) / RATE)
    ref = (ref.T * het).T
    sos = sps.butter(2, 20000, "low", output="sos", fs=RATE)
    nstep = int(np.round(RATE / 40000.0))
    ref = sps.sosfiltfilt(sos, ref, 0)[::nstep]
    rate = RATE / nstep
    nf = int(round(0.1 * rate))
    ramp = np.sin(0.5 * np.pi * np.arange(nf) / nf) ** 2
    ref[:nf] *= ramp[:, None]
    ref[-nf:] *= ramp[::-1][:, None]
    assert got_rate == rate
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-7)


def test_prepare_playback_plain(rng):
    x = _signal(rng, nch=2, n=9600)
    got, rate = prepare_playback(x, RATE)
    assert rate == RATE
    assert np.asarray(got).shape == (9600, 2)
