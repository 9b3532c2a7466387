"""Envelope kernel vs the reference's scipy formulation."""

import numpy as np
import scipy.signal as sps

from audian_tpu.ops import envelope, design_envelope_filter


RATE = 44100.0


def _oracle(x, sos, clamp):
    # reference formulation, bufferedenvelope.py:34-41
    env = sps.sosfiltfilt(sos, (np.pi / 2) * np.abs(x), axis=0)
    if clamp:
        env[env < 0] = 0
    return env


def test_envelope_matches_reference_formulation(cricket_like):
    x, rate = cricket_like
    sos = design_envelope_filter(rate, 500.0)
    got = np.asarray(envelope(x, sos))
    want = _oracle(x, sos, clamp=True)
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_envelope_bandpass_no_clamp(cricket_like):
    x, rate = cricket_like
    sos = design_envelope_filter(rate, 500.0, highpass_cutoff=50.0)
    got = np.asarray(envelope(x, sos, clamp_negative=False))
    want = _oracle(x, sos, clamp=False)
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_envelope_none_sos_is_zeros(cricket_like):
    x, _ = cricket_like
    got = np.asarray(envelope(x, None))
    assert got.shape == x.shape and np.all(got == 0)


def test_envelope_tracks_amplitude(cricket_like):
    """A unit-amplitude tone burst should produce a near-unit envelope
    (the pi/2 rectification scaling, bufferedenvelope.py:40)."""
    x, rate = cricket_like
    sos = design_envelope_filter(rate, 100.0)
    env = np.asarray(envelope(x[:, 0] / 0.6, sos))
    mid = env[len(env) // 4 : len(env) // 2]
    assert 0.8 < np.percentile(mid, 95) < 1.2
