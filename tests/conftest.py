"""Shared fixtures for the audian-tpu test suite."""

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def cricket_like(rng):
    """Synthetic stand-in for the bundled Gryllus_campestris.wav recording
    (a git-LFS placeholder in the reference): 4.8 kHz carrier chirps with
    AM envelope plus noise, 2 channels at 44.1 kHz."""
    rate = 44100.0
    t = np.arange(int(2.0 * rate)) / rate
    carrier = np.sin(2 * np.pi * 4800.0 * t)
    am = (np.sin(2 * np.pi * 25.0 * t) > 0).astype(float)
    chirps = carrier * am
    x = np.stack([
        0.6 * chirps + 0.01 * rng.standard_normal(len(t)),
        0.3 * np.roll(chirps, 17) + 0.01 * rng.standard_normal(len(t)),
    ], axis=1)
    return x.astype(np.float64), rate
